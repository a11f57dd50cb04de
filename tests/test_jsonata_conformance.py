"""JSONata conformance corpus (round-4 verdict item 6): a structured slice
of the public jsonata-js test-suite surface, organized by the suite's group
names (string / numeric / boolean / array / object / hof / dates / paths /
operators / errors), authored against the documented JSONata 1.8/2.0
semantics that JSONata4Java 2.4.5 (the reference's engine,
reference pom.xml:45-49) implements.

All cases run through the tier-2 interpreter; the compilable subset also
runs through the tier-1 Column compiler via ``transform`` dual-tier sweep
at the bottom (same DataFrame, both tiers, row-exact equality). Per-group
counts are reported in COVERAGE.md.
"""

from __future__ import annotations

import math

import pytest

from kafka_connect_jsonata_spark.jsonata.errors import JsonataError
from kafka_connect_jsonata_spark.jsonata.interpreter import UNDEFINED, jsonata


def ev(expr, data=None, **kw):
    return jsonata(expr, **kw).evaluate(data)


# each entry: (expr, input data, expected)
GROUPS: dict[str, list] = {}

GROUPS["string"] = [
    ("$string(5)", None, "5"),
    ("$string(-0.5)", None, "-0.5"),
    ("$string(true)", None, "true"),
    ("$string(false)", None, "false"),
    ("$string('abc')", None, "abc"),
    ("$string([1,2])", None, "[1,2]"),
    ("$string({'a': true})", None, '{"a":true}'),
    ("$length('')", None, 0),
    ("$length('hello world')", None, 11),
    ("$uppercase('Hello World')", None, "HELLO WORLD"),
    ("$lowercase('Hello World')", None, "hello world"),
    ("$substring('hello world', 0, 5)", None, "hello"),
    ("$substring('hello world', 6)", None, "world"),
    ("$substring('hello', 2, 100)", None, "llo"),
    ("$substring('hello', -2)", None, "lo"),
    ("$substring('hello', -2, 1)", None, "l"),
    ("$substringBefore('hello world', ' ')", None, "hello"),
    ("$substringBefore('hello', 'x')", None, "hello"),
    ("$substringAfter('hello world', ' ')", None, "world"),
    ("$trim('  one   two  three ')", None, "one two three"),
    ("$trim('')", None, ""),
    ("$pad('abc', 5)", None, "abc  "),
    ("$pad('abc', -5)", None, "  abc"),
    ("$pad('abcde', 3, '-')", None, "abcde"),
    ("$contains('abracadabra', 'bra')", None, True),
    ("$contains('abracadabra', 'xyz')", None, False),
    ("$contains('abracadabra', /a.*a/)", None, True),
    ("$split('so many words', ' ')", None, ["so", "many", "words"]),
    ("$split('so many words', ' ', 2)", None, ["so", "many"]),
    ("$split('a,b,,c', ',')", None, ["a", "b", "", "c"]),
    ("$split('too much, punctuation. hard; to read', /[ ,.;]+/)", None,
     ["too", "much", "punctuation", "hard", "to", "read"]),
    ("$join(['a'])", None, "a"),
    ("$join(['a','b','c'], ', ')", None, "a, b, c"),
    ("$join([], '-')", None, ""),
    ("$replace('John Smith and John Jones', 'John', 'Mr')", None,
     "Mr Smith and Mr Jones"),
    ("$replace('John Smith and John Jones', 'John', 'Mr', 1)", None,
     "Mr Smith and John Jones"),
    ("$replace('abracadabra', /a.*?a/, '*')", None, "*c*bra"),
    ("$replace('abc', /b/, function($m){ $uppercase($m.match) })", None, "aBc"),
    ("$contains('ABC', /abc/i)", None, True),
    ("$split('aXbXc', /x/i)", None, ["a", "b", "c"]),
    ("$count($match('no', /x/))", None, 0),
    ("$substringBefore('abc', '')", None, ""),
    ("$base64encode('myuser:mypass')", None, "bXl1c2VyOm15cGFzcw=="),
    ("$base64decode('bXl1c2VyOm15cGFzcw==')", None, "myuser:mypass"),
    ("$encodeUrlComponent('?x=test')", None, "%3Fx%3Dtest"),
    ("$decodeUrlComponent('%3Fx%3Dtest')", None, "?x=test"),
    ("$encodeUrl('https://e.com/?t=He said')", None,
     "https://e.com/?t=He%20said"),
    ("$string(1/3)", None, "0.3333333333333333"),
    ("$string(10e100)", None, "1e+101"),
    ("$string(1e-7)", None, "1e-7"),
    ("$split('a b c', ' ', 0)", None, []),
]

GROUPS["numeric"] = [
    ("$number('5')", None, 5),
    ("$number('-0.05')", None, -0.05),
    ("$number('1e2')", None, 100),
    ("$number(true)", None, 1),
    ("$number(false)", None, 0),
    ("$abs(5)", None, 5),
    ("$abs(-5)", None, 5),
    ("$abs(0)", None, 0),
    ("$floor(5)", None, 5),
    ("$floor(5.3)", None, 5),
    ("$floor(5.8)", None, 5),
    ("$floor(-5.3)", None, -6),
    ("$ceil(5)", None, 5),
    ("$ceil(5.3)", None, 6),
    ("$ceil(-5.3)", None, -5),
    ("$round(11.5)", None, 12),
    ("$round(12.5)", None, 12),
    ("$round(125, -1)", None, 120),
    ("$round(125.456, 1)", None, 125.5),
    ("$round(-2.5)", None, -2),
    ("$power(2, 8)", None, 256),
    ("$power(2, 0.5)", None, math.sqrt(2)),
    ("$power(2, -2)", None, 0.25),
    ("$sqrt(4)", None, 2),
    ("$sqrt(2)", None, math.sqrt(2)),
    ("$formatBase(100, 2)", None, "1100100"),
    ("$formatBase(2555, 16)", None, "9fb"),
    ("$formatBase(100)", None, "100"),
    ("$formatNumber(1234.5678, '00.000')", None, "1234.568"),
    ("$formatNumber(0.14, '01%')", None, "14%"),
    ("$formatNumber(-12345, '#,##0')", None, "-12,345"),
    ("$formatInteger(123, '000000')", None, "000123"),
    ("$formatInteger(19, 'w')", None, "nineteen"),
    ("$formatInteger(99, 'i')", None, "xcix"),
    ("$parseInteger('nineteen', 'w')", None, 19),
    ("$parseInteger('000123', '000000')", None, 123),
    ("1 + 2 * 3", None, 7),
    ("(1 + 2) * 3", None, 9),
    ("8 / 2 / 2", None, 2),
    ("10 - 2 - 3", None, 5),
    ("10.5 + 0.5", None, 11),
    ("5 % 2", None, 1),
    ("-5 % 2", None, -1),
    ("$round(-1.5)", None, -2),
    ("$formatNumber(1234.5678, '#,##0.00')", None, "1,234.57"),
    ("$formatBase(-100, 2)", None, "-1100100"),
    ("$parseInteger('one hundred and twenty-three', 'w')", None, 123),
    ("$formatInteger(12, '1;o')", None, "12th"),
    ("$formatInteger(3, '1;o')", None, "3rd"),
    ("$formatInteger(22, '1;o')", None, "22nd"),
    ("$formatInteger(11, '1;o')", None, "11th"),
    ("$formatInteger(12, 'w;o')", None, "twelfth"),
    ("$formatInteger(21, 'w;o')", None, "twenty-first"),
    ("-a", {"a": 5}, -5),
]

GROUPS["boolean"] = [
    ("$boolean(true)", None, True),
    ("$boolean(false)", None, False),
    ("$boolean(0)", None, False),
    ("$boolean(10)", None, True),
    ("$boolean(-0.5)", None, True),
    ("$boolean('')", None, False),
    ("$boolean('false')", None, True),
    ("$boolean([])", None, False),
    ("$boolean([0])", None, False),
    ("$boolean([1])", None, True),
    ("$boolean({})", None, False),
    ("$boolean({'a':0})", None, True),
    ("$boolean(null)", None, False),
    ("$not(true)", None, False),
    ("$not(false)", None, True),
    ("$exists('')", None, True),
    ("$exists(null)", None, True),
    ("1 < 2", None, True),
    ("1 >= 2", None, False),
    ("'abc' = 'abc'", None, True),
    ("'abc' != 'abd'", None, True),
    ("'a' < 'b'", None, True),
    ("[1,2] = [1,2]", None, True),
    ("{'a':1} = {'a':1}", None, True),
    ("{'a':1} = {'a':2}", None, False),
    ("true and true", None, True),
    ("false or true", None, True),
    ("2 in [1,2,3]", None, True),
    ("4 in [1,2,3]", None, False),
]

GROUPS["array"] = [
    ("$count([1,2,3])", None, 3),
    ("$count([])", None, 0),
    ("$count(1)", None, 1),
    ("$sum([1,2,3,4])", None, 10),
    ("$sum([])", None, 0),
    ("$sum([0.1, 0.2])", None, 0.1 + 0.2),
    ("$max([5,1,9,3])", None, 9),
    ("$min([5,1,9,3])", None, 1),
    ("$max([-1,-5])", None, -1),
    ("$average([2,4,6])", None, 4),
    ("$append([1,2], [3,4])", None, [1, 2, 3, 4]),
    ("$append([1,2], 3)", None, [1, 2, 3]),
    ("$append('a', 'b')", None, ["a", "b"]),
    ("$reverse([1,2,3,4])", None, [4, 3, 2, 1]),
    ("$reverse([])", None, []),
    ("$distinct([1,2,3,2,1])", None, [1, 2, 3]),
    ("$distinct(['b','a','b'])", None, ["b", "a"]),  # first-seen order
    ("$zip([1,2,3], [4,5,6])", None, [[1, 4], [2, 5], [3, 6]]),
    ("$zip([1,2,3], [4,5])", None, [[1, 4], [2, 5]]),
    ("$zip([1,2],[3,4],[5,6])", None, [[1, 3, 5], [2, 4, 6]]),
    ("$sort([5,3,1,4])", None, [1, 3, 4, 5]),
    ("$sort(['b','a','c'])", None, ["a", "b", "c"]),
    ("$count($shuffle([1..10]))", None, 10),
    ("$sort($shuffle([3,1,2]))", None, [1, 2, 3]),
    ("[1..5]", None, [1, 2, 3, 4, 5]),
    ("[5..1]", None, []),
    ("[1..3, 7..8]", None, [1, 2, 3, 7, 8]),
    ("[1..2].[$]", None, [[1], [2]]),
    ("$count([1..100])", None, 100),
    ("[1,2,3][1]", None, 2),
    ("[1,2,3][-1]", None, 3),
    ("[1,2,3][3]", None, UNDEFINED),
    ("[1,2,3][1.5]", None, 2),  # index truncates toward floor
    ("$append([], [])", None, UNDEFINED),  # empty result sequence
    ("$zip([1], [])", None, []),
    ("$distinct([{'a':1},{'a':2},{'a':1}])", None, [{"a": 1}, {"a": 2}]),
]

GROUPS["object"] = [
    ("$keys({'a':1,'b':2,'c':3})", None, ["a", "b", "c"]),
    ("$keys([{'a':1},{'b':2},{'a':3}])", None, ["a", "b"]),
    ("$lookup({'a':1,'b':2}, 'b')", None, 2),
    ("$lookup({'a':1}, 'z')", None, UNDEFINED),
    ("$lookup([{'a':1},{'a':2}], 'a')", None, [1, 2]),
    ("$spread({'a':1,'b':2})", None, [{"a": 1}, {"b": 2}]),
    ("$merge({'a':1})", None, {"a": 1}),
    ("$merge([{'a':1,'b':2},{'b':3,'c':4}])", None, {"a": 1, "b": 3, "c": 4}),
    ("$sift({'a':1,'b':10,'c':100}, function($v){$v >= 10})", None,
     {"b": 10, "c": 100}),
    ("$sift({'ax':1,'bx':2,'c':3}, function($v,$k){$contains($k,'x')})", None,
     {"ax": 1, "bx": 2}),
    ("$each({'a':1,'b':2}, function($v,$k){{$k: $v*10}}) ~> $merge", None,
     {"a": 10, "b": 20}),
    ("$type('str')", None, "string"),
    ("$type(1.5)", None, "number"),
    ("$type(false)", None, "boolean"),
    ("$type(null)", None, "null"),
    ("$type([])", None, "array"),
    ("$type({})", None, "object"),
    ("$type($sum)", None, "function"),
    ("{'a': 1}.a", None, 1),
    ("{'a': {'b': 2}}.a.b", None, 2),
    ("{'x': 1, 'y': 2}.*", None, [1, 2]),
    ("$keys({})", None, UNDEFINED),  # empty sequence, not []
    ("$merge([])", None, {}),
    ("$lookup({'a': null}, 'a')", None, None),  # null value, not missing
]

GROUPS["hof"] = [
    ("$map([1,4,9,16], $sqrt)", None, [1, 2, 3, 4]),
    ("$map(['a','b'], $uppercase)", None, ["A", "B"]),
    ("$map([1,2,3], function($v, $i) { $i })", None, [0, 1, 2]),
    ("$map([9,8], function($v, $i, $a) { $count($a) })", None, [2, 2]),
    ("$filter([1,2,3,4,5], function($v) { $v > 3 })", None, [4, 5]),
    ("$filter([1,2,3], function($v, $i) { $i != 1 })", None, [1, 3]),
    ("$reduce([1,2,3,4], function($acc,$v){ $acc * $v })", None, 24),
    ("$reduce([3], function($acc,$v){ $acc + $v })", None, 3),
    ("$reduce([], function($acc,$v){ $acc + $v }, 100)", None, 100),
    ("$single([1,2,3], function($v) { $v = 3 })", None, 3),
    ("$sort([3,1,2], function($l, $r) { $l > $r })", None, [1, 2, 3]),
    ("$sort([1,2,3], function($l, $r) { $l < $r })", None, [3, 2, 1]),
    ("($sq := function($x){$x*$x}; $map([1,2,3], $sq))", None, [1, 4, 9]),
    ("($add := function($a,$b){$a+$b}; $reduce([1,2,3], $add, 0))", None, 6),
    ("($c := function($f,$g){function($x){$g($f($x))}}; "
     "$inc := function($x){$x+1}; $dbl := function($x){$x*2}; "
     "$c($inc,$dbl)(5))", None, 12),
    ("($fib := function($n){ $n < 2 ? $n : $fib($n-1) + $fib($n-2) }; $fib(10))",
     None, 55),
    ("($even := function($n){$n = 0 ? true : $odd($n-1)}; "
     "$odd := function($n){$n = 0 ? false : $even($n-1)}; $even(8))", None, True),
    ("$map([1,2], function($v){ $v > 1 ? $v : $v * 10 })", None, [10, 2]),
    ("[1,2,3] ~> $filter(function($v){$v != 2}) ~> $map(function($v){$v*10})",
     None, [10, 30]),
    ("('hello' ~> $substringAfter('h') ~> $uppercase)", None, "ELLO"),
    ("$filter([1], function($v){ false })", None, UNDEFINED),
    ("$reduce([], function($a,$b){ $a })", None, UNDEFINED),
    ("$map({'a':1}, function($v){ $v.a })", None, 1),  # object as singleton
    ("$map([1,2,3], $string)", None, ["1", "2", "3"]),
]

GROUPS["dates"] = [
    ("$fromMillis(1510067557121)", None, "2017-11-07T15:12:37.121Z"),
    ("$fromMillis(1510067557121, '[Y0001]-[M01]-[D01]')", None, "2017-11-07"),
    ("$fromMillis(1510067557121, '[H01]:[m01]:[s01]')", None, "15:12:37"),
    ("$fromMillis(0, '[Y]')", None, "1970"),
    ("$toMillis('2017-11-07T15:07:54.972Z')", None, 1510067274972),
    ("$toMillis('1970-01-01T00:00:00.001Z')", None, 1),
    ("$toMillis('2018-03-27', '[Y0001]-[M01]-[D01]')", None, 1522108800000),
    ("$toMillis($fromMillis(123456789))", None, 123456789),
    ("$fromMillis($toMillis('2017-01-02T03:04:05.678Z'))", None,
     "2017-01-02T03:04:05.678Z"),
    # docs examples: timezone arg, names, ordinals, optional-digit marker
    ("$fromMillis(1510067557121, '[M01]/[D01]/[Y0001] [H01]:[m01]:[s01] [z]')",
     None, "11/07/2017 15:12:37 GMT+00:00"),
    ("$fromMillis(1510067557121, '[H01]:[m01]:[s01] [z]', '-0500')",
     None, "10:12:37 GMT-05:00"),
    ("$fromMillis(1510067557121, '[FNn]')", None, "Tuesday"),
    # [F] defaults to the lowercase weekday NAME (XPath presentation 'n');
    # the numeric form needs an explicit digit modifier
    ("$fromMillis(1510067557121, '[F]')", None, "tuesday"),
    ("$fromMillis(1510067557121, '[F1]')", None, "2"),  # ISO day number
    ("$fromMillis(1510067557121, '[D1o] [MNn] [Y]')", None, "7th November 2017"),
    ("$fromMillis(1510067557121, '[D#1]/[M#1]/[Y0001]')", None, "7/11/2017"),
    ("$fromMillis(1510067557121, '[f001]')", None, "121"),
    ("$fromMillis(0, '[h]:[m01] [P]')", None, "12:00 am"),
    ("$toMillis('13:45', '[H01]:[m01]')", None, 49500000),
    ("$toMillis('2009-02-13T23:31:30.123Z')", None, 1234567890123),
]

GROUPS["paths"] = [
    ("foo.bar", {"foo": {"bar": 42}}, 42),
    ("foo.bar.baz", {"foo": {"bar": 1}}, UNDEFINED),
    ("foo", {}, UNDEFINED),
    ("`weird name`.x", {"weird name": {"x": 1}}, 1),
    ("a[0]", {"a": [1, 2, 3]}, 1),
    ("a[0]", {"a": 5}, 5),  # non-array treated as singleton
    ("a[0][0]", {"a": [1, 2]}, 1),  # idempotent predicate
    ("a[-2]", {"a": [1, 2, 3]}, 2),
    ("a[10]", {"a": [1, 2, 3]}, UNDEFINED),
    ("a[[1..2]]", {"a": [1, 2, 3, 4]}, [2, 3]),
    ("a.b[c='x'].d", {"a": {"b": [{"c": "x", "d": 1}, {"c": "y", "d": 2}]}}, 1),
    ("a[b.c = 1]", {"a": [{"b": {"c": 1}}, {"b": {"c": 2}}]}, {"b": {"c": 1}}),
    ("*.x", {"p": {"x": 1}, "q": {"x": 2}}, [1, 2]),
    ("**.x", {"p": {"q": {"x": 1}}, "r": {"x": 2}}, [1, 2]),
    ("a.*", {"a": {"p": 1, "q": 2}}, [1, 2]),
    ("nums.($ * 2)", {"nums": [1, 2, 3]}, [2, 4, 6]),
    ("a.($ * 2)", {"a": 5}, 10),
    ("a.b.%.k", {"a": {"b": {"z": 0}, "k": 7}}, 7),
    ("a#$i.($i)", {"a": ["x", "y", "z"]}, [0, 1, 2]),
    ("a@$v.($v.b)", {"a": [{"b": 1}, {"b": 2}]}, [1, 2]),
    ("a.b[]", {"a": {"b": 1}}, [1]),  # keep-array marker
    ("a[].b", {"a": {"b": 1}}, [1]),
    ("(a.b)[1]", {"a": [{"b": 1}, {"b": 2}]}, 2),
    ("a^($)", {"a": [3, 1, 2]}, [1, 2, 3]),
    ("a^(>$)", {"a": [3, 1, 2]}, [3, 2, 1]),
    ("a^(x, >y).y", {"a": [{"x": 1, "y": 5}, {"x": 1, "y": 9}, {"x": 0, "y": 0}]},
     [0, 9, 5]),
]

GROUPS["operators"] = [
    ("2 != 3 ? 'yes' : 'no'", None, "yes"),
    ("false ? 'y'", None, UNDEFINED),  # no else branch -> no result
    ("'' & 5", None, "5"),
    ("1 & 2", None, "12"),
    ("'The answer is ' & (6*7)", None, "The answer is 42"),
    ("($x := 10; $y := $x * 2; $y + 2)", None, 22),
    ("($x := 1; ($x := 2; $x) + $x)", None, 3),  # inner block scope
    ("{'key': 1 + 2}", None, {"key": 3}),
    ("{'a' & 'b': 1}", None, {"ab": 1}),
    ("items{type: $sum(price)}",
     {"items": [{"type": "a", "price": 1}, {"type": "a", "price": 2},
                {"type": "b", "price": 5}]},
     {"a": 3, "b": 5}),
    ("items{type: price[0]}",
     {"items": [{"type": "a", "price": 1}, {"type": "a", "price": 2}]},
     {"a": 1}),
    ("payload ~> |$|{'n': n + 1}|", {"payload": {"n": 1}}, {"n": 2}),
    ("$ ~> |a|{},['drop']|", {"a": {"keep": 1, "drop": 2}}, {"a": {"keep": 1}}),
    ("5 in a", {"a": [4, 5]}, True),
    ("'x' in 'x'", None, True),
    # variable holding a path result then indexed
    ("($r := a; $r[1])", {"a": [7, 8, 9]}, 8),
    ("'x' & nope", {}, "x"),  # undefined stringifies to '' in concat
    ("$[0]", [1, 2, 3], 1),  # top-level array input
    ("a[b = $$.t].b", {"t": 2, "a": [{"b": 1}, {"b": 2}]}, 2),
    ("*", {"a": [1, 2], "b": 3}, [1, 2, 3]),  # wildcard flattens arrays
    ("a[active].v", {"a": [{"active": True, "v": 1}, {"active": False, "v": 2}]}, 1),
    # function chaining binds tighter than ?:
    ("true ? [1,2] ~> $count : 0", None, 2),
]

GROUPS["advanced"] = [
    # function composition / partial application
    ("($f := $uppercase; 'abc' ~> $f)", None, "ABC"),
    ("'hello' ~> $substringBefore('l') ~> $uppercase()", None, "HE"),
    ("($s := $string(?); $s(5))", None, "5"),
    ("($first := $substring(?, 0, 1); $first('hello'))", None, "h"),
    ("5 ~> function($x){$x*2}", None, 10),
    # higher-order functions
    ("$map([1,2,3], function($v, $i) { $v * $i })", None, [0, 2, 6]),
    ("$filter([1,2,3,4], function($v) { $v % 2 = 0 })", None, [2, 4]),
    ("$reduce([1..5], function($a, $b) { $a + $b })", None, 15),
    ("$reduce([1,2,3], function($a,$b){$a*$b}, 10)", None, 60),
    ("$single([1,2,3], function($v) { $v = 2 })", None, 2),
    ("$zip([1,2,3],[4,5,6])", None, [[1, 4], [2, 5], [3, 6]]),
    ("$zip([1,2],[3,4],[5])", None, [[1, 3, 5]]),
    ("$sort([3,1,2])", None, [1, 2, 3]),
    ("$sort(['b','a'], function($l,$r){$l>$r})", None, ["a", "b"]),
    ("$each({'a':1,'b':2}, function($v,$k){$k & '=' & $v})", None, ["a=1", "b=2"]),
    ("$sift({'a':1,'b':10}, function($v){$v>5})", None, {"b": 10}),
    ("$merge([{'a':1},{'b':2},{'a':3}])", None, {"a": 3, "b": 2}),
    ("$distinct([1,2,2,3,1])", None, [1, 2, 3]),
    ("$append([1,2],[3])", None, [1, 2, 3]),
    ("$reverse([1,2,3])", None, [3, 2, 1]),
    # object transform operator
    ("{'a':1,'b':2} ~> |$|{'c': a+b}|", None, {"a": 1, "b": 2, "c": 3}),
    ("{'a':1,'b':2} ~> |$|{}, ['b']|", None, {"a": 1}),
    # regex captures
    ("$replace('2023-01-15', /(\\d+)-(\\d+)-(\\d+)/, '$3/$2/$1')", None,
     "15/01/2023"),
    ("$match('ab12cd34', /\\d+/)[1].match", None, "34"),
    ("$match('ababbabbcc', /a(b+)/)[1].groups[0]", None, "bb"),
    # $type
    ("$type(1)", None, "number"),
    ("$type('a')", None, "string"),
    ("$type(null)", None, "null"),
    ("$type([1])", None, "array"),
    ("$type({})", None, "object"),
    ("$type($type)", None, "function"),
    ("$type(true)", None, "boolean"),
    # numeric formatting
    ("$formatBase(255, 16)", None, "ff"),
    ("$formatBase(-10, 2)", None, "-1010"),
    ("$formatNumber(1234.5678, '#,##0.00')", None, "1,234.57"),
    ("$formatNumber(0.5, '0%')", None, "50%"),
    ("$formatInteger(2023, 'w')", None, "two thousand and twenty-three"),
    ("$formatInteger(12, 'W')", None, "TWELVE"),
    ("$parseInteger('twelve', 'w')", None, 12),
    ("$number('-0.05e2')", None, -5.0),
    ("$round(2.5)", None, 2),   # banker's rounding per spec
    ("$round(3.5)", None, 4),
    ("$round(-2.5)", None, -2),
    ("$sqrt(2)*$sqrt(2) ~> $round(10)", None, 2),
    # paths / wildcards on structures
    ("Account.Order.Product[price > 30].name",
     {"Account": {"Order": [{"Product": [
         {"name": "a", "price": 20}, {"name": "b", "price": 40}]}]}},
     "b"),
    ("*.x", {"a": {"x": 1}, "b": {"x": 2}}, [1, 2]),
    ("**.y", {"a": {"b": {"y": 3}}, "y": 1}, [1, 3]),
    # misc semantics
    ("($x := [1,2,3]; $x[-1])", None, 3),
    ("[1,2,3,4][[0..1]]", None, [1, 2]),
    ("[1,2,3][0.5]", None, 1),  # non-integer index floors (jsonata-js)
    ("$keys({'a':1,'b':2})", None, ["a", "b"]),
    ("$lookup({'a':1}, 'a')", None, 1),
    ("$spread({'a':1,'b':2})", None, [{"a": 1}, {"b": 2}]),
    ("$exists(nothing)", {"a": 1}, False),
    ("$boolean([])", None, False),
    ("$boolean([0])", None, False),
    ("$boolean([0,1])", None, True),
    ("$boolean({'a':0})", None, True),
    ("[1,2,3].$string($)", None, ["1", "2", "3"]),
    ("$average([2,4,6])", None, 4),
    ("$abs(-3.5)", None, 3.5),
    ("$ceil(-1.2)", None, -1),
    ("$floor(-1.2)", None, -2),
    ("$power(4, 0.5)", None, 2),
    ("(1;2;3)", None, 3),
    ("$count(nothing)", None, 0),
    # number-to-string canonical forms
    ("$string(1/3)", None, "0.3333333333333333"),
    ("$string(1e100)", None, "1e+100"),
    ("$string(0.0000001)", None, "1e-7"),
]

# suite groups function-now / function-millis: $now()/$millis() are
# nondeterministic, so the cases pin INVARIANTS (shape, intra-evaluation
# stability — jsonata pins ONE timestamp per evaluation) rather than
# values; raw outputs stay out so the dual-tier sweep can't flake on
# wall-clock skew between tiers.
GROUPS["datetime_now"] = [
    ("$type($millis())", None, "number"),
    ("$type($now())", None, "string"),
    ("$length($now()) = 24", None, True),          # ISO-8601 Z millis form
    ("$substring($now(), -1)", None, "Z"),
    ("($m := $millis(); $m = $m)", None, True),
    ("$fromMillis($millis()) = $now()", None, True),  # ONE timestamp/eval
    ("$millis() >= $toMillis('2020-01-01T00:00:00Z')", None, True),
    ("$number($now('[Y0001]')) >= 2020", None, True),
]

GROUPS["dates2"] = [
    ("$fromMillis(1510067557121, '[Y0001]-[M01]-[D01]')", None, "2017-11-07"),
    ("$toMillis('2017-11-07T15:12:37.121Z')", None, 1510067557121),
    ("$fromMillis(0, '[Y]')", None, "1970"),
    ("$toMillis('1970-01-01T00:00:00.000Z')", None, 0),
    ("$fromMillis(1510067557121, '[H01]:[m01]:[s01]')", None, "15:12:37"),
    # default presentation for F is 'n' (lowercase name) per XPath — fixed
    # round 5 after the corpus port surfaced numeric output here
    ("$fromMillis(1510067557121, '[F]')", None, "tuesday"),
    ("$fromMillis(1510067557121, '[FNn]')", None, "Tuesday"),
    ("$fromMillis(1510067557121, '[FN]')", None, "TUESDAY"),
    ("$fromMillis(1510067557121, '[F1]')", None, "2"),
    ("$fromMillis(1510067557121, '[P]')", None, "pm"),
    ("$fromMillis(1510067557121, '[PN]')", None, "PM"),
    ("$toMillis('07/11/2017', '[D01]/[M01]/[Y0001]')", None, 1510012800000),
    ("$toMillis('13:45', '[H01]:[m01]')", None, 49500000),
    ("$fromMillis(1510067557121)", None, "2017-11-07T15:12:37.121Z"),
]

# dotted object constructor maps per item; un-dotted suffix is group-by
# (jsonata docs "Object constructors": Phone.{type: number} -> one object
# per phone). Fixed round 5 — the interpreter previously grouped both forms.
GROUPS["object_step"] = [
    ("Phone.{type: number}",
     {"Phone": [{"type": "home", "number": "1"},
                {"type": "office", "number": "2"}]},
     [{"home": "1"}, {"office": "2"}]),
    ("Phone{type: number}",
     {"Phone": [{"type": "home", "number": "1"},
                {"type": "office", "number": "2"},
                {"type": "office", "number": "3"}]},
     {"home": "1", "office": ["2", "3"]}),
    ("[1,2,3].{'v': $}", None, [{"v": 1}, {"v": 2}, {"v": 3}]),
    ("book.authors@$a.{'a': $a}", {"book": {"authors": ["x", "y"]}},
     [{"a": "x"}, {"a": "y"}]),
    ("lines.{'k': qty}", {"lines": [{"qty": 1}, {"qty": 2}]},
     [{"k": 1}, {"k": 2}]),
    ("lines{'k': qty}", {"lines": [{"qty": 1}, {"qty": 2}]}, {"k": [1, 2]}),
    ("{'k': v}", {"v": 1}, {"k": 1}),
    ("$.{'k': v}", {"v": 1}, {"k": 1}),
]

GROUPS["scoping"] = [
    ("$eval('[1,2,3]')", None, [1, 2, 3]),
    ("$eval('a + 1', {'a': 2})", None, 3),
    ("($x := 5; ($x := 3; $x) + $x)", None, 8),
    ("($f := function($n){ $n <= 1 ? 1 : $n * $f($n-1) }; $f(5))", None, 120),
    ("($fib := function($n){ $n < 2 ? $n : $fib($n-1) + $fib($n-2) }; $fib(10))",
     None, 55),
    ("($y := function($f){ function($x){ $f($f, $x) } };"
     " $fact := $y(function($self, $n){ $n <= 1 ? 1 : $n * $self($self, $n-1) });"
     " $fact(4))", None, 24),
    ("[1,2,3]#$i.($i * 10)", None, [0, 10, 20]),
    ("$assert(true, 'bad')", None, UNDEFINED),
    ("{'a': undefinedthing}", None, {}),
    ("[undefinedthing]", None, []),
    ("undefinedthing ? 1 : 2", None, 2),
    ("$not(undefinedthing)", None, UNDEFINED),
    ("nothing = nothing", None, False),  # undefined operand -> false
    ("'x' in ['x','y']", None, True),
    ("3 in 3", None, True),
    ("[1,2,3] ~> $count", None, 3),
    ("$$.a", {"a": 7}, 7),
    ("a.($$.b)", {"a": {"z": 1}, "b": 9}, 9),
    ("$sum([])", None, 0),
    ("$max([])", None, UNDEFINED),
    ("null = null", None, True),
    # function signatures (jsonata-js placement, after the param list)
    ("($inc := function($x)<n:n>{ $x + 1 }; $inc(2))", None, 3),
    ("($twice := function($f, $x)<fn:n>{ $f($f($x)) };"
     " $twice(function($n){$n*2}, 3))", None, 12),
    ("(function($a, $b)<nn?:n>{ $a + ($b ? $b : 10) })(5)", None, 15),
    ("($s := function($arr)<a<n>:n>{ $sum($arr) }; $s([1,2,3]))", None, 6),
    # order-by: multi-key, mixed direction, bare sequences
    ("items^(price, name)",
     {"items": [{"price": 2, "name": "b"}, {"price": 2, "name": "a"},
                {"price": 1, "name": "c"}]},
     [{"price": 1, "name": "c"}, {"price": 2, "name": "a"},
      {"price": 2, "name": "b"}]),
    ("items^(>price, <name)",
     {"items": [{"price": 2, "name": "b"}, {"price": 2, "name": "a"},
                {"price": 1, "name": "c"}]},
     [{"price": 2, "name": "a"}, {"price": 2, "name": "b"},
      {"price": 1, "name": "c"}]),
    ("[3,1,2]^($)", None, [1, 2, 3]),
    # literal (non-regex) replacement: '$' has no special meaning
    ("$replace('hello', 'l', '$$')", None, "he$$$$o"),
    # regex replacement: lone '$' (not followed by a digit) is a LITERAL;
    # '$$' is an escaped dollar; '$0' is the whole match (round-6 fixes —
    # the compiler previously handed lone '$' to Java Matcher, which threw)
    ("$replace('a-b', /-/, ' $ ')", None, "a $ b"),
    ("$replace('a-b', /-/, '$$')", None, "a$b"),
    ("$replace('a-b-c', /-/, '$0$0')", None, "a--b--c"),
    ("$replace('abcd', /(ab)(c)/, '$2$1$0')", None, "cababcd"),
    # dotted function-call step over an array FLATTENS array-valued
    # results, like every JSONata path step (round-6 compiler fix)
    ("['a b','c d'].$split($, ' ')", None, ["a", "b", "c", "d"]),
    ("['a','b c'].$split($, ' ')", None, ["a", "b", "c"]),
    ("$number('0x1F')", None, 31),  # hex string accepted (jsonata 1.7+)
    ("$match('ababab', /ab/, 2)[1].index", None, 2),
    ("$lookup([{'a':1},{'a':2}], 'a')", None, [1, 2]),
    ("$keys([{'a':1},{'b':2}])", None, ["a", "b"]),
    # HOF extended arities (value, index, array) and misc
    ("$map([10,20], function($v, $i, $a) { $a[0] + $i })", None, [10, 11]),
    ("$filter([5,6,7], function($v, $i) { $i != 1 })", None, [5, 7]),
    ("$filter([5,6,7], function($v, $i, $a) { $v = $max($a) })", None, 7),
    ("$reduce([1], function($a,$b){$a+$b})", None, 1),
    ("$reduce([], function($a,$b){$a+$b}, 5)", None, 5),
    ("$map('a', $uppercase)", None, "A"),
    ("$sift({'a':1,'b':2}, function($v,$k){ $k='a' })", None, {"a": 1}),
    ("$each({'a':1}, function($v,$k,$o){ $count($keys($o)) })", None, 1),
    ("[1,2,3] ~> $map(function($x){$x+1}) ~> $sum", None, 9),
    ("$string(2, true)", None, "2"),
    ("$formatNumber(12345.6, '##,#00.0')", None, "12,345.6"),
    ("**.price", {"a": [{"price": 1}, {"b": {"price": 2}}]}, [1, 2]),
    ("*.*", {"a": {"x": 1}, "b": {"y": 2}}, [1, 2]),
    ("$sort([{'k':2,'t':'a'},{'k':1,'t':'b'},{'k':2,'t':'c'}],"
     " function($l,$r){$l.k>$r.k}).t", None, ["b", "a", "c"]),  # stable sort
    ("$substringAfter('abc', 'c')", None, ""),
    ("$substringAfter('abc', 'x')", None, "abc"),
    # exponent pictures (XPath scientific notation; added round 5)
    ("$formatNumber(0.00001, '0.######e0')", None, "1e-5"),
    ("$formatNumber(12345.6, '0.00e0')", None, "1.23e4"),
    ("$formatNumber(0.5, '0.0e0')", None, "5.0e-1"),
    ("$formatNumber(9.99999, '0.0e0')", None, "1.0e1"),
    ("$formatNumber(0, '0.0e0')", None, "0.0e0"),
    ("$formatNumber(-12345.6, '0.00e0')", None, "-1.23e4"),
    ("$formatNumber(123456, '00.0e0')", None, "12.3e4"),
]

# ---------------------------------------------------------------------------
# round-11 suite port: the remaining public jsonata-js test-suite groups
# (group names follow the suite's directory names) — literals/comments/
# conditionals/operators/constructors/descendent/wildcards/predicates/
# quoted selectors/missing paths/closures/partial application/tail
# recursion/apply/variables/context/regex-as-function/transforms/sorting/
# lambdas/signature enforcement/flattening/function edge cases. Authored
# against jsonata-js 2.x documented semantics; every case double-checked
# through the tier-2 interpreter, divergences fixed in-round (surrogate
# pairs, transform-over-array, regex-as-function, $number 0b/0o,
# signature enforcement, builtin arity errors, empty-block parse).
# ---------------------------------------------------------------------------

GROUPS["literals"] = [
    ('"hello"', None, 'hello'),
    ("'hello'", None, 'hello'),
    ('"\\u0061"', None, 'a'),
    ('"\\uD834\\uDD1E"', None, '𝄞'),
    ('$length("\\uD834\\uDD1E")', None, 1),
    ('"\\t"', None, '\t'),
    ('"\\n"', None, '\n'),
    ('"\\\\"', None, '\\'),
    ('"\\/"', None, '/'),
    ('"\\""', None, '"'),
    ('42', None, 42),
    ('-42', None, -42),
    ('3.14159', None, 3.14159),
    ('1e2', None, 100),
    ('1E2', None, 100),
    ('1e-2', None, 0.01),
    ('10e2', None, 1000),
    ('true', None, True),
    ('false', None, False),
    ('null', None, None),
]

GROUPS["comments"] = [
    ('/* comment */ 1 + 1', None, 2),
    ('1 + /* inline */ 1', None, 2),
    ('1 + 1 /* trailing */', None, 2),
    ("/* multi\nline */ 'x'", None, 'x'),
    ('/* a /* not nested */ 2', None, 2),
]

GROUPS["conditionals"] = [
    ('true ? 1 : 2', None, 1),
    ('false ? 1 : 2', None, 2),
    ("1 < 2 ? 'a' : 'b'", None, 'a'),
    ('true ? false ? 1 : 2 : 3', None, 2),
    ('false ? 1 : false ? 2 : 3', None, 3),
    ('(true ? 1 : 2) + 10', None, 11),
    ("'' ? 'y' : 'n'", None, 'n'),
    ("'x' ? 'y' : 'n'", None, 'y'),
    ("0 ? 'y' : 'n'", None, 'n'),
    ("[] ? 'y' : 'n'", None, 'n'),
    ("{'a':1} ? 'y' : 'n'", None, 'y'),
    ("a ? 'y' : 'n'", {'a': 0}, 'n'),
]

GROUPS["comparison_ops"] = [
    ('3 > 2', None, True),
    ('3 <= 3', None, True),
    ("'a' >= 'a'", None, True),
    ("'abc' < 'abd'", None, True),
    ('3 = 3.0', None, True),
    ('0 = -0', None, True),
    ("1 != '1'", None, True),
    ('null = null', None, True),
    ('[] = []', None, True),
    ('[1,[2]] = [1,[2]]', None, True),
    ("{'a':[1]} = {'a':[1]}", None, True),
    ('true = 1', None, False),
    ('false = 0', None, False),
    ('nothing <= 1', {'a': 1}, UNDEFINED),
    ('1 < nothing', {'a': 1}, UNDEFINED),
]

GROUPS["inclusion_op"] = [
    ('1 in [1,2]', None, True),
    ('3 in [1,2]', None, False),
    ("'a' in 'a'", None, True),
    ("'a' in ['b','a']", None, True),
    ('nothing in [1]', {'a': 1}, False),
    ('1 in nothing', {'a': 1}, False),
    ('null in [null]', None, True),
    ('[1] in [[1],[2]]', None, True),
]

GROUPS["numeric_ops"] = [
    ('2 + 3 * 4', None, 14),
    ('(2 + 3) * 4', None, 20),
    ('10 - 3 - 2', None, 5),
    ('10 / 4', None, 2.5),
    ('7 % 3', None, 1),
    ('-7 % 3', None, -1),
    ('7 % -3', None, 1),
    ('7.5 % 2', None, 1.5),
    ('-5', None, -5),
    ('-(2+3)', None, -5),
    ('- a', {'a': 4}, -4),
    ('2*3 + 4*5', None, 26),
    ('0.1 + 0.2', None, 0.30000000000000004),
    ('5 + nothing', {'a': 1}, UNDEFINED),
    ('nothing * 2', {'a': 1}, UNDEFINED),
    ('- nothing', {'a': 1}, UNDEFINED),
]

GROUPS["string_concat"] = [
    ("'a' & 'b' & 'c'", None, 'abc'),
    ('1 & 2 & 3', None, '123'),
    ("[1,2] & ''", None, '[1,2]'),
    ("{'a':1} & ''", None, '{"a":1}'),
    ("true & '!'", None, 'true!'),
    ("null & '!'", None, 'null!'),
    ("1.5 & ''", None, '1.5'),
    ("'' & 1e21", None, '1e+21'),
    ("'a' & nothing & 'b'", {'x': 1}, 'ab'),
]

GROUPS["boolean_expr"] = [
    ('true and false', None, False),
    ('true or false', None, True),
    ('$not(1=1)', None, False),
    ('1=1 and 2=2', None, True),
    ('1=2 or 2=3 or 3=3', None, True),
    ('$boolean([[0]])', None, False),
    ('$boolean([[], []])', None, False),
    ('$boolean([0, 0.5])', None, True),
    ("$boolean('0')", None, True),
    ('a and b', {'a': 1, 'b': 0}, False),
    ('a or b', {'a': 0, 'b': 0}, False),
    ('nothing and true', {'a': 1}, False),
    ('nothing or true', {'a': 1}, True),
    ("false and $error('x')", None, False),
]

GROUPS["null_semantics"] = [
    ('null', None, None),
    ('[null]', None, [None]),
    ('[null, null]', None, [None, None]),
    ('$exists(null)', None, True),
    ('null = null', None, True),
    ('null != null', None, False),
    ("{'a': null}", None, {'a': None}),
    ('a', {'a': None}, None),
    ('a = null', {'a': None}, True),
    ('$string(null)', None, 'null'),
]

GROUPS["range_op"] = [
    ('[0..4]', None, [0, 1, 2, 3, 4]),
    ('[0..4].($*2)', None, [0, 2, 4, 6, 8]),
    ('[-2..2]', None, [-2, -1, 0, 1, 2]),
    ('[2..2]', None, [2]),
    ('[2..1]', None, []),
    ('[1..3, 5..6]', None, [1, 2, 3, 5, 6]),
    ('[1..$count([1,2,3])]', None, [1, 2, 3]),
    ('[a..b]', {'a': 2, 'b': 4}, [2, 3, 4]),
    ('[nothing..3]', {'a': 1}, []),
    ('[1..nothing]', {'a': 1}, []),
]

GROUPS["array_ctor"] = [
    ('[]', None, []),
    ('[1]', None, [1]),
    ('[[1,2],[3]]', None, [[1, 2], [3]]),
    ('[[1,2],3]', None, [[1, 2], 3]),
    ("['a', 1, true, null]", None, ['a', 1, True, None]),
    ('[a, b]', {'a': [1, 2], 'b': 3}, [[1, 2], 3]),
    ('[a.c, b]', {'a': {'c': 1}, 'b': 2}, [1, 2]),
    ('$count([[1,2],[3]])', None, 2),
    ('[[1,2],[3]][0]', None, [1, 2]),
    ('[1, [2, [3, [4]]]]', None, [1, [2, [3, [4]]]]),
    ('[[]]', None, [[]]),
]

GROUPS["object_ctor"] = [
    ('{}', None, {}),
    ("{'a': 1}", None, {'a': 1}),
    ("{'a': [1,2]}", None, {'a': [1, 2]}),
    ("{'a': {'b': 1}}", None, {'a': {'b': 1}}),
    ("{'k' & 1: 'v'}", None, {'k1': 'v'}),
    ("{$uppercase('k'): 1}", None, {'K': 1}),
    ("{'a': 1+1, 'b': 'x' & 'y'}", None, {'a': 2, 'b': 'xy'}),
]

GROUPS["descendent_op"] = [
    # round-11 compiled cardinality: $count/$exists over bare ** and
    # path-suffixed ** (tier 1 computes the static position arithmetic)
    ('$count(**)', {'a': [{'x': 1}, {'y': [2, 3]}], 'z': 's'}, 7),
    ('$count(a.**)', {'a': {'b': {'c': 1}}, 'd': 9}, 3),
    ('$count(missing.**)', {'a': 1}, 0),
    ('$exists(**)', {'a': 1}, True),
    ('$count(**)', {'deep': {'n': [[1, 2], [3]]}}, 5),
    ('**.x', {'a': {'x': 1}, 'b': {'c': {'x': 2}}}, [1, 2]),
    ('a.**.x', {'a': {'b': {'x': 1}}, 'x': 9}, 1),
    ('$count(**)', {'a': {'b': 1, 'c': [2, 3]}}, 5),
    ('**.b', {'a': [{'b': 1}, {'b': 2}]}, [1, 2]),
    ('$sum(**.n)', {'a': {'n': 1, 'b': {'n': 2, 'c': {'n': 3}}}}, 6),
]

GROUPS["wildcards2"] = [
    ('*', {'a': 1, 'b': 2}, [1, 2]),
    ('*.x', {'p': {'x': 1}, 'q': {'x': 2}}, [1, 2]),
    ('*.*', {'p': {'x': 1}, 'q': {'y': 2}}, [1, 2]),
    ('a.*', {'a': {'x': 1, 'y': [2, 3]}}, [1, 2, 3]),
    ('*[0]', {'a': [1, 2], 'b': 3}, 1),
]

GROUPS["predicates2"] = [
    ('a[b > 1]', {'a': [{'b': 1}, {'b': 2}, {'b': 3}]}, [{'b': 2}, {'b': 3}]),
    ('a[b > 1][0]', {'a': [{'b': 1}, {'b': 2}, {'b': 3}]}, {'b': 2}),
    ('a[b][0]', {'a': [{'b': True, 'c': 1}, {'b': False, 'c': 2}]}, {'b': True, 'c': 1}),
    ("a[b='x'][c=1]", {'a': [{'b': 'x', 'c': 1}, {'b': 'x', 'c': 2}]}, {'b': 'x', 'c': 1}),
    ('a[$ > 2]', {'a': [1, 2, 3, 4]}, [3, 4]),
    ('a[0=1]', {'a': [1, 2]}, UNDEFINED),
    ('a[$%2=0]', {'a': [1, 2, 3, 4]}, [2, 4]),
    ('a[-1]', {'a': [1, 2, 3]}, 3),
    ('a[[0,2]]', {'a': ['x', 'y', 'z']}, ['x', 'z']),
    ('a[[-2,-1]]', {'a': [1, 2, 3]}, [2, 3]),
]

GROUPS["quoted_selectors"] = [
    ('`hello world`', {'hello world': 1}, 1),
    ('a.`b c`', {'a': {'b c': 2}}, 2),
    ('`a`.`b`', {'a': {'b': 3}}, 3),
]

GROUPS["missing_paths"] = [
    ('a.b.c.d', {'a': 1}, UNDEFINED),
    ('a.b + 1', {'a': {}}, UNDEFINED),
    ('$string(a.b)', {'a': {}}, UNDEFINED),
    ('$length(a.b)', {'a': {}}, UNDEFINED),
    ('[a.b]', {'a': {}}, []),
    ("{'x': a.b}", {'a': {}}, {}),
    ('a.b = a.b', {'a': {}}, False),
]

GROUPS["closures"] = [
    ('($x := 5; $f := function(){ $x }; $f())', None, 5),
    ('($mk := function($a){ function($b){ $a + $b } }; $add2 := $mk(2); $add2(3))', None, 5),
    ('($x := 1; $f := function(){ $x }; ($x := 2; $f()))', None, 1),
    ('($cnt := function($arr){ $count($arr) }; $cnt([1,2,3]))', None, 3),
    ("($compose := function($f, $g){ function($x){ $f($g($x)) } }; $h := $compose($uppercase, $lowercase); $h('MiXeD'))", None, 'MIXED'),
]

GROUPS["partial_application"] = [
    ('($add := function($a,$b){$a+$b}; $add5 := $add(5, ?); $add5(3))', None, 8),
    ('($add := function($a,$b){$a+$b}; $addTo := $add(?, 10); $addTo(3))', None, 13),
    ("($rep := $replace(?, 'a', 'b'); $rep('banana'))", None, 'bbnbnb'),
    ("($p := $substring('hello', ?); $p(2))", None, 'llo'),
    ('($f := $string(?); $f(42))', None, '42'),
]

GROUPS["tail_recursion"] = [
    # round-11 TCO (jsonata-js parity): tail calls run in constant stack,
    # far past the 1000-frame recursion guard; non-tail recursion keeps it
    ("($loop := function($n, $acc){ $n = 0 ? $acc : $loop($n - 1, $acc + $n) };"
     " $loop(50000, 0))", None, 1250025000),
    ("($even := function($n){$n = 0 ? true : $odd($n-1)};"
     " $odd := function($n){$n = 0 ? false : $even($n-1)}; $even(20000))",
     None, True),
    ("($g := function($x){ ($y := $x + 1; $y > 5000 ? $y : $g($y)) }; $g(0))",
     None, 5001),
    ('($loop := function($n, $acc){ $n = 0 ? $acc : $loop($n - 1, $acc + $n) }; $loop(100, 0))', None, 5050),
    ("($count_down := function($n){ $n <= 0 ? 'done' : $count_down($n - 1) }; $count_down(300))", None, 'done'),
    ('($fact := function($n, $acc){ $n <= 1 ? $acc : $fact($n - 1, $n * $acc) }; $fact(20, 1))', None, 2432902008176640000),
]

GROUPS["fn_application"] = [
    ('5 ~> $string', None, '5'),
    ("'x' ~> $uppercase ~> $length", None, 1),
    ('[1,2,3] ~> $sum ~> $string', None, '6'),
    ('2 ~> function($x){$x * 3} ~> function($x){$x + 1}', None, 7),
    ("'abc' ~> $substring(1)", None, 'bc'),
    ("'abc' ~> $substring(1, 1)", None, 'b'),
    ('12 ~> $formatBase(2)', None, '1100'),
]

GROUPS["variables"] = [
    ('$x', None, UNDEFINED),
    ('($x := 2)', None, 2),
    ('($x := 2; $x * $x)', None, 4),
    ("($x := 'a'; $y := $x & 'b'; $y)", None, 'ab'),
    ('($a := [1,2]; $a[0])', None, 1),
    ("($o := {'k': 1}; $o.k)", None, 1),
    ('($f := $sum; $f([1,2]))', None, 3),
]

GROUPS["context_ops"] = [
    ('$', 5, 5),
    ('$ + 1', 5, 6),
    ('$.a', {'a': 1}, 1),
    ('$$', {'a': 1}, {'a': 1}),
    ('a.($ + $$.b)', {'a': 1, 'b': 10}, 11),
    ('a.b.($$.c)', {'a': {'b': 1}, 'c': 5}, 5),
    ('[1,2,3].($ * $)', None, [1, 4, 9]),
]

GROUPS["regex_fns"] = [
    ("$match('aXbXc', /x/i)[0].index", None, 1),
    ("$count($match('a1b2c3', /\\d/))", None, 3),
    ("$match('a1b22c', /\\d+/)[1].match", None, '22'),
    ("$split('a1b22c333', /\\d+/)", None, ['a', 'b', 'c', '']),
    ("$replace('a1b2', /\\d/, '#')", None, 'a#b#'),
    ("$contains('hello', /ell/)", None, True),
    ("'ab' ~> /b/ ", None, {'match': 'b', 'start': 1, 'end': 2, 'groups': []}),
    ("('ab' ~> /b/).match", None, 'b'),
    ("'xy' ~> /b/ ", None, UNDEFINED),
    ("$filter(['ab','cd','ae'], /a/)", None, ['ab', 'ae']),
    ('$type(/x/)', None, 'function'),
]

GROUPS["transforms2"] = [
    ("$ ~> |a|{'b': b * 2}|", {'a': {'b': 3}}, {'a': {'b': 6}}),
    ("$ ~> |a|{'n': 1}, ['x']|", {'a': {'x': 2, 'y': 3}}, {'a': {'y': 3, 'n': 1}}),
    ("$ ~> |items|{'done': true}|", {'items': [{'i': 1}, {'i': 2}]}, {'items': [{'i': 1, 'done': True}, {'i': 2, 'done': True}]}),
    ("({'a': 1} ~> |$|{'b': 2}|).b", None, 2),
    ("$ ~> |nomatch|{'x': 1}|", {'a': 1}, {'a': 1}),
    ("($t := |$|{'u': 1}|; {'a': 2} ~> $t)", None, {'a': 2, 'u': 1}),
]

GROUPS["sorting2"] = [
    ('$sort([3,1,2])', None, [1, 2, 3]),
    ("$sort(['b','c','a'])", None, ['a', 'b', 'c']),
    ('a^(b)', {'a': [{'b': 3}, {'b': 1}, {'b': 2}]}, [{'b': 1}, {'b': 2}, {'b': 3}]),
    ('a^(>b)', {'a': [{'b': 1}, {'b': 2}]}, [{'b': 2}, {'b': 1}]),
    ('a^(b).c', {'a': [{'b': 2, 'c': 'y'}, {'b': 1, 'c': 'x'}]}, ['x', 'y']),
    ('$sort([2,1])[0]', None, 1),
    ('[9,8,7]^($)', None, [7, 8, 9]),
]

GROUPS["lambdas2"] = [
    ('function(){ 42 }()', None, 42),
    ('function($x){ $x + 1 }(2)', None, 3),
    ("function($x, $y){ $x & $y }('a', 'b')", None, 'ab'),
    ('(function($x){ function($y){ $x + $y } })(1)(2)', None, 3),
    ('$map([1,2], function($x){ [$x, $x] })', None, [[1, 1], [2, 2]]),
]

GROUPS["fn_string2"] = [
    ('$string($sum)', None, ''),
    ('$string(true)', None, 'true'),
    ('$string(nothing)', {'a': 1}, UNDEFINED),
    ("$string({'a': [1, {'b': null}]})", None, '{"a":[1,{"b":null}]}'),
    ("$string([true, 'x'])", None, '[true,"x"]'),
    ('$string(2, false)', None, '2'),
    ("$string({'a':1}, true)", None, '{\n  "a": 1\n}'),
]

GROUPS["fn_misc"] = [
    ("$length('𝄞')", None, 1),
    ("$substring('𝄞abc', 1, 2)", None, 'ab'),
    ("$uppercase('straße')", None, 'STRASSE'),
    ("$pad('é', 3, '-')", None, 'é--'),
    ("$split('abc', '')", None, ['a', 'b', 'c']),
    ("$join(['a','b'])", None, 'ab'),
    ("$substringBefore('a=b=c', '=')", None, 'a'),
    ("$substringAfter('a=b=c', '=')", None, 'b=c'),
    ("$trim(' \t\na  b \n ')", None, 'a b'),
    ("$contains('', '')", None, True),
    ("$number('0b101')", None, 5),
    ("$number('0o17')", None, 15),
    ('$abs(-0.0)', None, 0.0),
    ('$exists($)', None, True),
]

GROUPS["signatures"] = [
    ("($f := function($x)<s:s>{ $x }; $f('a'))", None, 'a'),
    ('($f := function($x)<b:b>{ $x }; $f(true))', None, True),
    ('($f := function($x)<a:n>{ $count($x) }; $f([1,2]))', None, 2),
    ("($f := function($x)<a<s>:n>{ $count($x) }; $f(['a','b']))", None, 2),
    ("($f := function($x)<o:o>{ $x }; $f({'a':1}))", None, {'a': 1}),
    ('($f := function($x)<j>{ $x }; $f(5))', None, 5),
    ('($f := function($x)<x>{ 1 }; $f(5))', None, 1),
    ('($f := function($x)<a:n>{ $count($x) }; $f(5))', None, 1),
    ('($f := function($x)<(ns):s>{ $string($x) }; $f(5))', None, '5'),
    ('(5).($add2 := function($x, $y)<n-n:n>{ $x + $y }; $add2(2))', None, 7),
    # round-12: optional specs and SUPPLIED undefined still pass where a
    # MISSING required arg now raises (see the errors group)
    ('($f := function($x)<n?>{ $x ? $x : 99 }; $f())', None, 99),
    ("($f := function($x)<n?>{ $x ? $x : 99 }; $f(blank))", None, 99),
    ('($f := function($xs)<n+>{ $sum([$xs]) }; $f(1))', None, 1),
]

GROUPS["encoding2"] = [
    ("$encodeUrlComponent('a b&c')", None, 'a%20b%26c'),
    ("$decodeUrlComponent('a%20b')", None, 'a b'),
    ("$encodeUrl('a b')", None, 'a%20b'),
    ("$decodeUrl('a%20b')", None, 'a b'),
    ("$base64encode('')", None, ''),
    ("$base64decode('')", None, ''),
    ("$base64encode('a')", None, 'YQ=='),
]

GROUPS["blocks"] = [
    ('(1)', None, 1),
    ('(1; 2)', None, 2),
    ('($x := 1; $y := 2; $x + $y)', None, 3),
    ('(a; b)', {'a': 1, 'b': 2}, 2),
    ('($x := a; $x + 1)', {'a': 4}, 5),
]

GROUPS["fields"] = [
    ('a', {'a': 'hello'}, 'hello'),
    ('a.b.c', {'a': {'b': {'c': [1, 2]}}}, [1, 2]),
    ('`true`', {'true': 1}, 1),
    ('`function`', {'function': 2}, 2),
    ('`a b`.`c.d`', {'a b': {'c.d': 3}}, 3),
]

GROUPS["flattening"] = [
    # per-item step predicates under a fan-out (round-11 tier-1 fix:
    # [idx] binds to the step BEFORE the path flattens)
    ('a.b[1]', {'a': [{'b': [1, 2]}, {'b': [3]}]}, 2),
    ('a.b[-1]', {'a': [{'b': [1, 2]}, {'b': [3, 4]}]}, [2, 4]),
    ('a.b[[0,1]]', {'a': [{'b': [1, 2, 9]}, {'b': [3, 4]}]}, [1, 2, 3, 4]),
    ('a.b[$ > 1]', {'a': [{'b': [1, 2]}, {'b': [3]}]}, [2, 3]),
    ('a.b[0]', {'a': [{'b': 1}, {'b': 2}]}, [1, 2]),
    ('a.b', {'a': [{'b': 1}, {'b': [2, 3]}]}, [1, 2, 3]),
    ('a.b', {'a': {'b': [[1], [2]]}}, [[1], [2]]),
    ('[a.b]', {'a': [{'b': 1}, {'b': 2}]}, [1, 2]),
    ('a.b[0]', {'a': [{'b': [1, 2]}, {'b': [3, 4]}]}, [1, 3]),
    ('(a.b)[0]', {'a': [{'b': [1, 2]}, {'b': [3, 4]}]}, 1),
    ('a.b[0][]', {'a': {'b': 5}}, [5]),
    ('$.a', {'a': [1, [2]]}, [1, [2]]),
    ('a[0].b', {'a': [{'b': 1}, {'b': 2}]}, 1),
]

GROUPS["hof2"] = [
    ("$each({'a':1,'b':2}, function($v,$k){$v})", None, [1, 2]),
    ("$sift({'a':1}, function($v,$k,$o){ $o.a = 1 })", None, {'a': 1}),
    ('$single([5], function($v){true})', None, 5),
    ('$map([1,2,3], $sum)', None, [1, 2, 3]),
    ('$reduce([1,2,3,4], $append)', None, [1, 2, 3, 4]),
    ("$filter([{'a':1},{'a':2}], function($v){$v.a>1})", None, {'a': 2}),
    ('$map([], function($v){$v})', None, UNDEFINED),
    ('$filter([], function($v){true})', None, UNDEFINED),
]

GROUPS["string_fns2"] = [
    ("$pad('x', 0)", None, 'x'),
    ("$pad('', 2, '*')", None, '**'),
    ('$string(123456789.123456789)', None, '123456789.12345679'),
    ("$substring('hello', 0, -1)", None, ''),
    ("$substring('hello', 10)", None, ''),
    ("$uppercase('')", None, ''),
    ("$split('', 'x')", None, ['']),
    ("$split('', '')", None, []),
    ("$join([], '')", None, ''),
    ("$replace('aaa', 'a', 'b', 0)", None, 'aaa'),
    ("$replace('', 'a', 'b')", None, ''),
    ("$contains('abc', '')", None, True),
    ("$length(' ')", None, 1),
    ("$trim('abc')", None, 'abc'),
    ("$substringBefore('', 'a')", None, ''),
    ("$substringAfter('', 'a')", None, ''),
]

GROUPS["numeric_fns2"] = [
    ('$round(0.5)', None, 0),
    ('$round(1.5)', None, 2),
    ('$round(-0.5)', None, 0),
    ('$round(1.25, 1)', None, 1.2),
    ('$round(1.35, 1)', None, 1.4),
    ('$round(123.456, -1)', None, 120),
    ('$round(123.456, -2)', None, 100),
    ('$floor(0.999999)', None, 0),
    ('$ceil(0.000001)', None, 1),
    ('$power(0, 0)', None, 1),
    ('$power(-2, 3)', None, -8),
    ('$sqrt(0)', None, 0),
    ("$number('  12  ')", None, 12),
    ("$number('1.5e3')", None, 1500),
    ("$number('-0')", None, 0),
    ('$formatBase(0, 2)', None, '0'),
    ('$formatBase(0.9, 2)', None, '1'),
    ('$formatBase(-255, 16)', None, '-ff'),
]

GROUPS["array_fns2"] = [
    ('$append(nothing, 1)', {'x': 1}, 1),
    ('$append(1, nothing)', {'x': 1}, 1),
    ('$count(nothing)', {'x': 1}, 0),
    ("$reverse('a')", None, ['a']),
    ('$reverse([1])', None, [1]),
    ('$sort([])', None, []),
    ('$sort(5)', None, [5]),
    ('$distinct(nothing)', {'x': 1}, UNDEFINED),
    ('$zip([1,2])', None, [[1], [2]]),
    ('$shuffle([])', None, []),
    ('$shuffle([7])', None, [7]),
    ('$distinct([null, null])', None, [None]),
    ('$distinct([[1],[1],[2]])', None, [[1], [2]]),
]

GROUPS["object_fns2"] = [
    ("$keys({'a':1}.'b')", None, UNDEFINED),
    ("$keys('str')", None, UNDEFINED),
    ('$keys([1,2])', None, UNDEFINED),
    ("$lookup({'a': {'b': 1}}, 'a')", None, {'b': 1}),
    ("$merge({'a':1})", None, {'a': 1}),
    ('$merge([{}])', None, {}),
    ("$spread([{'a':1,'b':2},{'c':3}])", None, [{'a': 1}, {'b': 2}, {'c': 3}]),
    ("$spread('x')", None, 'x'),
    ('$spread([])', None, UNDEFINED),
    ('$each({}, function($v,$k){$v})', None, UNDEFINED),
    ('$sift({}, function($v){true})', None, UNDEFINED),
]

GROUPS["parent_op"] = [
    # round-11: % across MULTIPLE fan-out levels (now also compiled —
    # nested transforms carry the full ancestor chain)
    ("a.b.c.{'v': v, 'top': %.%.t}",
     {"a": [{"t": "T1", "b": [{"c": [{"v": 1}, {"v": 2}]}]},
            {"t": "T2", "b": [{"c": [{"v": 3}]}]}]},
     [{"v": 1, "top": "T1"}, {"v": 2, "top": "T1"}, {"v": 3, "top": "T2"}]),
    ("x.y.z.w.{'v': n, 'a3': %.%.%.tag}",
     {"x": [{"tag": "A", "y": [{"z": [{"w": [{"n": 1}, {"n": 2}]}]}]},
            {"tag": "B", "y": [{"z": [{"w": [{"n": 3}]}]}]}]},
     [{"v": 1, "a3": "A"}, {"v": 2, "a3": "A"}, {"v": 3, "a3": "B"}]),
    ("a.b.(%.t)",
     {"a": [{"t": "T1", "b": [{"u": 1}]},
            {"t": "T2", "b": [{"u": 2}, {"u": 3}]}]},
     ["T1", "T2", "T2"]),
    ('a.b.%', {'a': {'b': 1, 'c': 2}}, {'b': 1, 'c': 2}),
    ('a.b.%.c', {'a': {'b': 1, 'c': 2}}, 2),
    ("items.{'n': name, 'p': %.order}", {'order': 7, 'items': [{'name': 'x'}]}, {'n': 'x', 'p': 7}),
    ('a.b.%.%.r', {'r': 9, 'a': {'b': {'z': 0}}}, 9),
]

GROUPS["context_subst"] = [
    ("'abc' ~> $uppercase", None, 'ABC'),
    ('a.$uppercase()', {'a': 'x'}, 'X'),
    ("['a','b'].$uppercase()", None, ['A', 'B']),
    ('a.$length()', {'a': 'abc'}, 3),
    ('a.($uppercase($))', {'a': 'x'}, 'X'),
    ('Account.Order.$sum(Product.Price)', {'Account': {'Order': [{'Product': [{'Price': 1}, {'Price': 2}]}, {'Product': [{'Price': 3}]}]}}, [3, 3]),
]

GROUPS["order_by2"] = [
    ('a^($)', {'a': [2, 1]}, [1, 2]),
    ('a^($)', {'a': [1]}, 1),
    ('a^(b)', {'a': [{'b': 'y'}, {'b': 'x'}]}, [{'b': 'x'}, {'b': 'y'}]),
    ('a^(b)', {'a': [{'b': 1}, {}]}, [{'b': 1}, {}]),
    ('a^(b)[0]', {'a': [{'b': 2}, {'b': 1}]}, {'b': 1}),
    ('a^(x).y', {'a': [{'x': 2, 'y': 'b'}, {'x': 1, 'y': 'a'}]}, ['a', 'b']),
]

GROUPS["deep_nesting"] = [
    ('a.b.c.d.e', {'a': {'b': {'c': {'d': {'e': 42}}}}}, 42),
    ('l1.l2[x>1].l3.v', {'l1': {'l2': [{'x': 1, 'l3': {'v': 'no'}}, {'x': 2, 'l3': {'v': 'yes'}}]}}, 'yes'),
    ('o.a[0].b[1].c', {'o': {'a': [{'b': [{'c': 1}, {'c': 2}]}]}}, 2),
]

GROUPS["errors"] = [
    "$sqrt(-1)",
    "1/0",
    # out-of-range $N group refs error in tier 2; the compiler must route
    # them there (NotCompilable), never to Java Matcher at action time
    "$replace('abc', /(b)/, '[$2]')",
    "$replace('abc', /(b)/, '[$15]')",
    "$sort([1,'a'])",
    "$uppercase(5)",
    "1 +",
    "[1,2",
    "{'a': }",
    "$unknownFunction()",
    "$number('abc')",
    "$number([1])",
    "1 + 'a'",
    "'a' < 1",
    "$formatBase(10, 40)",
    "a.b[",
    "$error('boom')",
    "$assert(false, 'bad')",
    "10 % 0",
    "1/0",
    "$sort([1,'a'])",
    "$single([1,2], function($v){ $v > 5 })",
    "1 < 2 < 3",
    # non-tail recursion past the depth guard still errors (TCO must not
    # disable the guard)
    "($f := function($n){ $n <= 1 ? 1 : $n * $f($n-1) }; $f(5000))",
    # round-11 suite port
    "'it''s'",
    'not(true)',
    '[1..2.5]',
    "['a'..'c']",
    "{'a':1, 'a':2}",
    'null < 1',
    'null + 1',
    'true + 1',
    '[1] + 1',
    "'a' - 'b'",
    '{} * 2',
    "$substring('abc', 'x')",
    '$substring(5, 1)',
    '$lowercase(5)',
    "$split('abc', 5)",
    '$join([1,2])',
    "$join('a', 5)",
    "$sum(['a'])",
    "$sum([1,'a'])",
    "$max(['a','b'])",
    "$average(['a'])",
    "$abs('a')",
    "$floor('a')",
    '$power(99, 999999)',
    '$sqrt(-4)',
    '$formatBase(10, 1)',
    '$formatBase(10, 37)',
    '$count([1],[2])',
    '$boolean(1,2)',
    "$keys('a','b')",
    "{'a'",
    '[1;2]',
    '@ $',
    '2 ** 3',
    '($f := function($x)<s:s>{ $x }; $f(5))',
    "($f := function($x)<n>{ $x }; $f('a'))",
    '($f := function($x)<z>{ 1 }; $f(5))',
    "($f := function($x)<a<n>:n>{ $count($x) }; $f(['a']))",
    '($f := function($x)<(ns):s>{ $string($x) }; $f(true))',
    '()',
    '(1; 2; )',
    '`$`?',
    '$single([1,2], function($v){true})',
    '$single([], function($v){true})',
    '$power(-8, 1/3)',
    '$zip()',
    # round-12 ADVICE: anchored-signature arity — a missing required arg
    # and extra args beyond a non-variadic signature are both T0410
    '($f := function($x)<n>{ $x + 1 }; $f())',
    '($f := function($x)<n>{ $x }; $f(1, 2))',
    '($f := function($x, $y)<nn>{ $x }; $f(1))',
]


ALL_CASES = [
    (group, expr, data, expected)
    for group, cases in GROUPS.items()
    if group != "errors"
    for (expr, data, expected) in cases
]


@pytest.mark.parametrize(
    "group,expr,data,expected",
    ALL_CASES,
    ids=[f"{g}:{e[:44]}" for g, e, _, _ in ALL_CASES],
)
def test_conformance_case(group, expr, data, expected):
    got = ev(expr, data)
    if expected is UNDEFINED:
        assert got is UNDEFINED, f"{expr}: expected no result, got {got!r}"
        return
    if isinstance(expected, float) and not isinstance(expected, bool):
        assert isinstance(got, (int, float)) and got == pytest.approx(
            expected, rel=1e-12
        ), f"{expr}: {got!r} != {expected!r}"
    else:
        assert got == expected, f"{expr}: {got!r} != {expected!r}"
        if isinstance(expected, bool):
            assert isinstance(got, bool)


@pytest.mark.parametrize("expr", GROUPS["errors"], ids=lambda e: e[:44])
def test_conformance_error_case(expr):
    with pytest.raises(JsonataError):
        ev(expr, {"a": {"b": 1}})


def conformance_counts() -> dict[str, int]:
    """Reported in COVERAGE.md."""
    return {g: len(cs) for g, cs in GROUPS.items()}


# ---------------------------------------------------------------------------
# dual-tier sweep: the compilable subset must produce identical rows through
# the tier-1 Column compiler and the tier-2 interpreter
# ---------------------------------------------------------------------------

DUAL_TIER_EXPRS = [
    "{'n': $uppercase(first), 'l': $length(last)}",
    "{'m': first & ' ' & last}",
    "age > 30 ? {'id': id} : null",
    "{'s': $sum(scores), 'c': $count(scores), 'mx': $max(scores)}",
    "{'t': $split(tags, ','), 'j': $join($split(tags, ','), '-')}",
    "{'sub': $substring(first, 0, 2), 'ct': $contains(first, 'r')}",
    "{'r': $round(age / 3, 1), 'p': $power(2, 3), 'f': $floor(age / 10)}",
    "{'lo': $lowercase(last), 'tr': $trim(first), 'sb': $substringBefore(tags, ',')}",
    "{'b': $boolean(age), 'e': $exists(first), 'nn': $not(age > 100)}",
    "{'abs': $abs(age - 100), 'sq': $sqrt(age * age)}",
    # round-9 tranche: positional/focus binds, keep-array, and expression
    # path steps over arrays (B1.8 / B1.10 in tier 1). Aggregated so the
    # documented singleton-unwrap / empty-sequence representation
    # conventions (SURVEY §1.3) don't trip the strict row compare — the
    # structural array outputs are pinned on a multi-element corpus in
    # tests/test_round9_ops.py.
    "{'i': $count(scores) > 0 ? $sum(scores#$i.($i)) : -1,"
    " 'v': $count(scores) > 0 ? $sum(scores@$v.($v * 2)) : -1,"
    " 'd': $count(scores) > 0 ? $sum(scores.($ * 2)) : -1,"
    " 'k': $count(scores[]), 'one': $count(age[])}",
]


def test_compiled_number_rendering_matches_tier2(spark):
    """Round-7: $string(double) is compiled (js_canonical_number) instead of
    forcing whole-expression tier-2 fallback. Pin its precision contract:
    bit-exact with tier 2's js_number_string for (a) every <=15-significant-
    digit double (seeded random-mantissa fuzz), (b) the full exponent
    ladder, (c) the JS plain/exponent boundary values, signs and zeros.
    (16-17-digit adversarial doubles may differ by one unit in the last
    decimal place — documented contract in the compiler docstring; both
    renderings parse to the identical double.)"""
    import random
    import struct

    from pyspark.sql import functions as F

    from kafka_connect_jsonata_spark.jsonata.compiler import js_canonical_number
    from kafka_connect_jsonata_spark.jsonata.functions import js_number_string

    rng = random.Random(0xC0FFEE)
    vals: list[float] = []
    # random-mantissa doubles across the full binary-exponent range,
    # truncated to <=15 significant digits via round-trip through repr
    for _ in range(4000):
        b = (rng.randint(1, 2046) << 52) | rng.getrandbits(52)
        x = struct.unpack("<d", struct.pack("<Q", b))[0]
        r = repr(x)
        digits = r.split("e")[0].replace(".", "").replace("-", "").lstrip("0")
        if len(digits.rstrip("0")) <= 15:
            vals.append(x)
        else:
            # shorten: keep 15 significant digits, still a valid double
            vals.append(float(f"{x:.14e}"))
    for e in range(-320, 309):
        for m in ("1", "-1.5", "9.25"):
            try:
                v = float(f"{m}e{e}")
            except OverflowError:
                continue
            if v == 0 or abs(v) == float("inf"):
                continue
            vals.append(v)
    vals += [0.0, -0.0, 1.0, -1.0, 0.5, 1e-6, 9.99e-7, 1e21,
             999999999999999900000.0, 1e-7, 5e-7, 123456789.123, 1 / 32]
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    out = df.select("x", js_canonical_number(F.col("x")).alias("s")).collect()
    bad = [
        (r["x"], js_number_string(r["x"]), r["s"])
        for r in out
        if js_number_string(r["x"]) != r["s"]
    ]
    assert not bad, bad[:5]


def test_dual_tier_conformance(spark):
    from kafka_connect_jsonata_spark.jsonata.compiler import NotCompilable
    from kafka_connect_jsonata_spark.transform import transform

    df = spark.createDataFrame(
        [
            (1, "Fred", "Smith", 28, [3.0, 5.0], "a,b"),
            (2, "Rita", "Jones", 44, [1.5], "x,y,z"),
            (3, "Ana", "  Li ", 31, [], ""),
        ],
        "id long, first string, last string, age long, scores array<double>, tags string",
    )
    compiled_n = 0
    for expr in DUAL_TIER_EXPRS:
        try:
            c = transform(df, expr, force_tier="compiled")
        except NotCompilable:
            continue
        i = transform(df, expr, force_tier="interpreter", output_schema=c.schema)
        cr = sorted(map(str, c.collect()))
        ir = sorted(map(str, i.collect()))
        assert cr == ir, f"tier divergence for {expr!r}"
        compiled_n += 1
    # the sweep is vacuous if the compiler bails on most of the subset
    assert compiled_n >= 7, f"only {compiled_n} expressions compiled"


def test_dual_tier_constant_corpus_sweep(spark):
    """Every context-free conformance case whose expression the tier-1
    compiler accepts must produce the same value through BOTH tiers —
    widens the 10-expression dual-tier sweep to the whole corpus. The
    interpreter is the semantics oracle; the compiled Column must agree
    cell-for-cell (compared through the interpreter's own JSON rendering
    of the collected value)."""
    import json

    from kafka_connect_jsonata_spark.jsonata.compiler import NotCompilable
    from kafka_connect_jsonata_spark.transform import transform

    df = spark.createDataFrame([(1,)], "id long")

    def norm(v):
        # Row/array/map -> plain python for comparison
        if hasattr(v, "asDict"):
            return {k: norm(x) for k, x in v.asDict().items()}
        if isinstance(v, dict):
            return {k: norm(x) for k, x in v.items()}
        if isinstance(v, list):
            return [norm(x) for x in v]
        if isinstance(v, float) and v == int(v) and abs(v) < 1e15:
            return int(v)
        return v

    # documented typed-tier deviation (SURVEY §4 table "missing-vs-null"):
    # the compiled tier represents JSON null as SQL NULL, which conflates
    # null-the-value with absent — existence/equality ON null itself
    # therefore differs by design; everything else must agree.
    NULL_CONFLATION = {
        "$exists(null)",
        "$boolean(null)",
        "null = null",
        "$string(null)",
        "$type(null)",
    }

    compiled_n = skipped = diverged = 0
    failures = []
    for group, cases in GROUPS.items():
        if group == "errors":
            continue
        for expr, data, expected in cases:
            if data is not None:
                continue  # context-dependent: covered by the interpreter run
            if expr in NULL_CONFLATION:
                skipped += 1
                continue
            try:
                c = transform(df, expr, force_tier="compiled")
            except Exception:
                skipped += 1  # NotCompilable or unsupported: interpreter-only
                continue
            try:
                rows = c.collect()
                if len(c.columns) == 1 and c.columns[0] in ("__result", "value"):
                    cval = [norm(r[0]) for r in rows]
                else:
                    # top-level object constructors spread into columns
                    cval = [norm(r) for r in rows]
            except Exception:
                skipped += 1  # compiles but not executable on this shape
                continue
            got = ev(expr, None)
            if got is UNDEFINED:
                want = [None]
            else:
                want = [norm(json.loads(json.dumps(got)))]
            # documented sequence-representation convention (SURVEY §1.3):
            # the typed tier renders an empty result sequence as [] (typed
            # empty array) or drops the row (tombstone); the dynamic tier
            # renders it as absent/undefined. Treat those as agreeing.
            if want == [None] and cval in ([], [[]], [None]):
                compiled_n += 1
                continue
            # sequence-representation convention (SURVEY §1.3): the typed
            # tier keeps arrays where the dynamic tier unwraps singletons —
            # compiled [X] agreeing with want [[X's elements]] is a match
            if len(cval) == 1 and isinstance(cval[0], list) and cval[0] == want:
                compiled_n += 1
                continue
            if cval != want:
                diverged += 1
                failures.append((expr, cval, want))
            else:
                compiled_n += 1
    assert not failures, failures[:5]
    # the sweep must be substantive, not vacuous
    # round-8 constant folding lifted the share from ~300 to 371/384;
    # round-10 ($eval non-literal context, parent-in-step ancestry) to 377;
    # round-11 grows the corpus itself by ~420 suite-port cases — measured
    # 631 compiled / 22 interpreter-only on the grown corpus; round-12
    # (top-level StaticallyUndefined fold, range/append undefined
    # operands, spliced wildcards, ProvablyUndefinedValue evaluation
    # proofs): measured 651 / 17; round-13 (node-tagged PUV proofs,
    # unbound-variable-as-undefined, undefined lambda-arg bindings):
    # measured 655 / 13
    assert compiled_n >= 650, (compiled_n, skipped)
    print(f"\nconstant-sweep compiled: {compiled_n}, interpreter-only: {skipped}")


def test_dual_tier_context_corpus_sweep(spark):
    """Context-DEPENDENT corpus cases (dict inputs) through both tiers:
    the input object becomes a one-row DataFrame, so compiled paths,
    predicates, and constructors over real structures are cross-checked
    against the interpreter — the surface the engine actually runs on
    user tables."""
    import json

    from kafka_connect_jsonata_spark.transform import transform

    def norm(v):
        if hasattr(v, "asDict"):
            return {k: norm(x) for k, x in v.asDict().items()}
        if isinstance(v, dict):
            return {k: norm(x) for k, x in v.items()}
        if isinstance(v, list):
            return [norm(x) for x in v]
        if isinstance(v, float) and v == int(v) and abs(v) < 1e15:
            return int(v)
        return v

    # documented typed-tier deviation (SURVEY §4 "missing-vs-null"): SQL
    # NULL conflates null-the-value with absent, so equality/sorting ON a
    # null value differs by design; plus cases whose data mixes TYPES in
    # one array position (long vs array) — spark.read.json can only infer
    # them as strings, so the compiled tier never sees the real shape
    # (test-harness representability, not an engine deviation).
    CONTEXT_EXEMPT = {
        ("a = null", '{"a": null}'),     # null-conflation (documented)
        # missing-key sort: compiled sees SQL NULL where jsonata has an
        # absent key (same conflation)
        ("a^(b)", '{"a": [{"b": 1}, {}]}'),
        # heterogeneous array item types -> spark.read.json infers strings
        ("a.b", '{"a": [{"b": 1}, {"b": [2, 3]}]}'),
        ("$.a", '{"a": [1, [2]]}'),
    }
    compiled_n = skipped = 0
    failures = []
    for group, cases in GROUPS.items():
        if group == "errors":
            continue
        for expr, data, expected in cases:
            if not isinstance(data, dict) or not data:
                continue
            if (expr, json.dumps(data, sort_keys=True)) in CONTEXT_EXEMPT:
                skipped += 1
                continue
            try:
                # json inference keeps ints/doubles typed (createDataFrame
                # from a raw dict infers map<string,string> instead)
                df = spark.read.json(
                    spark.sparkContext.parallelize([json.dumps(data)])
                )
            except Exception:
                skipped += 1  # schema inference can't type this input
                continue
            try:
                c = transform(df, expr, force_tier="compiled")
                rows = c.collect()
                if len(c.columns) == 1 and c.columns[0] in ("__result", "value"):
                    cval = [norm(r[0]) for r in rows]
                else:
                    cval = [norm(r) for r in rows]
            except Exception:
                skipped += 1
                continue
            got = ev(expr, data)
            want = [None] if got is UNDEFINED else [norm(json.loads(json.dumps(got)))]
            if want == [None] and cval in ([], [[]], [None]):
                compiled_n += 1
                continue
            # sequence-representation convention (SURVEY §1.3): the typed
            # tier keeps arrays where the dynamic tier unwraps singletons —
            # compiled [X] agreeing with want [[X's elements]] is a match
            if (
                len(cval) == 1
                and isinstance(cval[0], list)
                and cval[0] == want
            ):
                compiled_n += 1
                continue
            if cval != want:
                failures.append((expr, cval, want))
            else:
                compiled_n += 1
    assert not failures, failures[:5]
    # round-9 binds/keep-array/expression-step tranche lifted 30 -> 35;
    # round-11 suite port + per-item step predicates: measured 124;
    # round-12 undefined-fold + wildcard-splice + *.* fusion: measured 157
    # (round-13 re-measured 157 after the PUV node-tagging soundness fix
    # — the tightening lost nothing)
    assert compiled_n >= 155, (compiled_n, skipped)
    print(f"\ncontext-sweep compiled: {compiled_n}, interpreter-only: {skipped}")


def test_out_of_range_group_ref_not_compilable():
    """Out-of-range $N in a $replace replacement must raise NotCompilable
    at COMPILE time (so auto tier falls back to the interpreter's error
    semantics), never surface as a Java INVALID_REGEXP_REPLACE at action
    time after tier selection (round-6 ADVICE fix)."""
    from pyspark.sql import types as T

    from kafka_connect_jsonata_spark.jsonata.compiler import Compiler, NotCompilable

    c = Compiler(T.StructType([T.StructField("s", T.StringType())]))
    for expr in (
        "$replace('abc', /(b)/, '[$2]')",
        "$replace('abc', /(b)/, '[$15]')",
    ):
        with pytest.raises(NotCompilable):
            c.compile(expr)
    # in-range refs and literal dollars still compile
    c.compile("$replace('abc', /(b)/, '[$1]')")
    c.compile("$replace('a-b', /-/, ' $ ')")


def test_undefined_folding_limited_to_pure_paths(spark):
    """Round-7 review fix, widened in round 9: a PROVABLY-undefined bare
    path folds (object pair omitted, $count = 0, $exists = false), and an
    OPERATOR over the absent field now compiles to its defined JSONata
    result IN TIER 1 (b = 1 is false, b & 'x' is 'x', b ? 1 : 2 is 2) —
    the interpreter remains the semantics oracle for each value."""
    from kafka_connect_jsonata_spark.transform import transform

    df = spark.createDataFrame([("v",)], "a string")
    # pure paths fold
    assert transform(df, "$count(nothing)", force_tier="compiled").first()[0] == 0
    assert (
        transform(df, "$exists(nothing)", force_tier="compiled").first()[0]
        is False
    )
    row = transform(
        df, "{'keep': a, 'gone': missing.field}", force_tier="compiled"
    ).first()
    assert row.asDict() == {"keep": "v"}
    # operators over the absent field resolve to their DEFINED results in
    # tier 1 (round 9: _binary/condition catch StaticallyUndefined)
    for expr, want in (
        ("{'r': b = 1}", {"r": False}),
        ("{'r': b & 'x'}", {"r": "x"}),
        ("{'r': b ? 1 : 2}", {"r": 2}),
        ("$count(b = 1)", 1),
        ("$exists(b = 1)", True),
    ):
        got = transform(df, expr, force_tier="compiled").first()
        got = got.asDict() if expr.startswith("{") else got[0]
        assert got == want, (expr, got, want)
    # and through the default two-tier transform they give the same values
    out = transform(df, "{'r': b ? 1 : 2}").first().asDict()
    assert out == {"r": 2}
