"""JSONata semantic corpus for the tier-2 interpreter.

Covers SURVEY.md §2B (language surface) plus the reference's own test
expressions (reference JsonataTransformationTest.java, README.md) and the
divergence spots flagged in SURVEY.md §5.3 (singleton rule, missing-vs-null,
banker's rounding, $trim collapse, negative indexes, group-by duplicates).
"""

from __future__ import annotations

import pytest

from kafka_connect_jsonata_spark.jsonata.errors import JsonataError
from kafka_connect_jsonata_spark.jsonata.interpreter import UNDEFINED, jsonata


def ev(expr, data=None, **kw):
    return jsonata(expr, **kw).evaluate(data)


CASES = [
    # --- literals, arithmetic, comparison (B3)
    ("1+2", None, 3),
    ("7 % 4", None, 3),
    ("-7 % 4", None, -3),  # JS remainder semantics
    ("10 / 4", None, 2.5),
    ("6 / 3", None, 2),  # integral floats normalize like JS
    ("2 < 3 and 3 <= 3", None, True),
    ("'a' & 'b' & 1", None, "ab1"),
    ("'h' in ['h','i']", None, True),
    ("5 in 5", None, True),
    ("true and false", None, False),
    ("true or false", None, True),
    # --- paths (B1)
    ("a.b", {"a": {"b": 42}}, 42),
    ("a.b", {"a": [{"b": 1}, {"b": 2}]}, [1, 2]),
    ("a.b.c", {"a": {"b": {"c": "x"}}}, "x"),
    ("a.b[0]", {"a": [{"b": [1, 2]}, {"b": [3, 4]}]}, [1, 3]),  # per-step predicate
    ("(a.b)[0]", {"a": [{"b": [1, 2]}, {"b": [3, 4]}]}, 1),     # whole-sequence
    ("a[-1]", {"a": [1, 2, 3]}, 3),
    ("a[[0,1]]", {"a": [1, 2, 3]}, [1, 2]),
    ("Phone[type='mobile'].number",
     {"Phone": [{"type": "home", "number": "1"}, {"type": "mobile", "number": "2"}]}, "2"),
    ("*", {"a": 1, "b": 2}, [1, 2]),
    ("**.b", {"a": {"b": 1}, "c": [{"b": 2}]}, [1, 2]),
    ("$", {"x": 1}, {"x": 1}),
    ("$$.x", {"x": 1}, 1),
    ("foo[bar > 2].baz", {"foo": [{"bar": 1, "baz": "a"}, {"bar": 3, "baz": "b"}]}, "b"),
    ("Account.Order.Product.(Price * Quantity)",
     {"Account": {"Order": [{"Product": [{"Price": 2, "Quantity": 3},
                                          {"Price": 4, "Quantity": 1}]}]}}, [6, 4]),
    # parent operator
    ("a.b.%.c", {"a": {"b": {"x": 1}, "c": 9}}, 9),
    # --- constructors, group-by, sort, range (B2)
    ("{'a': 1, 'b': [2,3]}", None, {"a": 1, "b": [2, 3]}),
    ("[1, 2, [3]]", None, [1, 2, [3]]),
    ("1..5", None, [1, 2, 3, 4, 5]),
    ("[1..3].($ * 2)", None, [2, 4, 6]),
    ("a.[b]", {"a": [{"b": 1}, {"b": 2}]}, [[1], [2]]),
    ("items{cat: $sum(qty)}",
     {"items": [{"cat": "a", "qty": 1}, {"cat": "b", "qty": 2}, {"cat": "a", "qty": 3}]},
     {"a": 4, "b": 2}),
    ("items^(price)", {"items": [{"price": 3}, {"price": 1}, {"price": 2}]},
     [{"price": 1}, {"price": 2}, {"price": 3}]),
    ("items^(>price).price", {"items": [{"price": 3}, {"price": 1}, {"price": 2}]}, [3, 2, 1]),
    # dotted object constructor maps PER ITEM (docs: Phone.{type: number});
    # the un-dotted suffix `lines{...}` is the group-by form
    ("lines.{'k': qty}", {"lines": [{"qty": 1}, {"qty": 2}]}, [{"k": 1}, {"k": 2}]),
    ("lines{'k': qty}", {"lines": [{"qty": 1}, {"qty": 2}]}, {"k": [1, 2]}),
    ("(a; b)", {"a": 1, "b": 2}, 2),
    ("($x := 5; $x * 2)", None, 10),
    ("x ? 'y' : 'n'", {"x": True}, "y"),
    ("x ? 'y' : 'n'", {"x": 0}, "n"),
    # --- lambdas, HOFs, apply (B2.10, B4 HOF)
    ("$map([1,2,3], function($v) { $v * 2 })", None, [2, 4, 6]),
    ("$filter([1,2,3,4], function($v) { $v % 2 = 0 })", None, [2, 4]),
    ("$reduce([1,2,3,4], function($a,$b){ $a + $b })", None, 10),
    ("$reduce([1,2,3], function($a,$b){ $a + $b }, 10)", None, 16),
    ("$single([1,2,3], function($v){ $v = 2 })", None, 2),
    ("($f := function($n){ $n <= 1 ? 1 : $n * $f($n-1) }; $f(5))", None, 120),
    ("a ~> $sum", {"a": [1, 2]}, 3),
    ("[1,2] ~> $map(function($v){$v+1})", None, [2, 3]),
    ("'abc' ~> $uppercase ~> $substring(0,2)", None, "AB"),
    ("($add := function($a,$b){$a+$b}; $add2 := $add(?, 2); $add2(3))", None, 5),
    ("($inc := function($x){$x+1}; $dbl := function($x){$x*2}; ($inc ~> $dbl)(3))", None, 8),
    # --- transform operator
    ("payload ~> |$|{'touched': true}|", {"payload": {"a": 1}}, {"a": 1, "touched": True}),
    ("$ ~> |value|{'b':2},['a']|", {"value": {"a": 1}}, {"value": {"b": 2}}),
    # --- string functions
    ("$uppercase('abc')", None, "ABC"),
    ("$lowercase('ABC')", None, "abc"),
    ("$length('hello')", None, 5),
    ("$substring('hello', -3)", None, "llo"),
    ("$substring('hello', 1, 3)", None, "ell"),
    ("$substringBefore('a-b', '-')", None, "a"),
    ("$substringAfter('a-b', '-')", None, "b"),
    ("$substringAfter('ab', 'x')", None, "ab"),
    ("$trim('  a   b  ')", None, "a b"),
    ("$pad('x', 5, '-')", None, "x----"),
    ("$pad('x', -5, '-')", None, "----x"),
    ("$contains('hello', 'ell')", None, True),
    ("$contains('hello', /l{2}/)", None, True),
    ("$split('a,b,c', ',')", None, ["a", "b", "c"]),
    ("$split('a1b2c', /\\d/)", None, ["a", "b", "c"]),
    ("$join(['a','b'], '-')", None, "a-b"),
    ("$string(2.0)", None, "2"),
    ("$string({'a': 1.0})", None, '{"a":1}'),
    ("$string([1,'x'])", None, '[1,"x"]'),
    ("$base64encode('hello')", None, "aGVsbG8="),
    ("$base64decode('aGVsbG8=')", None, "hello"),
    ("$encodeUrlComponent('a b&c')", None, "a%20b%26c"),
    ("$decodeUrlComponent('a%20b%26c')", None, "a b&c"),
    ("$match('ababa', /ab/)", None,
     [{"match": "ab", "index": 0, "groups": []}, {"match": "ab", "index": 2, "groups": []}]),
    ("$match('a1b2', /([a-z])(\\d)/).groups", None, ["a", "1", "b", "2"]),  # arrays flatten on step
    ("$replace('a-b-c', /-/, '_')", None, "a_b_c"),
    ("$replace('a-b-c', '-', '_', 1)", None, "a_b-c"),
    ("$replace('John Smith', /(\\w+)\\s(\\w+)/, '$2 $1')", None, "Smith John"),
    # --- numeric functions
    ("$number('3.14')", None, 3.14),
    ("$number('0x1F')", None, 31),
    ("$abs(-5)", None, 5),
    ("$floor(3.7)", None, 3),
    ("$ceil(3.2)", None, 4),
    ("$round(2.5)", None, 2),   # banker's rounding
    ("$round(3.5)", None, 4),
    ("$round(2.675, 2)", None, 2.68),
    ("$power(2, 10)", None, 1024),
    ("$sqrt(16)", None, 4),
    ("$formatNumber(12345.678, '#,##0.00')", None, "12,345.68"),
    ("$formatNumber(0.5, '0%')", None, "50%"),
    ("$formatBase(255, 16)", None, "ff"),
    ("$formatInteger(7, 'w')", None, "seven"),
    ("$formatInteger(2023, '0000')", None, "2023"),
    ("$formatInteger(12, 'i')", None, "xii"),
    ("$parseInteger('twelve', 'w')", None, 12),
    ("$parseInteger('xii', 'i')", None, 12),
    # --- aggregation
    ("$sum(a)", {"a": [1, 2, 3]}, 6),
    ("$max(a)", {"a": [1, 5, 3]}, 5),
    ("$min(a)", {"a": [4, 2, 3]}, 2),
    ("$average(a)", {"a": [1, 2, 3]}, 2),
    ("$count(a)", {"a": [1, 2, 3]}, 3),
    ("$count(nothing)", {}, 0),
    # --- boolean
    ("$boolean([])", None, False),
    ("$boolean([0,0,1])", None, True),
    ("$boolean('')", None, False),
    ("$boolean({})", None, False),
    ("$not(false)", None, True),
    ("$exists(nothing)", {"a": 1}, False),
    ("$exists(a)", {"a": None}, True),  # null exists; missing does not
    # --- arrays
    ("$append(1, 2)", None, [1, 2]),
    ("$reverse([1,2,3])", None, [3, 2, 1]),
    ("$distinct([1,2,1,3])", None, [1, 2, 3]),
    ("$zip([1,2],[3,4])", None, [[1, 3], [2, 4]]),
    ("$sort([3,1,2])", None, [1, 2, 3]),
    ("$sort(items, function($l,$r){$l.p > $r.p}).p", {"items": [{"p": 2}, {"p": 1}]}, [1, 2]),
    # --- objects
    ("$keys({'a':1,'b':2})", None, ["a", "b"]),
    ("$lookup({'a':1}, 'a')", None, 1),
    ("$spread({'a':1,'b':2})", None, [{"a": 1}, {"b": 2}]),
    ("$merge([{'a':1},{'b':2},{'a':3}])", None, {"a": 3, "b": 2}),
    ("$sift({'a':1,'email':2}, function($v,$k){$k != 'email'})", None, {"a": 1}),
    ("$each({'a':1}, function($v,$k){ $k & '=' & $v })", None, "a=1"),
    ("$type(null)", None, "null"),
    ("$type([1])", None, "array"),
    # --- date/time
    ("$fromMillis(0)", None, "1970-01-01T00:00:00.000Z"),
    ("$fromMillis(1521801216617, '[Y0001]-[M01]-[D01]')", None, "2018-03-23"),
    ("$toMillis('1970-01-02T00:00:00Z')", None, 86400000),
    ("$toMillis('2018-03-23', '[Y0001]-[M01]-[D01]')", None, 1521763200000),
    # --- $eval
    ("$eval('1+1')", None, 2),
    ("$eval('a', {'a': 7})", None, 7),
    # --- reference README idioms (README.md:18,26)
    ("value = null ? null : $", {"value": None}, None),
    ("value = null ? null : $", {"value": 1, "t": "x"}, {"value": 1, "t": "x"}),
]


@pytest.mark.parametrize("expr,data,expected", CASES, ids=[c[0][:48] for c in CASES])
def test_case(expr, data, expected):
    got = ev(expr, data)
    assert got == expected, f"{expr}: {got!r} != {expected!r}"
    # guard against bool/int confusion (Python True == 1)
    if isinstance(expected, bool):
        assert isinstance(got, bool)


def test_missing_vs_null():
    assert ev("a", {}) is UNDEFINED  # missing -> no result sentinel
    # equality with undefined on either side is false, for both = and !=
    assert ev("a = null", {}) is False
    assert ev("a != null", {}) is False
    # the tombstone idiom relies on value being explicitly null in the
    # envelope (reference recordToJsonNode emits NullNode for tombstones)
    assert ev("value = null", {"value": None}) is True
    assert ev("$exists(a)", {}) is False
    assert ev("$exists(a)", {"a": None}) is True


def test_singleton_rule():
    assert ev("a", {"a": [1]}) == [1]      # real array survives
    assert ev("a.b", {"a": [{"b": 1}]}) == 1  # sequence singleton unwraps
    assert ev("a[0].b", {"a": [{"b": 1}]}) == 1
    assert ev("a.b[]", {"a": [{"b": 1}]}) == [1]  # [] keeps the array


def test_group_duplicate_key_error():
    with pytest.raises(JsonataError):
        ev("{'a': 1, 'a': 2}", None)  # same key from two expressions -> D1009


def test_depth_guard():
    # NON-tail infinite recursion trips the depth guard. (A TAIL-position
    # self-call runs in constant stack since the round-11 TCO and is
    # bounded by the TIMEOUT guard instead — see test_timeout_guard.)
    with pytest.raises(JsonataError) as exc:
        ev("($f := function($n){ $f($n+1) + 0 }; $f(0))", max_depth=100)
    assert "U1002" in str(exc.value)


def test_infinite_tail_recursion_hits_timeout_not_stack():
    # TCO means an infinite tail loop cannot blow the stack; the
    # wall-clock guard is what stops it (same shape as jsonata-js)
    with pytest.raises(JsonataError) as exc:
        ev(
            "($f := function($n){ $f($n+1) }; $f(0))",
            timeout_ms=200,
            max_depth=100,
        )
    assert "U1001" in str(exc.value)


def test_timeout_guard():
    with pytest.raises(JsonataError):
        ev("($f := function($n){ $n >= 0 ? $f($n+1) : 0 }; $f(0))", timeout_ms=200, max_depth=10**9)


def test_reference_remove_email():
    """reference JsonataTransformationTest.java:63-108 — schema-as-data
    rewrite: drop a field from both value and valueSchema."""
    expr = """(
      $root := $;
      $removeEmail := function($v, $k) {$k != 'email'};
      $newValue := $sift($root.value, $removeEmail);
      $newValueSchemaFields := $root.valueSchema.fields[name != 'email'];
      $newValueSchema := $merge([$root.valueSchema, {"fields": $newValueSchemaFields}]);
      $merge([$root, {"value": $newValue, "valueSchema": $newValueSchema}])
    )"""
    record = {
        "topic": "test",
        "kafkaPartition": 1,
        "valueSchema": {"type": "STRUCT", "fields": [
            {"name": "first", "schema": {"type": "STRING"}},
            {"name": "last", "schema": {"type": "STRING"}},
            {"name": "email", "schema": {"type": "STRING"}}]},
        "value": {"first": "test", "last": "user", "email": "none@none.com"},
        "timestamp": 1234,
    }
    out = jsonata(expr).evaluate(record)
    assert out["value"] == {"first": "test", "last": "user"}
    assert [f["name"] for f in out["valueSchema"]["fields"]] == ["first", "last"]
    assert out["topic"] == "test"
    assert out["timestamp"] == 1234


def test_noop_identity():
    """reference JsonataTransformationTest.java:40-61 — '$' round-trips."""
    record = {"topic": "t", "value": {"a": [1, {"b": None}]}, "headers": [{"key": "h"}]}
    assert jsonata("$").evaluate(record) == record


def test_signature_missing_required_arg_raises():
    """Round-12 ADVICE fix: jsonata-js anchors its signature regex, so a
    missing argument for a non-optional spec is T0410, not a silent
    undefined. Optional (?) and supplied-undefined still pass."""
    with pytest.raises(JsonataError) as exc:
        ev("($f := function($x)<n>{$x + 1}; $f())")
    assert "T0410" in str(exc.value)
    # optional spec: missing arg is fine
    assert ev("($f := function($x)<n?>{$x ? $x : 99}; $f())") == 99
    # SUPPLIED undefined propagates (undefined != missing)
    assert ev("($f := function($x)<n?>{$x ? $x : 99}; $f(nothing))") == 99
    # and a signatureless lambda keeps its unconstrained arity
    assert ev("($f := function($x){$x ? $x : 7}; $f())") == 7


def test_signature_too_many_args_raises():
    """Extra arguments beyond a non-variadic signature are T0410 (the
    anchored-regex behavior of jsonata-js signature.js)."""
    with pytest.raises(JsonataError) as exc:
        ev("($f := function($x)<n>{$x}; $f(1, 2))")
    assert "T0410" in str(exc.value)
    # variadic (+) still takes any count
    assert ev("($f := function($xs)<n+>{$xs}; $f(1))") == 1


def test_extension_typeerror_not_mislabeled_t0410():
    """Round-12 ADVICE fix: a TypeError raised INSIDE a user extension
    callable evaluated by a higher-order builtin ($map) must propagate as
    itself — the old blanket `except TypeError -> T0410` around builtin
    execution mislabeled it as an argument-signature mismatch."""

    def boom(v):
        raise TypeError("user extension blew up")

    with pytest.raises(TypeError, match="user extension blew up"):
        jsonata("$map([1,2,3], $boom)").evaluate(None, {"boom": boom})
    # while a genuine ARITY mismatch of the builtin itself is still T0410
    with pytest.raises(JsonataError) as exc:
        ev("$count([1], [2])")
    assert "T0410" in str(exc.value)
