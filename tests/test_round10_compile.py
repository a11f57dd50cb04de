"""Round-10 tier-1 compile tranche (verdict items 5/6): the ``%`` parent
operator inside expression/constructor steps — including across ONE real
fan-out level (the jsonata-docs idiom ``Account.Order.Product.{'Order':
%.OrderID}``) — and positional/focus binds crossing an outer fan-out
(``items.parts#$i``). Also pins the tier-2 ancestry fix these build on:
nested paths inside a step inherit the enclosing %ancestry% (before
round 10 the canonical docs example silently dropped the pair).
The tier-2 interpreter is the semantics oracle throughout."""

import json

import pytest

from kafka_connect_jsonata_spark.jsonata.interpreter import UNDEFINED, jsonata
from kafka_connect_jsonata_spark.transform import transform

from tests.test_round9_compile import _agree, _both_tiers

ACCOUNT = {
    "Account": {
        "Name": "acme",
        "Order": [
            {"OrderID": "o1", "Product": [{"SKU": "p1", "Price": 2},
                                          {"SKU": "p2", "Price": 3}]},
            {"OrderID": "o2", "Product": [{"SKU": "p3", "Price": 5}]},
        ],
    }
}


def test_tier2_parent_in_constructor_matches_jsonata_docs():
    """The canonical parent example from jsonata.org/docs — pure tier 2."""
    got = jsonata(
        "Account.Order.Product.{'P': SKU, 'O': %.OrderID}"
    ).evaluate(ACCOUNT)
    assert got == [
        {"P": "p1", "O": "o1"},
        {"P": "p2", "O": "o1"},
        {"P": "p3", "O": "o2"},
    ]
    got2 = jsonata("Account.Order.Product.{'A': %.%.Name}").evaluate(ACCOUNT)
    assert got2 == [{"A": "acme"}] * 3
    # parent chains longer than the ancestry stay undefined
    assert jsonata("a.(%.%.x)").evaluate({"a": {"b": 1}}) is UNDEFINED


PARENT_FANOUT_CASES = [
    # % across one real fan-out (Order array -> Product array)
    ("Account.Order.Product.{'P': SKU, 'O': %.OrderID}", ACCOUNT),
    ("Account.Order.Product.(%.OrderID & '/' & SKU)", ACCOUNT),
    ("Account.Order.Product.(%.OrderID = 'o1' ? Price + 100 : Price)", ACCOUNT),
    # %.% across the fan-out reaches the constant outer chain
    ("Account.Order.Product.{'A': %.%.Name, 'P': SKU}", ACCOUNT),
    # constant-parent case: single struct -> array field -> constructor
    ("orders.lines.{'oid': %.id, 'q': q}",
     {"orders": {"id": 7, "lines": [{"q": 1}, {"q": 2}]}}),
    ("a.(%.z & '-' & b)", {"a": {"b": "B"}, "z": "Z"}),
    # array constructor step with parent
    ("Account.Order.Product.[%.OrderID, SKU]", ACCOUNT),
]


@pytest.mark.parametrize("expr,data", PARENT_FANOUT_CASES)
def test_parent_across_fanout_compiles_and_agrees(spark, expr, data):
    cval, want = _both_tiers(spark, expr, data)
    assert _agree(cval, want), (expr, cval, want)


BIND_CROSSING_CASES = [
    # positional bind whose enumeration spans parents: $i is GLOBAL over
    # the flattened sequence (tier-2 semantics)
    ("items.parts#$i.{'i': $i, 'v': $}",
     {"items": [{"parts": ["a", "b"]}, {"parts": ["c"]}]}),
    ("items.parts#$i.($i * 10)",
     {"items": [{"parts": [1, 2]}, {"parts": [3]}]}),
    ("Account.Order.Product#$i.{'i': $i, 's': SKU}", ACCOUNT),
    # focus bind across the fan-out
    ("Account.Order.Product@$v.{'s': $v.SKU}", ACCOUNT),
]


@pytest.mark.parametrize("expr,data", BIND_CROSSING_CASES)
def test_bind_crossing_fanout_compiles_and_agrees(spark, expr, data):
    cval, want = _both_tiers(spark, expr, data)
    assert _agree(cval, want), (expr, cval, want)


def test_parent_fanout_is_pure_projection(spark):
    """The nested-transform compile must stay a Catalyst projection —
    no Python stage in the plan."""
    df = (
        spark.createDataFrame([(json.dumps(ACCOUNT),)], "j string")
        .selectExpr(
            "from_json(j, schema_of_json('%s')) as root"
            % json.dumps(ACCOUNT).replace("'", "\\'")
        )
        .select("root.*")
    )
    out = transform(
        df,
        "Account.Order.Product.{'P': SKU, 'O': %.OrderID}",
        force_tier="compiled",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_parent_under_two_fanouts_compiles(spark):
    """Round 10 capped the nested-transform parent compile at ONE fan-out
    level; round 11 generalizes it to any depth — `%.%` across two
    fan-outs must now compile with the right per-ancestor values (and the
    auto tier keeps giving the same rows either way)."""
    data = {
        "a": [
            {"k": 1, "b": [{"m": 10, "c": [{"x": "u"}]},
                           {"m": 11, "c": [{"x": "v"}]}]},
            {"k": 2, "b": [{"m": 12, "c": [{"x": "w"}]}]},
        ]
    }
    expr = "a.b.c.{'x': x, 'm': %.m, 'k': %.%.k}"
    want = jsonata(expr).evaluate(data)
    assert want == [
        {"x": "u", "m": 10, "k": 1},
        {"x": "v", "m": 11, "k": 1},
        {"x": "w", "m": 12, "k": 2},
    ]
    # auto tier must still produce the right value (routing via tier 2)
    df = (
        spark.createDataFrame([(json.dumps(data),)], "j string")
        .selectExpr(
            "from_json(j, schema_of_json('%s')) as root"
            % json.dumps(data).replace("'", "\\'")
        )
        .select("root.*")
    )
    out = transform(df, expr, force_tier="compiled")
    def norm(v):
        if hasattr(v, "asDict"):
            return {k: norm(x) for k, x in v.asDict().items()}
        if isinstance(v, list):
            return [norm(x) for x in v]
        return v
    got = norm(out.collect()[0][0])
    assert got == want, (got, want)


EVAL_CASES = [
    # schema-stable non-literal context: inner expr compiles against the
    # context expression's static type
    ("$eval('a + b', {'a': x, 'b': y})", {"x": 2, "y": 3}),
    ("$eval('n * 2', o)", {"o": {"n": 21}}),
    ("$eval('$uppercase(s)', {'s': t})", {"t": "hi"}),
    # no context: inner expr evaluates against the ROOT input
    ("$eval('x + 1')", {"x": 41}),
    ("items.$eval('q * 2', $)", {"items": [{"q": 1}, {"q": 2}]}),
]


@pytest.mark.parametrize("expr,data", EVAL_CASES)
def test_eval_nonliteral_context_compiles_and_agrees(spark, expr, data):
    """Round-10 item 6: $eval with a literal expression string and a
    schema-stable (possibly non-literal) context compiles; values agree
    with tier 2."""
    cval, want = _both_tiers(spark, expr, data)
    assert _agree(cval, want), (expr, cval, want)


def test_eval_dynamic_string_stays_tier2(spark):
    """A DYNAMIC expression string can never compile (the code is data) —
    must raise NotCompilable in forced-compiled mode and still evaluate
    correctly via the auto tier."""
    from kafka_connect_jsonata_spark.jsonata.compiler import NotCompilable

    df = spark.createDataFrame([("a + 1", 2)], "code string, a long")
    with pytest.raises(NotCompilable):
        transform(df, "$eval(code)", force_tier="compiled")
    out = transform(df, "$eval(code)")
    assert json.loads(out.collect()[0][0]) == 3


REPLACE_LIMIT_GROUPREF_CASES = [
    ("$replace('a1 b2 c3', /([a-z])(\\d)/, '$2$1', 2)", {"x": 1}),
    ("$replace(s, /([a-z])(\\d)/, '$2$1', 2)", {"s": "a1 b2 c3"}),
    ("$replace(s, /(\\w+)@(\\w+)/, '$2 at $1', 1)", {"s": "u@h x@y z@w"}),
    ("$replace(s, /([0-9])/, '<$1>', 0)", {"s": "a1b2"}),       # limit 0: no-op
    ("$replace(s, /([0-9])/, '<$1>', 9)", {"s": "a1b2"}),       # limit > matches
    ("$replace(s, /(a+)/, '[$1]', 1)", {"s": "bbb"}),           # no match at all
    ("$replace(s, /x(y)?z/, '($1)', 2)", {"s": "xz xyz xz"}),   # optional group
]


@pytest.mark.parametrize("expr,data", REPLACE_LIMIT_GROUPREF_CASES)
def test_replace_group_refs_under_limit_compiles(spark, expr, data):
    """Round-10: $replace with $N group refs AND a limit compiles (split
    finds the N-th-match boundary, regexp_replace rewrites the head, tail
    re-attaches) — the round-9 verdict's residual interpreter route."""
    cval, want = _both_tiers(spark, expr, data)
    assert _agree(cval, want), (expr, cval, want)


MATCH_ANCHOR_CASES = [
    ("$match(s, /^ab+/)", {"s": "abbbc ab"}),
    ("$match(s, /^ab+/)", {"s": "xabb"}),              # no match at 0
    ("$match(s, /b+$/)", {"s": "abb cbbb"}),           # ends at string end
    ("$match(s, /b+$/)", {"s": "bba"}),                # no end match
    ("$match(s, /^a(b+)c$/)", {"s": "abbc"}),          # full anchor + group
    ("$match(s, /^a(b+)c$/)", {"s": "abbcx"}),
    ("$match(s, /^\\d+/)", {"s": "123abc456"}),
    ("$match(s, /^ab+/, 3)", {"s": "abbbc"}),          # limit with anchor
    # round-11 ADVICE fix: trailing-newline / CR edge cases — Python `$`
    # matches before a FINAL \n only; index must point at the match, not
    # length(s)-length(match)
    ("$match(s, /b+$/)", {"s": "abb\n"}),              # idx 1, not 2
    ("$match(s, /b+$/)", {"s": "abb\r"}),              # Java-lenient: no match
    ("$match(s, /b+$/)", {"s": "abb\r\n"}),            # no match (CR blocks)
    ("$match(s, /b+$/)", {"s": "abb\n\n"}),            # only ONE final \n
    ("$match(s, /b+$/)", {"s": "bb\nbb\n"}),           # idx 3
    ("$match(s, /(B+)$/i)", {"s": "aBB\n"}),           # group + flag + \n
    ("$match(s, /^a(b+)$/)", {"s": "abb\n"}),          # both anchors + \n
]


@pytest.mark.parametrize("expr,data", MATCH_ANCHOR_CASES)
def test_match_edge_anchors_compile(spark, expr, data):
    """Round-10: ^-prefixed / $-suffixed $match patterns compile — at most
    one match at a statically-known index."""
    cval, want = _both_tiers(spark, expr, data)
    assert _agree(cval, want), (expr, cval, want)


def test_match_interior_anchors_stay_tier2(spark):
    from kafka_connect_jsonata_spark.jsonata.compiler import NotCompilable

    df = spark.createDataFrame([("ab",)], "s string")
    for expr in (
        "$match(s, /a$b/)",      # interior $
        "$match(s, /^a|b$/)",    # alternation splits the anchoring
    ):
        with pytest.raises(NotCompilable):
            transform(df, expr, force_tier="compiled")


FORMAT_INTEGER_CASES = [
    ("$formatInteger(n, 'w')", {"n": 0}),
    ("$formatInteger(n, 'w')", {"n": 12345678}),
    ("$formatInteger(n, 'w')", {"n": 1000234}),
    ("$formatInteger(n, 'w')", {"n": 1000034}),
    ("$formatInteger(n, 'w')", {"n": 2000034000}),
    ("$formatInteger(n, 'w')", {"n": -42}),
    ("$formatInteger(n, 'W')", {"n": 999}),
    ("$formatInteger(n, 'Ww')", {"n": -42}),
    ("$formatInteger(n, 'w;o')", {"n": 21}),
    ("$formatInteger(n, 'w;o')", {"n": 110}),
    ("$formatInteger(n, 'w;o')", {"n": 12}),
    ("$formatInteger(n, 'w;o')", {"n": 30}),
    ("$formatInteger(n, 'i')", {"n": 1999}),
    ("$formatInteger(n, 'I')", {"n": 1999}),
    ("$formatInteger(n, 'i')", {"n": 0}),
    ("$formatInteger(n, 'i')", {"n": -14}),
    ("$formatInteger(n, 'i')", {"n": 4888}),
    ("$formatInteger(n, 'a')", {"n": 28}),
    ("$formatInteger(n, 'A')", {"n": 702}),
    ("$formatInteger(n, '1')", {"n": 1234}),
    ("$formatInteger(n, '1;o')", {"n": 12}),
    ("$formatInteger(n, '1;o')", {"n": 21}),
    ("$formatInteger(n, '1;o')", {"n": -1}),
    ("$formatInteger(n, '001;o')", {"n": 123}),
    ("$formatInteger(n, '00')", {"n": 7}),
    ("$formatInteger(n, '001')", {"n": -7}),   # sign OUTSIDE the pad width
    ("$formatInteger(n, '0000')", {"n": -7}),
    ("$formatInteger(n, '21')", {"n": 7}),     # any all-digit pic = width
]


@pytest.mark.parametrize("expr,data", FORMAT_INTEGER_CASES)
def test_format_integer_pictures_compile(spark, expr, data):
    """Round-10: the XPath word/roman/alpha/ordinal pictures compile to
    Column lookup tables — the round-9 verdict's 'full XPath pictures'
    residual. NON-constant input (a column), so the constant-fold path
    can't mask the compile."""
    cval, want = _both_tiers(spark, expr, data)
    assert _agree(cval, want), (expr, cval, want)


PARSE_INTEGER_CASES = [
    ("$parseInteger(s, 'i')", {"s": "mcmxcix"}),
    ("$parseInteger(s, 'I')", {"s": "MCMXCIX"}),
    ("$parseInteger(s, 'i')", {"s": "iiii"}),
    ("$parseInteger(s, 'i')", {"s": "xliv"}),
    ("$parseInteger(s, '000')", {"s": "042"}),
]


@pytest.mark.parametrize("expr,data", PARSE_INTEGER_CASES)
def test_parse_integer_roman_compiles(spark, expr, data):
    cval, want = _both_tiers(spark, expr, data)
    assert _agree(cval, want), (expr, cval, want)


FILTER_PARENT_CASES = [
    # the jsonata-docs filter idiom: select children by a PARENT property
    ("foo[%.k = 1].v", {"k": 1, "foo": [{"v": "a"}, {"v": "b"}]}),
    ("foo[%.k = 2].v", {"k": 1, "foo": [{"v": "a"}, {"v": "b"}]}),
    ("o.lines[%.kind = 'x'].q", {"o": {"kind": "x", "lines": [{"q": 1}, {"q": 2}]}}),
    ("o.lines[q > %.floor].q", {"o": {"floor": 1, "lines": [{"q": 1}, {"q": 2}, {"q": 3}]}}),
]


@pytest.mark.parametrize("expr,data", FILTER_PARENT_CASES)
def test_parent_in_filter_predicate(spark, expr, data):
    """Round-10: `%` inside a filter predicate resolves to the element's
    parent in BOTH tiers (single name-step base, the tier-2 ancestry
    rule); values agree."""
    cval, want = _both_tiers(spark, expr, data)
    assert _agree(cval, want), (expr, cval, want)


def test_parent_in_filter_over_fanout_compiles(spark):
    """Round-10 pinned this shape as tier-2-only (a fan-out base loses
    per-element parents after flattening). The round-11 per-item filter
    branch compiles the [pred] against EACH element of the fan-out, so
    the element's parent rides along — now the compiled tier must give
    the right rows itself, never a wrong constant fold."""
    data = {"Account": {"Order": [
        {"OrderID": "o1", "Product": [{"SKU": "p1"}, {"SKU": "p2"}]},
        {"OrderID": "o2", "Product": [{"SKU": "p3"}]}]}}
    from kafka_connect_jsonata_spark.jsonata.interpreter import jsonata

    df = (
        spark.createDataFrame([(json.dumps(data),)], "j string")
        .selectExpr(
            "from_json(j, schema_of_json('%s')) as root"
            % json.dumps(data).replace("'", "\\'")
        )
        .select("root.*")
    )
    for oid, want in (("o1", ["p1", "p2"]), ("o2", ["p3"])):
        expr = "Account.Order.Product[%%.OrderID='%s'].SKU" % oid
        got2 = jsonata(expr).evaluate(data)
        assert got2 == (want if len(want) > 1 else want[0])
        out = transform(df, expr, force_tier="compiled")
        assert out.collect()[0][0] == want, (expr, out.collect())
