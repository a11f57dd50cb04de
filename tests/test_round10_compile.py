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


def test_parent_under_two_fanouts_routes_to_tier2(spark):
    """`%.%` where BOTH levels are fan-outs exceeds the one-level nested
    transform — must still be CORRECT via tier 2 (never a wrong value)."""
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
    out = transform(df, expr)
    got = json.loads(out.collect()[0][0])
    assert got == want, (got, want)
    from kafka_connect_jsonata_spark.jsonata.compiler import NotCompilable
    with pytest.raises(NotCompilable):
        transform(df, expr, force_tier="compiled")


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
