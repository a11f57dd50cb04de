"""Round-13 compiler soundness: ProvablyUndefinedValue is a proof about
the NODE it was raised for, not a free pass for every enclosing catch
site (ADVICE r12, high). A constant-undefined subexpression like
``$keys({})`` used as an argument of a function whose undefined-arg
result is DEFINED (``$zip`` drops undefined args; a user lambda may
ignore its parameter) must NOT let the enclosing expression fold to
undefined — it either compiles to the interpreter-equal value or falls
back to tier 2. Positions through which undefined provably propagates
(arithmetic, order comparison, unary minus, the propagating builtins,
ternary-without-else) re-tag the proof and keep their round-12 folds.
"""

import json

import pytest

from kafka_connect_jsonata_spark.jsonata.compiler import NotCompilable
from kafka_connect_jsonata_spark.jsonata.interpreter import UNDEFINED, jsonata
from kafka_connect_jsonata_spark.transform import transform

from tests.test_round9_compile import _agree, _both_tiers, _norm

# tier 2 gives a DEFINED value; the old untagged acceptance folded each
# of these to undefined (dropped pair / else-branch / whole-row tombstone)
NO_FALSE_FOLD_CASES = [
    # $zip drops undefined args -> [[1],[2]]; old: top-level NULL tombstone
    ("$zip($keys({}), [1, 2])", {"x": 1}),
    # old: object-pair omission -> {}
    ("{'a': $zip($keys({}), [1, 2])}", {"x": 1}),
    # old: array-element omission -> [5]
    ("[$zip($keys({}), [1, 2]), 5]", {"x": 1}),
    # defined non-empty array is truthy -> 'y'; old: folded to 'n'
    ("$zip($keys({}), [1, 2]) ? 'y' : 'n'", {"x": 1}),
    # lambda ignores its argument -> 42; old: whole-row tombstone
    ("($f := function($v) { 42 }; $f($keys({})))", {"x": 1}),
    # lambda tests its argument -> 'absent'
    ("($f := function($v) { $exists($v) ? 'got' : 'absent' }; $f($keys({})))",
     {"x": 1}),
    # undefined in a LATER argument of a propagating builtin is NOT a
    # proof about the call: $substring('hello', nope) -> 'hello'
    ("{'a': $substring(x, $keys({}))}", {"x": "hello"}),
]

# the round-12 folds that must SURVIVE the tightening: proof re-tagging
# through propagating positions, checked with force_tier='compiled'
STILL_COMPILED_CASES = [
    ("{'a': $uppercase($keys({}))}", {"x": 1}),       # propagating builtin arg
    # first-arg propagation with a NON-constant later arg (exercises the
    # arg_of re-tag: $substring(undefined, x) -> undefined)
    ("{'a': $substring($keys({}), x)}", {"x": 1}),
    ("{'a': x + $keys({})}", {"x": 1}),               # arithmetic operand
    ("{'a': x < $keys({})}", {"x": 1}),               # order comparison
    ("{'a': ($keys({}) ? x)}", {"x": 1}),             # ternary without else
    ("[x + $keys({}) .. 3]", {"x": 1}),               # range endpoint
    ("{'a': -($keys({}))}", {"x": 1}),                # unary minus (constant)
    ("$count($zip($keys({}), [1, 2]))", {"x": 1}),    # $count over defined zip
]


@pytest.mark.parametrize("expr,data", NO_FALSE_FOLD_CASES)
def test_no_false_fold_on_escaped_puv(spark, expr, data):
    """Auto tier (compile, fall back to interpreter) must agree with the
    interpreter — the compiler may refuse these, never mis-fold them."""
    want = jsonata(expr).evaluate(data)
    assert want is not UNDEFINED, "test case must have a defined tier-2 value"
    want = [_norm(json.loads(json.dumps(want)))]
    df = spark.createDataFrame([(json.dumps(data),)], "j string").selectExpr(
        "from_json(j, schema_of_json('%s')) as root"
        % json.dumps(data).replace("\\", "\\\\").replace("'", "\\'")
    ).select("root.*")
    out = transform(df, expr)
    rows = out.collect()
    if len(out.columns) == 1 and out.columns[0] == "value_json":
        # interpreter-tier fallback carries the result as a JSON string
        got = [_norm(json.loads(r[0])) if r[0] is not None else None
               for r in rows]
    elif len(out.columns) == 1 and out.columns[0] in ("__result", "value"):
        got = [_norm(r[0]) for r in rows]
    else:
        got = [_norm(r) for r in rows]
    assert _agree(got, want), f"{expr}: got {got}, want {want}"


@pytest.mark.parametrize("expr,data", STILL_COMPILED_CASES)
def test_propagating_positions_still_fold(spark, expr, data):
    cval, want = _both_tiers(spark, expr, data)
    assert _agree(cval, want), f"{expr}: compiled {cval}, want {want}"


def test_zip_object_pair_not_omitted_compiled_refuses(spark):
    """force_tier='compiled' on the $zip-in-pair case either refuses
    (NotCompilable) or produces the interpreter value — never {}."""
    expr = "{'a': $zip($keys({}), [1, 2])}"
    df = spark.createDataFrame([(1,)], "x int")
    try:
        out = transform(df, expr, force_tier="compiled")
    except NotCompilable:
        return
    got = [_norm(r) for r in out.collect()]
    assert got != [{}] and got != [None], got


# round-13 tranche 2: unbound variables and undefined lambda-arg bindings
UNBOUND_CASES = [
    ("$x", {"a": 1}),
    ("$x + 1", {"a": 1}),
    ("{'a': $x}", {"a": 1}),
    ("[$x, 5]", {"a": 1}),
    ("$count($x)", {"a": 1}),
    ("($f := function($x)<n?>{ $x ? $x : 99 }; $f(blank))", {"a": 1}),
    ("($f := function($v)<n>{ $v ? $v : 99 }; $f(nope))", {"a": 1}),
    ("($f := function($a,$b){ $exists($b) ? $b : 'nb' }; $f(1))", {"a": 1}),
    ("($f := function($a,$b)<nn?>{ $exists($b) ? $b : 'nb' }; $f(1))",
     {"a": 1}),
    ("($f := function($v){ $v ? 'y' : 'n' }; {'r': $f($x)})", {"a": 1}),
]


@pytest.mark.parametrize("expr,data", UNBOUND_CASES)
def test_unbound_and_undefined_bindings_compile(spark, expr, data):
    cval, want = _both_tiers(spark, expr, data)
    assert _agree(cval, want), f"{expr}: compiled {cval}, want {want}"


def test_missing_required_lambda_arg_routes_to_tier2(spark):
    """A MISSING argument for a signature-required param is a tier-2
    T0410, never a compiled fold."""
    df = spark.createDataFrame([(1,)], "x int")
    expr = "($f := function($a,$b)<nn>{ $a }; $f(1))"
    with pytest.raises(NotCompilable):
        transform(df, expr, force_tier="compiled")


def test_bare_builtin_reference_stays_tier2(spark):
    """$uppercase alone is a FUNCTION value, not undefined."""
    df = spark.createDataFrame([(1,)], "x int")
    with pytest.raises(NotCompilable):
        transform(df, "$uppercase", force_tier="compiled")
