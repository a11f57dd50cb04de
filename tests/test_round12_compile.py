"""Round-12 tier-1 compile tranche: (a) the TOP-LEVEL StaticallyUndefined
catch — an expression whose whole value is provably undefined for every
row now compiles to a constant NULL tombstone instead of routing to
tier 2 (`5 + nothing`, `a.b.c` stepping into a scalar); (b) undefined
operands of ranges and $append; (c) $distinct/$reverse/$sort/$shuffle in
the undefined-propagation set; (d) wildcard over a struct MIXING scalar
and array members splices like the jsonata sequence rule
({'a':[1,2],'b':3} -> * is [1,2,3]). The open-world guard from round 10
(partial envelope schemas must NOT fold unknown fields) is re-pinned
against every new fold surface."""

import json

import pyspark.sql.types as T
import pytest

from kafka_connect_jsonata_spark.jsonata.compiler import (
    Compiler,
    NotCompilable,
    StaticallyUndefined,
)
from kafka_connect_jsonata_spark.transform import transform

from tests.test_round9_compile import _agree, _both_tiers

# every case must COMPILE (force_tier="compiled") and agree with tier 2
ROUND12_CASES = [
    # (a) whole-expression statically undefined -> constant tombstone
    ("5 + nothing", {"a": 1}),
    ("nothing <= 1", {"a": 1}),
    ("1 < nothing", {"a": 1}),
    ("a.b + 1", {"a": 1}),          # step into a scalar, then arithmetic
    ("$string(missing.deep)", {"a": 1}),
    ("$length(nope)", {"a": 1}),
    ("foo.bar.baz", {"foo": {"bar": 1}}),   # step INTO a scalar
    ("-nothing", {"a": 1}),
    ("$not(undefinedthing)", {"a": 1}),
    # (b) range endpoints and $append operands
    ("[nothing..3]", {"a": 1}),
    ("[1..nothing]", {"a": 1}),
    ("$append(nothing, 1)", {"x": 1}),
    ("$append(1, nothing)", {"x": 1}),
    ("$append(nothing, [1, 2])", {"x": 1}),
    ("$append(x, nothing)", {"x": 5}),
    # (c) array fns propagate undefined
    ("$distinct(nothing)", {"x": 1}),
    ("$reverse(nothing)", {"x": 1}),
    ("$sort(nothing)", {"x": 1}),
    # (d) wildcard splice over mixed scalar/array members
    ("*", {"a": [1, 2], "b": 3}),
    ("*[0]", {"a": [1, 2], "b": 3}),
    ("*", {"a": [1.5], "b": 3}),     # bigint/double promote across members
    ("$sum(*)", {"a": [1, 2], "b": 3}),
    # (e) *.* / *.name fusion over heterogeneous mid-structs: the first
    # wildcard's fan-out is static, so each member branch compiles
    # separately and only the FINAL leaves unify
    ("*.*", {"a": {"x": 1}, "b": {"y": 2}}),
    ("*.*", {"a": {"x": 1.5}, "b": {"y": 2}}),
    ("*.*", {"a": [{"x": 1}], "b": {"y": 2}, "c": 3}),  # arrays splice, scalars drop
    ("*.x", {"a": {"x": 1}, "b": 5}),
    ("$sum(*.*)", {"a": {"x": 1}, "b": {"y": 2}}),
]


def test_wildcard_fuse_heterogeneous_leaves_stay_tier2(spark):
    """A branch whose values tier 1 cannot express (heterogeneous SUB-
    struct) must abort the WHOLE fusion — silently dropping the branch
    would lose values tier 2 returns."""
    import json

    from kafka_connect_jsonata_spark.jsonata.compiler import (
        Compiler,
        NotCompilable,
    )

    for data in [
        {"a": {"x": {"deep": 1}}, "b": {"y": "s"}},
        {"a": {"x": 1, "y": "mix"}},
    ]:
        df = spark.read.json(
            spark.sparkContext.parallelize([json.dumps(data)])
        )
        with pytest.raises(NotCompilable):
            Compiler(df.schema).compile("*.*")


def test_round12_cases_compile_and_agree(spark):
    failures = []
    for expr, data in ROUND12_CASES:
        try:
            cval, want = _both_tiers(spark, expr, data)
        except NotCompilable as e:
            failures.append((expr, "NotCompilable", str(e)))
            continue
        if not _agree(cval, want):
            failures.append((expr, cval, want))
    assert not failures, failures


def test_statically_undefined_is_constant_tombstone(spark):
    """The compiled plan for a statically-undefined expression is a
    CONSTANT null — every row drops, no per-row evaluation at all."""
    df = spark.range(100).selectExpr("id", "id * 2 as a")
    out = transform(df, "5 + nothing", force_tier="compiled")
    assert out.count() == 0
    # the plan is a filtered constant — no Python evaluation node
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_open_world_does_not_fold_unknown_fields():
    """Round-10 hazard re-pinned against the round-12 fold surfaces: with
    closed_world=False an absent field is merely out of compile scope —
    every new catch site must see plain NotCompilable, never fold."""
    schema = T.StructType([T.StructField("a", T.LongType())])
    c = Compiler(schema, closed_world=False)
    for expr in [
        "5 + nothing",
        "[nothing..3]",
        "$append(nothing, 1)",
        "$distinct(nothing)",
        "nothing <= 1",
    ]:
        with pytest.raises(NotCompilable) as exc:
            c.compile(expr)
        assert not isinstance(exc.value, StaticallyUndefined), expr


def test_append_null_value_vs_absent_field(spark):
    """$append(null, 1) keeps null-the-VALUE ([null, 1] in tier 2); the
    round-12 _UndefArg sentinel must fire only for statically ABSENT
    operands, not for a literal null."""
    from kafka_connect_jsonata_spark.jsonata.interpreter import jsonata

    assert jsonata("$append(null, 1)").evaluate({}) == [None, 1]
    # compiled tier: a literal null operand still contributes an element
    df = spark.createDataFrame([(1,)], "x long")
    out = transform(df, "$count($append(null, 1))", force_tier="compiled")
    assert [r[0] for r in out.collect()] == [2]
