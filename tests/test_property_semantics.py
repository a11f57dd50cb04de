"""Property-style semantic tests (SURVEY.md §5.3): the spots where naive
Spark mappings diverge from JSONata, checked over generated inputs, plus a
tier-equivalence fuzz — whatever tier 1 compiles must equal what tier 2
interprets, for randomly generated simple expressions over random rows.

These run the interpreter directly (no Spark session) except the
tier-equivalence case, which drives both tiers end to end.
"""

from __future__ import annotations

import math
import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connect_jsonata_spark.jsonata.interpreter import Jsonata


def ev(expr: str, data=None):
    return Jsonata(expr).evaluate(data if data is not None else {})


# --------------------------------------------------------------- interpreter
@given(st.integers(min_value=-10**9, max_value=10**9), st.integers(-10**9, 10**9))
@settings(max_examples=200, deadline=None)
def test_arithmetic_matches_python(a, b):
    assert ev(f"{a} + {b}") == a + b
    assert ev(f"{a} * {b}") == a * b
    if b != 0:
        got = ev(f"{a} / {b}")
        assert got == pytest.approx(a / b)  # JSONata / is always float
        assert ev(f"{a} % {b}") == pytest.approx(math.fmod(a, b))


@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_round_is_bankers(x):
    # JSONata $round is round-half-to-even, same as Python 3 round()
    assert ev(f"$round({x!r})") == round(x)


@given(st.lists(st.integers(-1000, 1000), max_size=20))
@settings(max_examples=200, deadline=None)
def test_aggregates_match_python(xs):
    data = {"xs": xs}
    if xs:
        assert ev("$sum(xs)", data) == sum(xs)
        assert ev("$max(xs)", data) == max(xs)
        assert ev("$min(xs)", data) == min(xs)
        assert ev("$count(xs)", data) == len(xs)
    else:
        assert ev("$sum(xs)", data) == 0


@given(st.text(max_size=30))
@settings(max_examples=200, deadline=None)
def test_trim_collapses_internal_whitespace(s):
    got = ev("$trim(x)", {"x": s})
    # JSONata spec whitespace class is [ \t\n\r] (jsonata-js /[ \t\n\r]+/g),
    # narrower than Python's \s — pin exactly that class
    assert got == re.sub(r"[ \t\n\r]+", " ", s).strip()


@given(st.lists(st.integers(-100, 100), min_size=1, max_size=10))
@settings(max_examples=100, deadline=None)
def test_singleton_rule(xs):
    # a 1-element sequence is its element; predicates preserve that rule
    from kafka_connect_jsonata_spark.jsonata.functions import is_undef

    got = ev("xs[x > 1000000]", {"xs": [{"x": v} for v in xs]})
    assert is_undef(got)  # empty sequence -> undefined
    # a literal 1-element ARRAY VALUE is preserved by plain field access
    # (the singleton rule applies to sequences, not array values)
    one = ev("xs", {"xs": [xs[0]]})
    assert one == [xs[0]]
    # ...but a sequence produced by path mapping unwraps its singleton
    assert ev("ys.v", {"ys": [{"v": xs[0]}]}) == xs[0]


# ----------------------------------------------------------- tier equivalence
_EXPR_PARTS = [
    "a + b",
    "a * 2 - b",
    "a > b ? 'hi' : 'lo'",
    "$uppercase(s)",
    "$substring(s, 0, 3)",
    "s & '!'",
    "a = b ? null : a",
    "$sum(nums)",
    "$count(nums)",
    "nums",
    "{'x': a, 'y': s}",
    "a in nums",
    "$replace(s, 'l', 'L')",
    "$merge([{'x': a}, {'y': b, 'x': a + 1}])",
    "$sift($, function($v, $k) { $k = 'a' or $k = 's' })",
    "$type(a) & ':' & $type(s)",
]


@pytest.mark.parametrize("expr", _EXPR_PARTS)
def test_tier_equivalence_generated(spark, expr):
    """Both tiers must agree on every expression over a generated frame
    (the end-to-end version of the fuzz; expressions chosen to cover
    arithmetic, comparison, ternary+tombstone, string fns, aggregates,
    arrays, and object construction)."""
    from kafka_connect_jsonata_spark.transform import transform

    df = spark.createDataFrame(
        [
            (1, 5, "hello", [1, 2, 3]),
            (7, 7, "WoRlD", [10]),
            (-3, 2, "", []),
        ],
        "a int, b int, s string, nums array<int>",
    )
    compiled = transform(df, expr, force_tier="compiled")
    # scalar results come back as a single `value` column; the interpreter
    # tier needs the VALUE type there, not a struct wrapper
    out_schema = (
        compiled.schema["value"].dataType
        if compiled.columns == ["value"]
        else compiled.schema
    )
    interp = transform(df, expr, force_tier="interpreter", output_schema=out_schema)
    c = sorted(map(tuple, compiled.collect()))
    i = sorted(map(tuple, interp.collect()))
    assert c == i, f"tier divergence for {expr!r}: {c} != {i}"


_PICTURE_EXPRS = [
    "$formatNumber(x, '#,##0.00')",
    "$formatNumber(x, '#,##0')",
    "$formatNumber(x, '#,##0.0000')",
    "$fromMillis(ms, '[Y0001]-[M01]-[D01]')",
    "$fromMillis(ms, '[Y0001]-[M01]-[D01]T[H01]:[m01]:[s01].[f001]Z')",
    "$fromMillis(ms, '[D01]/[M01]/[Y0001] [H01]:[m01]')",
]


@pytest.mark.parametrize("expr", _PICTURE_EXPRS)
def test_picture_string_tier_equivalence(spark, expr):
    """Round-1 verdict #8: the compiled picture-string subset
    ($formatNumber '#,##0.00' family, $fromMillis padded components) must
    match the interpreter value-for-value — including repr-tie rounding
    (42.555 rounds UP in both tiers: shortest-decimal-repr HALF_EVEN)."""
    from pyspark.sql import types as T

    from kafka_connect_jsonata_spark.jsonata.compiler import compile_expression
    from kafka_connect_jsonata_spark.transform import transform

    schema = T.StructType(
        [T.StructField("x", T.DoubleType()), T.StructField("ms", T.LongType())]
    )
    compile_expression(expr, schema)  # must be tier 1, not a silent fallback

    rows = [
        (-42.555, 0),
        (2.675, 1_700_000_000_123),
        (0.125, 86_400_000),
        (1234567.891, 1_712_345_678_901),
        (0.0, 999),
        (-0.004, 1_000_000_000_000),
        # exact binary fractions: true HALF_EVEN ties in both tiers
        (10.375, 123_456_789),
        (10.125, 987_654_321_000),
    ]
    df = spark.createDataFrame(rows, "x double, ms long")
    compiled = transform(df, expr, force_tier="compiled")
    out_schema = (
        compiled.schema["value"].dataType
        if compiled.columns == ["value"]
        else compiled.schema
    )
    interp = transform(df, expr, force_tier="interpreter", output_schema=out_schema)
    c = sorted(map(tuple, compiled.collect()))
    i = sorted(map(tuple, interp.collect()))
    assert c == i, f"tier divergence for {expr!r}: {c} != {i}"


def test_picture_string_fallbacks_not_compilable(spark):
    """Outside the subset -> tier 2, never a wrong compiled answer."""
    from kafka_connect_jsonata_spark.jsonata.compiler import (
        NotCompilable,
        compile_expression,
    )

    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("x", T.DoubleType()), T.StructField("ms", T.LongType())]
    )
    for expr in (
        # (round 7 moved '00.0' zero-pad pictures and unpadded [M]/[D]/[Y]
        # components INTO the compiled subset — dual-tier sweep covers them)
        "$formatNumber(x, '#,##0.00;(#,##0.00)')",  # pos;neg split
        "$formatNumber(x, '0.0e0')",       # exponent picture
        "$formatNumber(x, '#,##0%', {})",  # options argument
        "$fromMillis(ms, '[F0]')",         # unsupported component
        "$fromMillis(ms, '[D1o] [MNn]')",  # ordinal/name components
        "$fromMillis(ms, '[Y0001]', 'America/New_York')",  # timezone
    ):
        with pytest.raises(NotCompilable):
            compile_expression(expr, schema)


# ------------------------------------------------------ Misra-Gries property
@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=3000),
    st.integers(min_value=2, max_value=12),  # capacity
    st.integers(min_value=1, max_value=200),  # batch size
)
@settings(max_examples=150, deadline=None)
def test_batched_misra_gries_candidate_superset(stream, capacity, batch):
    """The batched MG reduction (merge exact batch counts, subtract the
    (capacity+1)-th largest, drop non-positive) must keep every term whose
    true frequency strictly exceeds N/(capacity+1) — the invariant
    heavy_hitter_terms' exactness guard relies on. Mirrors the kernel in
    functions/text.py:heavy_hitter_terms."""
    from collections import Counter

    counters: dict[int, int] = {}
    for i in range(0, len(stream), batch):
        for t, c in Counter(stream[i : i + batch]).items():
            counters[t] = counters.get(t, 0) + c
        if len(counters) > capacity:
            cut = sorted(counters.values(), reverse=True)[capacity]
            counters = {t: c - cut for t, c in counters.items() if c > cut}
    true = Counter(stream)
    n = len(stream)
    for t, freq in true.items():
        if freq > n / (capacity + 1):
            assert t in counters, (t, freq, n, capacity)
    assert len(counters) <= capacity


# ------------------------------------------------- relational operator fuzz
# Seeded-random brute-force parity for the operators whose plans were
# re-shaped in round 5 (merge as-of, bucketized interval join, hot-key
# split). One Spark session run per test, many random rows per run — the
# brute-force reference is plain Python over the collected inputs.


def test_asof_join_random_brute_force_parity(spark):
    import random

    from pyspark.sql import functions as F  # noqa: F401

    from kafka_connect_jsonata_spark.operators.relational import asof_join

    rng = random.Random(20250814)
    lrows = [
        (rng.choice(["a", "b", "c", None]), rng.randint(0, 50), i)
        for i in range(300)
    ]
    rrows = [
        (rng.choice(["a", "b", "c", "d", None]), rng.randint(0, 50))
        for _ in range(200)
    ]
    left = spark.createDataFrame(lrows, "k string, lts long, lid int")
    right = spark.createDataFrame(rrows, "k string, rts long")
    got = {
        r["lid"]: r["asof_rts"]
        for r in asof_join(left, right, "k", "k", "lts", "rts").collect()
    }
    for k, lts, lid in lrows:
        cands = [rts for rk, rts in rrows if rk is not None and rk == k and rts <= lts]
        assert got[lid] == (max(cands) if cands else None), (k, lts, lid)


def test_interval_join_random_brute_force_parity(spark):
    import random

    from kafka_connect_jsonata_spark.operators.relational import interval_join

    rng = random.Random(7)
    pts = [(i, round(rng.uniform(-100, 100), 2)) for i in range(250)]
    ivs = []
    for j in range(150):
        lo = round(rng.uniform(-110, 100), 2)
        ivs.append((j, lo, round(lo + rng.uniform(-5, 30), 2)))  # some inverted
    pdf = spark.createDataFrame(pts, "pid int, p double")
    idf = spark.createDataFrame(ivs, "iid int, lo double, hi double")
    for width in (1.0, 7.3, 50.0):
        got = {
            (r["pid"], r["iid"])
            for r in interval_join(pdf, idf, "p", "lo", "hi", bucket_width=width).collect()
        }
        exp = {
            (pid, iid)
            for pid, p in pts
            for iid, lo, hi in ivs
            if lo <= p < hi
        }
        assert got == exp, width


def test_skew_split_join_multi_key_parity(spark):
    """Composite join keys through the hot-key split: hot tuples must
    match on BOTH columns, and every join type stays exact."""
    from pyspark.sql import functions as F

    from kafka_connect_jsonata_spark.operators.relational import skew_split_join

    left = spark.range(4000).select(
        (F.col("id") % 3).alias("k1"),
        F.when(F.col("id") % 7 == 0, F.col("id") % 5).otherwise(F.lit(0)).alias("k2"),
        F.col("id").alias("lv"),
    )
    right = spark.range(900).select(
        (F.col("id") % 4).alias("k1"),
        (F.col("id") % 5).alias("k2"),
        (F.col("id") * 2).alias("rv"),
    )
    for how in ("inner", "left", "right", "full"):
        got = skew_split_join(
            left, right, ["k1", "k2"], how=how, hot_keys=[(0, 0), (1, 0)], n_salts=4
        )
        exp = left.join(right, ["k1", "k2"], how)
        assert got.count() == exp.count(), how
        assert got.exceptAll(exp).count() == 0, how
        assert exp.exceptAll(got).count() == 0, how
