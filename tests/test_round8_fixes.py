"""Round-8 advisor fixes, pinned:

1. compiler _struct_as_map null-guards the struct->map bridge — a NULL
   struct compiles to NULL (tier-2 undefined), not a fabricated map of
   null values, for $spread and value-dependent $sift.
2. compiler $formatNumber zero-pad pictures round ONCE (HALF_EVEN at the
   picture scale over the exact shortest-repr decimal) — no HALF_UP
   pre-rounding at an intermediate scale.
3. every NTZ<->instant bridge uses pure epoch arithmetic — instants whose
   session-zone rendering lands in the DST fall-back overlap keep their
   distinct epochs / UTC wall clocks under a non-UTC session timezone.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_jsonata_spark.jsonata.compiler import compile_expression
from kafka_connect_jsonata_spark.jsonata.interpreter import Jsonata


# ------------------------------------------------- 1. null-struct bridge


def _homog_struct_df(spark):
    schema = T.StructType(
        [
            T.StructField(
                "o",
                T.StructType(
                    [
                        T.StructField("a", T.LongType()),
                        T.StructField("b", T.LongType()),
                    ]
                ),
            )
        ]
    )
    return spark.createDataFrame([({"a": 1, "b": 2},), (None,)], schema), schema


def test_spread_null_struct_is_null(spark):
    df, schema = _homog_struct_df(spark)
    c = compile_expression("$spread(o)", schema)
    got = [r[0] for r in df.select(c.col.alias("v")).collect()]
    assert got[0] == [{"a": 1}, {"b": 2}]
    assert got[1] is None  # was [{'a': None}, {'b': None}] before the fix
    assert Jsonata("$spread(o)").evaluate({"o": None}) is None


def test_value_dependent_sift_null_struct_is_null(spark):
    df, schema = _homog_struct_df(spark)
    c = compile_expression("$sift(o, function($v){$v > 1})", schema)
    got = [r[0] for r in df.select(c.col.alias("v")).collect()]
    assert got[0] == {"b": 2}
    assert got[1] is None  # was {} before the fix


# ------------------------------------- 2. $formatNumber single rounding


@pytest.mark.parametrize("pic", ["0.0", "0.00", "00.0", "0%", "0.0%"])
def test_format_number_zero_pad_single_rounding(spark, pic):
    """0.3499999999999999 (16 fraction digits) is the advisor's witness:
    the old decimal(38,15) intermediate HALF_UP-rounded it to 0.35 before
    the picture-scale bround said '0.4'; one rounding says '0.3'."""
    vals = [
        0.3499999999999999,
        0.35,
        0.25,
        -0.004,
        1e21,
        0.0051,
        123.456,
        1.23e-20,
        0.049999999999999996,
        -0.0,
    ]
    schema = T.StructType([T.StructField("x", T.DoubleType())])
    df = spark.createDataFrame([(v,) for v in vals], schema)
    expr = f'$formatNumber(x, "{pic}")'
    c = compile_expression(expr, schema)
    got = [r[0] for r in df.select(c.col.alias("v")).collect()]
    want = [Jsonata(expr).evaluate({"x": v}) for v in vals]
    assert got == want


# ------------------------------------------ 2b. constant folding (round 8)


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "expr,want",
    [
        ("$formatInteger(19, 'w')", "nineteen"),
        ("$formatInteger(99, 'i')", "xcix"),
        ("$formatInteger(12, '1;o')", "12th"),
        ("$parseInteger('nineteen', 'w')", 19),
        ("$formatNumber(0.00123, '0.0e0')", "1.2e-3"),
        ("($f := function($n){ $n <= 1 ? $n : $f($n-1) + $f($n-2) }; $f(10))", 55),
        ("{'a': 1, 'b': 2}.*", [1, 2]),
        ("[1..4].{'sq': $ * $}.sq", [1, 4, 9, 16]),
        ("$sum([1..100])", 5050),
    ],
)
def test_constant_folding_compiles_to_literal(spark, expr, want):
    """Round-8 JSONata-level ConstantFolding: provably-constant subtrees
    (constant picture formats, constant recursion, wildcards over literal
    objects) compile to typed literal Columns at tier-2 exactness."""
    from kafka_connect_jsonata_spark.transform import transform

    df = spark.createDataFrame([(1,)], "id long")
    out = transform(df, expr, force_tier="compiled")
    got = [r[0] for r in out.collect()]
    assert got == [want]
    # the plan carries the folded literal — no runtime evaluation at all
    assert "Project" in _plan_of(out)


def test_constant_folding_skips_impure_and_data_bound(spark):
    """$random never folds (fresh per row); a constant-LOOKING variable
    bound to a data column never folds."""
    from kafka_connect_jsonata_spark.transform import transform

    df = spark.createDataFrame([(i,) for i in range(50)], "id long")
    r = transform(df, "$random()", force_tier="compiled")
    vals = {row[0] for row in r.collect()}
    assert len(vals) > 1  # folded would collapse to one constant
    out = transform(df, "($x := id; $x + 1)", force_tier="compiled")
    assert sorted(row[0] for row in out.collect()) == list(range(1, 51))


# ------------------------- 2b2. wildcard / descendant compile (round 8)


@pytest.mark.parametrize(
    "expr,data,want",
    [
        ("*.x", {"p": {"x": 1}, "q": {"x": 2}}, [1, 2]),
        ("a.*", {"a": {"p": 1, "q": 2}}, [1, 2]),
        ("*.*", {"p": {"x": 1}, "q": {"x": 2}}, [1, 2]),
        # ** pre-order: the root's own match precedes deeper matches of
        # LATER fields, but field-order traversal puts a's subtree first
        ("**.y", {"a": {"b": {"y": 3}}, "y": 1}, [1, 3]),
        ("**.price", {"a": [{"price": 1}, {"b": {"price": 2}}]}, [1, 2]),
    ],
)
def test_wildcard_descendant_compile(spark, expr, data, want):
    """Round-8 B1.5: `.*` and schema-driven `**.f` compile to pure array
    projections; values and ORDER must match tier 2."""
    import json

    from kafka_connect_jsonata_spark.transform import transform

    j = json.dumps(data)
    sch = spark.range(1).select(F.schema_of_json(j)).first()[0]
    df = (
        spark.createDataFrame([(j,)], "j string")
        .select(F.from_json("j", sch).alias("r"))
        .select("r.*")
    )
    out = transform(df, expr, force_tier="compiled")
    assert [r[0] for r in out.collect()] == [want]
    got2 = Jsonata(expr).evaluate(data)
    assert list(got2) == want  # tier-2 agreement, order included


# ---------------------------------------- 2c. $replace limit (round 8)


def test_replace_with_limit_both_tiers(spark):
    """Data-dependent $replace with a literal limit compiles natively
    (split at most limit times + re-join); limit 0 replaces NOTHING in
    both tiers (jsonata-js iterates while count < limit — the tier-2
    `count or -1` conflation with absent-limit is fixed this round)."""
    from kafka_connect_jsonata_spark.transform import transform

    rows = [("John Smith and John Jones",), ("no match here",), ("aXbXcXd",)]
    df = spark.createDataFrame(rows, "s string")
    cases = [
        "$replace(s, 'John', 'Mr', 1)",
        "$replace(s, 'John', 'Mr', 0)",
        "$replace(s, 'X', '-', 2)",
        "$replace(s, /[A-Z]/, '_', 2)",
        "$replace(s, 'o.n', '!', 2)",  # literal dot must not act as regex
    ]
    for e in cases:
        c = transform(df, e, force_tier="compiled")
        got = [r[0] for r in c.collect()]
        want = [Jsonata(e).evaluate({"s": v[0]}) for v in rows]
        assert got == want, e
    assert (
        Jsonata("$replace('abc', /b/, function($m){ $uppercase($m.match) }, 0)")
        .evaluate({})
        == "abc"
    )


# --------------------------------------------- 3. DST fall-back overlap

# 2024-11-03 05:30:00Z and 06:30:00Z both render 01:30 under
# America/New_York (EDT then EST) — the ambiguous pair.
OVERLAP_US = (1730611800000000, 1730615400000000)


@pytest.fixture
def ny_session(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    yield spark
    spark.conf.set("spark.sql.session.timeZone", prev)


def test_ntz_to_instant_keeps_overlap_instants_distinct(ny_session):
    from kafka_connect_jsonata_spark.sources.readers import _ntz_to_instant

    spark = ny_session
    df = spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-11-03 05:30:00' AS ntz "
        "UNION ALL SELECT TIMESTAMP_NTZ '2024-11-03 06:30:00'"
    )
    got = sorted(
        r[0] for r in df.select(F.unix_micros(_ntz_to_instant(F.col("ntz")))).collect()
    )
    assert got == list(OVERLAP_US)


def test_utc_wall_renders_overlap_instants_distinct(ny_session):
    """$fromMillis of the two overlap instants must render distinct UTC
    wall clocks under a non-UTC session (compiler._utc_wall fix)."""
    spark = ny_session
    schema = T.StructType([T.StructField("ms", T.LongType())])
    df = spark.createDataFrame([(us // 1000,) for us in OVERLAP_US], schema)
    c = compile_expression("$fromMillis(ms)", schema)
    got = sorted(r[0] for r in df.select(c.col.alias("v")).collect())
    assert got == ["2024-11-03T05:30:00.000Z", "2024-11-03T06:30:00.000Z"]


def test_to_millis_zoneless_roundtrip_overlap(ny_session):
    """$toMillis of the zoneless ISO strings for the overlap wall clocks
    must give back the exact epochs under a non-UTC session."""
    spark = ny_session
    schema = T.StructType([T.StructField("s", T.StringType())])
    df = spark.createDataFrame(
        [("2024-11-03T05:30:00",), ("2024-11-03T06:30:00",)], schema
    )
    c = compile_expression("$toMillis(s)", schema)
    got = sorted(r[0] for r in df.select(c.col.alias("v")).collect())
    assert got == [us // 1000 for us in OVERLAP_US]


def test_resample_gapfill_long_span_chunked_grid(spark):
    """Round-8 grid bound: a pathological long-lived entity (300k buckets,
    crossing many 16384-bucket segment boundaries) resamples correctly —
    the dense axis is built from bounded per-segment sequences, never one
    span-length array. Pin exact row count, boundary buckets, and LOCF
    values across a segment boundary."""
    from kafka_connect_jsonata_spark.operators.relational import resample_gapfill

    n_buckets = 300_000  # ~34 years hourly; spans ~19 segments
    df = spark.sql(
        "SELECT 'e' AS entity, TIMESTAMP_NTZ '1970-01-05 00:00:00' AS ts, 1.0 AS v "
        f"UNION ALL SELECT 'e', timestampadd(HOUR, {n_buckets - 1}, "
        "TIMESTAMP_NTZ '1970-01-05 00:00:00'), 9.0"
    )
    out = resample_gapfill(df, "ts", "entity", "v", interval_sec=3600)
    assert out.count() == n_buckets
    stats = out.agg(
        F.min("bucket_start").alias("lo"),
        F.max("bucket_start").alias("hi"),
        F.count_distinct("bucket_start").alias("n"),
        F.sum(F.col("filled").cast("long")).alias("n_filled"),
        F.sum("value").alias("sv"),
    ).collect()[0]
    assert str(stats["lo"]) == "1970-01-05 00:00:00"
    assert stats["n"] == n_buckets  # dense, no dup/missing buckets
    assert stats["n_filled"] == n_buckets - 2
    # LOCF: every gap bucket carries 1.0, the last bucket 9.0
    assert stats["sv"] == pytest.approx((n_buckets - 1) * 1.0 + 9.0)


def test_resample_gapfill_bucket_start_overlap(ny_session):
    """bucket_start NTZ rendering is pure epoch arithmetic: a bucket
    landing in the NY fall-back overlap keeps its true UTC wall clock."""
    from kafka_connect_jsonata_spark.operators.relational import resample_gapfill

    spark = ny_session
    df = spark.sql(
        "SELECT 'e1' AS entity, TIMESTAMP_NTZ '2024-11-03 05:30:00' AS ts, "
        "1.0 AS v UNION ALL "
        "SELECT 'e1', TIMESTAMP_NTZ '2024-11-03 06:30:00', 3.0"
    )
    out = resample_gapfill(df, "ts", "entity", "v", interval_sec=3600)
    rows = sorted(
        (str(r["bucket_start"]), r["value"]) for r in out.collect()
    )
    assert rows == [
        ("2024-11-03 05:00:00", 1.0),
        ("2024-11-03 06:00:00", 3.0),
    ]
