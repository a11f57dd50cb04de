"""Per-group quantile filtering and temperature-resampled mixing
(SURVEY §2C C47/C48)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from kafka_connect_jsonata_spark.functions import curation
from kafka_connect_jsonata_spark.operators import sampling


def _docs(spark):
    rows = []
    for i in range(100):
        src = "big" if i < 80 else "small"
        rows.append((i, src, i))  # score == doc_id, strictly ordered
    return spark.createDataFrame(rows, ["doc_id", "source", "score"])


def test_quantile_filter_exact_keeps_top_slice_per_group(spark):
    df = _docs(spark)
    out = curation.quantile_filter(
        df, score_col="score", q=0.75, group_col="source", tiebreak_col="doc_id"
    )
    got = {r["source"]: sorted(r["ids"]) for r in
           out.groupBy("source").agg(F.collect_list("doc_id").alias("ids")).collect()}
    # big: 80 rows, percent_rank >= .75 -> ranks 60..79 -> ids 60..79 (21 rows:
    # percent_rank = (rn-1)/79 >= .75 -> rn >= 60.25 -> rn in 61..80 -> 20 rows)
    assert got["big"] == list(range(60, 80))
    assert got["small"] == list(range(95, 100))


def test_quantile_filter_exact_vs_approx_agree_away_from_boundary(spark):
    df = _docs(spark)
    exact = curation.quantile_filter(
        df, "score", 0.5, group_col="source", tiebreak_col="doc_id"
    )
    approx = curation.quantile_filter(
        df, "score", 0.5, group_col="source", exact=False, rel_err=0.001
    )
    e = {r["doc_id"] for r in exact.collect()}
    a = {r["doc_id"] for r in approx.collect()}
    # boundary may differ by construction; interiors must agree
    assert len(e.symmetric_difference(a)) <= 4


def test_quantile_filter_global_no_group(spark):
    df = _docs(spark)
    out = curation.quantile_filter(df, "score", 0.9, tiebreak_col="doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == list(range(90, 100))


def test_quantile_filter_validates_q(spark):
    df = _docs(spark)
    with pytest.raises(ValueError):
        curation.quantile_filter(df, "score", 1.0)


def test_temperature_rates_flatten_toward_small_groups(spark):
    df = _docs(spark)
    rates = sampling.temperature_mix_rates(df, "source", target_total=50, alpha=0.5)
    s = math.sqrt(80.0) + math.sqrt(20.0)
    assert rates["big"] == pytest.approx(math.sqrt(80.0) / s * 50.0 / 80, abs=0)
    assert rates["small"] == pytest.approx(math.sqrt(20.0) / s * 50.0 / 20, abs=0)
    # alpha<1 keeps a larger fraction of the small source
    assert rates["small"] > rates["big"]


def test_temperature_rates_clamp_at_one(spark):
    df = _docs(spark)
    rates = sampling.temperature_mix_rates(df, "source", target_total=10_000)
    assert rates == {"big": 1.0, "small": 1.0}


def test_temperature_mix_sample_is_mixture_sample_with_those_rates(spark):
    df = _docs(spark)
    got = sampling.temperature_mix_sample(df, "doc_id", "source", target_total=50)
    rates = sampling.temperature_mix_rates(df, "source", target_total=50)
    want = sampling.mixture_sample(df, "doc_id", "source", rates)
    assert {r["doc_id"] for r in got.collect()} == {r["doc_id"] for r in want.collect()}


def test_temperature_rates_empty_raises(spark):
    df = _docs(spark).filter(F.lit(False))
    with pytest.raises(ValueError):
        sampling.temperature_mix_rates(df, "source", target_total=10)


def test_weighted_sample_deterministic_and_plan(spark):
    df = _docs(spark).withColumn("wt", (F.col("doc_id") % 10 + 1).cast("double"))
    a = sorted(r["doc_id"] for r in sampling.weighted_sample(df, "doc_id", "wt", 10).collect())
    b = sorted(r["doc_id"] for r in sampling.weighted_sample(df, "doc_id", "wt", 10).collect())
    assert a == b and len(a) == 10
    # independent draw under a different salt
    c = sorted(r["doc_id"] for r in sampling.weighted_sample(df, "doc_id", "wt", 10, salt="x").collect())
    assert a != c
    # distributed top-k, not a global sort: TakeOrderedAndProject in the plan
    plan = sampling.weighted_sample(df, "doc_id", "wt", 10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_matches_local_reference(spark):
    import hashlib
    import math

    df = _docs(spark).withColumn("wt", (F.col("doc_id") % 7 + 1).cast("double"))
    got = [r["doc_id"] for r in sampling.weighted_sample(df, "doc_id", "wt", 15).collect()]

    def key(did, wt):
        h = hashlib.md5(str(did).encode()).hexdigest()
        u = (int(h[:8], 16) + 1.0) / 16 ** 8
        return -math.log(u) / wt
    rows = [(i, i % 7 + 1) for i in range(100)]
    want = [d for d, _ in sorted(rows, key=lambda r: (key(*r), r[0]))[:15]]
    assert sorted(got) == sorted(want)


def test_weighted_sample_excludes_nonpositive_and_validates(spark):
    df = _docs(spark).withColumn(
        "wt", F.when(F.col("doc_id") < 50, F.lit(0.0)).otherwise(F.lit(1.0))
    )
    got = [r["doc_id"] for r in sampling.weighted_sample(df, "doc_id", "wt", 100).collect()]
    assert len(got) == 50 and min(got) >= 50
    with pytest.raises(ValueError):
        sampling.weighted_sample(df, "doc_id", "wt", 0)


def test_weighted_sample_favors_heavy_rows(spark):
    # weight 10 vs weight 1: across many salts the heavy half dominates
    df = _docs(spark).withColumn(
        "wt", F.when(F.col("doc_id") < 50, F.lit(10.0)).otherwise(F.lit(1.0))
    )
    heavy = 0
    for s in ("a", "b", "c", "d"):
        got = [r["doc_id"] for r in sampling.weighted_sample(df, "doc_id", "wt", 20, salt=s).collect()]
        heavy += sum(1 for d in got if d < 50)
    assert heavy / 80 > 0.7  # E[fraction] ~ 10/11


def test_weighted_sample_excludes_nan_weights(spark):
    df = _docs(spark).withColumn(
        "wt",
        F.when(F.col("doc_id") < 50, F.lit(float("nan"))).otherwise(F.lit(1.0)),
    )
    got = [r["doc_id"] for r in sampling.weighted_sample(df, "doc_id", "wt", 100).collect()]
    assert len(got) == 50 and min(got) >= 50  # NaN-weighted rows never sampled


def test_temperature_rates_skip_null_groups(spark):
    df = _docs(spark).withColumn(
        "source", F.when(F.col("doc_id") < 10, F.lit(None)).otherwise(F.col("source"))
    )
    rates = sampling.temperature_mix_rates(df, "source", target_total=10_000)
    assert None not in rates and set(rates) == {"big", "small"}


def test_temperature_rates_weight_col_token_budget(spark):
    import math

    from kafka_connect_jsonata_spark.operators.sampling import (
        temperature_mix_rates,
    )

    rows = [
        (1, "a", 100), (2, "a", 300),   # mass a = 400
        (3, "b", 50),                   # mass b = 50
        (4, "c", 900), (5, "c", 700),   # mass c = 1600
    ]
    df = spark.createDataFrame(rows, "id long, g string, w long")
    rates = temperature_mix_rates(df, "g", target_total=500, weight_col="w")
    mass = {"a": 400, "b": 50, "c": 1600}
    s = math.sqrt(400) + math.sqrt(50) + math.sqrt(1600)
    for g, m in mass.items():
        assert rates[g] == min(1.0, math.sqrt(m) / s * 500.0 / m)
    # smaller sources keep a larger fraction of their mass
    assert rates["b"] > rates["a"] > rates["c"]


def test_temperature_mix_sample_weight_col_routes_rates(spark):
    from kafka_connect_jsonata_spark.operators.sampling import (
        mixture_sample,
        temperature_mix_rates,
        temperature_mix_sample,
    )

    df = spark.createDataFrame(
        [(i, "a" if i < 30 else "b", (i % 7) + 1) for i in range(50)],
        "id long, g string, w long",
    )
    got = temperature_mix_sample(
        df, "id", "g", target_total=80, weight_col="w", salt="t"
    )
    rates = temperature_mix_rates(df, "g", 80, weight_col="w")
    ref = mixture_sample(df, "id", "g", rates, salt="t")
    assert {r["id"] for r in got.collect()} == {r["id"] for r in ref.collect()}
