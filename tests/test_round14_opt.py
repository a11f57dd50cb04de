"""Round-14 optimization internals and round-13 advisor fixes.

Every test pins new-path == old-path (or a documented one-sided bound) on
real or constructed data: the table-plan cache must be value-invisible, the
fused incremental path must route unfusable raw refs to the unfused
composition instead of crashing, and the fused bucket_cap hub policy's
recall-only divergence must stay one-sided.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_jsonata_spark.functions import dedup
from kafka_connect_jsonata_spark.sources.readers import load_table


def _ids(df):
    return sorted(r[0] for r in df.select("doc_id").collect())


def test_load_table_plan_cache_returns_same_plan_and_values(spark, sf_dir):
    a = load_table(spark, sf_dir, "documents")
    b = load_table(spark, sf_dir, "documents")
    assert a is b  # same UNEXECUTED plan object, per (app, sf_dir, table)
    # and the plan still computes from parquet every action (no persist)
    assert "InMemoryRelation" not in a._jdf.queryExecution().toString()
    assert a.count() == b.count() > 0
    # distinct tables / sf dirs get distinct plans
    assert load_table(spark, sf_dir, "orders") is not a


def test_incremental_raw_ref_type_mismatch_routes_unfused(spark, sf_dir):
    # round-13 advisor (high): a RAW ref with mismatched id types passed the
    # fused gate and crashed on ref_sketches=None. It must route to the
    # unfused composition and produce the same kept set as matching types.
    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 3 != 0)
    ref = docs.filter(F.col("doc_id") % 3 == 0)
    params = dict(num_hashes=32, n_bands=8, threshold=0.9)
    expected = _ids(dedup.minhash_dedup_incremental(new, ref, **params))
    ref_int = ref.withColumn("doc_id", F.col("doc_id").cast("int"))
    got = _ids(dedup.minhash_dedup_incremental(new, ref_int, **params))
    assert got == expected


def _blocks(tag: str, n: int) -> list[str]:
    # content-disjoint gibberish blocks (~120 chars each): no shared
    # template wording across tags, so the char-5-gram Jaccard between two
    # docs tracks their block overlap (junction grams are ~2% noise)
    return [
        " ".join(f"{tag}{i}z{j}k{(i * 31 + j * 7) % 97}{tag[::-1]}" for j in range(9))
        for i in range(n)
    ]


def test_incremental_fused_bucket_cap_divergence_is_recall_only(spark):
    # round-13 advisor (medium): when an over-cap bucket's minimum id is
    # history-matched, the fused path can lose that bucket's hub pairs
    # (the unfused composition re-hubs on the fresh minimum). The
    # documented contract: the divergence is RECALL-ONLY — the fused kept
    # set is always a superset of the unfused kept set at the same cap,
    # and with no history-matched hub both agree exactly.
    A, C, BX, BY, D = (
        _blocks("alpha", 8),
        _blocks("gamma", 6),
        _blocks("beta", 6),
        _blocks("delta", 6),
        _blocks("omega", 6),
    )
    batch = spark.createDataFrame(
        [
            (10, " ".join(A + C)),        # hub: matches history (shares C)
            (20, " ".join(A + BX)),       # near-dup of hub and of 30 via A
            (30, " ".join(A + BY)),
        ],
        "doc_id long, text string",
    )
    ref = spark.createDataFrame(
        [(1, " ".join(C + D))], "doc_id long, text string"
    )
    params = dict(num_hashes=32, n_bands=32, threshold=0.25)

    # fixture sanity: the constructed gram Jaccards must be on the intended
    # sides of the threshold (block math: hub~ref 6/20, hub~20 8/20, 20~30
    # 8/20, 20~ref ~0)
    sk = dedup.minhash_sketches(
        batch.unionByName(ref.withColumn("doc_id", F.col("doc_id") + 100)),
        num_hashes=32,
        n_bands=32,
    ).select("id", "__h")
    grams = {r["id"]: set(r["__h"]) for r in sk.collect()}

    def jac(a, b):
        return len(grams[a] & grams[b]) / len(grams[a] | grams[b])

    assert jac(10, 101) >= 0.25 and jac(10, 20) >= 0.25 and jac(20, 30) >= 0.25
    assert jac(20, 101) < 0.25 and jac(30, 101) < 0.25

    def run(cap, fused):
        return set(
            _ids(
                dedup.minhash_dedup_incremental(
                    batch,
                    ref,
                    collapse_exact=fused,
                    bucket_cap=cap,
                    **params,
                )
            )
        )

    # hub 10 is history-matched and dropped on every path
    for cap in (2, None):
        for fused in (True, False):
            assert 10 not in run(cap, fused)
    # uncapped: fused == unfused exactly (no overflow policy in play)
    assert run(None, True) == run(None, False)
    # tiny cap + matched bucket-minimum: fused may only OVER-keep
    assert run(2, True) >= run(2, False)


def test_barrier_restores_enclosing_job_description(spark):
    sc = spark.sparkContext
    sc.setJobDescription("outer-label")
    try:
        dedup.barrier(spark.range(10))
        assert sc.getLocalProperty("spark.job.description") == "outer-label"
        dedup.dup_groups_from_pairs(
            spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        ).collect()
        assert sc.getLocalProperty("spark.job.description") == "outer-label"
    finally:
        sc.setJobDescription(None)


def test_barrier_width_pins_checkpoint_partitioning(spark):
    """A checkpoint stores its input's final (usually AQE-coalesced, often
    single) partitioning; barrier(width=) must override it so CPU-dense
    downstream stages don't serialize (round 14: the fused incremental
    verify ran its array intersects single-task off an un-pinned
    candidate checkpoint)."""
    df = (
        spark.range(1000)
        .groupBy((F.col("id") % 7).alias("k"))
        .count()
    )
    pinned = dedup.barrier(df, width=8)
    assert pinned.rdd.getNumPartitions() == 8
    # values unchanged by the round-robin exchange
    assert sorted(r["k"] for r in pinned.collect()) == sorted(
        r["k"] for r in df.collect()
    )
    # width=None keeps the legacy behavior (whatever the plan produced)
    plain = dedup.barrier(df)
    assert plain.rdd.getNumPartitions() >= 1


def test_incremental_fused_candidate_checkpoint_width(spark, sf_dir):
    """The fused incremental path's one banding+verify pipeline must keep
    its candidate checkpoint at full parallelism (the round-14 pin)."""
    from kafka_connect_jsonata_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 3 == 0)
    new = docs.filter(F.col("doc_id") % 3 != 0)
    seen = []
    orig = dedup.barrier

    def spy(df, eager=True, width=None):
        out = orig(df, eager=eager, width=width)
        if eager and set(df.columns) == {"__x", "__y", "__yk"}:
            seen.append(out.rdd.getNumPartitions())
        return out

    try:
        dedup.barrier = spy
        dedup.minhash_dedup_incremental(
            new, ref, num_hashes=32, n_bands=8, threshold=0.9
        ).count()
    finally:
        dedup.barrier = orig
    # cand_all is the first (__x,__y,__yk) barrier; ver (same columns) is
    # deliberately un-pinned — downstream consumption is trivial
    assert seen, "candidate barrier not observed"
    assert seen[0] == spark.sparkContext.defaultParallelism
