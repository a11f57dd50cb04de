"""Round-13 optimization internals: sketch-pass reuse, fused tagged-union
sketching, conditional compute spread, and the q2/q17 single-subtree
rewrites must all be VALUE-preserving — every test here pins new-path ==
old-path (or new-path == independent recomputation) on real data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_jsonata_spark.functions import dedup
from kafka_connect_jsonata_spark.sources.readers import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_spread_narrow_scan_spreads_narrow_and_skips_wide(spark, tmp_path):
    par = spark.sparkContext.defaultParallelism
    narrow_dir = str(tmp_path / "narrow")
    spark.range(100).selectExpr("id", "cast(id as string) t").coalesce(1).write.parquet(
        narrow_dir
    )
    narrow = dedup.spread_narrow_scan(spark.read.parquet(narrow_dir))
    assert "RoundRobinPartitioning" in narrow._jdf.queryExecution().toString()

    wide_dir = str(tmp_path / "wide")
    spark.range(1000).selectExpr("id", "cast(id as string) t").repartition(
        par * 2
    ).write.parquet(wide_dir)
    wide = dedup.spread_narrow_scan(spark.read.parquet(wide_dir))
    assert "RoundRobinPartitioning" not in wide._jdf.queryExecution().toString()

    # conf escape hatch
    spark.conf.set("spark.jsonataspark.spread", "never")
    try:
        forced = dedup.spread_narrow_scan(spark.read.parquet(narrow_dir))
        assert "RoundRobinPartitioning" not in forced._jdf.queryExecution().toString()
    finally:
        spark.conf.unset("spark.jsonataspark.spread")


def test_minhash_dedup_sketch_reuse_matches_fresh_sketching(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    params = dict(num_hashes=32, n_bands=8, threshold=0.9)
    plain = dedup.minhash_dedup(docs, **params).select("doc_id")
    sk = dedup.barrier(
        dedup.minhash_sketches(docs, num_hashes=32, n_bands=8), eager=False
    )
    reused = dedup.minhash_dedup(docs, sketches=sk, **params).select("doc_id")
    assert _rows(plain) == _rows(reused)


def test_minhash_sketches_passthrough_rides_unchanged(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    tagged = docs.withColumn("__side", (F.col("doc_id") % 2).cast("int"))
    sk = dedup.minhash_sketches(
        tagged, num_hashes=16, n_bands=4, passthrough=("__side",)
    )
    assert sk.columns == ["id", "__side", "__h", "bkts"]
    got = {r["id"]: r["__side"] for r in sk.select("id", "__side").collect()}
    want = {r["doc_id"]: r["doc_id"] % 2 for r in docs.select("doc_id").collect()}
    assert got == want
    # sketch values are independent of the passthrough column
    bare = dedup.minhash_sketches(docs, num_hashes=16, n_bands=4)
    a = {r["id"]: (tuple(r["__h"]), tuple(r["bkts"])) for r in sk.collect()}
    b = {r["id"]: (tuple(r["__h"]), tuple(r["bkts"])) for r in bare.collect()}
    assert a == b


def test_incremental_fused_sketch_matches_unfused_paths(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 3 != 0)
    ref = docs.filter(F.col("doc_id") % 3 == 0)
    params = dict(num_hashes=32, n_bands=8, threshold=0.9)
    # fused path (raw ref of matching types)
    fused = dedup.minhash_dedup_incremental(new, ref, **params).select("doc_id")
    # unfused: history arrives as a persisted sketch table
    ref_sk = dedup.minhash_sketches(ref, num_hashes=32, n_bands=8)
    via_sketches = dedup.minhash_dedup_incremental(
        new, None, ref_sketches=ref_sk, **params
    ).select("doc_id")
    assert _rows(fused) == _rows(via_sketches)


def test_incremental_fused_matches_unfused_composition(spark, sf_dir):
    # the round-13 single-banding/single-verify rewrite vs the round-8
    # match-then-dedup composition (collapse_exact=False routes there):
    # identical kept sets on the real corpus, both keep policies
    docs = load_table(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 3 != 0).withColumn(
        "__q", F.length("text")
    )
    ref = docs.filter(F.col("doc_id") % 3 == 0)
    params = dict(num_hashes=32, n_bands=8, threshold=0.9)
    for kw in (dict(), dict(keep="best", score_col="__q")):
        fused = sorted(
            r[0]
            for r in dedup.minhash_dedup_incremental(new, ref, **params, **kw)
            .select("doc_id")
            .collect()
        )
        unfused = sorted(
            r[0]
            for r in dedup.minhash_dedup_incremental(
                new, ref, collapse_exact=False, bucket_cap=None, **params, **kw
            )
            .select("doc_id")
            .collect()
        )
        assert fused == unfused and fused


def test_incremental_fused_edge_cases(spark):
    # the round-13 fused single-banding/single-verify rewrite must keep
    # the degenerate shapes exact: empty history, empty batch, everything
    # matching history, keep='best', and the persisted-sketch ref path
    rows = [
        (1, "aaaa bbbb cccc dddd"),
        (2, "aaaa bbbb cccc dddd"),
        (3, "totally different text here"),
        (4, "unrelated content words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    empty = df.filter(F.lit(False))
    params = dict(num_hashes=16, n_bands=4, threshold=0.9)

    kept = dedup.minhash_dedup_incremental(df, empty, **params)
    assert sorted(r[0] for r in kept.select("doc_id").collect()) == [1, 3, 4]
    assert dedup.minhash_dedup_incremental(empty, df, **params).count() == 0
    assert dedup.minhash_dedup_incremental(df, df, **params).count() == 0
    best = dedup.minhash_dedup_incremental(
        df.withColumn("s", F.length("text")), empty,
        keep="best", score_col="s", **params,
    )
    assert sorted(r[0] for r in best.select("doc_id").collect()) == [1, 3, 4]
    sk = dedup.minhash_sketches(
        df.filter(F.col("doc_id") == 1), num_hashes=16, n_bands=4
    )
    via_store = dedup.minhash_dedup_incremental(
        df.filter(F.col("doc_id") > 1), None, ref_sketches=sk, **params
    )
    assert sorted(r[0] for r in via_store.select("doc_id").collect()) == [3, 4]


def test_fuzzy_decontaminate_type_fallback_matches_fused(spark, sf_dir):
    from kafka_connect_jsonata_spark.functions import curation

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    fused = curation.fuzzy_contamination_pairs(
        docs, ev, num_hashes=32, n_bands=16, threshold=0.9
    )
    # int eval ids take the two-stage fallback; values must agree
    ev_int = ev.withColumn("doc_id", F.col("doc_id").cast("int"))
    fallback = curation.fuzzy_contamination_pairs(
        docs, ev_int, num_hashes=32, n_bands=16, threshold=0.9
    )
    a = sorted((r["id"], int(r["eval_id"]), r["jaccard"]) for r in fused.collect())
    b = sorted((r["id"], int(r["eval_id"]), r["jaccard"]) for r in fallback.collect())
    assert a == b


def test_q2_q17_window_rewrites_match_oracle(spark, sf_dir):
    # the rewrites are also oracle-gated at sf0.01; this pins them at the
    # suite's sf with the exact DuckDB comparison harness
    from tools.check_oracle import sweep

    failures = sweep(
        sf_dir,
        only={"q2_minimum_cost_supplier", "q17_small_quantity_revenue"},
        spark=spark,
        verbose=False,
    )
    assert failures == []
