"""Smoke: every registered query runs at sf0.001 and returns a stable schema.
Full value-level correctness vs DuckDB is exercised by tools/check_oracle.py
(and the driver's gate at sf0.01)."""

from __future__ import annotations

import pytest

from kafka_connect_jsonata_spark import queries as Q


@pytest.mark.parametrize("name", sorted(Q.QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = Q.QUERIES[name](spark, sf_dir)
    assert df.columns  # non-empty schema
    assert df.count() >= 0


ROWS_ONLY = {
    # sketch-based operators: no exact SQL oracle exists by construction
    "approx_distinct_stats",
    "minhash_lsh_dups",
    "simhash_docs",
    # rng-generated payload content: no SQL analog; exact values pinned in
    # tests/test_multimodal.py
    "multimodal_image_stats",
    "multimodal_audio_features",
    # approximate-by-construction: recall pinned in test_ann_lsh_recall
    "ann_lsh_topk",
    "ann_ivf_topk",
}


def test_every_query_has_oracle_or_is_declared():
    missing = set(Q.QUERIES) - set(Q.ORACLES) - ROWS_ONLY
    assert not missing, f"queries without oracle (should be deliberate): {missing}"


def test_ann_lsh_recall(spark, sf_dir):
    """LSH top-k must recover most of the brute-force top-k (recall@5).
    Hyperplane LSH on these synthetic embeddings is approximate; require
    recall >= 0.5 — well above chance (5/500) — and exact scoring for
    whatever it returns."""
    import kafka_connect_jsonata_spark.queries as Q

    exact = Q.QUERIES["cosine_topk_bruteforce"](spark, sf_dir).collect()
    approx = Q.QUERIES["ann_lsh_topk"](spark, sf_dir).collect()
    truth = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"] for r in exact}
    got = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"] for r in approx}
    hits = set(truth) & set(got)
    assert len(hits) / len(truth) >= 0.5
    for key in hits:  # scores of true hits must match the exact computation
        assert abs(truth[key] - got[key]) < 1e-9


def test_ann_ivf_recall(spark, sf_dir):
    """IVF top-k recall@5 vs brute force with exact score agreement."""
    import kafka_connect_jsonata_spark.queries as Q

    exact = Q.QUERIES["cosine_topk_bruteforce"](spark, sf_dir).collect()
    approx = Q.QUERIES["ann_ivf_topk"](spark, sf_dir).collect()
    truth = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"] for r in exact}
    got = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"] for r in approx}
    hits = set(truth) & set(got)
    assert len(hits) / len(truth) >= 0.5
    for key in hits:
        assert abs(truth[key] - got[key]) < 1e-9


def test_source_scan_and_streams(spark, sf_dir, tmp_path):
    """C1/C2: generic scan (json/csv round-trip through Spark writers) and
    file/rate streaming sources."""
    from kafka_connect_jsonata_spark.sources.readers import file_stream, rate_stream, scan

    nation = scan(spark, f"{sf_dir}/nation.parquet")
    jdir, cdir = str(tmp_path / "j"), str(tmp_path / "c")
    nation.write.json(jdir)
    nation.write.option("header", "true").csv(cdir)
    assert scan(spark, jdir, "json").count() == nation.count()
    got = scan(spark, cdir, "csv", schema=nation.schema)
    assert got.count() == nation.count()
    assert [f.name for f in got.schema.fields] == [f.name for f in nation.schema.fields]
    st = file_stream(spark, jdir, "json")
    assert st.isStreaming
    assert rate_stream(spark).isStreaming


def test_dup_groups_chain_and_fixpoint(spark):
    """Connected components: a 4-chain collapses to one group (multi-round
    propagation), isolated pairs keep their own min id."""
    from kafka_connect_jsonata_spark.functions.dedup import dup_groups_from_pairs

    pairs = spark.createDataFrame(
        [(10, 2), (2, 30), (30, 4), (50, 60)], "id_a bigint, id_b bigint"
    )
    out = {r["doc_id"]: r["group_id"] for r in dup_groups_from_pairs(pairs).collect()}
    assert out == {10: 2, 2: 2, 30: 2, 4: 2, 50: 50, 60: 50}


def test_embedding_dup_pairs_lsh_matches_exact(spark):
    """LSH-blocked embedding near-dup (the non-broadcast 100 TB shape):
    precision must be 1.0 (exact verify) and recall ~1 in the
    high-similarity regime LSH is built for. Constructed clusters, since
    the synthetic corpus has no high-cosine pairs."""
    import random

    from kafka_connect_jsonata_spark.functions.dedup import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
    )

    rnd = random.Random(7)
    rows = []
    vid = 0
    for _ in range(20):  # 20 clusters of 3 near-identical vectors
        base = [rnd.gauss(0, 1) for _ in range(32)]
        for _ in range(3):
            rows.append((vid, [x + rnd.gauss(0, 0.01) for x in base]))
            vid += 1
    for _ in range(140):  # noise vectors
        rows.append((vid, [rnd.gauss(0, 1) for _ in range(32)]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    exact = {(r["id_a"], r["id_b"]) for r in embedding_dup_pairs(df, threshold=0.95).collect()}
    lsh = {(r["id_a"], r["id_b"]) for r in embedding_dup_pairs_lsh(df, threshold=0.95).collect()}
    assert len(exact) >= 50  # the 20 clusters produce 60 true pairs
    assert lsh <= exact  # precision 1.0: verify is exact
    assert len(lsh & exact) / len(exact) >= 0.95  # recall in the LSH regime


def test_hash_sampling_properties(spark):
    """Content-hash sampling: deterministic, composable (smaller fraction
    is a subset of larger at the same salt), split exhaustive+disjoint."""
    from kafka_connect_jsonata_spark.operators.sampling import hash_sample, hash_split

    df = spark.range(5000)
    s10 = {r["id"] for r in hash_sample(df, "id", 0.10).collect()}
    s01 = {r["id"] for r in hash_sample(df, "id", 0.01).collect()}
    assert s01 <= s10  # composability
    assert abs(len(s10) / 5000 - 0.10) < 0.02
    assert s10 == {r["id"] for r in hash_sample(df, "id", 0.10).collect()}  # stable

    splits = hash_split(df, "id", {"train": 0.8, "val": 0.1, "test": 0.1})
    sets = {k: {r["id"] for r in v.collect()} for k, v in splits.items()}
    assert sum(len(s) for s in sets.values()) == 5000  # exhaustive
    assert not (sets["train"] & sets["val"]) and not (sets["val"] & sets["test"])
    # a different salt reshuffles membership
    other = {r["id"] for r in hash_sample(df, "id", 0.10, salt="v2").collect()}
    assert other != s10


def test_load_table_session_portable(spark, sf_dir):
    """Regression (round-1 verdict): load_table must work on sessions NOT
    built by engine.get_spark — the external harness hands us a vanilla
    session and events.parquet is TIMESTAMP(NANOS). load_table must set
    nanosAsLong itself at read time."""
    from pyspark.sql.types import TimestampType

    from kafka_connect_jsonata_spark.sources.readers import load_table

    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = load_table(spark, sf_dir, "events")
        assert isinstance(df.schema["ts"].dataType, TimestampType)
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
