"""Smoke: every registered query runs at sf0.001 and returns a stable schema.
Full value-level correctness vs DuckDB is exercised by tools/check_oracle.py
(and the driver's gate at sf0.01)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_jsonata_spark import queries as Q


@pytest.mark.parametrize("name", sorted(Q.QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = Q.QUERIES[name](spark, sf_dir)
    assert df.columns  # non-empty schema
    assert df.count() >= 0


ROWS_ONLY = {
    # rng-generated payload content: no SQL analog; exact values pinned in
    # tests/test_multimodal.py
    "multimodal_image_stats",
    "multimodal_audio_features",
    # driver-side eigh / iterative Lloyd loop: no SQL analog; determinism
    # and convergence pinned in tests/test_curation.py (the E-step and
    # covariance entries ARE oracle-gated: kmeans_assign,
    # embedding_covariance_stats)
    "pca_project_embeddings",
    "kmeans_clusters",
    # iterative GD / BPE merge recursion: no SQL analog; numpy-reference
    # parity and the published worked example pinned in
    # tests/test_classifier.py and tests/test_bpe.py
    "quality_classifier_train",
    "bpe_encode_docs",
    # zlib deflate has no SQL analog; parity with local zlib pinned in
    # tests/test_curation.py
    "compression_ratio_docs",
    "pack_bpe_budget_docs",
    # streaming side effects (checkpoint + sinks) have no SQL analog; the
    # query SELF-PINS stream == batch fold and raises on divergence
    # (round 10, C85 demo gate)
    "stream_incremental_dedup_docs",
}


def test_every_query_has_oracle_or_is_declared():
    missing = set(Q.QUERIES) - set(Q.ORACLES) - ROWS_ONLY
    assert not missing, f"queries without oracle (should be deliberate): {missing}"


def test_ann_gates_match_bruteforce_exactly(spark, sf_dir):
    """The ANN gate queries run at recall-1.0 parameters so the brute-force
    SQL is their exact oracle — pin that invariant here (full row equality,
    not just recall) for both LSH and IVF."""
    import kafka_connect_jsonata_spark.queries as Q

    exact = sorted(map(tuple, Q.QUERIES["cosine_topk_bruteforce"](spark, sf_dir).collect()))
    for gate in ("ann_lsh_topk", "ann_ivf_topk"):
        approx = sorted(map(tuple, Q.QUERIES[gate](spark, sf_dir).collect()))
        assert approx == exact, f"{gate} diverged from brute force"


def test_ann_aggressive_params_recall_floor(spark, sf_dir):
    """The pruning operating points (fewer bands / probes than the gate)
    stay approximate — pin a recall floor and exact scoring of hits."""
    from pyspark.sql import functions as F

    from kafka_connect_jsonata_spark.functions import similarity as S
    from kafka_connect_jsonata_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    q = emb.filter(F.col("vec_id") < 5)
    truth = {
        (r["query_id"], r["neighbor_id"]): r["cosine_sim"]
        for r in S.cosine_topk(q, emb, k=5).collect()
    }
    for approx in (
        S.lsh_topk(q, emb, k=5, dim=dim, n_bands=8, band_bits=4),
        S.ivf_topk(q, emb, k=5, n_cells=16, n_probe=4),
    ):
        got = {(r["query_id"], r["neighbor_id"]): r["cosine_sim"] for r in approx.collect()}
        hits = set(truth) & set(got)
        assert len(hits) / len(truth) >= 0.5
        for key in hits:  # scores of true hits must match the exact computation
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


def test_mixture_sample_rates_and_nesting(spark):
    """Per-source mixture: each source keeps ~its rate; a source's sample
    nests inside the same source's higher-rate sample (same salt)."""
    from kafka_connect_jsonata_spark.operators.sampling import hash_sample, mixture_sample

    df = spark.range(6000).select(
        F.col("id"), (F.concat(F.lit("s"), (F.col("id") % 3).cast("string"))).alias("src")
    )
    out = mixture_sample(df, "id", "src", {"s0": 1.0, "s1": 0.3}, default_rate=0.05)
    by_src = {
        r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert by_src["s0"] == 2000  # rate 1.0 keeps everything
    assert abs(by_src["s1"] / 2000 - 0.3) < 0.05
    assert abs(by_src.get("s2", 0) / 2000 - 0.05) < 0.03
    # nesting: mixture rows of s1 == hash_sample(0.3) rows restricted to s1
    direct = {
        r["id"]
        for r in hash_sample(df.filter(F.col("src") == "s1"), "id", 0.3).collect()
    }
    assert {r["id"] for r in out.filter(F.col("src") == "s1").collect()} == direct


def test_pack_token_budget_matches_sequential_fill(spark):
    """Distributed two-phase prefix sum must equal the single-threaded
    concat-then-chunk reference exactly, for any bucketing."""
    from kafka_connect_jsonata_spark.operators.packing import pack_token_budget

    rows = [(i, " ".join(["w"] * ((i * 7) % 23))) for i in range(200)]  # incl. empty docs
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    for nb in (1, 3, 16):
        got = {
            r["doc_id"]: (r["n_tokens"], r["start_offset"], r["pack_id"], r["spans_boundary"])
            for r in pack_token_budget(df, budget=50, n_buckets=nb).collect()
        }
        off = 0
        for i, t in rows:
            n = len(t.split()) if t else 0
            pack = off // 50
            spans = n > 0 and (off + n - 1) // 50 != pack
            assert got[i] == (n, off, pack, spans), (nb, i)
            off += n


def test_load_table_session_portable(spark, sf_dir):
    """Regression (round-1 verdict): load_table must work on sessions NOT
    built by engine.get_spark — the external harness hands us a vanilla
    session and events.parquet is TIMESTAMP(NANOS). Spark 4.1+ reads that
    natively as TIMESTAMP_NTZ (UTC wall clock, micros truncation); Spark
    <=4.0 needs the nanosAsLong conf that load_table sets itself. Either
    way the ts_micros/ts_millis helpers must yield exact epoch values
    without depending on the session timezone."""
    from pyspark.sql.types import TimestampNTZType, TimestampType

    from kafka_connect_jsonata_spark.sources.readers import load_table, ts_micros

    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = load_table(spark, sf_dir, "events")
        assert isinstance(df.schema["ts"].dataType, (TimestampType, TimestampNTZType))
        assert df.count() > 0
        # epoch extraction is the call sites' contract: plain unix_micros
        # is an AnalysisException on NTZ, ts_micros must work on both types
        lo = df.select(ts_micros(df["ts"]).alias("us")).agg({"us": "min"}).first()[0]
        assert lo > 1_500_000_000_000_000  # sane epoch-microsecond range
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_datetime_queries_session_tz_independent(spark, sf_dir):
    """Regression (round 3): every epoch/ISO-rendering path must produce
    identical values whatever spark.sql.session.timeZone the harness set.
    to_utc_timestamp/date_format on session-zone timestamps silently shift
    values under non-UTC sessions; the engine uses convert_timezone-based
    forms instead."""
    from kafka_connect_jsonata_spark import queries as Q

    def snap(name):
        df = Q.QUERIES[name](spark, sf_dir)
        return sorted(tuple(str(v) for v in r) for r in df.limit(200).collect())

    names = ["jsonata_datetime_array_ops", "jsonata_picture_format", "sessionize_events"]
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    base = {n: snap(n) for n in names}
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        for n in names:
            assert snap(n) == base[n], f"{n} drifts with session timezone"
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_embedding_dup_pairs_auto_dispatch(spark):
    """Regression (round-1 verdict): embedding_dup_pairs must never
    toPandas() a corpus that exceeds the broadcast cap — auto mode sizes
    the corpus and routes to the LSH variant."""
    import random

    from kafka_connect_jsonata_spark.functions.dedup import embedding_dup_pairs

    rnd = random.Random(11)
    rows = []
    vid = 0
    for _ in range(10):  # clusters so both paths return the same pair set
        base = [rnd.gauss(0, 1) for _ in range(32)]
        for _ in range(3):
            rows.append((vid, [x + rnd.gauss(0, 0.01) for x in base]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    bc = embedding_dup_pairs(df, threshold=0.95, strategy="auto")  # fits: broadcast
    assert "MapInPandas" in bc._jdf.queryExecution().executedPlan().toString()
    # a 1-byte cap forces the LSH plan (no MapInPandas GEMM stage)
    lsh = embedding_dup_pairs(df, threshold=0.95, strategy="auto", broadcast_bytes_cap=1)
    assert "MapInPandas" not in lsh._jdf.queryExecution().executedPlan().toString()
    # and both strategies agree on the pair set for a broadcastable corpus
    assert {(r["id_a"], r["id_b"]) for r in bc.collect()} == {
        (r["id_a"], r["id_b"]) for r in lsh.collect()
    }


def test_barrier_reliable_mode(spark, tmp_path):
    """Round-1 verdict #7: dedup barriers must be switchable from
    executor-local checkpoints to reliable ones for cluster mode."""
    from kafka_connect_jsonata_spark.functions.dedup import (
        barrier,
        dup_groups_from_pairs,
    )

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    spark.conf.set("spark.jsonataspark.checkpoint", "reliable")
    try:
        df = barrier(spark.range(10))
        assert df.count() == 10
        assert df._jdf.queryExecution().optimizedPlan().toString().startswith(
            "LogicalRDD"
        )  # lineage truncated through the RELIABLE checkpoint
        import os

        assert any(os.scandir(str(tmp_path / "ckpt")))  # files actually written
        # an iterative pipeline end-to-end under reliable mode
        pairs = spark.createDataFrame(
            [(10, 2), (2, 30), (50, 60)], "id_a bigint, id_b bigint"
        )
        out = {r["doc_id"]: r["group_id"] for r in dup_groups_from_pairs(pairs).collect()}
        assert out == {10: 2, 2: 2, 30: 2, 50: 50, 60: 50}
    finally:
        spark.conf.unset("spark.jsonataspark.checkpoint")


def test_stratified_sample_properties(spark):
    """Exactly n per stratum (capped at group size), deterministic, and a
    different salt reshuffles the picks."""
    from kafka_connect_jsonata_spark.operators.sampling import stratified_sample

    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(97)], "id bigint, grp string"
    )
    out = stratified_sample(df, "id", "grp", 5)
    counts = {r["grp"]: r["n"] for r in out.groupBy("grp").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"big": 5, "small": 5}
    picks = {(r["grp"], r["id"]) for r in out.collect()}
    assert picks == {(r["grp"], r["id"]) for r in stratified_sample(df, "id", "grp", 5).collect()}
    assert picks != {(r["grp"], r["id"]) for r in stratified_sample(df, "id", "grp", 5, salt="v2").collect()}
    # a stratum smaller than n returns the whole stratum
    tiny = stratified_sample(df.filter("id >= 95"), "id", "grp", 5)
    assert tiny.count() == 2


def test_bm25_ranking_semantics(spark):
    """More occurrences of a rarer term in a shorter doc scores higher;
    docs with no query term are excluded; values match a hand computation."""
    import math

    from kafka_connect_jsonata_spark.functions.text import bm25_scores

    docs = spark.createDataFrame(
        [
            (0, "spark spark spark"),
            (1, "spark filler filler filler filler filler filler filler"),
            (2, "filler only no hits here"),
            (3, "spark"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r["score"] for r in bm25_scores(docs, ["spark"]).collect()}
    assert set(got) == {0, 1, 3}  # doc 2 has no query term
    assert got[3] > got[1]  # same tf=1, shorter doc wins
    assert got[0] > got[1]  # higher tf in shorter doc wins
    # hand computation for doc 3: N=4, df=3, dl=1, avgdl=(3+8+5+1)/4
    k1, b = 1.2, 0.75
    idf = math.log((4 - 3 + 0.5) / (3 + 0.5) + 1.0)
    denom = 1.0 + k1 * (1.0 - b + b * 1.0 / (17 / 4))
    assert abs(got[3] - idf * 1.0 * (k1 + 1.0) / denom) < 1e-12


def test_quantize_roundtrip_bounds(spark):
    """int8 quantization stays in [-127,127], dequantize recovers each
    component within scale/2, zero vectors are fixed points, and
    normalization yields unit norm."""
    from pyspark.sql import functions as F

    from kafka_connect_jsonata_spark.functions.similarity import (
        dequantize_int8,
        l2_norm,
        l2_normalize,
        quantize_int8,
        quantize_scale,
    )

    df = spark.createDataFrame(
        [(0, [0.1, -2.5, 3.75]), (1, [0.0, 0.0, 0.0]), (2, [-1e-3, 5e-4, 9.9])],
        "vec_id bigint, embedding array<double>",
    )
    v = F.col("embedding")
    out = df.select(
        "vec_id",
        quantize_int8(v).alias("q"),
        dequantize_int8(quantize_int8(v), quantize_scale(v)).alias("back"),
        l2_norm(l2_normalize(v)).alias("unit"),
        v.alias("orig"),
    ).collect()
    for r in out:
        assert all(-127 <= x <= 127 for x in r["q"])
        scale = max(abs(x) for x in r["orig"]) / 127.0
        for a, b in zip(r["back"], r["orig"]):
            assert abs(a - b) <= scale / 2 + 1e-12
        if any(r["orig"]):
            assert abs(r["unit"] - 1.0) < 1e-12
        else:
            assert r["unit"] == 0.0 and r["q"] == [0, 0, 0]


def test_pack_n_tokens_col_matches_text_path(spark, sf_dir):
    """pack_token_budget(n_tokens_col=...) with precomputed whitespace
    counts must place every doc exactly like the text path."""
    import pyspark.sql.functions as F

    from kafka_connect_jsonata_spark.functions.text import token_count
    from kafka_connect_jsonata_spark.operators.packing import pack_token_budget
    from kafka_connect_jsonata_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    via_text = pack_token_budget(docs, budget=512)
    pre = docs.select("doc_id", token_count(F.col("text")).alias("nt"))
    via_col = pack_token_budget(pre, budget=512, n_tokens_col="nt")
    a = sorted(map(tuple, via_text.select("doc_id", "start_offset", "pack_id").collect()))
    b = sorted(map(tuple, via_col.select("doc_id", "start_offset", "pack_id").collect()))
    assert a == b


def test_knn_graph_gemm_matches_local_reference(spark):
    import numpy as np

    from kafka_connect_jsonata_spark.functions import similarity as S

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in S.knn_graph(df, k=4, strategy="gemm").collect()
    }
    # reference on the float32-truncated values the table actually stores
    v32 = vecs.astype("float32").astype("float64")
    unit = v32 / np.linalg.norm(v32, axis=1, keepdims=True)
    sims = unit @ unit.T
    np.fill_diagonal(sims, -np.inf)
    for q in range(40):
        order = sorted(range(40), key=lambda j: (-sims[q, j], j))[:4]
        for rank, j in enumerate(order, 1):
            assert got[(q, rank)] == j, (q, rank)
    assert len(got) == 40 * 4


def test_knn_graph_lsh_recall_and_auto_routing(spark):
    import numpy as np

    from kafka_connect_jsonata_spark.functions import similarity as S

    rng = np.random.default_rng(11)
    # 8 tight clusters: near neighbors are genuinely near
    centers = rng.normal(size=(8, 32)) * 5
    vecs = np.concatenate(
        [c + rng.normal(size=(12, 32)) * 0.05 for c in centers]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.knn_graph(df, k=3, strategy="gemm").collect()
    }
    lsh = {
        (r["query_id"], r["neighbor_id"])
        for r in S.knn_graph(
            df, k=3, strategy="lsh", n_bands=16, band_bits=4
        ).collect()
    }
    assert len(lsh & exact) / len(exact) >= 0.95
    # auto with a tiny cap must route to lsh (same result set shape)
    routed = S.knn_graph(df, k=3, strategy="auto", broadcast_cap_bytes=64,
                         n_bands=16, band_bits=4)
    assert {(r["query_id"], r["neighbor_id"]) for r in routed.collect()} == lsh


def test_knn_graph_multiprobe_improves_recall(spark):
    """Round-10: directed multi-probe (flip the lowest-|margin| band bits,
    Lv et al. VLDB'07) must strictly improve LSH recall vs the exact tier
    on a hard corpus where single-bucket banding misses neighbors, and
    n_probes must validate against band width."""
    import numpy as np
    import pytest as _pytest

    from kafka_connect_jsonata_spark.functions import similarity as S

    rng = np.random.default_rng(7)
    # diffuse clusters: neighbors often straddle a hyperplane, the regime
    # where own-bucket banding leaks recall and probing recovers it
    centers = rng.normal(size=(6, 24)) * 2.0
    vecs = np.concatenate(
        [c + rng.normal(size=(20, 24)) * 0.8 for c in centers]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.knn_graph(df, k=3, strategy="gemm").collect()
    }

    def recall(n_probes):
        got = {
            (r["query_id"], r["neighbor_id"])
            for r in S.knn_graph(
                df, k=3, strategy="lsh", n_bands=6, band_bits=8,
                n_probes=n_probes,
            ).collect()
        }
        return len(got & exact) / len(exact)

    r0, r2 = recall(0), recall(2)
    assert r2 > r0, f"multi-probe must lift recall: {r0} -> {r2}"
    assert r2 >= 0.9, f"probed recall too low: {r2}"
    with _pytest.raises(ValueError, match="n_probes"):
        S.knn_graph(df, k=3, strategy="lsh", band_bits=4, n_probes=4)


def test_knn_graph_validation(spark):
    import pytest as _pytest

    from kafka_connect_jsonata_spark.functions import similarity as S

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError):
        S.knn_graph(df, k=0)
    with _pytest.raises(ValueError):
        S.knn_graph(df, k=1, strategy="hnsw")
    # k exceeding n-1 caps gracefully at the available neighbors
    out = S.knn_graph(df, k=5, strategy="gemm").collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in out} == {(0, 1), (1, 0)}


def test_hash_split_on_group_key_is_leakage_safe(spark):
    """The leakage-safe split recipe: after near-dup clustering, split on
    the CLUSTER id (hash_split with id_col=<group key>) so every member of
    a dup family lands in the same split — near-duplicates can never
    straddle the train/test boundary. hash_split is already key-generic;
    this pins the composition."""
    from kafka_connect_jsonata_spark.operators.sampling import hash_split

    rows = [(i, i // 3) for i in range(90)]  # 30 clusters of 3 near-dups
    df = spark.createDataFrame(rows, "doc_id long, cluster_id long")
    splits = hash_split(df, "cluster_id", {"train": 0.8, "test": 0.2}, salt="lk")
    train = {(r["doc_id"], r["cluster_id"]) for r in splits["train"].collect()}
    test = {(r["doc_id"], r["cluster_id"]) for r in splits["test"].collect()}
    assert len(train) + len(test) == 90 and not (train & test)
    train_clusters = {c for _, c in train}
    test_clusters = {c for _, c in test}
    assert not (train_clusters & test_clusters)  # no cluster straddles
    # and every cluster is complete on its side
    for side in (train, test):
        by_c = {}
        for d, c in side:
            by_c.setdefault(c, set()).add(d)
        for c, members in by_c.items():
            assert members == {3 * c, 3 * c + 1, 3 * c + 2}
