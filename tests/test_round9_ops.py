"""Round-9 scale hardening (round-8 verdict items 1 + 3).

1. Hot-bucket hardening for LSH pair generation: exact-duplicate
   pre-collapse in minhash_dedup (Lee et al. 2021 §4 — exact dedup before
   fuzzy) plus the bucket_cap hub overflow policy in
   _bucket_candidate_pairs. The 50k-identical-doc stress that used to be a
   guaranteed single-task OOM (one bucket row expanding k^2/2 structs)
   now completes in seconds with the identical kept set.
2. Alternating large-star / small-star connected components (Kiveris et
   al. SoCC'14) replacing O(diameter) min-label propagation in
   dup_groups_from_pairs' distributed tier — parity-pinned against the
   driver union-find on adversarial (chain), random, and star graphs.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from kafka_connect_jsonata_spark.functions import dedup
from kafka_connect_jsonata_spark.sources.readers import load_table

BASE = "the quick brown fox jumps over the lazy dog " * 8


# ---------------------------------------------------------------- item 1


def test_minhash_dedup_50k_identical_docs_stress(spark):
    """The round-8 verdict's named scale-killer: >= 50k byte-identical
    documents in one corpus. Pre-collapse must reduce the class to one
    LSH representative — the job completes (no quadratic task) and keeps
    exactly the class minimum plus every unique doc."""
    rows = [(i, BASE) for i in range(50_000)]
    rows += [
        (100_000 + i, f"unique document number {i} with its own content {i * 7}")
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(16)
    kept = sorted(
        r[0]
        for r in dedup.minhash_dedup(df, num_hashes=32, n_bands=8, threshold=0.9)
        .select("doc_id")
        .collect()
    )
    assert len(kept) == 101
    assert kept[0] == 0  # the identical class keeps its minimum id
    assert kept[1:] == [100_000 + i for i in range(100)]


def test_minhash_dedup_collapse_parity_with_round8_path(spark, sf_dir):
    """collapse_exact=True is value-preserving: identical kept set as the
    round-8 single-stage composition on the real corpus, for both keep
    policies."""
    docs = load_table(spark, sf_dir, "documents")
    for kw in (
        dict(keep="first"),
        dict(keep="best", score_col="__q"),
    ):
        d = docs.withColumn("__q", F.length("text"))
        new = sorted(
            r[0]
            for r in dedup.minhash_dedup(
                d, num_hashes=32, n_bands=8, threshold=0.9, **kw
            )
            .select("doc_id")
            .collect()
        )
        old = sorted(
            r[0]
            for r in dedup.minhash_dedup(
                d,
                num_hashes=32,
                n_bands=8,
                threshold=0.9,
                collapse_exact=False,
                bucket_cap=None,
                **kw,
            )
            .select("doc_id")
            .collect()
        )
        assert new == old and new


def test_minhash_dedup_replicated_corpus_keeps_plain_result(spark, sf_dir):
    """Replicating every document (offset ids) must not change the kept
    set: each replica loses to its original, and replicas add no new
    shingle sets — the semantics the minhash_dedup_boiler_docs gate pins
    against the plain-corpus SQL oracle."""
    docs = load_table(spark, sf_dir, "documents")
    plain = sorted(
        r[0]
        for r in dedup.minhash_dedup(docs, num_hashes=32, n_bands=8, threshold=0.9)
        .select("doc_id")
        .collect()
    )
    mx = docs.agg(F.max("doc_id")).first()[0]
    rep = docs
    for k in range(1, 4):
        rep = rep.union(docs.withColumn("doc_id", F.col("doc_id") + (mx + 1) * k))
    boiler = sorted(
        r[0]
        for r in dedup.minhash_dedup(rep, num_hashes=32, n_bands=8, threshold=0.9)
        .select("doc_id")
        .collect()
    )
    assert boiler == plain


def _template_corpus(spark):
    """400 near-identical (DISTINCT text) template docs + 50 unrelated:
    the residual hot-bucket class exact collapse cannot remove."""
    tpl = "breaking news template header navigation footer copyright " * 6
    rows = [(i, tpl + f"x{i}") for i in range(400)]
    rows += [
        (10_000 + i, f"regular doc {i} body text {i * 13} assorted words {i % 17}")
        for i in range(50)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(8)


def test_bucket_cap_hub_preserves_components(spark):
    """bucket_cap bounds per-bucket expansion to cap^2/2 + overflow hub
    links; capped candidate pairs are a subset of the uncapped pairs and
    the duplicate COMPONENTS (what dedup consumes) are unchanged —
    template-class members stay reachable through the bucket-minimum hub."""
    df = _template_corpus(spark)
    p_cap = dedup.minhash_lsh_pairs(df, threshold=0.9, bucket_cap=8)
    p_unc = dedup.minhash_lsh_pairs(df, threshold=0.9, bucket_cap=None)
    cap_set = {(r.id_a, r.id_b) for r in p_cap.collect()}
    unc_set = {(r.id_a, r.id_b) for r in p_unc.collect()}
    assert cap_set and cap_set < unc_set  # strictly fewer enumerated pairs
    g_cap = sorted(
        map(tuple, dedup.dup_groups_from_pairs(p_cap, strategy="driver").collect())
    )
    g_unc = sorted(
        map(tuple, dedup.dup_groups_from_pairs(p_unc, strategy="driver").collect())
    )
    assert g_cap == g_unc


def test_bucket_cap_dedup_kept_set_unchanged(spark):
    df = _template_corpus(spark)
    k_cap = sorted(
        r[0]
        for r in dedup.minhash_dedup(df, threshold=0.9, bucket_cap=8)
        .select("doc_id")
        .collect()
    )
    k_unc = sorted(
        r[0]
        for r in dedup.minhash_dedup(df, threshold=0.9, bucket_cap=None)
        .select("doc_id")
        .collect()
    )
    assert k_cap == k_unc
    assert k_cap[0] == 0 and 10_000 in k_cap


def test_bucket_cap_validation(spark):
    df = _template_corpus(spark)
    with pytest.raises(ValueError, match="bucket_cap"):
        dedup.minhash_lsh_pairs(df, bucket_cap=1).collect()


# ---------------------------------------------------------------- item 3


def _parity(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    drv = sorted(
        map(tuple, dedup.dup_groups_from_pairs(df, strategy="driver").collect())
    )
    dist = sorted(
        map(tuple, dedup.dup_groups_from_pairs(df, strategy="distributed").collect())
    )
    assert drv == dist
    return drv


def test_cc_chain_graph_beyond_label_prop_budget(spark):
    """Chain of diameter 200: min-label propagation needed 200 rounds (>
    the 20-round budget); alternating star converges in O(log^2 n) and
    must match the driver union-find exactly."""
    labels = _parity(spark, [(i, i + 1) for i in range(200)])
    assert labels == [(i, 0) for i in range(201)]


def test_cc_random_graph_parity(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(500), rng.randrange(500)) for _ in range(300)]
    _parity(spark, [e for e in edges if e[0] != e[1]])


def test_cc_star_and_disjoint_components(spark):
    edges = [(100, i) for i in range(1, 20)]  # star rooted above its leaves
    edges += [(1000, 1001), (1002, 1001)]  # separate 3-chain
    labels = dict(_parity(spark, edges))
    assert labels[100] == 1 and all(labels[i] == 1 for i in range(1, 20))
    assert labels[1000] == labels[1001] == labels[1002] == 1000


def test_cc_unconverged_raises(spark):
    """A silent unconverged return would dedup wrongly; the distributed
    tier must raise when max_iter is exhausted before the star fixpoint."""
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(2000)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="converge"):
        dedup.dup_groups_from_pairs(df, strategy="distributed", max_iter=1)


# ------------------------------------------------- simhash collapse path


def test_simhash_identical_docs_stream_intra_pairs(spark):
    """k identical docs collapse to ONE banded signature; the k*(k-1)/2
    Hamming-0 output pairs come from a streaming equi-join, never a
    single-task array expansion."""
    k = 2_000
    rows = [(i, BASE) for i in range(k)]
    rows += [(50_000 + i, f"doc {i} unlike the rest {i * 3}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)
    out = dedup.simhash_dup_pairs(df, max_hamming=3)
    n_intra = out.filter(
        (F.col("id_a") < k) & (F.col("id_b") < k) & (F.col("hamming") == 0)
    ).count()
    assert n_intra == k * (k - 1) // 2


def test_simhash_collapse_parity_with_bruteforce(spark, sf_dir):
    """Collapsed banding returns exactly the brute-force Hamming <= 3 pair
    set (with distances) on the real corpus, portable signature."""
    docs = load_table(spark, sf_dir, "documents")
    got = sorted(
        (r.id_a, r.id_b, r.hamming)
        for r in dedup.simhash_dup_pairs(docs, max_hamming=3, portable=True).collect()
    )
    sigs = docs.select("doc_id", dedup.simhash_portable(F.col("text")).alias("s"))
    bf = (
        sigs.alias("a")
        .join(sigs.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.s").bitwiseXOR(F.col("b.s"))).alias("h"),
        )
        .filter(F.col("h") <= 3)
    )
    want = sorted((r.id_a, r.id_b, r.h) for r in bf.collect())
    assert got == want and got


def test_simhash_max_hamming_zero_is_intra_only(spark, sf_dir):
    """max_hamming=0 degenerates to the identical-signature classes: one
    chunk == the whole signature, so banding over DISTINCT signatures can
    never pair two different values — the output is exactly the
    intra-class Hamming-0 pairs."""
    docs = load_table(spark, sf_dir, "documents")
    got = sorted(
        (r.id_a, r.id_b)
        for r in dedup.simhash_dup_pairs(docs, max_hamming=0, portable=True).collect()
    )
    sigs = docs.select("doc_id", dedup.simhash_portable(F.col("text")).alias("s"))
    bf = (
        sigs.alias("a")
        .join(sigs.alias("b"), F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(F.col("a.s") == F.col("b.s"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    want = sorted((r.id_a, r.id_b) for r in bf.collect())
    assert got == want


# ------------------------------------------------ compiler tranche (item 5)


def test_compiled_binds_and_keep_array_structural(spark):
    """Round-9 tier-1 tranche (B1.8/B1.10): positional (#$i) and focus
    (@$v) binds, keep-array ([]), and expression path steps over arrays
    compile to pure Column transforms — structural outputs pinned against
    the tier-2 interpreter on a multi-element corpus (the dual-tier corpus
    sweeps cover the aggregate forms; this pins the array shapes)."""
    from kafka_connect_jsonata_spark.transform import transform

    df = spark.createDataFrame(
        [(1, [10, 20, 30], [{"b": 1}, {"b": 2}], 7, ["a b", "c d"])],
        "id long, a array<long>, s array<struct<b:long>>, x long,"
        " t array<string>",
    )
    cases = [
        ("a#$i.($i)", [0, 1, 2]),
        ("a#$i.($ + $i)", [10, 21, 32]),
        ("a@$v.($v * 2)", [20, 40, 60]),
        ("s@$v.($v.b)", [1, 2]),
        ("a[]", [10, 20, 30]),
        ("x[]", [7]),
        ("s[].b", [1, 2]),
        ("a.($ * 2)", [20, 40, 60]),
        ("a.(-$)", [-10, -20, -30]),
        ("t.$split($, ' ')", ["a", "b", "c", "d"]),
        ("a.($ > 15 ? 'big' : 'small')", ["small", "big", "big"]),
        ("a.($ * 2).($ + 1)", [21, 41, 61]),
    ]
    for expr, want in cases:
        c = transform(df, expr, force_tier="compiled")
        got = c.collect()[0][0]
        norm = [int(v) if isinstance(v, float) and v == int(v) else v for v in got]
        assert norm == want, (expr, got)
        # interpreter agreement (its JSON rendering)
        import json

        i = transform(df, expr, force_tier="interpreter")
        ival = json.loads(i.collect()[0][0])
        assert ival == want, (expr, ival)


def test_compiled_bind_object_step(spark):
    from kafka_connect_jsonata_spark.transform import transform

    df = spark.createDataFrame(
        [(1, [{"b": 5}, {"b": 9}])], "id long, s array<struct<b:long>>"
    )
    c = transform(df, "s#$i.{'v': $.b, 'i': $i}", force_tier="compiled")
    assert [r.asDict() for r in c.collect()[0][0]] == [
        {"v": 5, "i": 0},
        {"v": 9, "i": 1},
    ]
