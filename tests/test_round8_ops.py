"""Round-8 C79: composed document-level fuzzy dedup (minhash_dedup =
MinHash -> banded LSH pairs -> exact-Jaccard verify -> connected
components -> keep-min-id anti-join, one operator call). Oracle-gated in
queries.py (MINHASH_DEDUP_SQL, tests/test_oracle_sweep.py); these tests
pin composition semantics, keep-first policy, and stream parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_jsonata_spark.functions import dedup
from kafka_connect_jsonata_spark.sources.readers import load_table


def test_minhash_dedup_equals_manual_composition(spark, sf_dir):
    """kept == corpus minus every doc whose component label is a smaller
    id, recomputed from the operator's own published pieces."""
    docs = load_table(spark, sf_dir, "documents")
    kept = dedup.minhash_dedup(docs, num_hashes=32, n_bands=8, threshold=0.9)
    pairs = dedup.minhash_lsh_pairs(docs, num_hashes=32, n_bands=8, threshold=0.9)
    groups = dedup.dup_groups_from_pairs(pairs)
    losers = {
        r["doc_id"]
        for r in groups.filter(F.col("doc_id") != F.col("group_id")).collect()
    }
    all_ids = {r[0] for r in docs.select("doc_id").collect()}
    got = {r[0] for r in kept.select("doc_id").collect()}
    assert got == all_ids - losers
    assert losers, "fixture corpus must contain near-dups for this test"
    # full input schema passes through
    assert kept.columns == docs.columns


def test_minhash_dedup_keeps_min_id_per_component(spark):
    """Three identical docs + one chained near-dup: exactly the minimum id
    of each component survives; unrelated docs pass untouched."""
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest looking for tasty food"
    )
    rows = [
        (7, base),
        (3, base),
        (9, base),
        (12, "completely different text about spark distributed joins "
             "and shuffle partitions in a large analytics cluster system"),
        (15, "unrelated third document mentioning minhash banding and "
             "jaccard similarity estimation at corpus scale pipelines"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(
        r[0]
        for r in dedup.minhash_dedup(
            df, num_hashes=32, n_bands=8, threshold=0.9
        ).collect()
    )
    assert kept == [3, 12, 15]


def test_minhash_dedup_keep_best_picks_top_score(spark):
    """keep='best' keeps the highest-score copy per component (min-id
    tie-break), not the minimum id."""
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest looking for tasty food"
    )
    rows = [
        (7, base + " extra"),  # J vs base 0.948, longest -> best
        (3, base),
        (9, base + " z"),  # J vs base 0.982
        (12, "completely different text about spark distributed joins "
             "and shuffle partitions in a large analytics cluster system"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "q", F.length("text")
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup.minhash_dedup(
            df, num_hashes=32, n_bands=8, threshold=0.9,
            keep="best", score_col="q",
        ).collect()
    )
    assert kept == [7, 12]
    # tie on score -> min id survives
    df2 = spark.createDataFrame(
        [(7, base), (3, base), (9, base)], "doc_id long, text string"
    ).withColumn("q", F.length("text"))
    kept2 = sorted(
        r["doc_id"]
        for r in dedup.minhash_dedup(
            df2, num_hashes=32, n_bands=8, threshold=0.9,
            keep="best", score_col="q",
        ).collect()
    )
    assert kept2 == [3]
    with pytest.raises(ValueError):
        dedup.minhash_dedup(df2, keep="best")  # score_col required
    with pytest.raises(ValueError):
        dedup.minhash_dedup(df2, keep="nope")


def test_minhash_dedup_no_dups_is_identity(spark):
    rows = [
        (1, "alpha bravo charlie delta echo foxtrot golf hotel india"),
        (2, "totally different words about juliet kilo lima mike november"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = dedup.minhash_dedup(df, num_hashes=32, n_bands=8, threshold=0.9)
    assert sorted(r[0] for r in kept.collect()) == [1, 2]


def test_minhash_dedup_strategies_agree(spark, sf_dir):
    """auto(driver) and forced-distributed components give identical kept
    sets — the 100-TB path is the same operator, not a separate code."""
    docs = load_table(spark, sf_dir, "documents")
    a = {
        r[0]
        for r in dedup.minhash_dedup(
            docs, num_hashes=32, n_bands=8, threshold=0.9, strategy="driver"
        )
        .select("doc_id")
        .collect()
    }
    b = {
        r[0]
        for r in dedup.minhash_dedup(
            docs, num_hashes=32, n_bands=8, threshold=0.9, strategy="distributed"
        )
        .select("doc_id")
        .collect()
    }
    assert a == b


def test_minhash_dedup_incremental_semantics(spark):
    """C81: new docs matching history drop; unmatched new docs keep;
    intra-batch dups among survivors resolve to the min id; the ref side
    passes through the cross-match only (never deduped itself)."""
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest looking for tasty food"
    )
    other = (
        "completely different text about spark distributed joins and "
        "shuffle partitions in a large analytics cluster system today"
    )
    ref = spark.createDataFrame([(100, base)], "doc_id long, text string")
    new = spark.createDataFrame(
        [
            (1, base + " z"),   # near-dup of history -> dropped
            (2, other),         # fresh, dup of 5 -> min id kept
            (5, other + " z"),  # dup of 2 -> dropped
            (9, "a third topic entirely mentioning minhash banding and "
                "jaccard similarity estimation at corpus scale pipelines"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup.minhash_dedup_incremental(
            new, ref, num_hashes=32, n_bands=8, threshold=0.9
        ).collect()
    )
    assert kept == [2, 9]


def test_minhash_match_against_is_cross_corpus_only(spark):
    """minhash_match_against reports NEW-vs-REF pairs only — two
    near-dup docs on the same side never pair."""
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest looking for tasty food"
    )
    new = spark.createDataFrame(
        [(1, base), (2, base + " z")], "doc_id long, text string"
    )
    ref = spark.createDataFrame(
        [(10, "entirely unrelated reference text about streaming state "
              "stores and watermark semantics in structured streaming")],
        "doc_id long, text string",
    )
    got = dedup.minhash_match_against(
        new, ref, num_hashes=32, n_bands=8, threshold=0.9
    ).collect()
    assert got == []  # 1-2 are near-dups of each other but same side


def test_simhash_dup_pairs_pigeonhole_recall(spark):
    """C83 exactness property: every pair within the Hamming budget is
    found (Manku pigeonhole — even when the differing bits land in
    DIFFERENT chunks), pairs beyond it are not. Checked by comparing the
    banded operator against a brute-force popcount join on the engine's
    own signatures, over a corpus with engineered near/far pairs."""
    import itertools
    import random

    rng = random.Random(8)
    words = [f"w{i}" for i in range(220)]
    rows = []
    for i in range(40):
        base = rng.sample(words, 30)
        rows.append((i * 10, " ".join(base)))
        # near variant: swap a couple of tokens
        v = list(base)
        v[0], v[1] = rng.choice(words), rng.choice(words)
        rows.append((i * 10 + 1, " ".join(v)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_dup_pairs(
            df, max_hamming=3, portable=True
        ).collect()
    }
    sigs = {
        r["doc_id"]: r["sig"]
        for r in df.select(
            "doc_id", dedup.simhash_portable(F.col("text")).alias("sig")
        ).collect()
    }
    want = set()
    for a, b in itertools.combinations(sorted(sigs), 2):
        h = bin(sigs[a] ^ sigs[b]).count("1")
        if h <= 3:
            want.add((a, b, h))
    assert got == want and want  # exact, and the fixture produced pairs


def test_simhash_dup_pairs_64bit_production_variant(spark):
    """The 64-bit xxhash64 signature path: identical docs pair at
    hamming 0; unrelated docs don't pair at a tight budget."""
    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base),
            (3, "totally different words kilo lima mike november oscar "
                "papa quebec romeo sierra tango uniform victor whiskey"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_dup_pairs(df, max_hamming=3).collect()
    }
    assert (1, 2, 0) in got
    assert all(3 not in (a, b) for a, b, _ in got)
    with pytest.raises(ValueError):
        dedup.simhash_dup_pairs(df, max_hamming=-1)


def test_minhash_incremental_precomputed_sketches_equivalent(spark, sf_dir):
    """ref_sketches= (the persisted-history fast path) must give exactly
    the kept set of the direct ref= path; ref/ref_sketches both absent
    raises."""
    docs = load_table(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 3 == 0)
    new = docs.filter(F.col("doc_id") % 3 != 0)
    direct = {
        r["doc_id"]
        for r in dedup.minhash_dedup_incremental(
            new, ref, num_hashes=32, n_bands=8, threshold=0.9
        ).select("doc_id").collect()
    }
    sk = dedup.minhash_sketches(ref, num_hashes=32, n_bands=8)
    via_sketches = {
        r["doc_id"]
        for r in dedup.minhash_dedup_incremental(
            new, None, num_hashes=32, n_bands=8, threshold=0.9,
            ref_sketches=sk,
        ).select("doc_id").collect()
    }
    assert direct == via_sketches and direct
    with pytest.raises(ValueError):
        dedup.minhash_match_against(new, None)


def test_dsir_shared_features_memoized_and_equivalent(spark, sf_dir):
    """Round-8 verdict item 7: both DSIR gates read ONE persisted feature
    table (the cluster materialize-once pattern); outputs are identical to
    the direct no-features path."""
    import kafka_connect_jsonata_spark.queries as Q

    f1 = Q._dsir_features_shared(spark, sf_dir)
    f2 = Q._dsir_features_shared(spark, sf_dir)
    assert f1 is f2  # memoized: one tokenize+hash scan per (app, sf_dir)
    assert f1.storageLevel.useMemory  # persisted
    from kafka_connect_jsonata_spark.functions import classifier

    docs = load_table(spark, sf_dir, "documents")
    direct = classifier.dsir_select(
        docs, F.col("source").isin("src0", "src1"), k=20
    ).collect()
    shared = Q.QUERIES["dsir_select_docs"](spark, sf_dir).collect()
    assert sorted(map(tuple, direct)) == sorted(map(tuple, shared))


def test_minhash_dedup_stream_foreachbatch_parity(spark, sf_dir, tmp_path):
    """C79 on a documents readStream via foreachBatch (the sanctioned
    shape for per-corpus dedup over micro-batches: each batch is deduped
    as a self-contained corpus). Row-exact with the one-shot batch run
    when the stream delivers the corpus as one micro-batch."""
    d = tmp_path / "docs_stream_minhash_dedup"
    d.mkdir()
    (d / "documents.parquet").symlink_to(f"{sf_dir}/documents.parquet")
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    batch_docs = load_table(spark, sf_dir, "documents")

    got: list[tuple] = []

    def sink(batch_df, _batch_id):
        got.extend(
            map(
                tuple,
                dedup.minhash_dedup(
                    batch_df, num_hashes=32, n_bands=8, threshold=0.9
                )
                .select("doc_id", "lang")
                .collect(),
            )
        )

    stream = spark.readStream.schema(schema).parquet(str(d))
    q = stream.writeStream.foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()
    exp = sorted(
        map(
            tuple,
            dedup.minhash_dedup(batch_docs, num_hashes=32, n_bands=8, threshold=0.9)
            .select("doc_id", "lang")
            .collect(),
        )
    )
    assert sorted(got) == exp and len(got) > 0
