"""Training-data curation operators (functions/curation.py): value-pinned
unit tests for decontamination, PII redaction, repetition stats, TF-IDF and
k-means, plus plan-shape checks for the zero-shuffle E-step."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_jsonata_spark.functions import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_shingles(spark):
    df = _docs(spark, [(1, "a b c d"), (2, "a b"), (3, "")])
    out = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", curation.word_shingles(F.col("text"), 3).alias("sh")).collect()
    }
    assert out[1] == ["a b c", "b c d"]
    assert out[2] == []  # shorter than n -> empty, not descending-sequence garbage
    assert out[3] == []


def test_ngram_overlap_contamination(spark):
    train = _docs(
        spark,
        [
            (1, "the quick brown fox jumps"),   # shares "the quick brown" with eval
            (2, "totally clean document text here"),
            (3, "quick brown fox jumps high"),  # shares "quick brown fox" etc.
        ],
    )
    eval_set = _docs(spark, [(100, "the quick brown fox runs")])
    out = {
        r["doc_id"]: (r["n_overlap"], r["contaminated"])
        for r in curation.ngram_overlap_contamination(train, eval_set, n=3).collect()
    }
    # eval 3-grams: {the quick brown, quick brown fox, brown fox runs}
    assert out[1] == (2, True)   # "the quick brown", "quick brown fox"
    assert out[2] == (0, False)  # zero-overlap docs still present (left join)
    assert out[3] == (1, True)   # "quick brown fox"


def test_decontamination_plan_broadcasts_eval_side(spark, sf_dir):
    """Scale contract: the eval shingles broadcast into a left-semi hash
    join — the training corpus must reach the join without an Exchange
    (no sort-merge, no corpus-side hash partitioning before the semi)."""
    from kafka_connect_jsonata_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 50 == 0)
    out = curation.ngram_overlap_contamination(docs, ev, n=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    semi = [ln for ln in plan.splitlines() if "BroadcastHashJoin" in ln and "LeftSemi" in ln]
    assert semi, plan


def test_pii_redact(spark):
    df = _docs(
        spark,
        [(1, "mail a.b@x.io or 555-123-4567 ssn 123-45-6789 ok"), (2, "clean")],
    )
    out = {r["doc_id"]: r for r in curation.pii_redact(df, "text").collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ssn"]) == (1, 1, 1)
    assert out[1]["redacted"] == "mail [EMAIL] or [PHONE] ssn [SSN] ok"
    assert (out[2]["n_email"], out[2]["n_phone"], out[2]["n_ssn"]) == (0, 0, 0)
    assert out[2]["redacted"] == "clean"


def test_repetition_stats(spark):
    df = _docs(spark, [(1, "a a a b"), (2, "v w x y z")])
    out = {r["doc_id"]: r for r in curation.repetition_stats(df).collect()}
    assert out[1]["n_words"] == 4 and out[1]["n_distinct_words"] == 2
    assert out[1]["top_term_ratio"] == 0.75 and out[1]["repetitive"] is True
    # 0.2 is not > the 0.2 default threshold -> clean
    assert out[2]["top_term_ratio"] == 0.2 and out[2]["repetitive"] is False


def test_tfidf_top_terms(spark):
    df = _docs(spark, [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry date")])
    out = curation.tfidf_top_terms(df, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # "apple" appears only in doc 1 (df=1) twice -> clear winner there;
    # banana/cherry have df=2, date df=1
    assert top[1] == "apple"
    assert top[3] == "date"
    assert all(r["rank"] == 1 for r in out)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_assign_nearest_centroid_values_and_plan(spark):
    emb = _emb(
        spark,
        [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, [0.4, 0.0]), (3, [9.0, 10.0])],
    )
    cents = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").cast("int").alias("cluster_id"), F.col("embedding").alias("centroid")
    )
    res = curation.assign_nearest_centroid(emb, cents)
    got = {r["vec_id"]: (r["cluster_id"], r["dist_sq"]) for r in res.collect()}
    assert got[0] == (0, 0.0) and got[1] == (1, 0.0)
    assert got[2] == (0, pytest.approx(0.16, abs=1e-4))
    assert got[3] == (1, pytest.approx(1.0, abs=1e-4))
    # zero-shuffle contract: pure projection, no Exchange in the plan
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_assign_nearest_centroid_gemm_fallback_matches_literal_plan(spark):
    """Above the k*d literal budget the E-step switches to the
    closure-carried numpy kernel; values (incl. the cluster_id tie-break)
    must match the inlined-literal plan exactly."""
    rows = [(i, [float(i % 7), float((i * 3) % 5)]) for i in range(40)]
    emb = _emb(spark, rows)
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [5.0, 3.0]), (2, [3.0, 1.0])],
        "cluster_id int, centroid array<double>",
    )
    lit = curation.assign_nearest_centroid(emb, cents)
    gemm = curation.assign_nearest_centroid(emb, cents, literal_budget=1)
    assert "MapInPandas" in gemm._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in gemm._jdf.queryExecution().executedPlan().toString()
    a = {r["vec_id"]: (r["cluster_id"], r["dist_sq"]) for r in lit.collect()}
    b = {r["vec_id"]: (r["cluster_id"], r["dist_sq"]) for r in gemm.collect()}
    assert a == b


def test_assign_tie_breaks_on_cluster_id(spark):
    emb = _emb(spark, [(7, [1.0, 0.0])])
    cents = spark.createDataFrame(
        [(5, [0.0, 0.0]), (2, [2.0, 0.0])], "cluster_id int, centroid array<double>"
    )
    r = curation.assign_nearest_centroid(emb, cents).first()
    assert r["cluster_id"] == 2  # equal distance -> lowest cluster_id wins


def test_chunk_dedup(spark):
    df = _docs(
        spark,
        [
            (1, "a b c d e f"),        # chunks (size 3): "a b c", "d e f"
            (2, "a b c x y z"),        # "a b c" is a dup of doc 1's first chunk
            (3, "d e f"),              # dup of doc 1's second chunk -> emptied
        ],
    )
    out = {r["doc_id"]: r for r in curation.chunk_dedup(df, chunk_words=3).collect()}
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["text_dedup"] == "a b c d e f"
    assert out[2]["n_kept"] == 1 and out[2]["text_dedup"] == "x y z"
    assert out[3]["n_kept"] == 0 and out[3]["text_dedup"] == ""


def test_unigram_logprob_score(spark):
    import math

    df = _docs(spark, [(1, "common common common"), (2, "common rare")])
    out = {r["doc_id"]: r for r in curation.unigram_logprob_score(df).collect()}
    # corpus: common x4, rare x1, total 5
    lp_common = math.log(5) - math.log(4)
    lp_rare = math.log(5) - math.log(1)
    assert out[1]["avg_neg_logp"] == pytest.approx(lp_common, abs=1e-6)
    assert out[2]["avg_neg_logp"] == pytest.approx((lp_common + lp_rare) / 2, abs=1e-6)
    assert out[2]["avg_neg_logp"] > out[1]["avg_neg_logp"]  # rare tokens score higher


def test_embedding_covariance_and_pca(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    # anisotropic cloud: variance 9 along x, 0.25 along y, mean (3, -1)
    pts = rng.normal(0, 1, (400, 2)) * [3.0, 0.5] + [3.0, -1.0]
    emb = _emb(spark, [(i, [float(a), float(b)]) for i, (a, b) in enumerate(pts)])

    mean, cov = curation.embedding_covariance(emb)
    p32 = pts.astype(np.float32).astype(np.float64)  # storage is array<float>
    np.testing.assert_allclose(mean, p32.mean(axis=0), rtol=1e-9)
    np.testing.assert_allclose(cov, np.cov(p32.T, bias=True), rtol=1e-9)

    proj = curation.pca_project(emb, n_components=2).toPandas()
    # pc1 must capture the high-variance axis; projections are centered
    assert proj["pc1"].var() > proj["pc2"].var() * 4
    assert abs(proj["pc1"].mean()) < 1e-4 and abs(proj["pc2"].mean()) < 1e-4
    # deterministic: second run bit-identical (sign convention pins eigvecs)
    proj2 = curation.pca_project(emb, n_components=2).toPandas()
    assert (proj.sort_values("vec_id").values == proj2.sort_values("vec_id").values).all()


def test_heavy_hitter_terms_exact(spark):
    from kafka_connect_jsonata_spark.functions.text import heavy_hitter_terms

    rows = []
    # zipf-ish: term_i appears (40 - i) times, plus 60 singleton noise terms
    for i in range(20):
        rows += [(len(rows) + j, f"t{i:02d}") for j in range(40 - i)]
    noise = [(10_000 + i, f"noise{i}") for i in range(60)]
    df = spark.createDataFrame(rows + noise, "doc_id long, text string").repartition(8)
    got = [(r["term"], r["freq"]) for r in heavy_hitter_terms(df, k=5, capacity=32).collect()]
    assert got == [(f"t{i:02d}", 40 - i) for i in range(5)]  # exact counts, exact order


def test_kmeans_lloyd_separates_clusters(spark):
    rows = [(i, [0.0 + i * 0.01, 0.0]) for i in range(10)] + [
        (100 + i, [50.0 + i * 0.01, 0.0]) for i in range(10)
    ]
    res = curation.kmeans_lloyd(_emb(spark, rows), k=2, iters=5).collect()
    by_cluster: dict[int, set[int]] = {}
    for r in res:
        by_cluster.setdefault(r["cluster_id"], set()).add(r["vec_id"])
    groups = sorted(by_cluster.values(), key=lambda s: min(s))
    assert groups[0] == set(range(10))
    assert groups[1] == {100 + i for i in range(10)}


def test_kmeans_lloyd_fewer_rows_than_k(spark):
    """A corpus smaller than k must degrade to k=n, not crash (round-4
    review: the fused M-step sized its partial arrays by the requested k
    while init had fewer centroids)."""
    emb = _emb(spark, [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, [10.0, 9.0])])
    got = {r["vec_id"]: r["cluster_id"] for r in curation.kmeans_lloyd(emb, k=5, iters=2).collect()}
    assert len(got) == 3
    assert got[1] == got[2] != got[0] or len(set(got.values())) <= 3


def test_kmeans_lloyd_matches_numpy_reference_exactly(spark):
    """The fused E+M partials loop must reproduce a single-threaded numpy
    Lloyd reference exactly. Integer-valued vectors make every sum exactly
    representable, so float summation order cannot blur the comparison —
    any divergence is a real algorithmic difference (init, tie-break,
    empty-cluster rule, or partial aggregation)."""
    import numpy as np

    rng = np.random.RandomState(3)
    x = rng.randint(-8, 9, size=(120, 6)).astype(float)
    df = _emb(spark, [(i, [float(a) for a in v]) for i, v in enumerate(x)]).repartition(9)

    k, iters = 5, 4
    cents = x[:k].copy()  # deterministic init: k lowest ids
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # ties -> lowest cluster id
        for c in range(k):
            sel = x[assign == c]
            if len(sel):
                cents[c] = sel.mean(axis=0)
    d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    want_assign = d2.argmin(axis=1)
    want_dist = d2[np.arange(len(x)), want_assign]

    got = {
        r["vec_id"]: (r["cluster_id"], r["dist_sq"])
        for r in curation.kmeans_lloyd(df, k=k, iters=iters).collect()
    }
    for i in range(len(x)):
        assert got[i][0] == int(want_assign[i]), i
        assert got[i][1] == pytest.approx(float(want_dist[i]), abs=1e-4), i


def test_gopher_quality_signals_and_keep(spark):
    from kafka_connect_jsonata_spark.functions.curation import gopher_quality

    good = "the quick brown fox jumps over the lazy dog and it " * 6  # 66 words
    rows = [
        (1, good),
        (2, "short doc"),  # fails min_words
        (3, "- one\n- two\n- three"),  # all bullet lines
        (4, "trailing...\nalso trailing...\nzz"),  # ellipsis-ended lines
        (5, "#### " + good),  # symbols, diluted below threshold by length
        (6, ""),  # empty
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in gopher_quality(df).collect()}

    assert got[1]["keep"] is True
    assert got[1]["n_words"] == 66
    assert got[2]["keep"] is False and got[2]["n_words"] == 2
    assert got[3]["bullet_frac"] == 1.0 and got[3]["keep"] is False
    assert got[4]["ellipsis_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert got[5]["symbol_ratio"] > 0
    assert got[6]["n_words"] == 0 and got[6]["keep"] is False


def test_gopher_quality_stopword_floor(spark):
    from kafka_connect_jsonata_spark.functions.curation import gopher_quality

    # 60 words, none of them stopwords -> stop_hits 0 -> rejected
    no_stops = "alpha beta gamma delta epsilon zeta " * 10
    df = spark.createDataFrame([(1, no_stops)], ["doc_id", "text"])
    row = gopher_quality(df).collect()[0]
    assert row["stop_hits"] == 0 and row["keep"] is False


def test_compression_ratio_signal(spark):
    import zlib

    from kafka_connect_jsonata_spark.functions.curation import compression_ratio

    rows = [
        (1, "abc " * 200),                      # highly repetitive
        (2, "the quick brown fox jumps over the lazy dog. " * 10),
        (3, "kq9!zX2#mP8$vL5@wN7%"),            # high entropy, short
        (4, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in compression_ratio(df).collect()}
    # exact parity with local zlib at the same level
    for did, text in rows:
        if text:
            raw = text.encode()
            want = len(zlib.compress(raw, 6)) / len(raw)
            assert got[did]["compression_ratio"] == pytest.approx(want, abs=0)
            assert got[did]["n_bytes"] == len(raw)
    assert got[4]["compression_ratio"] == 1.0
    # repetitive < prose < high-entropy
    assert got[1]["compression_ratio"] < got[2]["compression_ratio"] < got[3]["compression_ratio"]


def test_bigram_logprob_matches_reference(spark):
    import math
    from collections import Counter

    from kafka_connect_jsonata_spark.functions.curation import bigram_logprob_score

    rows = [(1, "a b a b c"), (2, "c c c"), (3, "x"), (4, "a b")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in bigram_logprob_score(df).collect()}

    pairs, toks = [], []
    per_doc = {}
    for did, text in rows:
        ws = text.split()
        toks.extend(ws)
        ps = list(zip(ws, ws[1:]))
        per_doc[did] = ps
        pairs.extend(ps)
    c12, c1 = Counter(pairs), Counter(p[0] for p in pairs)
    v = len(set(toks))
    for did, ps in per_doc.items():
        if not ps:
            assert got[did]["n_bigrams"] == 0 and got[did]["avg_neg_logp2"] is None
            continue
        want = sum(
            -math.log((c12[p] + 0.1) / (c1[p[0]] + 0.1 * v)) for p in ps
        ) / len(ps)
        assert got[did]["n_bigrams"] == len(ps)
        assert got[did]["avg_neg_logp2"] == pytest.approx(want, abs=1e-6)


def test_bigram_logprob_floor_maps_rare_to_unk(spark):
    from kafka_connect_jsonata_spark.functions.curation import bigram_logprob_score

    # 'rare' appears once -> floored to <unk>; 'a'/'b' survive
    rows = [(1, "a b a b"), (2, "a rare b"), (3, "a b")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bigram_logprob_score(df, min_term_count=2)
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    # doc 2 has pairs (a,<unk>), (<unk>,b): each occurs once in the corpus,
    # so its score must exceed doc 3's common (a,b) pair score
    assert got[2]["avg_neg_logp2"] > got[3]["avg_neg_logp2"]
    with pytest.raises(ValueError):
        bigram_logprob_score(df, min_term_count=0)


def test_bigram_logprob_floor_V_is_retained_plus_one(spark):
    """Exact reference parity WITH the frequency floor: V must be the
    count of RETAINED types + 1 for the OOV bucket — not one larger
    (round-6 ADVICE fix: countDistinct previously ran after the <unk>
    substitution, double-counting the bucket)."""
    import math
    from collections import Counter

    from kafka_connect_jsonata_spark.functions.curation import bigram_logprob_score

    rows = [(1, "a b a b"), (2, "a rare b"), (3, "a b odd a")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r.asDict()
        for r in bigram_logprob_score(df, min_term_count=2).collect()
    }

    toks = [w for _, t in rows for w in t.split()]
    keep = {w for w, c in Counter(toks).items() if c >= 2}
    sub = {
        did: [w if w in keep else "<unk>" for w in t.split()] for did, t in rows
    }
    pairs = [p for ws in sub.values() for p in zip(ws, ws[1:])]
    c12, c1 = Counter(pairs), Counter(p[0] for p in pairs)
    v = len(keep) + 1  # retained types + OOV bucket
    for did, ws in sub.items():
        ps = list(zip(ws, ws[1:]))
        want = sum(
            -math.log((c12[p] + 0.1) / (c1[p[0]] + 0.1 * v)) for p in ps
        ) / len(ps)
        assert got[did]["avg_neg_logp2"] == pytest.approx(want, abs=1e-6), did
