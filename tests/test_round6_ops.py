"""Round-6 operators: C58 line cleaning, C59 inverted index, C60
boilerplate removal, C61 fuzzy decontamination. Each is also oracle-gated
end-to-end in queries.py; these tests pin the operator semantics on
hand-built corpora plus the plan shapes the 100 TB story depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_jsonata_spark.functions.curation import (
    fuzzy_contamination_pairs,
    remove_boilerplate_lines,
)
from kafka_connect_jsonata_spark.functions.text import clean_lines, inverted_index


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- clean_lines


def test_clean_lines_rules(spark):
    df = spark.createDataFrame(
        [
            (1, "Good long line here.\nshort\nthis line mentions javascript now"),
            (2, "All of it is kept fine.\nAnother keeper line here!"),
            (3, "no punct but long enough line"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in clean_lines(
            df, min_words=4, require_terminal_punct=True
        ).collect()
    }
    assert out[1]["cleaned"] == "Good long line here."
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 1)
    assert out[2]["n_kept"] == 2
    assert out[3]["n_kept"] == 0 and out[3]["cleaned"] == ""


def test_clean_lines_badword_case_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "enable JavaScript to view this page")], "doc_id long, text string"
    )
    row = clean_lines(df, min_words=1).first()
    assert row["n_kept"] == 0


def test_clean_lines_is_zero_shuffle(spark):
    df = spark.range(10).selectExpr("id AS doc_id", "'a b c' AS text")
    plan = plan_of(clean_lines(df))
    assert "Exchange" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------------- inverted_index


def test_inverted_index_postings(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "a")], "doc_id long, text string"
    )
    rows = {r["term"]: r for r in inverted_index(df).collect()}
    assert rows["a"]["doc_freq"] == 2 and rows["a"]["total_tf"] == 3
    assert rows["a"]["postings"] == "1,3"
    assert rows["b"]["postings"] == "1,2"
    assert rows["c"]["doc_freq"] == 1 and rows["c"]["postings"] == "2"


def test_inverted_index_caps_and_floor(spark):
    df = spark.createDataFrame(
        [(i, "x common") for i in range(5)] + [(9, "rare x")],
        "doc_id long, text string",
    )
    rows = {
        r["term"]: r
        for r in inverted_index(df, min_doc_freq=2, max_postings=3).collect()
    }
    assert "rare" not in rows  # floored
    assert "common" in rows and rows["common"]["postings"] == "0,1,2"  # capped
    assert rows["x"]["doc_freq"] == 6


# ---------------------------------------------------- remove_boilerplate_lines


def _boiler_df(spark):
    # 'footer' appears in 3/4 of group A docs (> 0.5), unique lines do not;
    # group B has no repeated line
    rows = [
        (1, "A", "alpha\nfooter"),
        (2, "A", "beta\nfooter"),
        (3, "A", "gamma\nfooter"),
        (4, "A", "delta"),
        (5, "B", "footer\nepsilon"),
        (6, "B", "zeta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_boilerplate_removed_per_group(spark):
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(
            _boiler_df(spark), max_doc_frac=0.5, min_docs=2
        ).collect()
    }
    assert out[1]["cleaned"] == "alpha" and out[1]["n_removed"] == 1
    assert out[4]["cleaned"] == "delta" and out[4]["n_removed"] == 0
    # 'footer' is NOT frequent in group B (1/2 docs = 0.5, not > 0.5)
    assert out[5]["cleaned"] == "footer\nepsilon"


def test_boilerplate_tiers_agree_and_preserve_order(spark):
    df = _boiler_df(spark)
    wide = remove_boilerplate_lines(df, max_doc_frac=0.5, min_docs=2)
    narrow = remove_boilerplate_lines(
        df, max_doc_frac=0.5, min_docs=2, broadcast_cap=0
    )
    a = sorted(tuple(r) for r in wide.collect())
    b = sorted(tuple(r) for r in narrow.collect())
    assert a == b
    # large-state tier restores line order by position
    row = {r["doc_id"]: r for r in narrow.collect()}[5]
    assert row["cleaned"] == "footer\nepsilon"


def test_boilerplate_broadcast_tier_no_corpus_shuffle(spark):
    """The default tier filters docs map-side against broadcast per-group
    frequent arrays — the doc/text side must not hash-shuffle (only the
    distinct-hash frequency agg and the broadcast build move data)."""
    df = _boiler_df(spark)
    plan = plan_of(remove_boilerplate_lines(df, max_doc_frac=0.5))
    assert "BroadcastHashJoin" in plan
    # no sort-merge join (which would shuffle the corpus side)
    assert "SortMergeJoin" not in plan


# ------------------------------------------------- fuzzy_contamination_pairs


def test_fuzzy_decontamination_matches_bruteforce(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base.replace("lazy", "very lazy")
    far = "completely different content with other words entirely here"
    train = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(100, base)], "doc_id long, text string")
    got = {
        (r["id"], r["eval_id"]): r["jaccard"]
        for r in fuzzy_contamination_pairs(
            train, ev, threshold=0.5, num_hashes=32, n_bands=16
        ).collect()
    }
    assert (1, 100) in got and got[(1, 100)] == 1.0
    assert (2, 100) in got and 0.5 <= got[(2, 100)] < 1.0
    assert all(k[0] != 3 for k in got)


def test_fuzzy_decontamination_excludes_same_id(spark):
    df = spark.createDataFrame(
        [(1, "identical text body for this document")], "doc_id long, text string"
    )
    assert fuzzy_contamination_pairs(df, df, threshold=0.5).count() == 0


def test_fuzzy_decontamination_eval_side_broadcast(spark):
    train = spark.range(20).selectExpr(
        "id AS doc_id", "concat('text body number ', id) AS text"
    )
    ev = train.limit(2)
    plan = plan_of(fuzzy_contamination_pairs(train, ev))
    assert "BroadcastHashJoin" in plan


def test_fuzzy_decontamination_oversized_eval_degrades_to_shuffle(spark):
    """Round-6 verdict item 8: the eval side is probed, not trusted — above
    a forced-low broadcast cap the plan must contain NO broadcast of the
    eval sketch (shuffle joins instead of a driver OOM), and the result set
    must be unchanged."""
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base.replace("lazy", "very lazy")
    train = spark.createDataFrame(
        [(1, base), (2, near), (3, "other words entirely unrelated here")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, base)], "doc_id long, text string")
    wide = fuzzy_contamination_pairs(train, ev, threshold=0.5)
    narrow = fuzzy_contamination_pairs(
        train, ev, threshold=0.5, broadcast_cap_bytes=1
    )
    plan = plan_of(narrow)
    assert "BroadcastHashJoin" not in plan and "CartesianProduct" not in plan
    key = lambda df: {
        (r["id"], r["eval_id"], r["jaccard"]) for r in df.collect()
    }
    assert key(wide) == key(narrow) and len(key(wide)) > 0


# ------------------------------------------------------- semantic dedup (C62)


def _vec_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semantic_dup_pairs_cluster_bounded(spark):
    from kafka_connect_jsonata_spark.functions.dedup import semantic_dup_pairs

    # two well-separated clusters; near-dups exist within each, and an
    # ACROSS-cluster pair with cosine 1.0 must NOT be reported
    emb = _vec_df(
        spark,
        [
            (1, [1.0, 0.0, 0.0]),
            (2, [0.99, 0.01, 0.0]),   # dup of 1, same cluster
            (3, [0.0, 1.0, 0.0]),
            (4, [0.0, 0.99, 0.01]),   # dup of 3, same cluster
            (5, [2.0, 0.0, 0.0]),     # cos(5,1)=1 but what matters: same cluster as 1
        ],
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "cluster_id int, centroid array<float>",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["cluster_id"]
        for r in semantic_dup_pairs(emb, cents, threshold=0.95).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 0
    assert (3, 4) in pairs and pairs[(3, 4)] == 1
    assert (1, 5) in pairs  # same cluster, cosine 1.0
    assert not any(a in (1, 2, 5) and b in (3, 4) for a, b in pairs)


def test_semantic_dedup_keeps_lowest_id(spark):
    from kafka_connect_jsonata_spark.functions.dedup import semantic_dedup

    emb = _vec_df(
        spark,
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.001]),
            (3, [0.0, 1.0]),
        ],
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cluster_id int, centroid array<float>"
    )
    kept = sorted(
        r["vec_id"] for r in semantic_dedup(emb, cents, threshold=0.99).collect()
    )
    assert kept == [1, 3]


# ------------------------------------------------------------------ DSIR (C63)


def test_dsir_prefers_target_like_docs(spark):
    from kafka_connect_jsonata_spark.functions.classifier import dsir_select

    rows = [(i, "alpha beta gamma delta", "target") for i in range(4)]
    rows += [(10, "alpha beta gamma delta", "raw")]        # looks like target
    rows += [(11, "zig zag zog zug", "raw")]               # does not
    rows += [(12, "alpha beta unrelated words", "raw")]    # partially
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    top = dsir_select(df, F.col("source") == "target", k=3)
    got = [r["doc_id"] for r in top.collect()]
    assert got[0] == 10 and got[-1] == 11
    w = {r["doc_id"]: r["log_weight"] for r in top.collect()}
    assert w[10] > w[12] > w[11]


def test_dsir_cached_and_features_paths_match_lazy(spark):
    """Round-7: the persisted-stats escape hatches (cache=True / a
    precomputed dsir_features table) must return bit-identical weights to
    the default lazy 3-scan plan — totals from summing the pre-agg counts
    equal the closed-form token-count scan by construction."""
    from kafka_connect_jsonata_spark.functions.classifier import (
        dsir_features,
        dsir_log_weights,
    )

    rows = [(i, "alpha beta gamma delta", "target") for i in range(4)]
    rows += [
        (10, "alpha beta gamma delta", "raw"),
        (11, "zig zag zog zug", "raw"),
        (12, "alpha beta unrelated words", "raw"),
        (13, "", "raw"),  # zero-token doc: no output row in ANY path
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    tgt = F.col("source") == "target"

    def snap(out):
        return {
            r["doc_id"]: (r["n_features"], round(r["log_weight"], 12))
            for r in out.collect()
        }

    lazy = snap(dsir_log_weights(df, tgt))
    cached = snap(dsir_log_weights(df, tgt, cache=True))
    pre = dsir_features(df, tgt)
    passed = snap(dsir_log_weights(df, tgt, features=pre))
    assert lazy == cached == passed
    assert 13 not in lazy  # documented zero-token contract


def test_dsir_feature_space_is_bounded(spark):
    from kafka_connect_jsonata_spark.functions.classifier import (
        HASH_DIM,
        hashed_ngram_features,
    )

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    feats = df.select(
        F.explode(hashed_ngram_features(F.col("text"))).alias("j")
    ).collect()
    # 5 unigrams + 4 bigrams, every bucket inside [0, HASH_DIM)
    assert len(feats) == 9
    assert all(0 <= r["j"] < HASH_DIM for r in feats)


# ------------------------------------------------- corpus stats (C64 / C65)


def test_zipf_fit_recovers_power_law(spark):
    from kafka_connect_jsonata_spark.functions.text import zipf_fit

    # corpus engineered so term t_r appears ~ 1000/r times: slope ~ -1
    words = []
    for r in range(1, 51):
        words += [f"t{r:02d}"] * max(int(1000 / r), 1)
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    row = zipf_fit(df, top_n=50).first()
    assert row["n_terms"] == 50
    assert -1.05 < row["slope"] < -0.95


def test_vocab_coverage_bounds(spark):
    from kafka_connect_jsonata_spark.functions.text import vocab_coverage

    df = spark.createDataFrame(
        [(1, "a a a a b b c d e f")], "doc_id long, text string"
    )
    row = vocab_coverage(df, vocab_size=2).first()
    assert row["total_tokens"] == 10 and row["total_types"] == 6
    # top-2 vocabulary = {a (4), b (2)} -> 6 of 10 tokens covered
    assert row["vocab_tokens"] == 6 and abs(row["coverage"] - 0.6) < 1e-9
    assert row["oov_types"] == 4


# -------------------------------------------------------- curriculum (C66)


def test_curriculum_exact_orders_easy_to_hard(spark):
    from kafka_connect_jsonata_spark.operators.sampling import curriculum_order

    df = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(8)], "doc_id long, score double"
    )
    out = curriculum_order(df, "score", n_stages=4, exact=True).collect()
    by_pos = sorted(out, key=lambda r: r["curriculum_pos"])
    # positions are a 0..n-1 permutation and scores are non-decreasing
    assert [r["curriculum_pos"] for r in by_pos] == list(range(8))
    scores = [r["score"] for r in by_pos]
    assert scores == sorted(scores)
    # stages are contiguous runs 1..4, two rows each
    assert [r["stage"] for r in by_pos] == [1, 1, 2, 2, 3, 3, 4, 4]


def test_curriculum_approx_tier_stage_monotone_permutation(spark):
    from kafka_connect_jsonata_spark.operators.sampling import curriculum_order

    n = 200
    df = spark.createDataFrame(
        [(i, float(i % 17)) for i in range(n)], "doc_id long, score double"
    )
    out = curriculum_order(df, "score", n_stages=4, exact=False, n_buckets=8).collect()
    assert sorted(r["curriculum_pos"] for r in out) == list(range(n))
    # walking positions in order, the stage number never decreases
    stages = [r["stage"] for r in sorted(out, key=lambda r: r["curriculum_pos"])]
    assert stages == sorted(stages)
    # every stage is populated and every row's score respects its stage cut
    assert set(stages) == {1, 2, 3, 4}


def test_curriculum_approx_reproducible_and_seeded(spark):
    from kafka_connect_jsonata_spark.operators.sampling import curriculum_order

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "doc_id long, score double"
    )
    a = {
        r["doc_id"]: r["curriculum_pos"]
        for r in curriculum_order(df, "score", exact=False, seed=1).collect()
    }
    b = {
        r["doc_id"]: r["curriculum_pos"]
        for r in curriculum_order(df, "score", exact=False, seed=1).collect()
    }
    c = {
        r["doc_id"]: r["curriculum_pos"]
        for r in curriculum_order(df, "score", exact=False, seed=2).collect()
    }
    assert a == b
    assert a != c


def test_curriculum_approx_has_no_global_window(spark):
    from kafka_connect_jsonata_spark.operators.sampling import curriculum_order

    df = spark.range(100).selectExpr("id AS doc_id", "CAST(id AS DOUBLE) AS score")
    plan = plan_of(curriculum_order(df, "score", exact=False))
    # every Window in the approx tier is keyed by (stage, hash-bucket)
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "__hb" in line or "stage" in line, line


# ------------------------------------------------- embedding outliers (C67)


def test_embedding_outlier_filter_drops_far_tail(spark):
    from kafka_connect_jsonata_spark.functions.dedup import embedding_outlier_filter

    # cluster 0: four tight vectors + one far outlier; cluster 1: two tight
    emb = _vec_df(
        spark,
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.1]),
            (3, [1.0, -0.1]),
            (4, [0.9, 0.0]),
            (5, [5.0, 5.0]),      # far from both centroids -> top tail of cluster 0
            (6, [0.0, 1.0]),
            (7, [0.0, 0.9]),
        ],
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cluster_id int, centroid array<float>"
    )
    kept = sorted(
        r["vec_id"]
        for r in embedding_outlier_filter(emb, cents, q=0.8, exact=True).collect()
    )
    assert 5 not in kept
    # percent_rank of the farthest row in any >=2-row cluster is 0 < 1-q,
    # so each cluster sheds exactly its far tail: cluster 0 keeps the four
    # tight vectors, cluster 1 (2 rows) keeps its closest
    assert set(kept) == {1, 2, 3, 4, 6}


def test_embedding_outlier_filter_prune_near_drops_prototypes(spark):
    """D4 diversification (prune="near"): the CLOSEST points per cluster
    are dropped, the far spread is kept — the mirror image of the far-tail
    mode on the same data."""
    from kafka_connect_jsonata_spark.functions.dedup import embedding_outlier_filter

    emb = _vec_df(spark, [(i, [float(i), 0.0]) for i in range(10)])
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0])], "cluster_id int, centroid array<float>"
    )
    near = {
        r["vec_id"]
        for r in embedding_outlier_filter(
            emb, cents, q=0.5, prune="near", exact=True
        ).collect()
    }
    far = {
        r["vec_id"]
        for r in embedding_outlier_filter(
            emb, cents, q=0.5, prune="far", exact=True
        ).collect()
    }
    # q=0.5 keeps the top-half of the rank in each mode: near-mode keeps the
    # FARTHEST half, far-mode the closest half — exact complements here
    assert near == set(range(5, 10))
    assert far == set(range(0, 5))


def test_embedding_outlier_filter_prune_near_boundary_ties(spark):
    """Rank-boundary ties: rows with IDENTICAL dist_sq straddling the q cut
    are resolved deterministically by the id tiebreak, and the kept count is
    exactly ceil((1-q)*n) in every engine formulation (percent_rank >= q
    over a unique total order keeps rows with rank-1 >= q*(n-1))."""
    from kafka_connect_jsonata_spark.functions.dedup import embedding_outlier_filter

    # 10 rows, 5 distinct distances, each duplicated -> ties at every rank
    emb = _vec_df(spark, [(i, [float(i // 2), 0.0]) for i in range(10)])
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0])], "cluster_id int, centroid array<float>"
    )
    near = sorted(
        r["vec_id"]
        for r in embedding_outlier_filter(
            emb, cents, q=0.7, prune="near", exact=True
        ).collect()
    )
    # q = fraction KEPT: keep percent_rank >= 0.3 over (dist asc, id asc)
    # -> 0-indexed positions 3..9. The cut lands INSIDE the dist_sq=1.0 tie
    # (ids 2 and 3): id 2 at position 2 drops, id 3 at position 3 survives —
    # the asc-id tiebreak resolves the boundary deterministically.
    assert near == [3, 4, 5, 6, 7, 8, 9]
    far = sorted(
        r["vec_id"]
        for r in embedding_outlier_filter(
            emb, cents, q=0.7, prune="far", exact=True
        ).collect()
    )
    # far mode negates: order is (dist desc, id asc) ->
    # [8,9,6,7,4,5,2,3,0,1]; keep positions 3..9. The dist_sq=9.0 tie
    # (ids 6,7) straddles the cut: id 6 (position 2) drops, id 7 survives.
    assert far == [0, 1, 2, 3, 4, 5, 7]


def test_embedding_outlier_filter_prune_rejects_bad_mode(spark):
    from kafka_connect_jsonata_spark.functions.dedup import embedding_outlier_filter
    import pytest as _pytest

    emb = _vec_df(spark, [(0, [0.0, 0.0])])
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0])], "cluster_id int, centroid array<float>"
    )
    with _pytest.raises(ValueError, match="prune"):
        embedding_outlier_filter(emb, cents, prune="sideways").collect()


def test_embedding_outlier_filter_approx_tier_runs(spark):
    from kafka_connect_jsonata_spark.functions.dedup import embedding_outlier_filter

    emb = _vec_df(spark, [(i, [float(i), 0.0]) for i in range(20)])
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0])], "cluster_id int, centroid array<float>"
    )
    exact = {r["vec_id"] for r in embedding_outlier_filter(emb, cents, q=0.5, exact=True).collect()}
    approx = {r["vec_id"] for r in embedding_outlier_filter(emb, cents, q=0.5, exact=False).collect()}
    # exact tier keeps precisely the closest half; the t-digest tier may
    # include the boundary row itself (>= on an observed threshold value)
    assert exact == set(range(10))
    assert set(range(10)) <= approx <= set(range(11))


def test_semantic_pairs_gemm_columns_parity(spark):
    from kafka_connect_jsonata_spark.functions.dedup import semantic_dup_pairs

    import random

    rng = random.Random(7)
    emb = _vec_df(
        spark,
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)],
    )
    cents = spark.createDataFrame(
        [(0, [1.0] + [0.0] * 7), (1, [0.0, 1.0] + [0.0] * 6)],
        "cluster_id int, centroid array<float>",
    )
    g = {
        (r["id_a"], r["id_b"]): (r["cluster_id"], r["cosine_sim"])
        for r in semantic_dup_pairs(emb, cents, threshold=0.5, strategy="gemm").collect()
    }
    c = {
        (r["id_a"], r["id_b"]): (r["cluster_id"], r["cosine_sim"])
        for r in semantic_dup_pairs(emb, cents, threshold=0.5, strategy="columns").collect()
    }
    assert g.keys() == c.keys() and len(g) > 0
    for k in g:
        assert g[k][0] == c[k][0]
        assert abs(g[k][1] - c[k][1]) < 1e-9


def test_dsir_log_weights_matches_local_reference(spark):
    """Spark dsir_log_weights == an independent pure-Python reference of
    the paper formula on a mixed corpus (exact to 1e-9)."""
    import hashlib
    import math

    from kafka_connect_jsonata_spark.functions.classifier import dsir_log_weights

    rows = [
        (0, "a b a b c", True),
        (1, "a b", True),
        (2, "a b a b c", False),
        (3, "c c d e", False),
        (4, "x y z", False),
        (5, "a", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, t boolean")
    got = {
        r["doc_id"]: (r["n_features"], r["log_weight"])
        for r in dsir_log_weights(df, F.col("t")).collect()
    }

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:3], 16)

    feats = {}
    for i, text, t in rows:
        w = text.split()
        f = [bucket(x) for x in w] + [bucket(a + " " + b) for a, b in zip(w, w[1:])]
        feats[i] = (t, f)
    ct, cr = {}, {}
    for t, f in feats.values():
        for j in f:
            (ct if t else cr)[j] = (ct if t else cr).get(j, 0) + 1
    tt, tr = float(sum(ct.values())), float(sum(cr.values()))
    norm = math.log(tr + 4096.0) - math.log(tt + 4096.0)
    for i, (t, f) in feats.items():
        if t:
            assert i not in got
            continue
        w_ref = sum(
            math.log(ct.get(j, 0) + 1.0) - math.log(cr.get(j, 0) + 1.0) for j in f
        ) + len(f) * norm
        assert got[i][0] == len(f)
        assert abs(got[i][1] - w_ref) < 1e-9


# ------------------------------------------------- C68 unimax_sample


def _unimax_ref(counts, budget, cap):
    """Sequential waterfilling reference (the paper's formulation)."""
    names = sorted(counts, key=lambda g: (counts[g], g))
    alloc, remaining = {}, float(budget)
    for j, g in enumerate(names):
        share = remaining / (len(names) - j)
        a = min(float(counts[g] * cap), share)
        alloc[g] = a
        remaining -= a
    return alloc


def test_unimax_allocation_matches_sequential_waterfilling():
    from math import floor

    from kafka_connect_jsonata_spark.operators.sampling import unimax_allocation

    cases = [
        ({"a": 10, "b": 100, "c": 1000}, 500, 3),
        ({"a": 10, "b": 100, "c": 1000}, 5000, 3),   # all binding
        ({"a": 10, "b": 100, "c": 1000}, 30, 3),     # none binding
        ({"a": 5, "b": 5, "c": 5}, 12, 2),           # uniform sources
        ({"solo": 7}, 100, 4),                       # single source
    ]
    for counts, budget, cap in cases:
        got = unimax_allocation(counts, budget, cap)
        ref = _unimax_ref(counts, budget, cap)
        for g in counts:
            # closed form == sequential waterfilling, integerized by floor
            assert got[g] == floor(ref[g] + 1e-9), (counts, budget, cap, g)
        assert sum(got.values()) <= budget or budget >= sum(
            c * cap for c in counts.values()
        )


def test_unimax_allocation_validation():
    import pytest as _pytest

    from kafka_connect_jsonata_spark.operators.sampling import unimax_allocation

    with _pytest.raises(ValueError):
        unimax_allocation({}, 10, 2)
    with _pytest.raises(ValueError):
        unimax_allocation({"a": 1}, -1, 2)
    with _pytest.raises(ValueError):
        unimax_allocation({"a": 1}, 10, 0)


def test_unimax_sample_epoch_structure(spark):
    import hashlib

    from kafka_connect_jsonata_spark.operators.sampling import (
        unimax_allocation,
        unimax_sample,
    )

    rows = [(i, "small" if i < 6 else "big") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = unimax_sample(df, "doc_id", "src", budget=20, max_epochs=3).collect()
    counts = {"small": 6, "big": 24}
    alloc = unimax_allocation(counts, 20, 3)
    per_src = {}
    for r in out:
        per_src.setdefault(r["src"], []).append((r["doc_id"], r["epoch"]))
    # each source contributes exactly its allocation, as (row, epoch) pairs
    for g in alloc:
        assert len(per_src.get(g, [])) == alloc[g]
    # the partial epoch takes the md5-prefix rows of the source
    for g, n in counts.items():
        full, rem = alloc[g] // n, alloc[g] % n
        ids = [i for i, s in rows if s == g]
        order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        expect = {(i, e) for i in ids for e in range(full)}
        expect |= {(i, full) for i in order[:rem]}
        assert set(per_src.get(g, [])) == expect


def test_unimax_sample_partition_invariant(spark):
    from kafka_connect_jsonata_spark.operators.sampling import unimax_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(60)], "doc_id long, src string"
    )
    a = unimax_sample(df, "doc_id", "src", budget=40, max_epochs=2)
    b = unimax_sample(
        df.repartition(13), "doc_id", "src", budget=40, max_epochs=2, n_buckets=5
    )
    ka = {(r["doc_id"], r["epoch"]) for r in a.collect()}
    kb = {(r["doc_id"], r["epoch"]) for r in b.collect()}
    assert ka == kb and len(ka) > 0


def test_unimax_sample_non_string_group_col(spark):
    """A non-string group column (int source id) must work end-to-end: the
    plan/offset helper frames derive the group type from df.schema instead
    of hardcoding string (which raised on createDataFrame or silently cast
    the join keys)."""
    from kafka_connect_jsonata_spark.operators.sampling import unimax_sample

    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "doc_id long, src int"
    )
    out = unimax_sample(df, "doc_id", "src", budget=20, max_epochs=2)
    rows = out.collect()
    from kafka_connect_jsonata_spark.operators.sampling import unimax_allocation

    alloc = unimax_allocation({0: 10, 1: 10, 2: 10}, 20, 2)
    assert len(rows) == sum(alloc.values()) > 0
    assert dict(out.dtypes)["src"] == "int"
    # parity with the same data under a string group label
    sdf = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(30)], "doc_id long, src string"
    )
    srows = unimax_sample(sdf, "doc_id", "src", budget=20, max_epochs=2).collect()
    assert {(r["doc_id"], r["epoch"]) for r in rows} == {
        (r["doc_id"], r["epoch"]) for r in srows
    }


def test_unimax_sample_no_global_window(spark):
    from kafka_connect_jsonata_spark.operators.sampling import unimax_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 2}") for i in range(20)], "doc_id long, src string"
    )
    plan = plan_of(unimax_sample(df, "doc_id", "src", budget=10, max_epochs=2))
    import re

    # every Window node must partition by at least the source + hash bucket
    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert "__hb" in m.group(1) or "src" in m.group(1)


# -------------------------------------------- C69 normalize_scores


def test_normalize_scores_percent_rank_exact(spark):
    from kafka_connect_jsonata_spark.functions.curation import normalize_scores

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 20.0), (4, "a", 40.0),
         (5, "b", 7.0)],
        "id long, g string, s double",
    )
    out = {
        r["id"]: r["norm_score"]
        for r in normalize_scores(df, "s", "g", exact=True).collect()
    }
    assert out[1] == 0.0
    assert out[2] == out[3] == 1.0 / 3.0  # ties share a rank
    assert out[4] == 1.0
    assert out[5] == 0.0  # singleton group


def test_normalize_scores_minmax_and_degenerate(spark):
    from kafka_connect_jsonata_spark.functions.curation import normalize_scores

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 15.0), (3, "a", 30.0),
         (4, "c", 9.0), (5, "c", 9.0)],
        "id long, g string, s double",
    )
    out = {
        r["id"]: r["norm_score"]
        for r in normalize_scores(df, "s", "g", method="minmax").collect()
    }
    assert out[1] == 0.0 and out[3] == 1.0
    assert out[2] == 0.25
    assert out[4] == out[5] == 0.0  # max == min -> 0


def test_normalize_scores_zscore_numpy_parity(spark):
    import numpy as np

    from kafka_connect_jsonata_spark.functions.curation import normalize_scores

    vals = [3.0, 9.5, 1.25, 7.0, 4.5, 8.0]
    df = spark.createDataFrame(
        [(i, "g", v) for i, v in enumerate(vals)], "id long, g string, s double"
    )
    out = {
        r["id"]: r["norm_score"]
        for r in normalize_scores(df, "s", "g", method="zscore").collect()
    }
    ref = (np.array(vals) - np.mean(vals)) / np.std(vals)
    for i, v in enumerate(ref):
        assert abs(out[i] - v) < 1e-12


def test_normalize_scores_approx_tier_tracks_exact(spark):
    from kafka_connect_jsonata_spark.functions.curation import normalize_scores

    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(200)], "id long, g string, s double"
    )
    exact = {
        r["id"]: r["norm_score"]
        for r in normalize_scores(df, "s", "g", exact=True).collect()
    }
    approx = {
        r["id"]: r["norm_score"]
        for r in normalize_scores(
            df, "s", "g", exact=False, n_bins=100
        ).collect()
    }
    for i in exact:
        assert 0.0 <= approx[i] <= 1.0
        assert abs(approx[i] - exact[i]) <= 0.02 + 1e-9  # within one bin
    # approx tier preserves the ranking (scores are distinct here)
    order_e = sorted(exact, key=lambda i: (exact[i], i))
    order_a = sorted(approx, key=lambda i: (approx[i], i))
    assert order_e == order_a


def test_normalize_scores_approx_tier_has_no_window(spark):
    from kafka_connect_jsonata_spark.functions.curation import normalize_scores

    df = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(50)], "id long, g string, s double"
    )
    plan = plan_of(normalize_scores(df, "s", "g", exact=False))
    assert "Window" not in plan
    assert "BroadcastExchange" in plan


def test_normalize_scores_null_group_kept_all_methods(spark):
    """Rows with a NULL group must survive every method with the null
    group treated as its own group — the window tiers always did this;
    the broadcast-stats tiers now join null-safely instead of silently
    dropping the rows (same df, method-dependent row loss)."""
    from kafka_connect_jsonata_spark.functions.curation import normalize_scores

    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 3.0), (3, None, 2.0), (4, None, 6.0)],
        "id long, g string, x double",
    )
    for method, exact in [
        ("percent_rank", True),
        ("percent_rank", False),
        ("minmax", True),
        ("zscore", True),
    ]:
        out = normalize_scores(
            df, "x", group_col="g", method=method, exact=exact
        )
        rows = {r["id"]: r["norm_score"] for r in out.collect()}
        assert set(rows) == {1, 2, 3, 4}, f"{method} dropped null-group rows"
    # and the null group normalizes within ITSELF: minmax of (2, 6) -> 0, 1
    mm = {
        r["id"]: r["norm_score"]
        for r in normalize_scores(df, "x", group_col="g", method="minmax").collect()
    }
    assert mm[3] == 0.0 and mm[4] == 1.0


def test_normalize_scores_unknown_method(spark):
    import pytest as _pytest

    from kafka_connect_jsonata_spark.functions.curation import normalize_scores

    df = spark.createDataFrame([(1, 1.0)], "id long, s double")
    with _pytest.raises(ValueError):
        normalize_scores(df, "s", method="rank")
