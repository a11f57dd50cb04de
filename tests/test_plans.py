"""Physical-plan regression tests: the scale properties that make these
queries survive a 100 TB / 1000-executor deployment are plan shapes, not
outputs — pin them so a refactor can't silently trade them away.

Checked via the executed-plan string (AQE final or initial): predicate
pushdown into the parquet scan, column pruning, broadcast joins for dims,
whole-stage codegen on the hot path, and no Python eval node in compiled-
tier JSONata plans.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import kafka_connect_jsonata_spark.queries as Q


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = Q.QUERIES["filter_project_events"](spark, sf_dir)
    plan = plan_of(df)
    # event_type/value predicates must land in the scan, not a post-filter
    assert "PushedFilters: [" in plan
    assert "IsNotNull(event_type)" in plan or "EqualTo(event_type" in plan


def test_column_pruning_reaches_scan(spark, sf_dir):
    df = Q.QUERIES["q1_pricing_summary"](spark, sf_dir)
    plan = plan_of(df)
    # lineitem has 16 columns; the Q1 scan must read only the 7 used
    scan = [ln for ln in plan.split("\n") if "FileScan parquet" in ln][0]
    assert "l_comment" not in scan and "l_partkey" not in scan


def test_dim_joins_broadcast(spark, sf_dir):
    for name in ("q3_shipping_priority", "q5_local_supplier"):
        plan = plan_of(Q.QUERIES[name](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, name
        # the fact-fact join may be SMJ/SHJ; no cartesian anywhere
        assert "CartesianProduct" not in plan, name


def test_compiled_jsonata_has_no_python_node(spark, sf_dir):
    plan = plan_of(Q.QUERIES["jsonata_flagship"](spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # whole-stage codegen spans show as "*(n)" operator prefixes
    assert "*(" in plan


def test_interpreter_jsonata_is_arrow_batched(spark, sf_dir):
    plan = plan_of(Q.QUERIES["jsonata_interpreter"](spark, sf_dir))
    # the fallback tier must use the Arrow-batched eval, not row pickling
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_interpreter_input_is_pruned(spark, sf_dir):
    """Column pruning driven by the JSONata AST: only referenced roots are
    serialized into the Arrow transfer."""
    plan = plan_of(Q.QUERIES["jsonata_interpreter"](spark, sf_dir))
    scan = [ln for ln in plan.split("\n") if "FileScan parquet" in ln][0]
    assert "user_id" not in scan and "event_type" not in scan


def test_exact_dedup_partial_aggregates(spark, sf_dir):
    """Exact dedup must be a map-side-combine hash agg (two HashAggregate
    nodes around the exchange), not a global shuffle of raw rows."""
    plan = plan_of(Q.QUERIES["dedup_exact_docs"](spark, sf_dir))
    assert plan.count("HashAggregate") >= 2


def test_asof_join_no_cartesian(spark, sf_dir):
    plan = plan_of(Q.QUERIES["asof_join_events_orders"](spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_asof_join_is_merge_not_join(spark, sf_dir):
    """The as-of join must be the merge-window plan (union + one keyed
    window), never a join-then-aggregate over the per-key match set — the
    latter materializes O(n_left * n_right) pairs on a hot key (round-4
    verdict). No join node of any kind, exactly one Window, and exactly one
    hash exchange (on the key) may appear."""
    import re

    plan = plan_of(Q.QUERIES["asof_join_events_orders"](spark, sf_dir))
    for node in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan, node
    assert plan.count("Window") == 1
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_asof_join_hot_key_is_linear(spark):
    """Sub-quadratic on a hot key: one key holding n left x n right rows
    must produce exactly n output rows without materializing n^2 pairs —
    with n=2000 the old join-then-max shape builds 4M intermediate pairs;
    the merge handles it as a 4000-row sorted scan. Also checks values on
    a two-key corpus with before/at/after timestamps."""
    import time

    from kafka_connect_jsonata_spark.operators import relational as R

    n = 2000
    left = spark.range(n).select(
        F.lit(1).alias("k"), (F.col("id") * 2 + 1).alias("lts"), F.col("id").alias("lid")
    )
    right = spark.range(n).select(
        F.lit(1).alias("k"), (F.col("id") * 2).alias("rts")
    )
    t0 = time.monotonic()
    out = R.asof_join(left, right, "k", "k", "lts", "rts", "lid")
    rows = out.collect()
    assert time.monotonic() - t0 < 30  # n^2 pair blowup would take minutes
    assert len(rows) == n
    # left ts = 2i+1, right ts even: as-of match is exactly 2i
    assert all(r["asof_rts"] == r["lts"] - 1 for r in rows)

    # exactness: ties (right_ts == left_ts) match inclusively; keys are
    # disjoint; a left row earlier than every right row gets null
    lv = spark.createDataFrame(
        [("a", 10, 1), ("a", 5, 2), ("a", 1, 3), ("b", 10, 4)],
        "k string, lts long, lid int",
    )
    rv = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 20), (None, 1)], "k string, rts long"
    )
    got = {r["lid"]: r["asof_rts"] for r in R.asof_join(lv, rv, "k", "k", "lts", "rts").collect()}
    assert got == {1: 7, 2: 5, 3: None, 4: None}


def test_vocab_joins_degrade_to_shuffle_join_above_cap(spark, sf_dir):
    """The term-vocabulary sides of tfidf/unigram are UNBOUNDED (Heaps'
    law) and must never be force-broadcast: with the broadcast threshold
    disabled (stand-in for a vocab that outgrew the cap) the vocab join
    must plan as a shuffle join keyed on term — no BroadcastHashJoin
    anywhere (the surviving broadcasts are the deliberate one-row
    count/total cross joins, which plan as hinted BNLJ)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name in ("tfidf_top_terms", "unigram_logprob_docs", "unigram_floor_docs"):
            plan = plan_of(Q.QUERIES[name](spark, sf_dir))
            assert "BroadcastHashJoin" not in plan, name
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, name
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_tpch_no_forced_broadcast_on_sf_proportional_sides(spark, sf_dir):
    """Round-8 scale fix: the TPC-H gates must not carry broadcast HINTS
    on sf-proportional sides (customer, supplier, q18's qualifying-order
    aggregate — all grow linearly with the fact; a hardcoded hint
    overrides AQE and turns into an executor OOM at the 100-TB point).
    With the broadcast threshold disabled (stand-in for the dims
    outgrowing memory) the ONLY surviving BroadcastHashJoins are the
    deliberately-hinted constant-size dims (nation: 25 rows, region: 5
    rows at every sf)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        expected_hinted = {
            "q3_shipping_priority": 0,
            "q10_returned_items": 1,  # nation
            "q18_large_volume_customer": 0,
            "q5_local_supplier": 2,  # nation + region
            # round-9 correlated-subquery tail: decorrelated aggregates
            # (q17's per-part threshold, q21's per-order supplier sets)
            # must not be force-broadcast; q21 keeps only nation's hint
            "q17_small_quantity_revenue": 0,
            "q21_suppliers_kept_waiting": 1,  # nation (left_semi)
            # nation + region, instantiated ONCE (round 13): the per-part
            # MIN is a window over the part-joined rows now, so the
            # European supplier subtree is no longer built twice
            "q2_minimum_cost_supplier": 2,
            "q20_potential_promotion_suppliers": 1,  # nation
            # round-9 TPC-H completion: nation slices keep their hints
            # (constant 25 rows), supplier/customer/part and the one-row
            # scalar aggregates (q11 threshold, q15 max — hintless cross
            # joins that AQE plans as BNLJ) are left to the optimizer
            # q8 counts region->nation inside the customer-nation slice
            # derivation plus the two nation joins; q11's surviving
            # non-BHJ is the hinted one-row-scalar BNLJ (q22's rule),
            # q15's scalar equality becomes a plain equi-join
            "q7_volume_shipping": 2,  # the two nation slices
            "q8_market_share": 3,
            "q9_product_type_profit": 1,  # nation
            # nation left_semi instantiated twice — the per-part and the
            # grand-total branches each rescan the supplier slice
            "q11_important_stock": 2,
            "q13_customer_distribution": 0,
            "q15_top_supplier": 0,
            "q16_parts_supplier_relationship": 0,
        }
        for name, n_hinted in expected_hinted.items():
            plan = plan_of(Q.QUERIES[name](spark, sf_dir))
            assert plan.count("BroadcastHashJoin") == n_hinted, (name, plan)
            assert "CartesianProduct" not in plan, name
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_tpch_recovers_broadcast_below_cap_at_runtime(spark, sf_dir):
    """Dropping the static hints must not cost the small-dim fast path:
    at gate scale AQE/stats still broadcast customer in q10."""
    df = Q.QUERIES["q10_returned_items"](spark, sf_dir)
    df.collect()
    final = plan_of(df)  # AQE final plan after execution
    assert final.count("BroadcastHashJoin") >= 2  # customer + nation


def test_vocab_joins_broadcast_below_cap_at_runtime(spark, sf_dir):
    """Below the cap AQE must recover the broadcast from the vocab side's
    measured runtime size — the small-corpus fast path is not lost by
    dropping the static hint."""
    df = Q.QUERIES["tfidf_top_terms"](spark, sf_dir)
    df.collect()
    final = plan_of(df)  # AQE final plan after execution
    assert "BroadcastHashJoin" in final


def test_unigram_floor_bounds_vocab(spark):
    """min_term_count must (a) drop sub-floor terms from the joined vocab,
    (b) score their tokens with the default logprob, (c) keep the full
    token count as the denominator."""
    import math

    from kafka_connect_jsonata_spark.functions import curation

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a b c")], "doc_id long, text string"
    )
    # counts: a=4, b=2, c=1; total=7. floor=2 -> c drops, default_count=1
    out = {
        r["doc_id"]: r
        for r in curation.unigram_logprob_score(docs, min_term_count=2).collect()
    }
    t = 7.0
    exp1 = (3 * (math.log(t) - math.log(4)) + (math.log(t) - math.log(2))) / 4
    exp2 = (
        (math.log(t) - math.log(4))
        + (math.log(t) - math.log(2))
        + (math.log(t) - math.log(1))  # floored term c -> default count 1
    ) / 3
    assert out[1]["n_words"] == 4 and abs(out[1]["avg_neg_logp"] - exp1) < 1e-6
    assert out[2]["n_words"] == 3 and abs(out[2]["avg_neg_logp"] - exp2) < 1e-6


def test_lsh_join_is_equi_not_cross(spark, sf_dir):
    """The LSH candidate step must hash-join on (band, bucket) — the whole
    point is avoiding the quadratic cross join."""
    plan = plan_of(Q.QUERIES["ann_lsh_topk"](spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_knn_graph_lsh_candidate_dedup_carries_ids_only(spark):
    """Round-6 verdict item 5: knn_graph's LSH tier must dedup candidate
    pairs on (query_id, neighbor_id) ONLY — at d=1024 shuffling both full
    vectors through the dedup exchange is ~16 KB per candidate pair.
    Vectors re-attach by id-keyed joins after the dedup."""
    from kafka_connect_jsonata_spark.functions.similarity import knn_graph

    emb = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: F.rand(7) + i.cast("double") * F.col("id").cast("double"),
        ).alias("embedding"),
    )
    df = knn_graph(emb, k=3, strategy="lsh")
    plan = plan_of(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    # every Exchange feeding the HashAggregate dedup must be keyed by the
    # id pair and must NOT carry an embedding payload column
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        keys = m.group(1)
        if "query_id" in keys and "neighbor_id" in keys:
            assert "__v" not in keys and "__nv" not in keys
    # the aggregate-based dropDuplicates group must not include vectors
    for line in plan.splitlines():
        if "HashAggregate" in line and "query_id" in line and "neighbor_id" in line:
            assert "__v" not in line and "__nv" not in line, line


def test_salted_join_matches_plain_join(spark):
    """Salted skew join returns exactly the plain join's multiset of rows
    (every row pairs at exactly one salt value), spread over n_salts keys."""
    from kafka_connect_jsonata_spark.operators.relational import salted_join

    left = spark.range(10_000).select(
        # 90% of rows share key 0 — the hot-key shape AQE won't split
        F.when(F.col("id") % 10 == 0, F.col("id")).otherwise(F.lit(0)).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(1_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("rv"))

    got = salted_join(left, right, ["k"], n_salts=8)
    exp = left.join(right, ["k"])
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0

    got_left = salted_join(left, right, ["k"], n_salts=8, how="left")
    exp_left = left.join(right, ["k"], "left")
    assert got_left.count() == exp_left.count()
    assert got_left.exceptAll(exp_left).count() == 0


def test_skew_split_join_matches_plain_join_all_types(spark):
    """Hot-key split + union must be invisible for EVERY join type —
    inner/left/right/full/semi/anti — on a corpus with a hot key on both
    sides (two-large-sides skew), keys private to each side, and null
    keys (which must ride the cold path and null-extend normally)."""
    from kafka_connect_jsonata_spark.operators.relational import skew_split_join

    left = spark.range(5_000).select(
        F.when(F.col("id") % 10 == 0, F.col("id") % 97)
        .when(F.col("id") % 13 == 0, F.lit(None))
        .otherwise(F.lit(0))
        .alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(2_000).select(
        F.when(F.col("id") % 5 == 0, F.col("id") % 139)
        .when(F.col("id") % 17 == 0, F.lit(None))
        .otherwise(F.lit(0))
        .alias("k"),
        (F.col("id") * 3).alias("rv"),
    )
    for how in ("inner", "left", "right", "full", "semi", "anti"):
        got = skew_split_join(left, right, ["k"], how=how, hot_keys=[(0,)], n_salts=4)
        exp = left.join(right, ["k"], how)
        assert got.count() == exp.count(), how
        assert got.exceptAll(exp).count() == 0, how
        assert exp.exceptAll(got).count() == 0, how


def test_skew_split_join_auto_detects_hot_key(spark):
    """Sampled hot-key detection must find the dominant key and still
    return the exact join result."""
    from kafka_connect_jsonata_spark.operators.relational import skew_split_join

    left = spark.range(50_000).select(
        F.when(F.col("id") % 20 == 0, F.col("id")).otherwise(F.lit(7)).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(500).select(F.col("id").alias("k"), F.col("id").alias("rv"))
    got = skew_split_join(left, right, ["k"], how="full")
    exp = left.join(right, ["k"], "full")
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0


def test_skew_split_right_join_plan_shape(spark, sf_dir):
    """The gate query's plan must show the split: a union of the cold
    right join and the salted hot path, with the unmatched-right recovery
    as a broadcast anti join — and no cartesian anywhere."""
    plan = plan_of(Q.QUERIES["skew_split_right_join"](spark, sf_dir))
    assert "Union" in plan
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan or "left_anti" in plan.lower()


def test_exact_similarity_join_plan_shape(spark, sf_dir):
    """The prefix-filtered set-similarity join must never plan a cartesian
    product — candidates come from an equi-join on the gram hash."""
    import __spark_entry__ as m

    df = m.queries()["ngram_jaccard_dups"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_join_plan_broadcasts_salt_sequence(spark):
    """salted_join's replication side must be a broadcast (the salt
    sequence is tiny); the salted keys appear in the join."""
    from kafka_connect_jsonata_spark.operators.relational import salted_join

    left = spark.range(1000).select(F.col("id").alias("k"), F.col("id").alias("lv"))
    right = spark.range(100).select(F.col("id").alias("k"), F.col("id").alias("rv"))
    out = salted_join(left, right, ["k"], n_salts=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan  # salt sequence rides a broadcast
    assert "__salt" in plan  # join key includes the salt


def test_jsonata_sift_merge_drives_column_pruning(spark, sf_dir):
    """A compiled $sift+$merge JSONata expression must prune the parquet
    scan to exactly the referenced columns — the end-to-end payoff of
    compiling the language to Catalyst projections."""
    import re

    import __spark_entry__ as m

    df = m.queries()["jsonata_object_ops"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    rs = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert rs is not None
    read_cols = {c.split(":")[0] for c in rs.group(1).split(",")}
    assert read_cols == {"c_custkey", "c_name", "c_acctbal", "c_mktsegment"}


def test_interpreter_repartition_is_conditional(spark, sf_dir, tmp_path):
    """Round-1 verdict #6: the interpreter-tier spread repartition must not
    full-shuffle an input whose scan is already wide (>= parallelism files);
    narrow single-file scans keep the spread."""
    from pyspark.sql import types as T

    from kafka_connect_jsonata_spark.transform import transform

    par = spark.sparkContext.defaultParallelism
    wide_dir = str(tmp_path / "wide")
    spark.range(10000).selectExpr("id", "cast(id as string) AS txt").repartition(
        par * 2
    ).write.parquet(wide_dir)
    out_schema = T.StructType([T.StructField("n", T.LongType())])

    wide = transform(
        spark.read.parquet(wide_dir),
        # bare ** as a VALUE is NotCompilable -> interpreter tier
        # (plain $count(**) COMPILES as of round 11 — static cardinality)
        "{'n': $count([**])}",
        output_schema=out_schema,
    )
    assert "Exchange RoundRobinPartitioning" not in plan_of(wide)
    assert wide.count() == 10000

    narrow_dir = str(tmp_path / "narrow")
    spark.range(100).selectExpr("id", "cast(id as string) AS txt").coalesce(
        1
    ).write.parquet(narrow_dir)
    narrow = transform(
        spark.read.parquet(narrow_dir), "{'n': $count([**])}", output_schema=out_schema
    )
    assert "Exchange RoundRobinPartitioning" in plan_of(narrow)

    # conf escape hatch
    spark.conf.set("spark.jsonataspark.interpreter.repartition", "never")
    try:
        forced = transform(
            spark.read.parquet(narrow_dir), "{'n': $count([**])}", output_schema=out_schema
        )
        assert "Exchange RoundRobinPartitioning" not in plan_of(forced)
    finally:
        spark.conf.unset("spark.jsonataspark.interpreter.repartition")


def test_bm25_has_no_per_token_shuffle(spark, sf_dir):
    """BM25's tf/dl are map-side token-array math; the only exchanges are
    the one-row corpus-stats reduce (broadcast back) and the distributed
    top-k. No hash shuffle of exploded tokens, no Python."""
    df = Q.QUERIES["bm25_search"](spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastExchange" in plan  # corpus stats ride a broadcast
    assert "TakeOrderedAndProject" in plan  # distributed top-k, not a global sort
    assert "Generate explode" not in plan  # no per-token row blowup
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_embedding_quantize_is_pure_map(spark, sf_dir):
    """Normalize+quantize is a shuffle-free single-pass projection."""
    df = Q.QUERIES["embedding_quantize_stats"](spark, sf_dir)
    plan = plan_of(df)
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_stratified_sample_shuffles_by_stratum_only(spark, sf_dir):
    """One hash exchange keyed by the stratum column; no global
    single-partition exchange."""
    df = Q.QUERIES["stratified_sample_docs"](spark, sf_dir)
    plan = plan_of(df)
    assert "hashpartitioning(lang" in plan
    assert "SinglePartition" not in plan


def test_topk_partial_runs_below_the_exchange(spark, sf_dir):
    """l_returnflag has 3 values: the window's exchange must see only the
    map-side survivor set (partitions x groups x k rows), i.e. the
    MapInArrow partial top-k sits BELOW the exchange in the plan."""
    df = Q.QUERIES["topk_per_group"](spark, sf_dir)
    plan = plan_of(df)
    assert "MapInArrow" in plan
    ex, mp = plan.index("Exchange"), plan.index("MapInArrow")
    assert ex < mp  # printed top-down: partial feeds the exchange, not after it


def test_topk_partial_matches_window_plan(spark):
    """Partial and plain window paths must return identical rows+ranks —
    including NULL ordering (Spark: NULLS FIRST under asc, LAST under
    desc), in both directions, with nulls outnumbering k in some groups."""
    from kafka_connect_jsonata_spark.operators.relational import top_k_per_group

    rows = [
        (i % 4, i, None if i % 7 == 0 else float((i * 37) % 100)) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g int, id int, v double").repartition(11)
    for desc in (True, False):
        order = [(F.col("v").desc() if desc else F.col("v").asc()), F.col("id").asc()]
        plain = top_k_per_group(df, ["g"], order, 5)
        part = top_k_per_group(
            df, ["g"], None, 5, order_spec=[("v", desc), ("id", False)]
        )
        a = sorted((r["g"], r["id"], r["v"], r["rn"]) for r in plain.collect())
        b = sorted((r["g"], r["id"], r["v"], r["rn"]) for r in part.collect())
        assert a == b, f"desc={desc}"


def test_topk_partial_handles_nan_order_column(spark):
    """Float NaN orders as the LARGEST value in Spark's window while NULL
    orders first-under-asc — and the two are indistinguishable after the
    Arrow transfer. The partial path must therefore never prune NA rows
    map-side (round-4 advice); with NaN, NULL, and data mixed in a
    descending float order, partial and window paths must agree exactly."""
    df = (
        spark.range(300)
        .select(
            (F.col("id") % 3).alias("g"),
            F.col("id").cast("int").alias("id"),
            F.when(F.col("id") % 11 == 0, F.lit(float("nan")))
            .when(F.col("id") % 7 == 0, F.lit(None).cast("double"))
            .otherwise((F.col("id") * 13 % 100).cast("double"))
            .alias("v"),
        )
        .repartition(7)
    )
    from kafka_connect_jsonata_spark.operators.relational import top_k_per_group

    for desc in (True, False):
        order = [(F.col("v").desc() if desc else F.col("v").asc()), F.col("id").asc()]
        plain = top_k_per_group(df, ["g"], order, 4)
        part = top_k_per_group(df, ["g"], None, 4, order_spec=[("v", desc), ("id", False)])
        key = lambda r: (r["g"], r["id"], str(r["v"]), r["rn"])  # noqa: E731
        assert sorted(map(key, plain.collect())) == sorted(map(key, part.collect())), desc


def test_pack_token_budget_rejects_duplicate_ids(spark):
    """Duplicate ids break the packing order contract; the per-bucket
    count-vs-distinct check (free — it rides the totals aggregation) must
    raise instead of silently merging RANGE-frame peers."""
    from kafka_connect_jsonata_spark.operators.packing import pack_token_budget

    df = spark.createDataFrame(
        [(1, "a b"), (2, "c"), (2, "d e f"), (3, "g")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="unique"):
        pack_token_budget(df, budget=4)


def test_pack_token_budget_never_global_windows(spark, sf_dir):
    """The global running sum must be the two-phase prefix sum: prefix
    offsets ride a broadcast join, the corpus shuffles once keyed by
    bucket — NEVER a single-partition global window (the naive
    Window.orderBy(id) formulation)."""
    df = Q.QUERIES["pack_token_budget_docs"](spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastExchange" in plan  # prefix-offset table
    assert "SinglePartition" not in plan  # the scale trap this op exists to avoid
    assert "hashpartitioning(__b" in plan  # one keyed shuffle by bucket


def test_mixture_sample_is_map_side_filter(spark, sf_dir):
    df = Q.QUERIES["mixture_sample_docs"](spark, sf_dir)
    plan = plan_of(df)
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_transform_safe_evaluates_exactly_once(spark, sf_dir):
    """The DLQ split filters on the UDF's status output — deterministic
    pandas UDFs get CLONED below the filter by Catalyst pushdown (two
    ArrowEvalPython nodes = every record evaluated twice, and error rows
    double-produced). The nondeterministic marker must pin one node."""
    from kafka_connect_jsonata_spark.transform import dead_letters, transform_safe

    docs = Q.load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = transform_safe(
        docs, 'n_chars <= 260 ? {"id": doc_id} : $error("oversize document")'
    )
    for df in (out, dead_letters(out)):
        plan = plan_of(df)
        assert plan.count("ArrowEvalPython") == 1
        assert "BatchEvalPython" not in plan


def test_interval_join_is_equi_not_bnlj(spark, sf_dir):
    """The bucketized range join must plan as a hash equi-join on the
    bucket id — no BroadcastNestedLoopJoin, no CartesianProduct — while
    returning exactly the theta join's rows."""
    df = Q.QUERIES["interval_join_parts"](spark, sf_dir)
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    theta = Q.QUERIES["range_join_parts"](spark, sf_dir)
    a = sorted(map(str, df.collect()))
    b = sorted(map(str, theta.collect()))
    assert a == b and len(a) > 0


def test_interval_join_edge_semantics(spark):
    """Boundary inclusivity, negative values, bucket-edge intervals, and
    inverted intervals (which must produce nothing, not wrong buckets)."""
    from kafka_connect_jsonata_spark.operators.relational import interval_join

    pts = spark.createDataFrame(
        [(1, -10.0), (2, 0.0), (3, 5.0), (4, 10.0), (5, 99.5)], "pid int, p double"
    )
    ivs = spark.createDataFrame(
        [(10, -12.0, -9.0), (20, 0.0, 10.0), (30, 10.0, 10.0), (40, 50.0, 40.0),
         (50, 99.0, 100.0)],
        "iid int, lo double, hi double",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(pts, ivs, "p", "lo", "hi", bucket_width=7.0).collect()
    }
    # lo <= p < hi; iid=30 zero-width and iid=40 inverted match nothing
    assert got == {(1, 10), (2, 20), (3, 20), (5, 50)}
    got_incl = {
        (r["pid"], r["iid"])
        for r in interval_join(
            pts, ivs, "p", "lo", "hi", bucket_width=7.0, hi_inclusive=True
        ).collect()
    }
    assert got_incl == {(1, 10), (2, 20), (3, 20), (4, 20), (4, 30), (5, 50)}


def test_asof_join_forward_and_tolerance(spark):
    """direction='forward' picks the smallest right_ts >= left_ts
    (inclusive); tolerance nulls matches beyond the bound in BOTH
    directions; the plan stays join-free."""
    from kafka_connect_jsonata_spark.operators.relational import asof_join

    lv = spark.createDataFrame(
        [("a", 10, 1), ("a", 5, 2), ("a", 30, 3), ("b", 1, 4)],
        "k string, lts long, lid int",
    )
    rv = spark.createDataFrame(
        [("a", 5), ("a", 12), ("a", 20), ("b", 0)], "k string, rts long"
    )
    fwd = {r["lid"]: r["asof_rts"]
           for r in asof_join(lv, rv, "k", "k", "lts", "rts", direction="forward").collect()}
    assert fwd == {1: 12, 2: 5, 3: None, 4: None}
    back_tol = {r["lid"]: r["asof_rts"]
                for r in asof_join(lv, rv, "k", "k", "lts", "rts", tolerance=3).collect()}
    # backward matches: 1->5 (gap 5 > 3 -> null), 2->5 (gap 0), 3->20 (gap 10 -> null), 4->0 (gap 1)
    assert back_tol == {1: None, 2: 5, 3: None, 4: 0}
    fwd_tol = {r["lid"]: r["asof_rts"]
               for r in asof_join(lv, rv, "k", "k", "lts", "rts",
                                  direction="forward", tolerance=2).collect()}
    assert fwd_tol == {1: 12, 2: 5, 3: None, 4: None}
    plan = plan_of(asof_join(lv, rv, "k", "k", "lts", "rts", direction="forward"))
    for node in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert node not in plan, node


def test_skew_split_join_detects_right_side_hot_key(spark):
    """Auto-detection must find a key that is hot only on the RIGHT side
    (two-large-sides coverage) and keep the join exact."""
    from kafka_connect_jsonata_spark.operators.relational import skew_split_join

    left = spark.range(3000).select((F.col("id") % 500).alias("k"), F.col("id").alias("lv"))
    right = spark.range(30000).select(
        F.when(F.col("id") % 10 == 0, F.col("id") % 400).otherwise(F.lit(13)).alias("k"),
        F.col("id").alias("rv"),
    )
    got = skew_split_join(left, right, ["k"], how="inner")
    exp = left.join(right, ["k"])
    assert got.count() == exp.count()
    assert got.exceptAll(exp).count() == 0


def test_interval_join_with_extra_equi_keys(spark):
    """extra_keys composes the bucket id with equi-join columns: matches
    must satisfy BOTH the key equality and the range."""
    from kafka_connect_jsonata_spark.operators.relational import interval_join

    pts = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 5.0), (3, "a", 25.0)], "pid int, g string, p double"
    )
    ivs = spark.createDataFrame(
        [(10, "a", 0.0, 10.0), (20, "b", 0.0, 10.0), (30, "a", 20.0, 30.0)],
        "iid int, g string, lo double, hi double",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            pts, ivs, "p", "lo", "hi", bucket_width=8.0, extra_keys=["g"]
        ).collect()
    }
    assert got == {(1, 10), (2, 20), (3, 30)}


def test_deterministic_shuffle_never_global_windows(spark, sf_dir):
    """The epoch-shuffle rank must run its window hash-partitioned by the
    bucket column — a SinglePartition window funnels the corpus through
    one task. (The one-row bucket-count collect is bounded driver state.)"""
    df = Q.QUERIES["shuffle_positions_docs"](spark, sf_dir)
    plan = plan_of(df)
    window_lines = [ln for ln in plan.split("\n") if "Window" in ln]
    assert window_lines and all("__b" in ln for ln in window_lines)
    assert "hashpartitioning(__b" in plan


def test_deterministic_shuffle_is_permutation_and_reproducible(spark):
    from kafka_connect_jsonata_spark.operators.sampling import deterministic_shuffle

    df = spark.range(1000).select(F.col("id").alias("doc_id"))
    a = deterministic_shuffle(df, "doc_id", seed=1, n_buckets=7)
    rows = {r["doc_id"]: r["shuffle_pos"] for r in a.collect()}
    assert sorted(rows.values()) == list(range(1000))  # exact permutation
    # same seed reproduces regardless of bucketing; different seed differs
    b = {r["doc_id"]: r["shuffle_pos"]
         for r in deterministic_shuffle(df, "doc_id", seed=1, n_buckets=31).collect()}
    assert b == rows
    c = {r["doc_id"]: r["shuffle_pos"]
         for r in deterministic_shuffle(df, "doc_id", seed=2, n_buckets=7).collect()}
    assert c != rows and sorted(c.values()) == list(range(1000))


def test_round5_zero_shuffle_operators_have_no_exchange(spark, sf_dir):
    """C45 scoring, C46 Gopher, C51 normalization, C52 compression, and
    C54 chunking are contractually zero-shuffle — pin the absence of any
    Exchange in their physical plans."""
    from kafka_connect_jsonata_spark.functions import classifier, curation
    from kafka_connect_jsonata_spark.functions import text as TXT
    from kafka_connect_jsonata_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    for name, df in {
        "classifier": classifier.score_documents(docs),
        "gopher": curation.gopher_quality(docs),
        "normalize": TXT.normalize_text(docs),
        "compression": curation.compression_ratio(docs),
        "chunk_overlap": TXT.chunk_with_overlap(docs, 20, 10),
    }.items():
        plan = plan_of(df)
        assert "Exchange" not in plan, f"{name} plan gained a shuffle:\n{plan}"


def test_bloom_probe_is_mapside_before_verify_join(spark, sf_dir):
    """C43: the Bloom prefilter must evaluate below (before) the verify
    join's exchange — the probe's ArrowEvalPython appears under the join,
    and exactly once (no pushdown duplication)."""
    import pyspark.sql.functions as F

    from kafka_connect_jsonata_spark.functions import filtering
    from kafka_connect_jsonata_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    out = filtering.bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    plan = plan_of(out)
    assert plan.count("ArrowEvalPython") == 1
    assert "LeftSemi" in plan


def test_quantile_filter_approx_tier_broadcasts_thresholds(spark, sf_dir):
    """C47 scale tier: the per-group threshold table must broadcast (it is
    bounded by the number of groups), leaving the corpus side unshuffled."""
    from kafka_connect_jsonata_spark.functions import curation
    from kafka_connect_jsonata_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = curation.quantile_filter(
        docs, "n_chars", 0.5, group_col="source", exact=False
    )
    plan = plan_of(out)
    assert "BroadcastHashJoin" in plan


def test_quantile_filter_auto_tier_routes_by_group_size(spark, sf_dir):
    """C47 auto tier (round-6): above a forced-low cap the default must
    take the approx threshold path (no per-group window sort); below it,
    the exact percent_rank window. A defaults-taking 100 TB caller can no
    longer land on a single-task global sort."""
    from kafka_connect_jsonata_spark.functions import curation
    from kafka_connect_jsonata_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    # forced-low cap -> approx: threshold broadcast join, no rank window
    big = curation.quantile_filter(docs, "n_chars", 0.5, group_col="source", exact_cap=1)
    plan = plan_of(big)
    assert "percent_rank" not in plan and "BroadcastHashJoin" in plan
    # worst case: group_col=None under a low cap must NOT be a global sort
    glob = curation.quantile_filter(docs, "n_chars", 0.5, exact_cap=1)
    gplan = plan_of(glob)
    assert "percent_rank" not in gplan
    # generous cap -> exact window, identical to the SQL-gated tier
    small = curation.quantile_filter(
        docs, "n_chars", 0.5, group_col="source", tiebreak_col="doc_id"
    )
    assert "percent_rank" in plan_of(small)


def test_pipeline_scores_each_document_exactly_once(spark, sf_dir):
    """C49: the composed pipeline filters on the classifier margin; the
    margin udf must not be cloned below the exchange by that filter."""
    import kafka_connect_jsonata_spark.queries as Q

    df = Q.QUERIES["curation_pipeline_docs"](spark, sf_dir)
    plan = plan_of(df)
    assert plan.count("ArrowEvalPython") + plan.count("MapInPandas") == 1


def test_unpruned_partitioned_scan_detector(spark, tmp_path):
    """Round-10 plan-audit telemetry (verdict item 8): the C85 class of
    finding — a hive-partitioned table scanned with NO partition filters —
    must be caught mechanically. Pin the detector on all three shapes:
    partitioned+unfiltered (flag), partitioned+pruned (clean),
    unpartitioned (clean)."""
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from tools.plan_audit import _unpruned_partitioned_scans

    p = str(tmp_path / "t")
    spark.range(100).withColumn(
        "__p", F.pmod(F.col("id"), F.lit(4))
    ).write.partitionBy("__p").parquet(p)
    full = spark.read.parquet(p).filter(F.col("id") > 5)
    pruned = spark.read.parquet(p).filter(F.col("__p") == 1)
    u = str(tmp_path / "u")
    spark.range(10).write.parquet(u)
    unpart = spark.read.parquet(u)
    assert _unpruned_partitioned_scans(full) == 1
    assert _unpruned_partitioned_scans(pruned) == 0
    assert _unpruned_partitioned_scans(unpart) == 0
