"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with a count() action (no driver-side collect of
payload rows). A warmup touches each table so JVM/class-load and parquet
footer reads don't pollute the first measurement; each query then runs
twice and reports the faster run (steady state — first runs can pay
multi-second one-time JVM JIT / codegen compilation that a long-running
cluster job amortizes to zero; BASELINE.md's DuckDB comparison uses the
same best-of-N convention).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_connect_jsonata_spark import queries as Q
from kafka_connect_jsonata_spark.engine import get_spark
from kafka_connect_jsonata_spark.sources.readers import TABLES, load_table

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "json_props_extract",
    "topk_per_group",
    "window_running_total",
    "window_rank_suite",
    "rollup_lineitem",
    "grouping_sets_orders",
    "asof_join_events_orders",
    "skew_salted_join",
    "outer_join_nation_parties",
    "left_join_order_gaps",
    "union_party_balances",
    "explode_term_freq",
    "text_doc_stats",
    "token_count_summary",
    "dedup_exact_docs",
    "hash_sample_docs",
    "hash_split_counts",
    "stratified_sample_docs",
    "safe_transform_dlq",
    "bm25_search",
    "embedding_quantize_stats",
    "cosine_topk_bruteforce",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ngram_jaccard_dups",
    "minhash_lsh_dups",
    "simhash_docs",
    "embedding_dup_pairs",
    "tumbling_window_agg",
    "sliding_window_agg",
    "sessionize_events",
    "percentile_summary",
    "multimodal_byte_stats",
    "multimodal_frame_sample",
    "jsonata_flagship",
    "jsonata_datetime_array_ops",
    "jsonata_picture_format",
    "jsonata_object_ops",
    "udtf_explode_tokens",
    "jsonata_interpreter",
    "envelope_reroute",
    "decontaminate_docs",
    "pii_redact_docs",
    "repetition_quality",
    "tfidf_top_terms",
    "kmeans_assign",
    "embedding_covariance_stats",
    "chunk_dedup_docs",
    "unigram_logprob_docs",
    "heavy_hitter_terms",
    "pca_project_fixed",
    "mixture_sample_docs",
    "pack_token_budget_docs",
    # round 5 additions
    "unigram_floor_docs",
    "skew_split_right_join",
    "interval_join_parts",
    "asof_forward_events_orders",
    "shuffle_positions_docs",
    "bloom_semi_join_lineitem",
    "dup_span_removal_docs",
    "quality_classifier_docs",
    "gopher_quality_docs",
    "quantile_filter_docs",
    "temperature_mix_docs",
    "curation_pipeline_docs",
    "normalize_docs",
    "compression_ratio_docs",
    "bpe_encode_docs",
    "bigram_logprob_docs",
    "chunk_overlap_docs",
    "q6_forecast_revenue",
    "dup_ngram_coverage_docs",
    "weighted_sample_docs",
    # round 6 additions
    "clean_lines_docs",
    "inverted_index_terms",
    "boilerplate_removal_docs",
    "fuzzy_decontaminate_docs",
    "semantic_dedup_pairs",
    "dsir_select_docs",
    "zipf_fit_docs",
    "vocab_coverage_docs",
    "curriculum_order_docs",
    "embedding_outlier_docs",
    "unimax_mix_docs",
    "score_normalize_docs",
    "temperature_token_mix_docs",
    "knn_graph_edges",
    # round 7 additions
    "q10_returned_items",
    "q18_large_volume_customer",
    "dsir_gumbel_docs",
    "char_entropy_docs",
    "semantic_clusters_vecs",
    "resample_gapfill_events",
    "scrub_spans_docs",
    "cluster_balanced_docs",
    "funnel_events",
    "dataset_diff_docs",
    "curation_pipeline_v2_docs",
    # round 8 additions
    "minhash_dedup_docs",
    "minhash_dedup_best_docs",
    "minhash_dedup_incr_docs",
    "curation_pipeline_v3_docs",
    "simhash_dup_pairs_docs",
    "q4_order_priority",
    "q12_shipping_priority_class",
    "q14_promo_effect",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    # round 9 additions
    "minhash_dedup_boiler_docs",
    "q17_small_quantity_revenue",
    "q21_suppliers_kept_waiting",
    "q2_minimum_cost_supplier",
    "q20_potential_promotion_suppliers",
    # round 9: TPC-H completion (all 22 shapes) + compiled transform op
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_stock",
    "q13_customer_distribution",
    "q15_top_supplier",
    "q16_parts_supplier_relationship",
    "jsonata_transform_update",
    # round 13: sorted-neighborhood blocking
    "sorted_neighbor_dups_docs",
]

# Round 14: the inline subset of the one-line JSON is a FIXED name list —
# exactly the names that were inline in BENCH_r13 — instead of "slowest
# first up to the byte budget". The cost-ordered set changed run to run,
# so the driver's round-over-round diff reported fast-moving queries as
# dropped/new (PERF_r13: 4 phantom "dropped_from_bench"). Order is the
# r13 cost order purely so the trim-on-overflow fallback sheds the
# cheapest entries first; membership, not order, is the contract.
INLINE = [
    "minhash_dedup_incr_docs", "curation_pipeline_v3_docs",
    "fuzzy_decontaminate_docs", "minhash_dedup_best_docs",
    "minhash_dedup_boiler_docs", "minhash_dedup_docs",
    "ngram_jaccard_dups", "simhash_dup_pairs_docs",
    "semantic_clusters_vecs", "curation_pipeline_v2_docs",
    "q2_minimum_cost_supplier", "minhash_lsh_dups", "unimax_mix_docs",
    "ann_lsh_topk", "q20_potential_promotion_suppliers",
    "semantic_dedup_pairs", "heavy_hitter_terms", "bm25_search",
    "bloom_semi_join_lineitem", "ann_ivf_topk", "curation_pipeline_docs",
    "q21_suppliers_kept_waiting", "q8_market_share",
    "jsonata_interpreter", "pack_token_budget_docs",
    "q18_large_volume_customer", "tfidf_top_terms", "knn_graph_edges",
    "q9_product_type_profit", "embedding_outlier_docs",
    "dsir_gumbel_docs", "dsir_select_docs", "q3_shipping_priority",
    "multimodal_frame_sample", "topk_per_group", "q7_volume_shipping",
    "q5_local_supplier", "embedding_dup_pairs", "bpe_encode_docs",
    "skew_split_right_join", "shuffle_positions_docs",
    "cluster_balanced_docs", "temperature_token_mix_docs",
    "q11_important_stock", "embedding_covariance_stats",
    "temperature_mix_docs", "q4_order_priority",
    "sorted_neighbor_dups_docs", "char_entropy_docs",
    "q10_returned_items", "unigram_floor_docs", "cosine_topk_bruteforce",
    "safe_transform_dlq", "udtf_explode_tokens", "unigram_logprob_docs",
    "boilerplate_removal_docs", "text_doc_stats", "jsonata_flagship",
    "sessionize_events",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("bench")
    for t in TABLES:  # warmup: schema + footer reads
        load_table(spark, sf_dir, t).count()
    # warmup: spawn the Python UDF workers (one per core) so pandas-stage
    # queries measure steady-state eval, not one-time fork+import
    spark.range(32 * 10).repartition(32).mapInPandas(lambda it: it, "id long").count()
    # warmup: one untimed pass of every query at the smallest sf. This
    # compiles and caches each plan's WholeStageCodegen classes (the engine
    # sizes the codegen cache to hold them all), JIT-warms the generated
    # code, and forks the second wave of Python workers that chained
    # mapInPandas stages need (32 tasks x 2 runners > the 32 the line above
    # spawned). Round-3 driver benches showed first-execution costs of
    # 5-30 s per heavy query recurring across passes on a contended host;
    # a steady-state cluster job pays them exactly once, which is what
    # BASELINE.md's best-of-N convention measures.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for name in HEADLINE:
            try:
                Q.QUERIES[name](spark, warm_dir).count()
            except Exception:
                pass  # a warmup failure surfaces in the timed pass
    # Interleaved passes, per-query min across passes. Co-tenant CPU spikes
    # on this shared host inflate wall time 2-10x for minutes at a stretch
    # (BASELINE.md); back-to-back best-of-N lets one spike poison every
    # sample of one query (r2: a 1.3s query benched at 19.9s). Running the
    # whole set per pass separates a query's samples by minutes, so a
    # localized spike costs at most one pass. Queries whose two samples
    # still disagree >1.4x get up to two extra passes.
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}

    def one_pass(names: list[str]) -> None:
        for name in names:
            t0 = time.time()
            Q.QUERIES[name](spark, sf_dir).count()
            runs[name].append(time.time() - t0)

    one_pass(HEADLINE)
    one_pass(HEADLINE)
    for _ in range(2):
        noisy = [n for n in HEADLINE if max(runs[n]) > 1.4 * min(runs[n])]
        if not noisy:
            break
        one_pass(noisy)
    timings = {name: round(min(rs), 3) for name, rs in runs.items()}
    total = round(sum(timings.values()), 3)
    # Per-query noise bound (round-10 verdict item 3): record every sample
    # so a >2x delta in a future round can be MECHANICALLY classified as
    # shared-host noise (this round's spread already covered it) vs a real
    # regression. "samples" stays out of the driver's one-line contract
    # fields; it rides in the same JSON object.
    samples = {name: [round(x, 3) for x in rs] for name, rs in runs.items()}
    # Proof that $SPARK_GRAFT_CPUS reached the scheduler (round 14: the
    # round-13 driver flagged suspect_cpus_ignored because nothing in the
    # output evidenced the core count).
    parallelism = spark.sparkContext.defaultParallelism
    result = {
        "metric": "headline_query_set_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "samples": samples,
        "parallelism": parallelism,
        "sf": sf,
    }
    line = json.dumps(result, separators=(",", ":"))
    # Full per-query JSON always lands on disk (the durable artifact).
    # Non-default configs (e.g. the driver's low-core scaling run) get
    # their own file so they never clobber the default-config BENCH.json
    # (round-13 verdict hygiene item).
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    bench_name = "BENCH.json" if cpus == "32" else f"BENCH_c{cpus}.json"
    bench_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), bench_name
    )
    try:
        with open(bench_path, "w") as f:
            f.write(line + "\n")
    except OSError:
        pass
    # The driver records only the LAST 2000 bytes of stdout and json-parses
    # the final line (BENCH_r05/r06 both arrived with "parsed": null because
    # the 94-query dict pushed the line to ~2.5 KB and the tail cut off its
    # head). Emit the full line when it fits the capture window; otherwise
    # emit a parseable summary whose "queries" points at the on-disk file —
    # a non-null parse with a pointer beats a truncated unparseable dict.
    if len(line) <= 1900:
        final = line
    else:
        # Inline the FIXED name set (deterministic run to run; see INLINE
        # above) and note where the complete dict lives.
        inline = [n for n in INLINE if n in timings]
        meta = {"_full": bench_path, "_omitted": len(timings) - len(inline)}

        def render(names: list[str]) -> str:
            return json.dumps(
                {
                    "metric": "headline_query_set_total",
                    "value": total,
                    "unit": "sec",
                    "queries": {
                        **{n: timings[n] for n in names},
                        **meta,
                    },
                    "parallelism": parallelism,
                    "sf": sf,
                },
                separators=(",", ":"),
            )

        # Trim-on-overflow fallback only (digit growth): shed from the
        # cheap end until the line fits the driver's capture window.
        while len(render(inline)) > 1850 and inline:
            inline.pop()
            meta["_omitted"] = len(timings) - len(inline)
        final = render(inline)
    sys.stdout.flush()
    print(final, flush=True)


if __name__ == "__main__":
    main()
