"""Regenerate BASELINE.md's per-query table: run bench.py (Spark) and
duckdb_bench.py (oracle SQL) on the same sf dir and print the markdown.

Usage: python tools/make_baseline_table.py [sf_dir]
The exact-similarity oracle is skipped on the DuckDB side at sf0.1 (its
brute-force form runs >7 min); the row is emitted with the timeout note.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NOTES = {
    "ngram_jaccard_dups": "EXACT all-pairs set-similarity join (PPJoin); DuckDB brute force times out",
    "minhash_lsh_dups": "sketch dedup, oracle = brute-force J>=0.9 slice; the approximate 100 TB path",
    "minhash_dedup_docs": "C79 composed fuzzy dedup; DuckDB oracle (brute-force closure, ~8 min at sf0.1) checked at sf0.01, skipped here",
    "minhash_dedup_best_docs": "C79 keep=best variant; oracle skipped here (same brute-force closure)",
    "minhash_dedup_incr_docs": "C81 incremental dedup vs reference corpus; oracle skipped here (same class)",
    "minhash_dedup_boiler_docs": "C79 hot-bucket stress gate (corpus + 3x identical replicas, exact pre-collapse); oracle = plain-corpus closure, skipped here (same class)",
    "q7_volume_shipping": "C86 bidirectional nation-pair trade star",
    "q8_market_share": "C86 conditional-sum market-share ratio",
    "q9_product_type_profit": "C86 profit agg (decimal-exact dual sums)",
    "q11_important_stock": "C86 global-scalar HAVING (exact-decimal total)",
    "q13_customer_distribution": "C86 outer-join zero-preserving histogram",
    "q15_top_supplier": "C86 view + global-MAX tie-preserving equality",
    "q16_parts_supplier_relationship": "C86 count-distinct + NOT-IN anti-join",
    "jsonata_transform_update": "B2.6 transform operator compiled to withField/dropFields",
    "q17_small_quantity_revenue": "C84 correlated scalar AVG, decorrelated to keyed agg + join",
    "q21_suppliers_kept_waiting": "C84 multi-EXISTS/NOT-EXISTS via per-order collect_set window",
    "q2_minimum_cost_supplier": "C84 correlated MIN, tie-preserving equality join",
    "q20_potential_promotion_suppliers": "C84 nested IN + correlated two-aggregate threshold",
    "simhash_docs": "sketch, rows-only",
    "ann_lsh_topk": "LSH ANN at recall-1.0 gate params; oracle = brute-force top-k",
    "ann_ivf_topk": "IVF ANN at recall-1.0 gate params; oracle = brute-force top-k",
    "embedding_dup_pairs": "broadcast-GEMM all-pairs cosine",
    "jsonata_flagship": "tier-1 compiled Columns",
    "jsonata_interpreter": "tier-2 closure-compiled row interpreter (generality benchmark)",
    "jsonata_object_ops": "compiled $sift/$merge projection",
    "envelope_reroute": "full dynamic-envelope pipeline (interpreter tier)",
    "udtf_explode_tokens": "Python UDTF LATERAL join vs native UNNEST",
    "multimodal_frame_sample": "DuckDB side is a row generator, not a decode",
    "skew_salted_join": "salted plan; oracle is the plain join",
    "mixture_sample_docs": "map-side md5 CASE filter",
    "pack_token_budget_docs": "two-phase distributed prefix sum; oracle is a single-threaded global window",
    "topk_per_group": "partial top-k below the exchange (low-cardinality group)",
}


def render_table(spark_q: dict, duck_q: dict, samples: dict | None = None) -> list[str]:
    """Markdown per-query table. ``samples`` (BENCH.json "samples", round-10
    verdict item 3) adds the multi-run noise bound per query: the number of
    interleaved passes and the max/min spread across them — the mechanical
    classifier for future bench deltas (a future time inside [min, min x
    spread] is this host's documented noise, not a regression)."""
    samples = samples or {}
    lines = [
        "| query | PySpark | runs | spread | DuckDB | ratio | note |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, s in spark_q.items():
        rs = samples.get(name) or []
        n_runs = str(len(rs)) if rs else "—"
        spread = (
            f"{max(rs) / max(min(rs), 1e-9):.2f}×" if len(rs) >= 2 else "—"
        )
        if name == "ngram_jaccard_dups":
            d, ratio = ">420 (timed out)", "<0.02×"
        elif name in duck_q:
            d = f"{duck_q[name]:.2f}"
            ratio = f"{s / duck_q[name]:.1f}×" if duck_q[name] > 0 else "—"
        else:
            d, ratio = "—", "—"
        lines.append(
            f"| {name} | {s:.2f} | {n_runs} | {spread} | {d} | {ratio} "
            f"| {NOTES.get(name, '')} |"
        )
    return lines


def patch_baseline_md(repo: str, table: list[str], spark_q: dict) -> None:
    """Replace BASELINE.md's per-query table in place and ASSERT the
    BENCH<->BASELINE join has no dangling keys afterward (round-7 verdict:
    five round-6 queries were measured in BENCH.json but never pasted into
    the hand-maintained table, leaving the 2x contract unevaluable)."""
    path = os.path.join(repo, "BASELINE.md")
    with open(path) as f:
        text = f.read()
    header = "| query | PySpark | runs | spread | DuckDB | ratio | note |"
    if header not in text:  # first regeneration after the round-10 format change
        header = "| query | PySpark | DuckDB | ratio | note |"
    start = text.index(header)
    # the table ends at the first non-table line after the header
    end = start
    for line in text[start:].splitlines(keepends=True):
        if line.startswith("|") or line.strip() == "":
            end += len(line)
            if line.strip() == "" and end > start + len(header):
                break
        else:
            break
    text = text[:start] + "\n".join(table) + "\n\n" + text[end:]
    with open(path, "w") as f:
        f.write(text)
    # dangling-key assert: every benched query has a BASELINE row
    with open(path) as f:
        rows = {
            line.split("|")[1].strip()
            for line in f
            if line.startswith("| ") and not line.startswith("| query")
            and not line.startswith("| metric")
        }
    missing = sorted(set(spark_q) - rows)
    assert not missing, f"BENCH queries missing a BASELINE.md row: {missing}"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.environ.get("BASELINE_SKIP_BENCH") != "1":
        subprocess.run(
            [sys.executable, "bench.py"], capture_output=True, text=True, env=env
        )
    # read the durable artifact, NOT stdout: bench.py's final stdout line is
    # truncated to the driver's 2000-byte tail window when the full dict no
    # longer fits (round-7 change) — BENCH.json always holds every query
    with open(os.path.join(repo, "BENCH.json")) as f:
        bench = json.load(f)
    spark_q = bench["queries"]
    samples = bench.get("samples", {})
    env["DUCKDB_BENCH_SKIP"] = ("ngram_jaccard_dups,minhash_dedup_docs,"
        "minhash_dedup_best_docs,minhash_dedup_incr_docs,"
        "minhash_dedup_boiler_docs")
    duck_out = subprocess.run(
        [sys.executable, "tools/duckdb_bench.py", sf_dir],
        capture_output=True, text=True, env=env,
    ).stdout.strip().splitlines()[-1]
    duck_q = json.loads(duck_out)["queries"]

    table = render_table(spark_q, duck_q, samples)
    print("\n".join(table))
    total = sum(spark_q.values())
    print(f"\nSpark total: {total:.1f} s over {len(spark_q)} queries; "
          f"DuckDB total (oracle-expressible, excl. timeout): {sum(duck_q.values()):.1f} s")
    patch_baseline_md(repo, table, spark_q)
    print("BASELINE.md per-query table rewritten; no dangling BENCH keys.")


if __name__ == "__main__":
    main()
