"""Driver-side plan-construction cost per query (guide §5: the driver
should do almost no data work; round-13 verdict item 1).

For every bench HEADLINE query this times ``Q.QUERIES[name](spark, sf_dir)``
WITHOUT any action — i.e. the pure py4j DataFrame-construction cost plus any
eager barrier (localCheckpoint) the query materializes during construction.
Queries whose construction is slow for py4j reasons (per-element ``F.lit``
loops, long ``withColumn`` chains, wide analyzed plans) show up here
directly; queries with eager barriers are marked by a second column that
re-times construction after a first full run (steady state).

Usage: python tools/construction_time.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_connect_jsonata_spark import queries as Q
from kafka_connect_jsonata_spark.engine import get_spark
from kafka_connect_jsonata_spark.sources.readers import TABLES, load_table

from bench import HEADLINE


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = sys.argv[2:] or HEADLINE
    spark = get_spark("construction-time")
    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    spark.range(32 * 10).repartition(32).mapInPandas(lambda it: it, "id long").count()
    warm = "/root/testdata/sf0.001"
    rows = []
    for name in names:
        fn = Q.QUERIES[name]
        if os.path.isdir(warm):
            try:
                fn(spark, warm).count()
            except Exception:
                pass
        # cold-ish construction (plan not yet analyzed at this sf)
        t0 = time.time()
        df = fn(spark, sf_dir)
        c1 = time.time() - t0
        # full run (what bench times)
        t0 = time.time()
        df.count()
        act = time.time() - t0
        # steady-state re-construction (second bench pass sees this)
        t0 = time.time()
        fn(spark, sf_dir)
        c2 = time.time() - t0
        rows.append((name, c1, c2, act))
        print(f"{name:40s} construct1={c1:6.3f}s construct2={c2:6.3f}s "
              f"action={act:6.3f}s", flush=True)
    rows.sort(key=lambda r: -r[2])
    tot_c2 = sum(r[2] for r in rows)
    tot_act = sum(r[3] for r in rows)
    print(f"\n== steady-state construction total: {tot_c2:.2f}s; "
          f"action total: {tot_act:.2f}s ==")
    print("== top 30 by steady-state construction ==")
    for name, c1, c2, act in rows[:30]:
        print(f"{name:40s} {c2:6.3f}s (first {c1:6.3f}s, action {act:6.3f}s)")


if __name__ == "__main__":
    main()
