"""DuckDB comparison timings for BASELINE.md: run each headline query's
oracle SQL on DuckDB over the same parquet the Spark bench reads.

Usage: python tools/duckdb_bench.py [sf_dir]
Prints one JSON line: {"engine": "duckdb", "queries": {name: sec}, ...}.
Queries with no SQL oracle (sketch/rng-based) are skipped.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bench import HEADLINE  # noqa: E402
from kafka_connect_jsonata_spark import queries as Q  # noqa: E402
from kafka_connect_jsonata_spark.sources.readers import TABLES  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    # e.g. DUCKDB_BENCH_SKIP=ngram_jaccard_dups — the exact set-similarity
    # oracle is brute-force all-pairs and runs >7 min at sf0.1
    skip = set(filter(None, os.environ.get("DUCKDB_BENCH_SKIP", "").split(",")))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        sql = Q.ORACLES.get(name)
        if sql is None or name in skip:
            continue
        con.execute(sql).fetchall()  # warm (IO cache, plan)
        t0 = time.time()
        con.execute(sql).fetchall()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "engine": "duckdb",
                "metric": "headline_query_set_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
