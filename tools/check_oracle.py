"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row-count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]

Importable: ``sweep(sf_dir, only=None, spark=None, verbose=True)`` returns
the list of failing query names — tests/test_oracle_sweep.py runs the FULL
registry at sf0.001 through it on every pytest run, so a query can no longer
reach the registry unswept (the round-6 red row shipped exactly that way).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from kafka_connect_jsonata_spark.engine import get_spark  # noqa: E402
from kafka_connect_jsonata_spark.sources.readers import TABLES  # noqa: E402


def normalize(df) -> tuple[list[tuple], list[str]]:
    """Sort columns by name, stringify values, sort rows."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for row in df.itertuples(index=False):
        rows.append(tuple(_norm_val(v) for v in row))
    return sorted(rows), cols


def _norm_val(v):
    import datetime
    import math

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "NULL"
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return repr(f)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_norm_val(x) for x in v) + "]"
    return str(v)


def duckdb_views(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # multi-file tables (stress tier) are directories of part files
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def sweep(
    sf_dir: str,
    only: set[str] | None = None,
    spark=None,
    verbose: bool = True,
) -> list[str]:
    """Run every (or ``only``) registered query vs its oracle at ``sf_dir``;
    return the names that fail (empty list = all green)."""
    if spark is None:
        spark = get_spark("oracle-check")
    con = duckdb_views(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures: list[str] = []

    def say(msg: str) -> None:
        if verbose:
            print(msg)

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            say(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            say(f"SKIP {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            say(f"FAIL {name}: duckdb error: {e}")
            continue
        s_rows, s_cols = normalize(sdf)
        o_rows, o_cols = normalize(odf)
        status = "OK"
        detail = ""
        if s_cols != o_cols:
            status, detail = "FAIL", f"cols spark={s_cols} oracle={o_cols}"
        elif len(s_rows) != len(o_rows):
            status, detail = "FAIL", f"rowcount spark={len(s_rows)} oracle={len(o_rows)}"
        elif s_rows != o_rows:
            diffs = [
                (a, b) for a, b in zip(s_rows, o_rows) if a != b
            ][:3]
            status, detail = "FAIL", f"values differ, first diffs: {diffs}"
        if status == "FAIL":
            failures.append(name)
        say(f"{status} {name} ({len(s_rows)} rows, {time.time()-t0:.1f}s) {detail}")
    say(f"\n{len(failures)} failures: {failures}")
    return failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) or None
    return 1 if sweep(sf_dir, only=only) else 0


if __name__ == "__main__":
    raise SystemExit(main())
