"""Variant-vs-JSON-string carrier benchmark for the dynamic tier
(round-10 verdict item 7).

Question: should ``wrap_as_variant_envelope`` (Spark 4 VariantType) be
the DEFAULT carrier for the interpreter tier instead of the JSON-string
envelope? The interpreter tier must materialize a full Python tree per
record; the only carrier-dependent cost is decode (and re-encode). This
tool measures, end to end on the events table at $SPARK_GRAFT_SF_DIR:

- ``json``:    envelope value as JSON string -> ``json.loads`` in the
               pandas UDF (the shipped ``transform_envelope`` path);
- ``variant``: envelope value as VariantType -> ``VariantVal.toPython()``
               in the pandas UDF;
- plus a driver-side micro-bench of the two decoders on one payload.

Result (pinned in BASELINE.md): the JSON-string carrier wins by a wide
margin for tier-2 — ``VariantVal.toPython()`` is a pure-Python decoder
(~30x slower than C ``json.loads``) and coerces JSON numbers through
Decimal, diverging from the interpreter's float semantics. Variant's
advantages are JVM-side (``variant_get`` without a full parse, shredded
parquet) — exactly the paths that never reach the interpreter — so the
dynamic tier keeps JSON strings as the tier-2 carrier and reserves
``wrap_as_variant_envelope`` for JVM-side field access.

Usage: python tools/variant_bench.py [sf_dir] [runs]
Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from kafka_connect_jsonata_spark.engine import get_spark
    from kafka_connect_jsonata_spark.envelope import (
        wrap_as_dynamic_envelope,
        wrap_as_variant_envelope,
    )
    from kafka_connect_jsonata_spark.jsonata.interpreter import (
        UNDEFINED,
        Jsonata,
    )
    from kafka_connect_jsonata_spark.jsonata.parser import parse
    from kafka_connect_jsonata_spark.sources.readers import load_table

    spark = get_spark()
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "props"
    )
    # payload-conditioned projection: forces a real tree walk per record
    expr = (
        "value.event_id != null ? {'id': value.event_id,"
        " 'kind': value.event_type, 'k': $number(value.props.k)} : $$.nope"
    )
    ast = parse(expr)

    def run_udf(df, decode):
        out_t = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("kind", T.StringType()),
                T.StructField("k", T.DoubleType()),
            ]
        )

        @F.pandas_udf(out_t)
        def _eval(batch: pd.Series) -> pd.DataFrame:
            j = Jsonata(ast)
            rows = []
            for raw in batch:
                val = decode(raw)
                r = j.evaluate({"value": val})
                rows.append(
                    (None, None, None)
                    if r is UNDEFINED or r is None
                    else (r.get("id"), r.get("kind"), r.get("k"))
                )
            return pd.DataFrame(rows, columns=["id", "kind", "k"])

        return df.select(_eval("value").alias("r")).select("r.*")

    def timed(mk):
        best = float("inf")
        rc = 0
        for _ in range(runs):
            t0 = time.perf_counter()
            rc = mk().count()
            best = min(best, time.perf_counter() - t0)
        return best, rc

    # props is a JSON string column inside the payload struct; decode it
    # so both carriers hold the same fully-structured tree
    typed = ev.withColumn(
        "props",
        F.from_json("props", "map<string,string>"),
    )
    js_env = wrap_as_dynamic_envelope(typed, "events").select("value")
    var_env = wrap_as_variant_envelope(typed, "events").select("value")

    t_json, n_json = timed(
        lambda: run_udf(js_env, lambda s: json.loads(s) if s else None)
    )
    t_var, n_var = timed(
        lambda: run_udf(var_env, lambda v: v.toPython() if v is not None else None)
    )
    assert n_json == n_var, (n_json, n_var)

    # driver-side decoder micro-bench on one representative payload
    from pyspark.sql.types import VariantVal

    sample = js_env.limit(1).collect()[0][0]
    vv = VariantVal.parseJson(sample)
    N = 20000
    t0 = time.perf_counter()
    for _ in range(N):
        json.loads(sample)
    t1 = time.perf_counter()
    for _ in range(N):
        vv.toPython()
    t2 = time.perf_counter()

    print(
        json.dumps(
            {
                "metric": "variant_vs_json_interpreter_carrier",
                "sf_dir": sf_dir,
                "rows": n_json,
                "json_string_sec": round(t_json, 3),
                "variant_sec": round(t_var, 3),
                "variant_over_json": round(t_var / t_json, 2),
                "micro_json_loads_us": round((t1 - t0) / N * 1e6, 2),
                "micro_variant_topython_us": round((t2 - t1) / N * 1e6, 2),
                "default": "json_string",
            }
        )
    )


if __name__ == "__main__":
    main()
