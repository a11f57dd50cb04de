"""C85 prunable-sketch-store stress (round 10): build a LARGE history
store, then run steady-state ingest batches against it and report the
per-batch history-scan economics the layout exists for — scanned bytes /
store bytes, wall per batch — plus a scale-up check (4x history, 4x
partitions -> per-batch scan bytes ~flat).

Usage: python tools/sketch_store_stress.py [hist_n] [batch_n] [n_batches]
       python tools/sketch_store_stress.py --auto [epoch_n] [batch_n] [epochs]

--auto (round-11 verdict item 2 done-criterion): NO manual P/Q anywhere —
creation auto-sizes from expected_batch_rows, then each growth epoch
appends epoch_n docs and runs maintain_sketch_store() (byte-driven P/Q
growth + small-file compaction); reports per-epoch P/Q and the probe
batch's scan fraction.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_connect_jsonata_spark.engine import get_spark  # noqa: E402
from kafka_connect_jsonata_spark.functions import dedup as D  # noqa: E402

PARAMS = dict(num_hashes=32, n_bands=16, ngram=5)


def synth(spark, n, tag, id_base=0):
    return spark.range(n).select(
        (F.col("id") + id_base).alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.sha2(
                    F.concat_ws("-", F.lit(tag), F.col("id").cast("string"), F.lit(str(i))),
                    256,
                )
                for i in range(6)
            ],
        ).alias("text"),
    )


def main_auto() -> None:
    epoch_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30_000
    batch_n = int(sys.argv[3]) if len(sys.argv) > 3 else 1_000
    epochs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    spark = get_spark("sketch-store-auto-stress", cpus=32)
    tmp = tempfile.mkdtemp(prefix="store_auto_")
    from kafka_connect_jsonata_spark.streaming.transform import (
        maintain_sketch_store,
    )

    try:
        store = os.path.join(tmp, "store")
        # creation: auto P/Q from the expected per-batch rows only
        D.write_sketch_store(
            synth(spark, batch_n, "seed"), store,
            expected_batch_rows=batch_n, **PARAMS,
        )
        meta = D.read_sketch_store_meta(spark, store)
        print(f"created: auto P={meta['index_partitions']} Q={meta['sig_partitions']}")
        for e in range(epochs):
            t0 = time.time()
            D.write_sketch_store(
                synth(spark, epoch_n, f"e{e}", id_base=1_000_000 * (e + 1)),
                store, **PARAMS,
            )
            t_append = time.time() - t0
            t0 = time.time()
            res = maintain_sketch_store(
                spark, store, target_partition_bytes=256 << 10
            )
            t_maint = time.time() - t0
            probe = synth(spark, batch_n, f"p{e}", id_base=900_000_000 + e)
            m: dict = {}
            t0 = time.time()
            pairs = D.minhash_match_against_store(
                probe, store, threshold=0.9, scan_metrics=m
            ).count()
            wall = time.time() - t0
            tot = m["index_total_bytes"] + m["sigs_total_bytes"]
            scan = m["index_bytes"] + m["sigs_bytes"]
            print(
                f"epoch {e}: +{epoch_n} docs ({t_append:.1f}s) "
                f"maintain[{res['action']}] P={res['index_partitions']} "
                f"Q={res['sig_partitions']} ({t_maint:.1f}s) | probe "
                f"{wall:.1f}s pairs={pairs} scan={scan/1e6:.1f}/"
                f"{tot/1e6:.1f}MB ({100*scan/max(tot,1):.1f}%)"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--auto":
        return main_auto()
    hist_n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    batch_n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark("sketch-store-stress", cpus=32)
    tmp = tempfile.mkdtemp(prefix="store_stress_")
    try:
        store = os.path.join(tmp, "store")
        t0 = time.time()
        D.write_sketch_store(
            synth(spark, hist_n, "h"), store,
            index_partitions=4096, sig_partitions=1024, **PARAMS,
        )
        print(f"store build: {hist_n} docs in {time.time()-t0:.1f}s")
        from kafka_connect_jsonata_spark.streaming.transform import (
            compact_sketch_store,
        )

        t0 = time.time()
        res = compact_sketch_store(spark, store)
        print(
            f"compact: {time.time()-t0:.1f}s files "
            f"index {res['index'][0]}->{res['index'][1]}, "
            f"sigs {res['sigs'][0]}->{res['sigs'][1]} (sorted by prune key)"
        )

        for b in range(n_batches):
            newb = synth(spark, batch_n - 20, f"b{b}", id_base=10_000_000 + b * batch_n)
            dups = synth(spark, 20, "h", id_base=0).select(
                (F.col("doc_id") + 20_000_000).alias("doc_id"), "text"
            )  # 20 exact copies of history docs -> sigs path exercised
            batch = newb.unionByName(dups)
            m: dict = {}
            t0 = time.time()
            pairs = D.minhash_match_against_store(
                batch, store, threshold=0.9, scan_metrics=m
            ).count()
            wall = time.time() - t0
            tot = m["index_total_bytes"] + m["sigs_total_bytes"]
            scan = m["index_bytes"] + m["sigs_bytes"]
            print(
                f"batch {b}: {wall:.1f}s pairs={pairs} "
                f"scan={scan/1e6:.1f}MB / store={tot/1e6:.1f}MB "
                f"({100*scan/tot:.1f}%) "
                f"[idx {m['index_bytes']/1e6:.1f}/{m['index_total_bytes']/1e6:.1f}MB, "
                f"sigs {m['sigs_bytes']/1e6:.1f}/{m['sigs_total_bytes']/1e6:.1f}MB]"
            )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
