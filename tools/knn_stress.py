"""kNN-graph LSH-tier stress measurement (round-8 verdict item 7): the
auto-router's above-the-GEMM-cap path is the 100-TB plan, so it gets a
measured row at >= 200k vectors with a recall check against brute force.

Generates a deterministic clustered corpus (2000 unit centers, 100
members each, dim 64, noise sized so intra-cluster cosine ~0.94 — the
regime ANN targets), runs ``knn_graph(strategy="lsh")``, and reports wall
time plus recall@k against an exact numpy top-k on a 500-query sample.

Usage: python tools/knn_stress.py [n] [dim] [k] [n_probes]
"""

from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from kafka_connect_jsonata_spark.engine import get_spark  # noqa: E402
from kafka_connect_jsonata_spark.functions.similarity import knn_graph  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    n_probes = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    n_clusters = max(n // 100, 1)

    rng = np.random.default_rng(42)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, size=n)
    vecs = (centers[assign] + 0.044 * rng.normal(size=(n, dim))).astype("float32")

    spark = get_spark("knn-stress", cpus=32)
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype="int64"), "embedding": list(vecs)}
    )
    df = spark.createDataFrame(pdf).repartition(64).localCheckpoint()
    df.count()  # materialize outside the timed region

    t0 = time.time()
    edges = knn_graph(
        df, k=k, strategy="lsh", n_bands=16, band_bits=14, n_probes=n_probes
    ).localCheckpoint()
    n_edges = edges.count()
    wall = time.time() - t0
    print(
        f"lsh knn_graph (n_probes={n_probes}): {wall:.1f}s "
        f"edges={n_edges} (target {n * k})"
    )

    unit = vecs.astype("float64")
    unit /= np.linalg.norm(unit, axis=1, keepdims=True)
    qids = rng.choice(n, size=500, replace=False)
    sims = unit[qids] @ unit.T
    sims[np.arange(len(qids)), qids] = -np.inf
    exact_top = np.argsort(-sims, axis=1)[:, :k]
    got = (
        edges.filter(F.col("query_id").isin([int(q) for q in qids]))
        .select("query_id", "neighbor_id")
        .collect()
    )
    gmap = defaultdict(set)
    for r in got:
        gmap[r.query_id].add(r.neighbor_id)
    recalls = [
        len(gmap[int(q)] & set(exact_top[i].tolist())) / k
        for i, q in enumerate(qids)
    ]
    print(
        f"recall@{k}: {float(np.mean(recalls)):.4f} "
        f"(min {min(recalls):.2f}, 500-query sample)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
