"""Similarity search over embedding columns (SURVEY.md §2C C25).

Two tiers:
- ``cosine_topk``      — exact brute-force top-k, pure Column math
  (zip_with + aggregate = JVM-side dot product), broadcast of the query
  set. This is the correctness baseline and is already the right plan for
  "few queries x huge corpus": the corpus never shuffles, queries broadcast.
- ``lsh_topk``         — random-hyperplane LSH bucketed variant: corpus and
  queries hash to sign-bit buckets; candidates = bucket collisions in any
  band; exact re-rank of candidates only. At 100 TB this turns an O(Q*N)
  scan into a bucket-join with tunable recall (n_bands x band_bits).
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product of two array<numeric> columns, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan shape: broadcast(queries) x corpus scan -> per-pair Column cosine ->
    window top-k per query. The big side streams through once; no shuffle of
    the corpus (only the k-winnowed pair set shuffles for the rank).
    Self-matches (same id) are excluded.
    """
    q = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("__qv"))
    c = corpus.select(F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("__cv"))
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("__qv"), F.col("__cv")).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rank")
    )


def _hyperplanes(dim: int, n_bands: int, band_bits: int, seed: int) -> list[list[list[float]]]:
    rnd = random.Random(seed)
    return [
        [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(band_bits)]
        for _ in range(n_bands)
    ]


def _band_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature of one band: an int whose bits are sign(v . h)."""
    sig = F.lit(0)
    for hp in planes:
        arr = F.array(*[F.lit(x) for x in hp])
        bit = F.when(dot(vec, arr) >= 0, F.lit(1)).otherwise(F.lit(0))
        sig = sig * 2 + bit
    return sig


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    dim: int,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
    n_bands: int = 8,
    band_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH candidate generation + exact
    re-rank. Candidates are (band, signature) hash-join collisions, so the
    corpus shuffles on the band signature (bounded fanout = n_bands rows per
    vector) instead of cross-joining."""
    planes = _hyperplanes(dim, n_bands, band_bits, seed)

    def with_sigs(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        bands = F.array(
            *[
                F.struct(F.lit(i).alias("band"), _band_signature(F.col(vec_alias), planes[i]).alias("sig"))
                for i in range(n_bands)
            ]
        )
        return df.select(id_alias, vec_alias, F.explode(bands).alias("bs")).select(
            id_alias, vec_alias, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
        )

    q = with_sigs(
        queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("__qv")),
        "query_id",
        "__qv",
    )
    c = with_sigs(
        corpus.select(F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("__cv")),
        "neighbor_id",
        "__cv",
    )
    cand = (
        c.join(F.broadcast(q), ["band", "sig"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "__qv", "__cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id", "neighbor_id", cosine(F.col("__qv"), F.col("__cv")).alias("cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rank")
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    n_cells: int = 16,
    n_probe: int = 4,
    q_id: str = "vec_id",
    q_vec: str = "embedding",
    c_id: str = "vec_id",
    c_vec: str = "embedding",
) -> DataFrame:
    """IVF-flat approximate top-k: coarse-quantize the corpus into n_cells
    cells (centroids = deterministic sample of corpus vectors), probe the
    n_probe nearest cells per query, exact cosine re-rank inside them.

    Scale shape: centroids broadcast (tiny); cell assignment is one
    projection over the corpus scan; the probe join is an equi-join on
    cell id, touching n_probe/n_cells of the corpus per query instead of
    all of it. The canonical IVF trade: recall vs fraction probed."""
    # deterministic centroid pick: lowest ids (seeded, reproducible, no
    # kmeans iterations — kmeans refinement plugs in here at real scale)
    cents = [
        (i, list(r[1]))
        for i, r in enumerate(
            corpus.select(F.col(c_id), F.col(c_vec)).orderBy(F.col(c_id)).take(n_cells)
        )
    ]

    def nearest_cells(vec: Column, n: int) -> Column:
        """Array of the n cell-ids nearest to vec by cosine."""
        scored = F.array(
            *[
                F.struct(
                    (-cosine(vec, F.array(*[F.lit(x) for x in cvec]))).alias("d"),
                    F.lit(cid).alias("cell"),
                )
                for cid, cvec in cents
            ]
        )
        return F.slice(F.array_sort(scored), 1, n).getField("cell")

    c_assigned = corpus.select(
        F.col(c_id).alias("neighbor_id"),
        F.col(c_vec).alias("__cv"),
        nearest_cells(F.col(c_vec), 1)[0].alias("cell"),
    )
    q_probed = queries.select(
        F.col(q_id).alias("query_id"),
        F.col(q_vec).alias("__qv"),
        F.explode(nearest_cells(F.col(q_vec), n_probe)).alias("cell"),
    )
    cand = c_assigned.join(F.broadcast(q_probed), "cell").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id", "neighbor_id", cosine(F.col("__qv"), F.col("__cv")).alias("cosine_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine_sim", 4).alias("cosine_sim"), "rank")
    )
