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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
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


def l2_normalize(a: Column) -> Column:
    """Unit-normalize an array<numeric> column (NULL-safe: zero vectors
    stay zero). Pure Column math — normalizing up front turns every
    downstream cosine into a plain dot product, the standard prep step
    before ANN indexing or embedding dedup."""
    n = l2_norm(a)
    return F.when(n == 0.0, F.transform(a, lambda x: x.cast("double"))).otherwise(
        F.transform(a, lambda x: x.cast("double") / n)
    )


def quantize_int8(a: Column) -> Column:
    """Symmetric max-abs int8 quantization of an array<numeric> column:
    each component maps to round(x / max|x| * 127), an int in [-127, 127].
    4x smaller than float32 at ~0.4% max component error — the standard
    storage/bandwidth reduction for embedding corpora at scale. Zero
    vectors quantize to zeros. JVM-side Column math; pair with
    ``dequantize_int8`` (store max|x| alongside) to recover floats."""
    scale = F.array_max(F.transform(a, lambda x: F.abs(x.cast("double"))))
    return F.when(
        scale == 0.0, F.transform(a, lambda x: F.lit(0).cast("int"))
    ).otherwise(
        F.transform(a, lambda x: F.round(x.cast("double") / scale * 127).cast("int"))
    )


def quantize_scale(a: Column) -> Column:
    """The per-vector dequantization scale for ``quantize_int8``."""
    return F.array_max(F.transform(a, lambda x: F.abs(x.cast("double")))) / 127.0


def dequantize_int8(q: Column, scale: Column) -> Column:
    """Recover approximate floats from ``quantize_int8`` output."""
    return F.transform(q, lambda x: x.cast("double") * scale)


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


def _band_signatures_udf(planes: list[list[list[float]]]):
    """Vectorized signature computation: one pandas UDF returning the
    array of per-band sign-bit signatures for each vector.

    The hyperplane matrix rides to executors as broadcast data inside the
    UDF closure — NOT as thousands of literal nodes in the expression tree
    (inlining n_bands*band_bits*dim float literals makes driver-side
    analysis/codegen the bottleneck and bloats every task's plan). One BLAS
    matmul per Arrow batch computes all bands at once."""
    mat = np.array(planes, dtype="float64")          # (n_bands, band_bits, dim)
    n_bands, band_bits, dim = mat.shape
    flat = mat.reshape(n_bands * band_bits, dim)     # one GEMM for all bands
    powers = (1 << np.arange(band_bits - 1, -1, -1)).astype("int64")

    @pandas_udf("array<int>")
    def sigs(vecs: pd.Series) -> pd.Series:
        v = np.stack(vecs.to_numpy()).astype("float64")          # (n, dim)
        bits = (v @ flat.T >= 0).reshape(len(v), n_bands, band_bits)
        out = (bits * powers).sum(axis=2).astype("int32")        # (n, n_bands)
        return pd.Series(list(out))

    # deterministic in fact; marked otherwise so join-key IsNotNull pushdown
    # can't clone the eval into a second ArrowEvalPython (see transform.py)
    return sigs.asNondeterministic()


def _band_multiprobe_sigs_udf(planes: list[list[list[float]]], n_probes: int):
    """Multi-probe band signatures (Lv et al., VLDB'07, adapted to
    sign-bit bands): per band, emit the vector's own signature PLUS the
    ``n_probes`` single-bit flips of the hyperplane bits with the SMALLEST
    projection margin |v.w| — exactly the bits most likely to have landed
    on the wrong side for a true near neighbor. Directed probing buys most
    of the recall of exhaustive Hamming-1 probing at (1 + n_probes)
    buckets per band instead of (1 + band_bits) — the shuffle multiplier
    stays a chosen constant, not a function of band width.

    Returns a FLAT array of n_bands * (1 + n_probes) int32 signatures,
    ordered band-major (band = idx div stride); the caller derives the
    band from the exploded position — flat arrays keep the Arrow transfer
    one level deep, same shape discipline as :func:`_band_signatures_udf`."""
    mat = np.array(planes, dtype="float64")          # (n_bands, band_bits, dim)
    n_bands, band_bits, dim = mat.shape
    if not 0 <= n_probes < band_bits:
        raise ValueError(f"n_probes must be in [0, {band_bits}), got {n_probes}")
    flat = mat.reshape(n_bands * band_bits, dim)
    powers = (1 << np.arange(band_bits - 1, -1, -1)).astype("int64")

    @pandas_udf("array<int>")
    def sigs(vecs: pd.Series) -> pd.Series:
        v = np.stack(vecs.to_numpy()).astype("float64")          # (n, dim)
        z = (v @ flat.T).reshape(len(v), n_bands, band_bits)
        own = ((z >= 0) * powers).sum(axis=2)                    # (n, n_bands)
        cols = [own[:, :, None]]
        if n_probes:
            # ascending |margin|: index p picks the p-th least-confident bit
            order = np.argsort(np.abs(z), axis=2)
            for p in range(n_probes):
                cols.append((own ^ powers[order[:, :, p]])[:, :, None])
        allsigs = np.concatenate(cols, axis=2)                   # (n, b, 1+p)
        return pd.Series(list(allsigs.reshape(len(v), -1).astype("int32")))

    return sigs.asNondeterministic()


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
    sig_udf = _band_signatures_udf(_hyperplanes(dim, n_bands, band_bits, seed))

    def with_sigs(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        return df.select(
            id_alias, vec_alias, F.posexplode(sig_udf(F.col(vec_alias))).alias("band", "sig")
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

    Scale shape: the centroid matrix rides to executors inside a pandas-UDF
    closure (tiny; the output a distributed kmeans would produce) — NOT as
    thousands of literal nodes in the expression tree, which would make
    driver-side analysis/codegen the bottleneck. Cell assignment is a
    stateless map-side GEMM over the corpus scan (no shuffle); the probe
    join is an equi-join on cell id, touching n_probe/n_cells of the corpus
    per query instead of all of it. The canonical IVF trade: recall vs
    fraction probed."""
    # centroid training: deterministic seed pick (lowest ids), then a few
    # spherical-kmeans Lloyd iterations over a bounded driver-side sample —
    # the standard IVF train/assign split (train on a sample, assign the
    # full corpus distributed). At 100 TB the sample stays exactly this
    # size; only the assignment GEMM below scales with the data.
    seed_rows = corpus.select(F.col(c_id), F.col(c_vec)).orderBy(F.col(c_id)).take(n_cells)
    cent_mat = np.stack([np.asarray(r[1], dtype="float64") for r in seed_rows])
    cent_mat /= np.linalg.norm(cent_mat, axis=1, keepdims=True)
    sample_rows = (
        corpus.select(F.col(c_vec)).orderBy(F.xxhash64(F.col(c_id))).limit(max(2048, 64 * n_cells)).collect()
    )
    sample = np.stack([np.asarray(r[0], dtype="float64") for r in sample_rows])
    sample /= np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-300)
    for _ in range(5):
        assign = (sample @ cent_mat.T).argmax(axis=1)
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cent_mat[c] = m / n

    @pandas_udf("array<int>")
    def ranked_cells(vecs: pd.Series) -> pd.Series:
        """Cell ids ordered by cosine to the vector, nearest first (one BLAS
        matmul per Arrow batch; ties broken by lower cell id via stable sort)."""
        v = np.stack(vecs.to_numpy()).astype("float64")
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-300)
        order = np.argsort(-(v @ cent_mat.T), axis=1, kind="stable").astype("int32")
        return pd.Series(list(order))

    ranked_cells = ranked_cells.asNondeterministic()  # evaluate exactly once

    c_assigned = corpus.select(
        F.col(c_id).alias("neighbor_id"),
        F.col(c_vec).alias("__cv"),
        F.element_at(ranked_cells(F.col(c_vec)), 1).alias("cell"),
    )
    q_probed = queries.select(
        F.col(q_id).alias("query_id"),
        F.col(q_vec).alias("__qv"),
        F.explode(F.slice(ranked_cells(F.col(q_vec)), 1, n_probe)).alias("cell"),
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


def knn_graph(
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    strategy: str = "auto",
    margin: int = 4,
    n_bands: int = 16,
    band_bits: int = 6,
    seed: int = 42,
    broadcast_cap_bytes: int = 256 << 20,
    dim: int | None = None,
    group_cap: int = 4096,
    n_probes: int = 2,
) -> DataFrame:
    """Self kNN graph: every vector's top-``k`` cosine neighbors within the
    SAME table — the substrate for graph-based semantic clustering, label
    propagation, and diversity-aware selection (``cosine_topk``/``lsh_topk``
    answer external queries; this builds the corpus-internal graph).

    ``strategy="gemm"`` (exact): the corpus matrix rides to executors in a
    pandas-UDF closure (probed against ``broadcast_cap_bytes``, same
    contract as ``embedding_dup_pairs(strategy="auto")``); one BLAS matmul
    per Arrow batch winnows each node to ``k + margin`` candidate ids, and
    the winnowed (n x (k+margin)) edge list is re-scored with the Catalyst
    ``cosine`` fold — so the RANKING is the deterministic left-to-right
    fold every oracle reproduces, not BLAS summation order; the window
    top-k runs on the candidate edges only (never n^2 rows). ``margin``
    guards the winnow against last-ulp GEMM/fold disagreement at the
    cut boundary.

    ``strategy="lsh"`` (the non-broadcastable-corpus path, round-9 shape +
    round-10 multi-probe): random-hyperplane band signatures (one GEMM per
    batch, closure-held planes) with each vector probing its ``n_probes``
    lowest-margin single-bit-flip buckets per band (Lv et al. VLDB'07),
    then ONE shuffle grouping each (band, signature) bucket, a local GEMM
    inside the bucket emitting each member's top-(k+margin) — candidate
    volume is therefore output-sized (n_bands*(1+n_probes)*(k+margin)
    rows/vector) instead of collision-quadratic — a cross-band merge, and
    the same exact Catalyst re-rank over the winnowed edge list.
    ``group_cap`` bounds the local sims matrix for pathological buckets
    (id-ordered block scoring; other bands recover cross-block
    neighbors). Approximate: recall depends on band geometry (unit-tested
    against the exact tier; recall@10 at 200k x 64: 0.92 with n_probes=0,
    >=0.95 with the default n_probes=2 — curve in SCALE.md).

    ``strategy="auto"``: probe rows*dim*8 against the cap, route gemm
    below it, lsh above — cannot OOM by construction.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if strategy not in ("auto", "gemm", "lsh"):
        raise ValueError(f"unknown strategy: {strategy!r}")
    base = corpus.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__v"))
    if strategy == "auto":
        # one combined probe job (round 13): count + dim in a single
        # aggregate pass instead of a count job plus a first() job
        probe = base.agg(
            F.count(F.lit(1)).alias("n"),
            F.first(F.size("__v"), ignorenulls=True).alias("d"),
        ).first()
        n = int(probe["n"])
        d = dim or int(probe["d"] or 0)
        strategy = "gemm" if n * d * 8 <= broadcast_cap_bytes else "lsh"
    id_type = corpus.schema[id_col].dataType.simpleString()
    if strategy == "gemm":
        rows = base.collect()
        if len(rows) < 2:
            # 0- or 1-row corpus has no neighbors; np.stack on an empty
            # list would raise, and a single row only ever sees itself
            spark = corpus.sparkSession
            return spark.createDataFrame(
                [],
                f"query_id {id_type}, neighbor_id {id_type}, "
                "cosine_sim double, rank int",
            )
        ids = np.array([r[0] for r in rows])
        mat = np.stack([np.asarray(r[1], dtype="float64") for r in rows])
        norms = np.maximum(np.linalg.norm(mat, axis=1), 1e-300)
        unit = mat / norms[:, None]
        m = min(k + margin, len(ids) - 1)
        spark = corpus.sparkSession

        def winnow(batches):
            # id -> row lookup once per task, keyed on the RAW id values so
            # string/decimal/any id types work (not just int-coercible)
            idx = {i: p for p, i in enumerate(ids.tolist())}
            for pdf in batches:
                qpos = pdf[id_col].map(idx).to_numpy()
                sims = unit[qpos] @ unit.T                     # (b, n)
                sims[np.arange(len(qpos)), qpos] = -np.inf     # drop self
                top = np.argpartition(-sims, m - 1, axis=1)[:, :m]
                yield pd.DataFrame(
                    {
                        "query_id": np.repeat(pdf[id_col].to_numpy(), m),
                        "neighbor_id": ids[top].ravel(),
                    }
                )

        # spread the winnow input: a one-file gate-scale scan is ONE
        # partition, serializing the per-batch GEMM AND the downstream
        # Catalyst cosine re-rank (which inherits this partitioning through
        # the broadcast joins) on a single core — measured 1.5 s of a 2.9 s
        # query inside semantic_clusters' edge barrier (round 13). The
        # spread is conditional: a wide production scan is untouched.
        from kafka_connect_jsonata_spark.functions.dedup import (
            spread_narrow_scan,
        )

        edges = spread_narrow_scan(corpus.select(id_col)).mapInPandas(
            winnow, f"query_id {id_type}, neighbor_id {id_type}"
        )
        qv = base
        nv = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__nv")
        )
        scored = (
            edges.join(F.broadcast(qv), "query_id")
            .join(F.broadcast(nv), "neighbor_id")
            .select(
                "query_id",
                "neighbor_id",
                cosine(F.col("__v"), F.col("__nv")).alias("cosine_sim"),
            )
        )
    else:
        d = dim or len(base.select("__v").first()[0])
        # multi-probe (round-10, recall 0.92 -> >=0.95 at the 200k gate):
        # each vector lands in its own (band, sig) bucket AND the n_probes
        # lowest-margin single-bit-flip buckets per band — recall is
        # recovered exactly where sign bits are least confident, at a
        # CHOSEN shuffle multiplier (1 + n_probes), never (1 + band_bits).
        # The flat signature array is band-major: band = pos div stride.
        stride = 1 + n_probes
        sig_udf = _band_multiprobe_sigs_udf(
            _hyperplanes(d, n_bands, band_bits, seed), n_probes
        )
        sigs = base.select(
            "query_id", "__v", F.posexplode(sig_udf(F.col("__v"))).alias("pos", "sig")
        ).select(
            "query_id",
            "__v",
            F.floor(F.col("pos") / stride).cast("int").alias("band"),
            "sig",
        )
        # Round-9 rework (measured on a 200k x 64 corpus): the previous
        # band SELF-JOIN enumerated every in-bucket pair as a row —
        # collision volume is data-dependent and goes quadratic on
        # clustered corpora (3x10^8 candidate rows through a pair dedup,
        # two vector-attach joins and a Catalyst cosine fold: ~370 s).
        # Instead, score INSIDE each (band, sig) bucket with one local
        # GEMM and emit only each member's top-(k+margin) — the shuffle is
        # strictly bounded at n_bands rows per vector (vector payload
        # included: n_bands x corpus bytes, linear), the merge input is at
        # most n_bands*(1+n_probes)*(k+margin) rows per vector (output-sized), and no
        # stage depends on how hot a bucket is. Buckets above
        # ``group_cap`` score within id-ordered blocks (bounds the local
        # sims matrix at cap^2 doubles); a same-bucket neighbor in another
        # block can still surface through any other band — the same
        # graceful recall trade the dedup bucket_cap makes, documented
        # rather than OOMing.
        m = k + margin
        out_schema = f"query_id {id_type}, neighbor_id {id_type}, __s double"
        cap = int(group_cap)

        def local_topm(pdf: "pd.DataFrame") -> "pd.DataFrame":
            empty = pd.DataFrame(
                {"query_id": pdf["query_id"].iloc[:0],
                 "neighbor_id": pdf["query_id"].iloc[:0],
                 "__s": pd.Series([], dtype="float64")}
            )
            n_rows = len(pdf)
            if n_rows < 2:
                return empty
            ids = pdf["query_id"].to_numpy()
            mat = np.stack(pdf["__v"].to_numpy()).astype("float64")
            unit = mat / np.maximum(
                np.linalg.norm(mat, axis=1, keepdims=True), 1e-300
            )
            order = np.argsort(ids, kind="stable")
            frames = []
            for s in range(0, n_rows, cap):
                blk = order[s : s + cap]
                if len(blk) < 2:
                    continue
                u = unit[blk]
                sims = u @ u.T
                np.fill_diagonal(sims, -np.inf)
                mm = min(m, len(blk) - 1)
                top = np.argpartition(-sims, mm - 1, axis=1)[:, :mm]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": np.repeat(ids[blk], mm),
                            "neighbor_id": ids[blk][top].ravel(),
                            "__s": np.take_along_axis(sims, top, axis=1).ravel(),
                        }
                    )
                )
            return pd.concat(frames, ignore_index=True) if frames else empty

        local = sigs.groupBy("band", "sig").applyInPandas(local_topm, out_schema)
        # cross-band merge in ONE query-keyed shuffle (a pair-keyed
        # dropDuplicates + a query-keyed window would be two shuffles —
        # measured 61 s of the 200k-stress wall): per query, collect the
        # <= n_bands*(1+n_probes)*(k+margin) candidate structs — the bound is a
        # parameter product, never data-dependent (UNBOUNDED-COLLECT
        # audit) — sort by (score desc, neighbor asc), dedup by NEIGHBOR,
        # slice the top m. The dedup must key on the neighbor id alone: the
        # same pair scored in buckets of different shapes gets last-ulp-
        # DIFFERENT dot products (BLAS blocking varies with the matrix
        # shape), so struct-equality array_distinct keeps both copies and
        # the slice fills with duplicates of the nearest mates, crowding
        # out real candidates (round-9 recall regression, caught by
        # test_knn_graph_lsh_recall_and_auto_routing: 0.81). Dedup =
        # sort by (neighbor, score), keep each neighbor's FIRST (best)
        # entry by adjacent comparison, re-sort by (score, neighbor),
        # slice — two O(n log n) array sorts + a linear filter over a
        # ≤ n_bands·(1+n_probes)·(k+margin) array, all JVM-side (a naive per-element
        # contains-scan re-copies the array quadratically and was 10x
        # the whole job's wall at 200k queries). collect_list
        # partial-aggregates map-side.
        cand_struct = F.struct(
            F.col("neighbor_id"), (-F.col("__s")).alias("__ns")
        )

        def _best_per_neighbor(arr):
            # F.get is 0-based and null-safe out-of-range: at i==0 the
            # previous-element lookup is null, the != arm is SQL-null, and
            # (true | null) keeps the row — no path ever evaluates an
            # index-0 element_at, which errors regardless of Or
            # short-circuit order (round-10 advisor fix).
            dedup = F.filter(
                arr,
                lambda e, i: (i == F.lit(0))
                | (
                    F.get(arr, i - 1).getField("neighbor_id")
                    != e.getField("neighbor_id")
                ),
            )
            return F.array_sort(
                F.transform(
                    dedup,
                    lambda e: F.struct(
                        e.getField("__ns").alias("__ns"),
                        e.getField("neighbor_id").alias("neighbor_id"),
                    ),
                )
            )

        winnowed = (
            local.groupBy("query_id")
            .agg(F.array_sort(F.collect_list(cand_struct)).alias("__c"))
            .select(
                "query_id",
                F.explode(
                    F.slice(_best_per_neighbor(F.col("__c")), 1, m)
                ).alias("__p"),
            )
            .select("query_id", F.col("__p.neighbor_id").alias("neighbor_id"))
        )
        # exact re-rank of the winnowed n x (k+margin) edges with the
        # deterministic Catalyst fold — same hybrid as the gemm tier, so
        # the reported similarities and the final ordering are
        # oracle-reproducible regardless of BLAS summation order
        nv = base.select(
            F.col("query_id").alias("neighbor_id"), F.col("__v").alias("__nv")
        )
        scored = (
            winnowed.join(base, "query_id")
            .join(nv, "neighbor_id")
            .select(
                "query_id",
                "neighbor_id",
                cosine(F.col("__v"), F.col("__nv")).alias("cosine_sim"),
            )
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine_sim", 4).alias("cosine_sim"),
            "rank",
        )
    )


def semantic_clusters(
    corpus: DataFrame,
    k: int = 5,
    threshold: float = 0.85,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 20,
    **kw,
) -> DataFrame:
    """C73: graph-based semantic clustering — connected components over the
    thresholded corpus kNN graph. This is what the :func:`knn_graph`
    substrate is FOR: topic/near-domain grouping for diversity-aware
    selection and per-cluster budgeting (cf. SemDeDup's k-means stage, but
    density-following instead of centroid-shaped: chains of pairwise-similar
    documents cluster together even when no single centroid covers them).

    Pipeline (all existing machinery, no new physical shapes):
    ``knn_graph`` (auto GEMM/LSH tier) -> keep edges with
    ``cosine_sim >= threshold`` -> undirected min-label propagation
    (:func:`~kafka_connect_jsonata_spark.functions.dedup.dup_groups_from_pairs`,
    the O(diameter)-round component search with per-round lineage
    truncation). Vectors with no qualifying neighbor are singleton
    clusters of themselves.

    Returns (id, cluster_id) for EVERY corpus row, cluster_id = the
    minimum id reachable through threshold-passing kNN edges.
    """
    from kafka_connect_jsonata_spark.functions.dedup import (
        barrier,
        dup_groups_from_pairs,
    )

    # materialize the (tiny, k-bounded) thresholded edge list ONCE: the
    # component search references it several times (count probe + collect
    # or per-round joins) and would otherwise recompute the kNN winnow per
    # action
    edges = (
        knn_graph(corpus, k=k, id_col=id_col, vec_col=vec_col, **kw)
        .filter(F.col("cosine_sim") >= threshold)
        .transform(barrier)
    )

    groups = dup_groups_from_pairs(
        edges, id_a="query_id", id_b="neighbor_id", max_iter=max_iter
    ).withColumnRenamed("doc_id", id_col)
    return (
        corpus.select(F.col(id_col))
        .join(groups, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("group_id"), F.col(id_col)).alias("cluster_id"),
        )
    )
