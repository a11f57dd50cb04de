"""Hashed-feature linear quality classifier (fastText-style) for corpus
curation: score every document with a bag-of-words logistic model whose
features are hash buckets, and train that model distributed.

This is the standard "model-based quality filter" stage of an LLM data
pipeline (CCNet / GPT-3 / LLaMA data work): a linear classifier over
hashed token features is strong enough to separate "reference-quality"
text from crawl noise, and — unlike an n-gram LM — its state is a FIXED
``dim``-sized weight vector, so at 100 TB nothing about the model grows
with the corpus:

- featurization is the hashing trick: token -> bucket in [0, dim), no
  vocabulary dictionary, no OOV, no driver-side term table (the unbounded-
  vocab failure mode the round-4 review flagged on tfidf/unigram cannot
  exist here by construction);
- scoring is embarrassingly parallel: indices are computed JVM-side, the
  weight vector rides once per executor in a pandas_udf closure, and the
  dot product is a numpy gather-sum per Arrow batch — zero shuffle;
- training is full-batch gradient descent: each iteration is one map over
  the corpus (per-doc margin, closure weights) plus one ``groupBy(bucket)``
  shuffle bounded by ``dim`` distinct keys; the driver holds only the
  ``dim`` floats. Deterministic given (seed weights, data).

Engine-portable hashing: the bucket of a token is built from the first 3
hex chars of md5(token) via per-digit strpos arithmetic — the same md5-hex
trick the sampling/simhash operators use, reproducible bit-for-bit in any
engine with md5 (the DuckDB oracle recomputes it in SQL). Integer-scaled
weights make the gate margin EXACT: quantized weights sum in int64 (order-
free), one float division at the end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from kafka_connect_jsonata_spark.functions.text import tokens

__all__ = [
    "HASH_DIM",
    "hashed_bucket",
    "hashed_buckets",
    "seeded_weights_int",
    "score_documents",
    "train_logreg",
]

HASH_DIM = 4096  # 16^3: bucket = value of the first 3 md5 hex digits
_W_SCALE = 100_000  # integer weight quantum: w = w_int / _W_SCALE


def hashed_bucket(tok: Column) -> Column:
    """Feature bucket in [0, 4096): value of the first 3 hex digits of
    md5(token). Spark decodes with ``conv``; the DuckDB oracle reproduces
    it with per-digit strpos arithmetic — identical by construction."""
    return F.conv(F.substring(F.md5(tok), 1, 3), 16, 10).cast("int")


def hashed_buckets(text_col: Column) -> Column:
    """array<int> of feature buckets for every token of a document."""
    return F.transform(tokens(text_col), hashed_bucket)


def seeded_weights_int(dim: int = HASH_DIM) -> np.ndarray:
    """Deterministic integer-quantized weight vector, reproducible in SQL:
    w_int[i] = (i*1103515245 + 12345) mod 100001 - 50000  (LCG constants).
    Real weight = w_int / 100000 in [-0.5, 0.5]."""
    i = np.arange(dim, dtype=np.int64)
    return (i * 1103515245 + 12345) % (_W_SCALE + 1) - _W_SCALE // 2


def _margin_int_udf(w_int: np.ndarray):
    """Sum of integer weights over a document's bucket array — int64 sum is
    associativity-free, so Spark and the SQL oracle agree bit-for-bit."""
    w = np.asarray(w_int, dtype=np.int64)

    @pandas_udf("long")
    def margin(idx: pd.Series) -> pd.Series:
        out = np.zeros(len(idx), dtype=np.int64)
        for i, arr in enumerate(idx):
            if arr is not None and len(arr):
                out[i] = w[np.asarray(arr, dtype=np.int64)].sum()
        return pd.Series(out)

    # evaluate-once pin: a downstream filter on the margin (the pipeline's
    # `mi > 0`) otherwise pushes a CLONE of this udf below the exchange and
    # scores every document twice (engine-wide rule, cf. bloom probe)
    return margin.asNondeterministic()


def score_documents(
    df: DataFrame,
    w_int: np.ndarray | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.0,
) -> DataFrame:
    """Score every document: margin = sum(w[bucket(tok)]) / 100000,
    keep = margin > threshold. Buckets are computed JVM-side; the weight
    vector rides in the UDF closure (one copy per executor, like the IVF
    centroids). Zero shuffle."""
    if w_int is None:
        w_int = seeded_weights_int()
    idx = hashed_buckets(F.col(text_col))
    scored = df.select(
        F.col(id_col),
        F.size(idx).alias("n_tokens"),
        _margin_int_udf(w_int)(idx).alias("__m"),
    )
    return scored.select(
        id_col,
        "n_tokens",
        (F.col("__m").cast("double") / F.lit(float(_W_SCALE))).alias("margin"),
        (F.col("__m") > F.lit(int(round(threshold * _W_SCALE)))).alias("keep"),
    )


def _doc_features(df: DataFrame, id_col: str, text_col: str, label_col) -> DataFrame:
    """(id, idx array<int>, y double) — the training design matrix in
    hashed-sparse form, one row per doc."""
    return df.select(
        F.col(id_col).alias("__id"),
        hashed_buckets(F.col(text_col)).alias("__idx"),
        label_col.cast("double").alias("__y"),
    )


def train_logreg(
    df: DataFrame,
    label_col: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = HASH_DIM,
    iters: int = 5,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> np.ndarray:
    """Full-batch logistic-regression training over hashed features.

    Per iteration: one zero-shuffle map computes each doc's residual
    r = sigmoid(w.x) - y with the current weights in the closure, then the
    gradient contributions (bucket, r) aggregate through ONE groupBy
    bounded at ``dim`` distinct keys (map-side partial aggregation makes
    the shuffle O(parts * dim) regardless of corpus size); the driver
    applies the dense update. State on the driver: ``dim`` floats.

    Returns the learned float weight vector (length ``dim``). Deterministic
    up to float summation order inside the bucket aggregation.
    """
    feats = _doc_features(df, id_col, text_col, label_col)
    feats = feats.filter(F.size("__idx") > 0).persist()
    n = feats.count()
    if n == 0:
        feats.unpersist()
        raise ValueError("no non-empty documents to train on")
    sc = df.sparkSession.sparkContext
    w = np.zeros(dim, dtype=np.float64)
    try:
        for _ in range(int(iters)):
            # Ship the per-iteration weights as a SparkContext broadcast,
            # not a closure capture: a closure re-pickles the full vector
            # into every task description each iteration, while a broadcast
            # moves it once per executor over the torrent protocol — the
            # difference between 0.8 MB at dim=100k and real pain at
            # embedding-width dims (round-6 review item).
            b_w = sc.broadcast(w.copy())

            @pandas_udf("double")
            def resid(idx: pd.Series) -> pd.Series:
                w_c = b_w.value
                m = np.zeros(len(idx), dtype=np.float64)
                for i, arr in enumerate(idx):
                    if arr is not None and len(arr):
                        m[i] = w_c[np.asarray(arr, dtype=np.int64)].sum()
                return pd.Series(1.0 / (1.0 + np.exp(-m)))

            grad_rows = (
                feats.select((resid(F.col("__idx")) - F.col("__y")).alias("__r"), "__idx")
                .select(F.explode("__idx").alias("j"), "__r")
                .groupBy("j")
                .agg(F.sum("__r").alias("g"))
                .collect()
            )
            b_w.unpersist(blocking=False)
            g = np.zeros(dim, dtype=np.float64)
            for row in grad_rows:
                g[row["j"]] = row["g"]
            w -= lr * (g / n + l2 * w)
    finally:
        feats.unpersist()
    return w
