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


# ---------------------------------------------------------------------------
# DSIR: data selection via importance resampling (hashed n-gram features)
# ---------------------------------------------------------------------------


def hashed_ngram_features_from_tokens(tok_col: Column, use_bigrams: bool = True) -> Column:
    """array<int> of hashed n-gram feature buckets from an ALREADY-BOUND
    token-array column: every unigram plus (optionally) every adjacent-word
    bigram, each hashed into the same [0, HASH_DIM) space via the
    engine-portable md5 bucket. Bigrams pair the array with its own
    1-shifted slice via ``zip_with`` — O(n) per row.

    The argument must be a materialized column reference (e.g. the output
    of a prior ``select(tokens(text).alias(...))``), NOT an inline
    ``tokens(text)`` expression: Catalyst inlines an expression argument
    into every lambda position, so an inline split would re-tokenize the
    document per bigram — measured at ~20x the whole featurization cost at
    sf0.1 before this split-materialization fix."""
    uni = F.transform(tok_col, hashed_bucket)
    if not use_bigrams:
        return uni
    n = F.size(tok_col)
    bi = F.when(
        n >= 2,
        F.zip_with(
            F.slice(tok_col, 1, n - 1),
            F.slice(tok_col, 2, n - 1),
            lambda a, b: hashed_bucket(F.concat_ws(" ", a, b)),
        ),
    ).otherwise(F.array().cast("array<int>"))
    return F.concat(uni, bi)


def hashed_ngram_features(text_col: Column, use_bigrams: bool = True) -> Column:
    """Convenience wrapper over :func:`hashed_ngram_features_from_tokens`
    for one-off use on a text column. For anything hot, materialize
    ``tokens(text)`` in a projection first and call the ``_from_tokens``
    variant (see its docstring for why)."""
    return hashed_ngram_features_from_tokens(tokens(text_col), use_bigrams)


def dsir_features(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    use_bigrams: bool = True,
) -> DataFrame:
    """The DSIR pre-aggregation: per-(doc, bucket) hashed n-gram counts —
    ``(id, __t, j, __c)`` with ``__t`` the target flag, ``j`` the md5
    bucket, ``__c`` the in-doc count. Strictly smaller than the corpus
    text; a cluster caller can materialize THIS once (write it, or
    ``dsir_log_weights(..., cache=True)`` persists it) so the tokenize+
    hash scan of the raw corpus runs exactly once."""
    toks = df.select(
        F.col(id_col),
        is_target.alias("__t"),
        tokens(F.col(text_col)).alias("__w"),
    )
    feats = toks.select(
        F.col(id_col),
        F.col("__t"),
        F.explode(
            hashed_ngram_features_from_tokens(F.col("__w"), use_bigrams)
        ).alias("j"),
    )
    return feats.groupBy(id_col, "__t", "j").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )


def dsir_log_weights(
    df: DataFrame,
    is_target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 1.0,
    use_bigrams: bool = True,
    cache: bool = False,
    features: DataFrame | None = None,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169): score
    every RAW document by how much more likely its hashed n-gram bag is
    under the TARGET distribution than under the raw distribution,

        log w(doc) = sum_j c_j * [ln p_t(j) - ln p_r(j)]

    with add-``lam`` smoothed bucket unigram models fitted on the rows
    where ``is_target`` is true (target) vs false (raw). High-weight raw
    documents are the ones that "look like" the target domain — the
    resampling pool for domain-targeted pretraining data selection.

    Scale shape: the exploded (id, bucket) pass pre-aggregates to
    per-(doc, bucket) COUNTS first, shrinking the scoring join's input to
    distinct (doc, bucket) pairs. The bucket-stats aggregation is AT MOST
    ``HASH_DIM`` rows (the hashing trick — no vocabulary, no unbounded
    broadcast); scoring joins that bounded table (AQE sizes it; broadcast
    at these cardinalities) and re-aggregates per document with
    count-weighted ratios. The corpus text itself never shuffles — only
    (id, int bucket, count) rows do. Totals ride a 1-row broadcast
    crossJoin, lazily. In the default lazy plan the tokenize+hash scan
    runs once per consumer (stats / totals / scoring — measured: filter
    and isnotnull pushdown clone the shared subtree differently per
    branch, so Catalyst's ReusedExchange cannot legally kick in); at gate
    scale the three scans run CONCURRENTLY and the lazy plan measured
    faster below ~50k docs (eager collect lost at 5k, won at 50k —
    SCALE.md). At cluster scale the re-scan dominates, so two escape
    hatches remove it entirely:

    - ``cache=True``: the (id, is_target, bucket, count) pre-aggregation
      is ``persist()``-ed and every consumer (stats, totals, scoring)
      derives from it — the corpus text is tokenized exactly once. Totals
      come from summing the persisted counts (the same number the
      closed-form token-count scan computes; parity is test-pinned).
    - ``features=``: pass a precomputed :func:`dsir_features` table (e.g.
      written to parquet by an earlier job); the raw text is never read
      here at all.

    Returns (id, n_features, log_weight) for every raw document WITH AT
    LEAST ONE TOKEN (a zero-token document has no hashed features, hence
    no defined bag likelihood — it contributes no output row; the SQL
    oracle behaves identically), with the float-stable count-weighted
    formulation ``sum[c_j * (ln(ct_j+lam) - ln(cr_j+lam))] +
    n*[ln(Tr+lam*m) - ln(Tt+lam*m)]`` (round to 6 places downstream; rank
    on the unrounded value upstream of any top-k).
    """
    m = HASH_DIM
    if features is not None:
        dj = features
    else:
        dj = dsir_features(
            df, is_target, id_col=id_col, text_col=text_col,
            use_bigrams=use_bigrams,
        )
        if cache:
            dj = dj.persist()
    stats = dj.groupBy("j").agg(
        F.sum(F.when(F.col("__t"), F.col("__c")).otherwise(F.lit(0))).alias("ct"),
        F.sum(F.when(F.col("__t"), F.lit(0)).otherwise(F.col("__c"))).alias("cr"),
    )
    if features is not None or cache:
        # The pre-agg is materialized (persisted or caller-provided):
        # totals come from summing ITS counts — no text re-scan, and the
        # sum is the identical integer the closed form computes.
        tot = dj.agg(
            F.sum(F.when(F.col("__t"), F.col("__c")).otherwise(F.lit(0)))
            .cast("double")
            .alias("Tt"),
            F.sum(F.when(F.col("__t"), F.lit(0)).otherwise(F.col("__c")))
            .cast("double")
            .alias("Tr"),
        )
    else:
        # Corpus totals have a closed form in the TOKEN COUNT alone (n
        # unigrams + max(n-1, 0) bigrams), so the lazy-plan totals consumer
        # scans with a cheap size(split()) projection instead of re-running
        # the full explode+md5-hash chain a third time (sum(ct) over stats
        # is the same number — asserted by the oracle, which derives tt/tr
        # from its stats CTE).
        n_toks = F.size(tokens(F.col(text_col)))
        nfeat = (
            F.when(n_toks > 0, n_toks * 2 - 1).otherwise(F.lit(0))
            if use_bigrams
            else F.when(n_toks > 0, n_toks).otherwise(F.lit(0))
        )
        tot = df.select(
            is_target.alias("__t"), nfeat.cast("long").alias("__n")
        ).agg(
            F.sum(F.when(F.col("__t"), F.col("__n")).otherwise(F.lit(0)))
            .cast("double")
            .alias("Tt"),
            F.sum(F.when(F.col("__t"), F.lit(0)).otherwise(F.col("__n")))
            .cast("double")
            .alias("Tr"),
        )
    ratio = F.log(F.col("ct").cast("double") + F.lit(lam)) - F.log(
        F.col("cr").cast("double") + F.lit(lam)
    )
    per = (
        dj.filter(~F.col("__t"))
        .join(stats, "j")
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_features"),
            F.sum(F.col("__c").cast("double") * ratio).alias("__s"),
        )
    )
    norm = F.log(F.col("Tr") + F.lit(lam * m)) - F.log(F.col("Tt") + F.lit(lam * m))
    return per.crossJoin(F.broadcast(tot)).select(
        F.col(id_col),
        F.col("n_features"),
        (F.col("__s") + F.col("n_features") * norm).alias("log_weight"),
    )


def dsir_select(
    df: DataFrame,
    is_target: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kw,
) -> DataFrame:
    """Top-``k`` raw documents by DSIR importance weight (deterministic
    tie-break on id) — the plain-top-k flavor of the paper's Gumbel
    resampling. Distributed TakeOrderedAndProject; ``k`` rows cross the
    wire, never the corpus. ``log_weight`` is rounded to 6 places for
    hash-stable output; ordering uses the unrounded value."""
    w = dsir_log_weights(df, is_target, id_col=id_col, text_col=text_col, **kw)
    return (
        w.orderBy(F.col("log_weight").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "n_features", F.round("log_weight", 6).alias("log_weight"))
    )


def dsir_gumbel_select(
    df: DataFrame,
    is_target: Column,
    k: int,
    temperature: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
    **kw,
) -> DataFrame:
    """C71: the DSIR paper's actual resampling step — Gumbel top-k over the
    importance log-weights (Xie et al. 2023 use Gumbel-top-k to draw k
    documents WITHOUT replacement with probability proportional to
    ``exp(log_weight / temperature)``; plain :func:`dsir_select` is the
    deterministic argmax flavor). The Gumbel noise comes from the row's
    md5 position (same content-hash discipline as
    ``operators.sampling.weighted_sample`` — the draw is a pure function
    of content + ``salt``, reproducible on any cluster and partitioning):

        g = log_weight / temperature - ln(-ln(u)),   u = md5-position

    Scale shape: the key is map-side Column arithmetic on top of the
    bounded DSIR stats; the top-k is a distributed TakeOrderedAndProject
    (k rows cross the wire, never the corpus). Temperature sweeps
    (diversity knob) reuse the same weights — pass ``cache=True`` through
    ``**kw`` to tokenize once.

    Returns (id, n_features, log_weight, gumbel_key), both scores rounded
    to 6 places for hash-stable output; ordering uses unrounded keys.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if temperature <= 0:
        raise ValueError("temperature must be > 0")
    from kafka_connect_jsonata_spark.operators.sampling import (
        _HEX_SPACE,
        hash_position,
    )

    w = dsir_log_weights(df, is_target, id_col=id_col, text_col=text_col, **kw)
    # u strictly INSIDE (0, 1): the +0.5 midpoint keeps both log() calls
    # finite — u = 1.0 (an 'ffffffff' md5 prefix, p = 2^-32 per row) would
    # make F.log(-F.log(1.0)) NULL in Spark and silently sort the row LAST
    # while SQL's ln(0) = -inf ranks it first (round-7 review fix)
    u = (
        F.conv(F.substring(hash_position(F.col(id_col), salt), 1, 8), 16, 10)
        .cast("double")
        + 0.5
    ) / float(_HEX_SPACE)
    g = F.col("log_weight") / float(temperature) - F.log(-F.log(u))
    return (
        w.withColumn("__g", g)
        .orderBy(F.col("__g").desc(), F.col(id_col).asc())
        .limit(k)
        .select(
            F.col(id_col),
            F.col("n_features"),
            F.round("log_weight", 6).alias("log_weight"),
            F.round("__g", 6).alias("gumbel_key"),
        )
    )
