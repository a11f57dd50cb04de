"""Hashed-feature logistic quality classifier (functions/classifier.py,
SURVEY §2C C45)."""

from __future__ import annotations

import hashlib

import numpy as np
import pyspark.sql.functions as F
import pytest

from kafka_connect_jsonata_spark.functions import classifier


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:3], 16)


def _margin_int(text: str, w_int: np.ndarray) -> int:
    return int(sum(int(w_int[_bucket(t)]) for t in text.split()))


def test_score_matches_manual_formula(spark):
    rows = [(1, "alpha beta gamma"), (2, "the the the"), (3, ""), (4, "zq")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    w_int = classifier.seeded_weights_int()
    got = {r["doc_id"]: r.asDict() for r in classifier.score_documents(df).collect()}
    for did, text in rows:
        toks = text.split()
        mi = _margin_int(text, w_int)
        assert got[did]["n_tokens"] == len(toks)
        assert got[did]["margin"] == pytest.approx(mi / 100_000, abs=0)
        assert got[did]["keep"] == (mi > 0)


def test_score_with_custom_weights(spark):
    df = spark.createDataFrame([(1, "alpha alpha")], ["doc_id", "text"])
    w_int = np.zeros(classifier.HASH_DIM, dtype=np.int64)
    w_int[_bucket("alpha")] = -70_000
    row = classifier.score_documents(df, w_int).collect()[0]
    assert row["margin"] == pytest.approx(-1.4)
    assert not row["keep"]


def _numpy_reference_train(rows, iters, lr, l2, dim):
    """The same full-batch GD, single-machine."""
    idx = [[_bucket(t) for t in text.split()] for _, text, _ in rows]
    y = np.array([float(lab) for _, _, lab in rows])
    keep = [i for i, ix in enumerate(idx) if ix]
    idx = [idx[i] for i in keep]
    y = y[keep]
    n = len(idx)
    w = np.zeros(dim)
    for _ in range(iters):
        m = np.array([w[ix].sum() for ix in idx])
        r = 1.0 / (1.0 + np.exp(-m)) - y
        g = np.zeros(dim)
        for ri, ix in zip(r, idx):
            for j in ix:
                g[j] += ri
        w -= lr * (g / n + l2 * w)
    return w


def test_train_matches_numpy_reference(spark):
    rows = [
        (1, "the quick brown fox", 1),
        (2, "spam spam eggs spam", 0),
        (3, "the lazy dog sleeps", 1),
        (4, "buy now cheap deals", 0),
        (5, "", 0),  # empty doc is dropped by both paths
        (6, "the fox returns home", 1),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    w_spark = classifier.train_logreg(
        df, F.col("y") == 1, iters=4, lr=0.5, l2=1e-4
    )
    w_ref = _numpy_reference_train(rows, iters=4, lr=0.5, l2=1e-4,
                                   dim=classifier.HASH_DIM)
    np.testing.assert_allclose(w_spark, w_ref, rtol=1e-9, atol=1e-12)


def test_train_separates_learnable_label(spark):
    # linearly separable corpus: a class-marker token dominates shared filler
    import random

    rng = random.Random(11)
    filler = ["lorem", "ipsum", "dolor", "sit", "amet", "sed", "eiusmod"]
    rows = []
    for i in range(120):
        y = i % 2
        marker = ["quality quality quality"] if y else ["spamword spamword spamword"]
        words = marker + [rng.choice(filler) for _ in range(6)]
        rng.shuffle(words)
        rows.append((i, " ".join(words), y))
    df = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    w = classifier.train_logreg(df, F.col("y") == 1, iters=10, lr=1.0)
    w_int = np.round(w * 100_000).astype(np.int64)
    pred = classifier.score_documents(df, w_int).select("doc_id", "keep")
    truth = df.select("doc_id", (F.col("y") == 1).alias("yy"))
    joined = pred.join(truth, "doc_id")
    acc = joined.filter("keep = yy").count() / joined.count()
    assert acc >= 0.95, acc


def test_train_empty_corpus_raises(spark):
    df = spark.createDataFrame([(1, "")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        classifier.train_logreg(df, F.lit(True))
