"""SimHash unit tests: the xxhash64 production variant's near-dup property
and the md5-parity portable variant pinned against a pure-Python reference
(the DuckDB oracle re-verifies the portable variant end-to-end)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kafka_connect_jsonata_spark.functions.dedup import simhash64, simhash_portable


def _py_simhash_portable(text: str, nbits: int = 32) -> int:
    toks = [t for t in text.strip().lower().split() if t]
    n = len(toks)
    sig = 0
    for i in range(nbits):
        c = sum(
            1
            for t in toks
            if hashlib.md5(t.encode()).hexdigest()[i] in "13579bdf"
        )
        if 2 * c > n:
            sig |= 1 << i
    return sig


def _sigs(spark, rows, fn):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(rows)], "id long, text string")
    out = df.select("id", fn(F.col("text")).alias("sig")).collect()
    return {r["id"]: r["sig"] for r in out}


def test_simhash_portable_matches_python_reference(spark):
    rows = [
        "the quick brown fox jumps over the lazy dog",
        "spark vector stream batch shuffle partition",
        "  Mixed   Case  WITH   extra   whitespace  ",
        "single",
        "",
    ]
    got = _sigs(spark, rows, simhash_portable)
    for i, t in enumerate(rows):
        assert got[i] == _py_simhash_portable(t), t


def test_simhash64_near_dup_property(spark):
    """Identical token multisets hash equal; a one-token edit in a long doc
    moves few bits; unrelated docs move many."""
    base = " ".join(f"tok{i}" for i in range(100))
    edited = " ".join(f"tok{i}" for i in range(99)) + " changed"
    unrelated = " ".join(f"other{i}" for i in range(100))
    got = _sigs(spark, [base, "  " + base.upper() + "  ", edited, unrelated], simhash64)

    def hamming(a: int, b: int) -> int:
        return bin((a ^ b) & (2**64 - 1)).count("1")

    assert got[0] == got[1]  # case/whitespace-normalized
    assert 0 < hamming(got[0], got[2]) <= 16  # near-dup: small bit drift
    assert hamming(got[0], got[3]) > 16  # unrelated: far


def test_minhash_sketch_shingle_parity_with_jvm(spark):
    """The numpy sketch kernel's distinct-shingle hashes must agree with
    the JVM char_ngrams semantics on COUNT per document (incl. unicode,
    short, and empty docs) and on cross-document intersection structure —
    the two properties the exact-Jaccard verify depends on."""
    import pandas as pd

    from kafka_connect_jsonata_spark.functions.dedup import (
        _minhash_sketch_fn,
        char_ngrams,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy cat",
        "ab",          # shorter than the shingle width
        "",            # empty
        "héllo wörld — unicode ünïcödé",
        "aaaaaaaaaaaa",  # degenerate: one distinct shingle
        "  spaced   out\ttabs  ",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    jvm = {
        r["id"]: r["n"]
        for r in df.select(
            "id", F.size(F.array_distinct(char_ngrams(F.col("text"), 5))).alias("n")
        ).collect()
    }
    norm = [t.strip().lower() for t in texts]
    import re

    norm = [re.sub(r"\s+", " ", t) for t in norm]
    batch = pd.DataFrame({"id": range(len(texts)), "__s": norm})
    out = next(_minhash_sketch_fn(32, 8, 5, 0x5EED)([batch]))
    for i in range(len(texts)):
        assert len(out["__h"][i]) == jvm[i], (i, texts[i])
    # intersection structure: docs 0/1 share all but the tail shingles
    a, b = set(out["__h"][0]), set(out["__h"][1])
    jvm_ab = df.filter(F.col("id") < 2).select(
        F.array_distinct(char_ngrams(F.col("text"), 5)).alias("g")
    ).collect()
    inter_jvm = len(set(jvm_ab[0]["g"]) & set(jvm_ab[1]["g"]))
    assert len(a & b) == inter_jvm
