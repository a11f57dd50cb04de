"""Within-doc duplicate n-gram coverage (functions/curation.py, C55)."""

from __future__ import annotations

import pytest

from kafka_connect_jsonata_spark.functions.curation import dup_ngram_coverage


def _run(spark, rows, n):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r.asDict() for r in dup_ngram_coverage(df, n=n).collect()}


def test_bigram_coverage_semantics(spark):
    rows = [
        (1, "buy now buy now buy now"),   # 'buy now'/'now buy' all repeat
        (2, "a b c d e"),                  # no repeated bigram
        (3, "x y z x y"),                  # 'x y' repeats: covers pos 1,2,4,5
        (4, "solo"),                       # < n words
        (5, ""),
    ]
    got = _run(spark, rows, 2)
    assert got[1]["dup_ngram_frac"] == 1.0
    assert got[2]["n_covered"] == 0 and got[2]["dup_ngram_frac"] == 0.0
    assert got[3]["n_words"] == 5 and got[3]["n_covered"] == 4
    assert got[3]["dup_ngram_frac"] == pytest.approx(0.8)
    assert got[4]["n_covered"] == 0
    assert got[5]["n_words"] == 0 and got[5]["dup_ngram_frac"] == 0.0


def test_coverage_is_within_doc_not_cross_doc(spark):
    # the same bigram in two different docs is NOT a within-doc duplicate
    rows = [(1, "p q r"), (2, "p q s")]
    got = _run(spark, rows, 2)
    assert got[1]["n_covered"] == 0 and got[2]["n_covered"] == 0


def test_trigram_and_validation(spark):
    rows = [(1, "a b c a b c a b c")]
    got = _run(spark, rows, 3)
    # every position is inside a repeated trigram ('a b c' x3, 'b c a' x2, ...)
    assert got[1]["dup_ngram_frac"] == 1.0
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        dup_ngram_coverage(df, n=0)
