"""Unicode text normalization (functions/text.py:normalize_text, C51)."""

from __future__ import annotations

import unicodedata

import duckdb

from kafka_connect_jsonata_spark.functions import text as T

DECOMPOSED_CAFE = "cafe\u0301"  # e + combining acute
PRECOMPOSED_CAFE = "caf\u00e9"


def _run(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {r["doc_id"]: r.asDict() for r in T.normalize_text(df).collect()}


def test_control_chars_whitespace_and_nfc(spark):
    rows = [
        (1, "plain ascii text"),
        (2, "a\x00b\x07c"),                # control chars stripped
        (3, "too   many\t\tspaces  here"),  # runs collapse
        (4, "  padded  "),                  # trim
        (5, DECOMPOSED_CAFE),               # NFC composes the accent
        (6, "line1\nline2"),                # newline preserved
    ]
    got = _run(spark, rows)
    assert got[1]["text_norm"] == "plain ascii text" and not got[1]["changed"]
    assert got[2]["text_norm"] == "abc" and got[2]["changed"]
    assert got[3]["text_norm"] == "too many spaces here"
    assert got[4]["text_norm"] == "padded"
    assert got[5]["text_norm"] == PRECOMPOSED_CAFE and got[5]["changed"]
    assert got[6]["text_norm"] == "line1\nline2" and not got[6]["changed"]


def test_matches_duckdb_nfc_on_nonascii(spark):
    rows = [
        (1, DECOMPOSED_CAFE + " naïve"),
        (2, "Ångström"),  # ANGSTROM SIGN composes to U+00C5
        (3, "ﬁ ligature stays"),  # NFC does not decompose fi-ligature
        (4, "ascii only"),
    ]
    got = _run(spark, rows)
    con = duckdb.connect()
    for did, s in rows:
        want = con.execute(
            r"""SELECT nfc_normalize(trim(regexp_replace(regexp_replace(?,
                '[\x00-\x08\x0B-\x1F\x7F-\x9F]', '', 'g'),
                '[ \t]+', ' ', 'g')))""",
            [s],
        ).fetchone()[0]
        assert got[did]["text_norm"] == want, did


def test_normalization_enables_exact_dedup_collision(spark):
    rows = [(1, DECOMPOSED_CAFE), (2, PRECOMPOSED_CAFE)]
    got = _run(spark, rows)
    assert got[1]["text_norm"] == got[2]["text_norm"] == PRECOMPOSED_CAFE


def test_chunk_with_overlap_semantics(spark):
    import pytest as _pytest

    from kafka_connect_jsonata_spark.functions.text import chunk_with_overlap

    rows = [(1, "w0 w1 w2 w3 w4 w5 w6"), (2, "a b"), (3, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_with_overlap(df, chunk_words=4, stride_words=2)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["n_chunk_words"], r["chunk_text"])
        )
    assert sorted(got[1]) == [
        (0, 4, "w0 w1 w2 w3"),
        (1, 4, "w2 w3 w4 w5"),
        (2, 3, "w4 w5 w6"),
        (3, 1, "w6"),
    ]
    assert sorted(got[2]) == [(0, 2, "a b")]
    assert 3 not in got  # empty doc emits nothing
    # every word is covered by at least one chunk and boundaries overlap
    with _pytest.raises(ValueError):
        chunk_with_overlap(df, 0, 1)
