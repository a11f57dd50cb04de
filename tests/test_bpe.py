"""BPE tokenizer: distributed histogram training + Arrow apply
(functions/bpe.py, SURVEY §2C C50)."""

from __future__ import annotations

from kafka_connect_jsonata_spark.functions import bpe


def _corpus(spark):
    # Sennrich et al. worked example frequencies: low x5, lower x2,
    # newest x6, widest x3
    rows = []
    did = 0
    for word, n in [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]:
        for _ in range(n):
            rows.append((did, word))
            did += 1
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_train_matches_published_example(spark):
    df = _corpus(spark)
    merges = bpe.train_bpe(df, num_merges=4)
    # pair counts: (e,s)=9, (s,t)=9, (t,</w>)=9 ... tie broken lexicographically
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")
    assert merges[3] == ("l", "o")


def test_segment_word_applies_merges_in_rank_order():
    merges = [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.segment_word("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert bpe.segment_word("low", ranks) == ["low", "</w>"]
    assert bpe.segment_word("xyz", ranks) == ["x", "y", "z", "</w>"]


def test_encode_documents_roundtrip_and_counts(spark):
    df = _corpus(spark)
    merges = bpe.train_bpe(df, num_merges=10)
    enc = bpe.encode_documents(df, merges)
    got = {r["doc_id"]: r.asDict() for r in enc.collect()}
    src = {r["doc_id"]: r["text"] for r in df.collect()}
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for did, text in src.items():
        want = []
        for w in text.split():
            want.extend(bpe.segment_word(w, ranks))
        assert got[did]["bpe_tokens"] == want
        assert got[did]["n_bpe_tokens"] == len(want)
        # decode roundtrip: concatenation with </w> as the word boundary
        decoded = "".join(got[did]["bpe_tokens"]).replace("</w>", " ").strip()
        assert decoded == text


def test_train_is_deterministic_across_runs(spark):
    df = _corpus(spark).repartition(7)
    a = bpe.train_bpe(df, num_merges=6)
    b = bpe.train_bpe(df, num_merges=6)
    assert a == b


def test_min_count_floor_bounds_histogram(spark):
    df = _corpus(spark)
    hist = {r["word"]: r["count"] for r in bpe.word_histogram(df, min_count=3).collect()}
    assert hist == {"low": 5, "newest": 6, "widest": 3}  # 'lower' (2) floored out


def test_empty_and_null_text(spark):
    df = spark.createDataFrame([(1, ""), (2, None), (3, "ab")], ["doc_id", "text"])
    merges = [("a", "b")]
    got = {r["doc_id"]: r.asDict() for r in bpe.encode_documents(df, merges).collect()}
    assert got[1]["bpe_tokens"] == [] and got[1]["n_bpe_tokens"] == 0
    assert got[2]["bpe_tokens"] == []
    assert got[3]["bpe_tokens"] == ["ab", "</w>"]


def test_encode_tokenization_matches_train_side_on_unicode_ws(spark):
    """Train-side word_histogram splits on Java \\s+ (ASCII whitespace
    only); encode_documents must split the SAME way — a NBSP-joined pair
    is ONE word on both sides, not two (round-6 ADVICE fix: str.split()
    also split on Unicode whitespace)."""
    from kafka_connect_jsonata_spark.functions.bpe import (
        encode_documents,
        train_bpe,
        word_histogram,
    )

    w = "lo\u00a0hi"  # NO-BREAK SPACE inside: Java \\s does NOT split it
    df = spark.createDataFrame(
        [(1, f"{w} {w}"), (2, w)], ["doc_id", "text"]
    )
    hist = {r["word"]: r["count"] for r in word_histogram(df).collect()}
    assert hist.get(w) == 3  # one word train-side, three occurrences
    merges = train_bpe(df, num_merges=20)
    out = {
        r["doc_id"]: r["bpe_tokens"]
        for r in encode_documents(df, merges).collect()
    }
    # apply-side must segment the same NBSP-containing word, not split it
    assert "\u00a0" in "".join(out[2])
    # word-boundary count matches train-side tokenization: doc 1 has
    # exactly 2 words -> exactly 2 end-of-word markers
    assert sum(t.endswith("</w>") for t in out[1]) == 2
    assert sum(t.endswith("</w>") for t in out[2]) == 1
