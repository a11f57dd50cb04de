"""Byte-pair encoding: distributed training + Arrow-batched application.

The tokenization step of a training-data pipeline, done the way BPE is
actually trained at scale (Sennrich et al. 2016): the merge rules are a
pure function of the corpus's WORD HISTOGRAM, not of the raw text — so the
distributed part is one frequency-floored word-count aggregation (the same
bounded-vocabulary discipline as unigram_logprob's floor: terms below
``min_count`` can't enter the histogram, so driver state is bounded by
construction), and the merge loop itself runs on the driver over that
histogram (pure, deterministic, corpus-size-independent).

Application is embarrassingly parallel: the learned merge table (bounded:
``num_merges`` entries) rides once per executor in a pandas_udf closure;
each Arrow batch segments its documents with a per-batch memo keyed by
distinct word (natural-language batches repeat words heavily, so the
greedy merge loop runs once per distinct word, not once per token).

No SQL engine can express the iterative merge recursion, so the catalog
gate for this operator is rows-only; the semantics are pinned by
single-machine reference parity tests (tests/test_bpe.py) including the
published 'lowest/newest/widest' worked example.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from kafka_connect_jsonata_spark.functions.text import tokens

__all__ = ["word_histogram", "train_bpe", "segment_word", "encode_documents"]

_EOW = "</w>"  # end-of-word marker, as in the original formulation


def word_histogram(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """(word, count) for every whitespace token with count >= min_count.
    One map-side-combined shuffle; the floor bounds the result set (at
    most total_tokens/min_count rows can survive)."""
    w = df.select(F.explode(tokens(F.col(text_col))).alias("word"))
    out = w.groupBy("word").agg(F.count(F.lit(1)).alias("count"))
    if min_count > 1:
        out = out.filter(F.col("count") >= min_count)
    return out


def _pair_counts(hist: dict[tuple[str, ...], int]) -> dict[tuple[str, str], int]:
    pc: dict[tuple[str, str], int] = {}
    for sym, n in hist.items():
        for a, b in zip(sym, sym[1:]):
            pc[(a, b)] = pc.get((a, b), 0) + n
    return pc


def train_bpe(
    df: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_count: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merge rules from the corpus.

    Distributed: the word histogram (one aggregation). Driver: the classic
    merge loop — repeatedly fuse the most frequent adjacent symbol pair
    (ties broken lexicographically, so training is deterministic across
    runs, partitionings, and engines). Stops early if no pair occurs twice.
    """
    rows = word_histogram(df, text_col, min_count).collect()
    hist: dict[tuple[str, ...], int] = {}
    for r in rows:
        sym = tuple(r["word"]) + (_EOW,)
        hist[sym] = hist.get(sym, 0) + int(r["count"])
    merges: list[tuple[str, str]] = []
    for _ in range(int(num_merges)):
        pc = _pair_counts(hist)
        if not pc:
            break
        # deterministic argmax: highest count, then lexicographically first pair
        top = max(pc.values())
        if top < 2:
            break
        pair = min(p for p, n in pc.items() if n == top)
        merges.append(pair)
        fused = pair[0] + pair[1]
        new_hist: dict[tuple[str, ...], int] = {}
        for sym, n in hist.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == pair[0] and sym[i + 1] == pair[1]:
                    out.append(fused)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_hist[t] = new_hist.get(t, 0) + n
        hist = new_hist
    return merges


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge of one word (reference semantics:
    apply merges in learned order)."""
    sym = list(word) + [_EOW]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def encode_documents(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bpe_tokens array<string>, n_bpe_tokens) per document. The merge
    table is closure-shipped (bounded by num_merges); segmentation is
    memoized per distinct word within each Arrow batch."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    # train-side word_histogram tokenizes with tokens() (Java regex \s+,
    # ASCII whitespace only); mirror that EXACTLY here — Python str.split()
    # also splits on Unicode whitespace (NBSP,  , ...), which would
    # segment different words than the ones the merges were learned over
    # (round-6 ADVICE fix).
    _ws = re.compile(r"[ \t\n\x0b\f\r]+")

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def seg(word: str) -> list[str]:
            got = memo.get(word)
            if got is None:
                got = memo[word] = segment_word(word, ranks)
            return got

        for b in batches:
            toks = []
            for text in b["__text"]:
                out: list[str] = []
                if text:
                    for w in _ws.split(text):
                        if w:
                            out.extend(seg(w))
                toks.append(out)
            yield pd.DataFrame({"__id": b["__id"], "bpe_tokens": toks})

    src = df.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text"))
    enc = src.mapInPandas(
        encode, f"__id {df.schema[id_col].dataType.simpleString()}, bpe_tokens array<string>"
    )
    return enc.select(
        F.col("__id").alias(id_col),
        "bpe_tokens",
        F.size("bpe_tokens").alias("n_bpe_tokens"),
    )
