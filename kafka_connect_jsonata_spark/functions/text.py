"""Text analysis operators over a document corpus (SURVEY.md §2C C24).

All hot-path expressions are native Column functions (JVM-side, codegen'd) —
no Python UDFs — so they run at parquet-scan speed on 100 TB. Tokenization
is a split+explode, term stats are hash aggregations with map-side combine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small stopword sets for the language-ID heuristic and quality scoring.
# Deliberately tiny: these are heuristics, not models.
STOPWORDS_EN = ("the", "and", "of", "to", "a", "in", "is", "that", "for", "it")
STOPWORDS_FR = ("le", "la", "et", "les", "des", "un", "une", "du", "que", "est")
STOPWORDS_DE = ("der", "die", "und", "das", "ein", "ist", "nicht", "mit", "den", "von")


def tokens(col: Column) -> Column:
    """Whitespace tokenization of a text column (empty tokens removed)."""
    return F.filter(F.split(F.trim(col), r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def char_count(col: Column) -> Column:
    return F.length(col)


def _avg_token_len_of(t: Column) -> Column:
    """Mean token length from an ALREADY-BUILT token array Column."""
    return F.when(
        F.size(t) > 0,
        F.aggregate(t, F.lit(0).cast("double"), lambda acc, x: acc + F.length(x)) / F.size(t),
    )


def avg_token_len(col: Column) -> Column:
    """Mean token length, NULL on empty text."""
    return _avg_token_len_of(tokens(col))


_STOPWORD_ARRS: dict[tuple[str, ...], Column] = {}


def _stopword_arr(words: tuple[str, ...]) -> Column:
    # one literal-array Column per word list, shared across every
    # construction in the process (round 14, guide §5: a Column is an
    # immutable JVM expression tree — rebuilding it is one py4j round trip
    # per literal, for the identical tree)
    arr = _STOPWORD_ARRS.get(words)
    if arr is None:
        arr = F.array(*[F.lit(w) for w in words])
        _STOPWORD_ARRS[words] = arr
    return arr


def _stopword_hits_of(toks_lower: Column, words: tuple[str, ...]) -> Column:
    """Stopword hit count from an ALREADY-BUILT lowercased token array."""
    arr = _stopword_arr(words)
    return F.size(F.filter(toks_lower, lambda t: F.array_contains(arr, t)))


def _stopword_hits(col: Column, words: tuple[str, ...]) -> Column:
    return _stopword_hits_of(tokens(F.lower(col)), words)


def stopword_ratio(col: Column, words: tuple[str, ...] = STOPWORDS_EN) -> Column:
    t = tokens(col)
    return F.when(F.size(t) > 0, _stopword_hits(col, words) / F.size(t)).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    n = F.length(col)
    punct = n - F.length(F.regexp_replace(col, r"[^A-Za-z0-9\s]", ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def _quality_score_of(t: Column, tl: Column, col: Column) -> Column:
    """Quality score from already-built token arrays (``t`` = tokens,
    ``tl`` = lowercased tokens). Identical arithmetic to the public
    :func:`quality_score` — shared sub-Columns, same expression tree."""
    tc = F.size(t).cast("double")
    atl = F.coalesce(_avg_token_len_of(t), F.lit(0.0))
    sw = F.when(
        F.size(t) > 0, _stopword_hits_of(tl, STOPWORDS_EN) / F.size(t)
    ).otherwise(F.lit(0.0))
    pr = punct_ratio(col)
    return (
        F.least(tc / F.lit(100.0), F.lit(1.0)) * 0.25
        + F.when((atl >= 3) & (atl <= 10), F.lit(1.0)).otherwise(F.lit(0.0)) * 0.25
        + F.least(sw * F.lit(5.0), F.lit(1.0)) * 0.25
        + (F.lit(1.0) - F.least(pr * F.lit(4.0), F.lit(1.0))) * 0.25
    )


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: enough tokens, sane mean token
    length, some stopwords, low punctuation noise. Pure Column arithmetic."""
    return _quality_score_of(tokens(col), tokens(F.lower(col)), col)


def _lang_id_of(tl: Column) -> Column:
    """Language vote from an ALREADY-BUILT lowercased token array."""
    en = _stopword_hits_of(tl, STOPWORDS_EN)
    fr = _stopword_hits_of(tl, STOPWORDS_FR)
    de = _stopword_hits_of(tl, STOPWORDS_DE)
    best = F.greatest(en, fr, de)
    return (
        F.when(best == 0, F.lit("unknown"))
        .when(en == best, F.lit("en"))
        .when(fr == best, F.lit("fr"))
        .otherwise(F.lit("de"))
    )


def lang_id(col: Column) -> Column:
    """Stopword-vote language ID heuristic: en/fr/de/unknown."""
    return _lang_id_of(tokens(F.lower(col)))


def fingerprint(col: Column) -> Column:
    """Normalized document fingerprint: md5 over whitespace-collapsed,
    lowercased text. Identical fingerprints = exact near-normal duplicates."""
    return F.md5(F.lower(F.regexp_replace(F.trim(col), r"\s+", " ")))


def term_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus term frequency: split -> explode -> hash agg (map-side combine
    makes this a near-linear scan at scale)."""
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("tf"))
    )


def doc_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document stats table: token count, char count, mean token length,
    stopword ratio, punctuation ratio, quality, fingerprint, predicted lang.

    Round 14 (guide §5 — the driver): the token arrays and stopword hit
    counts are built ONCE and shared across the output columns (this used
    to rebuild ``tokens(text)`` eleven times — ~1850 py4j round trips,
    0.5 s of pure driver time per construction). Value-identical: the same
    expression trees, constructed once instead of per column."""
    c = F.col(text_col)
    t = tokens(c)
    tl = tokens(F.lower(c))
    sw = F.when(
        F.size(t) > 0, _stopword_hits_of(tl, STOPWORDS_EN) / F.size(t)
    ).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        F.size(t).alias("n_tokens"),
        char_count(c).alias("n_chars_computed"),
        F.round(F.coalesce(_avg_token_len_of(t), F.lit(0.0)), 4).alias("avg_token_len"),
        F.round(sw, 4).alias("stopword_ratio"),
        F.round(punct_ratio(c), 4).alias("punct_ratio"),
        F.round(_quality_score_of(t, tl, c), 4).alias("quality"),
        fingerprint(c).alias("fingerprint"),
        _lang_id_of(tl).alias("lang_pred"),
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 keyword relevance of every document against a fixed query
    (Robertson/Sparck Jones BM25, the Lucene/Elasticsearch default scoring).

    Returns (id_col, score) for documents matching >= 1 query term.

    Scale design — NO per-token shuffle. Because the query terms are known
    at plan time, per-document tf and dl are computed map-side from the
    token array (``size(filter(tokens, = term))``), so the corpus is
    scanned once with zero wide exchanges; the only aggregation is the
    one-row corpus-stats reduce (N, sum dl, per-term document frequency),
    which is map-side partial + broadcast back. Compare the textbook
    explode -> groupBy(doc, term) formulation, which shuffles every token
    of a 100 TB corpus. The per-term score sum is a static expression in
    term order, so results are bit-reproducible (and oracle-exact vs the
    same arithmetic in SQL).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    toks = tokens(F.lower(F.col(text_col)))
    dl = F.size(toks).alias("dl")
    def _tf(term: str) -> Column:
        # NB: a 2-arg lambda would be given (element, index) by F.filter
        return F.size(F.filter(toks, lambda x: x == F.lit(term)))

    tf_cols = [_tf(t).alias(f"tf_{i}") for i, t in enumerate(query_terms)]
    per_doc = df.select(F.col(id_col), dl, *tf_cols)
    stats = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(query_terms))
        ],
    )
    joined = per_doc.join(F.broadcast(stats))
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    score = F.lit(0.0)
    for i in range(len(query_terms)):
        tf = F.col(f"tf_{i}").cast("double")
        dfreq = F.col(f"df_{i}").cast("double")
        idf = F.log((F.col("n_docs") - dfreq + 0.5) / (dfreq + 0.5) + 1.0)
        score = score + idf * tf * (k1 + 1.0) / (
            tf + k1 * (1.0 - b + b * F.col("dl").cast("double") / avgdl)
        )
    any_hit = None
    for i in range(len(query_terms)):
        hit = F.col(f"tf_{i}") > 0
        any_hit = hit if any_hit is None else (any_hit | hit)
    return joined.filter(any_hit).select(F.col(id_col), score.alias("score"))


BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def bpe_ish_tokens(col: Column) -> Column:
    """GPT-2-style pre-tokenization approximation: letter runs, single
    digits, and punctuation marks as separate pieces (whitespace dropped).
    A real BPE merges within these pieces, so this count upper-bounds and
    tracks BPE token counts closely on natural text — good enough for
    corpus budgeting, and it runs as a JVM regex (no vocab lookup)."""
    return F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0)


def bpe_ish_token_count(col: Column) -> Column:
    return F.size(bpe_ish_tokens(col))


def heavy_hitter_terms(
    df: DataFrame, k: int = 10, capacity: int = 64, text_col: str = "text"
) -> DataFrame:
    """EXACT top-k terms over an unbounded corpus with bounded state:
    Misra-Gries summaries per partition (at most ``capacity`` counters of
    executor state, mapInPandas) propose candidates, then one keyed
    aggregation re-counts ONLY the candidates exactly and takes top-k.

    Why this is the 100 TB shape: the naive explode -> groupBy(term)
    shuffles the corpus's entire token stream keyed by term; here the
    shuffle carries just candidate terms (<= capacity x partitions rows)
    plus the map-side-combined candidate counts. Exactness guarantee: any
    term with global frequency > N/(capacity+1) must survive the MG
    summary of at least one partition (pigeonhole), so the candidate set
    is a superset of the true top-k whenever the k-th term clears that
    bound. The guarantee is CHECKED, not assumed (round-3 advice): after
    the exact re-count, if the k-th returned frequency does not strictly
    exceed N/(capacity+1) — a flat distribution where MG may have dropped
    a true heavy hitter — the function falls back to the full
    groupBy(term) path. The check costs one extra map-side-only corpus
    scan (a summed token count, no shuffle).

    Per-batch MG merge (round-3 verdict item 5): merge the batch's exact
    ``value_counts`` into the summary, then reduce back to ``capacity``
    counters by subtracting the (capacity+1)-th largest count and dropping
    non-positive ones — the standard mergeable-summaries MG reduction,
    same N/(capacity+1) bound, with Python work per DISTINCT term per
    batch instead of per token.

    EAGERNESS CONTRACT (round-4 review): unlike the other operators in
    this module, calling this function RUNS Spark jobs immediately (the
    MG summary pass, the candidate re-count, and the guard decision —
    all required to decide whether the MG guarantee held) and, when the
    guard passes, returns the k-row result as a LOCAL relation rather
    than a lazy plan. Callers composing lazy pipelines should treat the
    result as materialized driver-side state (it is at most k rows).
    Round 13: the guard's token count rides the MG pass itself (one
    NULL-term row per partition), so the corpus is tokenized twice per
    call instead of three times.
    """
    # NO spread of the token stream (round-14 A/B): spreading measured
    # +25% (1.25 -> 1.61 s) — the exchange costs more than the 1-task
    # tokenize stages it parallelizes (they overlap other jobs). The MG
    # guard would stay exact under any partitioning, so this is purely a
    # measured-cost call, not a correctness one.
    words = df.select(F.explode(tokens(F.col(text_col))).alias("term"))

    def mg(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        n_seen = 0
        for b in batches:
            n_seen += len(b)
            for t, c in b["term"].value_counts().items():
                counters[t] = counters.get(t, 0) + int(c)
            if len(counters) > capacity:
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {t: c - cut for t, c in counters.items() if c > cut}
        # one NULL-term row carries the partition's exact token count, so
        # the MG scan double-duties as the guard's corpus token count —
        # round 13: this removes the separate map-side token-count scan
        # (the corpus used to be tokenized three times per call: MG input,
        # exact re-count, guard count; now twice)
        yield pd.DataFrame(
            {"term": list(counters) + [None], "n": [None] * len(counters) + [n_seen]}
        )

    from kafka_connect_jsonata_spark.functions.dedup import barrier

    summary = barrier(words.mapInPandas(mg, "term string, n bigint"))
    cands = summary.filter(F.col("term").isNotNull()).select("term").distinct()
    exact = (
        words.join(F.broadcast(cands), "term", "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("freq"))
    )
    topk = exact.orderBy(F.col("freq").desc(), F.col("term").asc()).limit(k)
    got = topk.collect()
    n_tokens = (
        summary.filter(F.col("term").isNull()).agg(F.sum("n").alias("n")).first()["n"]
        or 0
    )
    if len(got) >= k and got[-1]["freq"] > n_tokens / (capacity + 1):
        # guard passed: the k-row result is already materialized (bounded
        # driver state); hand it back as a local relation instead of
        # re-running the candidate + re-count scans on the next action
        return df.sparkSession.createDataFrame(got, topk.schema)
    # guarantee not met: exact fallback (vocab-wide shuffle, still linear)
    return (
        words.groupBy("term")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("term").asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Unicode text normalization (ingestion cleanup)
# ---------------------------------------------------------------------------

def normalize_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Ingestion-time text cleanup: strip C0/C1 control characters (keeping
    newline and tab), collapse horizontal-whitespace runs to one space,
    trim, then Unicode-NFC normalize — the canonicalization pass that runs
    before any hashing/dedup so that byte-level variants of the same text
    (decomposed accents, stray control bytes, ragged spacing) collide
    instead of slipping past exact dedup.

    Scale shape: the regex chain is JVM codegen; only the NFC step is
    Python (pandas ``str.normalize`` — vectorized ICU-equivalent table
    lookup, Arrow-batched, zero shuffle). Both steps are pure row maps.
    NFC is an engine-portable contract (the Unicode standard fixes it), so
    the operator is oracle-checkable against DuckDB's ``nfc_normalize``.

    Returns (id, text_norm, changed).
    """
    from pyspark.sql.functions import pandas_udf

    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.col(text_col), "[\\x00-\\x08\\x0B-\\x1F\\x7F-\\x9F]", ""
            ),
            "[ \\t]+",
            " ",
        )
    )

    @pandas_udf("string")
    def nfc(s: pd.Series) -> pd.Series:
        return s.str.normalize("NFC")

    out = df.select(
        F.col(id_col), F.col(text_col).alias("__orig"), cleaned.alias("__c")
    ).select(F.col(id_col), "__orig", nfc(F.col("__c")).alias("text_norm"))
    return out.select(
        id_col,
        "text_norm",
        (F.col("text_norm") != F.col("__orig")).alias("changed"),
    )


# ---------------------------------------------------------------------------
# overlapping chunking (retrieval / context-window preparation)
# ---------------------------------------------------------------------------

def chunk_with_overlap(
    df: DataFrame,
    chunk_words: int,
    stride_words: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into word windows of ``chunk_words`` advancing by
    ``stride_words`` (< chunk_words -> overlapping) — the
    retrieval/embedding prep step (RAG corpora, long-doc training
    examples keep context across boundaries via the overlap).

    Emits (id, chunk_id, n_chunk_words, chunk_text); the final window is
    the remainder (never empty, never duplicated: windows start at every
    stride offset < word count). Deterministic, pure Column expression —
    explode is the only row-multiplying step, no shuffle at all.
    """
    if chunk_words < 1 or stride_words < 1:
        raise ValueError("chunk_words and stride_words must be >= 1")
    # tokens materialized in a first projection so the window lambda slices
    # a bound column (an inline split re-tokenizes per window — 2x at sf0.1)
    w = F.col("__w")
    n = F.size(w)
    n_chunks = F.when(n > 0, F.floor((n - 1) / stride_words) + 1).otherwise(F.lit(0))
    idx = F.when(
        n_chunks > 0, F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("cid"),
            F.array_join(
                F.slice(w, i * stride_words + 1, chunk_words), " "
            ).alias("chunk"),
            F.least(n - i * stride_words, F.lit(chunk_words)).alias("nw"),
        ),
    )
    ex = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__w")).select(
        F.col(id_col), F.explode(chunks).alias("__c")
    )
    return ex.select(
        id_col,
        F.col("__c.cid").alias("chunk_id"),
        F.col("__c.nw").cast("int").alias("n_chunk_words"),
        F.col("__c.chunk").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# C58: line-level cleaning (C4/RefinedWeb-style rules)
# ---------------------------------------------------------------------------


def clean_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    delimiter: str = "\n",
    min_words: int = 3,
    badwords: tuple[str, ...] = ("javascript", "lorem ipsum", "cookie"),
    require_terminal_punct: bool = False,
) -> DataFrame:
    """C4-style line-level document cleaning: split ``text_col`` on
    ``delimiter``, drop lines with fewer than ``min_words`` words, lines
    containing a badword (case-insensitive substring), and — optionally —
    lines not ending in terminal punctuation (. ! ? ").

    Returns (id, cleaned text, n_lines, n_kept). Zero-shuffle: the whole
    operator is one Column projection over the scan (split/filter/
    array_join are codegen'd JVM expressions), so at 100 TB it runs at
    parquet-scan speed with full predicate/column pushdown intact.

    Reference scope: the reference transforms one record at a time
    (JsonataTransformation.java:88); corpus-curation rules like C4's line
    filters (Raffel et al. 2020, §2.2) are the batch-pipeline extension.
    """
    import re as _re

    lines = F.split(F.col(text_col), _re.escape(delimiter))

    def keep(line):
        wc = F.size(F.filter(F.split(F.trim(line), r"\s+"), lambda t: t != F.lit("")))
        p = wc >= min_words
        low = F.lower(line)
        for b in badwords:
            p = p & ~low.contains(b.lower())
        if require_terminal_punct:
            p = p & F.rtrim(line).rlike("[.!?\"']$")
        return p

    kept = F.filter(lines, keep)
    return df.select(
        F.col(id_col),
        F.array_join(kept, delimiter).alias("cleaned"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
    )


# ---------------------------------------------------------------------------
# C59: inverted index build (term -> doc_freq + postings)
# ---------------------------------------------------------------------------


def inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_freq: int = 1,
    max_postings: int | None = None,
) -> DataFrame:
    """Build a corpus inverted index: one row per term with its document
    frequency, total term frequency, and the posting list of document ids
    (ascending, distinct, rendered as a comma-joined string so the value
    is engine-portable for the oracle gate).

    Scale shape: explode to (term, doc, tf) with per-doc tf pre-aggregated
    BEFORE the term shuffle (map-side combine on the (doc) side costs
    nothing extra — the explode itself is per-partition), then ONE hash
    aggregation keyed by term. Posting lists for stop-like terms are the
    inherent output of the operator (like a pair-emitting join, the state
    IS the result); ``max_postings`` caps the rendered list at the N
    smallest doc ids for consumers that only need a prefix, and
    ``min_doc_freq`` floors rare terms the way the vocabulary joins
    (curation.py unigram/TF-IDF) bound theirs.
    """
    tf = (
        df.select(F.col(id_col).alias("__doc"), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term", "__doc")
        .agg(F.count("*").alias("__tf"))
    )
    agg = tf.groupBy("term").agg(
        F.count("*").alias("doc_freq"),
        F.sum("__tf").alias("total_tf"),
        F.array_sort(F.collect_list("__doc")).alias("__postings"),
    )
    postings = F.col("__postings")
    if max_postings is not None:
        postings = F.slice(postings, 1, max_postings)
    out = agg.select(
        "term",
        "doc_freq",
        "total_tf",
        F.array_join(F.transform(postings, lambda d: d.cast("string")), ",").alias(
            "postings"
        ),
    )
    if min_doc_freq > 1:
        out = out.filter(F.col("doc_freq") >= min_doc_freq)
    return out


# ---------------------------------------------------------------------------
# corpus statistics: Zipf rank-frequency fit, vocabulary coverage
# ---------------------------------------------------------------------------


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_n: int = 1000,
) -> DataFrame:
    """Least-squares fit of the Zipf rank-frequency law over the corpus's
    ``top_n`` most frequent terms: ln(freq) = intercept + slope * ln(rank)
    (a healthy natural-language corpus sits near slope = -1; a corpus
    polluted with boilerplate or machine junk drifts off it — a cheap
    corpus-health metric for a curation pipeline).

    Scale shape: one hash agg to term counts, then a distributed
    TakeOrderedAndProject keeps only ``top_n`` rows (deterministic (count
    desc, term asc) order) — the window that assigns ranks runs over those
    ``top_n`` rows only, bounded by the PARAMETER, never by the corpus.
    The regression itself is one tiny aggregate (covar/var over top_n
    points). Returns one row: (n_terms, slope, intercept), rounded to 6.
    """
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("term").asc())
        .limit(top_n)
    )
    from pyspark.sql.window import Window

    ranked = counts.withColumn(
        "r",
        F.row_number().over(
            Window.orderBy(F.col("c").desc(), F.col("term").asc())
        ),
    ).select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    slope = F.covar_pop("x", "y") / F.var_pop("x")
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round(F.avg("y") - slope * F.avg("x"), 6).alias("intercept"),
    )


def vocab_coverage(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer-vocabulary sizing curve point: if the vocabulary were the
    corpus's ``vocab_size`` most frequent terms (count desc, term asc
    deterministic cut), what fraction of corpus TOKENS is covered, and
    what is the out-of-vocabulary rate over distinct TYPES?

    One term-count hash agg; the vocabulary cut is a distributed top-k
    (``vocab_size`` rows cross the wire); coverage is a 2-row-ish
    aggregate join. Returns one row (total_tokens, total_types,
    vocab_tokens, coverage, oov_types)."""
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    top = counts.orderBy(F.col("c").desc(), F.col("term").asc()).limit(vocab_size)
    totals = counts.agg(
        F.sum("c").alias("total_tokens"), F.count(F.lit(1)).alias("total_types")
    )
    in_vocab = top.agg(
        F.sum("c").alias("vocab_tokens"), F.count(F.lit(1)).alias("vocab_types")
    )
    return (
        totals.crossJoin(F.broadcast(in_vocab))
        .select(
            "total_tokens",
            "total_types",
            "vocab_tokens",
            F.round(
                F.col("vocab_tokens").cast("double") / F.col("total_tokens"), 6
            ).alias("coverage"),
            (F.col("total_types") - F.col("vocab_types")).alias("oov_types"),
        )
    )


def char_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    spread: bool = True,
) -> DataFrame:
    """C72: per-document Shannon entropy (bits) of the character
    distribution — the cheap "is this text-shaped?" signal quality
    pipelines use next to the rule battery: boilerplate/template spam and
    single-char runs sit in the LOW-entropy tail, base64/binary-garbage
    and symbol soup in the HIGH tail (English prose lands ~3.5-4.5 bits).
    Entropy is computed with the sum-splitting identity

        H = log2(n) - (1/n) * sum_c[count_c * log2(count_c)]

    so the only float accumulation is one bounded per-doc sum over
    distinct characters (~dozens of terms; rounded to 6 places for the
    gate hash, the same convention as the bigram/DSIR scores).

    Scale shape: one (doc, char) pre-aggregation keyed by the doc — the
    shuffle carries (id, char, count) rows bounded by ~distinct-chars per
    doc, never raw text; skew is bounded by document length (the same
    contract as dup_ngram_coverage). No broadcast, no window.

    Returns (id, n_chars_counted, char_entropy). Empty/null text yields
    no row (no characters — no distribution), matching the oracle.
    """
    from kafka_connect_jsonata_spark.functions.dedup import spread_narrow_scan

    # round 14: the per-character explode is the CPU-dense stage and a
    # single local parquet file scans as ONE partition, so it serialized
    # on one task (0.63 s on curation_pipeline_v3's critical path at the
    # sf0.1 gate). Conditional spread, same contract as the sketch
    # kernels (no-op on an already-wide production scan); counts/sums are
    # partitioning-independent. ``spread=False`` for callers whose input
    # is a computed multi-stage frame rather than a narrow scan — the
    # inputFiles probe sees only the leaf files there, and the forced
    # repartition of the derived rows measured slower
    # (curation_pipeline_v2 A/B: +5-10%).
    base = df.select(F.col(id_col), F.col(text_col))
    if spread:
        base = spread_narrow_scan(base)
    chars = base.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), ""), lambda c: c != "")
        ).alias("__c"),
    )
    counts = chars.groupBy(id_col, "__c").agg(
        F.count(F.lit(1)).cast("long").alias("__n")
    )
    per = counts.groupBy(id_col).agg(
        F.sum("__n").alias("n_chars_counted"),
        F.sum(F.col("__n").cast("double") * F.log2("__n")).alias("__s"),
    )
    n = F.col("n_chars_counted").cast("double")
    return per.select(
        F.col(id_col),
        F.col("n_chars_counted"),
        F.round(F.log2(n) - F.col("__s") / n, 6).alias("char_entropy"),
    )
