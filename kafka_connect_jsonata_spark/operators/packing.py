"""Sequence packing for training pipelines: concat-then-chunk assignment.

The dominant pretraining batching scheme concatenates the token streams of
all documents in a fixed order and slices the stream into budget-sized
training sequences. The operator computes, per document, where its tokens
land in that virtual stream: global start offset, owning pack id, and
whether the document straddles a pack boundary — everything a downstream
loader needs to materialize packed sequences without re-scanning.

Scale shape (the whole point): the naive formulation is a global-order
running sum — ``Window.orderBy(id)`` with no partition key, which moves
the ENTIRE corpus into one task. This implementation is the textbook
two-phase distributed prefix sum instead:

1. bucket documents by contiguous id range (any deterministic monotone
   bucketing works — the result depends only on document order, never on
   the bucketing),
2. one small aggregation computes per-bucket token totals; their running
   sum (bucket-count rows, driver-side) gives each bucket's global prefix
   offset,
3. one keyed shuffle per bucket computes the within-bucket running sum and
   adds the broadcast prefix offset.

Driver state and broadcast are O(buckets); the corpus crosses the wire
once, keyed by bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_connect_jsonata_spark.functions.text import tokens


def pack_token_budget(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int | None = None,
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Assign each document its (start_offset, pack_id, spans_boundary)
    under concat-then-chunk packing with ``budget`` tokens per pack.

    Documents are ordered by ``id_col``; ``pack_id`` is the pack holding
    the document's FIRST token; ``spans_boundary`` marks documents whose
    tokens cross into the next pack (loaders typically split or mask
    those). Empty documents get zero-width placement (never span).

    ``n_tokens_col``: use a precomputed per-doc token count instead of
    whitespace-tokenizing ``text_col`` — tokenizer-aware packing (e.g.
    feed ``bpe.encode_documents``'s ``n_bpe_tokens`` so packs respect the
    REAL sequence lengths the model will see, not word counts).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    spark = df.sparkSession
    id_type = df.schema[id_col].dataType
    if id_type.simpleString() not in ("tinyint", "smallint", "int", "bigint"):
        raise TypeError(
            f"pack_token_budget orders by an integral id column; got {id_col}: "
            f"{id_type.simpleString()} (map non-integral ids to a dense rank first)"
        )
    count_expr = (
        F.coalesce(F.col(n_tokens_col), F.lit(0))
        if n_tokens_col is not None
        # null text counts as zero tokens (size(NULL) is NULL, which would
        # poison the prefix sums)
        else F.coalesce(F.size(tokens(F.col(text_col))), F.lit(0))
    )
    toks = df.select(
        F.col(id_col).alias("id"),
        count_expr.cast("long").alias("n_tokens"),
    )
    # (id, n_tokens) is referenced THREE times (bounds probe, bucket-total
    # probe, final placement) — without a checkpoint the corpus is
    # tokenized once per reference. Lazy; the bounds collect right below
    # materializes it (round 14, guide §1.2/§5). Narrow rows: two longs.
    from kafka_connect_jsonata_spark.functions.dedup import barrier

    toks = barrier(toks, eager=False)
    bounds = toks.agg(F.min("id").alias("lo"), F.max("id").alias("hi")).collect()[0]
    if bounds["lo"] is None:
        return spark.createDataFrame(
            [],
            f"{id_col} {id_type.simpleString()}, n_tokens long, start_offset long, "
            "pack_id long, spans_boundary boolean",
        )
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    nb = n_buckets or spark.sparkContext.defaultParallelism
    span = max(hi - lo + 1, 1)
    # contiguous-id-range bucketing; double math is fine because ANY
    # deterministic monotone bucketing yields identical results
    bucket = F.least(
        F.lit(nb - 1),
        F.floor((F.col("id") - F.lit(lo)).cast("double") * nb / span),
    ).cast("int")
    bt = toks.withColumn("__b", bucket)
    totals = (
        bt.groupBy("__b")
        .agg(
            F.sum("n_tokens").alias("__t"),
            # id uniqueness is the contract's ordering key (duplicate ids
            # would be RANGE-frame peers sharing one running sum). Equal
            # ids always hash to the SAME bucket, so a per-bucket
            # count vs distinct-count comparison detects every duplicate
            # inside the aggregation this pass already runs — no extra job.
            F.count("*").alias("__n"),
            F.count_distinct("id").alias("__nd"),
        )
        .orderBy("__b")
        .collect()
    )
    dup_buckets = [r["__b"] for r in totals if r["__n"] != r["__nd"]]
    if dup_buckets:
        raise ValueError(
            f"pack_token_budget requires unique {id_col} values (the packing "
            f"order); duplicates found in bucket(s) {dup_buckets[:5]}"
        )
    prefix: dict[int, int] = {}
    acc = 0
    for r in totals:
        prefix[r["__b"]] = acc
        acc += int(r["__t"])
    pre_df = spark.createDataFrame(
        [(b, p) for b, p in prefix.items()], "__b int, __prefix long"
    )
    # explicit ROWS frame: the default RANGE frame makes equal-id rows
    # peers with a combined running sum (round-4 review) — uniqueness is
    # checked above, but the frame should never depend on it
    w = (
        Window.partitionBy("__b")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = (
        bt.join(F.broadcast(pre_df), "__b")
        .withColumn("__end", F.sum("n_tokens").over(w) + F.col("__prefix"))
        .withColumn("start_offset", F.col("__end") - F.col("n_tokens"))
    )
    # integer division, not floor(double): a 100 TB corpus holds ~1e14
    # tokens and double-rounded offsets would misplace packs near 2^53
    pack = F.expr(f"start_offset div {budget}")
    last_pack = F.expr(f"(__end - 1) div {budget}")
    return placed.select(
        F.col("id").alias(id_col),
        "n_tokens",
        "start_offset",
        pack.cast("long").alias("pack_id"),
        ((F.col("n_tokens") > 0) & (pack != last_pack)).alias("spans_boundary"),
    )
