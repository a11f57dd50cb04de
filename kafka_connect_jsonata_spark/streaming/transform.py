"""Structured Streaming operators (SURVEY.md §2C C19-C23).

The reference transform is stateless — ``apply()`` touches exactly one
record and ``close()`` is empty (reference JsonataTransformation.java:88-124)
— so the whole JSONata transform surface lifts to streaming unchanged: the
same Column plan (tier 1) or pandas-UDF plan (tier 2) runs under the
micro-batch runner in append mode. The operators below add what the
reference cannot express: event-time windows, watermarked late-data policy,
session windows, streaming dedup, and stream-static joins.

Scale notes: all aggregations here are keyed by (window, key) so state is
partitioned across executors; watermarks bound state size; stream-static
joins broadcast the static side when small.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_connect_jsonata_spark.engine import DEFAULT_CONFIG, EngineConfig
from kafka_connect_jsonata_spark.transform import transform


def streaming_transform(
    stream_df: DataFrame,
    expr: str,
    config: EngineConfig = DEFAULT_CONFIG,
    output_schema=None,
) -> DataFrame:
    """A1 on a streaming DataFrame: identical plan to the batch transform —
    Structured Streaming runs it per micro-batch (stateless, append mode)."""
    return transform(stream_df, expr, config=config, output_schema=output_schema)


def windowed_agg(
    stream_df: DataFrame,
    ts_col: str,
    window_duration: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """C19+C21: tumbling/sliding event-time window aggregation with a
    watermark bounding state."""
    wm = stream_df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window_duration, slide) if slide else F.window(
        F.col(ts_col), window_duration
    )
    return wm.groupBy(win.alias("window"), *keys).agg(*aggs)


def session_agg(
    stream_df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: Sequence[Column],
    keys: Sequence[str] = (),
    watermark: str = "10 minutes",
) -> DataFrame:
    """C20: session windows (dynamic gap-based)."""
    wm = stream_df.withWatermark(ts_col, watermark)
    return wm.groupBy(F.session_window(F.col(ts_col), gap).alias("session"), *keys).agg(*aggs)


def stream_dedup(
    stream_df: DataFrame,
    keys: Sequence[str],
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """C15 streaming: exact dedup by key. With a watermark the state is
    bounded (dropDuplicatesWithinWatermark); without, state grows unbounded
    (only for tests/small keys)."""
    if ts_col is not None:
        return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(list(keys))
    return stream_df.dropDuplicates(list(keys))


def stream_static_join(
    stream_df: DataFrame,
    static_df: DataFrame,
    on: Sequence[str] | Column,
    how: str = "inner",
    broadcast_static: bool = True,
) -> DataFrame:
    """C23: stream-static join; the static dimension broadcasts so the
    stream never shuffles."""
    s = F.broadcast(static_df) if broadcast_static else static_df
    return stream_df.join(s, on, how)


def run_to_memory(stream_df: DataFrame, name: str, output_mode: str = "append"):
    """Test helper: drive a streaming query to completion synchronously
    against a memory sink; returns the query handle (stopped)."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q
