from kafka_connect_jsonata_spark.streaming.transform import (
    compact_sketch_store,
    compact_sketch_table,
    maintain_sketch_store,
    session_agg,
    stream_dedup,
    stream_incremental_dedup,
    stream_static_join,
    streaming_transform,
    windowed_agg,
)

__all__ = [
    "compact_sketch_store",
    "compact_sketch_table",
    "maintain_sketch_store",
    "session_agg",
    "stream_dedup",
    "stream_incremental_dedup",
    "stream_static_join",
    "streaming_transform",
    "windowed_agg",
]
