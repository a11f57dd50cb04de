from kafka_connect_jsonata_spark.streaming.transform import (
    session_agg,
    stream_dedup,
    stream_static_join,
    streaming_transform,
    windowed_agg,
)

__all__ = [
    "session_agg",
    "stream_dedup",
    "stream_static_join",
    "streaming_transform",
    "windowed_agg",
]
