from kafka_connect_jsonata_spark.functions import (
    dedup,
    filtering,
    similarity,
    text,
)

__all__ = ["dedup", "filtering", "similarity", "text"]
