from kafka_connect_jsonata_spark.functions import dedup, similarity, text

__all__ = ["dedup", "similarity", "text"]
