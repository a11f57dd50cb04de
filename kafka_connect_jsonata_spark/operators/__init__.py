from kafka_connect_jsonata_spark.operators import relational

__all__ = ["relational"]
