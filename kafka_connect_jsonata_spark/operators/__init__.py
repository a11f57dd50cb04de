from kafka_connect_jsonata_spark.operators import packing, relational, sampling

__all__ = ["packing", "relational", "sampling"]
