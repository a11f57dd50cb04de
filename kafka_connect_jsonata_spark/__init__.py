"""spark-jsonata: a PySpark-native analytics engine with the capabilities of
rayokota/kafka-connect-jsonata (reference at /root/reference, read-only).

The reference is a Kafka Connect Single Message Transform whose whole query
capability is the JSONata expression language applied to a record envelope
(topic, partition, key+schema, value+schema, timestamp, headers) — see
reference JsonataTransformation.java:88-120. This package re-expresses that
capability Spark-first:

- ``jsonata``      — JSONata tokenizer/parser, tree interpreter (tier 2) and
                     Column compiler (tier 1).
- ``envelope``     — the record-envelope data model as a typed StructType.
- ``transform``    — the SMT-equivalent ``transform(df, expr)`` API with
                     tombstone-drop semantics.
- ``operators``    — relational lift: joins, aggregations, windows, set ops.
- ``functions``    — scale-out extensions: text analysis, dedup, similarity.
- ``sources``      — batch/stream readers for the testdata star schema.
- ``streaming``    — Structured Streaming transforms.
"""

from kafka_connect_jsonata_spark.engine import EngineConfig, get_spark

__version__ = "0.1.0"

__all__ = ["EngineConfig", "get_spark", "__version__"]
