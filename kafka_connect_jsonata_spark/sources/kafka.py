"""Kafka source/sink bridge: Spark's Kafka schema <-> the record envelope.

The reference runs inside Kafka Connect, which hands it one ConnectRecord at
a time (reference JsonataTransformation.java:88); the record's wire shape is
the 8-field envelope (reference :133-156). Spark's own Kafka source
(``spark.readStream.format("kafka")``) produces almost exactly that shape —
``key/value: binary, topic: string, partition: int, offset: long,
timestamp: timestamp, timestampType: int, headers: array<struct<key:string,
value:binary>>`` — so the bridge below is a pure column mapping, fully
testable without a broker (construct any DataFrame with that schema).

The connector wiring (`read_stream`/`write_stream`) needs the
spark-sql-kafka package and a reachable broker at runtime; the mapping
functions are the engine surface and run anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schema produced by Spark's Kafka source, for tests and documentation.
KAFKA_SOURCE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("topic", T.StringType()),
        T.StructField("partition", T.IntegerType()),
        T.StructField("offset", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("timestampType", T.IntegerType()),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("value", T.BinaryType()),
                    ]
                )
            ),
        ),
    ]
)


def kafka_to_envelope(df: DataFrame) -> DataFrame:
    """Kafka source columns -> dynamic-tier envelope (envelope.ENVELOPE_SCHEMA
    shape). Payloads are decoded as UTF-8 JSON strings (the schemaless
    Connect case, reference jsonNodeToObjectWithoutSchema :497-528);
    schemas travel as null — a schema'd deployment would populate them from
    a registry. Pure column ops; works batch or streaming."""
    return df.select(
        F.col("topic"),
        F.col("partition").alias("kafkaPartition"),
        F.lit(None).cast("string").alias("keySchema"),
        F.col("key").cast("string").alias("key"),
        F.lit(None).cast("string").alias("valueSchema"),
        F.col("value").cast("string").alias("value"),
        F.unix_millis(F.col("timestamp")).alias("timestamp"),
        F.transform(
            F.coalesce("headers", F.array().cast(KAFKA_SOURCE_SCHEMA["headers"].dataType)),
            lambda h: F.struct(
                h["key"].alias("key"),
                h["value"].cast("string").alias("value"),
                F.lit(None).cast("string").alias("schema"),
            ),
        ).alias("headers"),
    )


def envelope_to_kafka(df: DataFrame) -> DataFrame:
    """Envelope -> Kafka sink columns (topic/partition/key/value/headers).
    The inverse of `kafka_to_envelope` for the sink side: rows whose
    expression re-routed `topic` or re-keyed the record publish accordingly
    (reference decode :298-305)."""
    return df.select(
        F.col("topic"),
        F.col("kafkaPartition").cast("int").alias("partition"),
        F.col("key").cast("binary").alias("key"),
        F.col("value").cast("binary").alias("value"),
        F.transform(
            F.coalesce(
                "headers",
                F.array().cast(
                    "array<struct<key:string,value:string,schema:string>>"
                ),
            ),
            lambda h: F.struct(
                h["key"].alias("key"), h["value"].cast("binary").alias("value")
            ),
        ).alias("headers"),
    )


def apply_default_topic(out: DataFrame, default_topic: str | None) -> DataFrame:
    """Fill null topics by coalescing INTO the topic column. Never set the
    sink's `topic` option for this: Spark's Kafka sink gives the option
    precedence over the column for EVERY row, which would silently defeat
    A5 re-routing."""
    if default_topic is None:
        return out
    return out.withColumn("topic", F.coalesce(F.col("topic"), F.lit(default_topic)))


def read_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Streaming Kafka source as an envelope DataFrame. Requires the
    spark-sql-kafka package and a reachable broker (not present in this
    test environment — the mapping itself is covered by unit tests on
    static DataFrames)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .option("includeHeaders", "true")
        .load()
    )
    return kafka_to_envelope(raw)


def write_stream(
    envelope_df: DataFrame,
    bootstrap_servers: str,
    checkpoint_dir: str,
    default_topic: str | None = None,
):
    """Publish an envelope stream back to Kafka. The `topic` column routes
    each record (A5 re-route); `default_topic` covers null topics.

    `default_topic` is applied by coalescing INTO the topic column, never as
    the sink's `topic` option — Spark's Kafka sink gives that option
    precedence over the column for every row, which would silently defeat
    re-routing."""
    out = apply_default_topic(envelope_to_kafka(envelope_df), default_topic)
    writer = (
        out.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint_dir)
        .option("includeHeaders", "true")
    )
    return writer.start()
