"""Kafka source/sink bridge (C2) + header operators (A7): pure column
mappings tested on static DataFrames with the exact Kafka source schema —
no broker needed."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from kafka_connect_jsonata_spark.sources.kafka import (
    KAFKA_SOURCE_SCHEMA,
    envelope_to_kafka,
    kafka_to_envelope,
)
from kafka_connect_jsonata_spark.transform import transform_envelope

TS = datetime(2024, 5, 1, 12, 0, 0, tzinfo=timezone.utc)


def _kafka_df(spark):
    rows = [
        (
            b"k1",
            b'{"amount": 7, "flag": true}',
            "orders",
            3,
            100,
            TS,
            0,
            [("trace", b"abc"), ("trace", b"def")],  # duplicate keys allowed
        ),
        (b"k2", b'{"amount": 9}', "orders", 1, 101, TS, 0, None),
    ]
    return spark.createDataFrame(rows, KAFKA_SOURCE_SCHEMA)


def test_kafka_to_envelope_mapping(spark):
    env = kafka_to_envelope(_kafka_df(spark))
    rows = {r["key"]: r for r in env.collect()}
    r = rows["k1"]
    assert r["topic"] == "orders" and r["kafkaPartition"] == 3
    assert r["timestamp"] == int(TS.timestamp() * 1000)
    assert r["value"] == '{"amount": 7, "flag": true}'
    # ordered headers, duplicate keys preserved, binary decoded
    assert [(h["key"], h["value"]) for h in r["headers"]] == [
        ("trace", "abc"),
        ("trace", "def"),
    ]
    assert rows["k2"]["headers"] == []


def test_envelope_roundtrip_to_kafka_sink(spark):
    env = kafka_to_envelope(_kafka_df(spark))
    out = envelope_to_kafka(env)
    assert out.columns == ["topic", "partition", "key", "value", "headers"]
    r = {bytes(x["key"]): x for x in out.collect()}[b"k1"]
    assert bytes(r["value"]) == b'{"amount": 7, "flag": true}'
    assert [(h["key"], bytes(h["value"])) for h in r["headers"]] == [
        ("trace", b"abc"),
        ("trace", b"def"),
    ]


def test_jsonata_transform_on_kafka_envelope_with_header_ops(spark):
    """A7: read + append headers and A5 re-route, end to end over the
    Kafka-shaped input through the dynamic-tier JSONata transform."""
    env = kafka_to_envelope(_kafka_df(spark))
    out = transform_envelope(
        env,
        "$merge([$, {"
        "'topic': 'audited', "
        "'headers': $append(headers, [{'key': 'seen', 'value': 'yes', 'schema': null}])"
        "}])",
    )
    rows = out.collect()
    assert all(r["topic"] == "audited" for r in rows)
    k1 = [r for r in rows if r["key"] == '"k1"' or r["key"] == "k1"][0]
    hs = [(h["key"], h["value"]) for h in k1["headers"]]
    assert hs[-1] == ("seen", "yes") and len(hs) == 3


def test_header_filter_and_rewrite(spark):
    """A7 via native columns: drop a header key, add a routing header."""
    env = kafka_to_envelope(_kafka_df(spark))
    out = env.withColumn(
        "headers",
        F.array_append(
            F.filter("headers", lambda h: h["key"] != "trace"),
            F.struct(
                F.lit("route").alias("key"),
                F.col("topic").alias("value"),
                F.lit(None).cast("string").alias("schema"),
            ),
        ),
    )
    r = {x["key"]: x for x in out.collect()}["k1"]
    assert [(h["key"], h["value"]) for h in r["headers"]] == [("route", "orders")]


def test_apply_default_topic_preserves_rerouting(spark):
    """Regression (round-1 advice): default_topic must only fill NULL
    topics, never override re-routed ones (the sink 'topic' option would
    override every row)."""
    from kafka_connect_jsonata_spark.sources.kafka import apply_default_topic

    df = spark.createDataFrame(
        [("rerouted", b"k"), (None, b"k2")], "topic string, key binary"
    )
    out = apply_default_topic(df, "fallback")
    got = sorted(r["topic"] for r in out.collect())
    assert got == ["fallback", "rerouted"]
    # no default: passthrough unchanged
    assert apply_default_topic(df, None) is df
