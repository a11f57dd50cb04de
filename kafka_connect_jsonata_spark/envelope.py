"""The record-envelope data model (SURVEY.md §1).

The reference serializes each ConnectRecord to a JSON object with up to 8
top-level fields (reference JsonataTransformation.java:133-156): topic,
kafkaPartition, keySchema, key, valueSchema, value, timestamp, headers.
Here that envelope is a typed DataFrame schema. Two tiers:

- *dynamic tier*: key/value/schemas carried as JSON strings (fully general,
  schema can differ per record and is itself data — matches the reference's
  semantics exactly, including schema rewrites);
- *typed tier*: key/value as typed nested columns when the whole DataFrame
  shares one schema (the common Connect case) — JSONata then compiles to
  native Columns.

Also implements the Connect type-system bridge (reference schemaToJsonNode
:158-191 / jsonNodeToSchema :361-408): Connect Schema JSON <-> Spark
DataType, including the logical types Decimal/Date/Time/Timestamp
(reference :530-649).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Dynamic-tier envelope: schemas and payloads as JSON strings.
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("kafkaPartition", T.IntegerType()),
        T.StructField("keySchema", T.StringType()),
        T.StructField("key", T.StringType()),
        T.StructField("valueSchema", T.StringType()),
        T.StructField("value", T.StringType()),
        T.StructField("timestamp", T.LongType()),
        T.StructField(
            "headers",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("value", T.StringType()),
                        T.StructField("schema", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

# ---------------------------------------------------------------------------
# Connect Schema JSON <-> Spark DataType bridge
# (reference type tables, JsonataTransformation.java:201-253 / :441-495)
# ---------------------------------------------------------------------------

_PRIMITIVE_TO_SPARK = {
    "INT8": T.ByteType(),
    "INT16": T.ShortType(),
    "INT32": T.IntegerType(),
    "INT64": T.LongType(),
    "FLOAT32": T.FloatType(),
    "FLOAT64": T.DoubleType(),
    "BOOLEAN": T.BooleanType(),
    "STRING": T.StringType(),
    "BYTES": T.BinaryType(),
}

_SPARK_TO_PRIMITIVE = {
    T.ByteType: "INT8",
    T.ShortType: "INT16",
    T.IntegerType: "INT32",
    T.LongType: "INT64",
    T.FloatType: "FLOAT32",
    T.DoubleType: "FLOAT64",
    T.BooleanType: "BOOLEAN",
    T.StringType: "STRING",
    T.BinaryType: "BYTES",
}

# Connect logical type names (reference convertToDecimal/Date/Time/Timestamp,
# JsonataTransformation.java:530-649)
LOGICAL_DECIMAL = "org.apache.kafka.connect.data.Decimal"
LOGICAL_DATE = "org.apache.kafka.connect.data.Date"
LOGICAL_TIME = "org.apache.kafka.connect.data.Time"
LOGICAL_TIMESTAMP = "org.apache.kafka.connect.data.Timestamp"


def connect_schema_to_spark(schema: dict | None) -> T.DataType:
    """Connect Schema JSON tree -> Spark DataType."""
    if schema is None:
        return T.StringType()  # schemaless payloads stay JSON strings
    name = schema.get("name")
    stype = schema.get("type")
    if name == LOGICAL_DECIMAL:
        scale = int((schema.get("parameters") or {}).get("scale", 0))
        return T.DecimalType(38, scale)
    if name == LOGICAL_DATE:
        return T.DateType()
    if name == LOGICAL_TIME:
        # ms-of-day has no exact Spark type; carried as INT64 + metadata tag
        return T.LongType()
    if name == LOGICAL_TIMESTAMP:
        return T.TimestampType()
    if stype in _PRIMITIVE_TO_SPARK:
        return _PRIMITIVE_TO_SPARK[stype]
    if stype == "ARRAY":
        return T.ArrayType(connect_schema_to_spark(schema.get("valueSchema")))
    if stype == "MAP":
        # Connect map keys are coerced to strings on encode (reference :213)
        return T.MapType(T.StringType(), connect_schema_to_spark(schema.get("valueSchema")))
    if stype == "STRUCT":
        fields = []
        for f in schema.get("fields", []):
            fdt = connect_schema_to_spark(f.get("schema"))
            optional = bool((f.get("schema") or {}).get("optional", True))
            fields.append(T.StructField(f["name"], fdt, optional))
        return T.StructType(fields)
    raise ValueError(f"unsupported Connect schema type {stype!r}")


def spark_type_to_connect_schema(dt: T.DataType, optional: bool = True) -> dict:
    """Spark DataType -> Connect Schema JSON tree (inverse bridge)."""
    out: dict = {"optional": optional}
    if isinstance(dt, T.DecimalType):
        out.update(
            {"type": "BYTES", "name": LOGICAL_DECIMAL,
             "version": 1, "parameters": {"scale": str(dt.scale)}}
        )
    elif isinstance(dt, T.DateType):
        out.update({"type": "INT32", "name": LOGICAL_DATE, "version": 1})
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # Connect's Timestamp logical type is epoch-millis with no zone
        # concept; both Spark timestamp flavors map onto it (NTZ sources —
        # e.g. parquet TIMESTAMP(NANOS) under Spark 4.1 — carry UTC wall
        # clocks in this engine, see sources/readers.py)
        out.update({"type": "INT64", "name": LOGICAL_TIMESTAMP, "version": 1})
    elif isinstance(dt, T.ArrayType):
        out.update({"type": "ARRAY", "valueSchema": spark_type_to_connect_schema(dt.elementType)})
    elif isinstance(dt, T.MapType):
        out.update(
            {"type": "MAP",
             "keySchema": {"type": "STRING", "optional": False},
             "valueSchema": spark_type_to_connect_schema(dt.valueType)}
        )
    elif isinstance(dt, T.StructType):
        out.update(
            {"type": "STRUCT",
             "fields": [
                 {"name": f.name, "index": i,
                  "schema": spark_type_to_connect_schema(f.dataType, f.nullable)}
                 for i, f in enumerate(dt.fields)
             ]}
        )
    else:
        for cls, prim in _SPARK_TO_PRIMITIVE.items():
            if isinstance(dt, cls):
                out["type"] = prim
                break
        else:
            raise ValueError(f"unsupported Spark type {dt}")
    return out


# ---------------------------------------------------------------------------
# Envelope builders
# ---------------------------------------------------------------------------

def wrap_as_envelope(
    df: DataFrame,
    topic: str,
    key_col: str | None = None,
    timestamp_col: str | None = None,
) -> DataFrame:
    """Typed tier: wrap an arbitrary DataFrame as envelope rows whose
    ``value`` is a typed struct of all columns. The value schema is the
    DataFrame schema — one schema for the batch, the common Connect case."""
    value = F.struct(*[F.col(c) for c in df.columns])
    if timestamp_col:
        src = F.col(timestamp_col)
        if isinstance(df.schema[timestamp_col].dataType, T.TimestampNTZType):
            # NTZ carries a UTC wall clock in this engine; a bare
            # cast('timestamp') would reinterpret it through the session
            # zone and shift the envelope epoch-millis under non-UTC
            # sessions (round-3 advice). Same DST-safe epoch arithmetic
            # as sources/readers._ntz_to_instant.
            from kafka_connect_jsonata_spark.sources.readers import _ntz_to_instant

            src = _ntz_to_instant(src)
        ts = src.cast("timestamp").cast("double") * 1000
    else:
        ts = F.lit(None).cast("double")
    return df.select(
        F.lit(topic).alias("topic"),
        F.spark_partition_id().alias("kafkaPartition"),
        (F.col(key_col).cast("string") if key_col else F.lit(None).cast("string")).alias("key"),
        value.alias("value"),
        ts.cast("long").alias("timestamp"),
        F.array().cast(
            "array<struct<key:string,value:string,schema:string>>"
        ).alias("headers"),
    )


def wrap_as_dynamic_envelope(
    df: DataFrame,
    topic: str,
    key_col: str | None = None,
    timestamp_col: str | None = None,
) -> DataFrame:
    """Dynamic tier: value serialized to a JSON string, valueSchema carried
    as Connect-schema JSON (schema-as-data, rewritable by expressions)."""
    schema_json = json.dumps(
        spark_type_to_connect_schema(
            T.StructType([f for f in df.schema.fields])
        )
    )
    typed = wrap_as_envelope(df, topic, key_col, timestamp_col)
    return typed.select(
        "topic",
        "kafkaPartition",
        F.lit(None).cast("string").alias("keySchema"),
        "key",
        F.lit(schema_json).alias("valueSchema"),
        F.to_json("value").alias("value"),
        "timestamp",
        "headers",
    )


def wrap_as_variant_envelope(
    df: DataFrame,
    topic: str,
    key_col: str | None = None,
    timestamp_col: str | None = None,
) -> DataFrame:
    """Dynamic tier on Spark 4 ``VariantType``: the value travels as a
    VARIANT column (binary semi-structured encoding) instead of a JSON
    string. Field access stays JVM-side (``variant_get``) without a full
    parse, and variant columns support shredded parquet storage in Spark 4
    — the scale path for schema-per-record payloads the typed tier cannot
    hold. ``to_json(value)`` bridges to the interpreter tier when full
    JSONata generality (schema-as-data rewrites) is needed; the
    Connect-schema JSON rides alongside exactly as in the string-typed
    dynamic envelope."""
    dyn = wrap_as_dynamic_envelope(df, topic, key_col, timestamp_col)
    return dyn.withColumn("value", F.parse_json("value"))
