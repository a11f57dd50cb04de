"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``kafka_connect_jsonata_spark``; this module
only wires the contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_connect_jsonata_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's README idiom (JSON-field filter + projection
    + tombstone-drop, reference README.md:13-19) as a JSONata expression
    compiled to native Spark Columns, over sf0.001 events."""
    return Q.jsonata_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(Q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(Q.ORACLES)
