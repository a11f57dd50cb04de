"""Batch sinks for the engine.

The reference's only sink is handing the transformed record back to the
Connect framework (reference JsonataTransformation.java:294-359 rebuilds a
SourceRecord/SinkRecord). At 100 TB the equivalent durable sinks are
columnar files with layout that downstream reads can exploit:

- ``write_partitioned`` — hive-style directory partitioning: equality /
  range predicates on the partition columns become PARTITION PRUNING at
  read time (the scan never opens non-matching directories).
- ``write_bucketed``   — hash-bucketed (and optionally sorted) managed
  table: joins and aggregations on the bucket keys read co-located data
  and skip the shuffle entirely (Exchange disappears from the plan when
  both sides bucket on the join key with the same bucket count).
- ``write_envelope``   — the envelope stream's durable form, partitioned
  by topic (the natural re-route target, §2A A5): per-topic consumers
  prune to their own directories.

All writers coalesce/repartition toward a target in-file row-group size
first: at scale the classic failure mode is thousands of tiny files per
partition (one per task), which destroys downstream scan throughput and
NameNode/metastore health.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | tuple[str, ...] = (),
    mode: str = "overwrite",
    fmt: str = "parquet",
    files_per_partition: int = 1,
) -> None:
    """Write hive-partitioned files, pre-shuffled so each partition
    directory receives ``files_per_partition`` files instead of one file
    per upstream task.

    The repartition ON THE PARTITION COLUMNS is the important part: without
    it, every one of N upstream tasks writes a sliver into every partition
    directory (N*P tiny files); with it, rows for one directory land on a
    bounded set of tasks. Skewed partition values can be spread by raising
    ``files_per_partition`` (adds a salt to the shuffle key) — note AQE
    coalesces the salted shuffle back together when the data is small,
    which is the right call; the spread materializes exactly when
    partitions are big enough to need it.
    """
    out = df
    if partition_by:
        keys = [F.col(c) for c in partition_by]
        if files_per_partition > 1:
            keys.append(F.spark_partition_id() % files_per_partition)
        out = df.repartition(*keys)
    writer = out.write.mode(mode).format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str] | tuple[str, ...],
    num_buckets: int = 32,
    sort_by: list[str] | tuple[str, ...] = (),
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write a hash-bucketed managed table (``saveAsTable`` — bucketing
    metadata lives in the catalog, so it requires a table, not a bare
    path). Two tables bucketed on the same keys with the same bucket count
    join WITHOUT a shuffle; adding ``sort_by`` also removes the sort from
    sort-merge joins."""
    writer = df.write.mode(mode).format(fmt).bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.saveAsTable(table)


def write_envelope(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Durable envelope sink, partitioned by ``topic`` — the batch analog
    of producing to Kafka after the transform (reference
    JsonataTransformation.java:330-358): per-topic consumers prune to
    their own directories, and a re-routed record (A5) lands in its new
    topic's directory automatically."""
    write_partitioned(df, path, partition_by=["topic"], mode=mode, fmt=fmt)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_by: list[str] | tuple[str, ...],
    n_files: int | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Range-partition + sort-within-partitions before writing: each output
    file covers a DISJOINT range of ``sort_by``, so its parquet footer
    min/max stats let range/equality predicates skip whole files and
    row-groups at read time — data skipping without an index, the cheap
    80% of Z-ordering for a single sort dimension.

    ``repartitionByRange`` samples the keys to build balanced range bounds
    (handles value skew without a manual histogram)."""
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    out = df.repartitionByRange(n, *[F.col(c) for c in sort_by]).sortWithinPartitions(
        *[F.col(c) for c in sort_by]
    )
    out.write.mode(mode).format(fmt).save(path)
