"""Batch sink writers: partitioned layout must prune at read time, and
bucketed layout must remove the join shuffle (SURVEY.md §2C C1/C5 at the
storage layer — the 100 TB read-path contracts, asserted on the plan)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_connect_jsonata_spark.sources.writers import (
    write_range_sorted,
    write_bucketed,
    write_envelope,
    write_partitioned,
)


def test_partitioned_write_prunes_at_read(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("shard"),
    )
    path = str(tmp_path / "part")
    write_partitioned(df, path, partition_by=["shard"])

    # one directory per value, bounded file count
    shards = sorted(d for d in os.listdir(path) if d.startswith("shard="))
    assert shards == ["shard=0", "shard=1", "shard=2", "shard=3"]
    files = [f for f in os.listdir(os.path.join(path, "shard=0")) if f.endswith(".parquet")]
    assert len(files) == 1

    back = spark.read.parquet(path).filter(F.col("shard") == "2")
    assert back.count() == 250
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter reached the scan: only the matching directory is read
    assert "PartitionFilters" in plan and "shard" in plan


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    left = spark.range(500).select(F.col("id").alias("k"), F.lit("l").alias("l"))
    right = spark.range(500).select(F.col("id").alias("k"), F.lit("r").alias("r"))
    write_bucketed(left, "bkt_left", bucket_by=["k"], num_buckets=8, sort_by=["k"])
    write_bucketed(right, "bkt_right", bucket_by=["k"], num_buckets=8, sort_by=["k"])
    try:
        a = spark.table("bkt_left")
        b = spark.table("bkt_right")
        # broadcast would hide the point; force a non-broadcast equi-join
        joined = a.hint("merge").join(b, "k")
        assert joined.count() == 500
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # co-located: bucketing replaced the shuffle
        assert "SelectedBucketsCount" in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_envelope_sink_partitions_by_topic(spark, tmp_path):
    env = spark.createDataFrame(
        [("a", 0, "k1", "v1", 1), ("b", 0, "k2", "v2", 2), ("a", 1, "k3", "v3", 3)],
        "topic string, kafkaPartition int, key string, value string, timestamp long",
    )
    path = str(tmp_path / "env")
    write_envelope(env, path)
    dirs = sorted(d for d in os.listdir(path) if d.startswith("topic="))
    assert dirs == ["topic=a", "topic=b"]
    back = spark.read.parquet(path)
    assert back.filter(F.col("topic") == "a").count() == 2


def test_range_sorted_write_has_disjoint_file_ranges(spark, tmp_path):
    """write_range_sorted's contract, checked against the parquet footers:
    per-file min/max ranges of the sort key must not overlap (that
    disjointness is exactly what makes predicate-driven file skipping
    effective at read time)."""
    import pyarrow.parquet as pq

    df = spark.range(100_000).select(
        (F.col("id") * 7919 % 100_000).alias("k"),  # scrambled input order
        F.col("id").alias("v"),
    )
    path = str(tmp_path / "rs")
    write_range_sorted(df, path, sort_by=["k"], n_files=8)

    ranges = []
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(0).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    assert len(ranges) == 8
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint: file skipping can work

    back = spark.read.parquet(path).filter(F.col("k") < 1000)
    assert back.count() == 1000


def test_partitioned_write_spreads_files_when_asked(spark, tmp_path):
    """files_per_partition > 1 salts the pre-write shuffle so a skewed
    partition value spreads over multiple files (and tasks)."""
    df = spark.range(20_000).select(
        F.lit("hot").alias("shard"), F.col("id").alias("v")
    )
    path = str(tmp_path / "salted")
    # at this data size AQE would (correctly) coalesce the salted shuffle
    # back to one partition; disable coalescing to observe the mechanism
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        write_partitioned(df, path, partition_by=["shard"], files_per_partition=4)
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    files = [
        f for f in os.listdir(os.path.join(path, "shard=hot")) if f.endswith(".parquet")
    ]
    assert 2 <= len(files) <= 8
    assert spark.read.parquet(path).count() == 20_000
