"""Bloom-filter semi-join (functions/filtering.py, SURVEY §2C C43)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kafka_connect_jsonata_spark.functions import filtering
from kafka_connect_jsonata_spark.sources.readers import load_table


def _sides(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    return li, urgent


def _exact(li, urgent):
    rhs = urgent.withColumnRenamed("o_orderkey", "l_orderkey").distinct()
    return li.join(rhs, "l_orderkey", "left_semi")


def test_bloom_semi_join_matches_plain_semi_join(spark, sf_dir):
    li, urgent = _sides(spark, sf_dir)
    got = filtering.bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    want = _exact(li, urgent)
    assert got.count() == want.count()
    assert got.select("l_orderkey", "l_linenumber").subtract(
        want.select("l_orderkey", "l_linenumber")
    ).count() == 0


def test_bloom_exact_even_with_saturated_bitmap(spark, sf_dir):
    # 64-bit bitmap is guaranteed to saturate -> every row passes the
    # prefilter; the verify join must still produce the exact result.
    li, urgent = _sides(spark, sf_dir)
    got = filtering.bloom_semi_join(
        li, urgent, "l_orderkey", "o_orderkey", num_bits=64, num_hashes=2
    )
    assert got.count() == _exact(li, urgent).count()


def test_bloom_prefilter_is_superset_and_selective(spark, sf_dir):
    li, urgent = _sides(spark, sf_dir)
    pre = filtering.bloom_semi_join(
        li, urgent, "l_orderkey", "o_orderkey", verify=False
    )
    n_pre, n_exact, n_all = pre.count(), _exact(li, urgent).count(), li.count()
    assert n_exact <= n_pre  # never drops a true match
    assert n_pre < n_all  # actually rejects the non-matching bulk


def test_bloom_empty_small_side(spark, sf_dir):
    li, urgent = _sides(spark, sf_dir)
    empty = urgent.filter(F.lit(False))
    assert filtering.bloom_semi_join(li, empty, "l_orderkey", "o_orderkey").count() == 0


def test_bloom_string_keys(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    keys = docs.filter(F.col("lang") == "en").select("lang").distinct()
    got = filtering.bloom_semi_join(docs, keys, "lang")
    assert got.count() == docs.filter(F.col("lang") == "en").count()


def test_bloom_fp_rate_monotonic():
    hi = filtering.bloom_fp_rate(10_000, 1 << 12, 5)
    lo = filtering.bloom_fp_rate(10_000, 1 << 23, 5)
    assert 0.0 <= lo < hi <= 1.0
    assert filtering.bloom_fp_rate(0, 1 << 12, 5) == 0.0


def test_bloom_build_rejects_bad_bits(spark, sf_dir):
    _, urgent = _sides(spark, sf_dir)
    with pytest.raises(ValueError):
        filtering.bloom_build(urgent, "o_orderkey", num_bits=100)
