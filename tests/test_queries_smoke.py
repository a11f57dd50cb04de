"""Smoke: every registered query runs at sf0.001 and returns a stable schema.
Full value-level correctness vs DuckDB is exercised by tools/check_oracle.py
(and the driver's gate at sf0.01)."""

from __future__ import annotations

import pytest

from kafka_connect_jsonata_spark import queries as Q


@pytest.mark.parametrize("name", sorted(Q.QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = Q.QUERIES[name](spark, sf_dir)
    assert df.columns  # non-empty schema
    assert df.count() >= 0


ROWS_ONLY = {
    # sketch-based operators: no exact SQL oracle exists by construction
    "approx_distinct_stats",
    "minhash_lsh_dups",
    "simhash_docs",
    # rng-generated payload content: no SQL analog; exact values pinned in
    # tests/test_multimodal.py
    "multimodal_image_stats",
    "multimodal_audio_features",
}


def test_every_query_has_oracle_or_is_declared():
    missing = set(Q.QUERIES) - set(Q.ORACLES) - ROWS_ONLY
    assert not missing, f"queries without oracle (should be deliberate): {missing}"
