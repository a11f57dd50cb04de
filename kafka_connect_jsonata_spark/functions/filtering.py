"""Bloom-filter pre-filtered semi-joins for very large fact tables.

The 100 TB decontamination / membership pattern: you want ``big WHERE key IN
(SELECT key FROM small)`` where ``small`` is too large to broadcast as rows
(10^8-10^9 keys) but ``big`` is orders of magnitude larger still. A plain
semi-join shuffles ALL of ``big`` on the key; a Bloom filter built from
``small`` costs a fixed ``num_bits/8`` bytes regardless of key count, ships
to every task once, and rejects the non-matching bulk of ``big`` map-side —
only the survivors (true matches + the ~fp_rate false-positive sliver) enter
the exact semi-join shuffle. The final join makes the operator EXACT: the
Bloom stage may only pass a superset, never drop a true match, so the
result equals the plain semi-join row-for-row (which is what the DuckDB
oracle checks).

Reference parity note: the reference engine (rayokota/kafka-connect-jsonata)
has no relational layer at all — this module is part of the SURVEY.md §2C
"relational lift" that extends the reference's per-record transform surface
to corpus-scale curation (cf. `JsonataTransformation.java:57-80` operating
on one record at a time).

Scale shape:
- build: one narrow scan of ``small``; each input partition emits ONE
  ``num_bits/8``-byte partial bitmap (mapInPandas, numpy ``bitwise_or``),
  partials are OR-combined in a second 32-way mapInPandas round before the
  driver sees them, so driver traffic is ``min(n_parts, 32) * num_bits/8``
  bytes even on a 10^5-partition scan — the two-level treeAggregate shape.
- probe: stateless Arrow-batched pandas_udf; the bitmap rides in the task
  closure (one copy per executor, like the IVF centroids), bit positions
  are double-hashed ``(h1 + i*h2) mod m`` from two xxhash64 columns
  computed JVM-side, so Python only does vectorized bit tests.
- no collect of keys, no row broadcast, no shuffle of the big side beyond
  the survivor set.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_semi_join", "bloom_fp_rate"]

_COMBINE_WIDTH = 32  # second-level OR fan-in before the driver


def bloom_fp_rate(n_keys: int, num_bits: int, num_hashes: int) -> float:
    """Expected false-positive rate for sizing: (1 - e^{-kn/m})^k."""
    if n_keys <= 0:
        return 0.0
    return (1.0 - math.exp(-num_hashes * n_keys / float(num_bits))) ** num_hashes


def _hash_cols(df: DataFrame, key_col: str) -> DataFrame:
    """Two independent 64-bit hashes of the key, computed JVM-side."""
    k = F.col(key_col)
    return df.select(
        F.xxhash64(k).alias("__h1"), F.xxhash64(k, F.lit(0x9E37)).alias("__h2")
    )


def _positions(h1: np.ndarray, h2: np.ndarray, num_bits: int, i: int) -> np.ndarray:
    """Double-hashing position i: (h1 + i*h2) mod m, branch-free non-negative."""
    return ((h1 + np.uint64(i) * h2) % np.uint64(num_bits)).astype(np.int64)


def bloom_build(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
) -> bytes:
    """Build a Bloom bitmap (``num_bits/8`` bytes) from a key column.

    Distributed build: per-partition numpy bitmaps OR-combined in a bounded
    second round, so the driver receives at most ``_COMBINE_WIDTH`` partial
    bitmaps no matter how many scan partitions feed it.
    """
    if num_bits % 8:
        raise ValueError("num_bits must be a multiple of 8")
    n_bytes = num_bits // 8

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(n_bytes, dtype=np.uint8)
        seen = False
        for b in batches:
            if not len(b):
                continue
            seen = True
            h1 = b["__h1"].to_numpy(dtype=np.int64).view(np.uint64)
            h2 = b["__h2"].to_numpy(dtype=np.int64).view(np.uint64)
            for i in range(num_hashes):
                pos = _positions(h1, h2, num_bits, i)
                np.bitwise_or.at(bm, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if seen:
            yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    def combine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(n_bytes, dtype=np.uint8)
        seen = False
        for b in batches:
            for raw in b["bitmap"]:
                seen = True
                np.bitwise_or(bm, np.frombuffer(raw, dtype=np.uint8), out=bm)
        if seen:
            yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    partials = _hash_cols(keys, key_col).mapInPandas(partial, "bitmap binary")
    combined = partials.coalesce(_COMBINE_WIDTH).mapInPandas(combine, "bitmap binary")
    out = np.zeros(n_bytes, dtype=np.uint8)
    for row in combined.collect():
        np.bitwise_or(out, np.frombuffer(row["bitmap"], dtype=np.uint8), out=out)
    return out.tobytes()


def bloom_maybe_member(key_col, bitmap: bytes, num_bits: int, num_hashes: int):
    """Vectorized membership-test Column: True = possibly present (superset),
    False = definitely absent. The bitmap rides in the UDF closure."""
    bm = np.frombuffer(bitmap, dtype=np.uint8)

    @F.pandas_udf("boolean")
    def member(h1: pd.Series, h2: pd.Series) -> pd.Series:
        a = h1.to_numpy(dtype=np.int64).view(np.uint64)
        b = h2.to_numpy(dtype=np.int64).view(np.uint64)
        ok = np.ones(len(a), dtype=bool)
        for i in range(num_hashes):
            pos = _positions(a, b, num_bits, i)
            ok &= (bm[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        return pd.Series(ok)

    # nondeterministic marker = "evaluate exactly once": Catalyst's filter
    # pushdown otherwise CLONES the deterministic udf to both sides of the
    # verify join, doubling the Python stage (the engine-wide rule — see
    # SCALE.md's envelope_reroute note; plan-pinned in tests/test_plans.py)
    member = member.asNondeterministic()

    k = F.col(key_col) if isinstance(key_col, str) else key_col
    return member(F.xxhash64(k), F.xxhash64(k, F.lit(0x9E37)))


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str | None = None,
    num_bits: int = 1 << 23,
    num_hashes: int = 5,
    verify: bool = True,
) -> DataFrame:
    """Exact semi-join of ``big`` against ``small``'s keys with a Bloom
    map-side pre-filter. Result == ``big.join(small_keys, 'left_semi')``.

    ``verify=False`` skips the exact join and returns the Bloom superset —
    useful when a bounded false-positive rate is acceptable (e.g. a first
    decontamination sweep) and the survivor shuffle must be avoided
    entirely; the default keeps the operator exact.
    """
    small_key = small_key or big_key
    bitmap = bloom_build(small, small_key, num_bits=num_bits, num_hashes=num_hashes)
    pre = big.filter(bloom_maybe_member(big_key, bitmap, num_bits, num_hashes))
    if not verify:
        return pre
    rhs = small.select(F.col(small_key).alias(big_key)).distinct()
    return pre.join(rhs, on=big_key, how="left_semi")
