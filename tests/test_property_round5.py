"""Hypothesis properties for the round-5 operators: pure-Python halves
(BPE segmentation, Bloom positions, classifier hashing, span-removal
reference) checked over generated inputs — no Spark session needed, so
these run hundreds of examples cheaply; the distributed halves are pinned
by the oracle gates and their dedicated tests."""

from __future__ import annotations

import hashlib
import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connect_jsonata_spark.functions import bpe
from kafka_connect_jsonata_spark.functions.classifier import (
    HASH_DIM,
    seeded_weights_int,
)
from kafka_connect_jsonata_spark.functions.filtering import (
    _positions,
    bloom_fp_rate,
)

words = st.text(alphabet="abcd", min_size=1, max_size=8)


@given(st.lists(st.tuples(words, st.integers(1, 20)), min_size=1, max_size=12))
@settings(max_examples=100, deadline=None)
def test_bpe_segmentation_roundtrips_any_histogram(hist):
    """Whatever merges training produces, applying them must losslessly
    reconstruct every trained word on decode."""
    # train on a local histogram via the same pure helpers the distributed
    # path feeds (train_bpe only uses the histogram)
    h = {}
    for w, n in hist:
        sym = tuple(w) + ("</w>",)
        h[sym] = h.get(sym, 0) + n
    # emulate a few merges with the module's own pair-count helper
    merges = []
    cur = dict(h)
    for _ in range(10):
        pc = bpe._pair_counts(cur)
        if not pc or max(pc.values()) < 2:
            break
        top = max(pc.values())
        pair = min(p for p, c in pc.items() if c == top)
        merges.append(pair)
        fused = pair[0] + pair[1]
        nxt = {}
        for sym, n in cur.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
                    out.append(fused)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + n
        cur = nxt
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in hist:
        segs = bpe.segment_word(w, ranks)
        assert "".join(segs).replace("</w>", "") == w  # lossless
        assert segs[-1].endswith("</w>")


@given(st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=64))
@settings(max_examples=100, deadline=None)
def test_bloom_positions_in_range_and_deterministic(hs):
    h1 = np.array(hs, dtype=np.int64).view(np.uint64)
    h2 = (h1 ^ np.uint64(0x9E3779B97F4A7C15))
    for i in range(5):
        pos = _positions(h1, h2, 1 << 20, i)
        assert ((pos >= 0) & (pos < (1 << 20))).all()
        assert (pos == _positions(h1, h2, 1 << 20, i)).all()


@given(st.integers(1, 10**7), st.integers(8, 30), st.integers(1, 16))
@settings(max_examples=100, deadline=None)
def test_bloom_fp_rate_bounds(n, bits_pow, k):
    r = bloom_fp_rate(n, 1 << bits_pow, k)
    assert 0.0 <= r <= 1.0
    # more bits never increases the rate
    assert bloom_fp_rate(n, 1 << (bits_pow + 1), k) <= r + 1e-12


@given(words)
@settings(max_examples=200, deadline=None)
def test_classifier_bucket_matches_md5_prefix(tok):
    w = seeded_weights_int()
    assert len(w) == HASH_DIM
    b = int(hashlib.md5(tok.encode()).hexdigest()[:3], 16)
    assert 0 <= b < HASH_DIM
    assert -50_000 <= int(w[b]) <= 50_000


@given(st.lists(st.tuples(st.integers(0, 1 << 30), st.floats(0.1, 100.0)),
                min_size=1, max_size=40, unique_by=lambda t: t[0]))
@settings(max_examples=100, deadline=None)
def test_weighted_sample_key_formula_reference(rows):
    """The A-ES key used by weighted_sample: u in (0,1], key finite and
    strictly decreasing in weight for a fixed id."""
    for did, wt in rows:
        h = hashlib.md5(str(did).encode()).hexdigest()
        u = (int(h[:8], 16) + 1.0) / 16**8
        assert 0.0 < u <= 1.0
        key = -math.log(u) / wt
        assert key >= 0.0 and math.isfinite(key)
        assert -math.log(u) / (wt * 2) <= key  # heavier weight -> smaller key
