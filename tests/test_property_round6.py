"""Hypothesis properties for the round-6 operators' pure halves, plus a
handful of Spark invariance checks cheap enough to run on tiny frames.
The distributed halves are pinned by the oracle gates and the dedicated
tests in test_round6_ops.py."""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st


# --------------------------------------------------------------- DSIR weights


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:3], 16)


def _dsir_local(docs, lam=1.0, m=4096):
    """Local reference of dsir_log_weights' math: docs = [(id, text, is_t)].
    Returns {id: (n_features, log_weight)} for raw docs."""
    feats = {}
    for i, text, t in docs:
        w = text.split()
        f = [_bucket(x) for x in w]
        f += [_bucket(a + " " + b) for a, b in zip(w, w[1:])]
        if f:
            feats[i] = (t, f)
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for t, f in feats.values():
        for j in f:
            (ct if t else cr)[j] = (ct if t else cr).get(j, 0) + 1
    tt, tr = float(sum(ct.values())), float(sum(cr.values()))
    out = {}
    norm = math.log(tr + lam * m) - math.log(tt + lam * m)
    for i, (t, f) in feats.items():
        if t:
            continue
        s = sum(
            math.log(ct.get(j, 0) + lam) - math.log(cr.get(j, 0) + lam) for j in f
        )
        out[i] = (len(f), s + len(f) * norm)
    return out


texts = st.lists(
    st.text(alphabet="ab ", min_size=1, max_size=24).filter(lambda s: s.strip()),
    min_size=2,
    max_size=8,
)


@given(texts)
@settings(max_examples=50, deadline=None)
def test_dsir_invariant_under_doc_order(docs):
    """Weights depend on the corpus as a SET: permuting document order
    changes nothing."""
    rows = [(i, d, i % 2 == 0) for i, d in enumerate(docs)]
    a = _dsir_local(rows)
    b = _dsir_local(list(reversed(rows)))
    assert set(a) == set(b)
    for k in a:
        assert a[k][0] == b[k][0]
        assert abs(a[k][1] - b[k][1]) < 1e-9


# ---------------------------------------------------------------- Zipf slope


@given(st.floats(0.5, 1.5), st.integers(20, 80))
@settings(max_examples=30, deadline=None)
def test_zipf_regression_recovers_exact_power_law(alpha, n):
    """On EXACT log-log-linear data the closed-form covar/var regression
    recovers the slope to float precision (the formula zipf_fit runs)."""
    xs = [math.log(r) for r in range(1, n + 1)]
    ys = [10.0 - alpha * x for x in xs]
    mx = sum(xs) / n
    my = sum(ys) / n
    cov = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / n
    var = sum((x - mx) ** 2 for x in xs) / n
    slope = cov / var
    assert abs(slope - (-alpha)) < 1e-9
    intercept = my - slope * mx
    assert abs(intercept - 10.0) < 1e-9


# ------------------------------------------------------- curriculum (approx)


def _md5_pos(seed: str, i: int) -> str:
    return hashlib.md5(f"{seed}:{i}".encode()).hexdigest()


@given(st.integers(0, 5), st.integers(10, 60), st.integers(2, 6))
@settings(max_examples=30, deadline=None)
def test_curriculum_stage_cuts_partition_all_rows(seed, n, stages):
    """Threshold-based stage assignment is total and monotone: every score
    lands in exactly one stage, and stage index is non-decreasing in
    score (the approx tier's map-side contract)."""
    scores = sorted((_md5_pos(str(seed), i), float(i % 7)) for i in range(n))
    vals = sorted(s for _, s in scores)
    qs = [vals[min(int(len(vals) * k / stages), len(vals) - 1)] for k in range(1, stages)]

    def stage(x):
        for k, t in enumerate(qs):
            if x <= t:
                return k + 1
        return stages

    assigned = [stage(s) for _, s in scores]
    assert all(1 <= a <= stages for a in assigned)
    by_score = [stage(s) for s in vals]
    assert by_score == sorted(by_score)


# ------------------------------------------------------ SemDeDup local model


@given(
    st.lists(
        st.tuples(st.floats(-1, 1), st.floats(-1, 1)).filter(
            lambda v: abs(v[0]) + abs(v[1]) > 1e-3
        ),
        min_size=2,
        max_size=10,
    )
)
@settings(max_examples=50, deadline=None)
def test_semantic_pairs_symmetric_and_cluster_local(vecs):
    """Local reference of the pair contract: (a,b) reported iff same
    cluster, a<b, cos>=t — symmetric in input order, never cross-cluster."""
    cents = [(1.0, 0.0), (0.0, 1.0)]

    def cos(u, v):
        du = math.hypot(*u) or 1.0
        dv = math.hypot(*v) or 1.0
        return (u[0] * v[0] + u[1] * v[1]) / (du * dv)

    def cluster(v):
        d = [
            ((v[0] - c[0]) ** 2 + (v[1] - c[1]) ** 2, k)
            for k, c in enumerate(cents)
        ]
        return min(d)[1]

    t = 0.9
    pairs = set()
    for a in range(len(vecs)):
        for b in range(len(vecs)):
            if a < b and cluster(vecs[a]) == cluster(vecs[b]) and cos(vecs[a], vecs[b]) >= t:
                pairs.add((a, b))
    # reversal of the corpus maps pairs through the index flip
    rev = list(reversed(vecs))
    m = len(vecs) - 1
    pairs_rev = set()
    for a in range(len(rev)):
        for b in range(len(rev)):
            if a < b and cluster(rev[a]) == cluster(rev[b]) and cos(rev[a], rev[b]) >= t:
                pairs_rev.add((a, b))
    assert {(min(m - a, m - b), max(m - a, m - b)) for a, b in pairs_rev} == pairs
    for a, b in pairs:
        assert cluster(vecs[a]) == cluster(vecs[b])
