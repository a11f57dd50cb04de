"""Exact duplicated-substring removal (functions/dedup.py, SURVEY §2C C44)."""

from __future__ import annotations

import random

import pytest

from kafka_connect_jsonata_spark.functions import dedup


def _run(spark, rows, window):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup.duplicate_span_removal(df, window=window)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def _reference(rows, window):
    """Brute-force single-machine reference: mark all-but-first occurrences
    of every duplicated window, merge overlap/adjacency, cut."""
    occs: dict[str, list[tuple[int, int]]] = {}
    for did, text in rows:
        for p in range(len(text) - window + 1):
            occs.setdefault(text[p : p + window], []).append((did, p))
    marked: dict[int, set[int]] = {did: set() for did, _ in rows}
    for gram, lst in occs.items():
        if len(lst) > 1:
            for did, p in sorted(lst)[1:]:
                marked[did].update(range(p, p + window))
    out = {}
    for did, text in rows:
        keep = [c for i, c in enumerate(text) if i not in marked[did]]
        # span count: maximal runs of marked positions
        spans = 0
        prev = -2
        for i in sorted(marked[did]):
            if i > prev + 1:
                spans += 1
            prev = i
        out[did] = {
            "text_clean": "".join(keep),
            "n_spans": spans,
            "chars_removed": len(marked[did]),
        }
    return out


def test_keep_first_occurrence_semantics(spark):
    rows = [
        (1, "AAAAABBBBBCCCCCDDDDD"),
        (2, "AAAAABBBBBxxxxxxxxxx"),
        (3, "unique text here zzz"),
        (4, "short"),
        (5, "AAAAABBBBBCCCCCDDDDD"),
    ]
    got = _run(spark, rows, 10)
    assert got[1]["text_clean"] == "AAAAABBBBBCCCCCDDDDD"  # first copy survives
    assert got[2]["text_clean"] == "xxxxxxxxxx"
    assert got[3]["n_spans"] == 0
    assert got[4]["text_clean"] == "short"  # shorter than window: untouched
    assert got[5]["text_clean"] == "" and got[5]["chars_removed"] == 20


def test_overlapping_marks_merge_into_one_span(spark):
    # doc 2 repeats doc 1's text twice -> two marked regions separated by
    # nothing (adjacent/overlapping windows) merge; span accounting checks
    rows = [(1, "0123456789"), (2, "0123456789_0123456789")]
    got = _run(spark, rows, 10)
    assert got[1]["text_clean"] == "0123456789"
    assert got[2]["text_clean"] == "_"
    assert got[2]["n_spans"] == 2  # the '_' splits the two cut regions


def test_matches_bruteforce_reference_random(spark):
    rng = random.Random(7)
    alphabet = "abc"
    rows = []
    for did in range(30):
        n = rng.randrange(0, 40)
        rows.append((did, "".join(rng.choice(alphabet) for _ in range(n))))
    # small alphabet + short window -> dense collisions, heavy merging
    for window in (3, 5):
        want = _reference(rows, window)
        got = _run(spark, rows, window)
        for did in want:
            assert got[did]["text_clean"] == want[did]["text_clean"], (did, window)
            assert got[did]["n_spans"] == want[did]["n_spans"], (did, window)
            assert got[did]["chars_removed"] == want[did]["chars_removed"]


def test_window_validation(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        dedup.duplicate_span_removal(df, window=1)
