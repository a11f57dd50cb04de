"""Round-6 operators: C58 line cleaning, C59 inverted index, C60
boilerplate removal, C61 fuzzy decontamination. Each is also oracle-gated
end-to-end in queries.py; these tests pin the operator semantics on
hand-built corpora plus the plan shapes the 100 TB story depends on."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_jsonata_spark.functions.curation import (
    fuzzy_contamination_pairs,
    remove_boilerplate_lines,
)
from kafka_connect_jsonata_spark.functions.text import clean_lines, inverted_index


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- clean_lines


def test_clean_lines_rules(spark):
    df = spark.createDataFrame(
        [
            (1, "Good long line here.\nshort\nthis line mentions javascript now"),
            (2, "All of it is kept fine.\nAnother keeper line here!"),
            (3, "no punct but long enough line"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in clean_lines(
            df, min_words=4, require_terminal_punct=True
        ).collect()
    }
    assert out[1]["cleaned"] == "Good long line here."
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 1)
    assert out[2]["n_kept"] == 2
    assert out[3]["n_kept"] == 0 and out[3]["cleaned"] == ""


def test_clean_lines_badword_case_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "enable JavaScript to view this page")], "doc_id long, text string"
    )
    row = clean_lines(df, min_words=1).first()
    assert row["n_kept"] == 0


def test_clean_lines_is_zero_shuffle(spark):
    df = spark.range(10).selectExpr("id AS doc_id", "'a b c' AS text")
    plan = plan_of(clean_lines(df))
    assert "Exchange" not in plan and "ArrowEvalPython" not in plan


# ------------------------------------------------------------- inverted_index


def test_inverted_index_postings(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "a")], "doc_id long, text string"
    )
    rows = {r["term"]: r for r in inverted_index(df).collect()}
    assert rows["a"]["doc_freq"] == 2 and rows["a"]["total_tf"] == 3
    assert rows["a"]["postings"] == "1,3"
    assert rows["b"]["postings"] == "1,2"
    assert rows["c"]["doc_freq"] == 1 and rows["c"]["postings"] == "2"


def test_inverted_index_caps_and_floor(spark):
    df = spark.createDataFrame(
        [(i, "x common") for i in range(5)] + [(9, "rare x")],
        "doc_id long, text string",
    )
    rows = {
        r["term"]: r
        for r in inverted_index(df, min_doc_freq=2, max_postings=3).collect()
    }
    assert "rare" not in rows  # floored
    assert "common" in rows and rows["common"]["postings"] == "0,1,2"  # capped
    assert rows["x"]["doc_freq"] == 6


# ---------------------------------------------------- remove_boilerplate_lines


def _boiler_df(spark):
    # 'footer' appears in 3/4 of group A docs (> 0.5), unique lines do not;
    # group B has no repeated line
    rows = [
        (1, "A", "alpha\nfooter"),
        (2, "A", "beta\nfooter"),
        (3, "A", "gamma\nfooter"),
        (4, "A", "delta"),
        (5, "B", "footer\nepsilon"),
        (6, "B", "zeta"),
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_boilerplate_removed_per_group(spark):
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(
            _boiler_df(spark), max_doc_frac=0.5, min_docs=2
        ).collect()
    }
    assert out[1]["cleaned"] == "alpha" and out[1]["n_removed"] == 1
    assert out[4]["cleaned"] == "delta" and out[4]["n_removed"] == 0
    # 'footer' is NOT frequent in group B (1/2 docs = 0.5, not > 0.5)
    assert out[5]["cleaned"] == "footer\nepsilon"


def test_boilerplate_tiers_agree_and_preserve_order(spark):
    df = _boiler_df(spark)
    wide = remove_boilerplate_lines(df, max_doc_frac=0.5, min_docs=2)
    narrow = remove_boilerplate_lines(
        df, max_doc_frac=0.5, min_docs=2, broadcast_cap=0
    )
    a = sorted(tuple(r) for r in wide.collect())
    b = sorted(tuple(r) for r in narrow.collect())
    assert a == b
    # large-state tier restores line order by position
    row = {r["doc_id"]: r for r in narrow.collect()}[5]
    assert row["cleaned"] == "footer\nepsilon"


def test_boilerplate_broadcast_tier_no_corpus_shuffle(spark):
    """The default tier filters docs map-side against broadcast per-group
    frequent arrays — the doc/text side must not hash-shuffle (only the
    distinct-hash frequency agg and the broadcast build move data)."""
    df = _boiler_df(spark)
    plan = plan_of(remove_boilerplate_lines(df, max_doc_frac=0.5))
    assert "BroadcastHashJoin" in plan
    # no sort-merge join (which would shuffle the corpus side)
    assert "SortMergeJoin" not in plan


# ------------------------------------------------- fuzzy_contamination_pairs


def test_fuzzy_decontamination_matches_bruteforce(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base.replace("lazy", "very lazy")
    far = "completely different content with other words entirely here"
    train = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(100, base)], "doc_id long, text string")
    got = {
        (r["id"], r["eval_id"]): r["jaccard"]
        for r in fuzzy_contamination_pairs(
            train, ev, threshold=0.5, num_hashes=32, n_bands=16
        ).collect()
    }
    assert (1, 100) in got and got[(1, 100)] == 1.0
    assert (2, 100) in got and 0.5 <= got[(2, 100)] < 1.0
    assert all(k[0] != 3 for k in got)


def test_fuzzy_decontamination_excludes_same_id(spark):
    df = spark.createDataFrame(
        [(1, "identical text body for this document")], "doc_id long, text string"
    )
    assert fuzzy_contamination_pairs(df, df, threshold=0.5).count() == 0


def test_fuzzy_decontamination_eval_side_broadcast(spark):
    train = spark.range(20).selectExpr(
        "id AS doc_id", "concat('text body number ', id) AS text"
    )
    ev = train.limit(2)
    plan = plan_of(fuzzy_contamination_pairs(train, ev))
    assert "BroadcastHashJoin" in plan
