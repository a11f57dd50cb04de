"""Round-12 operator additions: C87 dataset snapshot diff."""

from pyspark.sql import functions as F

from kafka_connect_jsonata_spark.operators.relational import snapshot_diff


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "d"), (5, "e")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(old, new).collect()
    }
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "unchanged",
        5: "added",
    }


def test_snapshot_diff_multi_column_and_nulls(spark):
    """Any compared column's drift flips the row to changed; a null vs
    non-null content value is a CHANGE, not an equality (the coalesce
    sentinel), and null==null stays unchanged."""
    old = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", None), (3, None, "z"), (4, None, None)],
        "doc_id long, text string, lang string",
    )
    new = spark.createDataFrame(
        [(1, "a", "y"), (2, "b", "w"), (3, None, "z"), (4, None, None)],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(
            old, new, content_cols=("text", "lang")
        ).collect()
    }
    assert got == {1: "changed", 2: "changed", 3: "unchanged", 4: "unchanged"}


def test_snapshot_diff_fingerprint_is_mapside(spark, sf_dir):
    """Scale contract: the md5 fingerprint is computed BELOW the join
    exchange (the shuffle moves 16-byte hashes, never document text)."""
    from kafka_connect_jsonata_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = snapshot_diff(docs, docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    ex = plan.find("Exchange hashpartitioning")
    assert ex != -1
    assert "md5" in plan[ex:], "md5 must appear below the exchange"
    # and no text column crosses the exchange boundary upward
    head = plan[:ex]
    assert "text#" not in head.split("Exchange")[0].split("Project")[0]


def test_dataset_diff_oracle_null_text_parity(spark, tmp_path):
    """ADVICE r12 (low): DATASET_DIFF_SQL must mirror snapshot_diff's
    NULL sentinel (coalesce to \\x00) — a NULL text present in both
    snapshots is 'unchanged' on BOTH sides, including when the %11
    mutation branch turns NULL || ' v2' into NULL."""
    import duckdb

    from kafka_connect_jsonata_spark.queries import (
        DATASET_DIFF_SQL,
        dataset_diff_docs,
    )

    # doc_ids chosen to hit every branch with NULL text: 11 (%11 mutation),
    # 13 (plain), 10 (v1-only -> removed), 7 (v2-only -> added)
    rows = [(11, None), (13, None), (10, None), (7, None), (3, "kept")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pq = str(tmp_path / "documents.parquet")
    docs.coalesce(1).write.parquet(pq)

    got = {
        r["doc_id"]: r["status"]
        for r in dataset_diff_docs(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM parquet_scan('{pq}/*.parquet')"
    )
    want = dict(con.execute(DATASET_DIFF_SQL).fetchall())
    assert got == want
    assert got[11] == "unchanged" and got[13] == "unchanged"
    assert got[10] == "removed" and got[7] == "added"
