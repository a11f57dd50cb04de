"""Structured Streaming smoke tests (C19-C23): drive parquet-backed streams
to completion with an availableNow trigger + memory sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_connect_jsonata_spark.sources.readers import load_table
from kafka_connect_jsonata_spark.streaming.transform import (
    run_to_memory,
    session_agg,
    stream_dedup,
    stream_static_join,
    streaming_transform,
    windowed_agg,
)


@pytest.fixture(scope="module")
def event_stream(spark, sf_dir, tmp_path_factory):
    # file stream sources read directories; stage the single parquet file
    d = tmp_path_factory.mktemp("events_stream")
    (d / "events.parquet").symlink_to(f"{sf_dir}/events.parquet")
    batch = load_table(spark, sf_dir, "events")
    raw = spark.readStream.schema(
        spark.read.parquet(f"{sf_dir}/events.parquet").schema
    ).parquet(str(d))
    # same nanos->timestamp conversion the batch reader applies
    if dict(raw.dtypes)["ts"] == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")))
    del batch
    return raw


def test_streaming_jsonata_transform(spark, event_stream, sf_dir):
    """A1 under the micro-batch runner: same compiled plan, append mode."""
    ev = event_stream.withColumn("props", F.from_json("props", "struct<k:int>"))
    out = streaming_transform(ev, "props.k > 50 ? {'event_id': event_id, 'k': props.k} : null")
    run_to_memory(out, "t_stream_transform")
    got = spark.sql("SELECT count(*) AS n FROM t_stream_transform").first()["n"]
    batch = load_table(spark, sf_dir, "events").withColumn(
        "props", F.from_json("props", "struct<k:int>")
    )
    expected = batch.filter(F.col("props.k") > 50).count()
    assert got == expected and got > 0


def test_windowed_agg(spark, event_stream):
    out = windowed_agg(
        event_stream,
        "ts",
        "1 hour",
        [F.count("*").alias("n"), F.sum("value").alias("v")],
        keys=["event_type"],
    )
    run_to_memory(out, "t_windowed")
    rows = spark.sql("SELECT * FROM t_windowed").collect()
    assert len(rows) > 0
    assert all(r["n"] > 0 for r in rows)


def test_session_window(spark, event_stream):
    out = session_agg(
        event_stream, "ts", "30 minutes", [F.count("*").alias("n")], keys=["user_id"]
    )
    run_to_memory(out, "t_session")
    rows = spark.sql("SELECT * FROM t_session").collect()
    assert len(rows) > 0


def _canon(df):
    """Order-insensitive row canon (window structs stringified)."""
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_windowed_agg_stream_batch_parity(spark, event_stream, sf_dir):
    """C19 parity gate (round-4 verdict item 4): the ACTUAL writeStream
    micro-batch execution over file-stream input must produce row-exact
    equality with the batch formulation the oracles check — complete
    output mode so every window emits regardless of the final watermark."""
    from kafka_connect_jsonata_spark.streaming.transform import ensure_event_time

    def aggs():
        return [F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("v")]

    out = windowed_agg(event_stream, "ts", "1 hour", aggs(), keys=["event_type"])
    run_to_memory(out, "t_win_parity", output_mode="complete")
    got = spark.table("t_win_parity")
    ev = ensure_event_time(load_table(spark, sf_dir, "events"), "ts")
    exp = ev.groupBy(F.window("ts", "1 hour").alias("window"), "event_type").agg(*aggs())
    g, e = _canon(got), _canon(exp)
    assert g == e and len(g) > 0


def test_sliding_window_stream_batch_parity(spark, event_stream, sf_dir):
    """C19 sliding variant through the same gate."""
    from kafka_connect_jsonata_spark.streaming.transform import ensure_event_time

    out = windowed_agg(
        event_stream, "ts", "1 hour", [F.count("*").alias("n")], slide="30 minutes"
    )
    run_to_memory(out, "t_slide_parity", output_mode="complete")
    got = spark.table("t_slide_parity")
    ev = ensure_event_time(load_table(spark, sf_dir, "events"), "ts")
    exp = ev.groupBy(
        F.window("ts", "1 hour", "30 minutes").alias("window")
    ).agg(F.count("*").alias("n"))
    g, e = _canon(got), _canon(exp)
    assert g == e and len(g) > 0


def test_session_window_stream_batch_parity(spark, event_stream, sf_dir):
    """C20 parity gate: micro-batch session windows == batch session
    windows, row-exact (session merge across batches is the risk)."""
    from kafka_connect_jsonata_spark.streaming.transform import ensure_event_time

    out = session_agg(
        event_stream, "ts", "30 minutes", [F.count("*").alias("n")], keys=["user_id"]
    )
    run_to_memory(out, "t_sess_parity", output_mode="complete")
    got = spark.table("t_sess_parity")
    ev = ensure_event_time(load_table(spark, sf_dir, "events"), "ts")
    exp = ev.groupBy(
        F.session_window(F.col("ts"), "30 minutes").alias("session"), "user_id"
    ).agg(F.count("*").alias("n"))
    g, e = _canon(got), _canon(exp)
    assert g == e and len(g) > 0


def test_stream_static_join_stream_batch_parity(spark, event_stream, sf_dir):
    """C23 parity gate: stream-static join rows == batch join rows,
    value-exact (not just count)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    out = stream_static_join(event_stream, cust, ["user_id"]).select(
        "user_id", "event_id", "c_mktsegment"
    )
    run_to_memory(out, "t_ssjoin_parity")
    got = spark.table("t_ssjoin_parity")
    exp = (
        load_table(spark, sf_dir, "events")
        .join(cust, ["user_id"])
        .select("user_id", "event_id", "c_mktsegment")
    )
    g, e = _canon(got), _canon(exp)
    assert g == e and len(g) > 0


def test_stream_dedup(spark, event_stream, sf_dir):
    out = stream_dedup(event_stream, ["user_id"], ts_col="ts")
    run_to_memory(out, "t_dedup")
    got = spark.sql("SELECT count(*) AS n FROM t_dedup").first()["n"]
    distinct_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert got == distinct_users


def test_stream_static_join(spark, event_stream, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    out = stream_static_join(event_stream, cust, ["user_id"])
    run_to_memory(out, "t_ssjoin")
    got = spark.sql("SELECT count(*) AS n FROM t_ssjoin").first()["n"]
    assert got > 0


def test_stream_stream_join(spark, event_stream, sf_dir):
    from kafka_connect_jsonata_spark.streaming.transform import stream_stream_join

    out = stream_stream_join(
        event_stream,
        event_stream,
        ["user_id"],
        "ts",
        "ts",
        watermark="30 minutes",
        max_lag="interval 5 minutes",
    )
    run_to_memory(out, "t_ss_join")
    got = spark.sql("SELECT count(*) AS n FROM t_ss_join").first()["n"]
    # batch equivalent of the same join
    ev = load_table(spark, sf_dir, "events")
    r = ev.select(*[F.col(c).alias(f"r_{c}") for c in ev.columns])
    expect = ev.join(
        r,
        (F.col("user_id") == F.col("r_user_id"))
        & (F.col("r_ts") >= F.col("ts"))
        & (F.col("r_ts") <= F.col("ts") + F.expr("interval 5 minutes")),
    ).count()
    assert got == expect and got > 0


def test_stateful_running_count(spark, event_stream, sf_dir):
    from kafka_connect_jsonata_spark.streaming.transform import stateful_running_count

    out = stateful_running_count(event_stream, ["user_id"])
    run_to_memory(out, "t_stateful", output_mode="update")
    # final state per key == batch groupBy count (take the last emitted row
    # per key; with availableNow all data lands in >=1 batches)
    got = spark.sql(
        "SELECT user_id, max(n_events) AS n FROM t_stateful GROUP BY user_id"
    )
    ev = load_table(spark, sf_dir, "events")
    expect = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    diff = (
        got.alias("g").join(expect.alias("e"), "user_id")
        .filter(F.col("g.n") != F.col("e.n"))
    )
    assert diff.count() == 0
    assert got.count() == expect.count()


def test_stateful_running_count_tws(spark, event_stream, sf_dir):
    """Same contract as test_stateful_running_count, on the Spark 4
    transformWithStateInPandas API (typed state handles)."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithState's Python driver worker needs protobuf, "
        "not installed in this container",
    )
    from kafka_connect_jsonata_spark.streaming.transform import (
        stateful_running_count_tws,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    # transformWithState requires the RocksDB state store
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = stateful_running_count_tws(event_stream, ["user_id"])
        run_to_memory(out, "t_stateful_tws", output_mode="update")
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    got = spark.sql(
        "SELECT user_id, max(n_events) AS n FROM t_stateful_tws GROUP BY user_id"
    )
    ev = load_table(spark, sf_dir, "events")
    expect = ev.groupBy("user_id").agg(F.count("*").alias("n"))
    diff = (
        got.alias("g").join(expect.alias("e"), "user_id")
        .filter(F.col("g.n") != F.col("e.n"))
    )
    assert diff.count() == 0
    assert got.count() == expect.count()


def test_stream_to_partitioned_sink(spark, event_stream, sf_dir, tmp_path):
    """Streaming -> foreachBatch -> hive-partitioned parquet: rows land
    under per-value directories and match the batch source exactly."""
    import os

    from kafka_connect_jsonata_spark.streaming.transform import (
        stream_to_partitioned_sink,
    )

    out = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    stream_to_partitioned_sink(
        event_stream, out, ck, partition_by=("event_type",)
    )
    dirs = {d for d in os.listdir(out) if d.startswith("event_type=")}
    assert len(dirs) >= 2
    back = spark.read.parquet(out)
    ev = load_table(spark, sf_dir, "events")
    assert back.count() == ev.count()
    got = {r["event_type"]: r["n"] for r in back.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    exp = {r["event_type"]: r["n"] for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    assert got == exp


def test_streaming_dlq_split(spark, event_stream, sf_dir):
    """transform_safe under the micro-batch runner: per-record failures
    land in the dead-letter split, successes in ok_values — a malformed
    record must not kill the stream (Connect errors.tolerance=all)."""
    from kafka_connect_jsonata_spark.transform import (
        dead_letters,
        ok_values,
        transform_safe,
    )

    ev = event_stream.select("event_id", "event_type", "value")
    expr = (
        "value < 0.1 ? $error('low-value record') : "
        '{"id": event_id, "t": event_type}'
    )
    out = transform_safe(ev, expr)
    run_to_memory(ok_values(out), "t_dlq_ok")
    run_to_memory(dead_letters(out), "t_dlq_dead")
    n_ok = spark.sql("SELECT count(*) AS n FROM t_dlq_ok").first()["n"]
    n_dead = spark.sql("SELECT count(*) AS n FROM t_dlq_dead").first()["n"]
    batch = load_table(spark, sf_dir, "events")
    expected_dead = batch.filter(F.col("value") < 0.1).count()
    assert n_dead == expected_dead and n_dead > 0
    assert n_ok == batch.count() - expected_dead
    row = spark.sql("SELECT * FROM t_dlq_dead LIMIT 1").first()
    assert row["error_code"] == "D3137" and "low-value" in row["error"]


def test_curation_ops_stream_batch_parity(spark, sf_dir, tmp_path):
    """Round-5 curation operators are stateless Column/Arrow maps, so they
    must run UNCHANGED on a readStream and agree row-exactly with batch:
    Gopher rule battery + classifier margin over a documents file-stream."""
    from kafka_connect_jsonata_spark.functions import classifier
    from kafka_connect_jsonata_spark.functions.curation import gopher_quality

    d = tmp_path / "docs_stream"
    d.mkdir()
    (d / "documents.parquet").symlink_to(f"{sf_dir}/documents.parquet")
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = spark.readStream.schema(schema).parquet(str(d))

    def chain(df):
        g = gopher_quality(df).select(
            "doc_id", F.col("keep").alias("g_keep"), "n_words"
        )
        s = classifier.score_documents(df).select("doc_id", "margin")
        return g.join(s, "doc_id")

    out = chain(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_curation_parity")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(map(tuple, spark.table("t_curation_parity").collect()))
    exp = sorted(map(tuple, chain(load_table(spark, sf_dir, "documents")).collect()))
    assert got == exp and len(got) > 0


def test_scrub_spans_stream_foreachbatch_parity(spark, sf_dir, tmp_path):
    """Round-7 C75 in a streaming pipeline: the scrub's covered-position
    aggregation is per-document (not windowed), so append mode rejects it
    ([STREAMING_OUTPUT_MODE] aggregation-without-watermark) — the sanctioned
    Structured Streaming shape for such ops is ``foreachBatch``, applying
    the batch operator to each micro-batch (documents are self-contained,
    so micro-batch boundaries cannot split a unit of work). Output must be
    row-exact with the one-shot batch run."""
    from kafka_connect_jsonata_spark.functions.curation import (
        scrub_contaminated_spans,
    )

    d = tmp_path / "docs_stream_scrub"
    d.mkdir()
    (d / "documents.parquet").symlink_to(f"{sf_dir}/documents.parquet")
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    batch_docs = load_table(spark, sf_dir, "documents")
    eval_set = batch_docs.filter(F.col("doc_id") % 50 == 0)

    got: list[tuple] = []

    def sink(batch_df, _batch_id):
        got.extend(
            map(
                tuple,
                scrub_contaminated_spans(batch_df, eval_set, ngram=5).collect(),
            )
        )

    stream = spark.readStream.schema(schema).parquet(str(d))
    q = stream.writeStream.foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()
    exp = sorted(
        map(tuple, scrub_contaminated_spans(batch_docs, eval_set, ngram=5).collect())
    )
    assert sorted(got) == exp and len(got) > 0


def test_curation_pipeline_v2_stream_foreachbatch_parity(spark, sf_dir, tmp_path):
    """Round-8 (verdict item 8): the COMPOSED round-6/7 pipeline (clean ->
    entropy gate -> span scrub -> length floor -> per-lang rollup) over a
    documents readStream via foreachBatch — the same callable the batch
    gate runs, applied per micro-batch, row-exact with the one-shot run
    when the stream delivers the corpus as one micro-batch."""
    from kafka_connect_jsonata_spark.queries import curation_pipeline_v2

    d = tmp_path / "docs_stream_pipeline_v2"
    d.mkdir()
    (d / "documents.parquet").symlink_to(f"{sf_dir}/documents.parquet")
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    batch_docs = load_table(spark, sf_dir, "documents")

    got: list[tuple] = []

    def sink(batch_df, _batch_id):
        got.extend(map(tuple, curation_pipeline_v2(batch_df).collect()))

    stream = spark.readStream.schema(schema).parquet(str(d))
    q = stream.writeStream.foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()
    exp = sorted(map(tuple, curation_pipeline_v2(batch_docs).collect()))
    assert sorted(got) == exp and len(got) > 0


def test_curation_pipeline_v3_stream_foreachbatch_parity(spark, sf_dir, tmp_path):
    """Round-8 C82: the dedup-bearing pipeline (entropy gate ->
    minhash_dedup keep='best' -> floor -> rollup) over a documents
    readStream via foreachBatch, row-exact with the one-shot batch run."""
    from kafka_connect_jsonata_spark.queries import curation_pipeline_v3

    d = tmp_path / "docs_stream_pipeline_v3"
    d.mkdir()
    (d / "documents.parquet").symlink_to(f"{sf_dir}/documents.parquet")
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    batch_docs = load_table(spark, sf_dir, "documents")

    got: list[tuple] = []

    def sink(batch_df, _batch_id):
        got.extend(map(tuple, curation_pipeline_v3(batch_df).collect()))

    stream = spark.readStream.schema(schema).parquet(str(d))
    q = stream.writeStream.foreachBatch(sink).start()
    q.processAllAvailable()
    q.stop()
    exp = sorted(map(tuple, curation_pipeline_v3(batch_docs).collect()))
    assert sorted(got) == exp and len(got) > 0


def test_stream_incremental_dedup_rolls_sketch_table_forward(
    spark, sf_dir, tmp_path
):
    """Round-9 C85 (round-8 verdict item 6): the steady-state ingest loop —
    incremental fuzzy dedup under foreachBatch with the minhash_sketches
    table read from and appended to parquet per micro-batch. Two batches
    delivered in a deterministic order must be row-exact with the batch
    fold: dedup(batch1), then minhash_dedup_incremental(batch2,
    ref_sketches=sketches(kept so far))."""
    from kafka_connect_jsonata_spark.functions import dedup
    from kafka_connect_jsonata_spark.streaming.transform import (
        stream_incremental_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    half1 = docs.filter(F.col("doc_id") % 2 == 0)
    half2 = docs.filter(F.col("doc_id") % 2 != 0)
    src = tmp_path / "ingest_src"
    out = str(tmp_path / "kept_out")
    sk = str(tmp_path / "sketches")
    ckpt = str(tmp_path / "ckpt")
    params = dict(num_hashes=32, n_bands=8, threshold=0.9)
    schema = docs.schema

    # batch 1 arrives, drain; batch 2 arrives, drain — the same
    # checkpoint makes the second run process only the new file
    half1.coalesce(1).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{src}/*")
    stream_incremental_dedup(stream, out, sk, ckpt, layout="flat", **params)
    half2.coalesce(1).write.parquet(str(src / "b2"))
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{src}/*")
    stream_incremental_dedup(stream, out, sk, ckpt, layout="flat", **params)

    got = sorted(r[0] for r in spark.read.parquet(out).select("doc_id").collect())

    kept1 = dedup.minhash_dedup(half1, **params)
    kept2 = dedup.minhash_dedup_incremental(
        half2, None, ref_sketches=dedup.minhash_sketches(kept1, num_hashes=32, n_bands=8), **params
    )
    exp = sorted(
        r[0] for r in kept1.select("doc_id").union(kept2.select("doc_id")).collect()
    )
    assert got == exp and got
    # history sketch table rolled forward: one sketch row per kept doc
    assert spark.read.parquet(sk).count() == len(got)
    # and the second batch actually dropped cross-batch near-dups
    n_in = half1.count() + half2.count()
    assert len(got) < n_in


def test_compact_sketch_table_preserves_history_semantics(
    spark, sf_dir, tmp_path
):
    """C85 maintenance: compacting the per-batch-appended sketch table
    must (a) reduce the file count, (b) preserve rows exactly, and
    (c) leave the NEXT incremental batch's kept set unchanged — the
    compaction is invisible to the dedup math."""
    from kafka_connect_jsonata_spark.functions import dedup
    from kafka_connect_jsonata_spark.streaming.transform import (
        compact_sketch_table,
        stream_incremental_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    third1 = docs.filter(F.col("doc_id") % 3 == 0)
    third2 = docs.filter(F.col("doc_id") % 3 == 1)
    third3 = docs.filter(F.col("doc_id") % 3 == 2)
    src = tmp_path / "ingest_src"
    out = str(tmp_path / "kept_out")
    sk = str(tmp_path / "sketches")
    ckpt = str(tmp_path / "ckpt")
    params = dict(num_hashes=32, n_bands=8, threshold=0.9)
    schema = docs.schema

    for i, part in ((1, third1), (2, third2)):
        part.coalesce(4).write.parquet(str(src / f"b{i}"))
        stream = spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "4"
        ).parquet(f"{src}/*")
        stream_incremental_dedup(stream, out, sk, ckpt, layout="flat", **params)

    before_rows = sorted(
        tuple(r) for r in spark.read.parquet(sk).collect()
    )
    files_before, files_after = compact_sketch_table(
        spark, sk, target_file_bytes=256 << 20
    )
    assert files_after < files_before
    after_rows = sorted(tuple(r) for r in spark.read.parquet(sk).collect())
    assert after_rows == before_rows

    # the next batch behaves identically to the uncompacted batch fold
    third3.coalesce(1).write.parquet(str(src / "b3"))
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{src}/*")
    stream_incremental_dedup(stream, out, sk, ckpt, layout="flat", **params)
    got = sorted(
        r[0] for r in spark.read.parquet(out).select("doc_id").collect()
    )

    kept1 = dedup.minhash_dedup(third1, **params)
    kept12 = dedup.barrier(
        kept1.unionByName(
            dedup.minhash_dedup_incremental(
                third2,
                None,
                ref_sketches=dedup.minhash_sketches(
                    kept1, num_hashes=32, n_bands=8
                ),
                **params,
            )
        )
    )
    kept3 = dedup.minhash_dedup_incremental(
        third3,
        None,
        ref_sketches=dedup.minhash_sketches(kept12, num_hashes=32, n_bands=8),
        **params,
    )
    exp = sorted(
        r[0]
        for r in kept12.select("doc_id")
        .union(kept3.select("doc_id"))
        .collect()
    )
    assert got == exp and got


def test_stream_incremental_dedup_pruned_layout_parity(spark, sf_dir, tmp_path):
    """C85 round-10: the prunable sketch-store layout (default) must
    produce the IDENTICAL kept set as the flat layout and as the batch
    fold — the physical layout is invisible to the dedup math."""
    from kafka_connect_jsonata_spark.functions import dedup
    from kafka_connect_jsonata_spark.streaming.transform import (
        stream_incremental_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    half1 = docs.filter(F.col("doc_id") % 2 == 0)
    half2 = docs.filter(F.col("doc_id") % 2 != 0)
    src = tmp_path / "ingest_src"
    params = dict(num_hashes=32, n_bands=8, threshold=0.9)
    schema = docs.schema
    half1.coalesce(1).write.parquet(str(src / "b1"))
    half2.coalesce(1).write.parquet(str(src / "b2"))

    kept = {}
    for layout in ("pruned", "flat"):
        out = str(tmp_path / f"kept_{layout}")
        sk = str(tmp_path / f"store_{layout}")
        ckpt = str(tmp_path / f"ckpt_{layout}")
        for _ in range(2):  # maxFilesPerTrigger=1 + same ckpt: one batch/run
            stream = spark.readStream.schema(schema).option(
                "maxFilesPerTrigger", "1"
            ).parquet(f"{src}/*")
            stream_incremental_dedup(stream, out, sk, ckpt, layout=layout, **params)
        kept[layout] = sorted(
            r[0] for r in spark.read.parquet(out).select("doc_id").collect()
        )
    assert kept["pruned"] == kept["flat"] and kept["pruned"]

    kept1 = dedup.minhash_dedup(half1, **params)
    kept2 = dedup.minhash_dedup_incremental(
        half2,
        None,
        ref_sketches=dedup.minhash_sketches(kept1, num_hashes=32, n_bands=8),
        **params,
    )
    exp = sorted(
        r[0]
        for r in kept1.select("doc_id").union(kept2.select("doc_id")).collect()
    )
    assert kept["pruned"] == exp


def test_sketch_store_match_parity_with_flat(spark, sf_dir, tmp_path):
    """minhash_match_against_store == minhash_match_against pair-for-pair
    (both route through the shared _cross_verify), and the incremental
    kept sets agree."""
    from kafka_connect_jsonata_spark.functions import dedup

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 != 0)
    store = str(tmp_path / "store")
    dedup.write_sketch_store(hist, store, num_hashes=32, n_bands=8)

    got = sorted(
        tuple(r)
        for r in dedup.minhash_match_against_store(
            batch, store, threshold=0.9
        ).collect()
    )
    flat = sorted(
        tuple(r)
        for r in dedup.minhash_match_against(
            batch,
            None,
            threshold=0.9,
            num_hashes=32,
            n_bands=8,
            ref_sketches=dedup.minhash_sketches(hist, num_hashes=32, n_bands=8),
        ).collect()
    )
    assert got == flat and got

    ki = sorted(
        r[0]
        for r in dedup.minhash_dedup_incremental_store(
            batch, store, threshold=0.9
        ).select("doc_id").collect()
    )
    kf = sorted(
        r[0]
        for r in dedup.minhash_dedup_incremental(
            batch,
            None,
            threshold=0.9,
            num_hashes=32,
            n_bands=8,
            ref_sketches=dedup.minhash_sketches(hist, num_hashes=32, n_bands=8),
        ).select("doc_id").collect()
    )
    assert ki == kf and ki


def test_sketch_store_param_contract(spark, sf_dir, tmp_path):
    """Appending with different sketch params must raise — params are a
    table-lifetime contract."""
    from kafka_connect_jsonata_spark.functions import dedup

    docs = load_table(spark, sf_dir, "documents").limit(50)
    store = str(tmp_path / "store")
    dedup.write_sketch_store(docs, store, num_hashes=32, n_bands=8)
    with pytest.raises(ValueError, match="different"):
        dedup.write_sketch_store(docs, store, num_hashes=64, n_bands=16)


def test_compact_sketch_store_preserves_semantics(spark, sf_dir, tmp_path):
    """Compacting the pruned store (including GROWING P/Q — the lever that
    keeps per-batch scans O(batch) as history grows) must reduce the file
    count, preserve logical content, and leave the next batch's match
    results unchanged."""
    from kafka_connect_jsonata_spark.functions import dedup
    from kafka_connect_jsonata_spark.streaming.transform import (
        compact_sketch_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    store = str(tmp_path / "store")
    # several appends -> several small file sets per partition dir
    for m in range(3):
        dedup.write_sketch_store(
            docs.filter(F.col("doc_id") % 3 == m), store,
            num_hashes=32, n_bands=8,
        )
    batch = docs.filter(F.col("doc_id") % 7 == 0)
    before = sorted(
        tuple(r)
        for r in dedup.minhash_match_against_store(
            batch, store, threshold=0.9
        ).collect()
    )
    idx_before = sorted(
        tuple(r) for r in spark.read.parquet(f"{store}/index").drop("__p").collect()
    )
    # same-P compaction merges the 3 per-append file sets -> 1 file/dir
    res = compact_sketch_store(spark, store)
    assert res["index"][1] < res["index"][0]
    assert res["sigs"][1] < res["sigs"][0]
    mid = sorted(
        tuple(r)
        for r in dedup.minhash_match_against_store(
            batch, store, threshold=0.9
        ).collect()
    )
    assert mid == before
    # growing P/Q re-partitions (more dirs — that's the point) but must
    # preserve logical content and match results
    res = compact_sketch_store(
        spark, store, index_partitions=256, sig_partitions=128
    )
    meta = dedup.read_sketch_store_meta(spark, store)
    assert meta["index_partitions"] == 256 and meta["sig_partitions"] == 128
    idx_after = sorted(
        tuple(r) for r in spark.read.parquet(f"{store}/index").drop("__p").collect()
    )
    assert idx_after == idx_before
    after = sorted(
        tuple(r)
        for r in dedup.minhash_match_against_store(
            batch, store, threshold=0.9
        ).collect()
    )
    assert after == before


def test_sketch_store_scan_bytes_sublinear(spark, tmp_path):
    """The round-9 `weak` closure criterion: per-batch history-scan bytes
    must be governed by the BATCH (its distinct bucket partitions), not by
    total history size. Two axes:

    (a) steady state — 20 small batches against a 100x-batch history each
        scan a small fraction of the store;
    (b) scale-up — 4x the history with 4x the partitions (the compaction
        lever): per-batch scan bytes stay ~flat instead of growing 4x,
        i.e. scan is O(batch) once P tracks corpus size.

    Kept-set correctness under this layout is pinned by the parity tests
    above; here we pin the I/O shape."""
    from kafka_connect_jsonata_spark.functions import dedup

    def synth_docs(n, tag):
        # deterministic distinct texts (no cross-doc near-dups)
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.sha2(F.concat_ws("-", F.lit(tag), F.col("id").cast("string"), F.lit(str(i))), 256)
                    for i in range(4)
                ],
            ).alias("text"),
        )

    params = dict(num_hashes=16, n_bands=8, ngram=5)
    hist_n, batch_n = 500, 5  # history = 100x batch
    hist = synth_docs(hist_n, "h")
    store = str(tmp_path / "store_1x")
    dedup.write_sketch_store(
        hist, store, index_partitions=512, sig_partitions=256, **params
    )

    # (a) 20 batches, each 3 new docs + 2 exact copies of history docs
    # (so the candidate/sigs path is exercised every batch)
    fracs, scans = [], []
    for b in range(20):
        newb = synth_docs(3, f"b{b}").withColumn(
            "doc_id", F.col("doc_id") + F.lit(10_000 + 100 * b)
        )
        dup_src = hist.filter(
            (F.col("doc_id") % hist_n) >= (7 * b) % (hist_n - 2)
        ).limit(2)
        dups = dup_src.select(
            (F.col("doc_id") + F.lit(50_000 + 100 * b)).alias("doc_id"), "text"
        )
        batch = newb.unionByName(dups)
        m: dict = {}
        pairs = dedup.minhash_match_against_store(
            batch, store, threshold=0.9, scan_metrics=m
        )
        assert pairs.count() >= 2  # the planted exact dups matched history
        scanned = m["index_bytes"] + m["sigs_bytes"]
        total = m["index_total_bytes"] + m["sigs_total_bytes"]
        scans.append(scanned)
        fracs.append(scanned / total)
    assert max(fracs) < 0.35, f"per-batch scan fraction too high: {fracs}"

    # (b) 4x history, 4x partitions: same batch, scan bytes ~flat
    store4 = str(tmp_path / "store_4x")
    hist4 = synth_docs(4 * hist_n, "h4")
    dedup.write_sketch_store(
        hist4, store4, index_partitions=2048, sig_partitions=1024, **params
    )
    batch = synth_docs(batch_n, "probe").withColumn(
        "doc_id", F.col("doc_id") + F.lit(90_000)
    )
    m1, m4 = {}, {}
    dedup.minhash_match_against_store(
        batch, store, threshold=0.9, scan_metrics=m1
    ).count()
    dedup.minhash_match_against_store(
        batch, store4, threshold=0.9, scan_metrics=m4
    ).count()
    tot1 = m1["index_total_bytes"] + m1["sigs_total_bytes"]
    tot4 = m4["index_total_bytes"] + m4["sigs_total_bytes"]
    assert tot4 > 2.5 * tot1  # the history really did grow ~4x
    s1 = m1["index_bytes"] + m1["sigs_bytes"]
    s4 = m4["index_bytes"] + m4["sigs_bytes"]
    assert s4 < 2.0 * max(s1, 1), (
        f"scan bytes must not track history size: {s1} -> {s4} "
        f"(totals {tot1} -> {tot4})"
    )


def test_stream_incremental_dedup_exactly_once_stamp(spark, sf_dir, tmp_path):
    """Round-10 C85 hardening, DEFAULT as of round 11: a REPLAYED
    micro-batch (same batch id — the foreachBatch at-least-once window
    after a crash between write and checkpoint commit) overwrites its own
    ``_batch_id`` partition instead of double-appending. The default path
    (no stamp argument) IS the exactly-once path; ``stamp_batch_id=False``
    opts back into the round-10 plain-append (at-least-once) layout.
    Replay is simulated by re-running the same source through a FRESH
    checkpoint (batch ids restart at 0)."""
    from kafka_connect_jsonata_spark.streaming.transform import (
        stream_incremental_dedup,
    )

    docs = load_table(spark, sf_dir, "documents").limit(120)
    src = tmp_path / "src"
    docs.coalesce(1).write.parquet(str(src / "b1"))
    params = dict(num_hashes=32, n_bands=8, threshold=0.9)
    schema = docs.schema

    def deliver(out, sk, ckpt, stamp=None):
        stream = spark.readStream.schema(schema).parquet(f"{src}/*")
        kw = {} if stamp is None else {"stamp_batch_id": stamp}
        stream_incremental_dedup(stream, out, sk, ckpt, **kw, **params)

    # DEFAULT path: first delivery + replay -> unchanged row count
    out_s = str(tmp_path / "out_stamped")
    deliver(out_s, str(tmp_path / "sk1"), str(tmp_path / "ck1"))
    n1 = spark.read.parquet(out_s).count()
    ids1 = sorted(r[0] for r in spark.read.parquet(out_s).select("doc_id").collect())
    deliver(out_s, str(tmp_path / "sk1b"), str(tmp_path / "ck1b"))
    after = spark.read.parquet(out_s)
    assert after.count() == n1
    assert sorted(r[0] for r in after.select("doc_id").collect()) == ids1
    assert "_batch_id" in after.columns
    # opt-out (stamp_batch_id=False): the same replay double-appends (the
    # documented at-least-once behavior the default exists to fix)
    out_a = str(tmp_path / "out_append")
    deliver(out_a, str(tmp_path / "sk2"), str(tmp_path / "ck2"), False)
    na = spark.read.parquet(out_a).count()
    deliver(out_a, str(tmp_path / "sk2b"), str(tmp_path / "ck2b"), False)
    assert spark.read.parquet(out_a).count() == 2 * na


def test_sketch_store_double_append_is_semantically_idempotent(
    spark, sf_dir, tmp_path
):
    """Duplicate sketch rows (an at-least-once replay of the store append)
    must not change any match result — candidate pairs dedup — so the
    store needs no transactional sink; compaction restores physical
    minimality."""
    from kafka_connect_jsonata_spark.functions import dedup

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 != 0)
    store = str(tmp_path / "store")
    dedup.write_sketch_store(hist, store, num_hashes=32, n_bands=8)
    once = sorted(
        tuple(r)
        for r in dedup.minhash_match_against_store(
            batch, store, threshold=0.9
        ).collect()
    )
    # replayed append: the SAME history lands twice
    dedup.write_sketch_store(hist, store, num_hashes=32, n_bands=8)
    twice = sorted(
        tuple(r)
        for r in dedup.minhash_match_against_store(
            batch, store, threshold=0.9
        ).collect()
    )
    assert twice == once and once


def test_sketch_store_missing_half_raises(spark, sf_dir, tmp_path):
    """Round-11 ADVICE fix: meta present but a half dir missing is a
    crashed compaction, NOT an empty history — both the match path and
    the append path must raise instead of silently keeping every
    near-dup of history / recreating the dir."""
    import shutil

    from kafka_connect_jsonata_spark.functions import dedup

    docs = load_table(spark, sf_dir, "documents").limit(50)
    store = str(tmp_path / "store")
    dedup.write_sketch_store(docs, store, num_hashes=32, n_bands=8)
    shutil.rmtree(store + "/index")
    with pytest.raises(IOError, match="corrupt"):
        dedup.minhash_match_against_store(docs, store, threshold=0.9)
    with pytest.raises(IOError, match="corrupt"):
        dedup.write_sketch_store(docs, store, num_hashes=32, n_bands=8)
    # residue from a crashed _swap_dirs is named in the error
    (tmp_path / "store" / "index__old").mkdir()
    with pytest.raises(IOError, match="index__old"):
        dedup.minhash_match_against_store(docs, store, threshold=0.9)


def test_sketch_store_created_empty_is_valid(spark, sf_dir, tmp_path):
    """A store created but never appended to (or whose batch produced no
    sketch rows) has EMPTY half dirs — that is a legitimately empty
    history, and a match against it returns no pairs (the corruption
    guard must not fire)."""
    from kafka_connect_jsonata_spark.functions import dedup

    docs = load_table(spark, sf_dir, "documents").limit(20)
    store = str(tmp_path / "store")
    # create via a zero-row append: meta + empty dirs
    dedup.write_sketch_store(
        docs.filter(F.lit(False)), store, num_hashes=32, n_bands=8
    )
    assert dedup.read_sketch_store_meta(spark, store) is not None
    out = dedup.minhash_match_against_store(docs, store, threshold=0.5)
    assert out.count() == 0


def test_swap_dirs_crash_states_recover(spark, sf_dir, tmp_path):
    """_swap_dirs leaves every crash state recoverable: (a) aside copy +
    missing src -> next compaction restores it; (b) aside copy + src
    present (crash before cleanup) -> aside copy is dropped. Match
    results are unchanged through both."""
    import shutil

    from kafka_connect_jsonata_spark.functions import dedup
    from kafka_connect_jsonata_spark.streaming.transform import (
        compact_sketch_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 != 0)
    store = str(tmp_path / "store")
    dedup.write_sketch_store(hist, store, num_hashes=32, n_bands=8)
    want = sorted(
        tuple(r)
        for r in dedup.minhash_match_against_store(
            batch, store, threshold=0.9
        ).collect()
    )
    assert want

    # (a) crash between rename-aside and rename-into-place: src missing,
    # __old holds the data. The NEXT compaction restores then re-compacts.
    shutil.move(store + "/index", store + "/index__old")
    with pytest.raises(IOError, match="corrupt"):
        dedup.minhash_match_against_store(batch, store, threshold=0.9)
    compact_sketch_store(spark, store)
    got = sorted(
        tuple(r)
        for r in dedup.minhash_match_against_store(
            batch, store, threshold=0.9
        ).collect()
    )
    assert got == want

    # (b) crash after rename-into-place but before aside cleanup: both
    # present; compaction drops the stale aside copy and proceeds.
    shutil.copytree(store + "/sigs", store + "/sigs__old")
    compact_sketch_store(spark, store)
    import os

    assert not os.path.exists(store + "/sigs__old")
    got = sorted(
        tuple(r)
        for r in dedup.minhash_match_against_store(
            batch, store, threshold=0.9
        ).collect()
    )
    assert got == want


def test_auto_store_partitions_rule():
    """Creation-time sizing implements the SCALE.md rule: P >= batch
    bucket count / target fraction, power-of-two, clamped; Q = P/4."""
    from kafka_connect_jsonata_spark.functions.dedup import (
        auto_store_partitions,
    )

    P, Q = auto_store_partitions(1000, 16, target_scan_fraction=0.1)
    assert P == 65536 and Q == P // 4  # 16k buckets / 0.1 -> 160k -> capped
    P, Q = auto_store_partitions(5, 8, target_scan_fraction=0.1)
    assert P == 512 and Q == 128  # 40 / 0.1 -> 400 -> 512
    P, Q = auto_store_partitions(1, 1)
    assert P == 64 and Q == 64  # floor
    P, Q = auto_store_partitions(10**9, 64)
    assert P == 65536  # cap


def test_sketch_store_auto_maintenance_growth(spark, tmp_path):
    """Round-11 verdict item 2 done-criterion: epochs of corpus growth
    with NO manual P/Q choice anywhere — creation auto-sizes from the
    first batch, maintain_sketch_store() grows P/Q from measured bytes —
    keep the per-batch scan fraction under the pinned bound, with match
    parity against the flat reference matcher preserved."""
    from kafka_connect_jsonata_spark.functions import dedup
    from kafka_connect_jsonata_spark.streaming.transform import (
        maintain_sketch_store,
    )

    def synth(n, tag, base=0):
        return spark.range(n).select(
            (F.col("id") + base).alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.sha2(
                        F.concat_ws(
                            "-", F.lit(tag), F.col("id").cast("string"), F.lit(str(i))
                        ),
                        256,
                    )
                    for i in range(4)
                ],
            ).alias("text"),
        )

    params = dict(num_hashes=16, n_bands=8, ngram=5)
    store = str(tmp_path / "store")
    # creation: auto P from a SMALL typical batch
    dedup.write_sketch_store(
        synth(5, "b0"), store, expected_batch_rows=5, **params
    )
    meta0 = dedup.read_sketch_store_meta(spark, store)
    assert meta0["index_partitions"] == 512  # 5*8/0.1 -> 400 -> 512

    history = [synth(5, "b0")]
    p_seen = [512]
    fracs = []
    for epoch in range(3):
        grow = synth(150, f"e{epoch}", base=10_000 + epoch * 1000)
        dedup.write_sketch_store(grow, store, **params)
        history.append(grow)
        res = maintain_sketch_store(
            spark, store, target_partition_bytes=1024
        )
        p_seen.append(res["index_partitions"])
        # probe batch: scan fraction stays bounded as the corpus grows
        probe = synth(5, "probe", base=90_000 + epoch)
        m: dict = {}
        dedup.minhash_match_against_store(
            probe, store, threshold=0.9, scan_metrics=m
        ).count()
        frac = (m["index_bytes"] + m["sigs_bytes"]) / (
            m["index_total_bytes"] + m["sigs_total_bytes"]
        )
        fracs.append(frac)
    assert max(fracs) < 0.35, fracs
    # the byte-driven policy actually GREW the layout across epochs
    assert p_seen[-1] > p_seen[0], p_seen
    assert all(b >= a for a, b in zip(p_seen, p_seen[1:])), p_seen

    # parity: store-backed match == flat reference matcher on the final corpus
    hist_df = history[0]
    for h in history[1:]:
        hist_df = hist_df.unionByName(h)
    batch = synth(3, "new", base=95_000).unionByName(
        hist_df.limit(2).select(
            (F.col("doc_id") + 70_000).alias("doc_id"), "text"
        )
    )
    got = sorted(
        tuple(r)
        for r in dedup.minhash_match_against_store(
            batch, store, threshold=0.9
        ).collect()
    )
    flat = sorted(
        tuple(r)
        for r in dedup.minhash_match_against(
            batch,
            None,
            threshold=0.9,
            **params,
            ref_sketches=dedup.minhash_sketches(hist_df, **params),
        ).collect()
    )
    assert got == flat and got


def test_maintain_sketch_store_small_file_decay(spark, sf_dir, tmp_path):
    """The second maintenance trigger: many per-batch appends at
    unchanged P leave file count >> partitions; maintain() compacts even
    when no growth is needed, and a healthy store is a no-op."""
    from kafka_connect_jsonata_spark.functions import dedup
    from kafka_connect_jsonata_spark.streaming.transform import (
        maintain_sketch_store,
    )

    docs = load_table(spark, sf_dir, "documents")
    store = str(tmp_path / "store")
    d = docs.limit(40)
    dedup.write_sketch_store(
        d, store, num_hashes=16, n_bands=8, index_partitions=64,
        sig_partitions=64,
    )
    for i in range(6):
        dedup.write_sketch_store(
            d.select((F.col("doc_id") + 1000 * (i + 1)).alias("doc_id"), "text"),
            store, num_hashes=16, n_bands=8,
        )
    res = maintain_sketch_store(
        spark, store, target_partition_bytes=1 << 30, small_file_factor=4.0
    )
    assert res["action"] == "compacted"
    res2 = maintain_sketch_store(
        spark, store, target_partition_bytes=1 << 30, small_file_factor=4.0
    )
    assert res2["action"] == "noop"
    assert res2["index_files"] <= res["index_files"]


def test_sketch_store_delete_no_ghost_matches(spark, sf_dir, tmp_path):
    """Round-11 verdict item 3: takedown. Delete N docs from the store ->
    re-matching produces NO ghost matches against the removed ids; the
    surviving matches equal a from-scratch store built without those
    docs; deletion is idempotent; the ids-only (no text) path agrees."""
    from kafka_connect_jsonata_spark.functions import dedup

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 != 0)
    gone = hist.limit(10)
    gone_ids = {r[0] for r in gone.select("doc_id").collect()}

    store = str(tmp_path / "store")
    dedup.write_sketch_store(hist, store, num_hashes=32, n_bands=8)
    before = dedup.minhash_match_against_store(batch, store, threshold=0.5)
    assert before.filter(F.col("ref_doc_id").isin(gone_ids)).count() > 0, (
        "test needs the doomed docs to match something before deletion"
    )

    res = dedup.delete_from_sketch_store(gone, store)
    assert res["index_rows_removed"] > 0 and res["sigs_rows_removed"] == 10

    after = dedup.minhash_match_against_store(batch, store, threshold=0.5)
    assert after.filter(F.col("ref_doc_id").isin(gone_ids)).count() == 0

    # parity with a from-scratch store that never saw the deleted docs
    store2 = str(tmp_path / "store2")
    dedup.write_sketch_store(
        hist.join(gone.select("doc_id"), "doc_id", "left_anti"),
        store2, num_hashes=32, n_bands=8,
        index_partitions=dedup.read_sketch_store_meta(spark, store)[
            "index_partitions"
        ],
        sig_partitions=dedup.read_sketch_store_meta(spark, store)[
            "sig_partitions"
        ],
    )
    got = sorted(tuple(r) for r in after.collect())
    want = sorted(
        tuple(r)
        for r in dedup.minhash_match_against_store(
            batch, store2, threshold=0.5
        ).collect()
    )
    assert got == want and got

    # idempotent: deleting the same ids again removes nothing
    res2 = dedup.delete_from_sketch_store(gone, store)
    assert res2["index_rows_removed"] == 0 and res2["sigs_rows_removed"] == 0

    # ids-only path (content-free takedown list) on a fresh store agrees
    store3 = str(tmp_path / "store3")
    dedup.write_sketch_store(hist, store3, num_hashes=32, n_bands=8)
    res3 = dedup.delete_from_sketch_store(
        gone.select("doc_id"), store3, text_col=None
    )
    assert res3["sigs_rows_removed"] == 10
    got3 = sorted(
        tuple(r)
        for r in dedup.minhash_match_against_store(
            batch, store3, threshold=0.5
        ).collect()
    )
    assert got3 == want


def test_sketch_store_delete_crash_states_recover(spark, sf_dir, tmp_path):
    """Partition-level mirror of test_swap_dirs_crash_states_recover
    (round-12 ADVICE fix): delete_from_sketch_store's per-dir rename-aside
    can crash (a) between rename-aside and swap-in — only ``__p=N__old``
    exists, which _list_partition_dirs SKIPS, so the pre-fix heal loop
    could never see it and the pruned reader silently read the partition
    as EMPTY — and (b) after swap-in but before residue cleanup. Both
    states must heal on the next store touch with match results intact."""
    import os
    import shutil

    from kafka_connect_jsonata_spark.functions import dedup

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 != 0)
    store = str(tmp_path / "store")
    dedup.write_sketch_store(hist, store, num_hashes=32, n_bands=8)
    want = sorted(
        tuple(r)
        for r in dedup.minhash_match_against_store(
            batch, store, threshold=0.5
        ).collect()
    )
    assert want

    def populated_dirs(sub):
        return sorted(
            d
            for d in os.listdir(f"{store}/{sub}")
            if d.startswith("__") and "=" in d and not d.endswith("__old")
        )

    # (a) rename-aside done, swap-in not: the partition exists ONLY as
    # __p=N__old. Pre-fix this silently dropped every match that lived in
    # the stranded partition. Round 13 (ADVICE r12 medium): the match
    # path is READ-ONLY — it reads the aside copy in place (the
    # pre-delete snapshot IS the store state for a crashed delete) and
    # leaves the crash state for a mutation/explicit heal, so a reader
    # can never race an in-flight delete's swap-in.
    victims = populated_dirs("index")[:2]
    for d in victims:
        shutil.move(f"{store}/index/{d}", f"{store}/index/{d}__old")
    got = sorted(
        tuple(r)
        for r in dedup.minhash_match_against_store(
            batch, store, threshold=0.5
        ).collect()
    )
    assert got == want
    for d in victims:
        # read-only: the crash state is untouched by the match
        assert not os.path.exists(f"{store}/index/{d}")
        assert os.path.isdir(f"{store}/index/{d}__old")

    # same crash state on the sigs half — still read-only, still intact
    sig_victim = populated_dirs("sigs")[0]
    shutil.move(f"{store}/sigs/{sig_victim}", f"{store}/sigs/{sig_victim}__old")
    got = sorted(
        tuple(r)
        for r in dedup.minhash_match_against_store(
            batch, store, threshold=0.5
        ).collect()
    )
    assert got == want
    assert os.path.isdir(f"{store}/sigs/{sig_victim}__old")
    assert not os.path.exists(f"{store}/sigs/{sig_victim}")

    # the explicit heal API restores every stranded partition; results
    # unchanged afterwards
    res = dedup.heal_sketch_store(spark, store)
    assert res["restored"] == 3 and res["cleared"] == 0
    for d in victims:
        assert os.path.isdir(f"{store}/index/{d}")
        assert not os.path.exists(f"{store}/index/{d}__old")
    assert os.path.isdir(f"{store}/sigs/{sig_victim}")
    got = sorted(
        tuple(r)
        for r in dedup.minhash_match_against_store(
            batch, store, threshold=0.5
        ).collect()
    )
    assert got == want

    # (b) swap-in done, residue not cleaned: base dir holds the CURRENT
    # data; the stale aside copy must be dropped, not restored over it.
    keeper = populated_dirs("index")[0]
    shutil.copytree(f"{store}/index/{keeper}", f"{store}/index/{keeper}__old")
    res = dedup.heal_sketch_store(spark, store)
    assert res["cleared"] == 1 and res["restored"] == 0
    assert not os.path.exists(f"{store}/index/{keeper}__old")

    # a delete over crash state (a) converges: same result as a delete on
    # a healthy store (the stranded partition's rows are found and removed)
    gone = hist.limit(5)
    victim2 = populated_dirs("index")[0]
    shutil.move(f"{store}/index/{victim2}", f"{store}/index/{victim2}__old")
    r = dedup.delete_from_sketch_store(gone, store)
    assert r["sigs_rows_removed"] == 5
    after = dedup.minhash_match_against_store(batch, store, threshold=0.5)
    gone_ids = {x[0] for x in gone.select("doc_id").collect()}
    assert after.filter(F.col("ref_doc_id").isin(gone_ids)).count() == 0
    # the healed-then-rewritten store carries no residue anywhere
    for sub in ("index", "sigs"):
        assert not [d for d in os.listdir(f"{store}/{sub}") if d.endswith("__old")]


def test_sketch_store_delete_text_drift_fallback(spark, sf_dir, tmp_path):
    """Round-12 ADVICE fix: when the takedown df's text has DRIFTED from
    the ingested text, the sketch-pruned partition set is wrong — the
    removal-count cross-check (index holds >= n_bands rows per stored id)
    must detect the shortfall and fall back to the ids-only index scan,
    so no stale index row survives a delete that reports success."""
    from kafka_connect_jsonata_spark.functions import dedup

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    store = str(tmp_path / "store")
    dedup.write_sketch_store(hist, store, num_hashes=32, n_bands=8)

    gone = hist.limit(8)
    drifted = gone.select(
        "doc_id",
        F.concat(
            F.lit("ENTIRELY DIFFERENT PREAMBLE "),
            F.reverse(F.col("text")),
        ).alias("text"),
    )
    res = dedup.delete_from_sketch_store(drifted, store)
    assert res["sigs_rows_removed"] == 8
    # every index row for the retracted ids is gone, drift notwithstanding
    idx = spark.read.option("basePath", f"{store}/index").parquet(
        f"{store}/index"
    )
    gone_keys = gone.select(F.col("doc_id").alias("id")).distinct()
    assert idx.join(gone_keys, "id", "left_semi").count() == 0
    # and the index removal actually accounted for the full n_bands rows
    assert res["index_rows_removed"] >= 8 * 8


def test_sketch_store_delete_mid_stream(spark, sf_dir, tmp_path):
    """Deletion between micro-batches leaves the streaming path intact:
    batches after the takedown keep docs that only matched the removed
    history."""
    from kafka_connect_jsonata_spark.functions import dedup

    docs = load_table(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    store = str(tmp_path / "store")
    dedup.write_sketch_store(hist, store, num_hashes=32, n_bands=8)

    # a "batch" of exact copies of two history docs
    twins_src = hist.limit(2)
    twins = twins_src.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    kept_before = dedup.minhash_dedup_incremental_store(
        twins, store, threshold=0.9
    )
    assert kept_before.count() == 0  # both drop: history twins

    dedup.delete_from_sketch_store(twins_src, store)
    kept_after = sorted(
        r[0]
        for r in dedup.minhash_dedup_incremental_store(
            twins, store, threshold=0.9
        ).select("doc_id").collect()
    )
    # the copies may still match OTHER history docs (the corpus plants
    # near-dup clusters) — the invariant is parity with a history that
    # never contained the deleted docs, not a fixed count
    want = sorted(
        r[0]
        for r in dedup.minhash_dedup_incremental(
            twins,
            None,
            threshold=0.9,
            num_hashes=32,
            n_bands=8,
            ref_sketches=dedup.minhash_sketches(
                hist.join(twins_src.select("doc_id"), "doc_id", "left_anti"),
                num_hashes=32,
                n_bands=8,
            ),
        ).select("doc_id").collect()
    )
    assert kept_after == want


def test_delete_from_parquet_table(spark, sf_dir, tmp_path):
    from kafka_connect_jsonata_spark.functions import dedup

    docs = load_table(spark, sf_dir, "documents").limit(50)
    out = str(tmp_path / "out")
    docs.write.parquet(out)
    gone = docs.limit(7).select("doc_id")
    removed = dedup.delete_from_parquet_table(spark, out, gone)
    assert removed == 7
    left = spark.read.parquet(out)
    assert left.count() == 43
    assert left.join(gone, "doc_id", "left_semi").count() == 0


def test_stream_incremental_dedup_inline_maintenance(spark, sf_dir, tmp_path):
    """maintain_every: the auto-maintenance policy runs inline between
    micro-batches (foreachBatch is serial, so the call point is quiesced
    by construction) — the kept set is unchanged vs the unmaintained run
    and the store stays physically healthy (files bounded)."""
    import os as _os

    from kafka_connect_jsonata_spark.functions import dedup
    from kafka_connect_jsonata_spark.streaming.transform import (
        stream_incremental_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    parts = [docs.filter(F.col("doc_id") % 3 == m) for m in range(3)]
    src = tmp_path / "src"
    for m, part in enumerate(parts):
        d = str(src / f"b{m}")
        part.coalesce(1).write.parquet(d)
        for name in _os.listdir(d):
            _os.utime(
                _os.path.join(d, name),
                (1_700_000_000 + m, 1_700_000_000 + m),
            )
    params = dict(num_hashes=32, n_bands=8, threshold=0.9)

    def run(out, sk, ckpt, **kw):
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
        )
        stream_incremental_dedup(stream, out, sk, ckpt, **params, **kw)
        return sorted(
            r[0]
            for r in spark.read.parquet(out).select("doc_id").collect()
        )

    plain = run(
        str(tmp_path / "out_a"), str(tmp_path / "sk_a"), str(tmp_path / "ck_a")
    )
    maintained = run(
        str(tmp_path / "out_b"),
        str(tmp_path / "sk_b"),
        str(tmp_path / "ck_b"),
        maintain_every=2,
        maintain_kw=dict(target_partition_bytes=1 << 30, small_file_factor=1.0),
    )
    assert maintained == plain and plain
    # the cadence actually compacted: per-partition file count is bounded
    # (3 appends would otherwise leave >=3 file sets; factor 1.0 forces a
    # compaction at batch 2, so at most the post-compaction + 1 append)
    meta = dedup.read_sketch_store_meta(spark, str(tmp_path / "sk_b"))
    idx = spark.read.parquet(str(tmp_path / "sk_b") + "/index")
    import collections

    per_dir = collections.Counter(
        f.rsplit("/", 2)[1] for f in idx.inputFiles()
    )
    assert max(per_dir.values()) <= 2, per_dir.most_common(3)
    assert meta is not None
