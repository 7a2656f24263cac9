"""Structured-Streaming surface: watermarked windowed agg (streamed ==
batch on the same input; incremental across availableNow restarts) and
stateful streaming exact-dedup (applyInPandasWithState)."""

import os

from pyspark.sql import functions as F

SCHEMA_EVENTS = "event_id long, user_id long, event_type string, ts timestamp, value double"
SCHEMA_DOCS = "doc_id long, text_hash long"


def _write_chunk(spark, rows, schema, path, name):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, name)
    )


def test_windowed_counts_streamed_equals_batch(spark, tmp_path):
    from datetime import datetime

    from fastlink_spark.streaming.windowed import run_windowed_counts_to_memory

    indir = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    rows1 = [
        (1, 1, "click", datetime(2026, 7, 1, 10, 5), 1.0),
        (2, 1, "click", datetime(2026, 7, 1, 10, 55), 2.0),
        (3, 2, "view", datetime(2026, 7, 1, 11, 10), 3.0),
    ]
    _write_chunk(spark, rows1, SCHEMA_EVENTS, indir, "b1")
    q = run_windowed_counts_to_memory(
        spark, indir + "/*", ck, SCHEMA_EVENTS, query_name="wc1"
    )
    q.awaitTermination(120)
    got1 = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM wc1").collect()
    }
    assert got1[("2026-07-01 10:00:00", "click")] == (2, 3.0)
    assert got1[("2026-07-01 11:00:00", "view")] == (1, 3.0)

    # second batch arrives; availableNow restart from the SAME checkpoint
    # continues incrementally (state carries the first batch's counts)
    rows2 = [
        (4, 3, "click", datetime(2026, 7, 1, 10, 20), 5.0),
        (5, 3, "view", datetime(2026, 7, 1, 12, 1), 7.0),
    ]
    _write_chunk(spark, rows2, SCHEMA_EVENTS, indir, "b2")
    q = run_windowed_counts_to_memory(
        spark, indir + "/*", ck, SCHEMA_EVENTS, query_name="wc2"
    )
    q.awaitTermination(120)
    got2 = {
        (str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM wc2").collect()
    }
    assert got2[("2026-07-01 10:00:00", "click")] == (3, 8.0)
    assert got2[("2026-07-01 12:00:00", "view")] == (1, 7.0)

    # streamed result == batch twin over the union of both chunks
    batch = (
        spark.read.schema(SCHEMA_EVENTS).parquet(indir + "/*")
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2).alias("s"),
        )
        .select(F.col("win.start").alias("ws"), "event_type", "n", "s")
    )
    bm = {(str(r["ws"]), r["event_type"]): (r["n"], r["s"]) for r in batch.collect()}
    assert bm == got2


def test_streaming_exact_dedup_across_batches(spark, tmp_path):
    from fastlink_spark.streaming.windowed import run_streaming_dedup

    indir = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    # batch 1: hash 100 twice (ids 7, 3) -> emit min id once; hash 200 once
    _write_chunk(spark, [(7, 100), (3, 100), (9, 200)], SCHEMA_DOCS, indir, "b1")
    q = run_streaming_dedup(spark, indir + "/*", ck, out, SCHEMA_DOCS)
    q.awaitTermination(120)
    got1 = {(r["doc_id"], r["text_hash"]) for r in spark.read.parquet(out).collect()}
    assert got1 == {(3, 100), (9, 200)}

    # batch 2: hash 100 again (must NOT re-emit), hash 300 new
    _write_chunk(spark, [(11, 100), (12, 300)], SCHEMA_DOCS, indir, "b2")
    q = run_streaming_dedup(spark, indir + "/*", ck, out, SCHEMA_DOCS)
    q.awaitTermination(120)
    got2 = {(r["doc_id"], r["text_hash"]) for r in spark.read.parquet(out).collect()}
    assert got2 == {(3, 100), (9, 200), (12, 300)}  # hash 100 not re-emitted
