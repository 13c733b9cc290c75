"""Structured Streaming plans: file source -> memory sink, incremental
batches, watermark/state semantics. Uses processAllAvailable for
determinism (no wall-clock triggers)."""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from soweego_spark.streaming.events import (
    read_event_stream,
    sessionize_events,
    streaming_exact_dedup,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="soweego-stream-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _start(df, name, mode="append"):
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .start()
    )


def test_windowed_counts_match_batch(spark, tmpdir):
    """Streaming windowed agg over a file source == the batch groupBy on
    the same data (complete mode, single source directory)."""
    events = spark.read.parquet(f"{SF_DIR}/events.parquet")
    events.write.parquet(f"{tmpdir}/src")

    stream = read_event_stream(spark, f"{tmpdir}/src")
    name = f"wincounts_{uuid.uuid4().hex[:8]}"
    q = _start(windowed_event_counts(stream), name, mode="complete")
    try:
        q.processAllAvailable()
        got = spark.sql(f"SELECT * FROM {name}")
        batch = (
            events.groupBy(
                F.window("ts", "1 hour").alias("win"), "event_type"
            )
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 4).alias("total_value"),
            )
            .select(
                F.col("win.start").alias("window_start"),
                "event_type",
                "n_events",
                "total_value",
            )
        )
        got_set = {
            (r["window_start"], r["event_type"], r["n_events"], r["total_value"])
            for r in got.collect()
        }
        want_set = {tuple(r) for r in batch.collect()}
        assert got_set == want_set and len(got_set) > 0
    finally:
        q.stop()


def test_streaming_dedup_drops_repeats(spark, tmpdir):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    base = docs.select(
        F.col("doc_id"), F.col("text"), F.lit("2024-01-01 00:00:00").cast(
            "timestamp"
        ).alias("ts"),
    )
    dup = base.withColumn("doc_id", F.col("doc_id") + 1000)  # same text
    base.unionByName(dup).write.parquet(f"{tmpdir}/src")

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(f"{tmpdir}/src")
    )
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = _start(streaming_exact_dedup(stream), name)
    try:
        q.processAllAvailable()
        got = spark.sql(f"SELECT * FROM {name}")
        n_distinct_texts = docs.select("text").distinct().count()
        assert got.count() == n_distinct_texts
        assert got.select("content_hash").distinct().count() == n_distinct_texts
    finally:
        q.stop()


def test_sessionize_emits_on_watermark(spark, tmpdir):
    """Two micro-batches: sessions from batch 1 fire when batch 2 advances
    the watermark past their gap timeout."""
    rows1 = [
        (1, "2024-01-01 10:00:00", 7, "click", 1.0, ""),
        (2, "2024-01-01 10:05:00", 7, "click", 2.0, ""),
        (3, "2024-01-01 10:02:00", 9, "view", 5.0, ""),
    ]
    rows2 = [(4, "2024-01-02 10:00:00", 11, "click", 1.0, "")]  # +1 day
    schema = "event_id long, ts string, user_id long, event_type string, value double, props string"

    def write_batch(rows, sub):
        df = spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        df.coalesce(1).write.parquet(f"{tmpdir}/src/{sub}")

    import os
    os.makedirs(f"{tmpdir}/src", exist_ok=True)
    write_batch(rows1, "b1=1")

    stream = read_event_stream(spark, f"{tmpdir}/src/*", max_files_per_trigger=1)
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = _start(sessionize_events(stream, watermark="10 minutes"), name)
    try:
        q.processAllAvailable()
        write_batch(rows2, "b2=1")
        q.processAllAvailable()
        got = {
            r["user_id"]: (r["n_events"], r["total_value"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        assert got[7] == (2, 3.0)
        assert got[9] == (1, 5.0)
        assert 11 not in got  # its session hasn't timed out yet
    finally:
        q.stop()


def test_streaming_extraction_matches_batch(spark, tmpdir):
    """extract_signatures is a stateless mapInPandas -> identical results
    when the pages table arrives as a stream (the 10^12-doc lake is fed
    continuously; the extraction stage must be stream-compatible)."""
    from soweego_spark.operators.extract import extract_signatures
    from soweego_spark.sources.pages import generate_pages

    fx = generate_pages(40, seed=21)
    pages = spark.createDataFrame(fx.pages)
    pages.write.parquet(f"{tmpdir}/pages")

    batch = extract_signatures(spark.read.parquet(f"{tmpdir}/pages"))
    batch_out = {
        r["url"]: (tuple(r["name_tokens"] or []), r["domain"])
        for r in batch.collect()
    }

    stream = spark.readStream.schema(batch.sparkSession.read.parquet(
        f"{tmpdir}/pages").schema).parquet(f"{tmpdir}/pages")
    name = f"sigstream_{uuid.uuid4().hex[:8]}"
    q = _start(extract_signatures(stream), name)
    try:
        q.processAllAvailable()
        got = {
            r["url"]: (tuple(r["name_tokens"] or []), r["domain"])
            for r in spark.sql(f"SELECT * FROM {name}").collect()
        }
        assert got == batch_out and len(got) == len(fx.pages)
    finally:
        q.stop()


def test_streaming_neardup_filter(spark, tmpdir):
    """Near-identical documents (same minhash signature) collapse to one
    stream output row within the watermark; distinct docs pass through."""
    from soweego_spark.streaming.events import streaming_neardup_filter

    base = "the quick brown fox jumps over the lazy dog near the old river bank"
    rows = [
        (1, base, "2024-01-01 00:00:00"),
        (2, base, "2024-01-01 00:10:00"),                 # exact dup: dropped
        (3, base, "2024-01-01 00:20:00"),                 # exact dup: dropped
        (4, "completely different text about spark joins", "2024-01-01 00:30:00"),
    ]
    src = spark.createDataFrame(rows, "doc_id long, text string, ts_s string")
    src = src.select("doc_id", "text", F.col("ts_s").cast("timestamp").alias("ts"))
    src.write.parquet(f"{tmpdir}/src")

    stream = (
        spark.readStream.schema(src.schema)
        .parquet(f"{tmpdir}/src")
    )
    name = f"neardup_{uuid.uuid4().hex[:8]}"
    q = _start(streaming_neardup_filter(stream), name)
    try:
        q.processAllAvailable()
        got = sorted(
            r["doc_id"] for r in spark.sql(f"SELECT * FROM {name}").collect()
        )
        # one representative of the near-dup family + the distinct doc
        assert len(got) == 2 and 4 in got and got[0] in (1, 2, 3)
    finally:
        q.stop()


def test_sessionize_batch_gap_semantics(spark):
    """Exact split-on-gap: events 31 minutes apart start a new session;
    events inside the gap extend it; totals are exact integer cents."""
    from datetime import datetime

    from soweego_spark.streaming.events import sessionize_batch

    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def at(minutes):
        from datetime import timedelta

        return t0 + timedelta(minutes=minutes)

    rows = [
        (1, at(0), 7, "view", 1.10, "{}"),
        (2, at(10), 7, "click", 2.20, "{}"),   # same session (gap 10m)
        (3, at(41), 7, "view", 3.30, "{}"),    # 31m gap -> new session
        (4, at(41), 7, "view", 0.40, "{}"),    # duplicate ts, tiebreak ok
        (5, at(0), 8, "view", 9.99, "{}"),     # other user independent
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        (r["user_id"], r["session_id"]): (
            r["n_events"], r["total_cents"], r["session_start"],
            r["session_end"],
        )
        for r in sessionize_batch(events, gap_minutes=30).collect()
    }
    assert got[(7, 1)] == (2, 330, at(0), at(10))
    assert got[(7, 2)] == (2, 370, at(41), at(41))
    assert got[(8, 1)] == (1, 999, at(0), at(0))
    assert len(got) == 3


def test_streaming_neardup_state_bounded_at_bench_scale(spark, tmpdir):
    """Round-4 contract: the minhash suppression stream at bench volume
    (the full sf0.1 documents table, 5000 docs over a ~5000 s event-time
    span, 10 micro-batches) keeps its dedup state WATERMARK-BOUNDED: by
    the final batch the state store holds only the keys still inside the
    10-minute horizon, a small fraction of all keys seen. Also pins the
    two-sided semantics of the trade: a duplicate arriving within the
    watermark is suppressed; one arriving after its original's state was
    evicted passes through (the batch LSH sweep catches it downstream)."""
    import time

    from soweego_spark.streaming.events import streaming_neardup_filter

    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    n = docs.count()
    assert n == 5000
    base_ts = 1704067200  # 2024-01-01 00:00:00 UTC
    src = docs.select(
        "doc_id", "text",
        F.timestamp_seconds(F.lit(base_ts) + F.col("doc_id")).alias("ts"),
    )

    texts = {r["doc_id"]: r["text"] for r in
             docs.filter(F.col("doc_id") % 500 == 250).collect()}
    first_text = docs.filter(F.col("doc_id") == 0).first()["text"]

    slice_s = 500
    for k in range(10):
        part = src.filter(
            (F.col("doc_id") >= k * slice_s)
            & (F.col("doc_id") < (k + 1) * slice_s)
        )
        if k >= 1:
            # duplicate of a doc from the PREVIOUS slice (250-750 s old,
            # inside the 600 s watermark) -> must be suppressed
            dup = spark.createDataFrame(
                [(100000 + k, texts[(k - 1) * 500 + 250])],
                "doc_id long, text string",
            ).select(
                "doc_id", "text",
                F.timestamp_seconds(
                    F.lit(base_ts) + F.lit(k * slice_s)
                ).alias("ts"),
            )
            part = part.unionByName(dup)
        if k == 9:
            # duplicate of doc 0, ~4500 s after the original: its state
            # was evicted long ago -> passes through
            late = spark.createDataFrame(
                [(200000, first_text)], "doc_id long, text string"
            ).select(
                "doc_id", "text",
                F.timestamp_seconds(F.lit(base_ts + 4999)).alias("ts"),
            )
            part = part.unionByName(late)
        part.repartition(1).write.mode("append").parquet(f"{tmpdir}/src")
        time.sleep(0.1)  # monotonic file mod times -> in-order triggers

    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmpdir}/src")
    )
    name = f"neardup_scale_{uuid.uuid4().hex[:8]}"
    q = _start(streaming_neardup_filter(stream, watermark="10 minutes"), name)
    try:
        q.processAllAvailable()
        kept = {r["doc_id"] for r in spark.sql(
            f"SELECT doc_id FROM {name}").collect()}
        state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    finally:
        q.stop()

    assert 200000 in kept  # post-eviction dup passes (two-tier design)
    assert not any(100000 + k in kept for k in range(1, 10))  # suppressed
    # every key seen would be ~5010 rows of state without eviction; the
    # watermark keeps only the ~last-1100-seconds of keys
    assert 0 < state_rows <= 2000, state_rows
    print(f"neardup stream state rows at final batch: {state_rows}")
