"""Structured Streaming plans for the engine's event/page feeds.

The reference is a pure batch pipeline (chunked generators, SURVEY.md §1.3)
— streaming is our scale addition: a 10^12-doc lake is fed continuously, so
ingestion-side dedup and rolling quality metrics run as streams.

Plans (each returns an unstarted streaming DataFrame; callers pick the sink):

* ``windowed_event_counts`` — event-time tumbling window + watermark; the
  batch shape of __spark_entry__.q_windowed_events. State is bounded by the
  watermark: late rows beyond it are dropped, window state is evicted.
* ``streaming_exact_dedup`` — content-hash dedup with
  ``dropDuplicatesWithinWatermark`` (state bounded by the watermark, unlike
  a global dropDuplicates which grows forever at 10^12 docs).
* ``sessionize_events`` — custom stateful operator via
  ``applyInPandasWithState``: per-user session aggregation with a gap
  timeout, the canonical "operator Spark lacks" shape (GroupState +
  event-time timeout), Arrow-batched.

All plans work identically over file sources (tests use a parquet
directory source) and Kafka/rate sources in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling-window counts/sums with a watermark."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def streaming_exact_dedup(
    pages: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact near-real-time dedup on a content hash, state bounded by the
    watermark (the streaming face of operators/dedup.exact_duplicates)."""
    keyed = pages.withColumn("content_hash", F.xxhash64(F.col(text_col)))
    return keyed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def streaming_neardup_filter(
    pages: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    num_hashes: int = 12,
    shingle_size: int = 3,
) -> DataFrame:
    """Ingestion-side NEAR-duplicate suppression: drop a stream document
    when its full MinHash signature (over char shingles, the same
    JVM-side signature as blocking.lsh_blocking) was already seen within
    the watermark.

    Full-signature equality is the conservative streaming trade: it
    admits only near-certain duplicates (all ``num_hashes`` minima agree
    — overwhelmingly high Jaccard), needs no self-join (impossible
    incrementally), and bounds state via the watermark. Candidates below
    that bar flow through to the batch LSH pass — stream filter + batch
    sweep is the standard two-tier dedup at lake scale.
    """
    from soweego_spark.operators.blocking import minhash_signature, shingles

    sig = minhash_signature(
        shingles(F.lower(F.col(text_col)), shingle_size), num_hashes
    )
    keyed = pages.withColumn(
        "sig_key", F.xxhash64(F.concat_ws(",", sig.cast("array<string>")))
    )
    return keyed.withWatermark(
        ts_col, watermark
    ).dropDuplicatesWithinWatermark(["sig_key"])


SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_ms", LongType()),
        StructField("end_ms", LongType()),
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _session_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Gap-timeout sessionization: emit the session when the event-time
    watermark passes ``end + gap`` (state timeout), else accumulate."""
    if state.hasTimedOut:
        (start_ms, end_ms, n, total) = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(end_ms, unit="ms")],
                "n_events": [n],
                "total_value": [total],
            }
        )
        return

    start_ms, end_ms, n, total = state.get if state.exists else (None, None, 0, 0.0)
    for pdf in pdfs:
        ts_ms = (pdf["ts"].astype("int64") // 1_000_000).to_numpy()
        lo, hi = int(ts_ms.min()), int(ts_ms.max())
        start_ms = lo if start_ms is None else min(start_ms, lo)
        end_ms = hi if end_ms is None else max(end_ms, hi)
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((start_ms, end_ms, n, total))
    # Fire when the watermark passes session end + 30 min gap.
    state.setTimeoutTimestamp(end_ms + 30 * 60 * 1000)
    return
    yield  # pragma: no cover — make this a generator on the accumulate path


def sessionize_events(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Per-user gap sessionization via applyInPandasWithState."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch(
    events: DataFrame, gap_minutes: int = 30
) -> DataFrame:
    """The BATCH face of gap sessionization — exact split-on-gap
    semantics over the full history: a new session starts whenever the
    gap to the previous event (per user, ordered by (ts, event_id) so
    the ordering is total under duplicate timestamps) exceeds
    ``gap_minutes``.

    Two window passes over the same (user_id, ts) partitioning (Catalyst
    plans ONE Exchange, both windows reuse it) + one aggregation.
    Monetary totals stay in integer cents (exact, engine-portable —
    summing doubles is order-dependent); timestamps compare in exact
    microseconds.
    """
    from pyspark.sql import Window

    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_micros rejects TIMESTAMP_NTZ; the session tz is pinned to UTC
    # (session.py), so the NTZ -> TZ cast is a deterministic no-op shift
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    prev_us = F.lag(ts_us).over(w)
    is_new = (prev_us.isNull() | (ts_us - prev_us > gap_us)).cast("long")
    sess = F.sum(is_new).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        events.select(
            "user_id", "ts", "event_id",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum("cents").alias("total_cents"),
        )
    )


def read_event_stream(
    spark, path: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """File-source event stream (parquet directory; S6/S10 streaming face)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
