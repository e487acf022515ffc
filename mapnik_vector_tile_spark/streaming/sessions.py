"""Streaming session windows (SURVEY.md §2.10) — the stream twin of
operators.temporal.sessionize, using Spark's built-in
``session_window`` so merge/state/watermark semantics come from the
engine, not custom state code.

Semantics note (asserted by the consistency test, not assumed):
``session_window(ts, gap)`` keeps an event in the current session iff
``t - prev < gap`` (the window end ``prev + gap`` is exclusive), while
``sessionize`` splits on ``t - prev > gap`` — they can only disagree
for a pair at an EXACT multiple-of-gap spacing, which microsecond
event times never hit on the driver corpus (verified; a synthetic
integer-second corpus could, so the test gates it).

Scale: session state is per active (user, open-window) pair and is
evicted once the watermark passes a window's end — bounded by live
users, not by events. The shuffle key is the user id, same skew bound
as the batch path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapnik_vector_tile_spark.streaming.incremental import EVENTS_SCHEMA

SESSION_GAP = "4 hours"


def session_counts(events: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """Per (user, gap-session): event count, span, min event id.
    Works identically as a batch plan (all sessions) and a streaming
    plan (sessions emitted when the watermark closes them)."""
    return events.groupBy(
        F.session_window("ts", gap).alias("win"), "user_id"
    ).agg(
        F.count("*").alias("n_events"),
        F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))").alias(
            "dur_us"
        ),
        F.min("event_id").alias("min_id"),
    )


def batch_session_counts(
    spark: SparkSession, sf_dir: str, gap: str = SESSION_GAP
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return session_counts(ev, gap).select(
        "user_id", "n_events", "dur_us", "min_id"
    )


def run_sessions_stream_to_memory(
    spark: SparkSession,
    src_dir: str,
    table_name: str = "stream_sessions",
    gap: str = SESSION_GAP,
    watermark: str = "30 minutes",
    checkpoint_dir: str | None = None,
) -> None:
    """Replay a chunked events directory one file per micro-batch into
    an append-mode memory sink. Append mode emits a session only once
    the watermark passes its end — sessions still open at end-of-replay
    stay in state (the consistency test treats the emission as a
    subset of the batch result, which is exactly the contract)."""
    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    out = session_counts(src.withWatermark("ts", watermark), gap)
    writer = (
        out.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
