"""Streaming exact dedup (SURVEY.md §2.10) — at-least-once delivery
repair: drop retransmitted rows by key inside the watermark horizon
using Spark's ``dropDuplicatesWithinWatermark``, so the dedup state
the engine keeps is BOUNDED BY TIME, not by stream length — the only
shape that survives an unbounded 100 TB/day feed (a plain
``dropDuplicates`` on a stream keeps every key forever).

Semantics contract (pinned by the batch-twin test): within the
watermark horizon the FIRST arrival of each key is emitted and later
copies are dropped; a duplicate arriving after state for its key has
been evicted (later than the watermark allows) would re-emit — the
documented at-least-once residual every watermarked dedup has. The
batch twin is exact first-occurrence dedup, so stream == twin exactly
when every replay sits inside the horizon (the driver corpus does).

Scale: state is hash-partitioned on the dedup key — the same shuffle
key either path uses; eviction follows the event-time watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapnik_vector_tile_spark.streaming.incremental import EVENTS_SCHEMA


def dedup_stream(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watermarked exact dedup of a streaming DataFrame."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def batch_first_occurrence(
    events: DataFrame, key_cols: tuple[str, ...] = ("event_id",)
) -> DataFrame:
    """Batch twin: exact first-occurrence dedup (min event-time row
    per key, ties by the full row struct for determinism)."""
    others = [c for c in events.columns if c not in key_cols]
    packed = events.groupBy(*key_cols).agg(
        F.min(F.struct("ts", *[c for c in others if c != "ts"])).alias("r")
    )
    return packed.select(
        *key_cols, *[F.col(f"r.{c}") for c in ["ts"] + [c for c in others if c != "ts"]]
    )


def run_dedup_stream_to_memory(
    spark: SparkSession,
    src_dir: str,
    table_name: str = "stream_dedup",
    watermark: str = "30 minutes",
    checkpoint_dir: str | None = None,
) -> None:
    """Drive the file-source stream to completion (availableNow) into
    a memory sink — the test/verification harness entry."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        dedup_stream(stream, watermark=watermark)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .option(
            "checkpointLocation",
            # uuid, not id(): CPython reuses addresses across processes
            # and a recycled path would silently resume STALE offsets
            # and skip this run's input
            checkpoint_dir or f"/tmp/mvt_dedup_ckpt_{__import__('uuid').uuid4().hex}",
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
