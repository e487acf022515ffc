"""Trending-tiles leg (SURVEY.md §2.10) — the ops dashboard every
tile platform runs: which map tiles are hottest per time window
(cache pre-warm, abuse detection, editorial "what's active now").

One plan function serves BOTH engines' modes: as a batch DataFrame it
computes all windows; under readStream + watermark the same groupBy
(window, tile) aggregation emits each window's tile counts when the
watermark closes it (append mode).  The top-k RANK is deliberately a
second, serving-side step (`topk_trending`) — streaming append mode
cannot rank across rows of a closing window, and the k rows per
window are a trivial batch query over the sink table; the streaming
test pins stream-sink + rank == batch twin exactly.

Scale: state is one row per (open window, active tile) — bounded by
active tiles per window horizon, evicted at watermark; the shuffle
key (window, tx, ty) is the natural partitioning with no additional
skew beyond tile popularity itself (the same z6+ bound as the batch
pyramid; salt lower zooms upstream if ever needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapnik_vector_tile_spark.streaming.incremental import (
    _event_points,
    with_tile,
)

TREND_Z = 6
TREND_WINDOW = "1 hour"
TREND_K = 3


def trending_counts(
    events: DataFrame,
    z: int = TREND_Z,
    window_len: str = TREND_WINDOW,
    watermark: str | None = None,
) -> DataFrame:
    """Per (tumbling window, tile): event count + min event id.
    Batch and streaming share this exact plan; pass `watermark` only
    on the streaming side."""
    pts = with_tile(_event_points(events), z)
    if watermark is not None:
        pts = pts.withWatermark("ts", watermark)
    return pts.groupBy(
        F.window("ts", window_len).alias("win"), "tx", "ty"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min("event_id").cast("long").alias("min_id"),
    )


def topk_trending(counts: DataFrame, k: int = TREND_K) -> DataFrame:
    """Serving-side rank over the (window, tile) count table:
    top-k tiles per window by (n_events DESC, tx, ty) — the
    deterministic tie order both engines replay."""
    w = Window.partitionBy("wstart").orderBy(
        F.col("n_events").desc(), "tx", "ty"
    )
    flat = counts.select(
        F.unix_timestamp(F.col("win.start")).cast("long").alias("wstart"),
        "tx",
        "ty",
        "n_events",
        "min_id",
    )
    return (
        flat.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def batch_trending_topk(
    spark: SparkSession, sf_dir: str, z: int = TREND_Z, k: int = TREND_K
) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return topk_trending(trending_counts(ev, z), k)


def run_trending_stream_to_memory(
    spark: SparkSession,
    src_dir: str,
    table_name: str = "stream_trending",
    watermark: str = "30 minutes",
    checkpoint_dir: str | None = None,
):
    """readStream(parquet chunks) → windowed tile counts → memory
    sink (append mode: rows land when the watermark closes their
    window).  Runs the availableNow trigger to completion (the
    memory table is fully populated on return) and returns the
    finished StreamingQuery handle so callers can inspect
    lastProgress / recentProgress or stop() it."""
    from mapnik_vector_tile_spark.streaming.incremental import (
        EVENTS_SCHEMA,
    )

    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    counts = trending_counts(src, watermark=watermark)
    writer = (
        counts.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return q


def run_trending_topk_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    k: int = TREND_K,
    watermark: str = "30 minutes",
    checkpoint_dir: str | None = None,
):
    """The END-TO-END serving leg (SURVEY §2.10): readStream →
    watermarked window counts → a foreachBatch RANKING sink.  Each
    micro-batch delivers rows of windows the watermark just CLOSED
    (append mode); the sink appends them to the durable count store
    (<out_dir>/counts) and republishes the serving artifact
    (<out_dir>/topk) by re-ranking the store with the SAME
    topk_trending plan the batch engine uses — so the serving table
    equals the batch top-k exactly once the stream drains (pinned by
    tests/test_streaming.py).

    Scale: the store grows one row per (closed window, active tile)
    — the z6+ tile-count bound per window, not event volume; the
    re-rank is a window function over that bounded store (partition
    by window start).  Runs the availableNow trigger to completion
    and returns the finished StreamingQuery handle."""
    from mapnik_vector_tile_spark.streaming.incremental import (
        EVENTS_SCHEMA,
    )

    src = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    counts = trending_counts(src, watermark=watermark)

    def publish(batch_df, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(f"{out_dir}/counts")
        store = batch_df.sparkSession.read.parquet(f"{out_dir}/counts")
        topk_trending(store, k).write.mode("overwrite").parquet(
            f"{out_dir}/topk"
        )

    writer = (
        counts.writeStream.foreachBatch(publish)
        .outputMode("append")
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    q.awaitTermination()
    return q
