"""Streaming media feature extraction (SURVEY §2.10 + §2.11 T13/T14)
— the ingest-side twin of the batch multimodal operators: video frame
sampling and audio windowed features over a Structured Streaming
source, reusing the SAME Arrow-batched kernels
(operators.multimodal.sample_frames / audio_window_features are
stateless mapInPandas stages, so they lift onto readStream unchanged —
exactly how a training-data ingest pipeline decodes media as it
lands, instead of re-scanning the lake later).

Consistency contract (tests/test_streaming.py): replaying a chunked
parquet directory one file per micro-batch through the streaming plan
produces EXACTLY the batch operator's rows — stateless stages have no
watermark/emission subtleties, so equality is row-set equality, not a
subset relation.

Scale posture: identical to batch — one narrow decode stage per
micro-batch, no state store, no shuffle; backpressure is just file
batching. The decode cost ∝ sampled frames property (mjpeg
random-access, functions.mjpeg) matters MORE here: ingest latency is
per-micro-batch wall time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapnik_vector_tile_spark.operators import multimodal as mm
from mapnik_vector_tile_spark.sources.multimodal import (
    AUDIO_SCHEMA,
    VIDEO_SCHEMA,
)


def frame_sample_stream(
    spark: SparkSession, src_dir: str, every: int = 4
) -> DataFrame:
    """readStream over a video-table directory → sampled frames with
    mean-luma features (same output schema as the batch operator)."""
    src = (
        spark.readStream.schema(VIDEO_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    return mm.sample_frames(src, every=every)


def audio_windows_stream(
    spark: SparkSession, src_dir: str, window: int = 1024
) -> DataFrame:
    """readStream over an audio-table directory → integer-exact
    per-window energy/zero-crossing features."""
    src = (
        spark.readStream.schema(AUDIO_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    return mm.audio_window_features(src, window=window)


def run_stream_to_memory(
    out: DataFrame,
    table_name: str,
    checkpoint_dir: str | None = None,
) -> None:
    """Drain a stateless media stream into an append-mode memory sink
    (one micro-batch per source file, availableNow)."""
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
