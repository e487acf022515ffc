"""Shared streaming-runner plumbing.

State-partition sizing: a Structured Streaming query creates one state
store per shuffle partition per stateful operator and commits every one
of them each micro-batch, so the per-batch FIXED cost scales with the
partition count even when the data is tiny.  Production sizes this to
executor parallelism × state volume; the in-sandbox oracle gates size
it to their few-chunk corpora.  The count is baked into the checkpoint
at first query start — pick it before launch (Spark refuses to change
it on resume)."""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

_KEY = "spark.sql.shuffle.partitions"


@contextmanager
def shuffle_partitions(spark: SparkSession, n: int | None):
    """Temporarily pin spark.sql.shuffle.partitions around a streaming
    query start/awaitTermination; always restores the previous value
    (the session-global knob must not leak past the query — the state
    partitioning is captured at query START, so the scope only needs
    to cover start())."""
    if n is None:
        yield
        return
    prev = spark.conf.get(_KEY)
    spark.conf.set(_KEY, str(int(n)))
    try:
        yield
    finally:
        spark.conf.set(_KEY, prev)
