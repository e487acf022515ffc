"""Hive-partitioned parquet tile store (S6 companion).

The cluster-native layout next to the serving artifacts (MBTiles /
PMTiles / WebDataset): tiles land in ``path/z=<k>/part-*.parquet`` so
every downstream reader gets PARTITION PRUNING on zoom for free
(Catalyst's PartitionFilters — a z=14-only job never opens low-zoom
files), and rows are sorted by (x, y) within files so tile-range
predicates prune at the parquet ROW-GROUP level too (min/max stats) —
the same two-level pruning the decode-scan plan test asserts.

Why repartition("z") before the write: partitionBy alone makes every
task emit one file per zoom it happens to hold (tasks × zooms small
files — the classic small-file problem); repartitioning on z first
gives one writer per zoom, and AQE coalesces skewed zoom sizes.
At 100 TB you'd widen to repartition(n, "z", bucket(x)) — the layout
contract (directory per z, sorted files) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_tile_store(tiles: DataFrame, path: str) -> None:
    """Write (z, x, y, tile) as a z-partitioned, (x, y)-sorted parquet
    store. Overwrites."""
    (
        tiles.repartition("z")
        .sortWithinPartitions("x", "y")
        .write.partitionBy("z")
        .mode("overwrite")
        .parquet(path)
    )


def read_tile_store(spark: SparkSession, path: str) -> DataFrame:
    """Read the store back; z returns as a partition column. Filters
    on z become PartitionFilters (directory pruning), filters on x/y
    prune row groups via the sorted min/max stats."""
    return spark.read.parquet(path)
