"""Flagship end-to-end query (SURVEY.md §7 minimum slice, EP1 shape):

derive a point footprint per orders row, assign it to its z14 tile and
every ancestor z0..z13 (J1 inversion: feature -> explode(covering
tiles) -> groupBy tile), and report per-tile feature counts.

Written in DataFrame API (not SQL) — Catalyst sees a scan with column
pruning (only o_orderkey read), a narrow projection chain, one explode,
and ONE shuffle (the groupBy). This is the plan shape that survives
100TB: partial aggregation map-side, AQE coalescing after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapnik_vector_tile_spark.functions.tilemath import W

TWO_W = 2.0 * W


def derive_points(df: DataFrame, key: str) -> DataFrame:
    """Deterministic mercator point per integer key (same arithmetic as
    plans.shared_sql.point_cte)."""
    k = F.col(key)
    mx = (((k * F.lit(2654435761)) % F.lit(4294967296)) / F.lit(4294967296.0)) * F.lit(
        TWO_W
    ) - F.lit(W)
    my = (
        ((k * F.lit(1103515245) + F.lit(12345)) % F.lit(4294967296))
        / F.lit(4294967296.0)
    ) * F.lit(TWO_W) - F.lit(W)
    return df.select(k.alias("id"), mx.alias("mx"), my.alias("my"))


def pyramid_counts(spark: SparkSession, sf_dir: str, z_max: int = 14) -> DataFrame:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pts = derive_points(orders, "o_orderkey")
    span14 = TWO_W / (1 << z_max)
    t14 = pts.select(
        F.floor((F.col("mx") + F.lit(W)) / F.lit(span14)).alias("tx"),
        F.floor((F.lit(W) - F.col("my")) / F.lit(span14)).alias("ty"),
    )
    # ancestor pyramid: tx >> (z_max - z); shiftright is exact for the
    # non-negative tile coords
    zs = F.explode(F.sequence(F.lit(0), F.lit(z_max))).alias("z")
    pyr = t14.select("tx", "ty", zs).select(
        F.col("z"),
        F.expr(f"shiftright(tx, {z_max} - z)").alias("x"),
        F.expr(f"shiftright(ty, {z_max} - z)").alias("y"),
    )
    return pyr.groupBy("z", "x", "y").agg(F.count("*").alias("n_features"))
