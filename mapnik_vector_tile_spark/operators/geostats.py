"""Spatial statistics over cell aggregates — Moran's I global spatial
autocorrelation (Moran 1950; the standard "is this map clustered or
random" diagnostic every spatial-analytics stack ships — ESDA/PySAL
`esda.Moran`, PostGIS tutorials, GeoDa).

Kept EXACT across engines by clearing denominators: with K occupied
cells, total count S, and per-cell deviation written as
(c_i·K − S)/K, the K² factors cancel in Moran's ratio

    I = (K / W) · Σ_ij w_ij dev_i dev_j / Σ_i dev_i²
      = K · NUM / (W · DEN)

where NUM = Σ over ordered rook-adjacent occupied pairs of
(c_i·K − S)(c_j·K − S), DEN = Σ (c_i·K − S)², and W = the ordered
adjacent-pair count. NUM/DEN/W/K are plain BIGINTs — the oracle
compares them exactly; the float ratio is derived with one pinned
expression shape for display.

Scale: per-cell counts are one map-side-combining aggregate over the
point table; the adjacency is a 4-way offset explode + self-equi-join
on the cell key (the sparse/occupied-cells form of the W matrix — no
dense K×K anything); the two global scalars (K, S) broadcast. At
100 TB the point scan dominates and everything downstream is
cell-table sized."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROOK = ((1, 0), (-1, 0), (0, 1), (0, -1))


def morans_i(cells: DataFrame) -> DataFrame:
    """cells: (cx, cy, c) — occupied cells with positive integer
    counts. Output ONE row: (n_cells, w_sum, num, den, i_dbl).
    i_dbl = (num·K as double) / (w_sum·den as double), evaluated with
    exactly this association in both engines (exact-rounded IEEE once
    the integer products fit — they are < 2⁶³ by the corpus bounds
    documented in the q_morans_i pair)."""
    k_s = cells.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("c").cast("long").alias("s"),
    )
    dev = cells.crossJoin(F.broadcast(k_s)).select(
        "cx", "cy", "k", "s", (F.col("c") * F.col("k") - F.col("s")).alias("dev")
    )
    offs = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in ROOK
        ]
    )
    probes = dev.select(
        "k",
        "dev",
        F.explode(offs).alias("o"),
        (F.col("cx") + F.col("o.dx")).alias("nx"),
        (F.col("cy") + F.col("o.dy")).alias("ny"),
    ).select("k", "dev", "nx", "ny")
    nbr = dev.select(
        F.col("cx").alias("nx"),
        F.col("cy").alias("ny"),
        F.col("dev").alias("ndev"),
    )
    pairs = probes.join(nbr, ["nx", "ny"])
    agg = pairs.agg(
        F.first("k").alias("n_cells"),
        F.count(F.lit(1)).cast("long").alias("w_sum"),
        F.sum(F.col("dev") * F.col("ndev")).cast("long").alias("num"),
    )
    den_df = dev.agg(F.sum(F.col("dev") * F.col("dev")).cast("long").alias("den"))
    out = agg.crossJoin(den_df)
    return out.select(
        "n_cells",
        "w_sum",
        "num",
        "den",
        (
            (F.col("num").cast("double") * F.col("n_cells").cast("double"))
            / (F.col("w_sum").cast("double") * F.col("den").cast("double"))
        ).alias("i_dbl"),
    )
