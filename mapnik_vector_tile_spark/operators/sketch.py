"""Distinct-count sketching (KMV / k-minimum-values) — the
training-pipeline cardinality primitive (corpus audits: distinct
documents, users, urls) built so the sketch itself is CROSS-ENGINE
EXACT, unlike approx_count_distinct whose HLL register layout is
implementation-private and cannot be oracle-checked.

KMV: hash every value with the committed md5-prefix integer hash
(operators.dedup.h14, 56-bit — the same cross-engine-exact primitive
the text oracles pin), keep the k smallest DISTINCT hashes, estimate

    D̂ = (k_used − 1) · 2^56 / h_(k)

Standard error ≈ 1/√(k−2) (Bar-Yossef et al. 2002, the KMV/bottom-k
estimator). Every intermediate is integer-exact and the one float
division is replicated op-for-op in the DuckDB twin, so q_distinct_kmv
is value-hash gated, not statistically gated.

Scale shape: distinct() partial-aggregates map-side; the global
k-smallest compiles to TakeOrderedAndProject (per-partition top-k,
driver merges k rows per partition — k is tiny), NOT a full sort
shuffle; asserted in tests/test_plan_quality.py. Sketches of shards
merge by unioning hash sets and re-taking the k smallest (associative),
so the operator composes with incremental corpus builds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapnik_vector_tile_spark.operators.dedup import h14

KMV_SPACE = float(1 << 56)  # h14 hash space


def kmv_hashes(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """The k smallest distinct 56-bit hashes of ``col`` — the sketch
    itself (mergeable: union shards and re-limit)."""
    return (
        df.select(h14(F.col(col).cast("string")).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row estimate: (k, n_used, kth, est_distinct). n_used < k
    means the column had fewer distinct values than k, where KMV
    degrades gracefully toward the exact count."""
    return kmv_hashes(df, col, k).agg(
        F.lit(k).cast("int").alias("k"),
        F.count("*").cast("long").alias("n_used"),
        F.max("hv").alias("kth"),
        F.floor(
            (F.count("*") - F.lit(1)) * F.lit(KMV_SPACE) / F.max("hv")
        ).cast("long").alias("est_distinct"),
    )
