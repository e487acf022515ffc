"""Similarity search over the embeddings table (array<float>, 64-dim)
— ANN surface of the training-data pipeline (task mandate).

* brute_force_topk — exact cosine top-k via self-join; the correctness
  baseline. Dot/norm arithmetic is a sequential Column fold
  (F.aggregate over zip_with in doubles) so the DuckDB oracle can
  reproduce it; ordering uses ROUND(cos, 9) + id tiebreak so a last-ulp
  accumulation difference can't flip a rank.
* lsh_bucketed_topk — the scale path: random-hyperplane signs bucket
  vectors (vectorized numpy matmul in ONE pandas batch pass), then
  exact top-k WITHIN buckets. Recall < 1 by construction → rows-only
  driver check, recall measured in tests against brute force.
* embedding_neardup_pairs — near-duplicate pairs (cos ≥ threshold),
  the embedding leg of the dedup suite.

Scale: brute force is O(n^2) — fine for a 10^5-candidate rerank stage,
not a 10^9 index scan; the LSH variant shuffles once on bucket id and
does O(n^2 / n_buckets) work per bucket, the standard first cut before
IVF. Hyperplanes derive from a splitmix-style integer mix (seeded,
library-free) so buckets are reproducible cluster-wide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 8


def _dot(a, b) -> F.Column:
    """Sequential left-to-right double fold — same element order as the
    DuckDB oracle's list_dot_product, keeps cross-engine drift ≤ ulps
    (absorbed by ROUND at the comparison boundary)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def cosine_col(a, b) -> F.Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def brute_force_topk(emb: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k neighbors per vector: (vec_id, nbr, rnk). Self-join
    candidates; rank by rounded cosine desc, nbr asc."""
    a = emb.select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    b = emb.select(
        F.col("vec_id").alias("nbr"), F.col("embedding").alias("ne")
    )
    pairs = a.join(b, F.col("qid") != F.col("nbr")).select(
        "qid",
        "nbr",
        F.round(cosine_col(F.col("qe"), F.col("ne")), 9).alias("cos9"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos9"), F.asc("nbr"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("qid").alias("vec_id"),
            "nbr",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def _hyperplanes(dim: int, n_planes: int = N_PLANES) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from an integer mix —
    reproducible across executors/clusters with no RNG library."""
    idx = np.arange(n_planes * dim, dtype=np.uint64)
    x = (idx * np.uint64(2654435761)) % np.uint64(2**32)
    u = x.astype(np.float64) / float(2**32)
    return (u - 0.5).reshape(n_planes, dim)


def with_lsh_bucket(emb: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """bucket = sign-bit signature under n_planes hyperplanes. One
    vectorized mapInPandas pass (numpy matmul over the whole batch)."""

    def gen(batches):
        hp = None
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            if hp is None:
                hp = _hyperplanes(mat.shape[1], n_planes)
            signs = (mat @ hp.T) > 0
            bucket = (signs.astype(np.int64) << np.arange(n_planes)).sum(axis=1)
            out = pdf.copy()
            out["bucket"] = bucket
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in emb.schema.fields
    )
    return emb.mapInPandas(gen, schema=schema + ", bucket long")


def lsh_bucketed_topk(
    emb: DataFrame, k: int = 5, n_planes: int = N_PLANES
) -> DataFrame:
    """Approximate top-k: exact cosine rank within each LSH bucket.
    O(n²/B) pair work after ONE shuffle on bucket id."""
    be = with_lsh_bucket(emb, n_planes)
    a = be.select(
        F.col("bucket"),
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
    )
    b = be.select(
        F.col("bucket"),
        F.col("vec_id").alias("nbr"),
        F.col("embedding").alias("ne"),
    )
    pairs = a.join(b, "bucket").filter(F.col("qid") != F.col("nbr")).select(
        "qid",
        "nbr",
        F.round(cosine_col(F.col("qe"), F.col("ne")), 9).alias("cos9"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos9"), F.asc("nbr"))
    return (
        pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("qid").alias("vec_id"),
            "nbr",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def embedding_neardup_pairs(
    emb: DataFrame, threshold: float = 0.999
) -> DataFrame:
    """Embedding-cosine near-dup pairs (vec_a < vec_b, cos ≥ threshold).
    Broadcast-free self-join; int-pair output keeps the oracle
    hash-stable."""
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .filter(
            F.round(cosine_col(F.col("ea"), F.col("eb")), 9)
            >= F.lit(threshold)
        )
        .select("vec_a", "vec_b")
    )
