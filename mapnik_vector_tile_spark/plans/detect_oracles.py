"""Oracle pairs for detection-style image-ML post-processing.

Same contract as `plans.text_oracles.pairs()`: each entry maps a
query key to (spark_fn, duckdb_sql). The corpora are derived
deterministically from the driver's parquet tables through the
committed splitmix64 mix, so both engines synthesize IDENTICAL
inputs and the value hash is a real end-to-end witness."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# q_nms — greedy per-image non-maximum suppression (detector post-filter)
# ---------------------------------------------------------------------------

NMS_IMGS = 256
NMS_PCT = 50


def q_nms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy NMS (operators/detect.nms_boxes) with a FULL oracle.

    Corpus: one synthetic detection per orders row — image_id =
    o_orderkey % 256 (~58 boxes/image at sf0.01, heavy overlap
    pressure on a 1000 px canvas), box geometry and score hash-derived
    through splitmix64. The DuckDB twin replays the exact sequential
    greedy through a recursive CTE carrying the KEPT box lists —
    score-descending order means one wrong early keep cascades into
    different later suppressions, so the per-image (kh, ka) pair is
    sequence-sensitive."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from mapnik_vector_tile_spark.operators.detect import nms_boxes

    det_t = StructType(
        [
            StructField("x0", LongType()),
            StructField("y0", LongType()),
            StructField("x1", LongType()),
            StructField("y1", LongType()),
            StructField("score", LongType()),
        ]
    )

    def _det_kernel(k):
        import numpy as np

        from mapnik_vector_tile_spark.sources.synth import splitmix64

        h = splitmix64(k.to_numpy(np.uint64))
        x0 = (h % np.uint64(800)).astype(np.int64)
        y0 = ((h >> np.uint64(12)) % np.uint64(800)).astype(np.int64)
        w = (
            np.uint64(16) + (h >> np.uint64(24)) % np.uint64(200)
        ).astype(np.int64)
        ht = (
            np.uint64(16) + (h >> np.uint64(36)) % np.uint64(200)
        ).astype(np.int64)
        score = ((h >> np.uint64(46)) % np.uint64(1000000)).astype(np.int64)
        return pd.DataFrame(
            {
                "x0": x0,
                "y0": y0,
                "x1": x0 + w,
                "y1": y0 + ht,
                "score": score,
            }
        )

    det = F.pandas_udf(_det_kernel, det_t)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("id")
    )
    dets = orders.select(
        (F.col("id") % F.lit(NMS_IMGS)).alias("image_id"),
        F.col("id").alias("det_id"),
        det(F.col("id")).alias("d"),
    ).select(
        "image_id", "det_id", "d.x0", "d.y0", "d.x1", "d.y1", "d.score"
    )
    return nms_boxes(dets, NMS_PCT)


def _sql_nms(n_imgs: int = NMS_IMGS, pct: int = NMS_PCT) -> str:
    from mapnik_vector_tile_spark.plans.oracle_pairs import splitmix64_sql

    sm = splitmix64_sql("id")
    # candidate box pulled from the pack arrays at walk position i+1
    cx0, cy0 = "p.ax0[w.i + 1]", "p.ay0[w.i + 1]"
    cx1, cy1 = "p.ax1[w.i + 1]", "p.ay1[w.i + 1]"
    # suppress iff inter·(100+pct) > pct·(areaKept + areaCand):
    # division-free integer IoU-above-threshold, strict (boundary kept)
    hit = f"""len([j FOR j IN generate_series(1, len(w.kx0))
        IF greatest(0, least(w.kx1[j], {cx1}) - greatest(w.kx0[j], {cx0}))
           * greatest(0, least(w.ky1[j], {cy1}) - greatest(w.ky0[j], {cy0}))
           * {100 + pct}
           > {pct} * ((w.kx1[j] - w.kx0[j]) * (w.ky1[j] - w.ky0[j])
                      + ({cx1} - {cx0}) * ({cy1} - {cy0}))]) > 0"""
    return f"""
WITH RECURSIVE hh AS (
  SELECT o_orderkey AS id, {sm} AS h FROM orders),
det0 AS (
  SELECT id % {n_imgs} AS image_id, id AS det_id,
         CAST(h % 800 AS BIGINT) AS x0,
         CAST((h // 4096) % 800 AS BIGINT) AS y0,
         CAST(16 + (h // 16777216) % 200 AS BIGINT) AS bw,
         CAST(16 + (h // 68719476736) % 200 AS BIGINT) AS bh,
         CAST((h // 70368744177664) % 1000000 AS BIGINT) AS score
  FROM hh),
det AS (
  SELECT image_id, det_id, x0, y0, x0 + bw AS x1, y0 + bh AS y1, score
  FROM det0),
packs AS MATERIALIZED (
  SELECT image_id, COUNT(*) AS n,
         list(x0 ORDER BY score DESC, det_id) AS ax0,
         list(y0 ORDER BY score DESC, det_id) AS ay0,
         list(x1 ORDER BY score DESC, det_id) AS ax1,
         list(y1 ORDER BY score DESC, det_id) AS ay1,
         list(det_id ORDER BY score DESC, det_id) AS aid
  FROM det GROUP BY image_id),
walk(image_id, i, kx0, ky0, kx1, ky1, kh, ka, n_kept) AS (
  SELECT image_id, 0,
         CAST([] AS BIGINT[]), CAST([] AS BIGINT[]),
         CAST([] AS BIGINT[]), CAST([] AS BIGINT[]),
         CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  FROM packs
  UNION ALL
  SELECT w.image_id, w.i + 1,
         CASE WHEN hit THEN kx0 ELSE list_append(kx0, ccx0) END,
         CASE WHEN hit THEN ky0 ELSE list_append(ky0, ccy0) END,
         CASE WHEN hit THEN kx1 ELSE list_append(kx1, ccx1) END,
         CASE WHEN hit THEN ky1 ELSE list_append(ky1, ccy1) END,
         CASE WHEN hit THEN kh
              ELSE kh + (cid * 2654435761) % 2147483648 END,
         CASE WHEN hit THEN ka
              ELSE ka + (ccx1 - ccx0) * (ccy1 - ccy0) END,
         CASE WHEN hit THEN n_kept ELSE n_kept + 1 END
  FROM (
    SELECT w.*, p.n,
           {cx0} AS ccx0, {cy0} AS ccy0,
           {cx1} AS ccx1, {cy1} AS ccy1,
           p.aid[w.i + 1] AS cid,
           {hit} AS hit
    FROM walk w JOIN packs p ON p.image_id = w.image_id
    WHERE w.i < p.n) w
)
SELECT w.image_id, CAST(p.n AS BIGINT) AS n_dets, w.n_kept, w.kh, w.ka
FROM walk w JOIN packs p ON p.image_id = w.image_id
WHERE w.i = p.n
"""


def pairs() -> dict[str, tuple[Callable, str | None]]:
    return {
        "q_nms": (q_nms, _sql_nms()),
    }
