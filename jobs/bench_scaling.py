#!/usr/bin/env python
"""Scaling-efficiency evidence for the north_rule (BASELINE.md §3).

The rule demands ≥0.8 throughput scaling efficiency between N and 4N
executors. No real cluster exists in this sandbox, so per the driver
note we run the SAME job on the SAME materialized input at two
parallelism levels (local[8] vs local[32]) in fresh JVMs and report

    scaling_efficiency = T_32 / (4 · T_8)

where T_c = (tiles emitted + join output rows) / wall seconds — the
north metric's unit of work.  Each level: 1 warm-up + R timed runs,
median reported.  Input is materialized to parquet once (outside the
timed region) so every run reads identical bytes.

Usage:
    python jobs/bench_scaling.py --out /tmp/scaling \
        [--n-images 30000] [--z-max 9] [--cores 8,32] [--repeat 3]

Each child process is `python jobs/bench_scaling.py --worker ...` —
a fresh JVM per core count, because a Spark master can't change
in-process.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_regions(spark, n_regions: int = 64):
    """Deterministic mercator rectangles derived from a hash of the
    region index — same recipe as operators.joins.merc_rect_regions but
    self-contained (no testdata dependency)."""
    from pyspark.sql import functions as F

    from mapnik_vector_tile_spark.functions import tilemath as tm

    two_w = 2.0 * tm.W
    k = F.col("id").cast("long")
    cx = (((k * 2654435761) % 4294967296) / F.lit(float(2**32))) * F.lit(
        two_w
    ) - F.lit(tm.W)
    cy = (((k * 40503 + 7) % 65536) / F.lit(65536.0)) * F.lit(two_w) - F.lit(
        tm.W
    )
    hw = F.lit(400000.0) + (k % 11).cast("double") * F.lit(250000.0)
    r = spark.range(n_regions).select(
        k.alias("region_id"), cx.alias("cx"), cy.alias("cy"), hw.alias("hw")
    )
    return r.select(
        "region_id",
        F.array(
            F.col("cx") - F.col("hw"),
            F.col("cx") + F.col("hw"),
            F.col("cx") + F.col("hw"),
            F.col("cx") - F.col("hw"),
            F.col("cx") - F.col("hw"),
        ).alias("xs"),
        F.array(
            F.col("cy") - F.col("hw"),
            F.col("cy") - F.col("hw"),
            F.col("cy") + F.col("hw"),
            F.col("cy") + F.col("hw"),
            F.col("cy") - F.col("hw"),
        ).alias("ys"),
        F.array(F.lit(0), F.lit(5)).alias("ring_offsets"),
    )


def run_once(spark, images_path: str, z_max: int, n_regions: int) -> dict:
    """One full unit of north-metric work; returns counts + wall."""
    from pyspark.sql import functions as F

    from mapnik_vector_tile_spark.functions import geomcodec as gc
    from mapnik_vector_tile_spark.operators import joins as J
    from mapnik_vector_tile_spark.operators import tiling as T

    t0 = time.monotonic()
    images = spark.read.parquet(images_path)
    feats = T.assign_tiles(T.images_to_features(images), 0, z_max)
    tiles = T.encode_tiles(feats)
    n_tiles = tiles.count()

    feats2 = T.images_to_features(spark.read.parquet(images_path))
    pts = feats2.filter(F.col("geom_type") == gc.GEOM_POINT).select(
        F.col("feature_id").alias("id"),
        F.col("xs")[0].alias("mx"),
        F.col("ys")[0].alias("my"),
    )
    regions = build_regions(spark, n_regions)
    n_join = J.pip_join_broadcast(pts, regions, z=6).count()
    wall = time.monotonic() - t0
    return {"tiles": n_tiles, "join_rows": n_join, "wall_s": wall}


def worker(args) -> None:
    from mapnik_vector_tile_spark.session import get_spark

    spark = get_spark("bench-scaling", cores=args.cores)
    results = []
    for i in range(args.repeat + 1):  # first is warm-up
        # settle the JVM between runs: a major GC here beats an
        # unpredictable one landing inside the timed region
        spark.sparkContext._jvm.System.gc()
        r = run_once(spark, args.input, args.z_max, args.n_regions)
        r["warmup"] = i == 0
        results.append(r)
        print(json.dumps(r), file=sys.stderr)
    timed = [r for r in results if not r["warmup"]]
    walls = [r["wall_s"] for r in timed]
    work = timed[0]["tiles"] + timed[0]["join_rows"]
    med = statistics.median(walls)
    out = {
        "cores": args.cores,
        "tiles": timed[0]["tiles"],
        "join_rows": timed[0]["join_rows"],
        "work_units": work,
        "wall_s_runs": [round(w, 2) for w in walls],
        "wall_s_median": round(med, 2),
        "throughput_per_s": round(work / med, 1),
    }
    print(json.dumps(out))
    spark.stop()


def orchestrate(args) -> None:
    os.makedirs(args.out, exist_ok=True)
    images_path = os.path.join(
        args.out, f"images_n{args.n_images}.parquet"
    )
    if not os.path.exists(images_path):
        from mapnik_vector_tile_spark.session import get_spark
        from mapnik_vector_tile_spark.sources.synth import images_df

        spark = get_spark("bench-scaling-prep")
        images_df(spark, args.n_images).write.mode("overwrite").parquet(
            images_path
        )
        spark.stop()
        print(f"prepared {images_path}", file=sys.stderr)

    levels = [int(c) for c in args.cores.split(",")]
    per_level: dict[int, dict] = {}
    for c in levels:
        # Pin the WHOLE process tree (JVM + Python workers) to exactly c
        # CPUs: in unpinned local[c] mode, GC/shuffle/netty threads and
        # Python daemons spill onto idle cores, so a "local[8]" run on a
        # 32-core host silently uses >8 CPUs and the N-vs-4N comparison
        # is not core-proportional. A cluster executor host runs
        # everything inside its core allocation — taskset reproduces
        # that boundary.
        cmd = [
            "taskset", "-c", f"0-{c - 1}",
            sys.executable, os.path.abspath(__file__), "--worker",
            "--cores", str(c), "--input", images_path,
            "--z-max", str(args.z_max), "--n-regions", str(args.n_regions),
            "--repeat", str(args.repeat),
        ]
        print(f"--- local[{c}] ---", file=sys.stderr)
        proc = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO, check=False
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise SystemExit(f"worker local[{c}] failed")
        per_level[c] = json.loads(proc.stdout.strip().splitlines()[-1])
        print(json.dumps(per_level[c]), file=sys.stderr)

    report = {"levels": [per_level[c] for c in levels],
              "n_images": args.n_images, "z_max": args.z_max}
    if len(levels) == 2:
        lo, hi = levels
        t_lo = per_level[lo]["throughput_per_s"]
        t_hi = per_level[hi]["throughput_per_s"]
        ratio = hi / lo
        report["scaling_efficiency"] = round(t_hi / (ratio * t_lo), 3)
        report["core_ratio"] = ratio
    print(json.dumps(report))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--out", default="/tmp/scaling")
    ap.add_argument("--input", default=None)
    ap.add_argument("--n-images", type=int, default=30000)
    ap.add_argument("--z-max", type=int, default=9)
    ap.add_argument("--n-regions", type=int, default=64)
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()
    if args.worker:
        args.cores = int(args.cores)
        worker(args)
    else:
        orchestrate(args)


if __name__ == "__main__":
    main()
