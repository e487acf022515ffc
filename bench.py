#!/usr/bin/env python
"""Benchmark driver (repo contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full execution with a noop sink (measures the
distributed plan; no result transfer to the driver). Extra keys
(rows, rows_per_sec, cpus) are informational.

Scaling evidence: `python bench.py --cpus 8` vs `--cpus 32` on the
same input is this sandbox's stand-in for the north_rule's N vs 4N
executor runs; BENCH/BASELINE.md records both + efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=None,
                    help="override local[N] (default: $SPARK_GRAFT_CPUS or *)")
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset of query names")
    ap.add_argument("--repeat", type=int, default=3,
                    help="suite passes; per-query min across passes is "
                         "reported (default 3, repeat-major: this "
                         "host's noise arrives in multi-minute bursts, "
                         "see BASELINE.md §4.3/§4.0d)")
    ap.add_argument("--no-warmup", action="store_true",
                    help="skip the untimed session warm-up job")
    args = ap.parse_args()

    from mapnik_vector_tile_spark.plans.bench_queries import registry
    from mapnik_vector_tile_spark.session import get_spark

    spark = get_spark("mvt-spark-bench", cores=args.cpus)
    reg = registry()
    if args.queries:
        want = args.queries.split(",")
        reg = {k: reg[k] for k in want}

    if not args.no_warmup:
        _warmup(spark)

    sf = _sf_of(args.sf_dir)
    # REPEAT-MAJOR ordering: run the whole suite as full passes and
    # take each query's min ACROSS passes. This host's noise arrives
    # in multi-minute bursts (BASELINE §4.3/§4.0d: same-code spreads
    # up to 7×); back-to-back repeats of one query sit inside the same
    # burst and both readings are poisoned, while pass-interleaved
    # repeats give every query a sample from each weather window.
    times: dict[str, float] = {}
    for _ in range(max(1, args.repeat)):
        for name, fn in reg.items():
            t0 = time.monotonic()
            df = fn(spark, args.sf_dir)
            # noop sink: full distributed execution, zero driver collect
            df.write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            times[name] = min(times.get(name, float("inf")), dt)
    times = {k: round(v, 3) for k, v in times.items()}
    total = round(sum(times.values()), 3)

    out = {
        "metric": "headline_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "cpus": spark.sparkContext.defaultParallelism,
    }
    out.update(_scaling_evidence())
    print(json.dumps(out))
    spark.stop()


def _scaling_evidence() -> dict:
    """Attach the committed N→4N scaling witness (jobs/bench_scaling.py
    pinned-median protocol, BASELINE.md §4.0) so every BENCH record
    carries the north_rule two-cluster-size evidence alongside the
    single-invocation suite numbers."""
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "bench_results", "scaling_1v4_r5.json",
    )
    try:
        with open(path) as f:
            d = json.load(f)
        return {
            "scaling_pair_cores": [lv["cores"] for lv in d["levels"]],
            "scaling_throughput_per_s": [
                lv["throughput_per_s"] for lv in d["levels"]
            ],
            "scaling_efficiency": d["scaling_efficiency"],
        }
    except (OSError, KeyError, ValueError):
        return {}


def _warmup(spark) -> None:
    """One small untimed end-to-end job so JIT/codegen compilation and
    Python-worker forks are paid before the first timed query (the
    first Spark job of a session otherwise carries ~10-15 s of one-off
    session warm-up that no steady-state executor would see)."""
    from mapnik_vector_tile_spark.operators import tiling as T
    from mapnik_vector_tile_spark.sources.synth import images_df

    imgs = images_df(spark, 2000, with_bytes=False)
    feats = T.assign_tiles(T.images_to_features(imgs), 0, 4)
    tiles = T.fold_tiles(T.encode_layers(feats))
    T.decode_tiles_to_features(tiles).write.format("noop").mode(
        "overwrite"
    ).save()


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return -1.0


if __name__ == "__main__":
    main()
