#!/usr/bin/env python
"""spark-submit entry point for the streaming leg (SURVEY.md §2.10):

    spark-submit --py-files mvt_spark.zip jobs/stream_pipeline.py \\
        --events <parquet dir, new files = micro-batches> \\
        --out    <re-rendered tile store> \\
        --checkpoint <streaming checkpoint dir> --z 8

Watermarked dedupe -> stateful dirty-tile counter
(applyInPandasWithState) -> foreachBatch re-encode of ONLY the
ticketed tiles through the batch EP1 encoder. Kill and rerun with the
same --checkpoint to resume exactly-once from the state store.

Local smoke (synthesizes a chunked event store when --events is
omitted):
    python jobs/stream_pipeline.py --out /tmp/retile --z 6
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", default=None,
                    help="parquet dir streamed file-by-file (default: "
                         "synthesize chunks from the sf0.001 events table)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--z", type=int, default=8)
    ap.add_argument("--dirty-every", type=int, default=5)
    ap.add_argument("--overzoom-dz", type=int, default=0,
                    help="also refresh each dirty parent's served "
                         "z+1..z+dz children per micro-batch "
                         "(appended to <out>_overzoom)")
    args = ap.parse_args()

    from mapnik_vector_tile_spark.session import get_spark
    from mapnik_vector_tile_spark.streaming import incremental as S

    spark = get_spark("mvt-stream-pipeline")
    src = args.events
    if src is None:
        src = os.path.join(args.out + "_src", "chunks")
        os.makedirs(src, exist_ok=True)
        ev = spark.read.parquet(
            "/root/testdata/sf0.001/events.parquet"
        ).orderBy("event_id")
        pdf = ev.toPandas()
        n = len(pdf)
        cuts = [0, n // 3, 2 * n // 3, n]
        for i in range(3):
            pdf.iloc[cuts[i]:cuts[i + 1]].to_parquet(
                f"{src}/chunk{i}.parquet",
                coerce_timestamps="us",
                allow_truncated_timestamps=True,
            )
        print(f"synthesized 3-chunk event store at {src}")

    S.run_incremental_retile(
        spark, src, args.out,
        z=args.z, dirty_every=args.dirty_every,
        checkpoint_dir=args.checkpoint,
        overzoom_dz=args.overzoom_dz,
    )
    if os.path.isdir(args.out):
        n_tiles = spark.read.parquet(args.out).count()
        print(f"re-rendered tile rows in {args.out}: {n_tiles}")
    else:
        print(f"no tiles re-rendered this run ({args.out} absent)")
    if args.overzoom_dz > 0:
        # a fully-committed checkpoint (resume no-op) or a run whose
        # tiles never crossed dirty_every produces NO children dir
        oz = args.out + "_overzoom"
        if os.path.isdir(oz):
            n_kids = spark.read.parquet(oz).count()
            print(f"re-rendered child rows in {oz}: {n_kids}")
        else:
            print(f"no child refreshes this run ({oz} absent)")
    spark.stop()


if __name__ == "__main__":
    main()
