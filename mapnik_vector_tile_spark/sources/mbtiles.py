"""MBTiles sink + source — the tile-serving interchange artifact of
the reference's ecosystem (MapBox MBTiles 1.3 spec: a SQLite file with
``tiles(zoom_level, tile_column, tile_row, tile_data)`` in TMS row
order plus a ``metadata`` name/value table; mapnik/tilelive stacks
read and write it directly). stdlib ``sqlite3`` only.

SQLite is single-writer, so ONE .mbtiles cannot be a distributed sink.
The Spark-native shape is SHARDED: repartition tiles by a shard key,
each partition writes its own spec-compliant ``part-NNNNN.mbtiles``
via foreachPartition (executor-side, no driver collect), and readers
treat the directory as one logical tile set (every shard is
independently a valid MBTiles file any standard tool opens). At 100 TB
the out_dir is shared storage (HDFS-fuse/NFS/object-store mount) and
shard count tracks the partition count; in this sandbox local[N]
shares one filesystem, which exercises the identical code path.

Coordinates: the engine is XYZ (y grows downward, like the reference);
MBTiles stores TMS (row grows upward) — the writer flips
``tile_row = 2^z - 1 - y`` on the way in and the reader flips it back,
so round-trips are identity and the FILES are what a standard viewer
expects. Round-trip byte-equality is gated by q_mbtiles_roundtrip and
tests/test_mbtiles.py.
"""

from __future__ import annotations

import json
import os
import sqlite3

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEMA_SQL = (
    "CREATE TABLE metadata (name TEXT, value TEXT);",
    "CREATE TABLE tiles (zoom_level INTEGER, tile_column INTEGER, "
    "tile_row INTEGER, tile_data BLOB);",
    "CREATE UNIQUE INDEX tile_index ON tiles "
    "(zoom_level, tile_column, tile_row);",
)


def _write_one_shard(path: str, rows, metadata: dict, attempt: str = "") -> int:
    """Write one spec-compliant .mbtiles file; returns tile count.
    The tmp name carries the task ATTEMPT id: under speculative
    execution / zombie retries two attempts of the same partition may
    run concurrently, and a shared tmp path would let one attempt
    publish the other's half-written file — per-attempt tmps make the
    os.replace race-free (last completed attempt wins atomically)."""
    tmp = f"{path}.{attempt or os.getpid()}.tmp"
    if os.path.exists(tmp):
        os.remove(tmp)
    con = sqlite3.connect(tmp)
    try:
        for stmt in _SCHEMA_SQL:
            con.execute(stmt)
        con.executemany(
            "INSERT INTO metadata (name, value) VALUES (?, ?)",
            sorted(metadata.items()),
        )
        n = 0
        for z, x, y, blob in rows:
            tms_row = (1 << z) - 1 - y  # XYZ -> TMS (spec §tiles)
            con.execute(
                "INSERT INTO tiles VALUES (?, ?, ?, ?)",
                (int(z), int(x), int(tms_row), sqlite3.Binary(bytes(blob))),
            )
            n += 1
        con.commit()
    finally:
        con.close()
    os.replace(tmp, path)  # atomic publish (idempotent re-runs)
    return n


def write_mbtiles_shards(
    tiles: DataFrame,
    out_dir: str,
    metadata: dict | None = None,
    num_shards: int | None = None,
    blob_col: str = "tile",
) -> int:
    """Distributed MBTiles sink: tiles (z, x, y, <blob_col>) →
    ``out_dir/part-NNNNN.mbtiles`` shards, one per partition, written
    executor-side (foreachPartition — no driver collect). Shards are
    hash-partitioned on (z, x, y) so re-runs place every tile in the
    same shard (idempotent: each shard file is atomically replaced).
    Returns the shard count. metadata lands in every shard (spec
    requires name/value pairs; ``format``/``name`` default to pbf)."""
    meta = {"name": "mvt-spark", "format": "pbf", "version": "1.3"}
    meta.update(metadata or {})
    meta_json = json.dumps(meta, sort_keys=True)
    os.makedirs(out_dir, exist_ok=True)
    # clear STALE shards up front: a re-run whose data leaves some hash
    # partition empty (or that uses fewer shards) would otherwise leave
    # the old file behind and readers would merge deleted tiles back in
    for f in os.listdir(out_dir):
        if f.startswith("part-") and f.endswith(".mbtiles"):
            os.remove(os.path.join(out_dir, f))
    df = tiles.select(
        F.col("z").cast("int"),
        F.col("x").cast("long"),
        F.col("y").cast("long"),
        F.col(blob_col).alias("tile"),
    )
    n = num_shards or df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(n, "z", "x", "y")

    def write_partition(it):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        rows = [(r.z, r.x, r.y, r.tile) for r in it]
        if not rows:
            return
        # stable per-tile order inside the shard: deterministic files
        rows.sort(key=lambda r: (r[0], r[1], r[2]))
        _write_one_shard(
            os.path.join(out_dir, f"part-{pid:05d}.mbtiles"),
            rows,
            json.loads(meta_json),
            attempt=str(ctx.taskAttemptId()),
        )

    df.foreachPartition(write_partition)
    return n


def read_mbtiles(spark: SparkSession, path: str) -> DataFrame:
    """MBTiles source: a single .mbtiles file OR a directory of
    shards → (z int, x long, y long, tile binary), TMS flipped back to
    the engine's XYZ. Files parallelize across tasks (one file per
    input row); each file's rows stream through Arrow batches."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".mbtiles")
        )
    else:
        files = [path]
    if not files:
        raise ValueError(f"read_mbtiles: no .mbtiles files under {path!r}")

    BATCH = 2048  # rows per Arrow batch: stream big shards, never
    # fetchall() a multi-GB tile table into one Python list

    def gen(it):
        for pdf in it:
            for fpath in pdf["path"]:
                con = sqlite3.connect(fpath)
                try:
                    cur = con.execute(
                        "SELECT zoom_level, tile_column, tile_row, tile_data "
                        "FROM tiles ORDER BY zoom_level, tile_column, tile_row"
                    )
                    while True:
                        rows = cur.fetchmany(BATCH)
                        if not rows:
                            break
                        yield pd.DataFrame(
                            {
                                "z": [int(r[0]) for r in rows],
                                "x": [int(r[1]) for r in rows],
                                "y": [
                                    (1 << int(r[0])) - 1 - int(r[2])
                                    for r in rows
                                ],
                                "tile": [bytes(r[3]) for r in rows],
                            }
                        )
                finally:
                    con.close()

    paths = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(min(len(files), 32))
    return paths.mapInPandas(
        gen, schema="z int, x long, y long, tile binary"
    )


def read_metadata(path: str) -> dict:
    """Driver-side metadata peek of one shard/file (tiny table)."""
    if os.path.isdir(path):
        files = sorted(
            f for f in os.listdir(path) if f.endswith(".mbtiles")
        )
        if not files:
            raise ValueError(f"read_metadata: no shards under {path!r}")
        path = os.path.join(path, files[0])
    con = sqlite3.connect(path)
    try:
        return dict(con.execute("SELECT name, value FROM metadata"))
    finally:
        con.close()
