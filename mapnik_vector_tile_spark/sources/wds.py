"""WebDataset tar shard sink + source — the de-facto interchange
format for image+caption training corpora at 10^12-sample scale
(webdataset/webdataset convention: a POSIX tar whose members group by
basename, one sample = ``{key}.{ext}`` payload + ``{key}.txt`` caption
+ ``{key}.json`` metadata; loaders stream shards sequentially, so
locality comes from sharding, not random access). stdlib ``tarfile``
only — no external deps.

This is the sink the north rule's input table feeds INTO: training
jobs consume (image bytes, caption) pairs as sequential tar shards,
and the engine's job is to produce those shards FROM the Iceberg-shaped
``images`` table (image_id, bytes, w, h, fmt, caption, phash) without
ever collecting to the driver.

Distribution shape (same posture as sources/mbtiles.py, the template):
hash-partition samples by key so re-runs place every sample in the
same shard; each partition writes its own ``part-NNNNN.tar``
executor-side via foreachPartition; per-attempt tmp names + atomic
``os.replace`` publish make speculative/zombie retries race-free and
re-runs idempotent. At 100 TB out_dir is shared storage and the shard
count tracks partitions; local[N] exercises the identical code path.

Byte-determinism: members are sorted by key, all tar headers are
pinned (mtime 0, uid/gid 0, empty uname/gname, mode 0o644, USTAR),
and the metadata JSON is sorted-keys/compact — two runs over the same
rows produce BYTE-IDENTICAL shard files (q_wds_roundtrip's full-join
gate then certifies read-back equality, and tests pin shard digests).

Reader scope: shards this sink wrote plus any foreign uncompressed
tar following the basename-grouping convention; members stream in
file order and a sample is emitted when its basename changes, so
memory is O(one sample), not O(shard).
"""

from __future__ import annotations

import io
import json
import os
import tarfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# metadata keys the sink serializes into {key}.json (sorted order);
# every one replays closed-form from the synth corpus, so oracle twins
# can regenerate the JSON byte-for-byte
_META_COLS = ("fmt", "h", "phash", "w")


def _tarinfo(name: str, size: int) -> tarfile.TarInfo:
    """Fully pinned tar header — the determinism contract."""
    ti = tarfile.TarInfo(name)
    ti.size = size
    ti.mtime = 0
    ti.uid = 0
    ti.gid = 0
    ti.uname = ""
    ti.gname = ""
    ti.mode = 0o644
    return ti


def _write_one_shard(path: str, samples, attempt: str = "") -> int:
    """samples: iterable of (key, payload_ext, payload_bytes,
    caption_str, meta_dict), ALREADY sorted by key. Returns count.
    Per-attempt tmp + os.replace: concurrent attempts of one partition
    publish atomically, last completed wins (see mbtiles sink)."""
    tmp = f"{path}.{attempt or os.getpid()}.tmp"
    if os.path.exists(tmp):
        os.remove(tmp)
    n = 0
    with tarfile.open(tmp, "w", format=tarfile.USTAR_FORMAT) as tf:
        for key, ext, payload, caption, meta in samples:
            # member order within a sample: payload, .json, .txt —
            # fixed so the file bytes are run-independent
            tf.addfile(_tarinfo(f"{key}.{ext}", len(payload)),
                       io.BytesIO(payload))
            mj = json.dumps(meta, sort_keys=True,
                            separators=(",", ":")).encode()
            tf.addfile(_tarinfo(f"{key}.json", len(mj)), io.BytesIO(mj))
            cap = caption.encode("utf-8")
            tf.addfile(_tarinfo(f"{key}.txt", len(cap)), io.BytesIO(cap))
            n += 1
    os.replace(tmp, path)
    return n


def write_wds_shards(
    samples: DataFrame,
    out_dir: str,
    num_shards: int | None = None,
    key_col: str = "image_id",
    bytes_col: str = "bytes",
    ext_col: str = "fmt",
    caption_col: str = "caption",
) -> int:
    """Distributed WebDataset sink: an input_hint-shaped table
    (image_id, bytes, w, h, fmt, caption, phash) → out_dir/
    part-NNNNN.tar shards, one per partition, written executor-side
    (foreachPartition — no driver collect). The payload extension is
    the fmt string (WebDataset's convention: the extension names the
    codec). Returns the number of shard files actually written —
    empty hash partitions produce no file, so this can be less than
    ``num_shards`` and part-NNNNN numbering may have holes; readers
    must list the directory, never enumerate a range."""
    os.makedirs(out_dir, exist_ok=True)
    # clear stale shards: a re-run that hashes some partition empty or
    # uses fewer shards must not leave old samples behind for readers
    for f in os.listdir(out_dir):
        if f.startswith("part-") and f.endswith(".tar"):
            os.remove(os.path.join(out_dir, f))
    df = samples.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(bytes_col).alias("payload"),
        F.col("w").cast("int"),
        F.col("h").cast("int"),
        F.col(ext_col).cast("string").alias("ext"),
        F.col(caption_col).cast("string").alias("caption"),
        F.col("phash").cast("long"),
    )
    n = num_shards or df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(n, "key")

    def write_partition(it):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        rows = [
            (
                r.key,
                r.ext,
                bytes(r.payload),
                r.caption,
                {"fmt": r.ext, "h": int(r.h), "phash": int(r.phash),
                 "w": int(r.w)},
            )
            for r in it
        ]
        if not rows:
            return
        rows.sort(key=lambda r: r[0])
        _write_one_shard(
            os.path.join(out_dir, f"part-{pid:05d}.tar"),
            rows,
            attempt=str(ctx.taskAttemptId()),
        )

    df.foreachPartition(write_partition)
    # count the files actually written: empty hash partitions produce
    # no part file, so the shard numbering may have holes and the
    # written count can be < n — callers must enumerate by listing,
    # not by range(return value)
    return sum(
        1
        for f in os.listdir(out_dir)
        if f.startswith("part-") and f.endswith(".tar")
    )


def read_wds(spark: SparkSession, path: str) -> DataFrame:
    """WebDataset source: one .tar OR a directory of shards →
    (image_id string, bytes binary, w int, h int, fmt string,
    caption string, phash long) — the exact input_hint shape back.
    Shards parallelize across tasks (one path per input row); members
    stream in tar order, and each sample's members are gathered by
    basename (emitted when the basename changes — the WebDataset
    grouping convention), so memory stays O(sample) per task."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".tar")
        )
    else:
        files = [path]
    if not files:
        raise ValueError(f"read_wds: no .tar shards under {path!r}")

    BATCH = 1024  # samples per Arrow batch

    def _flush(buf):
        out = pd.DataFrame(
            {
                "image_id": [s["key"] for s in buf],
                "bytes": [s.get("payload", b"") for s in buf],
                "w": pd.array([s.get("w") for s in buf], dtype="Int32"),
                "h": pd.array([s.get("h") for s in buf], dtype="Int32"),
                "fmt": [s.get("fmt") for s in buf],
                "caption": [s.get("caption") for s in buf],
                "phash": pd.array(
                    [s.get("phash") for s in buf], dtype="Int64"
                ),
            }
        )
        buf.clear()
        return out

    def gen(it):
        for pdf in it:
            for fpath in pdf["path"]:
                buf: list[dict] = []
                cur: dict | None = None
                with tarfile.open(fpath, "r") as tf:
                    for m in tf:
                        if not m.isfile():
                            continue
                        base, dot, ext = m.name.partition(".")
                        if not dot:
                            raise ValueError(
                                f"read_wds: extension-less member "
                                f"{m.name!r} in {fpath!r}"
                            )
                        if cur is None or cur["key"] != base:
                            if cur is not None:
                                buf.append(cur)
                                if len(buf) >= BATCH:
                                    yield _flush(buf)
                            cur = {"key": base}
                        data = tf.extractfile(m).read()
                        if ext == "txt":
                            cur["caption"] = data.decode("utf-8")
                        elif ext == "json":
                            meta = json.loads(data)
                            for k in _META_COLS:
                                if k in meta:
                                    cur[k] = meta[k]
                        else:
                            cur["payload"] = data
                            cur.setdefault("fmt", ext)
                if cur is not None:
                    buf.append(cur)
                if buf:
                    yield _flush(buf)

    paths = spark.createDataFrame(
        [(f,) for f in files], "path string"
    ).repartition(min(len(files), 32))
    return paths.mapInPandas(
        gen,
        schema="image_id string, bytes binary, w int, h int, "
        "fmt string, caption string, phash long",
    )
