"""Per-partition lineage + idempotent checkpoint/resume — north_rule:
"resumable from checkpoint with per-partition lineage + metrics".

Contract (SURVEY.md §4.3): every stage writes its output bucketed by a
deterministic key hash; each bucket commits ATOMICALLY (tmp file +
os.replace) together with a lineage record (stage, run_id, bucket,
key_min, key_max, rows_in, rows_out, wall_ms, status). On restart,
completed buckets are discovered from the lineage sidecar and
anti-joined out of the input — only missing buckets recompute, and
re-running a completed stage is a no-op. In production the same
contract maps to Iceberg atomic appends; the sandbox uses
parquet + rename, which is atomic on POSIX within one filesystem.

Why bucket-hash instead of Spark's task partition id: task ids change
with cluster size and AQE decisions; `pmod(hash(keys), n_buckets)` is a
pure function of the DATA, so a resume on a different cluster size (the
north_rule N vs 4N case) still skips exactly the completed work.

Executor-side parquet IO via pyarrow inside the grouped kernel — the
driver never sees row data, only the lineage rows that come back as the
stage's result DataFrame.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapnik_vector_tile_spark.operators.grouped import apply_grouped

# one bucket = one atomic commit unit
DEFAULT_N_BUCKETS = 64


def bucket_col(key_col: str, n_buckets: int = DEFAULT_N_BUCKETS) -> F.Column:
    """THE bucket expression — the single definition shared by
    run_stage's commit path and any upstream compute-pruning filter
    (jobs/tile_pipeline). Divergent copies of this formula would
    silently drop un-committed work from a resumed run."""
    return F.pmod(F.hash(F.col(key_col)), F.lit(n_buckets)).cast("int")

LINEAGE_SCHEMA = (
    "stage string, run_id string, bucket int, key_min long, key_max long, "
    "rows_in long, rows_out long, wall_ms double, status string"
)
LINEAGE_COLS = [
    "stage",
    "run_id",
    "bucket",
    "key_min",
    "key_max",
    "rows_in",
    "rows_out",
    "wall_ms",
    "status",
]


def _stage_dirs(out_dir: str, stage: str) -> tuple[str, str]:
    return (
        os.path.join(out_dir, "data", f"stage={stage}"),
        os.path.join(out_dir, "lineage", f"stage={stage}"),
    )


def completed_buckets(out_dir: str, stage: str) -> set[int]:
    """Buckets whose lineage record exists — i.e. whose data file was
    atomically committed (lineage is renamed AFTER data)."""
    _, ldir = _stage_dirs(out_dir, stage)
    if not os.path.isdir(ldir):
        return set()
    out = set()
    for name in os.listdir(ldir):
        if name.startswith("bucket=") and name.endswith(".json"):
            out.add(int(name[len("bucket=") : -len(".json")]))
    return out


def read_lineage(spark: SparkSession, out_dir: str, stage: str) -> DataFrame:
    _, ldir = _stage_dirs(out_dir, stage)
    rows = []
    if os.path.isdir(ldir):
        for name in sorted(os.listdir(ldir)):
            if name.endswith(".json"):
                with open(os.path.join(ldir, name)) as f:
                    rows.append(json.load(f))
    return spark.createDataFrame(rows, schema=LINEAGE_SCHEMA)


def read_stage(spark: SparkSession, out_dir: str, stage: str) -> DataFrame:
    ddir, _ = _stage_dirs(out_dir, stage)
    return spark.read.parquet(ddir)


def run_stage(
    df: DataFrame,
    out_dir: str,
    stage: str,
    key_col: str,
    run_id: str | None = None,
    n_buckets: int = DEFAULT_N_BUCKETS,
    fail_bucket_over: int | None = None,
) -> DataFrame:
    """Execute a resumable checkpointed stage: persist `df` bucketed by
    hash(key_col), skip already-committed buckets, return the lineage
    rows of THIS run. Call again after a failure with the same out_dir
    to resume; completed buckets are never recomputed.

    fail_bucket_over injects a crash after that many buckets commit —
    the kill-and-rerun test hook (SURVEY.md §5.2 item 5)."""
    run_id = run_id or uuid.uuid4().hex[:12]
    ddir, ldir = _stage_dirs(out_dir, stage)
    os.makedirs(ddir, exist_ok=True)
    os.makedirs(ldir, exist_ok=True)
    done = completed_buckets(out_dir, stage)

    bucketed = df.withColumn("_bucket", bucket_col(key_col, n_buckets))
    if done:
        bucketed = bucketed.filter(
            ~F.col("_bucket").isin(*[int(b) for b in sorted(done)])
        )
    out_fields = [f for f in df.schema.fields]
    arrow_schema = pa.schema(
        [pa.field(f.name, _arrow_type(f.dataType)) for f in out_fields]
    )
    data_cols = [f.name for f in out_fields]

    def write_bucket(key, cols, sl) -> list[tuple]:
        b = int(key[0])
        t0 = time.monotonic()
        n = sl.stop - sl.start
        # from_pandas=True + explicit type: a nullable int column
        # arrives from Arrow as float64 with NaN — without the target
        # type pa.array infers double and Table.from_arrays raises
        arrays = [
            pa.array(
                list(cols[c][sl]),
                type=arrow_schema.field(c).type,
                from_pandas=True,
            )
            for c in data_cols
        ]
        table = pa.Table.from_arrays(arrays, schema=arrow_schema)
        final = os.path.join(ddir, f"bucket={b}.parquet")
        # dot-prefixed tmp: Spark ignores '.'-files, so a crash between
        # write and rename cannot leave a readable orphan that a
        # resumed read_stage would double-count or choke on
        tmp = os.path.join(ddir, f".tmp-{uuid.uuid4().hex[:8]}-{b}")
        pq.write_table(table, tmp)
        os.replace(tmp, final)  # atomic commit of data ...
        kv = cols[key_col][sl]
        rec = {
            "stage": stage,
            "run_id": run_id,
            "bucket": b,
            "key_min": int(min(kv)),
            "key_max": int(max(kv)),
            "rows_in": n,
            "rows_out": n,
            "wall_ms": (time.monotonic() - t0) * 1000.0,
            "status": "ok",
        }
        ltmp = os.path.join(ldir, f".tmp-{uuid.uuid4().hex[:8]}")
        with open(ltmp, "w") as f:
            json.dump(rec, f)
        os.replace(ltmp, os.path.join(ldir, f"bucket={b}.json"))
        # ... lineage rename LAST: a crash between the two renames only
        # re-writes identical data on resume (idempotent overwrite)
        if fail_bucket_over is not None and b > fail_bucket_over:
            raise RuntimeError(f"injected failure after bucket {b}")
        return [
            (
                stage,
                run_id,
                b,
                rec["key_min"],
                rec["key_max"],
                n,
                n,
                rec["wall_ms"],
                "ok",
            )
        ]

    return apply_grouped(
        bucketed,
        keys=["_bucket"],
        order_by=["_bucket", key_col],
        fn=write_bucket,
        schema=LINEAGE_SCHEMA,
        out_columns=LINEAGE_COLS,
    )


def _arrow_type(dt):
    from pyspark.sql import types as T

    mapping = {
        T.LongType: pa.int64(),
        T.IntegerType: pa.int32(),
        T.DoubleType: pa.float64(),
        T.StringType: pa.string(),
        T.BinaryType: pa.binary(),
        T.BooleanType: pa.bool_(),
    }
    for k, v in mapping.items():
        if isinstance(dt, k):
            return v
    if isinstance(dt, T.ArrayType):
        return pa.list_(_arrow_type(dt.elementType))
    raise TypeError(f"unsupported checkpoint column type {dt}")
