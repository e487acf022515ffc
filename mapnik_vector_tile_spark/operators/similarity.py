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

import math

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


def _topk_rows(
    qids: np.ndarray,
    Q: np.ndarray,
    ids: np.ndarray,
    M: np.ndarray,
    mn: np.ndarray,
    k: int,
) -> list[tuple]:
    """cos9 top-k of every row of Q against the index (M, mn) — one
    matmul per Arrow batch, (−cos9, nbr) lexsort tiebreak (matches the
    ROUND(cos,9) DESC, id ASC oracle ordering)."""
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    cos9 = np.round((Q @ M.T) / (qn * mn[None, :]), 9)
    rows: list[tuple] = []
    for r in range(len(qids)):
        qid = int(qids[r])
        self_mask = ids == qid
        c = cos9[r].copy()
        c[self_mask] = -np.inf
        kk = min(k, len(ids) - int(self_mask.sum()))
        if kk <= 0:
            continue
        part = np.argpartition(-c, kk - 1)[:kk]
        # include ALL ties at the kth value so the nbr-asc tiebreak is
        # decided over the full tie set (oracle row_number parity)
        thresh = c[part].min()
        cand = np.flatnonzero(c >= thresh)
        order = cand[np.lexsort((ids[cand], -c[cand]))][:kk]
        for rank, j in enumerate(order, start=1):
            rows.append((qid, int(ids[j]), rank))
    return rows


def brute_force_topk(emb: DataFrame, k: int = 5) -> DataFrame:
    """Exact top-k neighbors per vector: (vec_id, nbr, rnk).

    The index matrix is collected once and BROADCAST (n×d doubles —
    the baseline is for rerank-scale candidate sets, ≤10^6 × 64 =
    0.5 GB; beyond that the LSH/IVF path is the answer); queries stream
    through mapInPandas in Arrow batches doing one numpy matmul each —
    no O(n²) shuffle, no per-pair expression evaluation."""
    spark = emb.sparkSession
    idx_pdf = emb.select("vec_id", "embedding").toPandas()
    ids = idx_pdf["vec_id"].to_numpy().astype(np.int64)
    M = np.stack(idx_pdf["embedding"].to_numpy()).astype(np.float64)
    mn = np.linalg.norm(M, axis=1)
    bc = spark.sparkContext.broadcast((ids, M, mn))

    def gen(batches):
        bids, bM, bmn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            Q = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            rows = _topk_rows(
                pdf["vec_id"].to_numpy().astype(np.int64), Q, bids, bM, bmn, k
            )
            yield pd.DataFrame(rows, columns=["vec_id", "nbr", "rnk"])

    return emb.select("vec_id", "embedding").mapInPandas(
        gen, schema="vec_id long, nbr long, rnk long"
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
    """Approximate top-k: exact cosine rank WITHIN each LSH bucket —
    ONE shuffle on bucket id, then a per-bucket numpy matmul (the
    O(n²/B) work stays vectorized, never per-pair expressions)."""
    from mapnik_vector_tile_spark.operators.grouped import apply_grouped

    be = with_lsh_bucket(emb, n_planes).select(
        "bucket", "vec_id", "embedding"
    )

    def bucket_topk(key, cols, sl) -> list[tuple]:
        ids = cols["vec_id"][sl.start : sl.stop].astype(np.int64)
        M = np.stack(cols["embedding"][sl.start : sl.stop]).astype(np.float64)
        mn = np.linalg.norm(M, axis=1)
        return _topk_rows(ids, M, ids, M, mn, k)

    return apply_grouped(
        be,
        keys=["bucket"],
        order_by=["bucket", "vec_id"],
        fn=bucket_topk,
        schema="vec_id long, nbr long, rnk long",
        out_columns=["vec_id", "nbr", "rnk"],
    )


def ivf_topk(
    emb: DataFrame, k: int = 5, n_cells: int = 16, nprobe: int = 2
) -> DataFrame:
    """IVF-style ANN (the second scale path named in SURVEY §2.11 T6/T7):
    deterministic coarse quantizer — the ``n_cells`` lowest-vec_id
    vectors ARE the centroids (reproducible cluster-wide, no iterative
    k-means state to checkpoint) — cell = argmax cos9 to a centroid
    (centroid-id tiebreak), search probes the ``nprobe`` nearest cells
    and ranks candidates by exact ROUND(cos,9) DESC, id ASC.

    Shape at scale: the centroid matrix is a broadcast (n_cells × d);
    assignment is one numpy matmul per Arrow batch (narrow); candidate
    generation is ONE equi-join on the integer cell id (members ⋈
    probes — broadcastable / AQE-skew-splittable); final ranking is a
    per-query window. O(nprobe·n²/n_cells) pair work vs brute O(n²).
    Recall < 1 by construction, but the DuckDB oracle replays the same
    quantizer so results match row-for-row."""
    spark = emb.sparkSession
    cent_pdf = (
        emb.orderBy("vec_id")
        .limit(n_cells)
        .select("vec_id", "embedding")
        .toPandas()
    )
    cids = cent_pdf["vec_id"].to_numpy().astype(np.int64)
    C = np.stack(cent_pdf["embedding"].to_numpy()).astype(np.float64)
    cn = np.linalg.norm(C, axis=1)
    bc = spark.sparkContext.broadcast((cids, C, cn))

    def assign(batches):
        bcids, bC, bcn = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            mn = np.linalg.norm(M, axis=1)
            cos9 = np.round((M @ bC.T) / (mn[:, None] * bcn[None, :]), 9)
            # (cos9 DESC, cid ASC) per row, fully vectorized: the
            # centroid axis is already in ascending-cid order (lowest
            # vec_ids), so a STABLE argsort on -cos9 realizes the
            # tiebreak without any per-row Python loop
            order = np.argsort(-cos9, axis=1, kind="stable")[:, :nprobe]
            nr = len(pdf)
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(
                        pdf["vec_id"].to_numpy(), nprobe
                    ),
                    "embedding": np.repeat(
                        pdf["embedding"].to_numpy(), nprobe
                    ),
                    "cell": bcids[order].ravel(),
                    "crn": np.tile(
                        np.arange(1, nprobe + 1, dtype=np.int32), nr
                    ),
                }
            )

    etype = dict(emb.dtypes)["embedding"]
    asg = emb.select("vec_id", "embedding").mapInPandas(
        assign,
        schema=f"vec_id long, embedding {etype}, cell long, crn int",
    ).localCheckpoint(eager=True)  # consumed by BOTH join sides —
    # without it the matmul assign stage executes twice
    members = asg.filter(F.col("crn") == 1).select(
        F.col("cell"),
        F.col("vec_id").alias("nbr"),
        F.col("embedding").alias("eb"),
    )
    probes = asg.select(
        F.col("cell"),
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("eq"),
    )
    cand = probes.join(members, "cell").filter(F.col("qid") != F.col("nbr"))
    ranked = cand.withColumn(
        "cos9", F.round(cosine_col(F.col("eq"), F.col("eb")), 9)
    ).withColumn(
        "rnk",
        F.row_number().over(
            Window.partitionBy("qid").orderBy(
                F.col("cos9").desc(), F.col("nbr")
            )
        ),
    )
    return ranked.filter(F.col("rnk") <= k).select(
        F.col("qid").alias("vec_id"), "nbr", F.col("rnk").cast("long")
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


# --- T20: int8 scalar quantization ------------------------------------------------


def _round_half_away_col(x: F.Column) -> F.Column:
    """std::round parity as Column math: floor + exact-fraction carry
    on |x|, sign restored (same argument as shared_sql.
    round_half_up_nonneg — floor(x+0.5) mis-rounds the largest double
    below 0.5)."""
    ax = F.abs(x)
    r = F.floor(ax) + F.when(ax - F.floor(ax) >= F.lit(0.5), F.lit(1)).otherwise(
        F.lit(0)
    )
    return F.when(x < 0, -r).otherwise(r)


def quantize_embeddings(emb: DataFrame, col: str = "embedding") -> DataFrame:
    """Int8 scalar quantization with a per-row absmax scale (the
    FAISS-ScalarQuantizer / block-Q8 shape every large vector index
    ships): scale = absmax/127, q_i = round_half_away(v_i*127/absmax)
    ∈ [-127, 127], dequant error ≤ scale/2 per dimension.

    Pure Column math — `transform`/`aggregate` lambda expressions run
    JVM-side inside whole-stage codegen: NO Python UDF, NO shuffle, a
    narrow projection that scales linearly with input splits at
    100 TB (4x smaller vectors into every downstream ANN/near-dup
    stage). Zero vectors quantize to all-zero with scale 0.

    Adds `q array<int>` and `scale double` columns."""
    v = F.col(col)
    absmax = F.aggregate(
        v,
        F.lit(0.0).cast("double"),
        lambda a, x: F.greatest(a, F.abs(x.cast("double"))),
    )
    emb = emb.withColumn("_am", absmax)
    q = F.when(
        F.col("_am") == 0.0,
        F.transform(v, lambda x: F.lit(0)),
    ).otherwise(
        F.transform(
            v,
            lambda x: _round_half_away_col(
                (x.cast("double") * F.lit(127.0)) / F.col("_am")
            ).cast("int"),
        )
    )
    return (
        emb.withColumn("q", q)
        .withColumn("scale", F.col("_am") / F.lit(127.0))
        .drop("_am")
    )


KM_SCALE = 1 << 20


def kmeans_clusters(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """T22: distributed Lloyd k-means over an embedding column — the
    diversity-clustering / coreset-selection stage of a training-data
    pipeline (cluster-then-sample), built so every round is bit-exact
    reproducible across engines AND across partitionings:

    - vectors are quantized ONCE to a fixed 2^20 integer grid
      (round-half-away, the shared std::round form), so all distances
      are exact BIGINT sums — no float summation order anywhere in the
      hot path;
    - init is deterministic: the k lowest-id vectors are the round-0
      centroids (no RNG state to checkpoint);
    - assignment is pure Column math: per-centroid squared distance
      via zip_with/aggregate lambdas against BROADCAST literal
      centroids (whole-stage codegen, no UDF, no shuffle), argmin with
      centroid-id tiebreak via least() over (d2, cid) structs;
    - the update is ONE partial-agg shuffle per round (64 SUM columns
      + COUNT, map-side combined), collecting only k×(dims+1) scalars
      to the driver — the scalar convergence-witness pattern, fine at
      any scale; new centroids re-enter as literals (re-broadcast);
    - centroid update rounds the exact rational mean back to the grid
      with the same IEEE double division + round-half-away in both
      engines; empty clusters keep their previous centroid.

    At 100 TB: iters × (one narrow scan + one k-row shuffle) — the
    canonical distributed k-means shape. Returns
    (id_col, cluster int, d2 bigint) for the FINAL assignment."""
    spark = emb.sparkSession
    v = F.col(col)
    q = F.transform(
        v,
        lambda x: _round_half_away_col(
            x.cast("double") * F.lit(float(KM_SCALE))
        ).cast("long"),
    )
    qd = emb.select(F.col(id_col), q.alias("qv"))
    first = emb.select(col).first()
    if first is None:
        raise ValueError("kmeans_clusters: empty embedding table")
    dims = len(first[0])

    cent_rows = (
        qd.orderBy(id_col).limit(k).select("qv").collect()
    )
    cents = [[int(x) for x in r[0]] for r in cent_rows]

    def assign(df: DataFrame) -> DataFrame:
        structs = []
        for cid, c in enumerate(cents):
            carr = F.array(*[F.lit(ci).cast("long") for ci in c])
            d2 = F.aggregate(
                F.zip_with(F.col("qv"), carr, lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            structs.append(
                F.struct(d2.alias("d2"), F.lit(cid).alias("cid"))
            )
        # least() needs >= 2 columns; k=1 degenerates to the single
        # centroid's struct
        best = structs[0] if len(structs) == 1 else F.least(*structs)
        return df.withColumn("cluster", best["cid"]).withColumn(
            "d2", best["d2"]
        )

    _rha = _rha_scalar  # shared std::round-parity helper (module level)

    for _ in range(max(1, iters) - 1):
        sums = (
            assign(qd)
            .groupBy("cluster")
            .agg(
                F.count("*").alias("n"),
                *[
                    F.sum(F.col("qv")[i]).alias(f"s{i}")
                    for i in range(dims)
                ],
            )
            .collect()
        )
        by_cid = {int(r["cluster"]): r for r in sums}
        for cid in range(k):
            r = by_cid.get(cid)
            if r is None:
                continue  # empty cluster: keep previous centroid
            n = float(r["n"])
            cents[cid] = [_rha(float(r[f"s{i}"]) / n) for i in range(dims)]

    return assign(qd).select(
        F.col(id_col),
        F.col("cluster").cast("int").alias("cluster"),
        F.col("d2").cast("bigint").alias("d2"),
    )


def _rha_scalar(x: float) -> int:
    """std::round parity for driver-side floats (centroid means)."""
    ax = abs(x)
    r = math.floor(ax) + (1 if ax - math.floor(ax) >= 0.5 else 0)
    return -int(r) if x < 0 else int(r)


def pq_encode(
    emb: DataFrame,
    m: int = 2,
    ksub: int = 8,
    iters: int = 2,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """T27 Product Quantization (Jégou et al. 2011; the FAISS IVF-PQ
    compression stage) — completes the ANN family beside brute / LSH /
    IVF: the vector splits into ``m`` subvectors, each subspace trains
    its own ``ksub``-centroid Lloyd codebook, and a vector compresses
    to ``m`` small codes (here m·3 bits vs 64·64 bits). Serving uses
    ASYMMETRIC DISTANCE (ADC): the query's exact distance to every
    codebook centroid forms an m×ksub lookup table, and a database
    vector's distance estimate is the sum of m table entries — no
    original vectors touched at query time.

    Built on the same bit-exact scaffolding as kmeans_clusters:

    * vectors quantize once to the 2^20 integer grid → all subspace
      distances are exact BIGINT sums (sub·(2·2^20)² ≈ 2^47 « 2^63);
    * per-subspace init = the ksub lowest-id vectors' subvectors, no
      RNG; update rounds the exact integer-sum mean back to the grid
      with the shared round-half-away; empty cells keep the previous
      centroid; argmin ties break to the lowest code;
    * training assignment is pure Column math (zip_with/aggregate
      lambdas against broadcast literal centroids — codegen, no UDF),
      one m-way partial-agg shuffle per Lloyd round, each collecting
      only ksub×(dims/m + 1) scalars;
    * the FINAL encode pass is one narrow zero-shuffle projection —
      at 100 TB this is the pass that matters, and it's a scan;
    * ADC is an array-literal lookup per subspace (element_at against
      a broadcast lut), again pure Column math.

    The ADC column uses the lowest-id vector as the canonical query so
    the whole pipeline (codebooks, codes, lut, estimate) is oracle-
    checkable. Returns (id_col, code0..code{m-1} int, adc bigint)."""
    v = F.col(col)
    q = F.transform(
        v,
        lambda x: _round_half_away_col(
            x.cast("double") * F.lit(float(KM_SCALE))
        ).cast("long"),
    )
    first = emb.select(col).first()
    if first is None:
        raise ValueError("pq_encode: empty embedding table")
    dims = len(first[0])
    if dims % m:
        raise ValueError(f"pq_encode: dims {dims} not divisible by m={m}")
    sub = dims // m
    subs = emb.select(
        F.col(id_col),
        *[F.slice(q, j * sub + 1, sub).alias(f"sub{j}") for j in range(m)],
    )

    seed = subs.orderBy(id_col).limit(ksub).collect()
    if len(seed) < ksub:
        raise ValueError(f"pq_encode: need >= ksub={ksub} vectors")
    cents = [
        [[int(x) for x in r[f"sub{j}"]] for r in seed] for j in range(m)
    ]

    def code_col(j: int) -> F.Column:
        structs = []
        for cid, c in enumerate(cents[j]):
            carr = F.array(*[F.lit(ci).cast("long") for ci in c])
            d2 = F.aggregate(
                F.zip_with(
                    F.col(f"sub{j}"), carr, lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
            structs.append(F.struct(d2.alias("d2"), F.lit(cid).alias("cid")))
        best = structs[0] if len(structs) == 1 else F.least(*structs)
        return best["cid"]

    for _ in range(max(1, iters) - 1):
        for j in range(m):
            rows = (
                subs.withColumn("_c", code_col(j))
                .groupBy("_c")
                .agg(
                    F.count("*").alias("n"),
                    *[
                        F.sum(F.col(f"sub{j}")[i]).alias(f"s{i}")
                        for i in range(sub)
                    ],
                )
                .collect()
            )
            by_cid = {int(r["_c"]): r for r in rows}
            for cid in range(ksub):
                r = by_cid.get(cid)
                if r is None:
                    continue  # empty cell: keep previous centroid
                n = float(r["n"])
                cents[j][cid] = [
                    _rha_scalar(float(r[f"s{i}"]) / n) for i in range(sub)
                ]

    # canonical query = lowest-id vector — already in hand as seed[0]
    # (the ksub lowest-id rows in order); no second sort-limit job
    qrow = seed[0]
    luts = []
    for j in range(m):
        qs = [int(x) for x in qrow[f"sub{j}"]]
        luts.append(
            [
                sum((a - b) * (a - b) for a, b in zip(qs, c))
                for c in cents[j]
            ]
        )

    out = subs
    for j in range(m):
        out = out.withColumn(f"code{j}", code_col(j).cast("int"))
    adc = None
    for j in range(m):
        lut = F.array(*[F.lit(int(d)).cast("long") for d in luts[j]])
        term = F.element_at(lut, F.col(f"code{j}") + 1)
        adc = term if adc is None else adc + term
    return out.select(
        F.col(id_col),
        *[F.col(f"code{j}") for j in range(m)],
        adc.cast("bigint").alias("adc"),
    )


SD_SCALE = 1 << 12  # semdedup cosine grid: with unit-norm 64-dim
# vectors, Σq² ≈ 2^24, so dot²·10⁴ ≤ ~2^61 and τ²-cross-multiplied
# comparisons stay EXACT in int64 in both engines


def _int_dot(x: F.Column, y: F.Column) -> F.Column:
    """Exact BIGINT dot product of two quantized integer vectors —
    the ONE fold shared by every integer-cosine gate here."""
    return F.aggregate(
        F.zip_with(x, y, lambda u, v: u * v),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _sd_quantize(col: str) -> F.Column:
    """Embedding → SD_SCALE integer grid (round-half-away, the
    committed cross-engine rounding)."""
    return F.transform(
        F.col(col),
        lambda x: _round_half_away_col(
            x.cast("double") * F.lit(float(SD_SCALE))
        ).cast("long"),
    )


def _guard_norm2(n2: F.Column, norm_lim: int, op: str) -> F.Column:
    """ONE source of the Cauchy–Schwarz int64 precondition (shared by
    semdedup and alignment_filter — the gate semantics must never
    fork): pass the exact norm² through, or raise loudly when a
    non-unit-norm corpus would overflow the cross-multiplied cosine
    compare."""
    return F.when(
        n2 > F.lit(norm_lim),
        F.raise_error(
            F.format_string(
                f"{op}: quantized norm^2 %d exceeds the exact-int64 "
                "gate limit %d — renormalize embeddings or lower "
                "SD_SCALE",
                n2,
                F.lit(norm_lim),
            )
        ).cast("long"),
    ).otherwise(n2)


def prototype_prune(
    emb: DataFrame,
    cap: int = 40,
    k: int = 8,
    iters: int = 2,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """T47: prototypicality-based data pruning (Sorscher et al. 2022,
    arXiv:2206.14486, "Beyond neural scaling laws") with per-cluster
    capping: k-means cluster the embedding space, rank each cluster's
    members by prototypicality (distance to their centroid — the
    paper's self-supervised metric), and keep the ``cap`` HARDEST
    examples per cluster (largest d2 first; easy/prototypical examples
    are the ones worth dropping in the abundant-data regime).  The
    constant per-cluster cap is the cluster-balancing variant the
    DataComp-style pipelines use — no cluster can dominate the kept
    set.

    Determinism: clustering is kmeans_clusters (bit-exact integer
    grid), ordering is (d2 DESC, id) — a total order both engines
    replay exactly; ties in d2 are broken by id.

    Scale shape (100 TB, k clusters): the rank filter is
    ``row_number() <= cap`` with a CONSTANT cap, which Catalyst
    rewrites to a map-side WindowGroupLimit (plan-pinned in
    tests/test_plan_quality_r5.py) — each upstream partition forwards
    at most cap rows per cluster, so the cluster-partitioned shuffle
    carries <= cap·partitions rows per cluster instead of the whole
    corpus (the k-partition skew a naive per-cluster global sort
    would hit).  Output: (id, cluster, d2, rnk) for the kept rows."""
    asg = kmeans_clusters(emb, k=k, iters=iters, col=col, id_col=id_col)
    w = Window.partitionBy("cluster").orderBy(
        F.col("d2").desc(), F.col(id_col)
    )
    return (
        asg.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= cap)
        .select(
            id_col,
            "cluster",
            "d2",
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


def semdedup(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    tau_num: int = 95,
    tau_den: int = 100,
    col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """T29 SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication = k-means cluster the embedding space, then drop
    every vector that has a SEMANTICALLY NEAR-IDENTICAL predecessor
    within its cluster. The pairwise work is confined to clusters —
    the paper's trick for making near-dup detection tractable at
    corpus scale (within-cluster candidate sets instead of all-pairs).

    Determinism/exactness posture (what makes this oracle-able where
    the paper's float cosines are not): clustering reuses
    kmeans_clusters (bit-exact integer grid, broadcast centroids);
    the duplicate test quantizes to the SD_SCALE grid and compares
    cos ≥ τ by integer cross-multiplication — dot > 0 AND
    dot²·τ_den² ≥ τ_num²·‖u‖²·‖v‖² — all BIGINT, no FP tie risk.
    The int64 headroom is a PRECONDITION, not an assumption: by
    Cauchy–Schwarz (exact over the integers) dot² ≤ ‖u‖²·‖v‖², so the
    gate cannot overflow iff every quantized norm² ≤ isqrt(2^63−1)/τ_den
    — enforced per row with raise_error, so a non-unit-norm corpus
    fails loudly instead of wrapping the compare and silently keeping
    true duplicates (norms up to ~1.34 at SD_SCALE=2^12, τ_den=100
    pass; renormalize or lower SD_SCALE beyond that).
    Keep rule is first-occurrence by id within cluster (drop v iff
    some u with u.id < v.id in v's cluster passes the test), the
    greedy scan-order rule — deterministic without a connected-
    components pass.

    Scale shape: one kmeans (iters narrow scans + k-row shuffles), one
    self-equi-join ON CLUSTER (candidate pairs bounded by cluster
    sizes, the SemDeDup contract; pick k so n/k fits the pair budget —
    same posture as the LSH band joins), one broadcast-able anti-join
    back. Returns (id_col, cluster int, keep boolean) for EVERY input
    row."""
    if tau_num > tau_den:
        raise ValueError("semdedup: cosine threshold tau must be <= 1")
    # Largest norm² for which dot²·τ_den² provably fits int64
    # (Cauchy–Schwarz: dot² ≤ nu·nv ≤ norm_lim², exact over ints).
    norm_lim = math.isqrt(2**63 - 1) // tau_den
    assigned = kmeans_clusters(emb, k=k, iters=iters, col=col, id_col=id_col)
    n2 = _int_dot(F.col("sv"), F.col("sv"))
    qe = emb.select(F.col(id_col), _sd_quantize(col).alias("sv")).withColumn(
        "n2", _guard_norm2(n2, norm_lim, "semdedup")
    )
    t = assigned.select(id_col, "cluster").join(qe, [id_col])
    a = t.select(
        F.col(id_col).alias("a_id"),
        "cluster",
        F.col("sv").alias("a_sv"),
        F.col("n2").alias("nu"),
    )
    b = t.select(
        F.col(id_col).alias("b_id"),
        "cluster",
        F.col("sv").alias("b_sv"),
        F.col("n2").alias("nv"),
    )

    pairs = a.join(b, ["cluster"]).filter(F.col("a_id") < F.col("b_id"))
    dot = _int_dot(F.col("a_sv"), F.col("b_sv"))
    nu = F.col("nu")
    nv = F.col("nv")
    dup = (
        pairs.filter(
            (dot > 0)
            & (
                dot * dot * F.lit(tau_den * tau_den)
                >= F.lit(tau_num * tau_num) * nu * nv
            )
        )
        .select(F.col("b_id").alias(id_col))
        .distinct()
    )
    return (
        t.join(dup.withColumn("_dup", F.lit(True)), [id_col], "left")
        .select(
            id_col,
            F.col("cluster").cast("int").alias("cluster"),
            F.coalesce(~F.col("_dup"), F.lit(True)).alias("keep"),
        )
    )


def alignment_filter(
    pairs: DataFrame,
    img_col: str = "img_vec",
    txt_col: str = "txt_vec",
    tau_num: int = 28,
    tau_den: int = 100,
) -> DataFrame:
    """T36 cross-modal alignment gate — CLIP-score filtering
    (Schuhmann et al. 2021: LAION keeps an (image, caption) pair iff
    cosine(image_emb, caption_emb) ≥ τ, the single most load-bearing
    filter in web-scale image+caption curation; their τ = 0.28 is the
    default as 28/100). The north-rule table IS this shape — paired
    image bytes + caption per row — so the towers arrive as two
    embedding columns of the SAME row and the gate is ONE codegen
    projection: zero shuffle, zero Python.

    Exactness posture (shared with semdedup): both towers quantize to
    the SD_SCALE integer grid (round-half-away, the committed
    cross-engine rounding); keep iff dot > 0 AND dot²·τ_den² ≥
    τ_num²·‖u‖²·‖v‖² — pure BIGINT, no FP tie risk; the same
    Cauchy–Schwarz norm² precondition raises loudly on non-unit-norm
    corpora instead of wrapping int64 and silently mis-gating. A zero
    vector on either side fails dot > 0 → keep=false, cos9=0.0 by
    convention (no NaN reaches the output). Adds (align_keep boolean,
    cos9 double — ROUND(cos,9) on the quantized grid, the audit
    column every similarity op here exposes)."""
    if tau_num > tau_den:
        raise ValueError("alignment_filter: cosine threshold tau must be <= 1")
    norm_lim = math.isqrt(2**63 - 1) // tau_den

    # materialize each O(dims) fold ONCE as a column — the gate reuses
    # d/nu/nv across keep, cos9, and the guard, and repeating the
    # higher-order-function expression would rely on Catalyst
    # canonicalizing lambda-variable ids to dedupe it
    with_q = (
        pairs.withColumn("_qu", _sd_quantize(img_col))
        .withColumn("_qv", _sd_quantize(txt_col))
        .withColumn("_d", _int_dot(F.col("_qu"), F.col("_qv")))
        .withColumn(
            "_nu",
            _guard_norm2(
                _int_dot(F.col("_qu"), F.col("_qu")),
                norm_lim,
                "alignment_filter",
            ),
        )
        .withColumn(
            "_nv",
            _guard_norm2(
                _int_dot(F.col("_qv"), F.col("_qv")),
                norm_lim,
                "alignment_filter",
            ),
        )
    )
    d, nu, nv = F.col("_d"), F.col("_nu"), F.col("_nv")
    keep = (d > 0) & (
        d * d * F.lit(tau_den * tau_den)
        >= F.lit(tau_num * tau_num) * nu * nv
    )
    cos9 = F.when((nu == 0) | (nv == 0), F.lit(0.0)).otherwise(
        F.round(
            d.cast("double")
            / (F.sqrt(nu.cast("double")) * F.sqrt(nv.cast("double"))),
            9,
        )
    )
    return (
        with_q.withColumn("align_keep", keep)
        .withColumn("cos9", cos9)
        .drop("_qu", "_qv", "_d", "_nu", "_nv")
    )


def hard_negatives(
    emb: DataFrame, k: int = 3, n_planes: int = N_PLANES
) -> DataFrame:
    """T34 hard-negative mining — the contrastive-training sampler
    (pick, for each anchor, the most similar vectors of a DIFFERENT
    label: the negatives that actually move the loss): LSH buckets
    confine the candidate set exactly like lsh_bucketed_topk, then the
    per-bucket exact cos9 rank runs with SAME-LABEL rows masked out
    (self included). High-cosine same-label rows are positives, not
    negatives — the mask is the semantic difference from ANN top-k.
    Same one-shuffle plan shape; same (−cos9, nbr) tiebreak so the
    DuckDB twin replays row-for-row. Output: (vec_id, nbr, rnk,
    nbr_label)."""
    from mapnik_vector_tile_spark.operators.grouped import apply_grouped

    be = with_lsh_bucket(emb, n_planes).select(
        "bucket", "vec_id", "embedding", "label"
    )

    def bucket_negk(key, cols, sl) -> list[tuple]:
        ids = cols["vec_id"][sl.start : sl.stop].astype(np.int64)
        labels = cols["label"][sl.start : sl.stop].astype(np.int64)
        M = np.stack(cols["embedding"][sl.start : sl.stop]).astype(
            np.float64
        )
        mn = np.linalg.norm(M, axis=1)
        qn = np.linalg.norm(M, axis=1, keepdims=True)
        cos9 = np.round((M @ M.T) / (qn * mn[None, :]), 9)
        rows: list[tuple] = []
        for r in range(len(ids)):
            mask = labels == labels[r]  # positives AND self
            c = cos9[r].copy()
            c[mask] = -np.inf
            kk = min(k, int((~mask).sum()))
            if kk <= 0:
                continue
            part = np.argpartition(-c, kk - 1)[:kk]
            thresh = c[part].min()
            tie = np.flatnonzero(c >= thresh)
            order = np.lexsort((ids[tie], -c[tie]))
            for rnk, t in enumerate(tie[order][:kk], start=1):
                rows.append(
                    (int(ids[r]), int(ids[t]), rnk, int(labels[t]))
                )
        return rows

    return apply_grouped(
        be,
        keys=["bucket"],
        order_by=["bucket", "vec_id"],
        fn=bucket_negk,
        schema="vec_id long, nbr long, rnk long, nbr_label long",
        out_columns=["vec_id", "nbr", "rnk", "nbr_label"],
    )


def embedding_gram(emb: DataFrame, col: str = "embedding") -> DataFrame:
    """T22 exact Gram matrix of the int8-quantized embedding table —
    the distributed-linear-algebra primitive behind PCA whitening,
    covariance-shift monitoring, and OPQ rotation training on
    planet-scale embedding corpora (the X^T X every one of those
    starts from).

    Quantization first (quantize_embeddings — per-row absmax int8)
    makes the accumulation EXACT integer arithmetic: |q| <= 127 so a
    single product is <= 16129 and int64 holds the global sum up to
    ~5.7e14 rows per dimension pair — beyond the 10^12-row north-rule
    corpus with three orders of magnitude to spare.

    Execution shape: one mapInPandas pass computes a per-Arrow-batch
    Q^T Q with ONE numpy matmul (no per-row Python), emits only the
    d(d+1)/2 upper-triangle entries per PARTITION, and the final
    groupBy sums partition partials — shuffle volume is
    n_partitions x 2080 rows for d=64, independent of corpus size.
    That is the map-side-combine pattern in its purest form: the
    reduce side never sees row-proportional data.

    Output: (i, j, g) for 0 <= i <= j < d, g = sum over rows of
    q_i * q_j."""
    qd = quantize_embeddings(emb, col).select("q")

    def gram(it):
        acc = None
        for pdf in it:
            if not len(pdf):
                continue
            q = np.vstack(pdf["q"].to_numpy()).astype(np.int64)
            g = q.T @ q
            acc = g if acc is None else acc + g
        if acc is None:
            return
        d = acc.shape[0]
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {"i": iu.astype(np.int32), "j": ju.astype(np.int32),
             "g": acc[iu, ju]}
        )

    part = qd.mapInPandas(gram, "i int, j int, g long")
    return part.groupBy("i", "j").agg(F.sum("g").cast("long").alias("g"))


def twostage_topk(
    emb: DataFrame, k: int = 5, m: int = 20, prefix: int = 16
) -> DataFrame:
    """T40 two-stage quantized retrieval — the Matryoshka/ADC serving
    shape every production vector index runs: LSH buckets bound the
    candidate set, a CHEAP prefix-dim int8 dot keeps the top-m per
    query, and only survivors pay the full-dimension scoring.  Both
    scores are exact BIGINT dots over the oracle-gated int8
    quantization, so the whole funnel (bucketing, coarse rank with
    (score DESC, id) ties, rerank) is bit-reproducible — recall vs
    float brute force is a property, not noise.

    Pure Column algebra: slice/zip_with/aggregate lambdas for both
    dots (codegen, no UDF), two WindowGroupLimit ranks.  Work is
    Σ bucket² for stage 1 and m·|queries| for stage 2 — the rerank
    never sees the corpus."""
    from pyspark.sql import Window

    qd = with_lsh_bucket(quantize_embeddings(emb)).select(
        "vec_id", "q", "bucket"
    )
    a = qd.alias("a")
    b = qd.alias("b")
    cand = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    )

    def idot(ca: str, cb: str, n: int | None) -> F.Column:
        xa = f"slice({ca}, 1, {n})" if n else ca
        xb = f"slice({cb}, 1, {n})" if n else cb
        return F.expr(
            f"aggregate(zip_with({xa}, {xb},"
            f" (x, y) -> CAST(x AS BIGINT) * CAST(y AS BIGINT)),"
            f" 0L, (acc, v) -> acc + v)"
        )

    scored = cand.select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("nbr"),
        idot("a.q", "b.q", prefix).alias("c_pre"),
        idot("a.q", "b.q", None).alias("c_full"),
    )
    w1 = Window.partitionBy("vec_id").orderBy(
        F.col("c_pre").desc(), "nbr"
    )
    stage1 = scored.withColumn(
        "r1", F.row_number().over(w1)
    ).filter(F.col("r1") <= m)
    w2 = Window.partitionBy("vec_id").orderBy(
        F.col("c_full").desc(), "nbr"
    )
    return (
        stage1.withColumn("rnk", F.row_number().over(w2).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("vec_id", "nbr", "c_pre", "c_full", "rnk")
    )


def mmr_select(
    cands: DataFrame, sims: DataFrame, k: int = 5
) -> DataFrame:
    """T41 Maximal Marginal Relevance (Carbonell & Goldstein '98) —
    the diversity rerank retrieval/RAG stacks apply after scoring:
    greedily pick the candidate maximizing  relevance − max-similarity
    -to-already-picked  (λ = 1/2 cleared of the fraction), ties to the
    smaller candidate id.  With exact-integer relevance and similarity
    (the int8-dot scale used across this repo's retrieval family) the
    greedy chain is deterministic and bit-replayable.

    cands: (qid, cid, rel) — per-query candidate relevances (BIGINT,
    e.g. c_full from twostage_topk); sims: (qid, ca, cb, sim) —
    pairwise candidate similarities within each query's candidate set
    (both orientations or (ca<cb); looked up symmetrically).

    Sequential per query but queries are independent — the grouped-
    kernel shape (one repartition on qid, per-query loop bounded by
    the candidate count m, never the corpus).

    Output: (qid, cid, rel, mmr, rnk) for the k selections in pick
    order; the first pick's mmr equals its relevance."""
    from mapnik_vector_tile_spark.operators.grouped import apply_grouped

    sim_sym = sims.select("qid", "ca", "cb", "sim").unionByName(
        sims.select(
            "qid",
            F.col("cb").alias("ca"),
            F.col("ca").alias("cb"),
            "sim",
        )
    )
    # ship sims alongside candidates through ONE grouped pass: rows
    # tagged kind 0 = candidate, kind 1 = similarity edge
    c_rows = cands.select(
        "qid",
        F.lit(0).alias("kind"),
        F.col("cid").alias("a"),
        F.lit(-1).cast("long").alias("b"),
        F.col("rel").cast("long").alias("v"),
    )
    s_rows = sim_sym.select(
        "qid",
        F.lit(1).alias("kind"),
        F.col("ca").alias("a"),
        F.col("cb").alias("b"),
        F.col("sim").cast("long").alias("v"),
    )
    allr = c_rows.unionByName(s_rows)

    def kernel(key, cols, sl):
        qid = int(key[0])
        kind = cols["kind"][sl]
        a = cols["a"][sl]
        b = cols["b"][sl]
        v = cols["v"][sl]
        rel = {int(x): int(val) for x, val in zip(a[kind == 0], v[kind == 0])}
        sim = {
            (int(x), int(y)): int(val)
            for x, y, val in zip(a[kind == 1], b[kind == 1], v[kind == 1])
        }
        picked: list[tuple[int, int, int]] = []
        remaining = dict(rel)
        while remaining and len(picked) < k:
            best = None
            for cid in sorted(remaining):
                maxsim = max(
                    (sim.get((cid, p[0]), 0) for p in picked),
                    default=0,
                )
                score = remaining[cid] - maxsim
                if best is None or score > best[1]:
                    best = (cid, score)
            cid, score = best
            picked.append((cid, rel[cid], score))
            del remaining[cid]
        return [
            (qid, cid, r, s, i + 1)
            for i, (cid, r, s) in enumerate(picked)
        ]

    return apply_grouped(
        allr,
        keys=["qid"],
        order_by=["qid", "kind", "a", "b"],
        fn=kernel,
        schema="qid long, cid long, rel long, mmr long, rnk long",
        out_columns=["qid", "cid", "rel", "mmr", "rnk"],
    )


PCA_SCALE = 1 << 14  # power-iteration grid: keeps every intermediate
# (64·scale²·scale products in the Rayleigh fold) well inside int64


def pca_power(
    emb: DataFrame, col: str = "embedding", iters: int = 24
) -> DataFrame:
    """T43 top principal direction by QUANTIZED power iteration over
    the exact integer Gram matrix (embedding_gram) — the first
    eigenpair PCA whitening / drift monitoring needs, computed so
    both engines replay it BIT-EXACTLY: the Gram is rescaled onto
    the PCA_SCALE integer grid, the iterate is renormalized each
    step by sign(x)·(|x|·scale div max|w|) (symmetric truncating
    division — identical in numpy ints and DuckDB //), and every
    sum is exact BIGINT, so there is no float association anywhere
    and summation order is irrelevant.  Convergence is the standard
    power-iteration story quantized to the grid — the CONTRACT is
    the computation itself, with the Rayleigh pair (num, den)
    reporting λ̂ = num/den on the rescaled matrix.

    The d×d Gram is a BOUNDED summary (d(d+1)/2 rows, corpus-size
    independent) — collecting it is the rank_select/sketch driver
    pattern, not a data collect; the corpus-proportional work all
    happened inside embedding_gram's map-side combine.

    Output ONE row: (d, iters, lam_num, lam_den, vhash, v_max,
    v_min)."""
    rows = embedding_gram(emb, col).collect()
    d = max(int(r["j"]) for r in rows) + 1
    G = [[0] * d for _ in range(d)]
    for r in rows:
        G[int(r["i"])][int(r["j"])] = int(r["g"])
        G[int(r["j"])][int(r["i"])] = int(r["g"])
    gmax = max((abs(x) for row in G for x in row), default=0)
    gdiv = gmax // PCA_SCALE + 1
    Gn = [
        [
            (1 if x >= 0 else -1) * (abs(x) // gdiv)
            for x in row
        ]
        for row in G
    ]
    v = [PCA_SCALE] * d
    for _ in range(iters):
        w = [sum(Gn[i][j] * v[j] for j in range(d)) for i in range(d)]
        m = max(abs(x) for x in w)
        if m == 0:
            break
        v = [
            (1 if x >= 0 else -1) * ((abs(x) * PCA_SCALE) // m)
            for x in w
        ]
    w = [sum(Gn[i][j] * v[j] for j in range(d)) for i in range(d)]
    num = sum(v[i] * w[i] for i in range(d))
    den = sum(x * x for x in v)
    vhash = sum((i + 1) * v[i] for i in range(d))
    spark = emb.sparkSession
    return spark.createDataFrame(
        [(d, iters, num, den, vhash, max(v), min(v))],
        "d long, iters long, lam_num long, lam_den long, vhash long,"
        " v_max long, v_min long",
    )
