"""Deterministic corpus sampling / split assignment (T17 family).

Training-data curation operators over the ``documents`` table — the
missing third leg next to dedup (T1-T5) and quality gating (T9):

* ``with_sample_hash`` — a stable per-row coin: ``splitmix64(doc_id)``
  truncated to its top 53 bits, so the SAME value is representable
  exactly as an int64 (Spark), a DuckDB BIGINT, and (if it ever
  transits a DOUBLE) an IEEE float. Sampling decisions are pure
  functions of the row key: re-runs, resumes, and both engines agree
  row-for-row, which is what makes holdout splits trustworthy across
  pipeline versions.
* ``assign_split`` — train/val/test assignment by hash bucket
  (80/10/10 of ``hord % 10000``). Map-side only; the split column
  costs no shuffle and any downstream filter on it is
  pushdown-friendly.
* ``stratified_sample`` — per-stratum (language) keep-rates applied as
  a single CASE threshold on the same bucket. Down-samples
  over-represented strata (the classic corpus-balancing op) without a
  shuffle: filter is map-side, the only exchange is the final stats
  aggregate (partial-agg'd).
* ``balanced_topk`` — EXACTLY k rows per stratum, chosen by hash
  order (deterministic "random" without replacement). Declared as
  ``row_number() OVER (PARTITION BY lang ORDER BY hord, doc_id) <= k``
  — Spark's WindowGroupLimit rule (asserted in
  tests/test_plan_quality.py) rewrites this to a per-map-partition
  top-k BEFORE the shuffle, so the exchange carries at most
  ``k × n_partitions`` rows per stratum, not the stratum. That is the
  100 TB plan: the full-sort-per-stratum a naive window implies never
  materializes.

No reference counterpart (mapnik-vector-tile renders tiles; it has no
corpus curation) — mandated by the task brief's training-pipeline
list, same standing as operators/dedup.py. All three are gated by
full DuckDB oracles (oracle_pairs re-derives the hash via
splitmix64_sql HUGEINT arithmetic, bit-exact).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from mapnik_vector_tile_spark.sources.synth import splitmix64

# Top 53 bits of the 64-bit hash: exactly representable everywhere.
_HSHIFT = 11
# Bucket space for rate thresholds: rates are "per ten-thousand".
BUCKETS = 10_000

# Per-language keep-rates (per BUCKETS). en is down-sampled hardest —
# it dominates the corpus — zh kept nearly whole; the point is the
# rates are non-uniform so the oracle is non-vacuous.
STRATA_RATES: dict[str, int] = {
    "en": 2000,
    "de": 5000,
    "es": 5000,
    "fr": 5000,
    "zh": 8000,
}

# train/val/test thresholds on hord % BUCKETS.
SPLIT_TRAIN = 8000
SPLIT_VAL = 9000


def _sample_hash_kernel(ids: pd.Series) -> pd.Series:
    """splitmix64(id) >> 11 — vectorized, uint64-exact, 53-bit result."""
    h = splitmix64(ids.to_numpy(dtype=np.uint64))
    return pd.Series((h >> np.uint64(_HSHIFT)).astype(np.int64))


# DataType instance (not a DDL string) so the decorator needs no active
# SparkSession at import time.
sample_hash = F.pandas_udf(_sample_hash_kernel, LongType())


def with_sample_hash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    return df.withColumn("hord", sample_hash(F.col(id_col)))


def _bucket() -> Column:
    return F.col("hord") % F.lit(BUCKETS)


def assign_split(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Add ``split ∈ {train, val, test}`` by hash bucket (80/10/10)."""
    b = _bucket()
    return with_sample_hash(df, id_col).withColumn(
        "split",
        F.when(b < SPLIT_TRAIN, F.lit("train"))
        .when(b < SPLIT_VAL, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def spatial_block_split(
    df: DataFrame, z: int = 6, mx_col: str = "mx", my_col: str = "my"
) -> DataFrame:
    """Leakage-safe GEOGRAPHIC train/val/test split — the geo-ML
    evaluation discipline: spatial autocorrelation makes a random row
    split leak (a test point meters from a train point is trivially
    predictable), so whole spatial BLOCKS are assigned to one side
    (block cross-validation, Roberts et al. 2017, Ecography 40).

    Block = the z-level Web-Mercator tile cell containing the row's
    mercator point — the engine's own pyramid grid, so blocks align
    with every other operator's partitioning and the block id is the
    standard Morton cell key. The split coin is splitmix64(block)
    (the corpus's committed row-coin, here keyed by CELL), so every
    row of a block draws the SAME coin and train/test never share a
    block; thresholds are the assign_split 80/10/10 — of BLOCKS, not
    rows, which is what the discipline requires (row shares then
    follow block occupancy). Zero shuffle: pure Column tile math plus
    one Arrow-batched hash projection; adds (block long, split
    string). Lon/lat callers wrap with tilemath.merc_{x,y}_col."""
    from mapnik_vector_tile_spark.functions import tilemath as T

    out = (
        df.withColumn("_tx", T.tile_x_col(F.col(mx_col), z))
        .withColumn("_ty", T.tile_y_col(F.col(my_col), z))
        .withColumn("block", F.expr(T.cell_id_sql_expr("_tx", "_ty", z)))
        .drop("_tx", "_ty")
    )
    b = sample_hash(F.col("block")) % F.lit(BUCKETS)
    return out.withColumn(
        "split",
        F.when(b < SPLIT_TRAIN, F.lit("train"))
        .when(b < SPLIT_VAL, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, int] | None = None,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep a row iff ``hord % BUCKETS < rate(stratum)``; unknown
    strata are dropped (rate 0)."""
    rates = STRATA_RATES if rates is None else rates
    thr: Column = F.lit(0)
    for lang, rate in sorted(rates.items()):
        thr = F.when(F.col(stratum_col) == lang, F.lit(rate)).otherwise(thr)
    return with_sample_hash(df, id_col).filter(_bucket() < thr)


# sequence-packing defaults: calibrated so the sf0.01 corpus produces
# several bins per (stratum, shard) — a non-vacuous oracle.
PACK_BUDGET = 2048
N_PACK_SHARDS = 4


def pack_contiguous(
    df: DataFrame,
    budget: int = PACK_BUDGET,
    n_shards: int = N_PACK_SHARDS,
    stratum_col: str = "lang",
    cost_col: str = "n_chars",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic sequence packing (the pretraining sample-packing
    op): assign each document to a fixed-budget bin by cumulative cost
    in id order, within (stratum, hash-shard).

    bin = floor(exclusive-prefix-sum(cost) / budget) — contiguous
    packing with spillover: a doc that crosses a budget boundary opens
    the next bin (greedy-reset packing, where the remainder resets at
    each boundary, is NOT prefix-sum expressible and would serialize;
    this variant is the distributed-friendly one and is exactly
    SQL-oracle-able). The hash shard bounds every window to
    |stratum|/n_shards rows — the 100 TB story: packing state never
    exceeds a shard, shards never mix, and adding shards is the knob
    that keeps per-partition sort + running-sum memory flat as the
    corpus grows. The bin divide is INTEGER division (Spark ``DIV``,
    DuckDB ``//`` — identical on nonnegative bigints), exact at any
    prefix-sum magnitude and any budget; a float floor(cum/budget)
    would round across a bin boundary for cum near 2^53.
    """
    d = with_sample_hash(df, id_col).withColumn(
        "shard", F.col("hord") % F.lit(n_shards)
    )
    w = (
        Window.partitionBy(stratum_col, "shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum(cost_col).over(w), F.lit(0))
    return (
        d.withColumn("_cum", cum)
        .withColumn("bin", F.expr(f"_cum DIV {int(budget)}"))
        .drop("_cum")
    )


def balanced_topk(
    df: DataFrame,
    k: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum in hash order."""
    w = Window.partitionBy(stratum_col).orderBy("hord", id_col)
    return (
        with_sample_hash(df, id_col)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


# --- aspect-ratio bucketing (T28) -------------------------------------------

# Canonical training aspect-ratio buckets as REDUCED fractions
# (num, den) spanning the 1:4 .. 4:1 range image models bucket over
# (the SDXL/NovelAI bucketing families reduce to these ratios).
AR_BUCKETS: tuple[tuple[int, int], ...] = (
    (1, 4), (1, 3), (1, 2), (2, 3), (3, 4), (1, 1),
    (4, 3), (3, 2), (2, 1), (3, 1), (4, 1),
)


def _ar_lcm_den() -> int:
    import math

    d = 1
    for _, den in AR_BUCKETS:
        d = d * den // math.gcd(d, den)
    return d


def ar_bucket_batches(
    images: DataFrame,
    batch_size: int = 8,
    n_shards: int = 4,
    id_col: str = "image_id",
) -> DataFrame:
    """Aspect-ratio bucketing + fixed-size batch packing — the batch
    former of every image-model training pipeline (variable-AR corpora
    train on same-AR batches; NovelAI/SDXL bucketing): each image
    snaps to the NEAREST ratio bucket, then same-bucket images pack
    into batches of ``batch_size``.

    Nearest is EXACT integer arithmetic (both engines bit-agree, no FP
    tie risk): for bucket i = n_i/d_i the true error |w/h − n_i/d_i|
    equals |w·d_i − h·n_i| / (h·d_i); multiplying by the constant
    h·lcm(d) gives the cross-bucket-comparable integer metric
    |w·d_i − h·n_i| · (lcm/d_i). Ties break to the smaller bucket
    index via struct ordering — F.least over (metric, idx) structs,
    pure Column math, no UDF, no shuffle for the assignment itself.

    Batch packing at 10^12 rows cannot be one row_number per bucket —
    that puts a whole bucket on one task. Rows are therefore sharded
    by ``pmod(phash, n_shards)`` and ranked within (bucket, shard)
    ordered by id: parallelism is |buckets|·n_shards (pick n_shards ≈
    cluster cores / |buckets|), ONE exchange computes both the rank
    and the group count, and batches stay same-bucket by
    construction. ``is_full`` marks complete batches (training drops
    or pads the per-shard remainder). Deterministic: a pure function
    of (w, h, phash, id) — re-runs and resumes agree row-for-row."""
    lcm = _ar_lcm_den()
    structs = [
        F.struct(
            (
                F.abs(
                    F.col("w").cast("long") * F.lit(d)
                    - F.col("h").cast("long") * F.lit(n)
                )
                * F.lit(lcm // d)
            ).alias("metric"),
            F.lit(i).alias("idx"),
        )
        for i, (n, d) in enumerate(AR_BUCKETS)
    ]
    best = F.least(*structs)
    df = images.withColumn("bucket", best["idx"]).withColumn(
        "shard", F.pmod(F.col("phash"), F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("bucket", "shard").orderBy(id_col)
    wc = Window.partitionBy("bucket", "shard")
    ratio_n = F.element_at(
        F.array(*[F.lit(n) for n, _ in AR_BUCKETS]), F.col("bucket") + 1
    )
    ratio_d = F.element_at(
        F.array(*[F.lit(d) for _, d in AR_BUCKETS]), F.col("bucket") + 1
    )
    batch = F.floor((F.row_number().over(w) - 1) / batch_size).cast(
        "long"
    )
    n_full = F.floor(F.count(F.lit(1)).over(wc) / batch_size)
    return df.select(
        id_col,
        "w",
        "h",
        "bucket",
        ratio_n.alias("ratio_n"),
        ratio_d.alias("ratio_d"),
        "shard",
        batch.alias("batch_id"),
        (batch < n_full).alias("is_full"),
    )


# --- DSIR importance resampling (T46) ---------------------------------------


def dsir_topk(
    docs: DataFrame,
    target_sources: tuple[str, ...] = ("src0", "src1"),
    k: int = 120,
    n_buckets: int = 4096,
) -> DataFrame:
    """T46: DSIR — Data Selection via Importance Resampling (Xie et
    al. 2023, arXiv:2302.03169) in its deterministic top-k form:
    score each RAW document by the hashed-n-gram log-likelihood ratio
    of a TARGET corpus vs the raw corpus, keep the top-k.

    Faithful shape: features are hashed unigram+bigram counts (the
    paper's hashed n-gram bag, here h7(gram) % n_buckets — md5-based,
    bit-identical in Spark and DuckDB); bucket models are +1-smoothed
    counts; a document's importance is Σ log p_target(b)/p_raw(b)
    over its gram occurrences.  The log-ratio is computed in PURE
    INTEGER fixed point so the oracle replays it exactly: per bucket
      s_b = floor(log2( (cp_b + 1) · 2^20  //  (cq_b + 1) ))
    via length(bin(x)) - 1 (both engines' bin() of a BIGINT), i.e.
    the LLR quantized to whole bits at 2^-20 resolution (ratios below
    2^-20 clamp to the smoothing floor); doc score =
    Σ s_b − 20·n_grams.  Noise-free top-k (score, then doc_id) is the
    paper's no-Gumbel ablation and the only replayable variant — a
    seeded-Gumbel selection would pin FP transcendentals across
    engines.  The normalizing constants log Z drop out of a top-k on
    a fixed corpus, as in the paper.

    Arithmetic bound: the fixed-point numerator (cp_b + 1)·2^20 stays
    inside int64 while every TARGET bucket count cp_b < 2^42 (~4·10^12
    occurrences in one of 4096 buckets) — the target corpus is the
    small curated side of DSIR by construction, so the bound holds
    with orders of magnitude to spare; raise n_buckets if a target
    ever approaches it.

    Scale shape (100 TB raw corpus): the gram fan-out is narrow; the
    bucket-count aggregates partial-combine map-side down to
    ≤ n_buckets rows each; the score table (≤ n_buckets rows) re-enters
    as a BROADCAST join — the raw corpus is never shuffled except the
    per-doc partial-agg'd sum; selection is TakeOrderedAndProject,
    never a full sort.  Two passes over the raw grams (counts, then
    scoring) — recompute beats materializing a 100 TB intermediate."""
    from pyspark.sql.functions import broadcast

    from mapnik_vector_tile_spark.operators.dedup import (
        h7,
        shingle_array_col,
        words_col,
    )

    def grams_of(df: DataFrame) -> DataFrame:
        g = F.concat(words_col(), shingle_array_col(2))
        return df.select(
            "doc_id",
            F.explode(g).alias("gram"),
        ).withColumn("bucket", h7(F.col("gram")) % n_buckets)

    is_tgt = F.col("source").isin(*target_sources)
    tgt_grams = grams_of(docs.filter(is_tgt))
    raw = docs.filter(~is_tgt)
    raw_grams = grams_of(raw)
    cp = tgt_grams.groupBy("bucket").agg(F.count("*").alias("cp"))
    cq = raw_grams.groupBy("bucket").agg(F.count("*").alias("cq"))
    ratio = F.expr(
        "(coalesce(cp, 0) + 1) * 1048576 div (cq + 1)"
    )
    score_tbl = (
        cq.join(cp, "bucket", "left")
        .select(
            "bucket",
            (F.length(F.bin(ratio)) - 1).cast("bigint").alias("s"),
        )
    )
    scored = (
        raw_grams.join(broadcast(score_tbl), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("s").alias("sum_s"),
            F.count("*").alias("n_grams"),
        )
        .select(
            "doc_id",
            (F.col("sum_s") - 20 * F.col("n_grams")).alias("score"),
            "n_grams",
        )
    )
    topk = scored.orderBy(F.col("score").desc(), "doc_id").limit(k)
    # k rows broadcast back against the raw corpus for the metadata
    # columns — the corpus-sized scored/metadata join never happens
    return (
        raw.select("doc_id", "lang", "source")
        .join(broadcast(topk), "doc_id")
        .select("doc_id", "lang", "source", "score", "n_grams")
        .orderBy(F.col("score").desc(), "doc_id")
    )


# --- temperature-based domain mixture (T30) ---------------------------------


def temperature_resample(
    df: DataFrame,
    budget_rows: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based corpus mixing (the multilingual-LM sampling
    rule, XLM-R/mT5 lineage, at T = 2): domain i's target share is
    proportional to n_i^(1/2), which up-weights tail domains and
    down-weights the head relative to natural frequency. Given a row
    budget M, the expected take is m_i = M·√n_i / Σ√n_j capped at
    n_i, applied as a deterministic per-row hash coin (same splitmix64
    bucket as assign_split — resumable, engine-agnostic).

    EXACT arithmetic: weights use integer isqrt(n_i) (not float sqrt),
    so the per-domain keep threshold
    min(BUCKETS, BUCKETS·M·isqrt(n_i) // (Σ isqrt · n_i)) is a pure
    BIGINT expression both engines replay bit-for-bit — no FP sum
    order anywhere.

    Scale shape: ONE tiny partial-agg'd count per domain collected to
    the driver (|domains| scalars — the convergence-witness pattern),
    thresholds re-enter as a broadcast CASE literal, the coin filter
    is map-side; no shuffle touches the corpus. Returns the kept rows
    with their domain threshold attached (rate_bp, per BUCKETS)."""
    import math

    counts = {
        r[0]: int(r[1])
        for r in df.groupBy(stratum_col).count().collect()
    }
    if not counts:
        raise ValueError("temperature_resample: empty input")
    s = sum(math.isqrt(n) for n in counts.values())
    rates = {
        k: min(
            BUCKETS,
            BUCKETS * budget_rows * math.isqrt(n) // (s * n),
        )
        for k, n in counts.items()
    }
    expr = None
    for k in sorted(rates):
        cond = F.col(stratum_col) == k
        expr = (
            F.when(cond, F.lit(rates[k]))
            if expr is None
            else expr.when(cond, F.lit(rates[k]))
        )
    rate = expr.otherwise(F.lit(0))
    out = with_sample_hash(df, id_col).withColumn("rate_bp", rate)
    return out.filter(
        F.pmod(F.col("hord"), F.lit(BUCKETS)) < F.col("rate_bp")
    ).drop("hord")


# --- UniMax epoch-capped mixture (T30b) --------------------------------------


def unimax_resample(
    df: DataFrame,
    budget_rows: int,
    max_epochs: int = 3,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """UniMax corpus mixing (Chung et al. 2023, "UniMax: Fairer and
    More Effective Language Sampling"): allocate a row budget as
    uniformly as possible across domains, capping each domain at
    ``max_epochs`` passes over its data. Ascending-size greedy: for
    each domain (smallest first), take
    m = min(n·E, remaining // domains_left) — small domains get their
    full epoch cap, large ones split the leftover evenly. Pure
    integer arithmetic, replayed by the oracle as a recursive CTE.

    Unlike temperature_resample (subsampling only), UniMax UPSAMPLES:
    a domain with m > n emits each row floor(m/n) times plus one more
    on a deterministic hash coin with rate (m mod n)/n — so the
    expected take is exactly m and re-runs are bit-identical. Output
    rows carry ``copy`` (0-based repetition index), ``base_copies``
    and ``rate_bp``.

    Scale shape: one tiny per-domain count to the driver (the
    convergence-witness pattern), the greedy loop is O(|domains|)
    driver-side scalars, thresholds re-enter as broadcast CASE
    literals, and the explode is map-side (sequence length ≤ E+1) —
    no shuffle touches the corpus."""
    if max_epochs < 1:
        raise ValueError("unimax_resample: max_epochs must be >= 1")
    counts = {
        r[0]: int(r[1]) for r in df.groupBy(stratum_col).count().collect()
    }
    if not counts:
        raise ValueError("unimax_resample: empty input")
    remaining = int(budget_rows)
    alloc: dict[str, int] = {}
    order = sorted(counts, key=lambda k: (counts[k], k))
    for pos, k in enumerate(order):
        quota = max(remaining, 0) // (len(order) - pos)
        m = min(counts[k] * max_epochs, quota)
        alloc[k] = m
        remaining -= m
    base, rate = None, None
    for k in sorted(alloc):
        n = counts[k]
        b = alloc[k] // n
        rbp = BUCKETS * (alloc[k] % n) // n
        cond = F.col(stratum_col) == k
        base = (
            F.when(cond, F.lit(b))
            if base is None
            else base.when(cond, F.lit(b))
        )
        rate = (
            F.when(cond, F.lit(rbp))
            if rate is None
            else rate.when(cond, F.lit(rbp))
        )
    out = (
        with_sample_hash(df, id_col)
        .withColumn("base_copies", base.otherwise(F.lit(0)))
        .withColumn("rate_bp", rate.otherwise(F.lit(0)))
        .withColumn(
            "n_copies",
            F.col("base_copies")
            + (F.pmod(F.col("hord"), F.lit(BUCKETS)) < F.col("rate_bp"))
            .cast("long"),
        )
        .filter(F.col("n_copies") > 0)
    )
    return out.withColumn(
        "copy", F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1))
    ).drop("hord", "n_copies")
