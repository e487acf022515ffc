"""Cardinality and quantile summaries — the training-pipeline corpus
audit primitives (distinct documents/users/urls, token-length
distribution tails) built so every summary is CROSS-ENGINE EXACT,
unlike approx_count_distinct / approx_percentile whose sketch layouts
are implementation-private and cannot be oracle-checked.

KMV: hash every value with the committed md5-prefix integer hash
(operators.dedup.h14, 56-bit — the same cross-engine-exact primitive
the text oracles pin), keep the k smallest DISTINCT hashes, estimate

    D̂ = (k_used − 1) · 2^56 / h_(k)

Standard error ≈ 1/√(k−2) (Bar-Yossef et al. 2002, the KMV/bottom-k
estimator). Every intermediate is integer-exact and the one float
division is replicated op-for-op in the DuckDB twin, so q_distinct_kmv
is value-hash gated, not statistically gated.

Scale shape: distinct() partial-aggregates map-side; the global
k-smallest compiles to TakeOrderedAndProject (per-partition top-k,
driver merges k rows per partition — k is tiny), NOT a full sort
shuffle; asserted in tests/test_plan_quality.py. Sketches of shards
merge by unioning hash sets and re-taking the k smallest (associative),
so the operator composes with incremental corpus builds.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapnik_vector_tile_spark.operators.dedup import h14

KMV_SPACE = float(1 << 56)  # h14 hash space


def kmv_hashes(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """The k smallest distinct 56-bit hashes of ``col`` — the sketch
    itself (mergeable: union shards and re-limit)."""
    return (
        df.select(h14(F.col(col).cast("string")).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )


def kmv_distinct(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """One-row estimate: (k, n_used, kth, est_distinct). n_used < k
    means the column had fewer distinct values than k, where KMV
    degrades gracefully toward the exact count."""
    return kmv_hashes(df, col, k).agg(
        F.lit(k).cast("int").alias("k"),
        F.count("*").cast("long").alias("n_used"),
        F.max("hv").alias("kth"),
        F.floor(
            (F.count("*") - F.lit(1)) * F.lit(KMV_SPACE) / F.max("hv")
        ).cast("long").alias("est_distinct"),
    )


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    names: tuple[str, ...] | None = None,
) -> DataFrame:
    """EXACT per-group quantiles by rank selection — percentile_disc
    (lower) semantics: the group's sorted value at 0-based rank
    floor((n−1)·q). One row per group: (group, n_rows, <one column per
    q>).

    Exactness stance: approx_percentile's GK/KLL sketch is
    implementation-private and engine-specific; rank selection is a
    definition both engines share, so the DuckDB twin value-hashes the
    quantiles themselves (q_token_quantiles). The float product
    (n−1)·q is computed identically (IEEE double) on both sides —
    deterministic even at floor boundaries.

    Plan: ONE hash shuffle on the group key feeds both the sort-rank
    window and the count window; rank selection is a per-row
    predicate; the final groupBy partial-aggregates map-side. Ties in
    ``value_col`` are harmless — any stable order among equal values
    selects the same value at a given rank. This is the per-group
    shape (bounded group sizes, high group cardinality); GLOBAL
    quantiles over 100 TB should bucket first (fixed-grid histogram,
    then rank-select inside the one candidate bucket) rather than
    sort-window a single partition."""
    from pyspark.sql.window import Window

    # p50 / p90 / p99 / p05 / p99_9 — format(q*100, 'g') avoids the
    # string-munging failure modes of manipulating str(q) directly
    # (q=1.0 must not yield a dotted column name)
    names = names or tuple(
        "p" + format(q * 100, "g").replace(".", "_").zfill(2) for q in qs
    )
    w_ord = Window.partitionBy(group_col).orderBy(value_col)
    w_all = Window.partitionBy(group_col)
    r = (
        df.select(group_col, value_col)
        .withColumn("rn", F.row_number().over(w_ord) - 1)
        .withColumn("n", F.count(F.lit(1)).over(w_all))
    )
    aggs = [
        F.max(
            F.when(
                F.col("rn")
                == F.floor((F.col("n") - 1) * F.lit(float(q))).cast("long"),
                F.col(value_col),
            )
        ).alias(nm)
        for q, nm in zip(qs, names)
    ]
    return r.groupBy(group_col).agg(
        F.max("n").cast("long").alias("n_rows"), *aggs
    )


def global_quantiles(
    df: DataFrame,
    value_col: str,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    names: tuple[str, ...] | None = None,
    n_buckets: int = 4096,
) -> DataFrame:
    """EXACT GLOBAL quantiles WITHOUT a global sort — the 100 TB shape
    group_quantiles' docstring prescribes, implemented: two passes.

    Pass 1: (count, min, max) + a fixed-grid histogram — ONE map-side-
    combining aggregate; the driver receives ≤ n_buckets rows (a
    bounded summary, like collecting a bloom filter or a KMV sketch —
    NOT data) and walks the cumulative counts to locate, for each
    target rank floor((n−1)·q), its bucket and within-bucket rank.
    Pass 2: filter to the ≤len(qs) candidate buckets (narrow, pushed
    to the scan), rank ONLY those rows with a per-bucket sort window,
    and select the target offsets. Wall-clock: two scans, zero global
    sort, shuffle bounded by candidate-bucket volume (~n/n_buckets
    rows per quantile; heavy ties concentrate a bucket — recurse
    manually with a tighter range if a corpus is that degenerate).

    Result is EXACTLY the rank-selection definition (the value at
    0-based rank floor((n−1)·q) in the full sorted order): bucketing
    by value preserves rank order across buckets, so within-bucket
    rank + cumulative offset = global rank. The DuckDB twin
    (q_global_quantiles) computes the same definition by a FULL SORT
    — an algorithm-independent oracle. Returns ONE row:
    (n_rows, <one column per q>)."""
    names = names or tuple(
        "p" + format(q * 100, "g").replace(".", "_").zfill(2) for q in qs
    )
    v = F.col(value_col)
    first = df.agg(
        F.count(v).alias("n"), F.min(v).alias("lo"), F.max(v).alias("hi")
    ).collect()[0]
    n, lo, hi = int(first["n"]), first["lo"], first["hi"]
    spark = df.sparkSession
    if n == 0:
        raise ValueError("global_quantiles: empty input")
    # float multiply matches the oracle's floor((n-1)*q) double math
    ranks = [int(np.floor((n - 1) * float(q))) for q in qs]
    out_schema = "n_rows long, " + ", ".join(f"{nm} double" for nm in names)
    if lo == hi:
        return spark.createDataFrame(
            [tuple([n] + [float(lo)] * len(qs))], schema=out_schema
        )
    width = (float(hi) - float(lo)) / float(n_buckets)
    bucket = F.least(
        F.lit(n_buckets - 1),
        F.floor((v.cast("double") - F.lit(float(lo))) / F.lit(width)).cast(
            "long"
        ),
    )
    hist = {
        int(r["b"]): int(r["c"])
        for r in df.select(bucket.alias("b"))
        .groupBy("b")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    targets: list[tuple[int, int, str]] = []  # (bucket, local_rank, name)
    cum = 0
    ordered = sorted(hist)
    bi = 0
    for rank, nm in sorted(zip(ranks, names)):
        while bi < len(ordered) and cum + hist[ordered[bi]] <= rank:
            cum += hist[ordered[bi]]
            bi += 1
        targets.append((ordered[bi], rank - cum, nm))
    cand = sorted({b for b, _, _ in targets})
    from pyspark.sql.window import Window

    ranked = (
        df.select(v.alias("_v"), bucket.alias("_b"))
        .filter(F.col("_b").isin(cand))
        .withColumn(
            "_r",
            F.row_number().over(
                Window.partitionBy("_b").orderBy("_v")
            )
            - 1,
        )
    )
    want = spark.createDataFrame(
        [(b, r, nm) for b, r, nm in targets], "_b long, _r int, _nm string"
    )
    got = {
        r["_nm"]: float(r["_v"])
        for r in ranked.join(F.broadcast(want), ["_b", "_r"]).collect()
    }
    return spark.createDataFrame(
        [tuple([n] + [got[nm] for nm in names])], schema=out_schema
    )


def hll_registers(df: DataFrame, col: str, p: int = 10) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007) over ``col``,
    built on the same committed 56-bit md5-prefix hash as KMV/CMS so
    the whole sketch is CROSS-ENGINE EXACT: bucket = top ``p`` hash
    bits, rho = leading-zero run of the remaining w = 56−p bits + 1
    (computed as w+1 − bitlength via ``bin()``, which both engines
    define identically for non-negative ints, '0'→length 1 handled by
    the rem=0 branch), register = MAX rho per bucket. ONE map-side-
    combining aggregate; ≤2^p rows out. Registers merge across shards
    by element-wise MAX (associative) — the same incremental story as
    the other sketches. Output: (b long, reg int)."""
    w = 56 - p
    hv = h14(F.col(col).cast("string"))
    rem = hv.bitwiseAND(F.lit((1 << w) - 1))
    rho = F.when(rem == 0, F.lit(w + 1)).otherwise(
        F.lit(w + 1) - F.length(F.bin(rem))
    )
    return (
        df.select(
            F.shiftright(hv, w).alias("b"), rho.cast("int").alias("r")
        )
        .groupBy("b")
        .agg(F.max("r").alias("reg"))
    )


def hll_scale_const(p: int) -> float:
    """α_m·m²·2^(w+1) as ONE Python double — both engines embed this
    same literal so the estimate's sole rounding is the final divide."""
    m = 1 << p
    w = 56 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(1 << (w + 1))


def hll_distinct(df: DataFrame, col: str, p: int = 10) -> DataFrame:
    """One-row HLL cardinality estimate, transcendental-free and
    value-hash gated (q_distinct_hll): the raw-estimate denominator
    Z = Σ_j 2^−M_j is kept EXACT by integer scaling — s_scaled =
    Σ_j 2^(w+1−M_j) as BIGINT (≤ 2^p·2^(w+1) = 2^57, fits; empty
    buckets contribute the full 2^(w+1) term) — so the only float ops
    are one literal product and one division, replicated op-for-op in
    the twin. est_raw = floor(α_m·m²·2^(w+1) / s_scaled) with the
    standard α_m = 0.7213/(1 + 1.079/m); the small-range linear-
    counting and large-range corrections need ln() (transcendental,
    engine-private rounding) and are CALLER policy — v_zero is
    reported so a caller can apply m·ln(m/v_zero) when est ≤ 2.5m.
    Output: (m, v_zero, s_scaled, est_raw)."""
    m = 1 << p
    w = 56 - p
    regs = hll_registers(df, col, p)
    return regs.agg(
        F.lit(m).cast("int").alias("m"),
        (F.lit(m) - F.count("*")).cast("long").alias("v_zero"),
        (
            # shiftleft's Python wrapper takes a literal bit count;
            # the per-row shift by (w+1 − reg) needs the SQL form
            F.coalesce(  # SUM over zero registers is NULL, not 0
                F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {w + 1} - reg)")),
                F.lit(0).cast("long"),
            )
            + (F.lit(m) - F.count("*")) * F.lit(1 << (w + 1)).cast("long")
        ).cast("long").alias("s_scaled"),
    ).select(
        "m",
        "v_zero",
        "s_scaled",
        F.floor(
            F.lit(hll_scale_const(p)) / F.col("s_scaled").cast("double")
        ).cast("long").alias("est_raw"),
    )


def count_min_estimates(
    docs: DataFrame,
    d: int = 4,
    width: int = 1024,
    top: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """T35 Count-Min sketch (Cormode & Muthukrishnan 2005) heavy-hitter
    estimates, cross-engine EXACT like the KMV sketch: d hash rows of
    ``width`` counters keyed by the committed md5-prefix hash with a
    per-row salt ('cms<i>|' prefix), estimate(v) = min over rows of
    counter[i][h_i(v)]. The output pairs each of the ``top`` exact
    heavy hitters with its CMS estimate — estimate >= exact always
    (one-sided error, ε ≈ e/width over the token mass), and both the
    counters and the min are pure integer relational algebra, so the
    DuckDB twin replays the sketch bit-for-bit rather than
    'approximately agreeing'.

    Scale shape: counters are ONE map-side-combined groupBy over a
    d-way in-row explode (d·width cells total — broadcastable); the
    exact top-k compiles to TakeOrderedAndProject; the estimate join
    touches top·d rows. Merging shards = summing counters
    (associative), same incremental story as KMV. Output:
    (token, exact_n, est_n)."""
    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                F.pmod(
                    h14(F.concat(F.lit(f"cms{i}|"), F.col("tok"))),
                    F.lit(width),
                ).alias("bucket"),
            )
            for i in range(d)
        ]
    )
    cells = (
        toks.select(F.explode(rows).alias("rb"))
        .groupBy("rb.row", "rb.bucket")
        .agg(F.count("*").alias("cnt"))
    )
    exact = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "tok")
        .limit(top)
    )
    probes = exact.select(
        "tok", "exact_n", F.explode(rows).alias("rb")
    ).select("tok", "exact_n", "rb.row", "rb.bucket")
    return (
        probes.join(cells, ["row", "bucket"])
        .groupBy("tok", "exact_n")
        .agg(F.min("cnt").cast("long").alias("est_n"))
        .select(
            F.col("tok").alias("token"),
            F.col("exact_n").cast("long").alias("exact_n"),
            "est_n",
        )
    )
