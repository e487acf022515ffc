"""operators.sampling — deterministic split / stratified / balanced-k.

The oracle pairs (q_train_split, q_stratified_sample,
q_balanced_sample) gate cross-engine bit-parity; these tests pin the
operator-level CONTRACTS: partition totality, per-stratum exactness,
and rerun determinism.
"""

import numpy as np
import pytest

from tests.conftest import SF_DIR

from mapnik_vector_tile_spark.operators import sampling as SMP
from mapnik_vector_tile_spark.sources.synth import splitmix64


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_sample_hash_matches_numpy(spark, docs):
    rows = SMP.with_sample_hash(docs).select("doc_id", "hord").collect()
    ids = np.array([r.doc_id for r in rows], dtype=np.uint64)
    expect = (splitmix64(ids) >> np.uint64(11)).astype(np.int64)
    got = np.array([r.hord for r in rows], dtype=np.int64)
    assert (got == expect).all()
    assert (got >= 0).all()  # 53-bit: sign-safe in every engine


def test_split_is_total_and_deterministic(spark, docs):
    out = SMP.assign_split(docs).select("doc_id", "split")
    a = {r.doc_id: r.split for r in out.collect()}
    b = {r.doc_id: r.split for r in out.collect()}
    assert a == b
    assert len(a) == docs.count()  # every row gets exactly one split
    assert set(a.values()) <= {"train", "val", "test"}
    # 80/10/10 thresholds: train must dominate on any non-tiny corpus
    n = len(a)
    n_train = sum(1 for s in a.values() if s == "train")
    assert 0.6 * n < n_train < 0.95 * n


def test_stratified_sample_is_a_subset_with_per_stratum_rates(spark, docs):
    kept = SMP.stratified_sample(docs).select("doc_id", "lang", "hord").collect()
    base = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    for r in kept:
        assert base[r.doc_id] == r.lang
        rate = SMP.STRATA_RATES[r.lang]
        assert r.hord % SMP.BUCKETS < rate
    # and nothing below-threshold was dropped: recompute keep-set locally
    ids = np.array(sorted(base), dtype=np.uint64)
    hord = (splitmix64(ids) >> np.uint64(11)).astype(np.int64)
    expect = {
        int(i)
        for i, h in zip(ids, hord)
        if h % SMP.BUCKETS < SMP.STRATA_RATES[base[int(i)]]
    }
    assert {r.doc_id for r in kept} == expect


def test_balanced_topk_exact_k_per_stratum(spark, docs):
    k = 7
    out = SMP.balanced_topk(docs, k=k).select("lang", "doc_id", "rnk").collect()
    sizes = {r.lang: r.n for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    per = {}
    for r in out:
        per.setdefault(r.lang, []).append(r.rnk)
    assert set(per) == set(sizes)
    for lang, rnks in per.items():
        assert sorted(rnks) == list(range(1, min(k, sizes[lang]) + 1))
    # deterministic across runs
    again = {(r.lang, r.doc_id, r.rnk) for r in SMP.balanced_topk(docs, k=k).select("lang", "doc_id", "rnk").collect()}
    assert {(r.lang, r.doc_id, r.rnk) for r in out} == again


def test_pack_contiguous_invariants(spark, docs):
    out = SMP.pack_contiguous(docs).select(
        "lang", "shard", "doc_id", "n_chars", "bin"
    ).collect()
    assert len(out) == docs.count()  # packing is total
    groups = {}
    for r in out:
        groups.setdefault((r.lang, r.shard), []).append(r)
    budget = SMP.PACK_BUDGET
    for rows in groups.values():
        rows.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rows:
            # bin == floor(exclusive prefix / budget), recomputed locally
            assert r.bin == cum // budget
            cum += r.n_chars
        # bins appear in nondecreasing order starting at 0
        bins = [r.bin for r in rows]
        assert bins[0] == 0 and bins == sorted(bins)


def test_ar_bucket_batches_invariants(spark):
    """Nearest-bucket vs a Fraction-exact brute force, fixed batch
    sizes for full batches, and shard-bounded packing."""
    from fractions import Fraction

    from mapnik_vector_tile_spark.operators.sampling import (
        AR_BUCKETS,
        ar_bucket_batches,
    )
    from mapnik_vector_tile_spark.sources.synth import images_df

    B, S = 8, 4
    rows = ar_bucket_batches(
        images_df(spark, 300, with_bytes=False), batch_size=B, n_shards=S
    ).collect()
    assert len(rows) == 300
    groups = {}
    for r in rows:
        ar = Fraction(r.w, r.h)
        errs = [
            (abs(ar - Fraction(n, d)), i)
            for i, (n, d) in enumerate(AR_BUCKETS)
        ]
        best = min(errs)[1]
        assert r.bucket == best, (r.w, r.h, r.bucket, best)
        assert (r.ratio_n, r.ratio_d) == AR_BUCKETS[r.bucket]
        assert 0 <= r.shard < S
        groups.setdefault((r.bucket, r.shard), []).append(r)
    for rs in groups.values():
        rs.sort(key=lambda r: r.image_id)
        by_batch = {}
        for r in rs:
            by_batch.setdefault(r.batch_id, []).append(r)
        n_full = len(rs) // B
        for bid, members in by_batch.items():
            if bid < n_full:
                assert len(members) == B
                assert all(m.is_full for m in members)
            else:
                assert len(members) == len(rs) % B
                assert not any(m.is_full for m in members)


def test_temperature_resample_exact_keep_set(spark, docs):
    """T30: the kept set is exactly {rows with hord%BUCKETS < rate_lang}
    where rate_lang follows the T=2 (sqrt) temperature rule on integer
    arithmetic — recomputed locally from scratch."""
    import math

    budget = docs.count() // 2
    out = SMP.temperature_resample(docs, budget_rows=budget).select(
        "doc_id", "lang", "rate_bp"
    )
    got = {(r.doc_id, r.lang, r.rate_bp) for r in out.collect()}
    assert got == {(r.doc_id, r.lang, r.rate_bp) for r in out.collect()}

    base = {
        r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()
    }
    counts: dict[str, int] = {}
    for lang in base.values():
        counts[lang] = counts.get(lang, 0) + 1
    s = sum(math.isqrt(n) for n in counts.values())
    rates = {
        k: min(
            SMP.BUCKETS,
            SMP.BUCKETS * budget * math.isqrt(n) // (s * n),
        )
        for k, n in counts.items()
    }
    ids = np.array(sorted(base), dtype=np.uint64)
    hord = (splitmix64(ids) >> np.uint64(11)).astype(np.int64)
    expect = {
        (int(i), base[int(i)], rates[base[int(i)]])
        for i, h in zip(ids, hord)
        if h % SMP.BUCKETS < rates[base[int(i)]]
    }
    assert got == expect
    # temperature flattening: the head stratum's keep RATE must be
    # strictly below a tail stratum's (en dominates the synth corpus)
    head = max(counts, key=counts.get)
    tail = min(counts, key=counts.get)
    assert counts[head] > counts[tail]
    assert rates[head] < rates[tail]


def test_temperature_resample_budget_cap(spark, docs):
    """A budget >= corpus size caps every stratum at BUCKETS (keep all)."""
    n = docs.count()
    out = SMP.temperature_resample(docs, budget_rows=n * SMP.BUCKETS)
    assert out.count() == n


def test_unimax_allocation_and_copies(spark, docs):
    """T30b: greedy allocation exactness + deterministic repetition.
    Recomputes the ascending-size greedy locally, then checks every
    exploded row count, copy index range, and that the smallest
    language is epoch-capped while larger ones are budget-capped."""
    E = 2
    budget = docs.count() * 2
    out = SMP.unimax_resample(docs, budget_rows=budget, max_epochs=E)
    rows = out.select("doc_id", "lang", "copy", "base_copies", "rate_bp").collect()

    base = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    counts: dict[str, int] = {}
    for lang in base.values():
        counts[lang] = counts.get(lang, 0) + 1
    remaining = budget
    alloc = {}
    order = sorted(counts, key=lambda k: (counts[k], k))
    for pos, k in enumerate(order):
        m = min(counts[k] * E, max(remaining, 0) // (len(order) - pos))
        alloc[k] = m
        remaining -= m
    smallest = order[0]
    assert alloc[smallest] == counts[smallest] * E  # epoch-capped
    assert sum(alloc.values()) <= budget  # never over-allocates

    ids = np.array(sorted(base), dtype=np.uint64)
    hord = (splitmix64(ids) >> np.uint64(11)).astype(np.int64)
    expect: dict[int, int] = {}
    for i, h in zip(ids, hord):
        lang = base[int(i)]
        n, m = counts[lang], alloc[lang]
        cp = m // n + (1 if h % SMP.BUCKETS < SMP.BUCKETS * (m % n) // n else 0)
        if cp:
            expect[int(i)] = cp
    got: dict[int, set] = {}
    for r in rows:
        got.setdefault(r.doc_id, set()).add(r.copy)
    assert {d: len(c) for d, c in got.items()} == expect
    for d, c in got.items():
        assert c == set(range(len(c)))  # copy indices are 0..k-1
    # expected take tracks the allocation within coin variance
    for k in order:
        n_out = sum(cp for d, cp in expect.items() if base[d] == k)
        assert abs(n_out - alloc[k]) <= max(3, alloc[k] // 10)


def test_spatial_block_split_no_leakage(spark):
    """T17d block split: (1) every row of a block gets ONE split —
    train/test never share a cell; (2) the block coin matches
    splitmix64(cell_id) exactly; (3) nearby points (same z6 cell)
    always co-assign, the anti-leak property a row-level split lacks."""
    import pyspark.sql.functions as F

    from mapnik_vector_tile_spark.functions import tilemath as tm

    n = 5000
    ids = spark.range(n).select(F.col("id"))
    # deterministic world-spread mercator points (point_cte arithmetic)
    k = F.col("id")
    mx = (((k * 2654435761) % 4294967296) / F.lit(float(2**32))) * F.lit(
        2 * tm.W
    ) - F.lit(tm.W)
    my = (
        ((k * 1103515245 + 12345) % 4294967296) / F.lit(float(2**32))
    ) * F.lit(2 * tm.W) - F.lit(tm.W)
    pts = ids.select("id", mx.alias("mx"), my.alias("my"))
    out = SMP.spatial_block_split(pts, z=6).collect()

    by_block: dict = {}
    for r in out:
        by_block.setdefault(r.block, set()).add(r.split)
    assert all(len(s) == 1 for s in by_block.values())  # no leakage

    # coin replay: splitmix64(block) >> 11 mod 10000 vs thresholds
    blocks = np.array(sorted(by_block), dtype=np.uint64)
    coin = (splitmix64(blocks) >> np.uint64(11)).astype(np.int64) % 10000
    want = np.where(
        coin < SMP.SPLIT_TRAIN, "train",
        np.where(coin < SMP.SPLIT_VAL, "val", "test"),
    )
    got = [next(iter(by_block[int(b)])) for b in blocks]
    assert got == list(want)

    # split shares are block-hash-driven: all three present at n=5000
    shares = {s for r in out for s in [r.split]}
    assert shares == {"train", "val", "test"}
