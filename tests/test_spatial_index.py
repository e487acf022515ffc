"""STR R-tree bulk packing (operators/spatial_index) — the classical
STR invariants (Leutenegger et al. 1997) plus the exact-rank-select
primitive the cuts are built on."""

import numpy as np
import pytest

from mapnik_vector_tile_spark.operators.spatial_index import (
    _ceil_sqrt,
    rank_select,
    str_pack_points,
)


def _pts_df(spark, n, seed=7):
    rng = np.random.default_rng(seed)
    xs = rng.permutation(n) * 1000 + rng.integers(0, 1000, n)
    ys = rng.permutation(n) * 1000 + rng.integers(0, 1000, n)
    # distinct per axis by construction (permutation major digits)
    rows = [(int(i), int(x), int(y)) for i, (x, y) in enumerate(zip(xs, ys))]
    return spark.createDataFrame(rows, "k long, xi long, yi long"), rows


def test_ceil_sqrt_exact():
    for p in list(range(1, 200)) + [10**6, 10**6 + 1, 2**40]:
        s = _ceil_sqrt(p)
        assert (s - 1) ** 2 < p <= s**2


def test_rank_select_matches_sort(spark):
    df, rows = _pts_df(spark, 500)
    vals = sorted(r[1] for r in rows)
    ranks = [0, 1, 17, 250, 498, 499]
    got = rank_select(df, "xi", ranks, n_buckets=32)
    assert got == [float(vals[r]) for r in ranks]


def test_str_pack_invariants(spark):
    n, cap = 1000, 32
    df, rows = _pts_df(spark, n)
    leaves = str_pack_points(df, "xi", "yi", "k", capacity=cap).collect()
    # every point lands in exactly one leaf
    assert sum(r["n"] for r in leaves) == n
    # classical STR balance: every leaf is full except possibly the
    # last leaf of each slab
    by_slab = {}
    for r in leaves:
        by_slab.setdefault(r["slab"], []).append(r)
    s_slabs = _ceil_sqrt(-(-n // cap))
    assert len(by_slab) == s_slabs
    m = -(-n // s_slabs)
    for s, ls in by_slab.items():
        sizes = [r["n"] for r in sorted(ls, key=lambda r: r["leaf"])]
        assert sum(sizes) in (m, n - (s_slabs - 1) * m)
        assert all(sz == cap for sz in sizes[:-1])
        assert 0 < sizes[-1] <= cap
        # leaves within a slab are y-disjoint and y-ordered
        ordered = sorted(ls, key=lambda r: r["leaf"])
        for a, b in zip(ordered, ordered[1:]):
            assert a["maxy"] < b["miny"]
    # slabs are x-disjoint
    slabs = sorted(
        (
            min(r["minx"] for r in ls),
            max(r["maxx"] for r in ls),
            s,
        )
        for s, ls in by_slab.items()
    )
    for a, b in zip(slabs, slabs[1:]):
        assert a[1] < b[0]


def test_str_pack_single_slab(spark):
    # n <= capacity: one slab, one leaf, no cuts anywhere
    df, rows = _pts_df(spark, 20)
    leaves = str_pack_points(df, "xi", "yi", "k", capacity=64).collect()
    assert len(leaves) == 1 and leaves[0]["n"] == 20


def test_rank_select_rejects_bad_ranks(spark):
    df, _ = _pts_df(spark, 10)
    with pytest.raises(ValueError):
        rank_select(df, "xi", [10])
