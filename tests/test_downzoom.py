"""U5 child->parent rollup (downzoom): kernel exactness, the
overzoom/downzoom inverse identity, dictionary merging, the buffered
dedupe path, and the Spark operator against the kernel."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mapnik_vector_tile_spark.functions import geomcodec as gc
from mapnik_vector_tile_spark.functions import pbf
from mapnik_vector_tile_spark.operators import composite as C


def _zz(v: int) -> int:
    return v << 1 if v >= 0 else ((-v) << 1) - 1


def _point_layer(pts, name="pts", fid0=0, extent=4096, props=True):
    lb = pbf.LayerBuilder(name, extent=extent)
    for i, (x, y) in enumerate(pts):
        lb.add_feature(
            fid0 + i,
            gc.GEOM_POINT,
            np.array([9, _zz(x), _zz(y)], dtype=np.uint64),
            {"k": i} if props else {},
        )
    return lb.build()


def _decode_points(blob):
    d = pbf.split_layer(blob)
    out = []
    for fid, gt, tags, rg, _rr in d["features"]:
        xs, ys, _ = gc.decode_geometry(
            int(gt), pbf._varints_small(rg).astype(np.int64)
        )
        props = {
            d["keys"][tags[i]]: pbf.decode_value(d["raw_values"][tags[i + 1]])
            for i in range(0, len(tags), 2)
        }
        out.append((fid, int(xs[0]), int(ys[0]), props))
    return out


def test_kernel_floor_shift_and_quadrant_offsets():
    c00 = _point_layer([(0, 0), (101, 201)], fid0=0)
    c10 = _point_layer([(4096, 3)], fid0=10)
    c11 = _point_layer([(5, -7)], fid0=20)
    blob, nf, npts = C.downzoom_parent_layer(
        [(0, 0, c00), (1, 0, c10), (1, 1, c11)]
    )
    assert (nf, npts) == (4, 4)
    got = _decode_points(blob)
    # (cy, cx) quadrant order, wire order within each child
    assert [(f, x, y) for f, x, y, _ in got] == [
        (0, 0, 0),
        (1, 50, 100),  # floor(101/2), floor(201/2)
        (10, 4096, 1),  # (4096+4096)>>1, 3>>1
        (20, 2050, 2044),  # (5+4096)>>1, (-7+4096)>>1
    ]
    # negative buffered coords floor (arithmetic shift), never truncate
    cneg = _point_layer([(-7, -1)], fid0=0)
    b2, _, _ = C.downzoom_parent_layer([(0, 0, cneg)])
    assert _decode_points(b2)[0][1:3] == (-4, -1)


def test_kernel_merges_dictionaries_first_appearance():
    c00 = _point_layer([(2, 2), (4, 4)], fid0=0)
    c11 = _point_layer([(6, 6)], fid0=5)
    blob, _, _ = C.downzoom_parent_layer([(0, 0, c00), (1, 1, c11)])
    d = pbf.split_layer(blob)
    assert d["keys"] == ["k"]
    vals = [pbf.decode_value(v) for v in d["raw_values"]]
    assert vals == [0, 1]  # child c11's k=0 reuses the merged entry
    props = [p for *_rest, p in _decode_points(blob)]
    assert props == [{"k": 0}, {"k": 1}, {"k": 0}]


def test_overzoom_then_downzoom_is_identity():
    parent = _point_layer(
        [(0, 0), (101, 201), (2048, 2048), (4095, 1)], fid0=0
    )
    kids = C.overzoom_children(parent, 1, buffer_units=0)
    back, nf, _ = C.downzoom_parent_layer(
        [(cx, cy, b) for cx, cy, b, _, _ in kids], dedupe_fids=True
    )
    assert sorted((f, x, y) for f, x, y, _ in _decode_points(back)) == [
        (0, 0, 0),
        (1, 101, 201),
        (2, 2048, 2048),
        (3, 4095, 1),
    ]
    assert nf == 4


def test_dedupe_fids_drops_buffered_seam_copies():
    # the same feature id in two siblings (buffered encode): halved
    # coordinates agree, first quadrant wins, one copy survives
    c00 = _point_layer([(4096, 10)], fid0=7)
    c10 = _point_layer([(0, 10)], fid0=7)
    blob, nf, _ = C.downzoom_parent_layer(
        [(0, 0, c00), (1, 0, c10)], dedupe_fids=True
    )
    assert nf == 1
    assert _decode_points(blob)[0][:3] == (7, 2048, 5)
    # without the flag both copies are kept (unbuffered default is
    # exact, so the flag is opt-in)
    _, nf2, _ = C.downzoom_parent_layer([(0, 0, c00), (1, 0, c10)])
    assert nf2 == 2


def test_mixed_extent_quadrants_raise():
    a = _point_layer([(1, 1)], extent=4096)
    b = _point_layer([(1, 1)], extent=512)
    with pytest.raises(ValueError, match="disagree"):
        C.downzoom_parent_layer([(0, 0, a), (1, 0, b)])


def test_polygon_and_line_survive_rollup():
    lb = pbf.LayerBuilder("g", extent=4096)
    px = np.array([0, 1000, 1000, 0], dtype=np.int64)
    py = np.array([0, 0, 1000, 1000], dtype=np.int64)
    lb.add_feature(
        1,
        gc.GEOM_POLYGON,
        np.asarray(
            gc.encode_geometry(gc.GEOM_POLYGON, px, py, np.array([0, 4])),
            dtype=np.uint64,
        ),
        {},
    )
    lx = np.array([10, 500], dtype=np.int64)
    ly = np.array([20, 600], dtype=np.int64)
    lb.add_feature(
        2,
        gc.GEOM_LINESTRING,
        np.asarray(
            gc.encode_geometry(gc.GEOM_LINESTRING, lx, ly, np.array([0, 2])),
            dtype=np.uint64,
        ),
        {},
    )
    blob, nf, _ = C.downzoom_parent_layer([(1, 1, lb.build())])
    assert nf == 2
    d = pbf.split_layer(blob)
    fid, gt, _, rg, _ = d["features"][0]
    xs, ys, offs = gc.decode_geometry(
        int(gt), pbf._varints_small(rg).astype(np.int64)
    )
    assert xs.tolist() == [2048, 2548, 2548, 2048]
    assert ys.tolist() == [2048, 2048, 2548, 2548]
    fid2, gt2, _, rg2, _ = d["features"][1]
    xs2, ys2, _ = gc.decode_geometry(
        int(gt2), pbf._varints_small(rg2).astype(np.int64)
    )
    assert xs2.tolist() == [2053, 2298] and ys2.tolist() == [2058, 2348]


def test_spark_operator_matches_kernel(spark):
    rng = np.random.RandomState(7)
    rows = []
    for i in range(40):
        x, y = int(rng.randint(0, 16)), int(rng.randint(0, 16))
        pts = [
            (int(rng.randint(0, 4097)), int(rng.randint(0, 4097)))
            for _ in range(1 + int(rng.randint(0, 4)))
        ]
        rows.append(
            (4, x, y, "pts", _point_layer(pts, fid0=i * 100), len(pts), len(pts))
        )
    pdf = pd.DataFrame(
        rows,
        columns=["z", "x", "y", "layer", "blob", "n_features", "n_points"],
    )
    df = spark.createDataFrame(pdf)
    got = {
        (r["z"], r["x"], r["y"]): (bytes(r["blob"]), r["n_features"])
        for r in C.downzoom_layers(df).collect()
    }
    # kernel replay, grouped by parent, (cy, cx) order
    expect = {}
    for (px_, py_), grp in pdf.assign(
        px_=pdf.x // 2, py_=pdf.y // 2
    ).groupby(["px_", "py_"]):
        kids = [
            (int(r.x) & 1, int(r.y) & 1, r.blob)
            for r in grp.itertuples()
        ]
        blob, nf, _ = C.downzoom_parent_layer(kids)
        expect[(3, int(px_), int(py_))] = (blob, nf)
    assert got == expect


def test_downzoom_band_rejects_mixed_z(spark):
    pdf = pd.DataFrame(
        [
            (4, 0, 0, "l", b"x", 1, 1),
            (5, 0, 0, "l", b"x", 1, 1),
        ],
        columns=["z", "x", "y", "layer", "blob", "n_features", "n_points"],
    )
    with pytest.raises(ValueError, match="one zoom"):
        C.downzoom_band(spark.createDataFrame(pdf), 2)


def test_rollup_band_matches_direct_assignment(spark):
    """--rollup equivalence contract, POINT features (buffer 0):
    deriving z3..z4 from the z5 encode paints exactly the direct
    pyramid's tile addresses with the same distinct feature set per
    tile. Polygons are excluded BY CONTRACT: their z5-quantized
    geometry can round outward to a child boundary and legitimately
    spill one derived fragment into the adjacent parent (the
    documented 1-unit derived-tile tradeoff, measured as extra-only
    never lost); the kernel tests and q_engine_downzoom pin their
    exact per-level math."""
    from pyspark.sql import functions as F

    from mapnik_vector_tile_spark.operators import composite as C
    from mapnik_vector_tile_spark.operators import tiling as T
    from mapnik_vector_tile_spark.sources.synth import images_df

    feats = T.images_to_features(images_df(spark, 800)).filter(
        F.col("geom_type") == 1
    )
    direct = T.assign_tiles(feats, 3, 4, buffer_units=0)
    want = {
        (r["z"], r["x"], r["y"]): r["n"]
        for r in direct.groupBy("z", "x", "y")
        .agg(F.countDistinct("feature_id").alias("n"))
        .collect()
    }
    base = T.encode_layers(
        T.assign_tiles(feats, 5, 5, buffer_units=0),
        buffer_units=0,
        n_salts=4,
    )
    band = C.downzoom_band(base, 3, dedupe_fids=True)
    dec = T.decode_tiles_to_features(T.fold_tiles(band))
    got = {
        (r["z"], r["x"], r["y"]): r["n"]
        for r in dec.groupBy("z", "x", "y")
        .agg(F.countDistinct("feature_id").alias("n"))
        .collect()
    }
    assert got == want


def test_quadtree_stats_decomposition(spark):
    import numpy as np

    from mapnik_vector_tile_spark.operators.raster import quadtree_stats

    T = 16
    # flat tile: one depth-0 leaf, nothing below
    flat = np.full((T, T), 50, dtype=np.uint8)
    # half/half tile: top half 0, bottom half 255 -> depth-0 and the
    # two vertical-split children are NOT homogeneous... depth-1: the
    # two top blocks are flat (leaves), two bottom blocks flat
    half = np.zeros((T, T), dtype=np.uint8)
    half[8:, :] = 255
    rows = [
        (5, 0, 0, flat.tobytes()),
        (5, 1, 0, half.tobytes()),
    ]
    df = spark.createDataFrame(rows, "z long, x long, y long, raster binary")
    out = {}
    for r in quadtree_stats(df, T).collect():
        out.setdefault((r["x"], r["y"]), {})[r["depth"]] = r
    f = out[(0, 0)]
    assert f[0]["n_leaves"] == 1 and f[0]["wsum"] == 1
    assert all(f[d]["n_leaves"] == 0 for d in range(1, 5))
    h = out[(1, 0)]
    assert h[0]["n_leaves"] == 0
    assert h[1]["n_leaves"] == 4  # all four 8x8 quadrants are flat
    # area conservation: sum leaves * block_area == 256
    total = sum(
        h[d]["n_leaves"] * (T // (1 << d)) ** 2 for d in range(5)
    )
    assert total == T * T
