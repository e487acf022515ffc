"""Spec-golden vectors for Appendix A math (FIXTURES.md §3 cases
zigzag_table / xyz_bbox_corners / quantization rounding)."""

import numpy as np
import pytest

from mapnik_vector_tile_spark.functions import tilemath as tm


def test_world_constant():
    assert tm.W == pytest.approx(np.pi * tm.R, abs=1e-6)
    assert tm.W == 20037508.342789244


def test_merc_roundtrip_and_goldens():
    lon = np.array([0.0, -180.0, 180.0, 2.3522, -74.0060])
    lat = np.array([0.0, 0.0, 0.0, 48.8566, 40.7128])
    mx, my = tm.lonlat_to_merc_np(lon, lat)
    assert mx[0] == 0.0 and my[0] == 0.0
    assert mx[1] == pytest.approx(-tm.W)
    assert mx[2] == pytest.approx(tm.W)
    # golden via independent formulas: x = lon deg * (pi*R/180);
    # y = R * atanh(sin(lat)) (equivalent mercator form)
    assert mx[3] == pytest.approx(2.3522 * 111319.49079327358, abs=1e-6)
    assert my[3] == pytest.approx(
        tm.R * np.arctanh(np.sin(np.radians(48.8566))), abs=1e-6
    )
    lon2, lat2 = tm.merc_to_lonlat_np(mx, my)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)


def test_merc_clamps_polar_lat():
    _, my = tm.lonlat_to_merc_np(np.array([0.0]), np.array([90.0]))
    assert my[0] == pytest.approx(tm.W, rel=1e-9)


def test_xyz_bbox_corners():
    # z0: whole world
    minx, miny, maxx, maxy = tm.tile_bounds_np([0], [0], [0])
    assert (minx[0], miny[0], maxx[0], maxy[0]) == (-tm.W, -tm.W, tm.W, tm.W)
    # z1: (1,0) is NE quadrant
    minx, miny, maxx, maxy = tm.tile_bounds_np([1], [1], [0])
    assert (minx[0], miny[0], maxx[0], maxy[0]) == (0.0, 0.0, tm.W, tm.W)
    # z14 odd tile — span exact
    minx, miny, maxx, maxy = tm.tile_bounds_np([14], [8191], [5461])
    span = 2 * tm.W / (1 << 14)
    assert maxx[0] - minx[0] == pytest.approx(span)
    assert minx[0] == pytest.approx(-tm.W + 8191 * span)


def test_point_tile_assignment():
    # mercator origin lies on the seam of the 4 central tiles at any z;
    # floor convention puts it in the (2^(z-1), 2^(z-1)) tile... for
    # x: floor((0+W)/span) = 2^(z-1); y: floor((W-0)/span) = 2^(z-1)
    for z in (1, 5, 14):
        tx, ty = tm.point_tile_np(np.array([0.0]), np.array([0.0]), z)
        assert tx[0] == 1 << (z - 1)
        assert ty[0] == 1 << (z - 1)
    # clamping at the east/south edge
    tx, ty = tm.point_tile_np(np.array([tm.W]), np.array([-tm.W]), 3)
    assert tx[0] == 7 and ty[0] == 7


def test_covering_tiles_buffer():
    # envelope exactly one tile interior: covers that tile only with
    # zero buffer; with buffer it bleeds into neighbors
    z = 5
    span = tm.tile_span(z)
    minx = np.array([-tm.W + 3 * span + 0.3 * span])
    maxx = np.array([-tm.W + 3 * span + 0.7 * span])
    maxy = np.array([tm.W - 4 * span - 0.3 * span])
    miny = np.array([tm.W - 4 * span - 0.7 * span])
    lo_x, hi_x, lo_y, hi_y = tm.covering_tiles_np(minx, miny, maxx, maxy, z, 0)
    assert (lo_x[0], hi_x[0], lo_y[0], hi_y[0]) == (3, 3, 4, 4)
    # buffer of a full tile (extent units == extent) -> +-1 tile
    lo_x, hi_x, lo_y, hi_y = tm.covering_tiles_np(
        minx, miny, maxx, maxy, z, buffer_units=tm.DEFAULT_EXTENT
    )
    assert (lo_x[0], hi_x[0], lo_y[0], hi_y[0]) == (2, 4, 3, 5)


def test_quantize_rounding_half_away():
    v = np.array([0.5, 1.5, 2.5, -0.5, -1.5, 2.4, -2.4])
    out = tm.round_half_away_np(v)
    np.testing.assert_array_equal(out, [1, 2, 3, -1, -2, 2, -2])


def test_quantize_tile_corners():
    z = 14
    tx, ty = 8191, 5461
    minx, miny, maxx, maxy = tm.tile_bounds_np([z], [tx], [ty])
    px, py = tm.quantize_np(
        np.array([minx[0], maxx[0]]), np.array([maxy[0], miny[0]]), z, tx, ty
    )
    np.testing.assert_array_equal(px, [0, 4096])
    np.testing.assert_array_equal(py, [0, 4096])
    # roundtrip world->tile->world stays within half a tile-unit
    mx = np.array([minx[0] + 1234.5678])
    my = np.array([miny[0] + 987.6543])
    qx, qy = tm.quantize_np(mx, my, z, tx, ty)
    rx, ry = tm.unquantize_np(qx, qy, z, tx, ty)
    res = tm.tile_span(z) / tm.DEFAULT_EXTENT
    assert abs(rx[0] - mx[0]) <= res / 2 + 1e-9
    assert abs(ry[0] - my[0]) <= res / 2 + 1e-9


def test_zigzag_table():
    n = np.array([0, -1, 1, -2, 2, 2147483647, -2147483648, 2**62, -(2**62)])
    enc = tm.zigzag_encode_np(n)
    np.testing.assert_array_equal(
        enc[:7], [0, 1, 2, 3, 4, 4294967294, 4294967295]
    )
    np.testing.assert_array_equal(tm.zigzag_decode_np(enc), n)


def test_command_integers():
    # MVT 2.1 spec examples: MoveTo count 1 -> 9, LineTo count 3 -> 26,
    # ClosePath -> 15
    assert tm.command_integer_np(tm.MOVE_TO, 1) == 9
    assert tm.command_integer_np(tm.LINE_TO, 3) == 26
    assert tm.command_integer_np(tm.CLOSE_PATH, 1) == 15
    cid, cnt = tm.command_split_np(np.array([9, 26, 15]))
    np.testing.assert_array_equal(cid, [1, 2, 7])
    np.testing.assert_array_equal(cnt, [1, 3, 1])


def test_cell_id_roundtrip_and_parent():
    z = np.array([0, 1, 5, 14, 14], dtype=np.int64)
    x = np.array([0, 1, 17, 8191, 0], dtype=np.int64)
    y = np.array([0, 0, 30, 5461, 16383], dtype=np.int64)
    c = tm.cell_id_np(z, x, y)
    assert len(np.unique(c)) == 5
    z2, x2, y2 = tm.cell_decode_np(c)
    np.testing.assert_array_equal(z2, z)
    np.testing.assert_array_equal(x2, x)
    np.testing.assert_array_equal(y2, y)
    p = tm.cell_parent_np(c[3:4])
    pz, px, py = tm.cell_decode_np(p)
    assert (pz[0], px[0], py[0]) == (13, 8191 // 2, 5461 // 2)


def test_cell_ring():
    ring1 = tm.cell_ring_np(5, 10, 10, 1)
    assert len(ring1) == 8
    ring0 = tm.cell_ring_np(5, 0, 0, 1)  # corner clamp
    assert len(ring0) == 3
    z, x, y = tm.cell_decode_np(ring1)
    assert np.all(np.maximum(np.abs(x - 10), np.abs(y - 10)) == 1)


def test_cell_id_sql_expr_matches_numpy(spark):
    import pandas as pd

    z = 7
    n = 200
    rng = np.random.default_rng(1)
    xs = rng.integers(0, 1 << z, n)
    ys = rng.integers(0, 1 << z, n)
    expected = tm.cell_id_np(np.full(n, z), xs, ys)
    pdf = pd.DataFrame({"x": xs, "y": ys})
    df = spark.createDataFrame(pdf)
    expr = tm.cell_id_sql_expr("x", "y", z)
    got = df.selectExpr(f"{expr} as cell").toPandas()["cell"].to_numpy()
    np.testing.assert_array_equal(np.sort(got), np.sort(expected))


def test_column_twins_match_numpy(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    lon = rng.uniform(-180, 180, 500)
    lat = rng.uniform(-85, 85, 500)
    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    z = 9
    out = (
        df.select(
            tm.merc_x_col(F.col("lon")).alias("mx"),
            tm.merc_y_col(F.col("lat")).alias("my"),
        )
        .select(
            "mx",
            "my",
            tm.tile_x_col(F.col("mx"), z).alias("tx"),
            tm.tile_y_col(F.col("my"), z).alias("ty"),
        )
        .select(
            "tx",
            "ty",
            tm.quantize_x_col(F.col("mx"), F.col("tx"), z).alias("px"),
            tm.quantize_y_col(F.col("my"), F.col("ty"), z).alias("py"),
        )
        .toPandas()
    )
    mx, my = tm.lonlat_to_merc_np(lon, lat)
    tx, ty = tm.point_tile_np(mx, my, z)
    px, py = tm.quantize_np(mx, my, z, tx, ty)
    np.testing.assert_array_equal(out["tx"].to_numpy(), tx)
    np.testing.assert_array_equal(out["ty"].to_numpy(), ty)
    np.testing.assert_array_equal(out["px"].to_numpy(), px)
    np.testing.assert_array_equal(out["py"].to_numpy(), py)


def test_round_half_away_std_round_parity():
    """std::round parity on the doubles floor(v+0.5) gets wrong: the
    largest double below 0.5 must round to 0, and analogues at larger
    magnitudes must not be bumped by the +0.5 addition."""
    import numpy as np

    from mapnik_vector_tile_spark.functions import tilemath as tm

    v = np.array(
        [0.49999999999999994, -0.49999999999999994, 0.5, -0.5,
         1.5, -1.5, 2.4999999999999996, 0.0, 4095.5, 4095.4999999999995]
    )
    want = np.array([0, 0, 1, -1, 2, -2, 2, 0, 4096, 4095])
    got = tm.round_half_away_np(v)
    assert (got == want).all(), (got.tolist(), want.tolist())


def test_round_half_away_scalar_path_extreme_fallback():
    """Small arrays with |v| >= 2^63 or non-finite values take the
    vectorized fallback: silent int64 wrap, never OverflowError
    (review regression — a foreign blob rescaled by a huge factor must
    not abort the composite task)."""
    v = np.array([2.0**70, -(2.0**70), 1.5])
    got = tm.round_half_away_np(v)
    t = np.trunc(v)
    want = (
        t + np.where(np.abs(v - t) >= 0.5, np.sign(v), 0.0)
    ).astype(np.int64)
    assert np.array_equal(got, want)
    assert tm.round_half_away_np(np.array([2.5, -2.5])).tolist() == [3, -3]


def test_scale_denominator_parity():
    """P3: mapnik's z0/256px denominator, halving per zoom, gate
    min-inclusive max-exclusive, zoom_for_scale inverse."""
    from mapnik_vector_tile_spark.functions.tilemath import (
        layer_visible,
        scale_denominator,
        zoom_for_scale,
    )

    assert repr(scale_denominator(0)) == "559082264.0287178"
    for z in range(20):
        assert scale_denominator(z) / scale_denominator(z + 1) == 2.0
    sd10 = scale_denominator(10)
    assert layer_visible(10, sd10, sd10 * 2)       # min inclusive
    assert not layer_visible(10, sd10 / 2, sd10)   # max exclusive
    assert zoom_for_scale(scale_denominator(7)) == 7
    assert zoom_for_scale(scale_denominator(7) - 1.0) == 8
