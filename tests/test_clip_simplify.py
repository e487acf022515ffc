"""Golden + property tests for clip (F10-F12) and Douglas-Peucker (F9)
— FIXTURES.md §3 cases line_crossing / poly_with_hole / dp_spike etc."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mapnik_vector_tile_spark.functions import clip as C
from mapnik_vector_tile_spark.functions import simplify as S
from mapnik_vector_tile_spark.functions.geomcodec import signed_area2

BOX = (0.0, 0.0, 100.0, 100.0)


def a(*v):
    return np.array(v, dtype=np.float64)


# --- points ------------------------------------------------------------------


def test_point_clip():
    xs, ys = C.clip_points(a(50, -1, 100, 101), a(50, 50, 0, 100), *BOX)
    np.testing.assert_array_equal(xs, [50, 100])
    np.testing.assert_array_equal(ys, [50, 0])


# --- lines -------------------------------------------------------------------


def test_line_inside_untouched():
    parts = C.clip_line(a(10, 20, 30), a(10, 20, 10), *BOX)
    assert len(parts) == 1
    np.testing.assert_array_equal(parts[0][0], [10, 20, 30])


def test_line_crossing_clipped():
    parts = C.clip_line(a(-50, 150), a(50, 50), *BOX)
    assert len(parts) == 1
    np.testing.assert_allclose(parts[0][0], [0, 100])
    np.testing.assert_allclose(parts[0][1], [50, 50])


def test_line_multi_exit_splits():
    # zigzag crossing the box twice -> two parts
    parts = C.clip_line(a(-10, 50, 150, 50, -10), a(10, 10, 30, 60, 60), *BOX)
    assert len(parts) == 2
    for px, py in parts:
        assert np.all((px >= 0) & (px <= 100) & (py >= 0) & (py <= 100))


def test_line_outside_dropped():
    assert C.clip_line(a(-50, -10), a(50, 50), *BOX) == []


def test_line_on_edge_kept():
    parts = C.clip_line(a(0, 0), a(10, 90), *BOX)
    assert len(parts) == 1


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(-200, 300, allow_nan=False, width=32),
            st.floats(-200, 300, allow_nan=False, width=32),
        ),
        min_size=2,
        max_size=15,
    )
)
def test_line_clip_property(pts):
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    eps = 1e-9
    for px, py in C.clip_line(xs, ys, *BOX):
        # output strictly within the (closed) box modulo fp rounding
        assert np.all((px >= -eps) & (px <= 100 + eps))
        assert np.all((py >= -eps) & (py <= 100 + eps))
        assert len(px) >= 2


# --- polygons ----------------------------------------------------------------


def test_poly_inside_untouched():
    x, y = C.clip_ring(a(10, 90, 90, 10), a(10, 10, 90, 90), *BOX)
    assert len(x) == 4


def test_poly_containing_box_becomes_box():
    x, y = C.clip_ring(a(-100, 200, 200, -100), a(-100, -100, 200, 200), *BOX)
    assert len(x) == 4
    assert set(zip(x, y)) == {(0, 0), (100, 0), (100, 100), (0, 100)}


def test_poly_outside_dropped():
    x, y = C.clip_ring(a(-50, -10, -10, -50), a(10, 10, 50, 50), *BOX)
    assert len(x) == 0


def test_poly_spanning_corner():
    x, y = C.clip_ring(a(-50, 50, 50, -50), a(-50, -50, 50, 50), *BOX)
    # quarter square remains
    assert abs(C.ring_signed_area2_f(x, y)) == 2 * 50 * 50


def test_poly_with_hole_clip():
    # outer 0..80, hole 20..60, box cuts at x>=40
    xs = a(0, 80, 80, 0, 20, 20, 60, 60)
    ys = a(0, 0, 80, 80, 20, 60, 60, 20)
    offs = np.array([0, 4, 8])
    # verify winding: outer CCW-positive, hole negative
    assert signed_area2(xs[:4].astype(int), ys[:4].astype(int)) > 0
    assert signed_area2(xs[4:].astype(int), ys[4:].astype(int)) < 0
    cx, cy, coffs = C.clip_polygon(xs, ys, offs, 40, -10, 200, 90)
    assert len(coffs) - 1 == 2  # both rings survive
    outer = C.ring_signed_area2_f(cx[coffs[0] : coffs[1]], cy[coffs[0] : coffs[1]])
    hole = C.ring_signed_area2_f(cx[coffs[1] : coffs[2]], cy[coffs[1] : coffs[2]])
    assert outer > 0 > hole
    # areas: outer clipped = 40x80, hole clipped = 20x40
    assert outer == 2 * 40 * 80
    assert hole == -2 * 20 * 40


def test_area_threshold_drops_tiny_ring():
    xs = a(10, 12, 12, 10)
    ys = a(10, 10, 12, 12)
    cx, cy, coffs = C.clip_polygon(xs, ys, np.array([0, 4]), *BOX, area_threshold=5.0)
    assert len(cx) == 0


@settings(max_examples=150, deadline=None)
@given(
    st.floats(-150, 150, allow_nan=False),
    st.floats(-150, 150, allow_nan=False),
    st.floats(1, 200, allow_nan=False),
)
def test_poly_clip_area_bound_property(x0, y0, s):
    # clipped rect area == analytic intersection area
    xs = a(x0, x0 + s, x0 + s, x0)
    ys = a(y0, y0, y0 + s, y0 + s)
    cx, cy = C.clip_ring(xs, ys, *BOX)
    ix = max(0.0, min(x0 + s, 100.0) - max(x0, 0.0))
    iy = max(0.0, min(y0 + s, 100.0) - max(y0, 0.0))
    got = abs(C.ring_signed_area2_f(cx, cy)) / 2 if len(cx) else 0.0
    assert got == np.float64(ix) * np.float64(iy) or abs(got - ix * iy) < 1e-6


# --- Douglas-Peucker ---------------------------------------------------------


def test_dp_collinear_collapses():
    xs, ys = S.simplify_part(a(0, 10, 20, 30), a(0, 0, 0, 0), 1.0)
    np.testing.assert_array_equal(xs, [0, 30])


def test_dp_spike_survives():
    xs, ys = S.simplify_part(a(0, 10, 20), a(0, 50, 0), 1.0)
    assert len(xs) == 3


def test_dp_tolerance_edge():
    # deviation exactly == tolerance is NOT kept (strict >), matching
    # boost::geometry's comparable-distance > comparable-tolerance test
    xs, ys = S.simplify_part(a(0, 10, 20), a(0, 2, 0), 2.0)
    assert len(xs) == 2
    xs, ys = S.simplify_part(a(0, 10, 20), a(0, 2.0001, 0), 2.0)
    assert len(xs) == 3


def test_dp_endpoints_always_kept():
    xs, ys = S.simplify_part(a(5, 6, 7), a(5, 5.1, 5), 100.0)
    np.testing.assert_array_equal(xs, [5, 7])


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 4096), st.integers(0, 4096)),
        min_size=2,
        max_size=30,
    ),
    st.floats(0.1, 50.0),
)
def test_dp_property_subset_and_endpoints(pts, tol):
    xs = np.array([p[0] for p in pts], dtype=np.float64)
    ys = np.array([p[1] for p in pts], dtype=np.float64)
    sx, sy = S.simplify_part(xs, ys, tol)
    assert sx[0] == xs[0] and sx[-1] == xs[-1]
    assert sy[0] == ys[0] and sy[-1] == ys[-1]
    # output is a subsequence of input vertices
    got = set(zip(sx, sy))
    assert got <= set(zip(xs, ys))


def test_simplify_rings_closed_seam():
    # square with a midpoint on one edge: midpoint removed, ring stays valid
    xs = a(0, 50, 100, 100, 0)
    ys = a(0, 0.5, 0, 100, 100)
    sx, sy, offs = S.simplify_rings(xs, ys, np.array([0, 5]), 2.0, closed=True)
    assert len(offs) == 2
    assert len(sx) == 4


def test_drop_small_rings_orphan_hole_rule():
    """A dropped exterior takes its trailing holes with it (same rule
    as simplify_rings), even when a hole's own area clears the
    threshold; holes under threshold drop individually."""
    from mapnik_vector_tile_spark.functions import geomcodec as gc
    from mapnik_vector_tile_spark.functions.clip import drop_small_rings

    sq = lambda s: (np.array([0, s, s, 0]), np.array([0, 0, s, s]))

    # exterior 2A=8 below 2*thr=20 -> dropped; its hole 2A=-32 clears
    # the threshold but is orphaned -> dropped too
    ex, ey = sq(2)
    hx, hy = sq(4)[0][::-1], sq(4)[1][::-1]
    px = np.concatenate([ex, hx])
    py = np.concatenate([ey, hy])
    ox, oy, offs = drop_small_rings(
        px, py, np.array([0, 4, 8]), 10.0, gc.signed_area2
    )
    assert len(ox) == 0

    # big exterior keeps itself, small hole drops individually
    ex, ey = sq(4)
    hx, hy = sq(1)[0][::-1], sq(1)[1][::-1]
    px = np.concatenate([ex, hx])
    py = np.concatenate([ey, hy])
    ox, oy, offs = drop_small_rings(
        px, py, np.array([0, 4, 8]), 10.0, gc.signed_area2
    )
    assert list(offs) == [0, 4]
    assert gc.signed_area2(ox, oy) == 32


def test_line_interpolate_edges(spark):
    import pandas as pd

    from mapnik_vector_tile_spark.functions import measures as M

    rows = [
        (1, 2, [0.0, 10.0], [0.0, 0.0], [0, 2], ""),        # simple
        (2, 2, [0.0, 4.0, 4.0], [0.0, 0.0, 4.0], [0, 3], ""),  # corner
        (3, 1, [5.0], [7.0], [0, 1], ""),                    # single pt
        (4, 2, [3.0, 3.0], [1.0, 1.0], [0, 2], ""),          # zero len
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=[
                "feature_id", "geom_type", "xs", "ys", "part_offsets",
                "caption",
            ],
        )
    )
    px, py = M.line_interpolate(0.5)
    out = {
        r["feature_id"]: (r["px"], r["py"])
        for r in df.select("feature_id", px.alias("px"), py.alias("py"))
        .collect()
    }
    assert out[1] == (5.0, 0.0)
    assert out[2] == (4.0, 0.0)  # t=0.5 of len 8 lands on the corner
    assert out[3] == (5.0, 7.0)  # degenerate: the vertex itself
    assert out[4] == (3.0, 1.0)  # zero-length chain: last vertex
    px1, py1 = M.line_interpolate(1.0)
    out1 = df.filter("feature_id = 2").select(
        px1.alias("px"), py1.alias("py")
    ).collect()[0]
    assert (out1["px"], out1["py"]) == (4.0, 4.0)


def test_area_centroid_hole_and_null(spark):
    import pandas as pd

    from mapnik_vector_tile_spark.functions import measures as M

    rows = [
        # unit square
        (1, 3, [0.0, 4.0, 4.0, 0.0, 0.0], [0.0, 0.0, 4.0, 4.0, 0.0],
         [0, 5], ""),
        # square with OFF-CENTER CW hole: centroid shifts away from it
        (2, 3,
         [0.0, 4.0, 4.0, 0.0, 0.0, 0.5, 0.5, 1.5, 1.5, 0.5],
         [0.0, 0.0, 4.0, 4.0, 0.0, 0.5, 1.5, 1.5, 0.5, 0.5],
         [0, 5, 10], ""),
        # degenerate zero-area ring -> NULL
        (3, 3, [1.0, 1.0, 1.0], [2.0, 2.0, 2.0], [0, 3], ""),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(
            rows,
            columns=["feature_id", "geom_type", "xs", "ys",
                     "part_offsets", "caption"],
        )
    )
    cx, cy = M.area_centroid()
    out = {
        r["feature_id"]: (r["cx"], r["cy"])
        for r in df.select("feature_id", cx.alias("cx"), cy.alias("cy"))
        .collect()
    }
    assert out[1] == (2.0, 2.0)
    # hole area 1 centered at (1,1): C = (16*2 - 1*1)/(16-1) = 31/15
    assert abs(out[2][0] - 31.0 / 15.0) < 1e-12
    assert abs(out[2][1] - 31.0 / 15.0) < 1e-12
    assert out[3] == (None, None)


def test_radial_distance_mask():
    """F9b kernel pins: keep-first, keep-last (forced), sequential
    last-kept chaining, and the strategy dispatch in simplify_rings."""
    import numpy as np

    from mapnik_vector_tile_spark.functions.simplify import (
        radial_distance,
        simplify_rings,
    )

    # chain: v1 within tol of v0 (drop), v2 beyond (keep), v3 within
    # tol of v2 (drop) but forced as last
    xs = np.array([0, 100, 500, 600])
    ys = np.array([0, 0, 0, 0])
    m = radial_distance(xs, ys, 256.0)
    assert m.tolist() == [True, False, True, True]

    # all within tolerance: first + forced last survive
    m = radial_distance(np.array([0, 10, 20, 30]), np.zeros(4), 256.0)
    assert m.tolist() == [True, False, False, True]

    # measured from LAST KEPT, not from the previous vertex: three
    # 200-steps each under tol individually, cumulative 400 > 256
    m = radial_distance(np.array([0, 200, 400, 600]), np.zeros(4), 256.0)
    assert m.tolist() == [True, False, True, True]

    # tolerance <= 0 keeps everything
    assert radial_distance(xs, ys, 0.0).all()

    # dispatch through simplify_rings (open part)
    sx, sy, offs = simplify_rings(
        xs.astype(float), ys.astype(float), np.array([0, 4]), 256.0,
        closed=False, strategy="radial-distance",
    )
    assert sx.tolist() == [0.0, 500.0, 600.0]
    assert offs.tolist() == [0, 3]


def test_visvalingam_whyatt_known_masks():
    """F9c: effective-area removal order, neighbor recompute, and the
    lowest-index tie-break — hand-computed doubled areas."""
    import numpy as np

    from mapnik_vector_tile_spark.functions.simplify import (
        visvalingam_whyatt,
    )

    xs = np.array([0.0, 1.0, 2.0, 3.0, 4.0])
    ys = np.array([0.0, 0.1, 0.0, 5.0, 0.0])
    # doubled areas: v1=0.2, v2=5.1, v3=10
    # tol=0.5 (thr2=1): drop v1 only; v2 recomputes to 10, stops
    assert visvalingam_whyatt(xs, ys, 0.5).tolist() == [
        True, False, True, True, True,
    ]
    # tol=6 (thr2=12): v1 drops, v2 recomputes to 10 < 12 -> drops,
    # v3 recomputes to 20 >= 12 -> survives
    assert visvalingam_whyatt(xs, ys, 6.0).tolist() == [
        True, False, False, True, True,
    ]
    # tie-break: two interior vertices with IDENTICAL doubled area 1.0
    # -> the lower index (v1) drops first; v2 recomputes to 3, which
    # survives >= thr2=3
    xs2 = np.array([0.0, 1.0, 2.0, 3.0])
    ys2 = np.array([0.0, 1.0, 1.0, 0.0])  # v1: 2A=2, v2: 2A=2
    m = visvalingam_whyatt(xs2, ys2, 1.5)
    assert m.tolist() == [True, False, True, True]
    # endpoints always kept; tolerance<=0 keeps everything
    assert visvalingam_whyatt(xs, ys, 0.0).tolist() == [True] * 5
    assert visvalingam_whyatt(xs[:2], ys[:2], 9.0).tolist() == [True, True]


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4096),
            st.integers(min_value=0, max_value=4096),
        ),
        min_size=3,
        max_size=24,
    ),
    st.integers(min_value=1, max_value=2_000_000),
)
@settings(max_examples=60, deadline=None)
def test_visvalingam_invariants(pts, tol):
    """F9c properties on random integer polylines: (1) termination
    invariant — every SURVIVING interior vertex's effective doubled
    area on the simplified chain is >= 2*tol; (2) idempotence — a
    second pass removes nothing; (3) endpoints always survive."""
    import numpy as np

    from mapnik_vector_tile_spark.functions.simplify import (
        visvalingam_whyatt,
    )

    xs = np.array([p[0] for p in pts], dtype=np.float64)
    ys = np.array([p[1] for p in pts], dtype=np.float64)
    mask = visvalingam_whyatt(xs, ys, float(tol))
    assert mask[0] and mask[-1]
    sx, sy = xs[mask], ys[mask]
    thr2 = 2.0 * tol
    for i in range(1, len(sx) - 1):
        a2 = abs(
            (sx[i] - sx[i - 1]) * (sy[i + 1] - sy[i - 1])
            - (sy[i] - sy[i - 1]) * (sx[i + 1] - sx[i - 1])
        )
        assert a2 >= thr2
    again = visvalingam_whyatt(sx, sy, float(tol))
    assert again.all()


def test_chaikin_numpy_properties():
    import numpy as np

    from mapnik_vector_tile_spark.functions.chaikin import chaikin_np

    xs = np.array([0, 10, 10, 0])
    ys = np.array([0, 0, 10, 10])
    x1, y1 = chaikin_np(xs, ys, 1)
    # one round: n -> 2(n-1) + 2 interior+endpoint points
    assert len(x1) == 2 * (len(xs) - 1) + 2
    # endpoints preserved (at scale 4)
    assert (x1[0], y1[0]) == (0, 0) and (x1[-1], y1[-1]) == (0, 40)
    # first corner cut: between (0,0) and (10,0): Q=(30,0)/4, R=(10+30=... )
    assert (x1[1], y1[1]) == (10, 0) and (x1[2], y1[2]) == (30, 0)
    # smoothing shrinks total Manhattan length (corner cutting) at
    # equal scale: compare round-1 length/4 vs original
    def mlen(x, y):
        return int(np.abs(np.diff(x)).sum() + np.abs(np.diff(y)).sum())

    assert mlen(x1, y1) <= 4 * mlen(xs, ys)
    # straight line is a fixed point (up to scale)
    sx = np.array([0, 5, 10])
    sy = np.array([0, 0, 0])
    x2, y2 = chaikin_np(sx, sy, 2)
    assert (np.diff(y2) == 0).all()
    assert mlen(x2, y2) == 16 * mlen(sx, sy)
