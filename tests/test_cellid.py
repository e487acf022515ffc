"""S2-style cell encoding (functions.cellid): face coverage, ST
monotonicity, parent containment, locality, and numpy↔SQL twin parity
via DuckDB."""

import duckdb
import numpy as np

from mapnik_vector_tile_spark.functions import cellid as C

LEVEL = 10


def _grid_points(n=40):
    lon = np.linspace(-np.pi + 1e-6, np.pi - 1e-6, n)
    lat = np.linspace(-1.45, 1.45, n)
    LO, LA = np.meshgrid(lon, lat)
    mx = LO.ravel() * C.R_EARTH
    my = np.log(np.tan(np.pi / 4 + LA.ravel() / 2)) * C.R_EARTH
    return mx, my


def test_all_faces_reached():
    mx, my = _grid_points()
    cells = C.s2_cell_np(mx, my, LEVEL)
    faces = cells >> (2 * LEVEL)
    assert set(faces.tolist()) == {0, 1, 2, 3, 4, 5}


def test_cell_range_and_parent():
    mx, my = _grid_points()
    cells = C.s2_cell_np(mx, my, LEVEL)
    assert (cells >= 0).all() and (cells < 6 * 4**LEVEL).all()
    p5 = C.s2_parent_np(cells, LEVEL, 5)
    # parent at the same level is identity; parent preserves face
    assert (C.s2_parent_np(cells, LEVEL, LEVEL) == cells).all()
    assert ((p5 >> (2 * 5)) == (cells >> (2 * LEVEL))).all()
    # deeper quantization refines the same parent
    c5 = C.s2_cell_np(mx, my, 5)
    assert (p5 == c5).all()


def test_locality_nearby_points_share_parents():
    # points 0.01 deg apart should overwhelmingly share a level-5 parent
    rng = np.random.default_rng(7)
    lon = rng.uniform(-170, 170, 500)
    lat = rng.uniform(-80, 80, 500)
    mxa = np.radians(lon) * C.R_EARTH
    mya = np.log(np.tan(np.pi / 4 + np.radians(lat) / 2)) * C.R_EARTH
    mxb = np.radians(lon + 0.01) * C.R_EARTH
    ca = C.s2_cell_np(mxa, mya, 5)
    cb = C.s2_cell_np(mxb, mya, 5)
    assert (ca == cb).mean() > 0.95


def test_sql_twin_bit_exact():
    mx, my = _grid_points(25)
    want = C.s2_cell_np(mx, my, LEVEL)
    face, i, j = C.s2_cell_sql("mx", "my", LEVEL)
    morton = C.morton_sql("ii", "jj", LEVEL)
    con = duckdb.connect()
    con.register(
        "pts",
        __import__("pandas").DataFrame({"mx": mx, "my": my}),
    )
    got = con.execute(
        f"WITH s AS (SELECT mx, my, {face} AS face, {i} AS ii, {j} AS jj FROM pts) "
        f"SELECT CAST(face AS BIGINT) * {1 << (2 * LEVEL)} + ({morton}) FROM s"
    ).fetchnumpy()
    got = next(iter(got.values())).astype(np.int64)
    assert (got == want).all()
