"""WKT/WKB source + sink (sources/wkt.py): parse/write round-trips
across all 7 OGC types and both WKB byte orders, engine-schema
integration through assign_tiles, mixed-corpus drop policy, fuzz
contract."""

import numpy as np
import pytest

from mapnik_vector_tile_spark.functions import geomcodec as gc
from mapnik_vector_tile_spark.sources import wkt as W

CASES = [
    ("POINT (30 10)", gc.GEOM_POINT, 1, [0, 1]),
    ("LINESTRING (30 10, 10 30, 40 40)", gc.GEOM_LINESTRING, 3, [0, 3]),
    ("POLYGON ((30 10, 40 40, 20 40, 10 20, 30 10))", gc.GEOM_POLYGON, 5, [0, 5]),
    (
        "POLYGON ((35 10, 45 45, 15 40, 10 20, 35 10), (20 30, 35 35, 30 20, 20 30))",
        gc.GEOM_POLYGON, 9, [0, 5, 9],
    ),
    ("MULTIPOINT ((10 40), (40 30), (20 20), (30 10))", gc.GEOM_POINT, 4, [0, 4]),
    ("MULTIPOINT (10 40, 40 30, 20 20, 30 10)", gc.GEOM_POINT, 4, [0, 4]),
    (
        "MULTILINESTRING ((10 10, 20 20, 10 40), (40 40, 30 30, 40 20, 30 10))",
        gc.GEOM_LINESTRING, 7, [0, 3, 7],
    ),
    (
        "MULTIPOLYGON (((30 20, 45 40, 10 40, 30 20)), "
        "((15 5, 40 10, 10 20, 5 10, 15 5)))",
        gc.GEOM_POLYGON, 9, [0, 4, 9],
    ),
]


def test_parse_wkt_types_and_offsets():
    for txt, want_g, want_n, want_offs in CASES:
        g, xs, ys, offs = W.parse_wkt(txt)
        assert g == want_g, txt
        assert len(xs) == want_n, txt
        assert offs == want_offs, txt


def test_wkt_writer_roundtrip_bit_exact():
    for txt, *_ in CASES:
        leaf = W.parse_wkt(txt)
        assert W.parse_wkt(W.geometry_to_wkt(*leaf)) == leaf, txt
    # non-integral coordinates keep shortest-repr exactness
    leaf = W.parse_wkt("POINT (-170.25 80.5)")
    assert W.parse_wkt(W.geometry_to_wkt(*leaf)) == leaf


def test_wkb_roundtrip_both_orders():
    for txt, *_ in CASES:
        leaf = W.parse_wkt(txt)
        for little in (True, False):
            buf = W.geometry_to_wkb(*leaf, little=little)
            assert W.parse_wkb(buf) == [leaf], (txt, little)


def test_geometrycollection_expands_and_nests():
    leaves = W.parse_wkt_any(
        "GEOMETRYCOLLECTION (POINT (40 10), "
        "GEOMETRYCOLLECTION (LINESTRING (10 10, 20 20)), "
        "POLYGON ((0 0, 1 0, 1 1, 0 0)))"
    )
    assert [g for g, *_ in leaves] == [
        gc.GEOM_POINT, gc.GEOM_LINESTRING, gc.GEOM_POLYGON,
    ]


def test_empty_geometries_drop():
    assert W.parse_wkt("POINT EMPTY") is None
    assert W.parse_wkt("LINESTRING EMPTY") is None
    assert W.parse_wkt_any("GEOMETRYCOLLECTION EMPTY") == []
    # WKB POINT EMPTY (NaN NaN) convention
    buf = b"\x01\x01\x00\x00\x00" + np.array([np.nan, np.nan]).tobytes()
    assert W.parse_wkb(buf) == []


def test_wkb_collection():
    leaf1 = W.parse_wkt("POINT (1 2)")
    leaf2 = W.parse_wkt("LINESTRING (0 0, 3 4)")
    import struct

    body = W.geometry_to_wkb(*leaf1) + W.geometry_to_wkb(*leaf2)
    buf = b"\x01" + struct.pack("<I", 7) + struct.pack("<I", 2) + body
    assert W.parse_wkb(buf) == [leaf1, leaf2]


def test_malformed_wkt_raises():
    for bad in (
        "POINT Z (1 2 3)", "POINT M (1 2 3)", "POINT ZM (1 2 3 4)",
        "FOO (1 2)", "POINT (1 2", "LINESTRING (1 2, 3)",
        "", "POINT (1 2) trailing", "POLYGON (1 2, 3 4)",
    ):
        with pytest.raises(ValueError):
            W.parse_wkt_any(bad)


def test_malformed_wkb_raises():
    good = W.geometry_to_wkb(*W.parse_wkt("LINESTRING (0 0, 1 1, 2 2)"))
    for cut in (0, 1, 4, 8, 12, len(good) - 1):
        with pytest.raises(ValueError):
            W.parse_wkb(good[:cut])
    with pytest.raises(ValueError):
        W.parse_wkb(b"\x02" + good[1:])  # bad byte order
    with pytest.raises(ValueError):
        W.parse_wkb(good + b"\x00")  # trailing garbage
    # Z-flagged EWKB and ISO-Z codes rejected
    import struct

    for code in (0x80000001, 0x20000001, 1001):
        with pytest.raises(ValueError):
            W.parse_wkb(b"\x01" + struct.pack("<I", code) + b"\x00" * 24)
    # hostile element count must not allocate
    with pytest.raises(ValueError):
        W.parse_wkb(b"\x01" + struct.pack("<I", 2) + struct.pack("<I", 0xFFFFFFF0))


def test_dataframe_stage_and_tiling_integration(spark):
    df = spark.createDataFrame(
        [
            (1, "POINT (0.5 0.5)", "a"),
            (2, "LINESTRING (-10 -10, 10 10)", "b"),
            (3, "POINT Z (1 2 3)", "dropped"),
            (4, "GEOMETRYCOLLECTION (POINT (1 1), POINT (2 2))", "c"),
            (5, "POINT EMPTY", "dropped"),
        ],
        "feature_id long, wkt string, caption string",
    )
    feats = W.wkt_to_features(df)  # to_merc=True default
    rows = feats.orderBy("feature_id", "xs").collect()
    # id 3 and 5 dropped; id 4 expands to two rows
    assert [r.feature_id for r in rows] == [1, 2, 4, 4]
    assert rows[0].caption == "a"
    # mercator transform applied (0.5 deg lon ≈ 55660 m)
    assert abs(rows[0].xs[0] - 55659.74) < 1.0

    from mapnik_vector_tile_spark.operators import tiling as T

    assigned = T.assign_tiles(feats, 2, 4)
    assert assigned.count() > 0


def test_wkb_dataframe_stage(spark):
    leaf = W.parse_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    df = spark.createDataFrame(
        [(7, bytearray(W.geometry_to_wkb(*leaf)), "z"), (8, bytearray(b"junk"), "d")],
        "feature_id long, wkb binary, caption string",
    )
    rows = W.wkb_to_features(df, to_merc=False).collect()
    assert len(rows) == 1 and rows[0].feature_id == 7
    assert list(rows[0].part_offsets) == [0, 5]


def test_geom_measures_values(spark):
    """Shoelace/length/vertex-mean on known shapes, incl. a holed
    polygon (hole ring wound CW subtracts from a2) and a multi-part
    line."""
    from mapnik_vector_tile_spark.functions import measures as M

    rows = [
        # 4x2 CCW rect: a2=16, len=12
        (1, 3, [1.0, 5.0, 5.0, 1.0, 1.0], [1.0, 1.0, 3.0, 3.0, 1.0],
         [0, 5], ""),
        # same rect + 1x1 CW hole: a2 = 16 - 2 = 14, len = 12 + 4
        (2, 3, [1.0, 5.0, 5.0, 1.0, 1.0, 2.0, 2.0, 3.0, 3.0, 2.0],
         [1.0, 1.0, 3.0, 3.0, 1.0, 1.5, 2.5, 2.5, 1.5, 1.5],
         [0, 5, 10], ""),
        # two-part open line: lengths 7 and 2.5
        (3, 2, [0.0, 3.0, 3.0, 10.0, 10.0], [0.0, 0.0, 4.0, 0.0, 2.5],
         [0, 3, 5], ""),
    ]
    df = spark.createDataFrame(
        rows,
        "feature_id long, geom_type int, xs array<double>, "
        "ys array<double>, part_offsets array<int>, caption string",
    )
    got = {
        r.feature_id: (r.a2, r.ln)
        for r in df.select(
            "feature_id",
            M.signed_area2().alias("a2"),
            M.boundary_length().alias("ln"),
        ).collect()
    }
    assert got[1] == (16.0, 12.0)
    assert got[2] == (14.0, 16.0)
    assert got[3][1] == 9.5


def test_hostile_rows_never_kill_the_task(spark):
    """Regression (review finding): truncated/ragged WKT and NULL ids
    must DROP the feature, not crash the mapInPandas task."""
    for bad in ("POINT", "POINT ((1 2))", "MULTIPOLYGON ((1 2))"):
        with pytest.raises(ValueError):
            W.parse_wkt_any(bad)
    df = spark.createDataFrame(
        [(1, "POINT (1 2)", "ok"),
         (2, "POINT", "ragged"),
         (3, "POINT ((1 2))", "nested-pt"),
         (None, "POINT (3 4)", "null-id")],
        "feature_id long, wkt string, caption string",
    )
    rows = W.wkt_to_features(df, to_merc=False).collect()
    assert [r.feature_id for r in rows] == [1]
