"""CSV datasource (sources/csvsrc.py) — point mode coercion + drop
policy, WKT-mode delegation, mercator transform, file scan."""

import numpy as np

from mapnik_vector_tile_spark.functions import tilemath as tm
from mapnik_vector_tile_spark.sources.csvsrc import (
    csv_to_features,
    read_csv_features,
)


def test_point_mode_drops_and_coerces(spark):
    df = spark.createDataFrame(
        [
            ("1", "10.5", "45.25", "a"),
            ("2", "oops", "0", "bad lon"),
            ("3", "0", "95", "lat out of range"),
            (None, "1", "1", "null id"),
            ("5", "-180", "-90", "edge ok"),
        ],
        "id string, lon string, lat string, caption string",
    )
    out = {r.feature_id: r for r in csv_to_features(df, to_merc=False).collect()}
    assert set(out) == {1, 5}
    assert out[1].xs == [10.5] and out[1].ys == [45.25]
    assert out[1].caption == "a" and out[1].geom_type == 1
    assert out[5].xs == [-180.0]


def test_point_mode_merc_matches_shared_kernel(spark):
    df = spark.createDataFrame(
        [("7", "10.0", "45.0", "c")],
        "id string, lon string, lat string, caption string",
    )
    r = csv_to_features(df, to_merc=True).collect()[0]
    mx, my = tm.lonlat_to_merc_np(np.array([10.0]), np.array([45.0]))
    assert r.xs[0] == mx[0] and r.ys[0] == my[0]


def test_wkt_mode_delegates(spark):
    df = spark.createDataFrame(
        [("1", "LINESTRING (0 0, 2 2, 4 0)", "ln")],
        "id string, wkt string, caption string",
    )
    r = csv_to_features(
        df, wkt_col="wkt", id_col="id", to_merc=False
    ).collect()[0]
    assert r.geom_type == 2 and len(r.xs) == 3 and r.caption == "ln"


def test_file_scan(spark, tmp_path):
    p = tmp_path / "pts.csv"
    p.write_text("id,lon,lat,caption\n1,5.5,6.5,hi\n2,nope,0,drop\n")
    out = read_csv_features(
        spark, str(p), ["id", "lon", "lat", "caption"], to_merc=False
    ).collect()
    assert len(out) == 1 and out[0].feature_id == 1 and out[0].xs == [5.5]


def test_large_ids_exact_and_null_caption_empty(spark):
    """Ids beyond 2^53 must survive exactly (no float64 detour) and a
    null caption becomes '' — not the string 'None'."""
    big = 9007199254740993  # 2^53 + 1
    df = spark.createDataFrame(
        [(str(big), "1.0", "2.0", None), ("1.5", "0", "0", "frac id drops")],
        "id string, lon string, lat string, caption string",
    )
    out = csv_to_features(df, to_merc=False).collect()
    assert len(out) == 1
    assert out[0].feature_id == big
    assert out[0].caption == ""
