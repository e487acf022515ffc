"""EP3 composite/merge (U1/U2), re-extent slow path, and P5 validity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from mapnik_vector_tile_spark.functions import geomcodec as gc
from mapnik_vector_tile_spark.functions import pbf
from mapnik_vector_tile_spark.operators import composite as C


def _layer_row(spark, z, x, y, name, fid, px, py, nf=1):
    lb = pbf.LayerBuilder(name, extent=4096)
    stream = gc.encode_geometry(
        gc.GEOM_POINT,
        np.array([px], dtype=np.int64),
        np.array([py], dtype=np.int64),
        np.array([0, 1]),
    )
    lb.add_feature(fid, gc.GEOM_POINT, stream, {"caption": f"c{fid}"})
    pdf = pd.DataFrame(
        {
            "z": [z],
            "x": [x],
            "y": [y],
            "layer": [name],
            "blob": [lb.build()],
            "n_features": [nf],
            "n_points": [nf],
        }
    )
    schema = (
        "z int, x long, y long, layer string, blob binary, "
        "n_features long, n_points long"
    )
    return spark.createDataFrame(pdf, schema=schema)


def test_composite_unions_distinct_layers(spark):
    a = _layer_row(spark, 5, 3, 4, "roads", 1, 100, 200)
    b = _layer_row(spark, 5, 3, 4, "water", 2, 300, 400)
    tiles = C.composite_tiles([a, b]).collect()
    assert len(tiles) == 1
    layers = [pbf.decode_layer(m) for m in pbf.decode_tile(bytes(tiles[0].tile))]
    assert sorted(ly["name"] for ly in layers) == ["roads", "water"]


def test_composite_duplicate_layer_first_wins(spark):
    first = _layer_row(spark, 5, 3, 4, "roads", 1, 100, 200)
    second = _layer_row(spark, 5, 3, 4, "roads", 99, 999, 999)
    merged = C.composite_layers([first, second]).collect()
    assert len(merged) == 1
    d = pbf.decode_layer(bytes(merged[0].blob))
    assert d["features"][0]["id"] == 1  # first source won (U2)


def test_rescale_layer_blob():
    lb = pbf.LayerBuilder("l", extent=4096)
    stream = gc.encode_geometry(
        gc.GEOM_POINT,
        np.array([2048], dtype=np.int64),
        np.array([1024], dtype=np.int64),
        np.array([0, 1]),
    )
    lb.add_feature(7, gc.GEOM_POINT, stream, {"k": "v"})
    out = C.rescale_layer_blob(lb.build(), 256)
    d = pbf.decode_layer(out)
    assert d["extent"] == 256
    xs, ys, _ = gc.decode_geometry(1, d["features"][0]["geometry"].astype(np.int64))
    assert xs[0] == 128 and ys[0] == 64
    assert pbf.feature_props(d, d["features"][0]) == {"k": "v"}


def test_validity_good_and_bad(spark):
    good = _layer_row(spark, 1, 0, 0, "ok", 1, 10, 20)
    blob = bytes(good.collect()[0].blob)
    assert C.layer_is_valid(blob) == (True, [])
    ok, why = C.tile_is_valid(pbf.concat_tile([blob]))
    assert ok, why
    # duplicate layer names invalid
    ok, why = C.tile_is_valid(pbf.concat_tile([blob, blob]))
    assert not ok and "duplicate layer name" in why
    # garbage bytes invalid
    ok, why = C.tile_is_valid(b"\x99\x01garbage")
    assert not ok
    # empty tile invalid
    assert C.tile_is_valid(b"") == (False, ["no layers"])


def test_validate_tiles_operator(spark):
    a = _layer_row(spark, 5, 3, 4, "roads", 1, 100, 200)
    tiles = C.composite_tiles([a])
    out = C.validate_tiles(tiles).collect()
    assert len(out) == 1 and out[0].valid


def test_composite_rescale_path(spark):
    a = _layer_row(spark, 5, 3, 4, "roads", 1, 2048, 2048)
    merged = C.composite_layers([a], target_extent=512).collect()
    d = pbf.decode_layer(bytes(merged[0].blob))
    assert d["extent"] == 512
    xs, ys, _ = gc.decode_geometry(1, d["features"][0]["geometry"].astype(np.int64))
    assert xs[0] == 256 and ys[0] == 256
