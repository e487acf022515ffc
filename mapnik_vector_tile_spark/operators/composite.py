"""Tile composite / merge (EP3, U1/U2) + validity (P5) — SURVEY.md §2.6.

Reference semantics (src/vector_tile_composite.hpp — composite();
src/vector_tile_load_tile.hpp — add_buffer_to_tile duplicate-layer
policy; src/vector_tile_is_valid.hpp — tile_is_valid): merging k source
tiles for one address appends their layer buffers (fast path, legal
protobuf concat per SURVEY A.5), skipping a layer name that is already
present (first source wins); the slow path decodes, rescales to the
target extent, and re-encodes.

Spark shape: sources are layer tables (z,x,y,layer,blob,...) tagged
with a source rank; the merge is ONE union + per-(tile,layer)
first-wins fold — the same grouped shuffle machinery as the encode
pipeline, so composite inherits its salting/skew story. The re-extent
slow path is a narrow blob→blob kernel."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mapnik_vector_tile_spark.functions import geomcodec as gc
from mapnik_vector_tile_spark.functions import pbf
from mapnik_vector_tile_spark.operators.grouped import apply_grouped
from mapnik_vector_tile_spark.operators.tiling import (
    LAYER_COLS,
    LAYER_SCHEMA,
    fold_tiles,
)


def composite_layers(
    sources: list[DataFrame], target_extent: int | None = None
) -> DataFrame:
    """U1/U2: merge layer tables from several sources. Duplicate
    (z,x,y,layer) keeps the EARLIEST source (first-wins — the
    reference's skip-duplicate policy). Returns a layers table ready
    for fold_tiles. Pass target_extent to force the slow path (decode →
    rescale → re-encode) on blobs whose extent differs."""
    if not sources:
        raise ValueError("composite_layers: no source layer tables")
    tagged = None
    for rank, src in enumerate(sources):
        t = src.select(*LAYER_COLS).withColumn("_rank", F.lit(rank))
        tagged = t if tagged is None else tagged.unionByName(t)

    def merge_group(key, cols, sl) -> list[tuple]:
        z, x, y, layer = int(key[0]), int(key[1]), int(key[2]), str(key[3])
        # rows are rank-sorted: first one wins (U2)
        i = sl.start
        blob = cols["blob"][i]
        if target_extent is not None:
            blob = rescale_layer_blob(bytes(blob), target_extent)
        return [
            (
                z,
                x,
                y,
                layer,
                blob,
                int(cols["n_features"][i]),
                int(cols["n_points"][i]),
            )
        ]

    return apply_grouped(
        tagged,
        keys=["z", "x", "y", "layer"],
        order_by=["z", "x", "y", "layer", "_rank"],
        fn=merge_group,
        schema=LAYER_SCHEMA,
        out_columns=LAYER_COLS,
    )


def composite_tiles(
    sources: list[DataFrame], target_extent: int | None = None
) -> DataFrame:
    """EP3 end-to-end: layer tables in, merged Tile buffers out."""
    return fold_tiles(composite_layers(sources, target_extent))


def rescale_layer_blob(blob: bytes, to_extent: int) -> bytes:
    """Slow-path re-encode: scale tile-local ints to the new extent
    with tilemath.round_half_away_np (std::round / view_strategy
    parity — floor(x+0.5) would round negative buffer halves the
    wrong way), keeping key/value dictionaries as RAW bytes so value
    oneof types survive verbatim (a decode/encode round trip would
    normalize uint_value/float_value/sint_value). Features whose
    geometry stream fails v2 decoding (v1-tolerated shapes, corrupt
    bytes) are DROPPED, not raised — one bad foreign feature must not
    abort the composite job."""
    from mapnik_vector_tile_spark.functions import tilemath as tm

    d = pbf.split_layer(blob)
    from_extent = d["extent"]
    if from_extent == to_extent:
        return blob
    s = to_extent / from_extent
    feats = []
    for fid, gtype, tags, raw_geom, raw_raster in d["features"]:
        try:
            xs, ys, offs = gc.decode_geometry(
                int(gtype), pbf._varints_small(raw_geom).astype(np.int64)
            )
        except ValueError:
            continue
        px = tm.round_half_away_np(xs.astype(np.float64) * s)
        py = tm.round_half_away_np(ys.astype(np.float64) * s)
        stream = gc.encode_geometry(int(gtype), px, py, offs)
        if len(stream) == 0:
            continue
        raw2 = pbf.varint_bytes_np(np.asarray(stream, dtype=np.uint64))
        feats.append((fid, gtype, tags, raw2, raw_raster))
    return pbf.rebuild_layer_raw(
        d["name"], d["version"] or 2, to_extent, d["keys"],
        d["raw_values"], feats,
    )


# --- P5 validity -----------------------------------------------------------------


def layer_is_valid(blob: bytes) -> tuple[bool, list[str]]:
    ok, reasons, _name = _layer_valid_named(blob)
    return ok, reasons


def _layer_valid_named(blob: bytes) -> tuple[bool, list[str], str | None]:
    """src/vector_tile_is_valid.hpp layer rules: version ∈ {1,2},
    non-empty name, extent > 0, known geom types, tag indices inside
    dictionaries, geometry command streams well-formed. Returns the
    layer name from the same single parse."""
    reasons: list[str] = []
    try:
        d = pbf.decode_layer(blob)
    except Exception as e:  # malformed protobuf
        return False, [f"unparseable: {e}"], None
    if d["version"] not in (1, 2):
        reasons.append("bad version")
    if not d["name"]:
        reasons.append("empty name")
    if d["extent"] <= 0:
        reasons.append("bad extent")
    for f in d["features"]:
        if int(f["type"]) not in (1, 2, 3):
            reasons.append("unknown geom type")
            break
        t = f["tags"]
        if len(t) % 2 == 1:
            reasons.append("odd tag count")
            break
        if len(t) and (
            max(t[0::2], default=0) >= len(d["keys"])
            or max(t[1::2], default=0) >= len(d["values"])
        ):
            reasons.append("tag index out of range")
            break
        try:
            gc.decode_geometry(int(f["type"]), f["geometry"].astype(np.int64))
        except Exception:
            reasons.append("bad geometry stream")
            break
    return (not reasons), reasons, d["name"]


def tile_is_valid(tile: bytes) -> tuple[bool, list[str]]:
    """Tile rules: parseable, ≥1 layer, unique non-empty layer names,
    every layer valid. One decode per layer (the name comes from the
    same parse layer_is_valid already did)."""
    try:
        layers = pbf.decode_tile(pbf.maybe_decompress(tile))
    except Exception as e:
        return False, [f"unparseable tile: {e}"]
    if not layers:
        return False, ["no layers"]
    reasons: list[str] = []
    names = []
    for lmsg in layers:
        ok, why, name = _layer_valid_named(lmsg)
        if not ok:
            reasons.extend(why)
        if name is not None:
            names.append(name)
    if len(set(names)) != len(names):
        reasons.append("duplicate layer name")
    return (not reasons), reasons


def validate_tiles(tiles: DataFrame) -> DataFrame:
    """P5 as a DataFrame operator: (z,x,y, valid, reasons). Narrow
    vectorized scan — used as a filter and a test assertion."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            valid, reasons = [], []
            for t in pdf["tile"]:
                ok, why = tile_is_valid(bytes(t))
                valid.append(ok)
                reasons.append(why)
            out = pdf[["z", "x", "y"]].copy()
            out["valid"] = valid
            out["reasons"] = reasons
            yield out

    return tiles.mapInPandas(
        gen, schema="z int, x long, y long, valid boolean, reasons array<string>"
    )
