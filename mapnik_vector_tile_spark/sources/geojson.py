"""GeoJSON source/sink — S1 source parity (SURVEY.md §2.1).

The reference consumes GeoJSON everywhere outside a live mapnik
datasource: its bench harness CLI takes a `.geojson` input
(`bench/vtile-encode.cpp`) and its fixture corpus is GeoJSON
(`test/fixtures/`, mapbox/geometry-test-data). This module is the
Spark-native equivalent: **newline-delimited GeoJSON Features**
(GeoJSONSeq, RFC 8142 style — one JSON Feature document per row of a
string column), because at 100 TB a corpus arrives as splittable text
lines; a single giant FeatureCollection is unsplittable by
construction (one JSON document = one task). FeatureCollection rows
are still accepted and exploded for small inputs.

Parsing is a narrow mapInPandas stage (no shuffle): stdlib json per
row — the one acceptable per-row Python here because JSON text is not
a vectorizable wire format; coordinate flattening and the
lonlat->merc transform are numpy over the whole batch. Output is
exactly operators.tiling.FEATURES_SCHEMA so a GeoJSON corpus feeds
assign_tiles -> encode_tiles unchanged.
"""

from __future__ import annotations

import json

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from mapnik_vector_tile_spark.functions import geomcodec as gc
from mapnik_vector_tile_spark.functions import tilemath as tm

# GeoJSON type -> (engine geom_type, parser)
_TYPE_MAP = {
    "Point": gc.GEOM_POINT,
    "MultiPoint": gc.GEOM_POINT,
    "LineString": gc.GEOM_LINESTRING,
    "MultiLineString": gc.GEOM_LINESTRING,
    "Polygon": gc.GEOM_POLYGON,
    "MultiPolygon": gc.GEOM_POLYGON,
}


def _expand_geoms(geom: dict, depth: int = 0) -> list[dict]:
    """Flatten a geometry to its non-collection leaves. The reference
    encodes a mapnik geometry_collection by recursing and emitting one
    feature submessage per element with the same id/attributes
    (processor visitor over geometry<double> variants [C-med]); we
    mirror that by expanding each leaf to its own features-row. Depth
    capped (hostile inputs: a 10k-deep nested collection must not blow
    the stack)."""
    if not isinstance(geom, dict):
        return []
    if geom.get("type") != "GeometryCollection":
        return [geom]
    if depth >= 8:
        return []
    gs = geom.get("geometries")
    if not isinstance(gs, list):
        return []
    out: list[dict] = []
    for g in gs:
        out.extend(_expand_geoms(g, depth + 1))
    return out


def _flatten_geometry(gtype: str, coords) -> tuple[list, list, list] | None:
    """GeoJSON coordinates -> (xs, ys, part_offsets). Parts are line
    parts for (Multi)LineString and rings (exterior + holes, all
    polygon parts concatenated) for (Multi)Polygon — ring roles are
    re-derived downstream by winding/containment (F12), so the
    flattening is lossless for encode purposes."""
    if gtype == "Point":
        parts = [[coords]]
    elif gtype in ("MultiPoint", "LineString"):
        parts = [coords]
    elif gtype == "MultiLineString":
        parts = coords
    elif gtype == "Polygon":
        parts = coords  # rings
    elif gtype == "MultiPolygon":
        parts = [ring for poly in coords for ring in poly]
    else:
        return None
    xs: list = []
    ys: list = []
    offs = [0]
    for part in parts:
        if not part:
            continue
        xs.extend(float(p[0]) for p in part)
        ys.extend(float(p[1]) for p in part)
        offs.append(len(xs))
    if len(xs) == 0:
        return None
    return xs, ys, offs


def geojson_to_features(
    df: DataFrame, json_col: str = "json", to_merc: bool = True
) -> DataFrame:
    """Parse a string column of GeoJSON Feature (or FeatureCollection)
    documents into the canonical features schema. feature_id comes from
    the Feature `id` member, else `properties.id`, else a deterministic
    per-document counter offset is NOT invented — the row is dropped
    (ids are load-bearing for dictionary-merge order). `caption` is
    `properties.caption` (engine canonical attribute), else ''."""

    def gen(batches):
        for pdf in batches:
            rows = {
                "feature_id": [],
                "geom_type": [],
                "xs": [],
                "ys": [],
                "part_offsets": [],
                "caption": [],
            }
            for doc in pdf[json_col]:
                try:
                    obj = json.loads(doc)
                except (TypeError, ValueError):
                    continue
                if not isinstance(obj, dict):
                    continue  # valid JSON, not a GeoJSON object ('42')
                feats = (
                    obj.get("features", [])
                    if obj.get("type") == "FeatureCollection"
                    else [obj]
                )
                if not isinstance(feats, list):
                    continue
                for f in feats:
                    if not isinstance(f, dict) or f.get("type") != "Feature":
                        continue
                    geom = f.get("geometry") or {}
                    if not isinstance(geom, dict):
                        continue
                    props = f.get("properties") or {}
                    if not isinstance(props, dict):
                        props = {}
                    fid = f.get("id", props.get("id"))
                    try:
                        fid = int(fid)
                    except (TypeError, ValueError):
                        # RFC 7946 allows string ids, but MVT feature
                        # ids are uint64 — non-integer ids are dropped
                        # (documented policy), not crashed on
                        continue
                    # GeometryCollection expands to one row per leaf
                    # (same fid/props — reference collection semantics)
                    for leaf in _expand_geoms(geom):
                        gt = _TYPE_MAP.get(leaf.get("type"))
                        if gt is None:
                            continue
                        try:
                            flat = _flatten_geometry(
                                leaf["type"], leaf.get("coordinates")
                            )
                        except (TypeError, ValueError, IndexError):
                            # null/ragged coordinates — skip the
                            # feature, never the task (mixed-corpus
                            # policy)
                            continue
                        if flat is None:
                            continue
                        xs, ys, offs = flat
                        rows["feature_id"].append(fid)
                        rows["geom_type"].append(int(gt))
                        rows["xs"].append(xs)
                        rows["ys"].append(ys)
                        rows["part_offsets"].append(offs)
                        rows["caption"].append(str(props.get("caption", "")))
            if not rows["feature_id"]:
                # empty frames default to float64 columns, which Arrow
                # can't coerce to list<double> — skip instead
                continue
            out = pd.DataFrame(rows)
            if to_merc and len(out):
                mxs, mys = [], []
                # flatten all coords of the batch into ONE numpy
                # transform, then split back (no per-vertex Python trig)
                lens = np.fromiter(
                    (len(a) for a in out["xs"]), np.int64, count=len(out)
                )
                cat_x = np.concatenate([np.asarray(a) for a in out["xs"]])
                cat_y = np.concatenate([np.asarray(a) for a in out["ys"]])
                mx, my = tm.lonlat_to_merc_np(cat_x, cat_y)
                bounds = np.concatenate(([0], np.cumsum(lens)))
                for i in range(len(out)):
                    mxs.append(mx[bounds[i] : bounds[i + 1]].tolist())
                    mys.append(my[bounds[i] : bounds[i + 1]].tolist())
                out["xs"] = mxs
                out["ys"] = mys
            yield out

    from mapnik_vector_tile_spark.operators.tiling import FEATURES_SCHEMA

    return df.mapInPandas(gen, schema=FEATURES_SCHEMA)


def features_to_geojson(
    features: DataFrame, from_merc: bool = True
) -> DataFrame:
    """Sink: features rows -> one GeoJSON Feature document per row
    (newline-delimited-ready). Multi-part geometries emit Multi* types;
    single-part emit the simple type. Inverse of geojson_to_features
    up to merc<->lonlat rounding."""

    def gen(batches):
        for pdf in batches:
            docs = []
            fids = []
            for r in pdf.itertuples():
                xs = np.asarray(r.xs, dtype=np.float64)
                ys = np.asarray(r.ys, dtype=np.float64)
                if from_merc:
                    xs, ys = tm.merc_to_lonlat_np(xs, ys)
                offs = list(r.part_offsets)
                parts = [
                    [
                        [float(xs[i]), float(ys[i])]
                        for i in range(offs[p], offs[p + 1])
                    ]
                    for p in range(len(offs) - 1)
                ]
                if r.geom_type == gc.GEOM_POINT:
                    pts = parts[0]
                    geom = (
                        {"type": "Point", "coordinates": pts[0]}
                        if len(pts) == 1
                        else {"type": "MultiPoint", "coordinates": pts}
                    )
                elif r.geom_type == gc.GEOM_LINESTRING:
                    geom = (
                        {"type": "LineString", "coordinates": parts[0]}
                        if len(parts) == 1
                        else {"type": "MultiLineString", "coordinates": parts}
                    )
                else:
                    # all rings into one Polygon; hole/exterior roles are
                    # winding-derived downstream, matching _flatten_geometry.
                    # RFC 7946 requires closed rings — engine-native
                    # features store rings OPEN (geomcodec convention),
                    # so append the closing vertex when absent
                    parts = [
                        ring if ring and ring[0] == ring[-1] else ring + ring[:1]
                        for ring in parts
                    ]
                    geom = {"type": "Polygon", "coordinates": parts}
                docs.append(
                    json.dumps(
                        {
                            "type": "Feature",
                            "id": int(r.feature_id),
                            "geometry": geom,
                            "properties": {"caption": r.caption},
                        },
                        separators=(",", ":"),
                    )
                )
                fids.append(int(r.feature_id))
            yield pd.DataFrame({"feature_id": fids, "json": docs})

    return features.mapInPandas(gen, schema="feature_id long, json string")
