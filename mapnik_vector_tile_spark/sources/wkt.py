"""WKT/WKB geometry source + WKT sink — S1 source parity widening
(SURVEY.md §2.1). The reference's mapnik layer ingests WKT/WKB through
``mapnik::from_wkt`` / ``mapnik::geometry_utils::from_wkb`` (public
mapnik API: include/mapnik/wkt/wkt_factory.hpp,
include/mapnik/util/geometry_to_wkt.hpp) — CSV/PostGIS datasources
arrive as exactly these encodings. This module is the Spark-native
equivalent: parse a string (WKT) or binary (WKB) column into the
canonical ``operators.tiling.FEATURES_SCHEMA`` so any WKT/WKB corpus
feeds assign_tiles → encode_tiles unchanged, plus the inverse
``geometry_to_wkt`` writer for interchange output.

Like the GeoJSON source, parsing is a narrow mapInPandas stage (no
shuffle). WKT text is not a vectorizable wire format, so the paren
tokenizer is per-row Python (same documented budget class as
json.loads there); WKB coordinate payloads ARE fixed-stride IEEE
doubles, so every part's vertices decode in one ``np.frombuffer`` —
no per-vertex Python on the binary path. The lonlat→merc transform is
one numpy pass over the whole Arrow batch, shared with the GeoJSON
source.

Scope (documented narrowing, mirrored from the engine's 2D pipeline):
2D XY only — Z/M/ZM WKT and Z/M/SRID-flagged WKB raise/skip per the
mixed-corpus policy (parse errors drop the FEATURE, never the task).
EMPTY geometries parse to None (a feature with no vertices encodes to
nothing downstream — reference not-painted semantics).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from mapnik_vector_tile_spark.functions import geomcodec as gc
from mapnik_vector_tile_spark.functions import tilemath as tm

# WKB geometry type codes (OGC 06-103r4 §8.2.3)
_WKB_POINT = 1
_WKB_LINESTRING = 2
_WKB_POLYGON = 3
_WKB_MULTIPOINT = 4
_WKB_MULTILINESTRING = 5
_WKB_MULTIPOLYGON = 6
_WKB_COLLECTION = 7

_WKT_TYPE_TO_ENGINE = {
    "POINT": gc.GEOM_POINT,
    "MULTIPOINT": gc.GEOM_POINT,
    "LINESTRING": gc.GEOM_LINESTRING,
    "MULTILINESTRING": gc.GEOM_LINESTRING,
    "POLYGON": gc.GEOM_POLYGON,
    "MULTIPOLYGON": gc.GEOM_POLYGON,
}


# --- WKT parser ----------------------------------------------------------------


def _parse_group(s: str, i: int):
    """Parse the paren group starting at s[i] == '('. Returns
    (children, j) where children is a list of either nested groups
    (lists) or leaf coordinate strings, and j indexes past ')'."""
    if s[i] != "(":
        raise ValueError(f"wkt: expected '(' at {i}")
    out: list = []
    i += 1
    start = i
    n = len(s)
    # nested groups are consumed wholly by the recursive call, so this
    # loop only ever sees tokens at ITS OWN nesting level
    while i < n:
        c = s[i]
        if c == "(":
            child, i = _parse_group(s, i)
            out.append(child)
            start = i
            continue
        if c == ")":
            leaf = s[start:i].strip()
            if leaf:
                out.append(leaf)
            return out, i + 1
        if c == ",":
            leaf = s[start:i].strip()
            if leaf:
                out.append(leaf)
            start = i + 1
        i += 1
    raise ValueError("wkt: unbalanced parens")


def _coords_of(leaf: str) -> tuple[float, float]:
    parts = leaf.split()
    if len(parts) != 2:
        raise ValueError(f"wkt: expected 2D coordinate, got {leaf!r}")
    return float(parts[0]), float(parts[1])


def _leaf_list(children: list) -> list[tuple[float, float]]:
    """A group whose children are all coordinate leaves ('x y') or
    singleton nested groups (MULTIPOINT ((1 2), (3 4)) form)."""
    out = []
    for c in children:
        if isinstance(c, list):
            if len(c) != 1 or isinstance(c[0], list):
                raise ValueError("wkt: malformed coordinate group")
            out.append(_coords_of(c[0]))
        else:
            out.append(_coords_of(c))
    return out


def parse_wkt(s: str):
    """WKT string -> (engine_geom_type, xs, ys, part_offsets) or None
    for EMPTY. Contract: EVERY malformed/unsupported input (Z/M/ZM
    dimensions, unknown types, truncated/ragged bodies) raises
    ValueError — generic Index/Attribute errors from hostile text are
    folded so a corpus task can apply the drop-the-feature policy with
    one except clause (same contract as parse_wkb)."""
    try:
        return _parse_wkt_inner(s)
    except ValueError:
        raise
    except Exception as e:  # index/attribute errors on hostile text
        raise ValueError(f"wkt: malformed text ({type(e).__name__})") from e


def _parse_wkt_inner(s: str):
    if not isinstance(s, str):
        raise ValueError("wkt: not a string")
    t = s.strip()
    up = t.upper()
    # split leading type word
    j = 0
    while j < len(up) and (up[j].isalpha()):
        j += 1
    typ = up[:j]
    rest = t[j:].strip()
    rup = rest.upper()
    if typ == "GEOMETRYCOLLECTION":
        raise ValueError("wkt: use parse_wkt_collection for collections")
    if typ not in _WKT_TYPE_TO_ENGINE:
        raise ValueError(f"wkt: unsupported type {typ!r}")
    if rup.startswith(("Z", "M")):
        raise ValueError("wkt: only 2D XY geometries supported")
    if rup == "EMPTY":
        return None
    children, end = _parse_group(rest, 0)
    if rest[end:].strip():
        raise ValueError("wkt: trailing garbage")
    gtype = _WKT_TYPE_TO_ENGINE[typ]

    if typ == "POINT":
        parts = [[_coords_of(children[0])]] if children else []
    elif typ in ("MULTIPOINT", "LINESTRING"):
        parts = [_leaf_list(children)]
    elif typ in ("POLYGON", "MULTILINESTRING"):
        parts = [_leaf_list(ring) for ring in children]
    elif typ == "MULTIPOLYGON":
        parts = [
            _leaf_list(ring) for poly in children for ring in poly
        ]
    else:  # pragma: no cover — guarded above
        raise ValueError(typ)
    xs: list[float] = []
    ys: list[float] = []
    offs = [0]
    for part in parts:
        if not part:
            continue
        xs.extend(p[0] for p in part)
        ys.extend(p[1] for p in part)
        offs.append(len(xs))
    if not xs:
        return None
    return gtype, xs, ys, offs


def _split_collection(rest: str) -> list[str]:
    """Split 'GEOMETRYCOLLECTION ( ... )' body into member WKT texts
    at top-level commas (members contain their own parens)."""
    rest = rest.strip()
    if rest.upper() == "EMPTY":
        return []
    if not rest.startswith("("):
        raise ValueError("wkt: malformed collection")
    depth = 0
    out = []
    start = 1
    for i, c in enumerate(rest):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                seg = rest[start:i].strip()
                if seg:
                    out.append(seg)
                if rest[i + 1 :].strip():
                    raise ValueError("wkt: trailing garbage")
                return out
        elif c == "," and depth == 1:
            seg = rest[start:i].strip()
            if seg:
                out.append(seg)
            start = i + 1
    raise ValueError("wkt: unbalanced collection parens")


def parse_wkt_any(s: str) -> list:
    """WKT (incl. GEOMETRYCOLLECTION, recursion depth ≤ 8 like the
    GeoJSON source) -> list of (gtype, xs, ys, offs) leaves. Same
    fold-to-ValueError contract as parse_wkt."""

    def rec(txt: str, depth: int) -> list:
        t = txt.strip()
        up = t.upper()
        if up.startswith("GEOMETRYCOLLECTION"):
            if depth >= 8:
                return []
            body = t[len("GEOMETRYCOLLECTION") :]
            out: list = []
            for member in _split_collection(body):
                out.extend(rec(member, depth + 1))
            return out
        leaf = parse_wkt(t)
        return [leaf] if leaf is not None else []

    try:
        return rec(s, 0)
    except ValueError:
        raise
    except Exception as e:
        raise ValueError(f"wkt: malformed text ({type(e).__name__})") from e


# --- WKT writer (mapnik util::to_wkt parity) ------------------------------------


def geometry_to_wkt(gtype: int, xs, ys, offs) -> str:
    """Engine geometry -> canonical WKT. Multi-part points emit
    MULTIPOINT, multi-part lines MULTILINESTRING; polygons emit one
    POLYGON whose parts are rings (the engine's flattened-ring model —
    ring roles are winding-derived downstream, so this is the faithful
    inverse of parse_wkt for engine-native data). Coordinates use
    repr() shortest-round-trip floats (bit-exact re-parse)."""

    def fmt(v: float) -> str:
        r = repr(float(v))
        return r[:-2] if r.endswith(".0") else r

    parts = [
        [(xs[k], ys[k]) for k in range(offs[i], offs[i + 1])]
        for i in range(len(offs) - 1)
    ]
    if gtype == gc.GEOM_POINT:
        pts = [p for part in parts for p in part]
        if len(pts) == 1:
            return f"POINT ({fmt(pts[0][0])} {fmt(pts[0][1])})"
        body = ", ".join(f"({fmt(x)} {fmt(y)})" for x, y in pts)
        return f"MULTIPOINT ({body})"
    if gtype == gc.GEOM_LINESTRING:
        bodies = [
            ", ".join(f"{fmt(x)} {fmt(y)}" for x, y in part) for part in parts
        ]
        if len(bodies) == 1:
            return f"LINESTRING ({bodies[0]})"
        return "MULTILINESTRING (" + ", ".join(f"({b})" for b in bodies) + ")"
    if gtype == gc.GEOM_POLYGON:
        bodies = [
            ", ".join(f"{fmt(x)} {fmt(y)}" for x, y in part) for part in parts
        ]
        return "POLYGON (" + ", ".join(f"({b})" for b in bodies) + ")"
    raise ValueError(f"unknown geom_type {gtype}")


# --- WKB parser ----------------------------------------------------------------


def _wkb_header(buf: memoryview, i: int) -> tuple[str, int, int]:
    if i + 5 > len(buf):
        raise ValueError("wkb: truncated header")
    order = buf[i]
    if order == 1:
        bo = "<"
    elif order == 0:
        bo = ">"
    else:
        raise ValueError(f"wkb: bad byte order {order}")
    (code,) = struct.unpack_from(bo + "I", buf, i + 1)
    if code & 0xE0000000 or code >= 1000:
        # EWKB SRID/Z/M flags and ISO Z(+1000)/M(+2000) variants
        raise ValueError("wkb: only 2D XY geometries supported")
    return bo, code, i + 5


def _wkb_points(buf: memoryview, i: int, n: int, bo: str) -> tuple[np.ndarray, int]:
    end = i + 16 * n
    if end > len(buf):
        raise ValueError("wkb: truncated coordinates")
    arr = np.frombuffer(buf[i:end], dtype=bo + "f8").reshape(n, 2)
    return arr, end


def _parse_wkb_at(buf: memoryview, i: int, depth: int = 0):
    """Returns (list_of_leaves, next_index); each leaf is
    (gtype, xs, ys, offs)."""
    bo, code, i = _wkb_header(buf, i)

    def count(at: int) -> tuple[int, int]:
        if at + 4 > len(buf):
            raise ValueError("wkb: truncated count")
        (c,) = struct.unpack_from(bo + "I", buf, at)
        if c > 50_000_000:  # hostile-count guard before allocation
            raise ValueError("wkb: implausible element count")
        return c, at + 4

    if code == _WKB_POINT:
        arr, i = _wkb_points(buf, i, 1, bo)
        if np.isnan(arr).all():  # POINT EMPTY convention (NaN NaN)
            return [], i
        return [(gc.GEOM_POINT, arr[:, 0].tolist(), arr[:, 1].tolist(), [0, 1])], i
    if code == _WKB_LINESTRING:
        n, i = count(i)
        arr, i = _wkb_points(buf, i, n, bo)
        if n == 0:
            return [], i
        return [(gc.GEOM_LINESTRING, arr[:, 0].tolist(), arr[:, 1].tolist(), [0, n])], i
    if code == _WKB_POLYGON:
        nr, i = count(i)
        xs: list = []
        ys: list = []
        offs = [0]
        for _ in range(nr):
            n, i = count(i)
            arr, i = _wkb_points(buf, i, n, bo)
            if n == 0:
                continue
            xs.extend(arr[:, 0].tolist())
            ys.extend(arr[:, 1].tolist())
            offs.append(len(xs))
        if not xs:
            return [], i
        return [(gc.GEOM_POLYGON, xs, ys, offs)], i
    if code in (_WKB_MULTIPOINT, _WKB_MULTILINESTRING, _WKB_MULTIPOLYGON, _WKB_COLLECTION):
        if depth >= 8:
            raise ValueError("wkb: nesting too deep")
        n, i = count(i)
        leaves: list = []
        for _ in range(n):
            sub, i = _parse_wkb_at(buf, i, depth + 1)
            leaves.extend(sub)
        if code == _WKB_COLLECTION:
            return leaves, i
        # merge homogeneous members into ONE engine multi-geometry —
        # same flattening as the WKT/GeoJSON path: MULTIPOINT collapses
        # to a single part (engine point-set convention), MULTILINE/
        # MULTIPOLYGON concatenate their members' parts
        xs, ys, offs = [], [], [0]
        gtype = None
        for gt, lxs, lys, loffs in leaves:
            gtype = gt
            if code == _WKB_MULTIPOINT:
                xs.extend(lxs)
                ys.extend(lys)
                continue
            for k in range(len(loffs) - 1):
                xs.extend(lxs[loffs[k] : loffs[k + 1]])
                ys.extend(lys[loffs[k] : loffs[k + 1]])
                offs.append(len(xs))
        if gtype is None:
            return [], i
        if code == _WKB_MULTIPOINT:
            offs = [0, len(xs)]
        return [(gtype, xs, ys, offs)], i
    raise ValueError(f"wkb: unsupported geometry type {code}")


def parse_wkb(buf: bytes) -> list:
    """WKB bytes -> list of (gtype, xs, ys, offs) leaves. ValueError
    on malformed/unsupported input; trailing bytes rejected."""
    try:
        mv = memoryview(buf)
        leaves, end = _parse_wkb_at(mv, 0)
        if end != len(mv):
            raise ValueError("wkb: trailing garbage")
        return leaves
    except ValueError:
        raise
    except Exception as e:  # struct/overflow on garbage
        raise ValueError(f"wkb: malformed stream ({type(e).__name__})") from e


def geometry_to_wkb(gtype: int, xs, ys, offs, little: bool = True) -> bytes:
    """Engine geometry -> WKB (single-part → simple type, multi-part →
    Multi*/POLYGON with rings). Inverse of parse_wkb for engine data."""
    bo = "<" if little else ">"
    order = b"\x01" if little else b"\x00"

    def hdr(code: int) -> bytes:
        return order + struct.pack(bo + "I", code)

    def pts(a: int, b: int) -> bytes:
        arr = np.empty((b - a, 2), dtype=bo + "f8")
        arr[:, 0] = xs[a:b]
        arr[:, 1] = ys[a:b]
        return arr.tobytes()

    nparts = len(offs) - 1
    if gtype == gc.GEOM_POINT:
        n = offs[-1]
        if n == 1:
            return hdr(_WKB_POINT) + pts(0, 1)
        body = b"".join(hdr(_WKB_POINT) + pts(k, k + 1) for k in range(n))
        return hdr(_WKB_MULTIPOINT) + struct.pack(bo + "I", n) + body
    if gtype == gc.GEOM_LINESTRING:
        if nparts == 1:
            return (
                hdr(_WKB_LINESTRING)
                + struct.pack(bo + "I", offs[1])
                + pts(0, offs[1])
            )
        body = b"".join(
            hdr(_WKB_LINESTRING)
            + struct.pack(bo + "I", offs[i + 1] - offs[i])
            + pts(offs[i], offs[i + 1])
            for i in range(nparts)
        )
        return hdr(_WKB_MULTILINESTRING) + struct.pack(bo + "I", nparts) + body
    if gtype == gc.GEOM_POLYGON:
        body = struct.pack(bo + "I", nparts) + b"".join(
            struct.pack(bo + "I", offs[i + 1] - offs[i]) + pts(offs[i], offs[i + 1])
            for i in range(nparts)
        )
        return hdr(_WKB_POLYGON) + body
    raise ValueError(f"unknown geom_type {gtype}")


# --- DataFrame stages ----------------------------------------------------------


def _features_frame(rows: dict, to_merc: bool) -> pd.DataFrame | None:
    if not rows["feature_id"]:
        return None
    out = pd.DataFrame(rows)
    if to_merc and len(out):
        lens = np.fromiter((len(a) for a in out["xs"]), np.int64, count=len(out))
        cat_x = np.concatenate([np.asarray(a) for a in out["xs"]])
        cat_y = np.concatenate([np.asarray(a) for a in out["ys"]])
        mx, my = tm.lonlat_to_merc_np(cat_x, cat_y)
        bounds = np.concatenate(([0], np.cumsum(lens)))
        out["xs"] = [mx[bounds[i] : bounds[i + 1]].tolist() for i in range(len(out))]
        out["ys"] = [my[bounds[i] : bounds[i + 1]].tolist() for i in range(len(out))]
    return out


def _ingest_stage(
    df: DataFrame,
    payload_col: str,
    parse_one,
    id_col: str,
    caption_col: str | None,
    to_merc: bool,
) -> DataFrame:
    """Shared WKT/WKB ingest generator: one body, parameterized by the
    parse function (so the drop-the-feature policy and the id/caption
    handling cannot drift between the two formats). A row is dropped
    when the payload fails to parse OR its id fails integer coercion
    (null/NaN ids) — never the task."""

    def gen(batches):
        for pdf in batches:
            rows = {
                "feature_id": [], "geom_type": [], "xs": [], "ys": [],
                "part_offsets": [], "caption": [],
            }
            caps = pdf[caption_col] if caption_col in pdf else None
            for k, (fid, payload) in enumerate(
                zip(pdf[id_col], pdf[payload_col])
            ):
                try:
                    fid = int(fid)  # inside the policy: NULL/NaN ids drop
                    leaves = parse_one(payload)
                except (ValueError, TypeError):
                    continue
                for gtype, xs, ys, offs in leaves:
                    rows["feature_id"].append(fid)
                    rows["geom_type"].append(int(gtype))
                    rows["xs"].append(xs)
                    rows["ys"].append(ys)
                    rows["part_offsets"].append(offs)
                    rows["caption"].append(
                        str(caps.iloc[k]) if caps is not None else ""
                    )
            out = _features_frame(rows, to_merc)
            if out is not None:
                yield out

    from mapnik_vector_tile_spark.operators.tiling import FEATURES_SCHEMA

    return df.mapInPandas(gen, schema=FEATURES_SCHEMA)


def wkt_to_features(
    df: DataFrame,
    wkt_col: str = "wkt",
    id_col: str = "feature_id",
    caption_col: str | None = "caption",
    to_merc: bool = True,
) -> DataFrame:
    """Parse a WKT string column into the canonical features schema.
    Malformed/unsupported/EMPTY rows are dropped (mixed-corpus policy,
    same as the GeoJSON source); GEOMETRYCOLLECTION expands to one row
    per leaf with the same id/caption (reference collection
    semantics)."""
    return _ingest_stage(
        df, wkt_col, parse_wkt_any, id_col, caption_col, to_merc
    )


def wkb_to_features(
    df: DataFrame,
    wkb_col: str = "wkb",
    id_col: str = "feature_id",
    caption_col: str | None = "caption",
    to_merc: bool = True,
) -> DataFrame:
    """Parse a WKB binary column into the canonical features schema.
    Same drop-the-feature error policy; coordinate payloads decode via
    np.frombuffer (no per-vertex Python)."""
    return _ingest_stage(
        df, wkb_col, lambda b: parse_wkb(bytes(b)), id_col, caption_col,
        to_merc,
    )
