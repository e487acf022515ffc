"""MVT geometry command-stream encode/decode — SURVEY.md F4-F8.

Reference parity: src/vector_tile_geometry_encoder_pbf.hpp /
src/vector_tile_geometry_decoder.hpp. Semantics (MVT 2.1 §4.3, normative):

* geometry = uint32 stream of CommandIntegers + zigzag-encoded deltas
  from a cursor that persists ACROSS parts of a multi-geometry within
  one feature (the reference threads start_x/start_y the same way);
* POINT: one MoveTo(count=n); LINESTRING: per part MoveTo(1) +
  LineTo(n-1); POLYGON: per ring MoveTo(1) + LineTo(n-2) + ClosePath
  (closing vertex implied, never encoded);
* repeated-point elision (F7): consecutive identical quantized points
  collapse; degenerate results (line < 2 pts, ring < 3 distinct pts or
  zero area) are dropped;
* v2 winding (A.4): exterior ring has positive signed area in y-down
  tile coords, interiors negative; decoder reassembles multipolygons on
  that sign.

Geometries here are the canonical flat representation (SURVEY.md §1.2):
``xs/ys`` int64 vertex arrays + ``offsets`` (len n_parts+1) marking
part/ring boundaries. Rings are stored WITHOUT the closing vertex.
"""

from __future__ import annotations

import numpy as np

from mapnik_vector_tile_spark.functions.tilemath import (
    CLOSE_PATH,
    LINE_TO,
    MOVE_TO,
    command_integer_np,
    zigzag_decode_np,
    zigzag_encode_np,
)

GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON = 1, 2, 3


def signed_area2(xs: np.ndarray, ys: np.ndarray) -> int:
    """Twice the shoelace signed area of a ring (closing edge implied),
    int64-exact in tile coords (A.4). Positive = exterior under MVT's
    y-down convention."""
    n = len(xs)
    if n <= 16:
        # pure-int small-ring path (~2 µs vs ~17 µs of tiny-array numpy
        # overhead); python ints are exact, so any summation order gives
        # the identical value — zero parity risk
        s = 0
        for i in range(n):
            j = i + 1 if i + 1 < n else 0
            s += int(xs[i]) * int(ys[j]) - int(xs[j]) * int(ys[i])
        return s
    xs = np.asarray(xs, dtype=np.int64)
    ys = np.asarray(ys, dtype=np.int64)
    # manual left-rotate: np.roll costs ~8µs/call in axis bookkeeping,
    # and this runs once per ring across the whole encode pipeline
    x2 = np.empty_like(xs)
    x2[:-1] = xs[1:]
    x2[-1] = xs[0]
    y2 = np.empty_like(ys)
    y2[:-1] = ys[1:]
    y2[-1] = ys[0]
    # 2A = sum(x_i*y_{i+1} - x_{i+1}*y_i): positive for the MVT spec's
    # own exterior-ring example (3,6)(8,12)(20,34) -> +38.
    return int(np.sum(xs * y2 - x2 * ys))


def _dedup_consecutive(xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    if len(xs) <= 1:
        return xs, ys
    keep = np.empty(len(xs), dtype=bool)
    keep[0] = True
    keep[1:] = (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1])
    return xs[keep], ys[keep]


_SMALL_N = 16


def _encode_small_single_part(
    geom_type: int, xs, ys, n: int
) -> np.ndarray:
    """Pure-int fast path for single-part geometries with <= _SMALL_N
    vertices — the overwhelming shape of an image-footprint corpus
    (points and quads). The generic numpy branch costs ~60 µs/call in
    tiny-array overhead; this is ~2 µs with IDENTICAL semantics/bytes
    (asserted against the generic path in tests/test_geomcodec.py):
    same consecutive-dedup (F7; points are NOT deduped — the generic
    path leaves multipoint dedup to the caller), closing-vertex drop,
    zero-area drop, zigzag/delta/cursor math (cursor starts (0,0):
    single part). Coordinates beyond ±2^31 fall back to the generic
    path so int64-extreme (adversarial) inputs keep its exact wrap
    semantics — mirror of the decode fast path's contract."""
    pts = []
    last = None
    for i in range(n):
        x, y = int(xs[i]), int(ys[i])
        if not (-2147483648 <= x <= 2147483647) or not (
            -2147483648 <= y <= 2147483647
        ):
            return _encode_geometry_generic(
                geom_type, xs, ys, np.array([0, n], dtype=np.int64)
            )
        p = (x, y)
        if geom_type == GEOM_POINT or p != last:
            pts.append(p)
            last = p
    if geom_type == GEOM_POINT:
        out = [(MOVE_TO & 7) | (len(pts) << 3)]
        cx = cy = 0
        for x, y in pts:
            dx, dy = x - cx, y - cy
            out.append((dx << 1) ^ (dx >> 63))
            out.append((dy << 1) ^ (dy >> 63))
            cx, cy = x, y
        return np.asarray(out, dtype=np.int64)
    if geom_type == GEOM_LINESTRING:
        if len(pts) < 2:
            return np.empty(0, dtype=np.int64)
    else:  # GEOM_POLYGON
        if len(pts) >= 2 and pts[0] == pts[-1]:
            pts.pop()
        if len(pts) < 3:
            return np.empty(0, dtype=np.int64)
        a2 = 0
        px0, py0 = pts[-1]
        for x, y in pts:
            a2 += px0 * y - x * py0
            px0, py0 = x, y
        if a2 == 0:
            return np.empty(0, dtype=np.int64)
    m = len(pts)
    x0, y0 = pts[0]
    out = [
        (MOVE_TO & 7) | (1 << 3),
        (x0 << 1) ^ (x0 >> 63),
        (y0 << 1) ^ (y0 >> 63),
        (LINE_TO & 7) | ((m - 1) << 3),
    ]
    cx, cy = x0, y0
    for i in range(1, m):
        x, y = pts[i]
        dx, dy = x - cx, y - cy
        out.append((dx << 1) ^ (dx >> 63))
        out.append((dy << 1) ^ (dy >> 63))
        cx, cy = x, y
    if geom_type == GEOM_POLYGON:
        out.append((CLOSE_PATH & 7) | (1 << 3))
    return np.asarray(out, dtype=np.int64)


def encode_geometry(
    geom_type: int,
    xs: np.ndarray,
    ys: np.ndarray,
    offsets: np.ndarray,
) -> np.ndarray:
    """Flat parts -> uint32 command stream (as int64 numpy for easy
    varint packing later). Returns empty array if everything degenerates.
    """
    n = len(xs)
    if (
        0 < n <= _SMALL_N
        and len(offsets) == 2
        and int(offsets[0]) == 0
        and int(offsets[1]) == n
        and geom_type in (GEOM_POINT, GEOM_LINESTRING, GEOM_POLYGON)
    ):
        return _encode_small_single_part(geom_type, xs, ys, n)
    return _encode_geometry_generic(geom_type, xs, ys, offsets)


def _encode_geometry_generic(
    geom_type: int,
    xs: np.ndarray,
    ys: np.ndarray,
    offsets: np.ndarray,
) -> np.ndarray:
    xs = np.asarray(xs, dtype=np.int64)
    ys = np.asarray(ys, dtype=np.int64)
    offsets = np.asarray(offsets, dtype=np.int64)
    out: list[np.ndarray] = []
    cx, cy = 0, 0  # cursor persists across parts (F6)

    if geom_type == GEOM_POINT:
        pxs, pys = xs, ys
        if len(pxs) == 0:
            return np.empty(0, dtype=np.int64)
        out.append(np.array([command_integer_np(MOVE_TO, len(pxs))], dtype=np.int64))
        dx = np.diff(np.concatenate(([cx], pxs)))
        dy = np.diff(np.concatenate(([cy], pys)))
        inter = np.empty(2 * len(pxs), dtype=np.int64)
        inter[0::2] = zigzag_encode_np(dx)
        inter[1::2] = zigzag_encode_np(dy)
        out.append(inter)
        return np.concatenate(out)

    for p in range(len(offsets) - 1):
        pxs = xs[offsets[p] : offsets[p + 1]]
        pys = ys[offsets[p] : offsets[p + 1]]
        pxs, pys = _dedup_consecutive(pxs, pys)

        if geom_type == GEOM_LINESTRING:
            if len(pxs) < 2:
                continue  # degenerate part dropped (P4)
            dx = np.diff(np.concatenate(([cx], pxs)))
            dy = np.diff(np.concatenate(([cy], pys)))
            inter = np.empty(2 * len(pxs), dtype=np.int64)
            inter[0::2] = zigzag_encode_np(dx)
            inter[1::2] = zigzag_encode_np(dy)
            out.append(
                np.concatenate(
                    (
                        [command_integer_np(MOVE_TO, 1)],
                        inter[:2],
                        [command_integer_np(LINE_TO, len(pxs) - 1)],
                        inter[2:],
                    )
                ).astype(np.int64)
            )
            cx, cy = int(pxs[-1]), int(pys[-1])

        elif geom_type == GEOM_POLYGON:
            # drop explicit closing vertex if present
            if len(pxs) >= 2 and pxs[0] == pxs[-1] and pys[0] == pys[-1]:
                pxs, pys = pxs[:-1], pys[:-1]
            if len(pxs) < 3 or signed_area2(pxs, pys) == 0:
                continue
            dx = np.diff(np.concatenate(([cx], pxs)))
            dy = np.diff(np.concatenate(([cy], pys)))
            inter = np.empty(2 * len(pxs), dtype=np.int64)
            inter[0::2] = zigzag_encode_np(dx)
            inter[1::2] = zigzag_encode_np(dy)
            out.append(
                np.concatenate(
                    (
                        [command_integer_np(MOVE_TO, 1)],
                        inter[:2],
                        [command_integer_np(LINE_TO, len(pxs) - 1)],
                        inter[2:],
                        [command_integer_np(CLOSE_PATH, 1)],
                    )
                ).astype(np.int64)
            )
            cx, cy = int(pxs[-1]), int(pys[-1])
        else:
            raise ValueError(f"unknown geom_type {geom_type}")

    if not out:
        return np.empty(0, dtype=np.int64)
    return np.concatenate(out)


_I64_MASK = 0xFFFFFFFFFFFFFFFF
_I64_BIAS = 1 << 63


def _zigzag_dec_int(v: int) -> int:
    """Scalar zigzag decode with zigzag_decode_np's exact LOGICAL-shift
    + int64-wrap semantics (adversarial extremes decode identically on
    scalar and vector paths — asserted in tests)."""
    u = int(v) & _I64_MASK
    d = (u >> 1) ^ -(u & 1)
    return ((d + _I64_BIAS) & _I64_MASK) - _I64_BIAS


def _wrap_i64(v: int) -> int:
    return ((v + _I64_BIAS) & _I64_MASK) - _I64_BIAS


_SMALL_CNT = 16


def decode_geometry(
    geom_type: int, stream: np.ndarray, version: int = 2
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Command stream -> (xs, ys, offsets). Enforces v2 validity:
    MoveTo(1) between parts, LineTo count >= 1, rings closed by
    ClosePath only. Raises ValueError on malformed streams.

    ``version=1`` is the tolerant mode of the reference decoder
    (src/vector_tile_geometry_decoder.hpp takes the layer version and
    only throws the v2 "MUST" rules when version >= 2 [C-med — exact
    upstream tolerances unverifiable with the empty reference mount;
    our pinned narrowing]): degenerate pieces are DROPPED instead of
    raising — a <2-point linestring part, a <3-point ring (at
    ClosePath, at a following MoveTo, or at end-of-stream), an
    unclosed trailing ring, and a zero-count LineTo. Structural
    ambiguities (unknown command, LineTo before any MoveTo, truncated
    params, MoveTo count != 1 on line/polygon) still raise in both
    versions. A feature whose every part degenerates decodes to empty
    arrays — callers drop it as unpainted (P4)."""
    lax = version == 1
    if geom_type == GEOM_POINT and len(stream) == 3 and int(stream[0]) == 9:
        # single-point fast path (the bulk of an image-footprint decode
        # scan): pure-int zigzag, no numpy kernels. Mirror
        # zigzag_decode_np's LOGICAL shift + int64 wrap exactly so
        # int64-extreme (corrupt/adversarial) encodings decode the
        # same whichever path handles them — asserted in
        # tests/test_geomcodec.py.
        _zz = _zigzag_dec_int
        return (
            np.array([_zz(stream[1])], dtype=np.int64),
            np.array([_zz(stream[2])], dtype=np.int64),
            np.array([0, 1], dtype=np.int64),
        )
    stream = np.asarray(stream, dtype=np.int64)
    xs: list[int] = []
    ys: list[int] = []
    offsets: list[int] = [0]
    i = 0
    cx, cy = 0, 0
    n = len(stream)
    while i < n:
        cmd, cnt = int(stream[i]) & 0x7, int(stream[i]) >> 3
        i += 1
        if cmd == MOVE_TO:
            if geom_type != GEOM_POINT and cnt != 1:
                raise ValueError("v2: MoveTo count must be 1 for line/polygon")
            if cnt < 1:
                raise ValueError("MoveTo count < 1")
            if i + 2 * cnt > n:
                raise ValueError("truncated MoveTo params")
            if geom_type == GEOM_POINT:
                if cnt <= _SMALL_CNT:
                    # scalar path: wrap-exact accumulation (see _zigzag_dec_int)
                    for _ in range(cnt):
                        cx = _wrap_i64(cx + _zigzag_dec_int(int(stream[i])))
                        cy = _wrap_i64(
                            cy + _zigzag_dec_int(int(stream[i + 1]))
                        )
                        xs.append(cx)
                        ys.append(cy)
                        i += 2
                else:
                    d = stream[i : i + 2 * cnt]
                    i += 2 * cnt
                    px = np.cumsum(zigzag_decode_np(d[0::2])) + cx
                    py = np.cumsum(zigzag_decode_np(d[1::2])) + cy
                    xs.extend(px.tolist())
                    ys.extend(py.tolist())
                    cx, cy = int(px[-1]), int(py[-1])
                offsets.append(len(xs))
            else:
                # new part starts (cnt == 1 enforced above). NB: this
                # cursor add is deliberately UNWRAPPED — the original
                # numpy branch did `cx += int(ddx[0])` in plain Python,
                # and extreme-value parity pins that behavior.
                if len(xs) > offsets[-1]:
                    if geom_type == GEOM_POLYGON:
                        if not lax:
                            # v2: rings end ONLY via ClosePath —
                            # fabricating a ring boundary here would let
                            # unclosed (and <3-point) rings through
                            # unvalidated
                            raise ValueError(
                                "MoveTo before ClosePath in polygon"
                            )
                        # v1: drop the unclosed ring's points
                        del xs[offsets[-1]:], ys[offsets[-1]:]
                    elif len(xs) - offsets[-1] < 2:
                        if not lax:
                            raise ValueError(
                                "linestring part with < 2 points"
                            )
                        del xs[offsets[-1]:], ys[offsets[-1]:]
                    else:
                        offsets.append(len(xs))
                cx += _zigzag_dec_int(int(stream[i]))
                cy += _zigzag_dec_int(int(stream[i + 1]))
                i += 2
                xs.append(cx)
                ys.append(cy)
        elif cmd == LINE_TO:
            # structural checks FIRST — these raise in BOTH versions
            # (a zero-count LineTo in a point geometry or before any
            # MoveTo is still structurally wrong, not v1-degenerate)
            if geom_type == GEOM_POINT:
                raise ValueError("LineTo in point geometry")
            if len(xs) == offsets[-1]:
                # no open part: LineTo at stream start or right after
                # ClosePath would silently anchor at the stale cursor
                raise ValueError("LineTo with no preceding MoveTo")
            if cnt < 1:
                if lax:
                    continue  # v1: zero-count LineTo is a no-op
                raise ValueError("v2: LineTo count must be >= 1")
            if i + 2 * cnt > n:
                raise ValueError("truncated LineTo params")
            if cnt <= _SMALL_CNT:
                # scalar path — modular accumulation is associative, so
                # sequential _wrap_i64 equals the numpy cumsum-with-wrap
                # exactly (incl. int64-extreme inputs; asserted in tests)
                for _ in range(cnt):
                    cx = _wrap_i64(cx + _zigzag_dec_int(int(stream[i])))
                    cy = _wrap_i64(cy + _zigzag_dec_int(int(stream[i + 1])))
                    xs.append(cx)
                    ys.append(cy)
                    i += 2
            else:
                d = stream[i : i + 2 * cnt]
                i += 2 * cnt
                px = np.cumsum(zigzag_decode_np(d[0::2])) + cx
                py = np.cumsum(zigzag_decode_np(d[1::2])) + cy
                xs.extend(px.tolist())
                ys.extend(py.tolist())
                cx, cy = int(px[-1]), int(py[-1])
        elif cmd == CLOSE_PATH:
            if geom_type != GEOM_POLYGON:
                raise ValueError("ClosePath outside polygon")
            if cnt != 1:
                raise ValueError("ClosePath count must be 1")
            if len(xs) - offsets[-1] < 3:
                if not lax:
                    raise ValueError("ring with < 3 points")
                del xs[offsets[-1]:], ys[offsets[-1]:]  # v1: drop ring
            else:
                offsets.append(len(xs))
        else:
            raise ValueError(f"unknown command {cmd}")
    if geom_type == GEOM_LINESTRING and len(xs) > offsets[-1]:
        if len(xs) - offsets[-1] < 2:
            if not lax:
                raise ValueError("linestring part with < 2 points")
            del xs[offsets[-1]:], ys[offsets[-1]:]
        else:
            offsets.append(len(xs))
    if geom_type == GEOM_POLYGON and offsets[-1] != len(xs):
        if not lax:
            raise ValueError("unclosed polygon ring")
        del xs[offsets[-1]:], ys[offsets[-1]:]  # v1: drop trailing ring
    if geom_type == GEOM_POINT:
        # points are one logical part
        offsets = [0, len(xs)]
    return (
        np.array(xs, dtype=np.int64),
        np.array(ys, dtype=np.int64),
        np.array(offsets, dtype=np.int64),
    )


def assemble_polygons(
    xs: np.ndarray, ys: np.ndarray, offsets: np.ndarray
) -> list[list[int]]:
    """Group ring indices into polygons: each exterior (2A>0) takes the
    interior rings (2A<0) that follow it — decoder semantics of
    vector_tile_geometry_decoder.ipp ring assembly."""
    polys: list[list[int]] = []
    for r in range(len(offsets) - 1):
        a2 = signed_area2(
            xs[offsets[r] : offsets[r + 1]], ys[offsets[r] : offsets[r + 1]]
        )
        if a2 > 0 or not polys:
            polys.append([r])
        else:
            polys[-1].append(r)
    return polys
