"""Geometry clipping against the buffered tile box — SURVEY.md F10-F12.

Reference parity: src/vector_tile_geometry_clipper.hpp. The reference
clips lines via boost::geometry::intersection and polygons via
mapbox/wagyu general boolean ops; because our clip target is always an
AXIS-ALIGNED BOX and inputs are valid rings, box-specific algorithms
(Liang-Barsky for lines, Sutherland-Hodgman per ring for polygons) give
identical results — this is the one intentional semantic narrowing
documented in SURVEY.md F12.

All clipping runs in world/double coordinates BEFORE quantization, as
the reference does (transform -> clip -> simplify -> encode order from
vector_tile_processor.ipp create_geom_layer).
"""

from __future__ import annotations

import numpy as np


def clip_points(
    xs: np.ndarray, ys: np.ndarray, x0: float, y0: float, x1: float, y1: float
) -> tuple[np.ndarray, np.ndarray]:
    """F10: keep points inside the (closed) box."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    keep = (xs >= x0) & (xs <= x1) & (ys >= y0) & (ys <= y1)
    return xs[keep], ys[keep]


def clip_line(
    xs: np.ndarray, ys: np.ndarray, x0: float, y0: float, x1: float, y1: float
) -> list[tuple[np.ndarray, np.ndarray]]:
    """F11: Liang-Barsky parametric clip of one polyline against a box,
    splitting into multiple parts at exits/entries. Vectorized over
    segments; part stitching in a single pass.

    Entry/exit vertices are computed in doubles and quantized later —
    the parity contract from SURVEY.md F11.
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = len(xs)
    if n < 2:
        return []
    ax, ay = xs[:-1], ys[:-1]
    bx, by = xs[1:], ys[1:]
    dx, dy = bx - ax, by - ay

    # parametric window [t0, t1] per segment against the 4 half-planes
    t0 = np.zeros(n - 1)
    t1 = np.ones(n - 1)
    for p, q in (
        (-dx, ax - x0),
        (dx, x1 - ax),
        (-dy, ay - y0),
        (dy, y1 - ay),
    ):
        with np.errstate(divide="ignore", invalid="ignore"):
            r = np.where(p != 0, q / np.where(p == 0, 1.0, p), 0.0)
        ent = (p < 0) & (r > t0)
        t0 = np.where(ent, r, t0)
        ext = (p > 0) & (r < t1)
        t1 = np.where(ext, r, t1)
        # parallel & outside: p == 0 and q < 0 -> reject
        rej = (p == 0) & (q < 0)
        t0 = np.where(rej, 2.0, t0)  # t0 > t1 marks rejection

    visible = t0 <= t1
    out: list[tuple[np.ndarray, np.ndarray]] = []
    cur_x: list[float] = []
    cur_y: list[float] = []
    for i in range(n - 1):
        if not visible[i]:
            if len(cur_x) >= 2:
                out.append((np.array(cur_x), np.array(cur_y)))
            cur_x, cur_y = [], []
            continue
        sx = ax[i] + t0[i] * dx[i]
        sy = ay[i] + t0[i] * dy[i]
        ex = ax[i] + t1[i] * dx[i]
        ey = ay[i] + t1[i] * dy[i]
        starts_fresh = t0[i] > 0 or not cur_x
        if starts_fresh and cur_x:
            if len(cur_x) >= 2:
                out.append((np.array(cur_x), np.array(cur_y)))
            cur_x, cur_y = [], []
        if not cur_x:
            cur_x, cur_y = [sx], [sy]
        cur_x.append(ex)
        cur_y.append(ey)
        if t1[i] < 1.0:  # exits the box: close the part
            if len(cur_x) >= 2:
                out.append((np.array(cur_x), np.array(cur_y)))
            cur_x, cur_y = [], []
    if len(cur_x) >= 2:
        out.append((np.array(cur_x), np.array(cur_y)))
    return out


def _rot1(a: np.ndarray) -> np.ndarray:
    """a rotated left by one (np.roll(a, -1) without its ~8µs/call
    normalize/transpose overhead — measured 10x faster on the tiny
    rings this module lives on)."""
    out = np.empty_like(a)
    out[:-1] = a[1:]
    out[-1] = a[0]
    return out


def clip_ring(
    xs: np.ndarray, ys: np.ndarray, x0: float, y0: float, x1: float, y1: float
) -> tuple[np.ndarray, np.ndarray]:
    """F12: Sutherland-Hodgman clip of one ring against the box. Input
    ring open (no duplicate closing vertex); output open ring, possibly
    empty. Box-clip of a valid ring yields a valid ring.

    Fast paths (value-identical to the edge passes, which are the hot
    cost of the whole encode pipeline): a ring whose bbox lies inside
    the box passes S-H untouched (every vertex inside for all four
    edges, no intersections), and a ring whose bbox misses the box on
    some axis is emptied by that axis's pass (every vertex outside one
    half-plane) — both reduce to four min/max compares."""
    px = np.asarray(xs, dtype=np.float64)
    py = np.asarray(ys, dtype=np.float64)
    if len(px) >= 3:
        rx0, rx1 = px.min(), px.max()
        ry0, ry1 = py.min(), py.max()
        if rx1 < x0 or rx0 > x1 or ry1 < y0 or ry0 > y1:
            return np.empty(0), np.empty(0)
        if rx0 >= x0 and rx1 <= x1 and ry0 >= y0 and ry1 <= y1:
            return _finish_ring(px, py)
    # (inside predicate, intersection solver) per box edge
    edges = (
        (lambda x, y: x >= x0, "x", x0),
        (lambda x, y: x <= x1, "x", x1),
        (lambda x, y: y >= y0, "y", y0),
        (lambda x, y: y <= y1, "y", y1),
    )
    for inside, axis, v in edges:
        if len(px) == 0:
            break
        qx = _rot1(px)
        qy = _rot1(py)
        pin = inside(px, py)
        qin = inside(qx, qy)
        # intersection of each edge (p->q) with the clip line
        with np.errstate(divide="ignore", invalid="ignore"):
            if axis == "x":
                t = np.where(qx != px, (v - px) / np.where(qx == px, 1.0, qx - px), 0.0)
                ix = np.full_like(px, v)
                iy = py + t * (qy - py)
            else:
                t = np.where(qy != py, (v - py) / np.where(qy == py, 1.0, qy - py), 0.0)
                iy = np.full_like(py, v)
                ix = px + t * (qx - px)
        nx: list[float] = []
        ny: list[float] = []
        for i in range(len(px)):
            if pin[i]:
                nx.append(px[i])
                ny.append(py[i])
                if not qin[i]:
                    nx.append(ix[i])
                    ny.append(iy[i])
            elif qin[i]:
                nx.append(ix[i])
                ny.append(iy[i])
        px = np.array(nx, dtype=np.float64)
        py = np.array(ny, dtype=np.float64)
    return _finish_ring(px, py)


def _finish_ring(
    px: np.ndarray, py: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    # dedupe consecutive duplicates introduced by corner touches
    if len(px) > 1:
        keep = np.empty(len(px), dtype=bool)
        keep[0] = True
        keep[1:] = (px[1:] != px[:-1]) | (py[1:] != py[:-1])
        # also drop a last point equal to the first (open-ring form)
        px, py = px[keep], py[keep]
        if len(px) > 1 and px[0] == px[-1] and py[0] == py[-1]:
            px, py = px[:-1], py[:-1]
    if len(px) < 3:
        return np.empty(0), np.empty(0)
    return px, py


def ring_signed_area2_f(xs: np.ndarray, ys: np.ndarray) -> float:
    """Float shoelace (world coords) for pre-quantize area thresholding;
    same orientation convention as geomcodec.signed_area2.

    Small-ring path sums terms SEQUENTIALLY; numpy's pairwise/unrolled
    np.sum can differ in the last ulp for n in (2, 128). That only
    matters when |2A| sits within an ulp of 2*area_threshold — not a
    pinned behavior (thresholds are user coarse knobs); kernel-bench
    byte-identity over the corpus confirms no actual output change."""
    n = len(xs)
    if n < 3:
        return 0.0
    if n <= 16:
        s = 0.0
        for i in range(n):
            j = i + 1 if i + 1 < n else 0
            s += float(xs[i]) * float(ys[j]) - float(xs[j]) * float(ys[i])
        return s
    x2 = _rot1(xs)
    y2 = _rot1(ys)
    return float(np.sum(xs * y2 - x2 * ys))


def clip_polygon(
    xs: np.ndarray,
    ys: np.ndarray,
    ring_offsets: np.ndarray,
    x0: float,
    y0: float,
    x1: float,
    y1: float,
    area_threshold: float = 0.0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Clip every ring, drop rings under |2A| <= 2*area_threshold, keep
    exterior-first order. Returns flat (xs, ys, ring_offsets)."""
    out_x: list[np.ndarray] = []
    out_y: list[np.ndarray] = []
    offs = [0]
    ring_offsets = np.asarray(ring_offsets, dtype=np.int64)
    for r in range(len(ring_offsets) - 1):
        rx = xs[ring_offsets[r] : ring_offsets[r + 1]]
        ry = ys[ring_offsets[r] : ring_offsets[r + 1]]
        cx, cy = clip_ring(rx, ry, x0, y0, x1, y1)
        if len(cx) == 0:
            continue
        if abs(ring_signed_area2_f(cx, cy)) <= 2.0 * area_threshold:
            continue
        out_x.append(cx)
        out_y.append(cy)
        offs.append(offs[-1] + len(cx))
    if not out_x:
        return np.empty(0), np.empty(0), np.array([0], dtype=np.int64)
    return (
        np.concatenate(out_x),
        np.concatenate(out_y),
        np.array(offs, dtype=np.int64),
    )


def drop_small_rings(
    px: np.ndarray,
    py: np.ndarray,
    ring_offsets: np.ndarray,
    area_threshold: float,
    area2_fn,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Reference ``area_threshold`` semantics (processor option, applied
    inside the wagyu clip in src/vector_tile_geometry_clipper.hpp):
    drop any ring whose |area| in TILE units is < area_threshold.
    Hole orphan rule (same as simplify.simplify_rings): when an
    EXTERIOR ring (positive area post-winding-normalize) is dropped,
    its trailing interior rings go with it — the decoder assembles
    each exterior with the holes that FOLLOW it, so a surviving orphan
    hole would lead the feature as an invalid first ring or be punched
    into the preceding, unrelated polygon.

    ``area2_fn(xs, ys) -> 2A`` signed shoelace (int tile coords), so
    the compare is |2A| < 2*threshold — exact in int64, no float area.
    (Units note: clip_polygon's same-named parameter is a WORLD-coord
    float ``<=`` compare at clip time; THIS one is the reference
    processor's tile-unit knob. Don't unify them.)
    """
    ring_offsets = np.asarray(ring_offsets, dtype=np.int64)
    out_x: list[np.ndarray] = []
    out_y: list[np.ndarray] = []
    offs = [0]
    exterior_alive = True
    for r in range(len(ring_offsets) - 1):
        rx = px[ring_offsets[r] : ring_offsets[r + 1]]
        ry = py[ring_offsets[r] : ring_offsets[r + 1]]
        a2 = area2_fn(rx, ry)
        is_exterior = a2 > 0
        if is_exterior:
            exterior_alive = abs(a2) >= 2.0 * area_threshold
            if not exterior_alive:
                continue
        elif not exterior_alive or abs(a2) < 2.0 * area_threshold:
            continue
        out_x.append(rx)
        out_y.append(ry)
        offs.append(offs[-1] + len(rx))
    if not out_x:
        return (
            np.empty(0, dtype=px.dtype),
            np.empty(0, dtype=py.dtype),
            np.array([0], dtype=np.int64),
        )
    return (
        np.concatenate(out_x),
        np.concatenate(out_y),
        np.array(offs, dtype=np.int64),
    )
