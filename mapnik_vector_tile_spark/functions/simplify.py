"""Douglas-Peucker simplification — SURVEY.md F9.

Reference parity: src/vector_tile_douglas_peucker.hpp (itself adapted
from boost::geometry's implementation): squared perpendicular distance
against a squared tolerance, endpoints always preserved, applied only
when simplify_distance > 0, operating on quantized integer tile coords.

Iterative explicit-stack form (no recursion limits), numpy distance
kernel per span.
"""

from __future__ import annotations

import numpy as np


def _seg_dist2(
    xs: np.ndarray, ys: np.ndarray, ax: float, ay: float, bx: float, by: float
) -> np.ndarray:
    """Squared distance of points to segment (a, b) — the 'comparable
    distance' boost::geometry uses (projection clamped to the segment)."""
    dx, dy = bx - ax, by - ay
    l2 = dx * dx + dy * dy
    if l2 == 0.0:
        return (xs - ax) ** 2 + (ys - ay) ** 2
    t = ((xs - ax) * dx + (ys - ay) * dy) / l2
    t = np.clip(t, 0.0, 1.0)
    px = ax + t * dx
    py = ay + t * dy
    return (xs - px) ** 2 + (ys - py) ** 2


def douglas_peucker(
    xs: np.ndarray, ys: np.ndarray, tolerance: float
) -> np.ndarray:
    """Boolean keep-mask for one part. tolerance is in coordinate units
    (NOT squared); endpoints always kept."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[-1] = True
    if n <= 2 or tolerance <= 0:
        keep[:] = tolerance <= 0
        keep[0] = keep[-1] = True
        return keep
    tol2 = float(tolerance) * float(tolerance)
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        d2 = _seg_dist2(xs[a + 1 : b], ys[a + 1 : b], xs[a], ys[a], xs[b], ys[b])
        i = int(np.argmax(d2))
        if d2[i] > tol2:
            m = a + 1 + i
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return keep


def radial_distance(
    xs: np.ndarray, ys: np.ndarray, tolerance: float
) -> np.ndarray:
    """Boolean keep-mask for one part — the reference's cheap
    simplify strategy (include/mapnik/simplify_converter.hpp,
    radial_distance): keep the first vertex, then keep each vertex
    whose squared distance from the LAST KEPT vertex exceeds
    tolerance²; the final vertex is always emitted. Pure integer
    compares when fed quantized tile coords, so cross-engine
    bit-exact. Sequential by definition (each decision depends on the
    previous kept vertex) — a per-vertex Python loop like the
    reference's; parts are tile-local (already clipped), so the loop
    is bounded by per-tile vertex counts, not the feature."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = True
    if n <= 2 or tolerance <= 0:
        keep[:] = tolerance <= 0
        keep[0] = keep[-1] = True
        return keep
    tol2 = float(tolerance) * float(tolerance)
    lx, ly = float(xs[0]), float(ys[0])
    for i in range(1, n):
        dx = float(xs[i]) - lx
        dy = float(ys[i]) - ly
        if dx * dx + dy * dy > tol2:
            keep[i] = True
            lx, ly = float(xs[i]), float(ys[i])
    keep[-1] = True
    return keep


def visvalingam_whyatt(
    xs: np.ndarray, ys: np.ndarray, tolerance: float
) -> np.ndarray:
    """Boolean keep-mask — the reference's THIRD strategy
    (include/mapnik/simplify_converter.hpp, visvalingam_whyatt):
    repeatedly drop the interior vertex whose effective triangle area
    is the smallest, while that area is below ``tolerance``
    (interpreted as an AREA in coordinate-unit² — mapnik's one-knob
    convention: each strategy reads simplify_tolerance in its own
    units), recomputing the two neighbors' areas after each drop.

    Exactness: compares DOUBLED areas (|cross product|) against
    2·tolerance, so quantized integer tile coords never divide and the
    decision chain is bit-exact cross-engine. Ties (equal minimal
    doubled area) drop the LOWEST index first — np.argmin's
    first-minimum rule, replayed by the twin's list_position (both
    return the first occurrence). Endpoints always kept. O(n²) scan
    per part — parts are tile-local (already clipped), so n is
    bounded by per-tile vertex counts and the scan beats heap
    bookkeeping at these sizes."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = len(xs)
    if n == 0:
        return np.zeros(0, dtype=bool)
    if n <= 2 or tolerance <= 0:
        keep = np.full(n, tolerance <= 0)
        keep[0] = keep[-1] = True
        return keep
    thr2 = 2.0 * float(tolerance)
    prev = np.arange(n) - 1
    nxt = np.arange(n) + 1
    alive = np.ones(n, dtype=bool)

    def area2(i: int) -> float:
        a, b = prev[i], nxt[i]
        return abs(
            (xs[i] - xs[a]) * (ys[b] - ys[a])
            - (ys[i] - ys[a]) * (xs[b] - xs[a])
        )

    areas = np.full(n, np.inf)
    for i in range(1, n - 1):
        areas[i] = area2(i)
    while True:
        cand = np.where(alive)[0][1:-1]  # interior survivors
        if not len(cand):
            break
        k = int(cand[np.argmin(areas[cand])])  # first min = lowest idx
        if areas[k] >= thr2:
            break
        alive[k] = False
        a, b = int(prev[k]), int(nxt[k])
        nxt[a] = b
        prev[b] = a
        if a != 0:
            areas[a] = area2(a)
        if b != n - 1:
            areas[b] = area2(b)
    return alive


STRATEGIES = {
    "douglas-peucker": douglas_peucker,
    "radial-distance": radial_distance,
    "visvalingam-whyatt": visvalingam_whyatt,
}


def simplify_part(
    xs: np.ndarray,
    ys: np.ndarray,
    tolerance: float,
    strategy: str = "douglas-peucker",
) -> tuple[np.ndarray, np.ndarray]:
    mask = STRATEGIES[strategy](xs, ys, tolerance)
    return np.asarray(xs)[mask], np.asarray(ys)[mask]


def simplify_rings(
    xs: np.ndarray,
    ys: np.ndarray,
    offsets: np.ndarray,
    tolerance: float,
    closed: bool,
    strategy: str = "douglas-peucker",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Simplify each part/ring independently. For closed rings the
    closing vertex is appended before DP and stripped after (endpoint
    preservation then applies to the ring seam, matching the reference's
    treatment of rings as closed paths). Rings that collapse (<3 pts)
    are dropped; line parts (<2 pts) are dropped.

    Hole orphan rule (closed mode): when an EXTERIOR ring (positive
    shoelace in y-down coords) collapses, its trailing interior rings
    are dropped with it — the decoder assembles each exterior with the
    holes that follow, so a surviving orphan hole would be punched
    into the WRONG polygon (or lead the feature as an invalid first
    ring)."""
    offsets = np.asarray(offsets, dtype=np.int64)
    ox: list[np.ndarray] = []
    oy: list[np.ndarray] = []
    offs = [0]
    min_pts = 3 if closed else 2
    exterior_alive = True
    for r in range(len(offsets) - 1):
        px = np.asarray(xs[offsets[r] : offsets[r + 1]], dtype=np.float64)
        py = np.asarray(ys[offsets[r] : offsets[r + 1]], dtype=np.float64)
        if closed:
            from mapnik_vector_tile_spark.functions.clip import (
                ring_signed_area2_f,
            )

            is_exterior = ring_signed_area2_f(px, py) > 0
            if not is_exterior and not exterior_alive:
                continue  # hole of a collapsed exterior
        if closed and len(px) >= 3:
            cx = np.concatenate((px, px[:1]))
            cy = np.concatenate((py, py[:1]))
            sx, sy = simplify_part(cx, cy, tolerance, strategy)
            sx, sy = sx[:-1], sy[:-1]
        else:
            sx, sy = simplify_part(px, py, tolerance, strategy)
        if len(sx) < min_pts:
            if closed and is_exterior:
                exterior_alive = False
            continue
        if closed and is_exterior:
            exterior_alive = True
        ox.append(sx)
        oy.append(sy)
        offs.append(offs[-1] + len(sx))
    if not ox:
        return np.empty(0), np.empty(0), np.array([0], dtype=np.int64)
    return np.concatenate(ox), np.concatenate(oy), np.array(offs, dtype=np.int64)
