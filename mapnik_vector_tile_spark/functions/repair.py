"""Invalid-polygon repair — SURVEY.md F12 (round 2).

Reference parity: the reference clips polygons through mapbox/wagyu
(src/vector_tile_geometry_clipper.hpp polygon overloads), which as a
side effect REPAIRS invalid input — self-intersecting ("bowtie") and
self-touching rings come out as simple rings under the even-odd fill
rule. Round 1's documented narrowing assumed valid input rings; this
module closes the common-invalid gap:

- ``decompose_ring`` resolves a self-crossing ring into its simple
  lobes: every proper pairwise edge crossing is computed once and the
  SAME float point is inserted into both edges, then a stack walk pops
  a closed loop whenever a vertex coordinate repeats (the classic
  split-at-repeats decomposition). A bowtie becomes its two triangles;
  a figure-8 that touches at a shared vertex splits there directly.
- ``repair_rings`` maps that over a polygon's rings; downstream the
  encode kernel's existing even-odd containment-depth winding
  normalization (functions.pip.normalize_ring_winding) assigns
  exterior/hole roles to the now-simple rings, which is exactly
  wagyu's even-odd fill semantics for non-overlapping lobes.

- ``_collinear_insertions`` (round 2, closing the former residual
  narrowing) handles collinear-overlap self-intersections — a ring
  doubling back over its own edge, the spike/retrace family proper
  crossings can't see: for every EXACTLY collinear overlapping edge
  pair (adjacent pairs included — a spike is adjacent by
  construction) it inserts each edge's endpoints that lie strictly
  inside the other edge. Inserted coordinates are exact copies of
  existing vertices, so the split-at-repeats walk sees exact repeats,
  pops the doubled-back region as its own lobe, and the zero-area
  filter drops degenerate spikes — wagyu even-odd semantics again.
  Exact-equality collinearity (no epsilon) is deliberate: retraces in
  real data duplicate coordinates bit-for-bit, and a tolerance would
  split valid near-collinear rings.

Everything is per-ring numpy on tiny arrays inside the Arrow-batched
encode kernel — no per-row Python at the DataFrame layer, no shuffle
implications; repair is opt-in (``repair=True``) so the pinned encode
kernel fast path is untouched by default.
"""

from __future__ import annotations

import numpy as np


def _proper_crossings(
    xs: np.ndarray, ys: np.ndarray
) -> list[tuple[int, int, float, float, float, float]]:
    """All proper (strictly interior, transversal) intersections
    between non-adjacent edges of one open ring.

    Returns [(i, j, ti, tj, X, Y)] with i < j, ti/tj the parametric
    positions on edge i/j, and (X, Y) computed ONCE from edge i's
    parametrization so both insertion sites share identical floats.
    Vectorized bbox prefilter over the O(n²) pair set; exact solve on
    the survivors (rings inside tiles are small)."""
    n = len(xs)
    if n < 4:
        return []
    ax, ay = xs, ys
    bx = np.empty(n)
    by = np.empty(n)
    bx[:-1], bx[-1] = xs[1:], xs[0]
    by[:-1], by[-1] = ys[1:], ys[0]
    ii, jj = np.triu_indices(n, k=2)
    # the closing edge (n-1 -> 0) is adjacent to edge 0
    keep = ~((ii == 0) & (jj == n - 1))
    ii, jj = ii[keep], jj[keep]
    if len(ii) == 0:
        return []
    # bbox overlap prefilter
    lo_xi = np.minimum(ax[ii], bx[ii])
    hi_xi = np.maximum(ax[ii], bx[ii])
    lo_yi = np.minimum(ay[ii], by[ii])
    hi_yi = np.maximum(ay[ii], by[ii])
    lo_xj = np.minimum(ax[jj], bx[jj])
    hi_xj = np.maximum(ax[jj], bx[jj])
    lo_yj = np.minimum(ay[jj], by[jj])
    hi_yj = np.maximum(ay[jj], by[jj])
    cand = (
        (lo_xi <= hi_xj)
        & (lo_xj <= hi_xi)
        & (lo_yi <= hi_yj)
        & (lo_yj <= hi_yi)
    )
    ii, jj = ii[cand], jj[cand]
    if len(ii) == 0:
        return []
    d1x, d1y = bx[ii] - ax[ii], by[ii] - ay[ii]
    d2x, d2y = bx[jj] - ax[jj], by[jj] - ay[jj]
    denom = d1x * d2y - d1y * d2x
    cx, cy = ax[jj] - ax[ii], ay[jj] - ay[ii]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(denom != 0, (cx * d2y - cy * d2x) / np.where(denom == 0, 1.0, denom), -1.0)
        u = np.where(denom != 0, (cx * d1y - cy * d1x) / np.where(denom == 0, 1.0, denom), -1.0)
    # STRICT interior: endpoint touches are already coordinate repeats
    # (split_at_repeats handles them); collinear overlap (denom==0) is
    # the documented residual narrowing
    hit = (t > 0.0) & (t < 1.0) & (u > 0.0) & (u < 1.0)
    out = []
    for k in np.nonzero(hit)[0]:
        i, j = int(ii[k]), int(jj[k])
        ti, tj = float(t[k]), float(u[k])
        X = float(ax[i] + ti * d1x[k])
        Y = float(ay[i] + ti * d1y[k])
        out.append((i, j, ti, tj, X, Y))
    return out


def _collinear_insertions(
    xs: np.ndarray, ys: np.ndarray
) -> list[tuple[int, float, float, float]]:
    """Insertion points [(edge, t, X, Y)] that resolve collinear
    partial overlaps: for every pair of EXACTLY collinear edges whose
    spans overlap (adjacent pairs included — a spike doubles back over
    its predecessor), each edge's endpoints strictly interior to the
    other edge are inserted into that edge. (X, Y) are exact copies of
    existing ring vertices, so downstream repeat detection is exact;
    t is float only for insertion ordering along the edge."""
    n = len(xs)
    if n < 3:
        return []
    ax, ay = xs, ys
    bx = np.empty(n)
    by = np.empty(n)
    bx[:-1], bx[-1] = xs[1:], xs[0]
    by[:-1], by[-1] = ys[1:], ys[0]
    ii, jj = np.triu_indices(n, k=1)  # adjacent pairs stay IN
    lo_xi = np.minimum(ax[ii], bx[ii])
    hi_xi = np.maximum(ax[ii], bx[ii])
    lo_yi = np.minimum(ay[ii], by[ii])
    hi_yi = np.maximum(ay[ii], by[ii])
    lo_xj = np.minimum(ax[jj], bx[jj])
    hi_xj = np.maximum(ax[jj], bx[jj])
    lo_yj = np.minimum(ay[jj], by[jj])
    hi_yj = np.maximum(ay[jj], by[jj])
    cand = (
        (lo_xi <= hi_xj)
        & (lo_xj <= hi_xi)
        & (lo_yi <= hi_yj)
        & (lo_yj <= hi_yi)
    )
    ii, jj = ii[cand], jj[cand]
    if len(ii) == 0:
        return []
    d1x, d1y = bx[ii] - ax[ii], by[ii] - ay[ii]
    d2x, d2y = bx[jj] - ax[jj], by[jj] - ay[jj]
    cx, cy = ax[jj] - ax[ii], ay[jj] - ay[ii]
    # same line: parallel AND the connecting vector is parallel too
    col = (d1x * d2y - d1y * d2x == 0.0) & (cx * d1y - cy * d1x == 0.0)
    out: list[tuple[int, float, float, float]] = []
    for k in np.nonzero(col)[0]:
        for e_into, e_from in ((int(ii[k]), int(jj[k])),
                               (int(jj[k]), int(ii[k]))):
            ex0, ey0 = float(ax[e_into]), float(ay[e_into])
            dx, dy = float(bx[e_into] - ex0), float(by[e_into] - ey0)
            dd = dx * dx + dy * dy
            if dd == 0.0:
                continue
            for px, py in (
                (float(ax[e_from]), float(ay[e_from])),
                (float(bx[e_from]), float(by[e_from])),
            ):
                t = ((px - ex0) * dx + (py - ey0) * dy) / dd
                if 0.0 < t < 1.0:
                    out.append((e_into, t, px, py))
    return out


def _insert_crossings(
    xs: np.ndarray, ys: np.ndarray,
    crossings: list[tuple[int, int, float, float, float, float]],
    extra_points: list[tuple[int, float, float, float]] = (),
) -> tuple[np.ndarray, np.ndarray]:
    """Rebuild the ring with every crossing point inserted on BOTH of
    its edges (plus any single-edge extra points, e.g. collinear
    overlap endpoints), ordered along each edge by parametric t
    (deterministic ties by point value)."""
    n = len(xs)
    per_edge: dict[int, list[tuple[float, float, float]]] = {}
    for i, j, ti, tj, X, Y in crossings:
        per_edge.setdefault(i, []).append((ti, X, Y))
        per_edge.setdefault(j, []).append((tj, X, Y))
    for e, t, X, Y in extra_points:
        per_edge.setdefault(e, []).append((t, X, Y))
    nx: list[float] = []
    ny: list[float] = []
    for e in range(n):
        nx.append(float(xs[e]))
        ny.append(float(ys[e]))
        for _, X, Y in sorted(per_edge.get(e, ())):
            # skip an inserted point identical to the edge start (can
            # only happen from float collapse of a near-endpoint hit)
            if X == nx[-1] and Y == ny[-1]:
                continue
            nx.append(X)
            ny.append(Y)
    return np.array(nx), np.array(ny)


def _split_at_repeats(
    xs: np.ndarray, ys: np.ndarray
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Stack walk: push vertices; when a coordinate already on the
    stack repeats, pop the enclosed loop as one simple sub-ring (the
    shared vertex stays on the stack for the remainder). Exact float
    equality is sound because crossings insert the identical pair on
    both edges."""
    stack_x: list[float] = []
    stack_y: list[float] = []
    pos: dict[tuple[float, float], int] = {}
    loops: list[tuple[np.ndarray, np.ndarray]] = []

    def _pop_loop(start: int) -> None:
        lx = stack_x[start:]
        ly = stack_y[start:]
        for k in range(start + 1, len(stack_x)):
            pos.pop((stack_x[k], stack_y[k]), None)
        del stack_x[start + 1 :]
        del stack_y[start + 1 :]
        if len(lx) >= 3:
            loops.append((np.array(lx), np.array(ly)))

    for x, y in zip(xs, ys):
        key = (float(x), float(y))
        if key in pos:
            _pop_loop(pos[key])
            continue
        pos[key] = len(stack_x)
        stack_x.append(float(x))
        stack_y.append(float(y))
    if len(stack_x) >= 3:
        loops.append((np.array(stack_x), np.array(stack_y)))
    return loops


def _dedupe_ring(xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if len(xs) > 1:
        keep = np.empty(len(xs), dtype=bool)
        keep[0] = True
        keep[1:] = (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1])
        xs, ys = xs[keep], ys[keep]
        if len(xs) > 1 and xs[0] == xs[-1] and ys[0] == ys[-1]:
            xs, ys = xs[:-1], ys[:-1]
    return xs, ys


def ring_is_simple(xs: np.ndarray, ys: np.ndarray) -> bool:
    """Validity predicate for the quarantine path: True iff the (open)
    ring has no repeated vertex, no proper edge crossing, and no
    collinear edge overlap."""
    xs, ys = _dedupe_ring(xs, ys)
    if len(xs) < 3:
        return False
    if len({(float(x), float(y)) for x, y in zip(xs, ys)}) != len(xs):
        return False
    return not _proper_crossings(xs, ys) and not _collinear_insertions(
        xs, ys
    )


def decompose_ring(
    xs: np.ndarray, ys: np.ndarray
) -> list[tuple[np.ndarray, np.ndarray]]:
    """One (possibly invalid) open ring -> list of simple open rings
    under even-odd lobe semantics. Valid rings return [(xs, ys)]
    untouched (no copy) — the hot-path cost for valid input is one
    vectorized crossing screen."""
    dx, dy = _dedupe_ring(xs, ys)
    if len(dx) < 3:
        return []
    crossings = _proper_crossings(dx, dy)
    col_pts = _collinear_insertions(dx, dy)
    has_repeat = len({(float(x), float(y)) for x, y in zip(dx, dy)}) != len(dx)
    if not crossings and not col_pts and not has_repeat:
        return [(dx, dy)]
    if crossings or col_pts:
        dx, dy = _insert_crossings(dx, dy, crossings, col_pts)
    loops = _split_at_repeats(dx, dy)
    out = []
    for lx, ly in loops:
        lx, ly = _dedupe_ring(lx, ly)
        if len(lx) < 3:
            continue
        # drop zero-area slivers (fully degenerate lobes)
        a = 0.0
        for i in range(len(lx)):
            j = i + 1 if i + 1 < len(lx) else 0
            a += lx[i] * ly[j] - lx[j] * ly[i]
        if a != 0.0:
            out.append((lx, ly))
    return out


def _lobe_sign(lx: np.ndarray, ly: np.ndarray) -> int:
    """Sign of the lobe's shoelace AS TRAVERSED — its winding-number
    contribution (+1 CCW, −1 CW in world coords)."""
    a = 0.0
    n = len(lx)
    for i in range(n):
        j = i + 1 if i + 1 < n else 0
        a += lx[i] * ly[j] - lx[j] * ly[i]
    return 1 if a > 0 else -1


def _interior_probe(lx: np.ndarray, ly: np.ndarray):
    """A point strictly inside a simple lobe: the vertex centroid if
    the ray test admits it, else the centroid of the first ear whose
    own centroid passes — deterministic, no randomness."""
    from mapnik_vector_tile_spark.functions.pip import points_in_ring

    cx, cy = float(lx.mean()), float(ly.mean())
    if bool(points_in_ring(np.array([cx]), np.array([cy]), lx, ly)[0]):
        return cx, cy
    n = len(lx)
    for i in range(n):
        j = (i + 1) % n
        k = (i + 2) % n
        ex = (lx[i] + lx[j] + lx[k]) / 3.0
        ey = (ly[i] + ly[j] + ly[k]) / 3.0
        if bool(
            points_in_ring(np.array([ex]), np.array([ey]), lx, ly)[0]
        ):
            return ex, ey
    return cx, cy  # degenerate fallback (zero-area lobes are gone)


def repair_rings(
    xs: np.ndarray,
    ys: np.ndarray,
    ring_offsets: np.ndarray,
    fill_rule: str = "even_odd",
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Apply decompose_ring per ring of one polygon; ring order is
    input order then deterministic lobe-extraction order. Winding and
    exterior/hole roles are NOT assigned here — the encode kernel's
    containment-depth normalization downstream handles that for the
    now-simple rings.

    fill_rule (the wagyu option surface; SURVEY F12 flags):
    - "even_odd" (mapnik default): every decomposed lobe is a filled-
      region boundary — keep all (the classic bowtie fills BOTH
      triangles).
    - "positive": OGC winding semantics.  Each lobe keeps its
      as-traversed orientation sign; the winding number just inside
      lobe i is w_in = Σ_j sign_j·[probe_i ∈ lobe_j] and just
      outside w_out = w_in − sign_i.  A lobe is a boundary of the
      filled region {w > 0} iff (w_in > 0) ≠ (w_out > 0) — the kept
      set describes the positive-fill region in even-odd terms, so
      the downstream normalization stays unchanged.  The bowtie's
      negatively-wound triangle is DROPPED — the canonical
      even-odd/positive disagreement, pinned by
      q_engine_clip_repair_pos."""
    if fill_rule not in ("even_odd", "positive"):
        raise ValueError(f"repair_rings: unknown fill_rule {fill_rule!r}")
    ring_offsets = np.asarray(ring_offsets, dtype=np.int64)
    lobes: list[tuple[np.ndarray, np.ndarray]] = []
    for r in range(len(ring_offsets) - 1):
        lobes.extend(
            decompose_ring(
                xs[ring_offsets[r] : ring_offsets[r + 1]],
                ys[ring_offsets[r] : ring_offsets[r + 1]],
            )
        )
    if fill_rule == "positive" and lobes:
        from mapnik_vector_tile_spark.functions.pip import points_in_ring

        signs = [_lobe_sign(lx, ly) for lx, ly in lobes]
        probes = [_interior_probe(lx, ly) for lx, ly in lobes]
        kept = []
        for i, (lx, ly) in enumerate(lobes):
            w_in = 0
            pxp = np.array([probes[i][0]])
            pyp = np.array([probes[i][1]])
            for j, (jx, jy) in enumerate(lobes):
                if j == i or bool(points_in_ring(pxp, pyp, jx, jy)[0]):
                    w_in += signs[j]
            w_out = w_in - signs[i]
            if (w_in > 0) != (w_out > 0):
                kept.append((lx, ly))
        lobes = kept
    out_x: list[np.ndarray] = []
    out_y: list[np.ndarray] = []
    offs = [0]
    for lx, ly in lobes:
        out_x.append(lx)
        out_y.append(ly)
        offs.append(offs[-1] + len(lx))
    if not out_x:
        return np.empty(0), np.empty(0), np.array([0], dtype=np.int64)
    return (
        np.concatenate(out_x),
        np.concatenate(out_y),
        np.array(offs, dtype=np.int64),
    )
