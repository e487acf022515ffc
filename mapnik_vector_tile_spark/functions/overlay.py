"""Constructive polygon boolean union — SURVEY.md F12/U12 (round 2).

Reference parity: the reference repairs and merges polygons through
mapbox/wagyu (src/vector_tile_geometry_clipper.hpp polygon overloads;
wagyu is a Vatti-style integer boolean-clipping engine whose union op
emits the MERGED boundary of overlapping polygons as strictly-simple
rings). Round 1 shipped the grouping half (`joins.dissolve_polygons`:
which polygons merge) and per-ring self-intersection repair
(`functions.repair`); this module closes the remaining narrowing —
the CONSTRUCTIVE half that computes the merged boundary itself.

Semantics (wagyu union, NONZERO fill over the input ring set):

    union region = { p : total winding number of p over ALL input
                         rings > 0 }

Callers pass exterior rings counter-clockwise (positive shoelace) and
hole rings clockwise, exactly wagyu's convention; overlapping inputs,
duplicated inputs, shared/partial collinear edges, T-junctions and
corner touches are all legal. Output is a list of strictly-simple
rings: exteriors CCW (positive signed area), holes CW (negative),
with collinear runs merged, canonically rotated and ordered, so equal
regions produce bit-identical outputs.

Algorithm — classic planar overlay, three stages, all numpy:

1. **Node insertion** (`_insert_nodes`): every proper pairwise edge
   crossing across ALL rings is computed once and the same point
   object lands in both edges; endpoint-on-edge-interior contacts
   (T-junctions, collinear overlaps — both cross-ring and self) insert
   the EXACT endpoint floats, so coincident geometry stays coincident
   bit-for-bit. Axis-parallel edges propagate their fixed coordinate
   exactly (a vertical×horizontal crossing is exactly (x_v, y_h), no
   parametric rounding), which makes the whole pipeline integer-exact
   on rectilinear integer input — the property the SQL oracle twin
   leans on. Near-integer intersections of general edges snap within
   1e-9 so integer-grid diagonals (bowties) key exactly too.

2. **Side classification** (`_classify`): after insertion no segment
   interior meets any other segment, so each undirected split segment
   borders exactly two faces; their winding numbers are sampled at
   midpoint ± 0.25·normal (integer rectilinear input: quarter-integer
   sample coords can never lie on an integer-coordinate axis-parallel
   edge, so the crossing-number evaluation is EXACT; general input
   uses a bbox-scaled epsilon — documented float narrowing).
   A segment survives iff exactly one side has winding > 0, oriented
   filled-side-LEFT; coincident duplicates collapse to one copy
   (the winding sample already accounts for every ring).

3. **Face walk** (`_stitch`): directed survivors are chained start→end
   vertex; at a multi-way vertex the walk takes the MOST
   COUNTER-CLOCKWISE turn from the incoming direction. That rule
   resolves pinch points (two regions meeting at a corner) by
   SPLITTING the filled side — two diagonally-touching squares emit
   two simple rings, never a figure-8 — which is the resolution whose
   ring counts satisfy the subdivision-invariant Euler identity

       n_exterior − n_hole = V − E + F + n_pinch

   on any cell decomposition of the region; the DuckDB oracle twin
   replays exactly that identity on a compressed-coordinate grid.

Scale: this is a per-GROUP kernel (tile-local / dissolve-cluster
geometry is small); distribution happens across groups via
applyInPandas in operators/overlay.py — no shuffle beyond the one
group-by, no driver collect, cost per group O(E² bbox-prefiltered)
with E in the hundreds.
"""

from __future__ import annotations

import numpy as np

_SNAP_EPS = 1e-9


def _rings_to_edges(
    rings: list[tuple[np.ndarray, np.ndarray]],
) -> tuple[np.ndarray, ...]:
    """Flatten rings to directed edge arrays (ax, ay, bx, by, rid, eid)."""
    axs, ays, bxs, bys, rid = [], [], [], [], []
    for r, (xs, ys) in enumerate(rings):
        n = len(xs)
        axs.append(xs)
        ays.append(ys)
        bxs.append(np.roll(xs, -1))
        bys.append(np.roll(ys, -1))
        rid.append(np.full(n, r, dtype=np.int64))
    ax = np.concatenate(axs)
    ay = np.concatenate(ays)
    bx = np.concatenate(bxs)
    by = np.concatenate(bys)
    rr = np.concatenate(rid)
    return ax, ay, bx, by, rr


def _snap(v: float) -> float:
    r = round(v)
    return float(r) if abs(v - r) < _SNAP_EPS else float(v)


def _isect_point(
    ax1: float, ay1: float, dx1: float, dy1: float, t: float,
    ax2: float, ay2: float, dx2: float, dy2: float,
) -> tuple[float, float]:
    """Crossing coords; axis-parallel edges contribute their fixed
    coordinate EXACTLY (no parametric rounding)."""
    if dx1 == 0.0:
        x = ax1
    elif dx2 == 0.0:
        x = ax2
    else:
        x = _snap(ax1 + t * dx1)
    if dy1 == 0.0:
        y = ay1
    elif dy2 == 0.0:
        y = ay2
    else:
        y = _snap(ay1 + t * dy1)
    return x, y


def _insert_nodes(
    rings: list[tuple[np.ndarray, np.ndarray]],
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Split every edge at all crossings / contact points so segment
    interiors are pairwise disjoint. Returns augmented rings."""
    ax, ay, bx, by, rr = _rings_to_edges(rings)
    ne = len(ax)
    dx, dy = bx - ax, by - ay
    # per-edge insertion lists: (param t, x, y)
    ins: list[list[tuple[float, float, float]]] = [[] for _ in range(ne)]

    ii, jj = np.triu_indices(ne, k=1)
    # bbox prefilter
    lo_xi = np.minimum(ax, bx)
    hi_xi = np.maximum(ax, bx)
    lo_yi = np.minimum(ay, by)
    hi_yi = np.maximum(ay, by)
    keep = (
        (lo_xi[ii] <= hi_xi[jj]) & (lo_xi[jj] <= hi_xi[ii])
        & (lo_yi[ii] <= hi_yi[jj]) & (lo_yi[jj] <= hi_yi[ii])
    )
    ii, jj = ii[keep], jj[keep]
    if len(ii):
        d1x, d1y = dx[ii], dy[ii]
        d2x, d2y = dx[jj], dy[jj]
        ex, ey = ax[jj] - ax[ii], ay[jj] - ay[ii]
        den = d1x * d2y - d1y * d2x
        tnum = ex * d2y - ey * d2x
        unum = ex * d1y - ey * d1x
        cross_mask = den != 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(cross_mask, tnum / den, 0.0)
            u = np.where(cross_mask, unum / den, 0.0)
        on1 = cross_mask & (t >= 0.0) & (t <= 1.0)
        on2 = cross_mask & (u >= 0.0) & (u <= 1.0)
        proper = on1 & on2 & (t > 0.0) & (t < 1.0) & (u > 0.0) & (u < 1.0)
        for k in np.flatnonzero(proper):
            i, j = int(ii[k]), int(jj[k])
            x, y = _isect_point(
                ax[i], ay[i], dx[i], dy[i], float(t[k]),
                ax[j], ay[j], dx[j], dy[j],
            )
            ins[i].append((float(t[k]), x, y))
            ins[j].append((float(u[k]), x, y))
        # T-junctions: an ENDPOINT of one edge strictly inside the other
        # (transversal contact, t or u exactly 0/1)
        end1 = on1 & on2 & ((u == 0.0) | (u == 1.0)) & (t > 0.0) & (t < 1.0)
        for k in np.flatnonzero(end1):
            i, j = int(ii[k]), int(jj[k])
            px = ax[j] if u[k] == 0.0 else bx[j]
            py = ay[j] if u[k] == 0.0 else by[j]
            ins[i].append((float(t[k]), float(px), float(py)))
        end2 = on1 & on2 & ((t == 0.0) | (t == 1.0)) & (u > 0.0) & (u < 1.0)
        for k in np.flatnonzero(end2):
            i, j = int(ii[k]), int(jj[k])
            px = ax[i] if t[k] == 0.0 else bx[i]
            py = ay[i] if t[k] == 0.0 else by[i]
            ins[j].append((float(u[k]), float(px), float(py)))
        # collinear overlap: project each endpoint of one edge onto the
        # other when exactly collinear (den == 0 and cross(e, d1) == 0).
        # Zero-length edges (degenerate input) are excluded — with
        # d = (0,0) both tests are vacuously true and the "projection"
        # would splice an off-edge point into an unrelated edge.
        nz1 = (d1x != 0.0) | (d1y != 0.0)
        nz2 = (d2x != 0.0) | (d2y != 0.0)
        coll = (~cross_mask) & (ex * d1y - ey * d1x == 0.0) & nz1 & nz2
        for k in np.flatnonzero(coll):
            i, j = int(ii[k]), int(jj[k])
            for (px, py), tgt, (ox, oy, odx, ody) in (
                ((ax[j], ay[j]), i, (ax[i], ay[i], dx[i], dy[i])),
                ((bx[j], by[j]), i, (ax[i], ay[i], dx[i], dy[i])),
                ((ax[i], ay[i]), j, (ax[j], ay[j], dx[j], dy[j])),
                ((bx[i], by[i]), j, (ax[j], ay[j], dx[j], dy[j])),
            ):
                L2 = odx * odx + ody * ody
                if L2 == 0.0:
                    continue
                tt = ((px - ox) * odx + (py - oy) * ody) / L2
                if 0.0 < tt < 1.0:
                    ins[tgt].append((float(tt), float(px), float(py)))

    # rebuild rings with insertions applied, deduping identical coords
    out: list[tuple[np.ndarray, np.ndarray]] = []
    e0 = 0
    for xs, ys in rings:
        n = len(xs)
        nx: list[float] = []
        nyy: list[float] = []
        for k in range(n):
            nx.append(float(xs[k]))
            nyy.append(float(ys[k]))
            pts = ins[e0 + k]
            if pts:
                for _, px, py in sorted(pts, key=lambda p: p[0]):
                    if (px, py) != (nx[-1], nyy[-1]):
                        nx.append(px)
                        nyy.append(py)
        # closing vertex duplicate of start
        if len(nx) > 1 and (nx[-1], nyy[-1]) == (nx[0], nyy[0]):
            nx.pop()
            nyy.pop()
        out.append((np.asarray(nx), np.asarray(nyy)))
        e0 += n
    return out


def winding_numbers(
    px: np.ndarray,
    py: np.ndarray,
    rings: list[tuple[np.ndarray, np.ndarray]],
) -> np.ndarray:
    """Nonzero winding number of each query point over all rings,
    vectorized (points × edges). Half-open y rule: an upward edge
    contributes on ay <= y < by, downward on by <= y < ay; sample
    points are chosen off every edge so ties never arise."""
    ax, ay, bx, by, _ = _rings_to_edges(rings)
    p_x = np.asarray(px, dtype=np.float64)[:, None]
    p_y = np.asarray(py, dtype=np.float64)[:, None]
    up = (ay[None, :] <= p_y) & (p_y < by[None, :])
    dn = (by[None, :] <= p_y) & (p_y < ay[None, :])
    # side of point vs directed edge: cross((b-a), (p-a))
    cr = (bx - ax)[None, :] * (p_y - ay[None, :]) - (by - ay)[None, :] * (
        p_x - ax[None, :]
    )
    w = (up & (cr > 0)).sum(axis=1) - (dn & (cr < 0)).sum(axis=1)
    return w


def _classify(
    aug: list[tuple[np.ndarray, np.ndarray]],
    inside_fn,
    delta: float,
) -> list[tuple[float, float, float, float]]:
    """Undirected dedupe + side classification of every split segment
    against an arbitrary region predicate ``inside_fn(px, py) -> bool
    array`` (winding-derived for union; a two-set combination for
    intersection/difference/xor). Returns directed kept segments
    (region side on the LEFT)."""
    segs: dict[
        tuple[float, float, float, float], None
    ] = {}
    for xs, ys in aug:
        n = len(xs)
        for k in range(n):
            x1, y1 = float(xs[k]), float(ys[k])
            x2, y2 = float(xs[(k + 1) % n]), float(ys[(k + 1) % n])
            if (x1, y1) == (x2, y2):
                continue
            key = (
                (x1, y1, x2, y2) if (x1, y1) < (x2, y2) else (x2, y2, x1, y1)
            )
            segs[key] = None
    if not segs:
        return []
    arr = np.asarray(list(segs.keys()), dtype=np.float64)
    x1, y1, x2, y2 = arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3]
    mx, my = 0.5 * (x1 + x2), 0.5 * (y1 + y2)
    ddx, ddy = x2 - x1, y2 - y1
    ln = np.hypot(ddx, ddy)
    nx_, ny_ = -ddy / ln, ddx / ln  # unit left normal of p1->p2
    wl = inside_fn(mx + delta * nx_, my + delta * ny_)
    wr = inside_fn(mx - delta * nx_, my - delta * ny_)
    keep = wl != wr
    out = []
    for k in np.flatnonzero(keep):
        if wl[k]:  # region already on the left of p1->p2
            out.append((float(x1[k]), float(y1[k]), float(x2[k]), float(y2[k])))
        else:
            out.append((float(x2[k]), float(y2[k]), float(x1[k]), float(y1[k])))
    return out


def _turn_ang(
    din: tuple[float, float], do: tuple[float, float]
) -> float:
    """CCW turn angle from incoming direction to outgoing direction;
    straight-back (±pi) ranks lowest."""
    ang = float(
        np.arctan2(
            din[0] * do[1] - din[1] * do[0],
            din[0] * do[0] + din[1] * do[1],
        )
    )
    if ang <= -np.pi + 1e-12:
        ang = -np.pi
    return ang


def _stitch(
    dsegs: list[tuple[float, float, float, float]],
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Chain directed segments into closed loops. At a multi-way vertex
    take the MOST counter-clockwise turn from the incoming direction
    (splits pinch points on the filled side — see module doc).

    Returning to the start vertex does NOT unconditionally close the
    loop: closing (i.e. re-taking the start segment's direction) must
    win the same most-CCW comparison against the still-unused outgoing
    segments there. Otherwise a walk that happens to START at a pinch
    vertex whose empty side is pinched (a hole touching the outside
    diagonally) would close early and emit the hole as a spurious
    separate CW ring; the merge-empty resolution is one loop passing
    THROUGH the pinch twice."""
    from collections import defaultdict

    outgoing: dict[tuple[float, float], list[int]] = defaultdict(list)
    for idx, (x1, y1, x2, y2) in enumerate(dsegs):
        outgoing[(x1, y1)].append(idx)
    used = [False] * len(dsegs)
    loops: list[tuple[np.ndarray, np.ndarray]] = []
    for start in range(len(dsegs)):
        if used[start]:
            continue
        path = [start]
        used[start] = True
        x1, y1, x2, y2 = dsegs[start]
        sv = (x1, y1)
        close_dir = (x2 - x1, y2 - y1)
        cur = (x2, y2)
        din = (x2 - x1, y2 - y1)
        ok = True
        while True:
            cands = [c for c in outgoing.get(cur, ()) if not used[c]]
            at_start = cur == sv
            if not cands:
                if at_start:
                    break  # closed loop
                ok = False  # open chain — classification artifact; drop
                break
            best, best_ang = None, None
            if at_start:
                # closing competes with continuing through the vertex
                best_ang = _turn_ang(din, close_dir)
            for c in cands:
                cx1, cy1, cx2, cy2 = dsegs[c]
                ang = _turn_ang(din, (cx2 - cx1, cy2 - cy1))
                if best_ang is None or ang > best_ang:
                    best, best_ang = c, ang
            if best is None:
                break  # closing the loop is the most-CCW turn
            nxt = best
            used[nxt] = True
            path.append(nxt)
            nx1, ny1, nx2, ny2 = dsegs[nxt]
            din = (nx2 - nx1, ny2 - ny1)
            cur = (nx2, ny2)
        if not ok:
            continue
        xs = np.asarray([dsegs[p][0] for p in path])
        ys = np.asarray([dsegs[p][1] for p in path])
        loops.append((xs, ys))
    return loops


def _merge_collinear(
    xs: np.ndarray, ys: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    n = len(xs)
    if n < 3:
        return xs, ys
    px, py = np.roll(xs, 1), np.roll(ys, 1)
    nx_, ny_ = np.roll(xs, -1), np.roll(ys, -1)
    cr = (xs - px) * (ny_ - ys) - (ys - py) * (nx_ - xs)
    dot = (xs - px) * (nx_ - xs) + (ys - py) * (ny_ - ys)
    keep = ~((cr == 0.0) & (dot > 0.0))
    return xs[keep], ys[keep]


def ring_area2(xs: np.ndarray, ys: np.ndarray) -> float:
    """Doubled signed shoelace area (CCW positive)."""
    return float(np.sum(xs * np.roll(ys, -1) - np.roll(xs, -1) * ys))


def _canon_ring(
    xs: np.ndarray, ys: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Rotate to start at the lexicographically smallest vertex."""
    k = np.lexsort((ys, xs))[0]
    return np.roll(xs, -k), np.roll(ys, -k)


def _normalize_rings(
    rings: list[tuple[np.ndarray, np.ndarray]],
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Float64 arrays, consecutive duplicates dropped (including a
    closed-ring repeat of the start vertex — zero-length edges are
    degenerate input), sub-triangle rings removed."""
    norm = []
    for xs, ys in rings:
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        keep = (xs != np.roll(xs, 1)) | (ys != np.roll(ys, 1))
        if not keep.all():
            xs, ys = xs[keep], ys[keep]
        if len(xs) >= 3:
            norm.append((xs, ys))
    return norm


def _auto_delta(rings: list[tuple[np.ndarray, np.ndarray]]) -> float:
    """Side-sample offset: 0.25 is provably tie-free on integer
    rectilinear input; general float input gets a bbox-scaled epsilon
    (documented narrowing)."""
    allx = np.concatenate([r[0] for r in rings])
    ally = np.concatenate([r[1] for r in rings])
    if bool(
        np.all(allx == np.round(allx)) and np.all(ally == np.round(ally))
    ):
        return 0.25
    scale = max(allx.max() - allx.min(), ally.max() - ally.min(), 1.0)
    return 1e-6 * scale


def _extract(
    rings: list[tuple[np.ndarray, np.ndarray]],
    inside_fn,
    delta: float,
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Shared overlay tail: node insertion → side classification
    against ``inside_fn`` → pinch-splitting face walk → canonical
    simple rings."""
    aug = _insert_nodes(rings)
    dsegs = _classify(aug, inside_fn, delta)
    loops = _stitch(dsegs)
    out = []
    for xs, ys in loops:
        xs, ys = _merge_collinear(xs, ys)
        if len(xs) >= 3 and ring_area2(xs, ys) != 0.0:
            out.append(_canon_ring(xs, ys))
    out.sort(key=lambda r: (float(r[0][0]), float(r[1][0]), -ring_area2(*r)))
    return out


def union_rings(
    rings: list[tuple[np.ndarray, np.ndarray]],
    delta: float | None = None,
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Nonzero-fill boolean union of a ring set → canonical simple
    rings (exterior CCW / positive area first by position, holes CW)."""
    rings = _normalize_rings(rings)
    if not rings:
        return []
    if delta is None:
        delta = _auto_delta(rings)
    return _extract(
        rings, lambda px, py: winding_numbers(px, py, rings) > 0, delta
    )


# two-set boolean region predicates (wagyu/Clipper op set; A and B are
# each nonzero-filled first, matching clip_to_box/intersect semantics)
BOOLEAN_OPS = {
    "union": lambda a, b: a | b,
    "intersection": lambda a, b: a & b,
    "difference": lambda a, b: a & ~b,
    "xor": lambda a, b: a != b,
}


def boolean_rings(
    rings_a: list[tuple[np.ndarray, np.ndarray]],
    rings_b: list[tuple[np.ndarray, np.ndarray]],
    op: str,
    delta: float | None = None,
) -> list[tuple[np.ndarray, np.ndarray]]:
    """General two-set boolean op (union/intersection/difference/xor)
    between nonzero-filled ring sets A and B — the full wagyu/Clipper
    op family; ``intersection`` is exactly the reference clipper's
    polygon∩clip-box operation generalized to arbitrary clip shapes.
    Same output conventions as union_rings."""
    fn = BOOLEAN_OPS[op]
    rings_a = _normalize_rings(rings_a)
    rings_b = _normalize_rings(rings_b)
    if not rings_a and not rings_b:
        return []
    both = rings_a + rings_b
    if delta is None:
        delta = _auto_delta(both)

    def inside(px, py):
        ia = (
            winding_numbers(px, py, rings_a) > 0
            if rings_a
            else np.zeros(len(px), bool)
        )
        ib = (
            winding_numbers(px, py, rings_b) > 0
            if rings_b
            else np.zeros(len(px), bool)
        )
        return fn(ia, ib)

    return _extract(both, inside, delta)


def rings_stats(
    out: list[tuple[np.ndarray, np.ndarray]],
) -> tuple[int, int, int, int, int]:
    """Integer summary of an overlay result on rectilinear-integer
    input: (area2, manhattan perimeter, n_vertices, n_ext − n_hole,
    vhash). vhash = Σ over output vertices of
    (x·73856093 + y·19349663) mod 2³¹ — a multiset hash the SQL twin
    reproduces from corner patterns."""
    area2 = 0
    perim = 0
    n_vert = 0
    euler = 0
    vhash = 0
    for xs, ys in out:
        a2 = ring_area2(xs, ys)
        area2 += int(round(a2))
        euler += 1 if a2 > 0 else -1
        n_vert += len(xs)
        perim += int(
            round(
                np.sum(np.abs(np.diff(np.append(xs, xs[0]))))
                + np.sum(np.abs(np.diff(np.append(ys, ys[0]))))
            )
        )
        xi = np.round(xs).astype(np.int64)
        yi = np.round(ys).astype(np.int64)
        vhash += int(((xi * 73856093 + yi * 19349663) % (1 << 31)).sum())
    return area2, perim, n_vert, euler, vhash


def union_stats(
    rings: list[tuple[np.ndarray, np.ndarray]],
) -> tuple[int, int, int, int, int]:
    return rings_stats(union_rings(rings))


def boolean_stats(
    rings_a: list[tuple[np.ndarray, np.ndarray]],
    rings_b: list[tuple[np.ndarray, np.ndarray]],
    op: str,
) -> tuple[int, int, int, int, int]:
    return rings_stats(boolean_rings(rings_a, rings_b, op))


def convex_hull(
    xs: np.ndarray, ys: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Convex hull of a point set — Andrew's monotone chain with STRICT
    turns (collinear boundary points excluded), CCW orientation,
    starting at the lexicographically smallest vertex. Integer-exact:
    the only arithmetic is the integer cross product, so the DuckDB
    gift-wrapping twin (which pins the identical strict-turn /
    farthest-collinear convention) reproduces the vertex set exactly.
    Degenerate inputs: 1 point -> 1 vertex, all-collinear -> the two
    extreme vertices."""
    pts = sorted(set(zip(xs.tolist(), ys.tolist())))
    if len(pts) <= 2:
        hx = np.array([p[0] for p in pts], dtype=np.int64)
        hy = np.array([p[1] for p in pts], dtype=np.int64)
        return hx, hy

    def _half(seq):
        h: list[tuple[int, int]] = []
        for p in seq:
            while (
                len(h) >= 2
                and (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])
                <= 0
            ):
                h.pop()
            h.append(p)
        return h

    lower = _half(pts)
    upper = _half(reversed(pts))
    hull = lower[:-1] + upper[:-1]
    return (
        np.array([p[0] for p in hull], dtype=np.int64),
        np.array([p[1] for p in hull], dtype=np.int64),
    )


def hull_stats(
    xs: np.ndarray, ys: np.ndarray
) -> tuple[int, int, int, int, int]:
    """(n_pts_distinct, n_hull, area2, perim_manhattan, vhash) of the
    convex hull, treating the hull as a CLOSED ring (a 2-vertex hull
    counts its one edge twice — the same wraparound the SQL twin's
    (step+1) % n join applies; a 1-vertex hull contributes zero)."""
    n_pts = len(set(zip(xs.tolist(), ys.tolist())))
    hx, hy = convex_hull(xs, ys)
    n_hull = len(hx)
    nx_, ny_ = np.roll(hx, -1), np.roll(hy, -1)
    area2 = int((hx * ny_ - nx_ * hy).sum()) if n_hull >= 2 else 0
    perim = (
        int((np.abs(nx_ - hx) + np.abs(ny_ - hy)).sum())
        if n_hull >= 2
        else 0
    )
    vhash = int(((hx * 73856093 + hy * 19349663) % (1 << 31)).sum())
    return n_pts, n_hull, area2, perim, vhash


def line_graph_stats(
    x1: np.ndarray, y1: np.ndarray, x2: np.ndarray, y2: np.ndarray
) -> tuple[int, int, int, int, int]:
    """Line-merge summary of an undirected segment set — JTS
    LineMerger semantics (merge where exactly two line ends meet;
    degree-1 tips and degree>=3 junctions break chains):

      (n_segs, n_chains, n_rings, manhattan_len, jhash)

    n_segs counts canonical undirected segments (duplicates and
    zero-length dropped); n_chains = sum of degrees over deg!=2
    vertices / 2 (every maximal open chain has exactly two ends, each
    anchored at a deg!=2 vertex); n_rings = connected components whose
    every vertex has degree 2 (pure cycles, which LineMerger emits as
    closed lines); jhash = sum over deg!=2 vertices of
    deg * ((x*73856093 + y*19349663) mod 2^31) — chain-break positions
    weighted by how many chains they anchor. Components via vectorized
    min-label propagation with pointer jumping (numpy, no per-edge
    Python loop)."""
    a = np.stack([x1, y1], axis=1).astype(np.int64)
    b = np.stack([x2, y2], axis=1).astype(np.int64)
    lo = np.where(
        (a[:, 0] < b[:, 0])
        | ((a[:, 0] == b[:, 0]) & (a[:, 1] <= b[:, 1])),
        True,
        False,
    )
    p = np.where(lo[:, None], a, b)
    q = np.where(lo[:, None], b, a)
    segs = np.unique(np.concatenate([p, q], axis=1), axis=0)
    keep = (segs[:, 0] != segs[:, 2]) | (segs[:, 1] != segs[:, 3])
    segs = segs[keep]
    n_segs = len(segs)
    if n_segs == 0:
        return 0, 0, 0, 0, 0
    mlen = int(
        (
            np.abs(segs[:, 2] - segs[:, 0]) + np.abs(segs[:, 3] - segs[:, 1])
        ).sum()
    )
    ends = np.concatenate([segs[:, :2], segs[:, 2:]], axis=0)
    verts, inv = np.unique(ends, axis=0, return_inverse=True)
    ia, ib = inv[:n_segs], inv[n_segs:]
    deg = np.bincount(inv, minlength=len(verts))
    brk = deg != 2
    n_chains = int(deg[brk].sum()) // 2
    jhash = int(
        (
            deg[brk]
            * ((verts[brk, 0] * 73856093 + verts[brk, 1] * 19349663)
               % (1 << 31))
        ).sum()
    )
    lbl = np.arange(len(verts), dtype=np.int64)
    while True:
        new = lbl.copy()
        np.minimum.at(new, ia, lbl[ib])
        np.minimum.at(new, ib, lbl[ia])
        new = new[new]  # pointer jumping
        if (new == lbl).all():
            break
        lbl = new
    # a component is a ring iff it contains no chain-break vertex
    has_break = np.zeros(len(verts), dtype=bool)
    np.maximum.at(has_break, lbl, brk)
    n_rings = int(np.unique(lbl[~has_break[lbl]]).size)
    return n_segs, n_chains, n_rings, mlen, jhash


def dilate_rings(
    rings: list[tuple[np.ndarray, np.ndarray]], r: int
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Chebyshev (square structuring element) dilation of a nonzero-
    filled RECTILINEAR ring set by integer radius r — the ST_Buffer
    analog on the integer grid (square caps/joins). Minkowski sum with
    the square decomposes exactly as region ∪ (edge ⊕ square) per
    boundary edge, and for an axis-parallel edge the summand is just
    its bbox inflated by r — so the whole dilation is one union_rings
    over the original rings plus one rect per edge. Rectilinear-input
    contract (diagonal edges would over-cover under bbox inflation),
    consistent with the module's integer-exactness story."""
    if r <= 0:
        return union_rings(rings)
    out = list(rings)
    for xs, ys in rings:
        bx, by = np.roll(xs, -1), np.roll(ys, -1)
        for x1, y1, x2, y2 in zip(xs, ys, bx, by):
            lo_x, hi_x = min(x1, x2) - r, max(x1, x2) + r
            lo_y, hi_y = min(y1, y2) - r, max(y1, y2) + r
            out.append(
                (
                    np.array([lo_x, hi_x, hi_x, lo_x], dtype=np.float64),
                    np.array([lo_y, lo_y, hi_y, hi_y], dtype=np.float64),
                )
            )
    return union_rings(out)


def erode_rings(
    rings: list[tuple[np.ndarray, np.ndarray]], r: int
) -> list[tuple[np.ndarray, np.ndarray]]:
    """Chebyshev erosion by integer radius r via the complement
    identity erode(A) = F ∖ dilate(F ∖ A), with the frame F = bbox(A)
    inflated by r+1 so the artificial frame boundary's dilation can
    never reach A. Complement representation under nonzero fill is
    free: the frame ring CCW plus A's rings with orientation flipped."""
    # canonicalize FIRST: the complement trick inflates every ring
    # edge, so edges must all be genuine region boundary — overlapping
    # raw inputs have edges buried inside the union whose inflation
    # would eat into the region from the inside
    rings = union_rings(rings)
    if not rings:
        return []
    if r <= 0:
        return rings
    allx = np.concatenate([xs for xs, _ in rings])
    ally = np.concatenate([ys for _, ys in rings])
    lo_x, hi_x = allx.min() - r - 1, allx.max() + r + 1
    lo_y, hi_y = ally.min() - r - 1, ally.max() + r + 1
    frame = (
        np.array([lo_x, hi_x, hi_x, lo_x], dtype=np.float64),
        np.array([lo_y, lo_y, hi_y, hi_y], dtype=np.float64),
    )
    comp = [frame] + [(xs[::-1].copy(), ys[::-1].copy()) for xs, ys in rings]
    dil_comp = dilate_rings(comp, r)
    return boolean_rings([frame], dil_comp, "difference")


def morphology_stats(
    rings: list[tuple[np.ndarray, np.ndarray]], r: int, op: str
) -> tuple[int, int, int, int, int]:
    """Integer grid stats of dilate/erode/open/close at radius r —
    open = dilate∘erode (removes slivers thinner than 2r), close =
    erode∘dilate (fills gaps narrower than 2r)."""
    if op == "dilate":
        out = dilate_rings(rings, r)
    elif op == "erode":
        out = erode_rings(rings, r)
    elif op == "open":
        out = dilate_rings(erode_rings(rings, r), r)
    elif op == "close":
        out = erode_rings(dilate_rings(rings, r), r)
    else:
        raise ValueError(f"morphology_stats: unknown op {op!r}")
    return rings_stats(out)
