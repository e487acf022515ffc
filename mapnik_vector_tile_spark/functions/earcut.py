"""Ear-clipping polygon triangulation on exact integer coordinates —
the rendering-side primitive the Mapbox vector-tile ecosystem ships as
`mapbox/earcut` (every MVT polygon a GPU renderer draws goes through
it).  Re-expressed here as a deterministic exact-arithmetic kernel so
a DuckDB twin can replay it step for step.

Pinned convention (identical in the SQL twin, q_earcut):

- input: one simple CCW ring as parallel int arrays (no closing
  repeat); output: (a, b, c) 0-based ring-index triples, CCW.
- scan the ACTIVE vertex list from position 0 each round; the first
  position whose corner qualifies is clipped:
  * cross(prev, v, next) == 0  → degenerate corner: remove the vertex,
    emit nothing (area-preserving — the zero-area ear adds nothing);
  * cross > 0 (strictly convex) AND no other active vertex inside or
    ON the candidate triangle (three >=0 cross tests) → emit + remove.
    A vertex whose COORDINATES coincide with one of the triangle's
    corners does NOT block (it contributes no area and always sits
    "on" the triangle) — the exemption that lets the duplicated
    bridge vertices of a hole-eliminated ring clip through; on rings
    without repeated coordinates it never fires.
- reflex corners (cross < 0) never clip; boundary contact blocks an
  ear exactly like interior containment (the standard earcut guard).
- the final 3 active vertices emit one triangle iff their cross > 0.

For a simple polygon the two-ears theorem guarantees progress; a
non-simple ring that starves the scan raises ValueError (upstream
repair — functions/repair.py — is the fix, mirroring how mapnik feeds
wagyu-cleaned rings to the tessellator).

HOLES are supported via `eliminate_holes` — the bridge step of
public ear-clipping-with-holes (Eberly, "Triangulation by Ear
Clipping" §5 / mapbox-earcut's eliminateHoles), re-pinned here on
exact integer/rational arithmetic so the DuckDB twin can replay the
bridge CHOICE (not just its result):

- outer ring CCW, each hole CW (validated, not auto-reversed).
- holes are processed by their ANCHOR — the hole vertex maximizing
  (x, then y), smallest ring index among exact duplicates — sorted
  rightmost-anchor first: (M.x DESC, M.y DESC, hole index ASC).
- per hole, shoot the +x ray from M=(hx,hy): over every edge (P,Q)
  of the CURRENT combined ring with P.y != Q.y and
  min(Py,Qy) <= hy <= max(Py,Qy), the intersection
  ix = Px + (hy-Py)(Qx-Px)/(Qy-Py) is kept when ix >= hx as an
  exact rational (numerator/denominator, den normalized > 0); the
  minimum ix wins, ties to the smaller edge index.
- if the winning edge's endpoint lies exactly on the ray
  (P.y == hy, then ix == P.x) the bridge lands on that vertex.
  Otherwise B0 = the endpoint with the greater x (tie: the edge's
  first endpoint), and the Eberly refinement runs: among REFLEX
  vertices V of the combined ring with V.x > hx, locally-inside
  toward M (sector test below), lying inside-or-on the triangle
  (M, I, B0) (I the rational intersection; all cross tests scaled
  by the denominator, orientation flipped when B0.y < hy;
  degenerate when B0.y == hy → no candidates), the bridge is the V
  minimizing |V.y-hy|/(V.x-hx) — cross-multiplied compare — ties to
  the smaller V.x-hx, then the smaller ring index; if no candidate,
  B0 itself.
- DUPLICATE-SECTOR rule: if the chosen bridge vertex's coordinates
  occur more than once in the combined ring (earlier bridges
  duplicate their endpoints), the bridge attaches to the first
  duplicate (ring order) whose local interior sector CONTAINS the
  direction toward M — convex corner: both edge crosses ≥ 0; reflex
  corner: either strictly > 0 (the mapbox-earcut locallyInside test
  on exact integers).  Without it a second bridge can enter the
  wrong loop of the weakly-simple ring and pinch off an
  unclippable CW remnant.
- splice (duplicating both endpoints, interiors kept left):
  ring[..=B] + hole[M..] cycled + [M, B] + ring[B+1..].
"""

from __future__ import annotations

from collections.abc import Sequence


def _cross(xs, ys, i: int, j: int, k: int) -> int:
    return (xs[j] - xs[i]) * (ys[k] - ys[i]) - (ys[j] - ys[i]) * (
        xs[k] - xs[i]
    )


def earcut_indices(
    xs: Sequence[int], ys: Sequence[int]
) -> list[tuple[int, int, int]]:
    """Triangulate one simple CCW integer ring; returns 0-based
    (a, b, c) ring-index triples in clip order."""
    n = len(xs)
    if n != len(ys):
        raise ValueError("xs/ys length mismatch")
    if n < 3:
        return []
    xs = [int(v) for v in xs]
    ys = [int(v) for v in ys]
    act = list(range(n))
    tris: list[tuple[int, int, int]] = []
    while len(act) > 3:
        m = len(act)
        pos = -1
        emit: tuple[int, int, int] | None = None
        for p in range(m):
            a, b, c = act[p - 1], act[p], act[(p + 1) % m]
            s = _cross(xs, ys, a, b, c)
            if s == 0:
                pos, emit = p, None
                break
            if s > 0:
                blocked = False
                for v in act:
                    if v == a or v == b or v == c:
                        continue
                    if (xs[v], ys[v]) in (
                        (xs[a], ys[a]),
                        (xs[b], ys[b]),
                        (xs[c], ys[c]),
                    ):
                        continue  # corner-coincident duplicate
                    if (
                        _cross(xs, ys, a, b, v) >= 0
                        and _cross(xs, ys, b, c, v) >= 0
                        and _cross(xs, ys, c, a, v) >= 0
                    ):
                        blocked = True
                        break
                if not blocked:
                    pos, emit = p, (a, b, c)
                    break
        if pos < 0:
            raise ValueError(
                "earcut: no ear found — ring is not simple/CCW"
            )
        if emit is not None:
            tris.append(emit)
        act.pop(pos)
    a, b, c = act
    if _cross(xs, ys, a, b, c) > 0:
        tris.append((a, b, c))
    return tris


def shoelace2(xs: Sequence[int], ys: Sequence[int]) -> int:
    """Twice the signed ring area (CCW positive)."""
    n = len(xs)
    return sum(
        xs[i] * ys[(i + 1) % n] - xs[(i + 1) % n] * ys[i]
        for i in range(n)
    )


def _locally_inside(
    rx: list[int], ry: list[int], i: int, mx: int, my: int
) -> bool:
    """Does the direction from ring vertex i toward (mx, my) point
    into the polygon's local interior sector at i?  (CCW ring,
    interior left; the mapbox-earcut locallyInside test on exact
    integers.)  Convex corner: inside the closed sector between the
    outgoing edge and the reversed incoming edge; reflex corner:
    anywhere except the strictly-exterior sector."""
    n = len(rx)
    p, nx = (i - 1) % n, (i + 1) % n
    s = (rx[i] - rx[p]) * (ry[nx] - ry[p]) - (ry[i] - ry[p]) * (
        rx[nx] - rx[p]
    )
    t1 = (rx[nx] - rx[i]) * (my - ry[i]) - (ry[nx] - ry[i]) * (
        mx - rx[i]
    )
    t2 = (mx - rx[i]) * (ry[p] - ry[i]) - (my - ry[i]) * (
        rx[p] - rx[i]
    )
    if s > 0:
        return t1 >= 0 and t2 >= 0
    return t1 > 0 or t2 > 0


def _find_bridge(
    rx: list[int], ry: list[int], hx: int, hy: int
) -> int:
    """Index in the combined ring of the bridge endpoint for a hole
    anchored at (hx, hy), per the pinned exact-rational rule (module
    doc)."""
    n = len(rx)
    best = None  # (num, den, edge_i) of the min intersection
    for i in range(n):
        px, py = rx[i], ry[i]
        qx, qy = rx[(i + 1) % n], ry[(i + 1) % n]
        if py == qy:
            continue
        if not (min(py, qy) <= hy <= max(py, qy)):
            continue
        den = qy - py
        num = px * den + (hy - py) * (qx - px)
        if den < 0:
            den, num = -den, -num
        if num < hx * den:
            continue  # intersection left of the anchor
        if best is None or num * best[1] < best[0] * den:
            best = (num, den, i)
    if best is None:
        raise ValueError(
            "eliminate_holes: hole anchor sees no outer edge — hole "
            "outside the outer ring?"
        )
    num, den, i = best
    px, py = rx[i], ry[i]
    qx, qy = rx[(i + 1) % n], ry[(i + 1) % n]
    if py == hy:
        return _resolve_duplicate(rx, ry, i, hx, hy)
    if qy == hy:
        return _resolve_duplicate(rx, ry, (i + 1) % n, hx, hy)
    # B0 = endpoint with the greater x (tie: first endpoint)
    b0 = i if px >= qx else (i + 1) % n
    bx, by = rx[b0], ry[b0]
    if by == hy:
        # degenerate triangle: no refinement possible
        return _resolve_duplicate(rx, ry, b0, hx, hy)
    # triangle (M, I, B0), I = (num/den, hy); orient CCW
    flip = -1 if by < hy else 1
    cand = None  # (|dy|, dx, idx) minimizing |dy|/dx
    for v in range(n):
        vx, vy = rx[v], ry[v]
        if v == b0 or vx <= hx:
            continue
        pv, nv = (v - 1) % n, (v + 1) % n
        refl = (
            (rx[v] - rx[pv]) * (ry[nv] - ry[pv])
            - (ry[v] - ry[pv]) * (rx[nv] - rx[pv])
        ) < 0
        if not refl:
            continue
        if not _locally_inside(rx, ry, v, hx, hy):
            continue
        # closed-triangle tests, scaled by den > 0, sign-flipped for
        # CW triangles
        t1 = (num - hx * den) * (vy - hy)
        t2 = (bx * den - num) * (vy - hy) - (by - hy) * (vx * den - num)
        t3 = (hx - bx) * (vy - by) - (hy - by) * (vx - bx)
        if flip * t1 < 0 or flip * t2 < 0 or flip * t3 < 0:
            continue
        dy, dx = abs(vy - hy), vx - hx
        if (
            cand is None
            or dy * cand[1] < cand[0] * dx
            or (dy * cand[1] == cand[0] * dx and dx < cand[1])
        ):
            cand = (dy, dx, v)
    bi = cand[2] if cand is not None else b0
    return _resolve_duplicate(rx, ry, bi, hx, hy)


def _resolve_duplicate(
    rx: list[int], ry: list[int], bi: int, hx: int, hy: int
) -> int:
    """Among ring vertices sharing the chosen bridge COORDINATES
    (earlier bridges duplicate vertices), attach to the first (by
    ring index) whose local interior sector faces the hole anchor —
    without this the bridge can enter the wrong loop of the
    weakly-simple ring and pinch off a CW remnant that starves the
    ear scan.  Falls back to the original pick if none qualifies."""
    dups = [
        j
        for j in range(len(rx))
        if rx[j] == rx[bi] and ry[j] == ry[bi]
    ]
    if len(dups) > 1:
        for j in dups:
            if _locally_inside(rx, ry, j, hx, hy):
                return j
    return bi


def eliminate_holes(
    xs: Sequence[int],
    ys: Sequence[int],
    holes: Sequence[tuple[Sequence[int], Sequence[int]]],
) -> tuple[list[int], list[int]]:
    """Bridge every hole into the outer ring, rightmost anchor
    first, returning ONE combined weakly-simple CCW ring ready for
    earcut_indices.  Outer must be CCW, holes CW (validated)."""
    rx = [int(v) for v in xs]
    ry = [int(v) for v in ys]
    if shoelace2(rx, ry) <= 0:
        raise ValueError("eliminate_holes: outer ring must be CCW")
    anch = []
    for j, (hxs, hys) in enumerate(holes):
        hxs = [int(v) for v in hxs]
        hys = [int(v) for v in hys]
        if len(hxs) < 3:
            raise ValueError("eliminate_holes: hole with < 3 vertices")
        if shoelace2(hxs, hys) >= 0:
            raise ValueError("eliminate_holes: holes must be CW")
        mi = max(
            range(len(hxs)),
            key=lambda t: (hxs[t], hys[t], -t),
        )
        anch.append((hxs[mi], hys[mi], j, mi, hxs, hys))
    anch.sort(key=lambda t: (-t[0], -t[1], t[2]))
    for hx, hy, _, mi, hxs, hys in anch:
        bi = _find_bridge(rx, ry, hx, hy)
        m = len(hxs)
        hole_cycle_x = [hxs[(mi + t) % m] for t in range(m)] + [hx]
        hole_cycle_y = [hys[(mi + t) % m] for t in range(m)] + [hy]
        rx = rx[: bi + 1] + hole_cycle_x + [rx[bi]] + rx[bi + 1 :]
        ry = ry[: bi + 1] + hole_cycle_y + [ry[bi]] + ry[bi + 1 :]
    return rx, ry


def triangulation_stats(
    xs: Sequence[int], ys: Sequence[int]
) -> tuple[int, int, int]:
    """(n_tris, area2, trih) for one ring — the aggregate the oracle
    hashes.  area2 = Σ triangle cross products (== ring shoelace area2
    by construction); trih = order-sensitive Σ (k+1)·(a·4096² +
    b·4096 + c) over emit order k, folded mod 2⁶¹ to stay in BIGINT
    range on both engines."""
    tris = earcut_indices(xs, ys)
    area2 = 0
    trih = 0
    mod = 1 << 61
    for k, (a, b, c) in enumerate(tris):
        area2 += _cross(xs, ys, a, b, c)
        trih = (trih + (k + 1) * (a * 4096 * 4096 + b * 4096 + c)) % mod
    return len(tris), area2, trih


def triangulation_stats_holed(
    xs: Sequence[int],
    ys: Sequence[int],
    holes: Sequence[tuple[Sequence[int], Sequence[int]]],
) -> tuple[int, int, int, int]:
    """(n_pts, n_tris, area2, trih) for a holed polygon: bridge the
    holes into one combined ring, then clip it.  Triangle indices in
    trih refer to COMBINED-ring positions (deterministic — the
    bridge order and splice are pinned), and area2 ==
    shoelace2(outer) − Σ|shoelace2(hole)| by the tessellation
    invariant."""
    rx, ry = eliminate_holes(xs, ys, holes)
    n_tris, area2, trih = triangulation_stats(rx, ry)
    return len(rx), n_tris, area2, trih
