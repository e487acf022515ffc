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
- reflex corners (cross < 0) never clip; boundary contact blocks an
  ear exactly like interior containment (the standard earcut guard).
- the final 3 active vertices emit one triangle iff their cross > 0.

For a simple polygon the two-ears theorem guarantees progress; a
non-simple ring that starves the scan raises ValueError (upstream
repair — functions/repair.py — is the fix, mirroring how mapnik feeds
wagyu-cleaned rings to the tessellator).

Exterior rings only by documented narrowing: the reference pipeline
resolves holes before tessellation (boolean ops / repair in this
repo); mapbox-earcut's hole-bridging is not replicated.
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
