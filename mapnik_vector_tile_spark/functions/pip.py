"""Point-in-polygon kernels — SURVEY.md A.7 (NEW; powers J3/J4 refine
and polygon ring-winding normalization).

Even-odd ray casting with the half-open crossing rule
((y_i > py) != (y_j > py)): deterministic boundary behavior, vectorized
over query points per ring.
"""

from __future__ import annotations

import numpy as np


def points_in_ring(
    qx: np.ndarray, qy: np.ndarray, rx: np.ndarray, ry: np.ndarray
) -> np.ndarray:
    """Boolean mask: which query points are inside one ring (open form,
    closing edge implied). Vectorized over query points; loops ring
    edges (rings are short, queries are long)."""
    qx = np.asarray(qx, dtype=np.float64)
    qy = np.asarray(qy, dtype=np.float64)
    rx = np.asarray(rx, dtype=np.float64)
    ry = np.asarray(ry, dtype=np.float64)
    inside = np.zeros(len(qx), dtype=bool)
    n = len(rx)
    j = n - 1
    for i in range(n):
        cond = (ry[i] > qy) != (ry[j] > qy)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (rx[j] - rx[i]) * (qy - ry[i]) / (ry[j] - ry[i]) + rx[i]
        inside ^= cond & (qx < xint)
        j = i
    return inside


def points_in_polygon(
    qx: np.ndarray,
    qy: np.ndarray,
    rxs: np.ndarray,
    rys: np.ndarray,
    ring_offsets: np.ndarray,
) -> np.ndarray:
    """Even-odd over all rings (holes subtract automatically)."""
    inside = np.zeros(len(np.asarray(qx)), dtype=bool)
    ring_offsets = np.asarray(ring_offsets, dtype=np.int64)
    for r in range(len(ring_offsets) - 1):
        inside ^= points_in_ring(
            qx,
            qy,
            rxs[ring_offsets[r] : ring_offsets[r + 1]],
            rys[ring_offsets[r] : ring_offsets[r + 1]],
        )
    return inside


def normalize_ring_winding(
    xs: np.ndarray,
    ys: np.ndarray,
    offsets: np.ndarray,
    area2_fn,
) -> tuple[np.ndarray, np.ndarray]:
    """Assign winding by even-odd containment depth (wagyu-parity
    semantics, SURVEY.md F12): a ring contained in an even number of
    other rings is an exterior (2A > 0 under ``area2_fn``'s
    convention), odd -> hole (2A < 0). Ring ORDER is preserved; only
    vertex direction flips.

    Aliasing contract: the returned arrays may ALIAS the inputs (the
    single-ring fast path returns the originals, or reversed VIEWS of
    them) — callers must treat both inputs and outputs as read-only
    after the call. The encode pipeline (the sole caller) only reads.
    """
    offsets = np.asarray(offsets, dtype=np.int64)
    nr = len(offsets) - 1
    if nr == 1:
        # single-ring fast path (the overwhelming footprint shape):
        # depth is 0 by definition -> want positive area; no copy when
        # already correct, a reversed VIEW when flipped (downstream
        # encode only reads)
        xs = np.asarray(xs)
        ys = np.asarray(ys)
        a2 = area2_fn(xs, ys)
        if a2 >= 0:
            return xs, ys
        return xs[::-1], ys[::-1]
    xs = np.asarray(xs).copy()
    ys = np.asarray(ys).copy()
    if nr == 0:
        return xs, ys
    depths = np.zeros(nr, dtype=np.int64)
    for r in range(nr):
        # MAJORITY vote over ALL of ring r's vertices, not just the
        # first: after box clipping, a ring's first vertex frequently
        # lies exactly ON another ring's boundary (both run collinearly
        # along the clip line), where the half-open ray test is
        # arbitrary. Interior vertices dominate for any genuine
        # containment, so the vote is robust; an EXACT tie (degenerate
        # clipped hole with half its vertices on the other ring's
        # boundary) is broken by a centroid probe — defaulting a tied
        # hole to "outside" would flip its winding and invert it.
        rx = xs[offsets[r] : offsets[r + 1]]
        ry = ys[offsets[r] : offsets[r + 1]]
        for s in range(nr):
            if s == r:
                continue
            sx = xs[offsets[s] : offsets[s + 1]]
            sy = ys[offsets[s] : offsets[s + 1]]
            inside = points_in_ring(rx, ry, sx, sy)
            vote = int(inside.sum()) * 2
            if vote > len(rx) or (
                vote == len(rx)
                and bool(
                    points_in_ring(
                        np.array([rx.mean()]), np.array([ry.mean()]), sx, sy
                    )[0]
                )
            ):
                depths[r] += 1
    for r in range(nr):
        a2 = area2_fn(xs[offsets[r] : offsets[r + 1]], ys[offsets[r] : offsets[r + 1]])
        want_pos = depths[r] % 2 == 0
        if (a2 > 0) != want_pos and a2 != 0:
            xs[offsets[r] : offsets[r + 1]] = xs[offsets[r] : offsets[r + 1]][::-1]
            ys[offsets[r] : offsets[r + 1]] = ys[offsets[r] : offsets[r + 1]][::-1]
    return xs, ys
