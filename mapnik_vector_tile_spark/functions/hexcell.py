"""Planar hexagonal cell index (axial coords, cube rounding) — the
"H3" half of the north_star's "H3/S2 cell encoding" (the spherical
half is functions/cellid.py). NEW operator: mapnik-vector-tile has no
hex index (its grid is the square XYZ pyramid,
src/vector_tile_projection.hpp); hex binning is the standard
aggregation/smoothing grid for density work because every neighbor is
edge-adjacent at equal distance.

This numpy kernel is the bit-twin of plans.shared_sql.hex_cell_cte —
same constants, same floor(v+0.5) rounding, same repair branches —
asserted against BOTH engines' SQL in tests/test_cellid.py. The
oracle pairs (q_hex_assign, q_hex_density) gate the SQL template
cross-engine.

Algorithm (public, standard): pointy-top axial coords
  qf = (√3/3·x − 1/3·y)/s,  rf = (2/3·y)/s
then cube-round (round each of x=qf, y=−qf−rf, z=rf; recompute the
one with the largest rounding error so x+y+z = 0). k-ring neighbors
are the 6 axial unit offsets.
"""

from __future__ import annotations

import numpy as np

SQRT3_3 = 3.0**0.5 / 3.0
THIRD = 1.0 / 3.0
TWO_THIRDS = 2.0 / 3.0

# ring-1 axial offsets, matching shared_sql.HEX_RING1 (incl. center)
RING1 = ((0, 0), (1, 0), (1, -1), (0, -1), (-1, 0), (-1, 1), (0, 1))


def _rnd(v: np.ndarray) -> np.ndarray:
    """floor(v + 0.5) — the template's engine-identical rounding."""
    return np.floor(v + 0.5).astype(np.int64)


def hex_cell(
    mx: np.ndarray, my: np.ndarray, size: float
) -> tuple[np.ndarray, np.ndarray]:
    """(hq, hr) axial cell of each mercator point; vectorized."""
    mx = np.asarray(mx, dtype=np.float64)
    my = np.asarray(my, dtype=np.float64)
    qf = (SQRT3_3 * mx - THIRD * my) / size
    rf = (TWO_THIRDS * my) / size
    yf = -qf - rf
    rx, ry, rz = _rnd(qf), _rnd(yf), _rnd(rf)
    dx = np.abs(rx - qf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - rf)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    hq = np.where(fix_x, -ry - rz, rx)
    hr = np.where(fix_x | fix_y, rz, -rx - ry)
    return hq, hr


def hex_center(
    hq: np.ndarray, hr: np.ndarray, size: float
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse: mercator center of a cell (for tests / distance math)."""
    hq = np.asarray(hq, dtype=np.float64)
    hr = np.asarray(hr, dtype=np.float64)
    mx = size * (3.0**0.5 * hq + 3.0**0.5 / 2.0 * hr)
    my = size * (1.5 * hr)
    return mx, my
