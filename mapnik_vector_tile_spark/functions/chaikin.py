"""Chaikin corner-cutting line smoothing — the cartographic
generalization dual of simplification (mapnik ships smooth() as an
image filter concept; QGIS/Turf ship `smooth`/`bezierSpline` for
vector lines; Chaikin '74 is the standard corner-cut).  One round
replaces every interior corner with two points at 1/4 and 3/4 of its
edges; endpoints stay.

Kept EXACT by scaling: each round multiplies coordinates by 4
(Q = 3·P_i + P_{i+1}, R = P_i + 3·P_{i+1}, endpoints ×4), so after R
rounds the output lives on the 4^R-scaled integer grid with zero
rounding — both engines fold the same BIGINTs.

Everything is array-lambda Column algebra (transform / flatten /
aggregate in Spark; list_transform / flatten / list_sum in DuckDB)
generated from ONE spec per engine — no UDF, no shuffle, one codegen
projection per round.
"""

from __future__ import annotations

import numpy as np


def chaikin_np(xs: np.ndarray, ys: np.ndarray, rounds: int) -> tuple:
    """numpy twin (scaled-integer, endpoints kept)."""
    xs = np.asarray(xs, dtype=np.int64)
    ys = np.asarray(ys, dtype=np.int64)
    for _ in range(rounds):
        qx = 3 * xs[:-1] + xs[1:]
        rx = xs[:-1] + 3 * xs[1:]
        qy = 3 * ys[:-1] + ys[1:]
        ry = ys[:-1] + 3 * ys[1:]
        midx = np.empty(2 * (len(xs) - 1), dtype=np.int64)
        midy = np.empty_like(midx)
        midx[0::2], midx[1::2] = qx, rx
        midy[0::2], midy[1::2] = qy, ry
        xs = np.concatenate(([xs[0] * 4], midx, [xs[-1] * 4]))
        ys = np.concatenate(([ys[0] * 4], midy, [ys[-1] * 4]))
    return xs, ys


def _ops(engine: str):
    if engine == "spark":
        return {
            "idx": lambda a, i: f"element_at({a}, {i})",
            "seq1": lambda a: f"sequence(1, size({a}) - 1)",
            "arr": lambda *es: "array(" + ", ".join(es) + ")",
            "tr": "transform",
            "cat": "concat",
            "sz": lambda a: f"size({a})",
            "lsum": lambda lst: (
                f"aggregate({lst}, 0L, (acc, v) -> acc + v)"
            ),
        }
    if engine == "duckdb":
        return {
            "idx": lambda a, i: f"{a}[{i}]",
            "seq1": lambda a: f"range(1, len({a}))",
            "arr": lambda *es: "[" + ", ".join(es) + "]",
            "tr": "list_transform",
            # DuckDB's list_concat is binary — fold pairwise
            "cat": None,
            "sz": lambda a: f"len({a})",
            "lsum": lambda lst: f"CAST(list_sum({lst}) AS BIGINT)",
        }
    raise ValueError(f"unknown engine {engine!r}")


def round_expr(engine: str, a: str) -> str:
    """One Chaikin round over array column `a` (scale ×4)."""
    o = _ops(engine)
    i0 = o["idx"](a, "1")
    ilast = o["idx"](a, o["sz"](a))
    pi = o["idx"](a, "i")
    pj = o["idx"](a, "i + 1")
    mids = (
        f"flatten({o['tr']}({o['seq1'](a)},"
        f" i -> {o['arr'](f'3 * {pi} + {pj}', f'{pi} + 3 * {pj}')}))"
    )
    head = o["arr"](f"{i0} * 4")
    tail = o["arr"](f"{ilast} * 4")
    if engine == "spark":
        return f"concat({head}, {mids}, {tail})"
    return f"list_concat(list_concat({head}, {mids}), {tail})"


def manhattan_expr(engine: str, xs: str, ys: str) -> str:
    """Σ |Δx|+|Δy| over consecutive points of array columns."""
    o = _ops(engine)
    dx = f"abs({o['idx'](xs, 'i + 1')} - {o['idx'](xs, 'i')})"
    dy = f"abs({o['idx'](ys, 'i + 1')} - {o['idx'](ys, 'i')})"
    return o["lsum"](
        f"{o['tr']}({o['seq1'](xs)}, i -> {dx} + {dy})"
    )


def vhash_expr(engine: str, xs: str, ys: str) -> str:
    """Order-sensitive Σ i·(x_i·8191 + y_i) over ALL points."""
    o = _ops(engine)
    if engine == "spark":
        seq = f"sequence(1, size({xs}))"
    else:
        seq = f"range(1, len({xs}) + 1)"
    term = (
        f"i * ({o['idx'](xs, 'i')} * 8191 + {o['idx'](ys, 'i')})"
    )
    return o["lsum"](f"{o['tr']}({seq}, i -> {term})")
