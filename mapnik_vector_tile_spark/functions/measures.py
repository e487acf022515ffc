"""Geometry measures as PURE Column algebra — signed shoelace area,
boundary length, vertex centroid — over the canonical features schema
(xs/ys array<double>, part_offsets array<int>). No UDF, no explode:
per-part slicing via ``transform`` over the part-index sequence, the
shoelace/length folds via ``zip_with`` against the rotated/shifted
slice, and the outer per-feature sum via ``aggregate`` — the whole
expression stays inside whole-stage codegen (asserted in
tests/test_plan_quality.py), so measures cost a projection, not a
shuffle. Reference parity: mapnik geometry utils
(``mapnik::util::area``/``length``/``centroid`` over
geometry<double>), re-expressed for columnar batches. SURVEY §2.9.

Determinism note (the oracle contract): the folds run left-to-right
in vertex order in BOTH engines' evaluation of these expressions;
the q_geom_measures corpus keeps every product dyadic-exact so the
sums are order-free anyway and the DuckDB twin can use closed forms.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _part_slices(col: str):
    """array of per-part coordinate slices: parts[p] =
    slice(col, part_offsets[p]+1, part_offsets[p+1]-part_offsets[p])
    (Spark slice() is 1-based)."""
    return F.transform(
        F.expr("sequence(0, size(part_offsets) - 2)"),
        lambda p: F.slice(
            F.col(col),
            F.element_at(F.col("part_offsets"), p + 1) + 1,
            F.element_at(F.col("part_offsets"), p + 2)
            - F.element_at(F.col("part_offsets"), p + 1),
        ),
    )


def _rot1(arr: Column) -> Column:
    """arr rotated left by one: [a1..an-1, a0] (the shoelace pairing;
    for an explicitly closed ring the wrap term is a zero-area no-op)."""
    return F.concat(
        F.slice(arr, 2, F.size(arr) - 1), F.slice(arr, 1, 1)
    )


def signed_area2() -> Column:
    """Σ over parts of the shoelace fold Σ_i (x_i·y_{i+1} − x_{i+1}·y_i)
    — twice the signed area; positive for counter-clockwise rings in
    the engine's merc frame. Non-polygon parts contribute their
    degenerate (usually 0) terms, matching the reference's area()
    returning 0 for lines."""
    xs_parts = _part_slices("xs")
    ys_parts = _part_slices("ys")
    per_part = F.zip_with(
        xs_parts,
        ys_parts,
        lambda xp, yp: F.aggregate(
            F.zip_with(
                F.zip_with(xp, _rot1(yp), lambda a, b: a * b),
                F.zip_with(_rot1(xp), yp, lambda a, b: a * b),
                lambda s, t: s - t,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    return F.aggregate(per_part, F.lit(0.0), lambda acc, v: acc + v)


def boundary_length() -> Column:
    """Σ over parts of Σ_i sqrt(dx²+dy²) over CONSECUTIVE vertex pairs
    (no wrap: closed rings carry the closing vertex explicitly, open
    lines measure their polyline length)."""
    xs_parts = _part_slices("xs")
    ys_parts = _part_slices("ys")

    def part_len(xp: Column, yp: Column) -> Column:
        dx = F.zip_with(
            F.slice(xp, 2, F.size(xp) - 1),
            F.slice(xp, 1, F.size(xp) - 1),
            lambda a, b: a - b,
        )
        dy = F.zip_with(
            F.slice(yp, 2, F.size(yp) - 1),
            F.slice(yp, 1, F.size(yp) - 1),
            lambda a, b: a - b,
        )
        return F.aggregate(
            F.zip_with(dx, dy, lambda a, b: F.sqrt(a * a + b * b)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    per_part = F.zip_with(xs_parts, ys_parts, part_len)
    return F.aggregate(per_part, F.lit(0.0), lambda acc, v: acc + v)


def vertex_mean(col: str) -> Column:
    """Mean of all vertices of one axis (the vertex centroid — the
    label-placement heuristic; NOT the area centroid)."""
    return F.aggregate(
        F.col(col), F.lit(0.0), lambda acc, v: acc + v
    ) / F.size(F.col(col)).cast("double")


def line_interpolate(t: float) -> tuple[Column, Column]:
    """Point at fraction ``t`` (0..1) of the feature's total vertex-
    chain length — mapnik's along-line marker/label placement
    (markers_placement line mode), as pure Column algebra: one
    ``aggregate`` computes the total, a second walks the segments with
    a (cum, px, py, found) struct accumulator and linearly
    interpolates inside the first segment where the running length
    reaches t·total. Zero-length chains and fp-starved tails fall back
    to the last vertex. Parts are treated as one concatenated chain.
    No UDF, no shuffle; left-to-right fold order is the determinism
    contract the oracle replays."""
    xs, ys = F.col("xs"), F.col("ys")
    n = F.size(xs)
    idx = F.when(n > 1, F.sequence(F.lit(1), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    segs = F.transform(
        idx,
        lambda i: F.struct(
            xs[i - 1].alias("x0"),
            ys[i - 1].alias("y0"),
            xs[i].alias("x1"),
            ys[i].alias("y1"),
            F.sqrt(
                (xs[i] - xs[i - 1]) * (xs[i] - xs[i - 1])
                + (ys[i] - ys[i - 1]) * (ys[i] - ys[i - 1])
            ).alias("ln"),
        ),
    )
    total = F.aggregate(
        segs, F.lit(0.0).cast("double"), lambda a, s: a + s["ln"]
    )
    target = F.lit(float(t)) * total
    init = F.struct(
        F.lit(0.0).cast("double").alias("cum"),
        xs[0].cast("double").alias("px"),
        ys[0].cast("double").alias("py"),
        F.lit(False).alias("found"),
    )

    def step(a, s):
        hit = (
            (~a["found"])
            & (a["cum"] + s["ln"] >= target)
            & (s["ln"] > F.lit(0.0))
        )
        frac = (target - a["cum"]) / s["ln"]
        return F.struct(
            (a["cum"] + s["ln"]).alias("cum"),
            F.when(a["found"], a["px"])
            .when(hit, s["x0"] + frac * (s["x1"] - s["x0"]))
            .otherwise(s["x1"])
            .alias("px"),
            F.when(a["found"], a["py"])
            .when(hit, s["y0"] + frac * (s["y1"] - s["y0"]))
            .otherwise(s["y1"])
            .alias("py"),
            (a["found"] | hit).alias("found"),
        )

    fin = F.aggregate(segs, init, step)
    return fin["px"], fin["py"]


def area_centroid() -> tuple[Column, Column]:
    """True area-weighted centroid (mapnik util::centroid over
    polygon geometry): C = Σ(v_i + v_{i+1})·cross_i / (3·Σcross_i),
    folded per part with the same shoelace pairing as signed_area2 —
    holes (negative cross sums) subtract automatically. NULL when the
    total signed area is zero (degenerate/line input); callers wanting
    the label-placement fallback chain can coalesce with
    vertex_mean."""
    xs_parts = _part_slices("xs")
    ys_parts = _part_slices("ys")

    def part_sums(xp: Column, yp: Column) -> Column:
        cross = F.zip_with(
            F.zip_with(xp, _rot1(yp), lambda a, b: a * b),
            F.zip_with(_rot1(xp), yp, lambda a, b: a * b),
            lambda s, t: s - t,
        )
        sx = F.aggregate(
            F.zip_with(
                F.zip_with(xp, _rot1(xp), lambda a, b: a + b),
                cross,
                lambda s, c: s * c,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sy = F.aggregate(
            F.zip_with(
                F.zip_with(yp, _rot1(yp), lambda a, b: a + b),
                cross,
                lambda s, c: s * c,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        a = F.aggregate(cross, F.lit(0.0), lambda acc, v: acc + v)
        return F.struct(sx.alias("sx"), sy.alias("sy"), a.alias("a"))

    per_part = F.zip_with(xs_parts, ys_parts, part_sums)
    tot = F.aggregate(
        per_part,
        F.struct(
            F.lit(0.0).alias("sx"), F.lit(0.0).alias("sy"),
            F.lit(0.0).alias("a"),
        ),
        lambda acc, p: F.struct(
            (acc["sx"] + p["sx"]).alias("sx"),
            (acc["sy"] + p["sy"]).alias("sy"),
            (acc["a"] + p["a"]).alias("a"),
        ),
    )
    denom = F.lit(3.0) * tot["a"]
    cx = F.when(tot["a"] != 0.0, tot["sx"] / denom)
    cy = F.when(tot["a"] != 0.0, tot["sy"] / denom)
    return cx, cy
