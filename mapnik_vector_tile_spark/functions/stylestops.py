"""Zoom-dependent style property functions — the mapbox-gl "stops"
evaluation every style engine runs per feature per zoom (gl-js
`interpolate`/`step` expressions; mapnik's scale-denominator-gated
rules are the coarse cousin, already covered by q_scale_gate).

Three modes, all EXACT:

- linear: between bracketing stops (z1,v1),(z2,v2) the value is
  v1 + ((z−z1)·(v2−v1)) div (z2−z1) on pre-scaled integer stop
  values — one floor division, deterministic in both engines; below
  the first stop clamps to v1, at/above the last to vn.
- exponential, base p/q (gl-js `interpolate` with base ≠ 1 — e.g.
  the common 1.75 = 7/4): gl-js defines
  t = (base^(z−z1) − 1)/(base^(z2−z1) − 1).  Zoom levels in this
  engine are INTEGERS, so for a RATIONAL base the whole curve is
  integer-exact with no pow() float anywhere:
  t = ((p^d − q^d)·q^(D−d)) / (p^D − q^D) with d = z−z1, D = z2−z1,
  and v = v1 + ((v2−v1)·(p^d − q^d)·q^(D−d)) div (p^D − q^D) — the
  per-z values are precomputed in Python as BIGINT literals and
  emitted as a CASE table, trivially identical in both engines.
  (Irrational bases, or fractional zooms, remain out of scope —
  this covers every gl-js style that writes base as a decimal.)
- step: value of the greatest stop with stop_z <= z (gl-js `step` /
  "interval" functions); below the first stop clamps to the first
  value.

The whole evaluation is one generated SQL text per engine (hilbert/
chaikin precedent): stops are a VALUES dim table joined by bracket
conditions — broadcastable, zero UDF."""

from __future__ import annotations

# (prop, mode, ((z, v_scaled), ...)) — the committed demo style:
# widths scaled x100, opacities in percent; mode is "linear", "step",
# or ("exp", p, q) for exponential base p/q
STYLE_STOPS = (
    ("width", "linear", ((0, 100), (5, 400), (10, 2000), (14, 6000))),
    ("opacity", "step", ((0, 10), (8, 60), (12, 100))),
    # gl-js {"base": 1.75, ...} — the canonical perceptual-zoom curve
    ("width_exp", ("exp", 7, 4),
     ((0, 100), (5, 400), (10, 2000), (14, 6000))),
)


def style_stops_sql(src: str, engine: str) -> str:
    """Evaluate STYLE_STOPS for every row of `src` (fid, z) →
    (fid, z, prop, v).  `engine` in {'spark','duckdb'} differs only
    in integer-division spelling."""
    if engine == "spark":
        def dv(a: str, b: str) -> str:
            return f"(({a}) DIV ({b}))"
    elif engine == "duckdb":
        def dv(a: str, b: str) -> str:
            return f"(({a}) // ({b}))"
    else:
        raise ValueError(f"unknown engine {engine!r}")
    parts = []
    for prop, mode, stops in STYLE_STOPS:
        if mode == "linear":
            cases = [f"WHEN z <= {stops[0][0]} THEN {stops[0][1]}"]
            for (z1, v1), (z2, v2) in zip(stops, stops[1:]):
                interp = (
                    f"{v1} + "
                    + dv(f"(z - {z1}) * ({v2} - {v1})", f"{z2 - z1}")
                )
                cases.append(f"WHEN z < {z2} THEN {interp}")
            cases.append(f"ELSE {stops[-1][1]}")
        elif isinstance(mode, tuple) and mode[0] == "exp":
            _, p, q = mode
            cases = [f"WHEN z <= {stops[0][0]} THEN {stops[0][1]}"]
            for (z1, v1), (z2, v2) in zip(stops, stops[1:]):
                big_d = z2 - z1
                den = p**big_d - q**big_d
                for d in range(1, big_d):
                    v = v1 + ((v2 - v1) * (p**d - q**d) * q ** (
                        big_d - d
                    )) // den
                    cases.append(f"WHEN z = {z1 + d} THEN {v}")
                cases.append(f"WHEN z = {z2} THEN {v2}")
            cases.append(f"ELSE {stops[-1][1]}")
        else:  # step
            cases = []
            for z1, v1 in reversed(stops):
                cases.append(f"WHEN z >= {z1} THEN {v1}")
            cases.append(f"ELSE {stops[0][1]}")
        case = "CASE " + " ".join(cases) + " END"
        parts.append(
            f"SELECT fid, z, '{prop}' AS prop,"
            f" CAST({case} AS BIGINT) AS v FROM {src}"
        )
    return "\nUNION ALL\n".join(parts)
