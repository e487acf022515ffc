"""Zoom-dependent style property functions — the mapbox-gl "stops"
evaluation every style engine runs per feature per zoom (gl-js
`interpolate`/`step` expressions; mapnik's scale-denominator-gated
rules are the coarse cousin, already covered by q_scale_gate).

Two modes, both EXACT:

- linear: between bracketing stops (z1,v1),(z2,v2) the value is
  v1 + ((z−z1)·(v2−v1)) div (z2−z1) on pre-scaled integer stop
  values — one floor division, deterministic in both engines; below
  the first stop clamps to v1, at/above the last to vn.
  (gl-js' base≠1 exponential needs pow() floats — documented out of
  scope; linear is base=1, the default.)
- step: value of the greatest stop with stop_z <= z (gl-js `step` /
  "interval" functions); below the first stop clamps to the first
  value.

The whole evaluation is one generated SQL text per engine (hilbert/
chaikin precedent): stops are a VALUES dim table joined by bracket
conditions — broadcastable, zero UDF."""

from __future__ import annotations

# (prop, mode, ((z, v_scaled), ...)) — the committed demo style:
# widths scaled x100, opacities in percent
STYLE_STOPS = (
    ("width", "linear", ((0, 100), (5, 400), (10, 2000), (14, 6000))),
    ("opacity", "step", ((0, 10), (8, 60), (12, 100))),
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
