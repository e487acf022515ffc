"""Classic base-32 geohash encoding (Niemeyer 2008; the public
standard used by Elasticsearch/Redis geo commands) — the third member
of this engine's cell-index family beside S2-style cells
(functions/cellid.py) and axial hex cells (functions/hexcell.py).

A geohash interleaves the binary subdivisions of longitude and
latitude MSB-first (longitude gets the even global bit positions) and
renders each 5-bit group as one character of the 32-char alphabet
(i/l/o/a removed). Prefix truncation = spatial containment, which is
what makes it a join/rollup key: equal prefixes of length p share a
cell of known size.

Both renderings below are generated from the SAME bit spec, so the
Spark plan and the DuckDB oracle are bit-identical by construction:

  ix = floor((lon + 180) / 360 * 2^lonbits)   (lonbits = ceil(5p/2))
  iy = floor((lat +  90) / 180 * 2^latbits)   (latbits = floor(5p/2))
  code = interleave MSB-first (lon first); char c = alphabet[(code >>
  5*(p-1-c)) & 31]

All arithmetic is IEEE-deterministic (one rounded division + an exact
power-of-two multiply; no trig), unlike the S2 twin whose sphere math
is documented drift-tolerant.

Scale: pure Column algebra — the whole encode lives inside the scan
projection (whole-stage codegen), no shuffle, no Python. At 100 TB the
geohash becomes the shuffle key for density rollups; its prefix
hierarchy gives the same ancestor-pyramid trick the tile engine uses
(shiftright by 5 bits per dropped char).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bit_spec(precision: int) -> tuple[int, int, int, list[tuple[str, int, int]]]:
    """(total_bits, lonbits, latbits, moves) where each move is
    (source in {'ix','iy'}, source_bit_from_LSB, dest_bit_from_LSB)."""
    total = 5 * precision
    lonbits = (total + 1) // 2
    latbits = total // 2
    moves: list[tuple[str, int, int]] = []
    for a in range(lonbits):  # a-th lon bit counted from the MSB
        moves.append(("ix", lonbits - 1 - a, total - 1 - 2 * a))
    for b in range(latbits):
        moves.append(("iy", latbits - 1 - b, total - 2 - 2 * b))
    return total, lonbits, latbits, moves


def geohash_code_col(lon: Column, lat: Column, precision: int = 8) -> Column:
    """The 5·precision-bit interleaved integer (long) — the sortable /
    joinable form. precision ≤ 12 keeps it inside int64."""
    if not 1 <= precision <= 12:
        raise ValueError(f"geohash precision must be 1..12, got {precision}")
    total, lonbits, latbits, moves = _bit_spec(precision)
    ix = F.floor(
        ((lon + F.lit(180.0)) / F.lit(360.0)) * F.lit(float(1 << lonbits))
    ).cast("long")
    iy = F.floor(
        ((lat + F.lit(90.0)) / F.lit(180.0)) * F.lit(float(1 << latbits))
    ).cast("long")
    # boundary guard (lon=180 / lat=90 lands one past the last cell)
    ix = F.least(ix, F.lit((1 << lonbits) - 1))
    iy = F.least(iy, F.lit((1 << latbits) - 1))
    src = {"ix": ix, "iy": iy}
    code = F.lit(0).cast("long")
    for name, sbit, dbit in moves:
        code = code + F.shiftleft(
            F.shiftright(src[name], sbit).bitwiseAND(F.lit(1)), dbit
        )
    return code


def geohash_str_col(code: Column, precision: int = 8) -> Column:
    """Base-32 geohash string from an already-computed code column —
    select the code into a named column first so the 5p-bit interleave
    expression isn't duplicated per character."""
    chars = [
        F.substring(
            F.lit(ALPHABET),
            (
                F.shiftright(code, 5 * (precision - 1 - c))
                .bitwiseAND(F.lit(31))
                .cast("int")
                + F.lit(1)
            ),
            F.lit(1),
        )
        for c in range(precision)
    ]
    return F.concat(*chars)


def lonlat_index_sql(lon: str, lat: str, precision: int = 8) -> tuple[str, str]:
    """DuckDB (ix, iy) grid-index expressions — put them in a CTE
    under names, then feed those names to interleave_sql (same pattern
    as cellid.s2_cell_sql + morton_sql: the subdivision expression
    appears once, not once per bit)."""
    _, lonbits, latbits, _ = _bit_spec(precision)
    ix = (
        f"LEAST(CAST(floor((({lon}) + 180e0) / 360e0 * "
        f"{float(1 << lonbits)!r}e0) AS BIGINT), {(1 << lonbits) - 1})"
    )
    iy = (
        f"LEAST(CAST(floor((({lat}) + 90e0) / 180e0 * "
        f"{float(1 << latbits)!r}e0) AS BIGINT), {(1 << latbits) - 1})"
    )
    return ix, iy


def interleave_sql(gx: str, gy: str, precision: int = 8) -> str:
    """Geohash bit interleave over two named bigint columns — the
    MSB-first, lon-first order of _bit_spec (NOT plain Morton: lonbits
    may exceed latbits for odd precisions)."""
    _, _, _, moves = _bit_spec(precision)
    src = {"ix": gx, "iy": gy}
    return " + ".join(
        f"((({src[n]} >> {s}) & 1) << {d})" for n, s, d in moves
    )


def geohash_sql(code: str, precision: int = 8) -> str:
    """DuckDB base-32 string from a named bigint code column."""
    chars = " || ".join(
        f"substr('{ALPHABET}', CAST((({code}) >> {5 * (precision - 1 - c)})"
        f" & 31 AS INTEGER) + 1, 1)"
        for c in range(precision)
    )
    return f"({chars})"
