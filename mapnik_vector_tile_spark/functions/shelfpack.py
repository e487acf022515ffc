"""Greedy shelf packing of icon rectangles into fixed-size sprite
atlas sheets — the mapbox/spritezero + mapbox/shelf-pack step that
turns a style's SVG/PNG icons into the sprite sheet every renderer
downloads next to its vector tiles.

Pinned deterministic convention (replayed exactly by the q_sprite
DuckDB twin):

- icons sort tallest-first: (-h, -w, icon_id);
- scan existing shelves of the CURRENT sheet in creation order, place
  on the first shelf with shelf_h >= h and cursor_x + w <= atlas;
  (classic shelf rule: a shelf's height is fixed by its first icon);
- else open a new shelf at the sheet's running y if y + h <= atlas;
- else start a new sheet (sheet ids count up from 0) — shelves never
  span sheets;
- icons wider/taller than the atlas raise ValueError.

Sequential by nature (every placement depends on all prior ones), so
the Spark operator applies it PER GROUP (one atlas per style/region —
thousands of independent groups at fleet scale), the same
grouped-kernel shape as label placement."""

from __future__ import annotations


def shelf_pack(
    icons: list[tuple[int, int, int]], atlas: int
) -> list[tuple[int, int, int, int]]:
    """icons: (icon_id, w, h) tuples; returns (icon_id, sheet, px, py)
    in placement order (tallest-first sort order)."""
    for icon_id, w, h in icons:
        if w > atlas or h > atlas or w <= 0 or h <= 0:
            raise ValueError(f"icon {icon_id} ({w}x{h}) unpackable")
    order = sorted(icons, key=lambda t: (-t[2], -t[1], t[0]))
    out: list[tuple[int, int, int, int]] = []
    sheet = 0
    ynext = 0
    shelves: list[list[int]] = []  # [sy, sh, sx]
    for icon_id, w, h in order:
        pos = -1
        for i, (sy, sh, sx) in enumerate(shelves):
            if sh >= h and sx + w <= atlas:
                pos = i
                break
        if pos >= 0:
            sy, sh, sx = shelves[pos]
            out.append((icon_id, sheet, sx, sy))
            shelves[pos][2] = sx + w
        elif ynext + h <= atlas:
            out.append((icon_id, sheet, 0, ynext))
            shelves.append([ynext, h, w])
            ynext += h
        else:
            sheet += 1
            out.append((icon_id, sheet, 0, 0))
            shelves = [[0, h, w]]
            ynext = h
    return out
