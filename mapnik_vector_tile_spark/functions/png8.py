"""PNG8 — palette-quantized indexed PNG (color type 3), completing the
raster encode surface beside png/jpeg/webp/tiff (reference: mapnik
``save_to_string(image, "png8")``, which octree-quantizes to a <=256
color palette; SURVEY §2.8 R2). Pure numpy + stdlib zlib.

Quantizer: deterministic MEDIAN CUT (Heckbert 1982) over the image's
distinct RGBA colors — fully specified tie-breaks so the palette is a
pure function of the pixel array:

  * boxes start as the set of distinct colors (uint32-packed RGBA);
  * the split box is the one with the largest channel range, ties
    broken by larger pixel count, then by smaller minimum packed
    color; the split channel is the widest (R, G, B, A priority on
    ties); colors sort by (channel value, packed value) and split at
    the count-weighted median, both halves nonempty;
  * each final box renders to the count-weighted per-channel mean,
    rounded half-away-from-zero (the engine's std::round convention);
  * palette order = ascending minimum packed color of the source box.

When the image already has <= max_colors distinct colors the palette
is exactly those colors (ascending packed order) and the round-trip is
BIT-EXACT — the lossless contract q_raster_png8 gates. Above that the
quantization error is bounded by the corpus contract (PSNR gate, same
shape as the JPEG path).

Wire format: standard PNG signature/IHDR(bit depth 8, color type 3)/
PLTE/tRNS(emitted only when any palette alpha < 255, per spec)/IDAT/
IEND with CRCs; scanlines are palette indices with per-row min-SAD
filter choice over all five standard filters (same heuristic as
functions.png). The decoder accepts any 8-bit color-type-3 PNG
(all five filters, foreign encoders included).

Error contract (matches functions.png/jpeg/webp/tiff): every malformed
input raises ValueError — never a raw struct/zlib/Index error.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from mapnik_vector_tile_spark.functions.png import _chunk, _paeth
from mapnik_vector_tile_spark.functions.tilemath import round_half_away_np

_SIG = b"\x89PNG\r\n\x1a\n"


def _pack_rgba(rgba: np.ndarray) -> np.ndarray:
    """uint8[n,4] -> uint32[n] big-endian packed (R<<24|G<<16|B<<8|A)."""
    c = rgba.astype(np.uint32)
    return (c[:, 0] << 24) | (c[:, 1] << 16) | (c[:, 2] << 8) | c[:, 3]


def median_cut_palette(
    rgba: np.ndarray, max_colors: int = 256
) -> tuple[np.ndarray, np.ndarray]:
    """uint8[h,w,4] -> (palette uint8[n,4], indices uint8[h,w]).

    Deterministic median-cut; lossless (palette == distinct colors,
    ascending packed order) when the image has <= max_colors distinct
    colors."""
    if rgba.ndim != 3 or rgba.shape[2] != 4:
        raise ValueError("median_cut_palette expects HxWx4 uint8")
    if not 1 <= max_colors <= 256:
        # indices are uint8 and PLTE caps at 256 entries per the PNG
        # spec — a larger budget would silently wrap indices
        raise ValueError(f"max_colors must be in [1, 256], got {max_colors}")
    h, w, _ = rgba.shape
    flat = rgba.reshape(-1, 4)
    packed = _pack_rgba(flat)
    uniq, inv, counts = np.unique(packed, return_inverse=True, return_counts=True)
    ucols = np.stack(
        [
            (uniq >> 24) & 0xFF,
            (uniq >> 16) & 0xFF,
            (uniq >> 8) & 0xFF,
            uniq & 0xFF,
        ],
        axis=1,
    ).astype(np.int64)
    n_uniq = len(uniq)
    if n_uniq <= max_colors:
        palette = ucols.astype(np.uint8)
        idx = inv.astype(np.uint8).reshape(h, w)
        return palette, idx

    # median cut over (ucols, counts); boxes hold index arrays into
    # uniq; each box caches its pick key (range, count, -min packed)
    # at creation so the split loop never rescans unchanged boxes
    def _key(b: np.ndarray):
        if len(b) < 2:
            return None  # unsplittable
        cols = ucols[b]
        rng = cols.max(axis=0) - cols.min(axis=0)
        return (int(rng.max()), int(counts[b].sum()), -int(uniq[b].min()))

    b0 = np.arange(n_uniq)
    boxes: list[np.ndarray] = [b0]
    keys: list[tuple | None] = [_key(b0)]
    while len(boxes) < max_colors:
        # pick the box to split: largest channel range, then largest
        # count, then smallest min packed value
        best = -1
        best_key = None
        for bi, key in enumerate(keys):
            if key is None:
                continue
            if best_key is None or key > best_key:
                best_key = key
                best = bi
        if best < 0:
            break
        b = boxes.pop(best)
        keys.pop(best)
        cols = ucols[b]
        rng = cols.max(axis=0) - cols.min(axis=0)
        ch = int(np.argmax(rng))  # R,G,B,A priority on range ties
        order = np.lexsort((uniq[b], cols[:, ch]))
        b = b[order]
        csum = np.cumsum(counts[b])
        half = csum[-1] / 2.0
        cut = int(np.searchsorted(csum, half, side="left")) + 1
        cut = min(max(cut, 1), len(b) - 1)  # both halves nonempty
        lo, hi = b[:cut], b[cut:]
        boxes.append(lo)
        keys.append(_key(lo))
        boxes.append(hi)
        keys.append(_key(hi))

    # deterministic palette order: ascending min packed color per box
    boxes.sort(key=lambda bb: int(uniq[bb].min()))
    palette = np.empty((len(boxes), 4), dtype=np.uint8)
    color_to_pal = np.empty(n_uniq, dtype=np.int64)
    for pi, b in enumerate(boxes):
        cnt = counts[b].astype(np.float64)
        mean = (ucols[b] * cnt[:, None]).sum(axis=0) / cnt.sum()
        palette[pi] = round_half_away_np(mean).astype(np.uint8)
        color_to_pal[b] = pi
    idx = color_to_pal[inv].astype(np.uint8).reshape(h, w)
    return palette, idx


def encode_png8(rgba: np.ndarray, max_colors: int = 256, level: int = 6) -> bytes:
    """uint8[h,w,4] -> indexed PNG bytes (color type 3, depth 8)."""
    palette, idx = median_cut_palette(rgba, max_colors)
    h, w = idx.shape
    raw = idx.astype(np.int16)  # bpp = 1 byte (8-bit indices)
    prior = np.zeros_like(raw)
    prior[1:] = raw[:-1]
    left = np.zeros_like(raw)
    left[:, 1:] = raw[:, :-1]
    upleft = np.zeros_like(raw)
    upleft[1:, 1:] = raw[:-1, :-1]
    cands = np.empty((5, h, w), dtype=np.uint8)
    cands[0] = raw.astype(np.uint8)
    cands[1] = ((raw - left) % 256).astype(np.uint8)
    cands[2] = ((raw - prior) % 256).astype(np.uint8)
    cands[3] = ((raw - (left + prior) // 2) % 256).astype(np.uint8)
    cands[4] = ((raw - _paeth(left, prior, upleft)) % 256).astype(np.uint8)
    signed = cands.astype(np.int16)
    sad = np.where(signed < 128, signed, 256 - signed).sum(axis=2)
    pick = np.argmin(sad, axis=0)
    stream = np.empty((h, 1 + w), dtype=np.uint8)
    stream[:, 0] = pick.astype(np.uint8)
    stream[:, 1:] = cands[pick, np.arange(h)]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    out = [_SIG, _chunk(b"IHDR", ihdr), _chunk(b"PLTE", palette[:, :3].tobytes())]
    if (palette[:, 3] < 255).any():
        out.append(_chunk(b"tRNS", palette[:, 3].tobytes()))
    out.append(_chunk(b"IDAT", zlib.compress(stream.tobytes(), level)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def decode_png8(buf: bytes) -> np.ndarray:
    """Indexed PNG bytes -> uint8[h,w,4]. Accepts any 8-bit color-
    type-3 stream (all five filters)."""
    try:
        return _decode_inner(buf)
    except (struct.error, zlib.error, IndexError, KeyError) as e:
        raise ValueError(f"malformed PNG8 stream: {e}") from e


def _decode_inner(buf: bytes) -> np.ndarray:
    if buf[:8] != _SIG:
        raise ValueError("not a PNG stream (bad signature)")
    pos = 8
    w = h = -1
    plte = None
    trns = None
    idat = []
    n = len(buf)
    while pos + 8 <= n:
        ln = int.from_bytes(buf[pos : pos + 4], "big")
        tag = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + ln]
        if len(payload) != ln:
            raise ValueError("truncated PNG chunk")
        pos += 12 + ln  # skip CRC
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or ctype != 3:
                raise ValueError(
                    f"decode_png8 handles 8-bit color type 3 only, "
                    f"got depth={depth} type={ctype}"
                )
            if comp != 0 or filt != 0 or ilace != 0:
                raise ValueError("unsupported PNG compression/filter/interlace")
        elif tag == b"PLTE":
            if ln % 3 != 0 or ln == 0:
                raise ValueError("bad PLTE length")
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(payload, np.uint8)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
    if w < 0 or plte is None or not idat:
        raise ValueError("missing IHDR/PLTE/IDAT")
    data = zlib.decompress(b"".join(idat))
    if len(data) != h * (w + 1):
        raise ValueError("IDAT size mismatch")
    rows = np.frombuffer(data, np.uint8).reshape(h, w + 1)
    filters = rows[:, 0]
    scan = rows[:, 1:].astype(np.int16)
    out = np.empty((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int16)
    for r in range(h):
        f = int(filters[r])
        cur = scan[r]
        if f == 0:
            rec = cur % 256
        elif f == 2:  # Up
            rec = (cur + prev) % 256
        elif f in (1, 3, 4):  # Sub / Average / Paeth: left dependency
            rec = np.empty(w, dtype=np.int16)
            a = 0
            for x in range(w):
                b = int(prev[x])
                c = int(prev[x - 1]) if x else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                a = (int(cur[x]) + pred) % 256
                rec[x] = a
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[r] = rec.astype(np.uint8)
        prev = rec.astype(np.int16)
    if int(out.max(initial=0)) >= len(plte):
        raise ValueError("palette index out of range")
    alpha = np.full(len(plte), 255, dtype=np.uint8)
    if trns is not None:
        alpha[: len(trns)] = trns[: len(plte)]
    rgba = np.empty((h, w, 4), dtype=np.uint8)
    rgba[..., :3] = plte[out]
    rgba[..., 3] = alpha[out]
    return rgba
