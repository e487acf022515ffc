"""Real baseline TIFF 6.0 encoder/decoder — pure numpy + stdlib,
completing the engine's raster-format parity with the reference's
mapnik image I/O surface (``save_to_string(image, "tiff")`` /
``image_reader("tiff")``; mapnik supports png/jpeg/webp/tiff and with
this module so does the engine — only avif stays a documented stub).
SURVEY §2.8 R2.

Scope: the TIFF 6.0 baseline the spec requires every reader to
support — 8-bit RGB(A) chunky (PlanarConfiguration=1), strip-based,
Compression 1 (none) or 32773 (PackBits). The ENCODER always writes
little-endian ("II") PackBits with RowsPerStrip chosen so strips stay
near the spec's recommended 8 KiB; PackBits restarts at every row as
TIFF 6.0 §9 requires, so any conforming reader decodes it. The
DECODER accepts both byte orders ("II"/"MM"), both compressions, RGB
or RGBA, and multi-strip layouts.

PackBits run detection is vectorized (np.diff over the strip rows →
run boundaries); the per-run emit loop is O(runs), not O(pixels).

Lossless: round-trip is BIT-EXACT (gated by q_raster_tiff and
tests/test_tiff.py), same contract class as the PNG/WebP paths.

Error contract (matches functions.png/jpeg/webp): every malformed
input raises ValueError — never a raw struct/Index error.
"""

from __future__ import annotations

import struct

import numpy as np

# TIFF tag ids (TIFF 6.0 §8)
_T_WIDTH = 256
_T_LENGTH = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SAMPLES = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_EXTRA_SAMPLES = 338

_TYPE_SHORT = 3
_TYPE_LONG = 4
_TYPE_DOUBLE = 12

# GeoTIFF 1.1 (OGC 19-008r4) georeferencing tags
_T_PIXEL_SCALE = 33550  # ModelPixelScaleTag, DOUBLE x3
_T_TIEPOINT = 33922  # ModelTiepointTag, DOUBLE x6
_T_GEO_KEYS = 34735  # GeoKeyDirectoryTag, SHORT x4n
# minimal key directory: projected model, PixelIsArea, EPSG:3857
_GEO_KEYS_3857 = (1, 1, 0, 3, 1024, 0, 1, 1, 1025, 0, 1, 1, 3072, 0, 1, 3857)

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}


# --- PackBits (TIFF 6.0 §9) ----------------------------------------------------


def _packbits_encode_row(row: np.ndarray) -> bytes:
    """PackBits-compress one row of uint8 bytes. Literal runs for
    non-repeating spans, replicate runs (length >= 3 pays off; >= 2 is
    legal and used when it closes a strip) for repeats, both capped at
    128 per the spec."""
    n = row.size
    if n == 0:
        return b""
    # run-length split: boundaries where the byte value changes
    change = np.flatnonzero(np.diff(row.astype(np.int16)) != 0)
    starts = np.concatenate(([0], change + 1))
    ends = np.concatenate((change + 1, [n]))
    out = bytearray()
    lit_start = -1  # start of a pending literal span

    def flush_literal(upto: int) -> None:
        nonlocal lit_start, out
        if lit_start < 0:
            return
        s = lit_start
        while s < upto:
            ln = min(128, upto - s)
            out.append(ln - 1)
            out += row[s : s + ln].tobytes()
            s += ln
        lit_start = -1

    for s, e in zip(starts, ends):
        run = e - s
        if run >= 3:
            flush_literal(s)
            v = int(row[s])
            while run > 0:
                ln = min(128, run)
                if ln == 1:
                    # a 1-long tail is cheaper as a literal byte
                    out.append(0)
                    out.append(v)
                else:
                    out.append((257 - ln) & 0xFF)  # -(ln-1) two's compl.
                    out.append(v)
                run -= ln
        else:
            if lit_start < 0:
                lit_start = s
    flush_literal(n)
    return bytes(out)


def _packbits_decode(buf: memoryview, expect: int) -> bytes:
    """Decode one PackBits strip to exactly ``expect`` bytes."""
    out = bytearray()
    i, n = 0, len(buf)
    while len(out) < expect:
        if i >= n:
            raise ValueError("tiff: truncated PackBits strip")
        ctl = buf[i]
        i += 1
        if ctl < 128:  # literal of ctl+1 bytes
            ln = ctl + 1
            if i + ln > n:
                raise ValueError("tiff: truncated PackBits literal")
            out += buf[i : i + ln]
            i += ln
        elif ctl > 128:  # replicate next byte 257-ctl times
            if i >= n:
                raise ValueError("tiff: truncated PackBits run")
            out += bytes([buf[i]]) * (257 - ctl)
            i += 1
        # ctl == 128: no-op per spec
    if len(out) != expect:
        raise ValueError("tiff: PackBits strip overruns row boundary")
    return bytes(out)


# --- encode --------------------------------------------------------------------


def encode_tiff(
    rgba: np.ndarray,
    compress: bool = True,
    geo: tuple[float, float, float, float] | None = None,
) -> bytes:
    """uint8[h,w,4] (or [h,w,3]) -> little-endian baseline TIFF bytes.

    PackBits per row (TIFF 6.0 §9 row-restart rule) when ``compress``,
    strips sized to ~8 KiB of raw data as the spec recommends.

    ``geo`` = (minx, miny, maxx, maxy) EPSG:3857 mercator bounds makes
    the stream a GeoTIFF (OGC 19-008r4): ModelPixelScaleTag +
    ModelTiepointTag anchor pixel (0,0) at (minx, maxy) with spans
    divided exactly by w/h, and a minimal GeoKeyDirectory declares the
    projected CRS — the georeferencing mapnik's gdal datasource reads.
    """
    if (
        not isinstance(rgba, np.ndarray)
        or rgba.dtype != np.uint8
        or rgba.ndim != 3
        or rgba.shape[2] not in (3, 4)
    ):
        raise ValueError("encode_tiff expects HxWx3 or HxWx4 uint8")
    h, w, spp = rgba.shape
    row_bytes = w * spp
    rows_per_strip = max(1, min(h, 8192 // max(1, row_bytes)))
    n_strips = (h + rows_per_strip - 1) // rows_per_strip

    flat = rgba.reshape(h, row_bytes)
    strips: list[bytes] = []
    for s in range(n_strips):
        r0 = s * rows_per_strip
        r1 = min(h, r0 + rows_per_strip)
        if compress:
            strips.append(
                b"".join(_packbits_encode_row(flat[r]) for r in range(r0, r1))
            )
        else:
            strips.append(flat[r0:r1].tobytes())

    entries: list[tuple[int, int, int, bytes | int]] = []  # tag, type, count, val
    extra: list[bytes] = []  # out-of-line values, laid out after the IFD

    header = 8
    n_entries = 10 + (1 if spp == 4 else 0) + (3 if geo is not None else 0)
    ifd_size = 2 + 12 * n_entries + 4
    extra_base = header + ifd_size

    def add(tag: int, typ: int, values: list) -> None:
        count = len(values)
        size = _TYPE_SIZE[typ] * count
        ch = {_TYPE_SHORT: "H", _TYPE_LONG: "I", _TYPE_DOUBLE: "d"}[typ]
        packed = struct.pack("<" + ch * count, *values)
        if size <= 4:
            entries.append((tag, typ, count, packed.ljust(4, b"\0")))
        else:
            off = extra_base + sum(len(e) for e in extra)
            extra.append(packed if size % 2 == 0 else packed + b"\0")
            entries.append((tag, typ, count, struct.pack("<I", off)))

    add(_T_WIDTH, _TYPE_LONG, [w])
    add(_T_LENGTH, _TYPE_LONG, [h])
    add(_T_BITS, _TYPE_SHORT, [8] * spp)
    add(_T_COMPRESSION, _TYPE_SHORT, [32773 if compress else 1])
    add(_T_PHOTOMETRIC, _TYPE_SHORT, [2])  # RGB
    # strip offsets are filled after we know the data base
    strip_off_idx = len(entries)
    add(_T_STRIP_OFFSETS, _TYPE_LONG, [0] * n_strips)
    add(_T_SAMPLES, _TYPE_SHORT, [spp])
    add(_T_ROWS_PER_STRIP, _TYPE_LONG, [rows_per_strip])
    add(_T_STRIP_COUNTS, _TYPE_LONG, [len(s) for s in strips])
    add(_T_PLANAR, _TYPE_SHORT, [1])
    if spp == 4:
        add(_T_EXTRA_SAMPLES, _TYPE_SHORT, [2])  # unassociated alpha
    if geo is not None:
        minx, miny, maxx, maxy = (float(v) for v in geo)
        if not (maxx > minx and maxy > miny):
            raise ValueError(f"encode_tiff: degenerate geo bbox {geo}")
        add(_T_PIXEL_SCALE, _TYPE_DOUBLE, [(maxx - minx) / w, (maxy - miny) / h, 0.0])
        add(_T_TIEPOINT, _TYPE_DOUBLE, [0.0, 0.0, 0.0, minx, maxy, 0.0])
        add(_T_GEO_KEYS, _TYPE_SHORT, list(_GEO_KEYS_3857))

    data_base = extra_base + sum(len(e) for e in extra)
    offs, cur = [], data_base
    for s in strips:
        offs.append(cur)
        cur += len(s) + (len(s) & 1)  # keep strips word-aligned
    packed_offs = struct.pack("<" + "I" * n_strips, *offs)
    tag, typ, count, val = entries[strip_off_idx]
    if len(packed_offs) <= 4:
        entries[strip_off_idx] = (tag, typ, count, packed_offs.ljust(4, b"\0"))
    else:
        # the placeholder already reserved an extra slot of this size —
        # find it by matching the recorded offset
        off = struct.unpack("<I", val)[0]
        idx = 0
        run = extra_base
        for i, e in enumerate(extra):
            if run == off:
                idx = i
                break
            run += len(e)
        extra[idx] = packed_offs
        entries[strip_off_idx] = (tag, typ, count, val)

    out = bytearray()
    out += b"II*\0" + struct.pack("<I", header)
    out += struct.pack("<H", n_entries)
    for tag, typ, count, val in sorted(entries):  # IFD must be tag-ascending
        out += struct.pack("<HHI", tag, typ, count) + val
    out += struct.pack("<I", 0)  # no next IFD
    for e in extra:
        out += e
    for s in strips:
        out += s
        if len(s) & 1:
            out += b"\0"
    return bytes(out)


# --- decode --------------------------------------------------------------------


def read_geo_bbox(buf: bytes) -> tuple[float, float, float, float] | None:
    """Parse GeoTIFF georeferencing (ModelPixelScale + ModelTiepoint)
    from a TIFF stream -> (minx, miny, maxx, maxy), or None when the
    stream carries no geo tags (a plain TIFF). Both byte orders.
    Malformed structure raises ValueError like decode_tiff."""
    return read_geo_info(buf)[2]


def read_geo_info(
    buf: bytes,
) -> tuple[int, int, tuple[float, float, float, float] | None]:
    """ONE header-only IFD walk -> (w, h, bbox | None) — the ingest
    entry (geotiff_footprints) needs both dims and bbox; walking the
    IFD once instead of read_dims + read_geo_bbox halves the parse."""
    try:
        if len(buf) < 8:
            raise ValueError("tiff: truncated header")
        bo = {b"II": "<", b"MM": ">"}.get(buf[:2])
        if bo is None:
            raise ValueError("tiff: bad byte-order mark")
        _magic, ifd_off = struct.unpack(bo + "HI", buf[2:8])
        (n_entries,) = struct.unpack(bo + "H", buf[ifd_off : ifd_off + 2])
        dims = {}
        geo = {}
        for i in range(n_entries):
            off = ifd_off + 2 + 12 * i
            tag, typ, count = struct.unpack(bo + "HHI", buf[off : off + 8])
            val4 = buf[off + 8 : off + 12]
            if tag in (_T_WIDTH, _T_LENGTH) and typ in (_TYPE_SHORT, _TYPE_LONG):
                ch = "H" if typ == _TYPE_SHORT else "I"
                dims[tag] = struct.unpack(bo + ch, val4[: _TYPE_SIZE[typ]])[0]
            elif tag in (_T_PIXEL_SCALE, _T_TIEPOINT) and typ == _TYPE_DOUBLE:
                (doff,) = struct.unpack(bo + "I", val4)
                total = 8 * count
                if doff + total > len(buf):
                    raise ValueError("tiff: geo tag value out of range")
                geo[tag] = struct.unpack(
                    bo + "d" * count, buf[doff : doff + total]
                )
        if _T_WIDTH not in dims or _T_LENGTH not in dims:
            raise ValueError("tiff: missing dimension tags")
        w, h = dims[_T_WIDTH], dims[_T_LENGTH]
        if _T_PIXEL_SCALE not in geo or _T_TIEPOINT not in geo:
            return (w, h, None)
        sx, sy = geo[_T_PIXEL_SCALE][0], geo[_T_PIXEL_SCALE][1]
        tp = geo[_T_TIEPOINT]
        if len(tp) < 6 or sx <= 0 or sy <= 0:
            raise ValueError("tiff: malformed georeferencing")
        # raster point (tp[0], tp[1]) maps to model (tp[3], tp[4])
        minx = tp[3] - tp[0] * sx
        maxy = tp[4] + tp[1] * sy
        return (w, h, (minx, maxy - h * sy, minx + w * sx, maxy))
    except ValueError:
        raise
    except Exception as e:
        raise ValueError(f"tiff: malformed stream ({type(e).__name__})") from e


def read_dims(buf: bytes) -> tuple[int, int]:
    """(w, h) from the IFD alone — header-only, no strip decode (the
    ingest path reads dimensions without paying for pixel decode)."""
    try:
        bo = {b"II": "<", b"MM": ">"}.get(buf[:2])
        if bo is None:
            raise ValueError("tiff: bad byte-order mark")
        _magic, ifd_off = struct.unpack(bo + "HI", buf[2:8])
        (n_entries,) = struct.unpack(bo + "H", buf[ifd_off : ifd_off + 2])
        dims = {}
        for i in range(n_entries):
            off = ifd_off + 2 + 12 * i
            tag, typ, _count = struct.unpack(bo + "HHI", buf[off : off + 8])
            if tag in (_T_WIDTH, _T_LENGTH) and typ in (_TYPE_SHORT, _TYPE_LONG):
                ch = "H" if typ == _TYPE_SHORT else "I"
                dims[tag] = struct.unpack(
                    bo + ch, buf[off + 8 : off + 8 + _TYPE_SIZE[typ]]
                )[0]
        if _T_WIDTH not in dims or _T_LENGTH not in dims:
            raise ValueError("tiff: missing dimension tags")
        return dims[_T_WIDTH], dims[_T_LENGTH]
    except ValueError:
        raise
    except Exception as e:
        raise ValueError(f"tiff: malformed stream ({type(e).__name__})") from e


def decode_tiff(buf: bytes) -> np.ndarray:
    """TIFF bytes -> uint8[h,w,4] (RGB comes back with opaque alpha).

    Accepts II/MM byte order, compression 1/32773, 8-bit RGB(A)
    chunky. Contract: EVERY malformed input raises ValueError
    (fuzz-pinned by tests/test_tiff.py)."""
    try:
        return _decode_tiff(buf)
    except ValueError:
        raise
    except Exception as e:  # struct/index/overflow on garbage input
        raise ValueError(f"tiff: malformed stream ({type(e).__name__})") from e


def _decode_tiff(buf: bytes) -> np.ndarray:
    if len(buf) < 8:
        raise ValueError("tiff: truncated header")
    order = buf[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ValueError("tiff: bad byte-order mark")
    magic, ifd_off = struct.unpack(bo + "HI", buf[2:8])
    if magic != 42:
        raise ValueError("tiff: bad magic")
    if ifd_off + 2 > len(buf):
        raise ValueError("tiff: IFD offset out of range")
    (n_entries,) = struct.unpack(bo + "H", buf[ifd_off : ifd_off + 2])
    end = ifd_off + 2 + 12 * n_entries
    if end + 4 > len(buf):
        raise ValueError("tiff: truncated IFD")

    def read_values(typ: int, count: int, val4: bytes) -> list[int]:
        size = _TYPE_SIZE.get(typ)
        if size is None:
            raise ValueError(f"tiff: unknown field type {typ}")
        total = size * count
        raw = val4[:total] if total <= 4 else None
        if raw is None:
            (off,) = struct.unpack(bo + "I", val4)
            if off + total > len(buf):
                raise ValueError("tiff: tag value out of range")
            raw = buf[off : off + total]
        if typ == _TYPE_SHORT:
            return list(struct.unpack(bo + "H" * count, raw))
        if typ == _TYPE_LONG:
            return list(struct.unpack(bo + "I" * count, raw))
        if typ == 1:  # BYTE
            return list(raw)
        raise ValueError(f"tiff: unsupported type {typ} for a needed tag")

    tags: dict[int, list[int]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack(bo + "HHI", buf[off : off + 8])
        if tag in (
            _T_WIDTH, _T_LENGTH, _T_BITS, _T_COMPRESSION, _T_PHOTOMETRIC,
            _T_STRIP_OFFSETS, _T_SAMPLES, _T_ROWS_PER_STRIP, _T_STRIP_COUNTS,
            _T_PLANAR,
        ):
            tags[tag] = read_values(typ, count, buf[off + 8 : off + 12])

    for need in (_T_WIDTH, _T_LENGTH, _T_STRIP_OFFSETS, _T_STRIP_COUNTS):
        if need not in tags:
            raise ValueError(f"tiff: missing required tag {need}")
    w = tags[_T_WIDTH][0]
    h = tags[_T_LENGTH][0]
    spp = tags.get(_T_SAMPLES, [1])[0]
    bits = tags.get(_T_BITS, [8] * spp)
    comp = tags.get(_T_COMPRESSION, [1])[0]
    photo = tags.get(_T_PHOTOMETRIC, [2])[0]
    planar = tags.get(_T_PLANAR, [1])[0]
    rows_per_strip = tags.get(_T_ROWS_PER_STRIP, [h])[0]
    if spp not in (3, 4) or photo != 2:
        raise ValueError(f"tiff: only RGB(A) supported (spp={spp}, photo={photo})")
    if any(b != 8 for b in bits):
        raise ValueError(f"tiff: only 8-bit samples supported ({bits})")
    if planar != 1:
        raise ValueError("tiff: only chunky PlanarConfiguration=1 supported")
    if comp not in (1, 32773):
        raise ValueError(f"tiff: unsupported compression {comp}")
    if w <= 0 or h <= 0 or rows_per_strip <= 0:
        raise ValueError("tiff: bad dimensions")

    offsets = tags[_T_STRIP_OFFSETS]
    counts = tags[_T_STRIP_COUNTS]
    if len(offsets) != len(counts):
        raise ValueError("tiff: StripOffsets/StripByteCounts mismatch")
    row_bytes = w * spp
    raw = bytearray()
    rows_done = 0
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(buf):
            raise ValueError("tiff: strip out of range")
        strip_rows = min(rows_per_strip, h - rows_done)
        expect = strip_rows * row_bytes
        chunk = memoryview(buf)[off : off + cnt]
        if comp == 1:
            if cnt < expect:
                raise ValueError("tiff: short uncompressed strip")
            raw += chunk[:expect]
        else:
            raw += _packbits_decode(chunk, expect)
        rows_done += strip_rows
    if rows_done < h:
        raise ValueError("tiff: strips cover fewer rows than ImageLength")

    img = np.frombuffer(bytes(raw), dtype=np.uint8).reshape(h, w, spp)
    if spp == 3:
        out = np.empty((h, w, 4), dtype=np.uint8)
        out[..., :3] = img
        out[..., 3] = 255
        return out
    return img.copy()
