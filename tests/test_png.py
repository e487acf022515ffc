"""Real PNG codec (functions.png): bit-exact round-trip, filter
heuristic value, spec structure (signature/CRC/chunks), fuzz contract."""

import struct
import zlib

import numpy as np
import pytest

from mapnik_vector_tile_spark.functions.png import decode_png, encode_png
from mapnik_vector_tile_spark.sources.synth import make_pixels


def test_roundtrip_bit_exact_gradient_noise():
    for i in (0, 3, 9):
        rgba = make_pixels(i, 57, 43)
        assert (decode_png(encode_png(rgba)) == rgba).all()


def test_roundtrip_random_and_rgb():
    rng = np.random.RandomState(2)
    noise = rng.randint(0, 256, (31, 17, 4), dtype=np.uint8)
    assert (decode_png(encode_png(noise)) == noise).all()
    rgb = noise[..., :3].copy()
    back = decode_png(encode_png(rgb))
    assert (back[..., :3] == rgb).all()
    assert (back[..., 3] == 255).all()


def test_filters_compress_smooth_content():
    """Scanline filters are the point of PNG: a smooth gradient must
    compress far below filterless zlib of the raw pixels."""
    yy, xx = np.mgrid[0:64, 0:64]
    smooth = np.stack(
        [xx * 2 % 256, yy * 2 % 256, (xx + yy) % 256,
         np.full((64, 64), 255)], -1
    ).astype(np.uint8)
    png = encode_png(smooth)
    raw_zlib = len(zlib.compress(smooth.tobytes(), 6))
    assert len(png) < raw_zlib / 10
    assert (decode_png(png) == smooth).all()


def test_every_filter_type_unfilters():
    """Force each filter id through the decoder by hand-building a
    stream (2x2 RGBA, one row per filter exercised across images)."""
    rng = np.random.RandomState(4)
    for _ in range(20):
        img = rng.randint(0, 256, (5, 4, 4), dtype=np.uint8)
        assert (decode_png(encode_png(img)) == img).all()
    # explicit per-filter streams: build IDAT manually with filter f
    base = rng.randint(0, 256, (3, 2, 4), dtype=np.uint8)
    for f in range(5):
        h, w, ch = base.shape
        raw = base.reshape(h, w * ch).astype(np.int16)
        rows = []
        prev = np.zeros(w * ch, dtype=np.int16)
        for y in range(h):
            line = raw[y]
            if f == 0:
                filt = line % 256
            elif f == 1:
                left = np.zeros(w * ch, dtype=np.int16)
                left[ch:] = line[:-ch]
                filt = (line - left) % 256
            elif f == 2:
                filt = (line - prev) % 256
            elif f == 3:
                left = np.zeros(w * ch, dtype=np.int16)
                left[ch:] = line[:-ch]
                filt = (line - (left + prev) // 2) % 256
            else:
                filt = np.empty(w * ch, dtype=np.int16)
                for x in range(w * ch):
                    a = int(line[x - ch]) if x >= ch else 0
                    c = int(prev[x - ch]) if x >= ch else 0
                    b = int(prev[x])
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                    filt[x] = (line[x] - pred) % 256
            rows.append(bytes([f]) + bytes(filt.astype(np.uint8)))
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)

        def chunk(tag, payload):
            body = tag + payload
            return (
                len(payload).to_bytes(4, "big") + body
                + (zlib.crc32(body) & 0xFFFFFFFF).to_bytes(4, "big")
            )

        buf = (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"".join(rows)))
            + chunk(b"IEND", b"")
        )
        assert (decode_png(buf) == base).all(), f


def test_malformed_folds_to_valueerror():
    buf = encode_png(make_pixels(5, 40, 40))
    with pytest.raises(ValueError):
        decode_png(b"NOPE" + buf[4:])
    bad = bytearray(buf)
    bad[30] ^= 0xFF  # corrupt IHDR payload -> CRC fails
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    for cut in range(0, len(buf), 41):
        try:
            decode_png(buf[:cut])
        except ValueError:
            continue
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"cut={cut}: {type(e).__name__} escaped")
    # corrupt IDAT body (zlib error path)
    bad2 = bytearray(buf)
    idat = buf.find(b"IDAT")
    bad2[idat + 6] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad2))


def test_rejects_unsupported_shapes():
    with pytest.raises(ValueError):
        encode_png(np.zeros((4, 4), dtype=np.uint8))
    # 16-bit depth stream rejected cleanly
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 6, 0, 0, 0)

    def chunk(tag, payload):
        body = tag + payload
        return (
            len(payload).to_bytes(4, "big") + body
            + (zlib.crc32(body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    buf = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(buf)
