"""PNG8 palette codec (functions/png8.py) — mapnik save_to_string
("png8") parity: deterministic median cut, indexed color-type-3 PNG.

Contracts pinned here:
  * lossless round-trip when distinct colors <= 256 (palette == the
    distinct colors, ascending packed order);
  * >256-color images: decode equals the independently computed
    palette mapping, palette capped at 256, byte-deterministic;
  * foreign-filter decode: our own decoder handles Sub/Up/Average/
    Paeth rows (the encoder's min-SAD pick exercises them);
  * ValueError (never struct/zlib/Index errors) on malformed input.
"""

import numpy as np
import pytest

from mapnik_vector_tile_spark.functions.png8 import (
    decode_png8,
    encode_png8,
    median_cut_palette,
)
from mapnik_vector_tile_spark.sources.synth import make_pixels


def _distinct(rgba: np.ndarray) -> int:
    c = rgba.reshape(-1, 4).astype(np.uint32)
    return len(np.unique((c[:, 0] << 24) | (c[:, 1] << 16) | (c[:, 2] << 8) | c[:, 3]))


def test_lossless_when_few_colors():
    pal = np.array(
        [[10, 20, 30, 255], [200, 100, 0, 255], [0, 0, 0, 128],
         [255, 255, 255, 255], [7, 7, 7, 255]],
        np.uint8,
    )
    rng = np.random.default_rng(42)
    img = pal[rng.integers(0, 5, (33, 47))]
    buf = encode_png8(img)
    assert buf[:8] == b"\x89PNG\r\n\x1a\n" and buf[25] == 3  # color type 3
    back = decode_png8(buf)
    assert np.array_equal(back, img)
    # alpha < 255 present -> tRNS chunk must exist
    assert b"tRNS" in buf


def test_opaque_image_omits_trns():
    img = np.zeros((4, 4, 4), np.uint8)
    img[..., 3] = 255
    img[0, 0, 0] = 200
    buf = encode_png8(img)
    assert b"tRNS" not in buf
    assert np.array_equal(decode_png8(buf), img)


def test_palette_exactly_distinct_when_small():
    img = np.zeros((2, 3, 4), np.uint8)
    img[..., 3] = 255
    img[0, 1, 0] = 9
    img[1, 2, 1] = 200
    pal, idx = median_cut_palette(img)
    assert _distinct(img) == len(pal)
    assert np.array_equal(pal[idx], img)
    # ascending packed order
    packed = (
        (pal[:, 0].astype(np.uint64) << 24)
        | (pal[:, 1].astype(np.uint64) << 16)
        | (pal[:, 2].astype(np.uint64) << 8)
        | pal[:, 3].astype(np.uint64)
    )
    assert (np.diff(packed.astype(np.int64)) > 0).all()


def test_quantized_roundtrip_and_determinism():
    img = make_pixels(3, 50, 40)
    assert _distinct(img) > 256
    pal, idx = median_cut_palette(img)
    assert len(pal) <= 256
    buf1 = encode_png8(img)
    buf2 = encode_png8(img)
    assert buf1 == buf2
    back = decode_png8(buf1)
    assert np.array_equal(back, pal[idx])
    # quality: bounded error on the gradient+noise corpus (PSNR >= 30)
    err = img[..., :3].astype(np.int64) - back[..., :3].astype(np.int64)
    sse = int((err * err).sum())
    assert sse * 1000 <= img.shape[0] * img.shape[1] * 3 * 255 * 255


def test_max_colors_parameter():
    img = make_pixels(7, 30, 30)
    pal, idx = median_cut_palette(img, max_colors=16)
    assert len(pal) <= 16
    assert idx.max() < len(pal)


def test_malformed_raises_valueerror():
    img = np.zeros((4, 4, 4), np.uint8)
    buf = encode_png8(img)
    with pytest.raises(ValueError):
        decode_png8(b"not a png at all")
    with pytest.raises(ValueError):
        decode_png8(buf[:20])
    with pytest.raises(ValueError):
        decode_png8(buf[:8])  # signature only, no chunks
    bad = bytearray(buf)
    # corrupt the IDAT zlib stream body
    i = buf.index(b"IDAT") + 6
    bad[i] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png8(bytes(bad))
    with pytest.raises(ValueError):
        encode_png8(np.zeros((4, 4, 3), np.uint8))  # needs RGBA


def test_raster_dispatch():
    from mapnik_vector_tile_spark.operators.raster import decode_image, encode_image

    img = make_pixels(11, 20, 20)
    buf = encode_image(img, "png8")
    back = decode_image(buf, "png8", 20, 20)
    assert back.shape == img.shape
    pal, idx = median_cut_palette(img)
    assert np.array_equal(back, pal[idx])
