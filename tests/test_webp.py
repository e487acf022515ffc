"""Real WebP-lossless / VP8L codec (functions.webp): bit-exact
round-trip, spec container structure, prefix-code machinery, decoder
extras (LZ77 + color cache), fuzz contract."""

import numpy as np
import pytest

from mapnik_vector_tile_spark.functions import webp as W
from mapnik_vector_tile_spark.sources.synth import make_pixels


def test_roundtrip_bit_exact():
    for i in range(6):
        rgba = make_pixels(i, 31 + i, 23 + 2 * i)
        assert (W.decode_webp(W.encode_webp(rgba)) == rgba).all(), i


def test_roundtrip_shapes_and_rgb():
    rng = np.random.RandomState(3)
    for shape in ((1, 1, 4), (3, 200, 4), (200, 3, 4), (16, 16, 3)):
        img = rng.randint(0, 256, shape, dtype=np.uint8)
        back = W.decode_webp(W.encode_webp(img))
        if shape[2] == 4:
            assert (back == img).all(), shape
        else:
            assert (back[..., :3] == img).all()
            assert (back[..., 3] == 255).all()


def test_container_structure():
    buf = W.encode_webp(make_pixels(0, 20, 20))
    assert buf[:4] == b"RIFF"
    assert buf[8:16] == b"WEBPVP8L"
    assert int.from_bytes(buf[4:8], "little") == len(buf) - 8
    assert buf[20] == 0x2F  # VP8L signature byte


def test_subtract_green_wins_on_gray():
    rng = np.random.RandomState(0)
    g = rng.randint(0, 256, (64, 64), dtype=np.uint8)
    gray = np.stack([g, g, g, np.full((64, 64), 255, np.uint8)], -1)
    buf = W.encode_webp(gray)
    assert (W.decode_webp(buf) == gray).all()
    # r,b collapse to one symbol; only green carries entropy
    assert len(buf) < gray.size * 0.3


def test_prefix_code_serialization_roundtrip():
    rng = np.random.RandomState(7)
    for n in (280, 256, 40, 19):
        for _ in range(5):
            counts = np.zeros(n, dtype=np.int64)
            k = rng.randint(1, min(n, 220))
            idx = rng.choice(n, size=k, replace=False)
            counts[idx] = rng.randint(1, 5000, size=k)
            lengths = W._huff_lengths(counts)
            # Kraft completeness (valid decodable prefix code)
            assert float((0.5 ** lengths[lengths > 0]).sum()) <= 1.0 + 1e-12
            bw = W._BitWriter()
            W._emit_code(bw, lengths)
            bw.flush()
            got = W._read_code(W._BitReader(bytes(bw.out)), n)
            assert np.array_equal(got, lengths), (n, k)


def test_decoder_handles_lz77_backrefs():
    """Hand-assemble a stream with a length-1 distance-1 backward
    reference (our encoder never emits backrefs; foreign encoders do):
    green symbol 256 = length prefix 0 -> length 1; distance tree is a
    single symbol = prefix 1 -> dist code 2 -> plane map (1,0) ->
    distance 1. Pixel 1 must copy pixel 0."""
    bw = W._BitWriter()
    bw.write(2, 14)  # w-1 -> w=3
    bw.write(0, 14)  # h-1 -> h=1
    bw.write(0, 1)   # alpha hint
    bw.write(0, 3)   # version
    bw.write(0, 1)   # no transforms
    bw.write(0, 1)   # no cache
    bw.write(0, 1)   # no meta
    glen = np.zeros(280, dtype=np.int64)
    glen[7] = 1
    glen[256] = 1
    W._emit_code(bw, glen)
    for sym in (9, 11, 255):  # r, b, a single-symbol codes
        lens = np.zeros(256, dtype=np.int64)
        lens[sym] = 1
        W._emit_code(bw, lens)
    dlen = np.zeros(40, dtype=np.int64)
    dlen[1] = 1  # distance prefix 1 -> dist code 2 -> distance 1
    W._emit_code(bw, dlen)
    gc = W._canonical_codes(glen)
    W._write_code(bw, *gc[7])    # pixel 0 literal (r/b/a zero-bit)
    W._write_code(bw, *gc[256])  # backref: len 1, dist tree zero-bit
    W._write_code(bw, *gc[7])    # pixel 2 literal
    bw.flush()
    payload = b"\x2f" + bytes(bw.out)
    if len(payload) % 2:
        payload += b"\x00"
    buf = (
        b"RIFF"
        + (len(payload) + 12).to_bytes(4, "little")
        + b"WEBPVP8L"
        + len(payload).to_bytes(4, "little")
        + payload
    )
    out = W.decode_webp(buf)
    assert out.shape == (1, 3, 4)
    expect = [9, 7, 11, 255]  # r, g, b, a
    assert out[0, 0].tolist() == expect
    assert out[0, 1].tolist() == expect  # copied by the backref
    assert out[0, 2].tolist() == expect


def test_malformed_folds_to_valueerror():
    buf = W.encode_webp(make_pixels(4, 24, 24))
    with pytest.raises(ValueError):
        W.decode_webp(b"XIFF" + buf[4:])
    with pytest.raises(ValueError):
        W.decode_webp(buf[:12] + b"VP8X" + buf[16:])  # lossy/extended
    for cut in range(0, len(buf), 31):
        try:
            W.decode_webp(buf[:cut])
        except ValueError:
            continue
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"cut={cut}: {type(e).__name__} escaped")
    # random bit flips in the payload must never escape ValueError
    rng = np.random.RandomState(5)
    for _ in range(30):
        bad = bytearray(buf)
        k = rng.randint(21, len(buf))
        bad[k] ^= 1 << rng.randint(8)
        try:
            W.decode_webp(bytes(bad))
        except ValueError:
            pass


def test_encode_rejects_bad_shapes():
    with pytest.raises(ValueError):
        W.encode_webp(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        W.encode_webp(np.zeros((0, 4, 4), dtype=np.uint8))
