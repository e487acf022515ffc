"""G.711 mu-law codec: spec vectors, idempotence, quantization
quality, and parity between table decode and formula decode."""

import numpy as np

from mapnik_vector_tile_spark.functions import g711


def test_spec_vectors():
    # canonical reference-table anchors
    assert g711.mulaw_encode(np.array([0]))[0] == 0xFF
    assert g711.mulaw_encode(np.array([32767]))[0] == 0x80
    assert g711.mulaw_encode(np.array([-32768]))[0] == 0x00
    assert g711.mulaw_decode(np.array([0x80], np.uint8))[0] == 32124
    assert g711.mulaw_decode(np.array([0x00], np.uint8))[0] == -32124
    assert g711.mulaw_decode(np.array([0xFF], np.uint8))[0] == 0


def test_code_idempotence():
    # encode(decode(c)) == c for all codes except 0x7F: negative zero
    # decodes to 0, which re-encodes positive (0xFF) — the classic
    # G.711 degeneracy, pinned rather than papered over
    codes = np.arange(256, dtype=np.uint8)
    rt = g711.mulaw_encode(g711.mulaw_decode(codes))
    bad = np.nonzero(rt != codes)[0]
    assert list(bad) == [0x7F]
    assert rt[0x7F] == 0xFF


def test_full_range_quantization():
    x = np.arange(-32768, 32768, dtype=np.int64)
    d = g711.mulaw_decode(g711.mulaw_encode(x)).astype(np.int64)
    # sign preserved (negatives stay <= 0, positives stay >= 0)
    assert (d[x < -3] < 0).all()
    assert (d[x >= 0] >= 0).all()
    # logarithmic quantization: error bounded by half the largest step
    assert int(np.abs(d - x).max()) <= 1024
    snr = 10 * np.log10(
        float((x.astype(float) ** 2).mean())
        / float(((d - x).astype(float) ** 2).mean())
    )
    assert snr > 35.0
    # decode is monotone non-decreasing over re-ordered code space
    dec = g711.MULAW_TABLE
    pos = np.sort(dec)
    assert pos[0] == -32124 and pos[-1] == 32124


def test_table_matches_formula():
    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(g711.MULAW_TABLE, g711.mulaw_decode(codes))


def test_alaw_spec_pins():
    # Sun g711.c linear2alaw/alaw2linear parity points
    assert g711.alaw_encode(np.array([0]))[0] == 0xD5  # positive zero
    assert g711.alaw_encode(np.array([32767]))[0] == 0xAA
    assert g711.alaw_encode(np.array([-32768]))[0] == 0x2A
    assert g711.alaw_decode(np.array([0xD5], np.uint8))[0] == 8
    assert g711.alaw_decode(np.array([0x55], np.uint8))[0] == -8
    assert g711.alaw_decode(np.array([0xAA], np.uint8))[0] == 32256
    assert g711.alaw_decode(np.array([0x2A], np.uint8))[0] == -32256


def test_alaw_code_idempotence():
    codes = np.arange(256, dtype=np.uint8)
    rt = g711.alaw_encode(g711.alaw_decode(codes))
    assert (rt == codes).all()  # every code is a fixed point


def test_alaw_full_range_error_bound():
    x = np.arange(-32768, 32768, dtype=np.int64)
    d = g711.alaw_decode(g711.alaw_encode(x)).astype(np.int64)
    err = np.abs(d - x)
    # top segment (seg 7) quantizes in steps of 1024: |err| <= 512 + 8
    assert err.max() <= 520
    # small amplitudes quantize to step 16 (seg 0 step 16 on the
    # 16-bit scale): fine resolution where the ear needs it
    small = np.abs(x) < 256
    assert err[small].max() <= 8


def test_alaw_table_matches_decode():
    dec = g711.ALAW_TABLE
    assert dec.shape == (256,)
    assert np.array_equal(
        dec, g711.alaw_decode(np.arange(256, dtype=np.uint8))
    )


def test_adpcm_tracks_smooth_signal():
    import numpy as np

    from mapnik_vector_tile_spark.functions.adpcm import (
        adpcm_decode,
        adpcm_encode,
    )

    t = np.arange(512)
    sm = (1000 * np.sin(t / 20)).astype(np.int16)
    enc = adpcm_encode(sm)
    assert len(enc) == 256  # 4:1 vs pcm16
    dec = adpcm_decode(enc, 512)
    err = np.abs(sm.astype(np.int64) - dec.astype(np.int64))
    assert err.max() <= 64  # quantizer tracks a gentle slope closely


def test_adpcm_clamps_and_odd_length():
    import numpy as np

    from mapnik_vector_tile_spark.functions.adpcm import (
        adpcm_decode,
        adpcm_encode,
    )

    # full-scale square wave forces predictor clamp at both rails
    sq = np.tile([32767, -32768], 50).astype(np.int16)
    dec = adpcm_decode(adpcm_encode(sq), 100)
    assert dec.max() <= 32767 and dec.min() >= -32768
    # odd sample count pads the final nibble, decode count is honored
    odd = np.arange(7, dtype=np.int16) * 100
    enc = adpcm_encode(odd)
    assert len(enc) == 4
    assert adpcm_decode(enc, 7).shape == (7,)
