"""dvid8-rle video codec: exact round-trip, compression on the synth
corpus, worst-case behavior, and the malformed-payload ValueError
contract (fuzz-pinned like functions.jpeg)."""

import numpy as np
import pytest

from mapnik_vector_tile_spark.functions import dvid8


def test_roundtrip_random():
    rng = np.random.default_rng(7)
    for shape in [(1, 1, 1), (3, 5, 4), (8, 17, 23), (2, 64, 64)]:
        fr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        enc = dvid8.encode(fr)
        dec = dvid8.decode(enc, shape[2], shape[1], shape[0])
        assert (dec == fr).all()
        # worst case (no runs) costs exactly 2 bytes per sample
        assert len(enc) <= 2 * fr.size


def test_roundtrip_long_runs():
    # constant frames → single-value delta stream → runs split at 256
    fr = np.full((4, 100, 100), 200, dtype=np.uint8)
    enc = dvid8.encode(fr)
    assert len(enc) <= 2 * ((fr.size + 255) // 256) + 2
    assert (dvid8.decode(enc, 100, 100, 4) == fr).all()


def test_compresses_gradient_corpus():
    from mapnik_vector_tile_spark.sources import multimodal as src

    pdf = src.gen_video_pdf(60, 0)
    dv = pdf[pdf["codec"] == "dvid8-rle"]
    assert len(dv) >= 2
    for _, r in dv.iterrows():
        need = int(r["w"]) * int(r["h"]) * int(r["n_frames"])
        assert len(r["bytes"]) < 0.5 * need  # genuinely compressed
        dec = dvid8.decode(
            r["bytes"], int(r["w"]), int(r["h"]), int(r["n_frames"])
        )
        assert dec.shape == (int(r["n_frames"]), int(r["h"]), int(r["w"]))


def test_malformed_raises():
    fr = np.arange(48, dtype=np.uint8).reshape(3, 4, 4)
    enc = dvid8.encode(fr)
    with pytest.raises(ValueError):
        dvid8.decode(enc[:-1], 4, 4, 3)  # odd length
    with pytest.raises(ValueError):
        dvid8.decode(enc, 4, 4, 4)  # header/payload size mismatch
    with pytest.raises(ValueError):
        dvid8.decode(b"", 4, 4, 3)  # empty payload, nonzero need


def test_fuzz_error_contract():
    # arbitrary byte soup must either decode to the declared shape or
    # raise ValueError — never a crash or a silently wrong shape
    rng = np.random.default_rng(11)
    for n in range(60):
        buf = rng.integers(0, 256, size=int(rng.integers(0, 64)),
                           dtype=np.uint8).tobytes()
        try:
            out = dvid8.decode(buf, 4, 3, 2)
        except ValueError:
            continue
        assert out.shape == (2, 3, 4)
