"""MPEG-1 video I-frame codec (functions.mpeg1video) — the T14 lossy
video gate that replaced the h264 stub: PSNR contract, random access,
syntax/error contracts, and the frame-sampling sub-path."""

import numpy as np
import pandas as pd
import pytest

from mapnik_vector_tile_spark.functions import mpeg1video as mv
from mapnik_vector_tile_spark.operators import multimodal as mm
from mapnik_vector_tile_spark.sources import multimodal as src


def _gradient(n, h, w, phase=11):
    fy, fx = np.mgrid[0:h, 0:w]
    return np.stack(
        [((fx * 3 + fy * 5 + k * 7 + phase) % 256) for k in range(n)]
    ).astype(np.uint8)


def _psnr(a, b):
    d = a.astype(np.int64) - b.astype(np.int64)
    sse = int((d * d).sum())
    return 10 * np.log10(255 * 255 * d.size / max(sse, 1))


def test_roundtrip_psnr_and_compression():
    """The input_hint lossy invariant: PSNR >= 40 dB on the hardest
    corpus content (mod-256 wrap edges), and actual compression."""
    frames = _gradient(4, 40, 64)
    buf = mv.encode(frames)
    assert len(buf) < frames.nbytes
    out = mv.decode(buf, 64, 40, 4)
    assert out.shape == frames.shape
    assert _psnr(out, frames) >= 40.0


def test_roundtrip_noise_and_flat():
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, size=(2, 32, 48), dtype=np.uint8)
    assert _psnr(mv.decode(mv.encode(noise), 48, 32, 2), noise) >= 28.0
    flat = np.full((3, 16, 16), 77, np.uint8)
    out = mv.decode(mv.encode(flat), 16, 16, 3)
    # flat content survives almost exactly (DC path is near-lossless)
    assert np.abs(out.astype(int) - 77).max() <= 1


def test_non_multiple_of_16_dims():
    """Edge-replicated macroblock padding must crop back exactly."""
    frames = _gradient(2, 23, 41)
    out = mv.decode(mv.encode(frames), 41, 23, 2)
    assert out.shape == (2, 23, 41)
    assert _psnr(out, frames) >= 38.0


def test_decode_frame_random_access_parity():
    frames = _gradient(6, 40, 40)
    buf = mv.encode(frames)
    full = mv.decode(buf, 40, 40, 6)
    for k in (0, 3, 5):
        assert np.array_equal(mv.decode_frame(buf, 40, 40, 6, k), full[k])
    with pytest.raises(ValueError, match="out of range"):
        mv.decode_frame(buf, 40, 40, 6, 6)


def test_error_contracts_are_valueerror():
    frames = _gradient(2, 16, 16)
    buf = mv.encode(frames)
    with pytest.raises(ValueError, match="sequence header"):
        mv.decode(b"\x00\x00\x01\x00" + buf[4:], 16, 16, 2)
    with pytest.raises(ValueError, match="metadata"):
        mv.decode(buf, 32, 16, 2)
    with pytest.raises(ValueError):  # wrong frame count
        mv.decode(buf, 16, 16, 3)
    with pytest.raises(ValueError):  # truncation
        mv.decode(buf[:-6], 16, 16, 2)
    with pytest.raises(ValueError, match="trailing"):
        mv.decode(buf + b"\x00", 16, 16, 2)
    with pytest.raises(ValueError):
        mv.decode(buf, 16, 16, 0)
    # qscale domain
    with pytest.raises(ValueError):
        mv.encode(frames, qscale=0)
    with pytest.raises(ValueError):
        mv.encode(frames, qscale=32)


def test_syntax_pins():
    """Start codes present and byte-aligned; I-picture type coded."""
    buf = mv.encode(_gradient(2, 16, 24))
    assert buf.startswith(b"\x00\x00\x01\xb3")
    assert buf.endswith(b"\x00\x00\x01\xb7")
    assert buf.count(b"\x00\x00\x01\x00") == 2  # two pictures
    # slice start codes: rows 1..mbh per picture (16px -> 1 row)
    assert buf.count(b"\x00\x00\x01\x01") == 2


def test_corpus_contract():
    """gen_mpeg1_video_pdf rows: all mpeg1v, compressed, PSNR-clean
    through the scalar decode path."""
    pdf = src.gen_mpeg1_video_pdf(6)
    assert (pdf["codec"] == "mpeg1v").all()
    for r in pdf.itertuples(index=False):
        assert len(r.bytes) < r.w * r.h * r.n_frames
        out = mm.decode_video(r.bytes, "mpeg1v", r.w, r.h, r.n_frames)
        i = int(r.video_id[4:])
        from mapnik_vector_tile_spark.sources.synth import splitmix64

        # int() BEFORE the modulo: np.uint64 % python-int promotes to
        # float64 and silently corrupts the low bits
        phase = int(splitmix64(np.array([i], np.uint64))[0]) % 251
        ref = _gradient(r.n_frames, r.h, r.w, phase)
        assert _psnr(out, ref) >= 40.0


def test_batch_sampler_mpeg1v_parity_and_policies():
    """The frame-sampling sub-path must equal the scalar decode on
    sampled frames, skip malformed rows under skip_undecodable, and
    raise in strict mode."""
    pdf = src.gen_mpeg1_video_pdf(4)
    out = mm.frame_sample_batch(pdf, every=2, skip_undecodable=False)
    assert set(out["video_id"]) == set(pdf["video_id"])
    by_id = {r.video_id: r for r in pdf.itertuples(index=False)}
    for r in out.itertuples(index=False):
        srcr = by_id[r.video_id]
        full = mm.decode_video(
            srcr.bytes, "mpeg1v", srcr.w, srcr.h, srcr.n_frames
        )
        got = np.frombuffer(r.frame, np.uint8).reshape(r.h, r.w)
        assert np.array_equal(got, full[r.frame_idx])
        assert r.mean_luma == pytest.approx(
            float(full[r.frame_idx].sum(dtype=np.int64)) / (r.w * r.h)
        )
    bad = src.gen_mpeg1_video_pdf(3)
    bad.loc[1, "bytes"] = bad.loc[1, "bytes"][:-5]
    ok = mm.frame_sample_batch(bad, every=2, skip_undecodable=True)
    assert bad.loc[1, "video_id"] not in set(ok["video_id"])
    with pytest.raises(ValueError):
        mm.frame_sample_batch(bad, every=2, skip_undecodable=False)
    # wrong n_frames metadata must also fold to the policy
    bad2 = src.gen_mpeg1_video_pdf(2)
    bad2.loc[0, "n_frames"] = bad2.loc[0, "n_frames"] + 1
    ok2 = mm.frame_sample_batch(bad2, every=2, skip_undecodable=True)
    assert bad2.loc[0, "video_id"] not in set(ok2["video_id"])


def test_mixed_corpus_includes_mpeg1v(spark):
    """End-to-end sample_frames over the standard video corpus: the
    1-in-27 mpeg1v rows decode and appear."""
    vids = src.video_df(spark, 60)
    out = mm.sample_frames(vids, every=4).toPandas()
    m1 = vids.filter("codec = 'mpeg1v'").select("video_id").toPandas()
    assert len(m1) > 0
    assert set(m1["video_id"]) <= set(out["video_id"])
