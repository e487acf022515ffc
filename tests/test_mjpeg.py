"""MJPEG lossy video codec (functions.mjpeg) + the grayscale JPEG mode
it rides on (functions.jpeg 1-component streams) + the sampler's
random-access mjpeg branch (operators.multimodal._mjpeg_sample_rows)."""

import numpy as np
import pandas as pd
import pytest

from mapnik_vector_tile_spark.functions import mjpeg
from mapnik_vector_tile_spark.functions.jpeg import decode_jpeg, encode_jpeg
from mapnik_vector_tile_spark.operators import multimodal as mm
from mapnik_vector_tile_spark.sources.multimodal import gen_mjpeg_video_pdf


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10.0 * np.log10(255.0**2 / mse) if mse else np.inf


def _planes(idx: int, w: int, h: int, nf: int) -> np.ndarray:
    from mapnik_vector_tile_spark.sources.synth import splitmix64

    hv = int(splitmix64(np.array([idx], dtype=np.uint64))[0])
    fy, fx = np.mgrid[0:h, 0:w]
    return (
        (fx[None] * 3 + fy[None] * 5)
        + (np.arange(nf)[:, None, None] * 7 + hv % 251)
    ).astype(np.int64) % 256


def test_gray_jpeg_roundtrip_psnr_and_compression():
    fy, fx = np.mgrid[0:48, 0:64]
    g = ((fx * 3 + fy * 5) % 256).astype(np.uint8)
    buf = encode_jpeg(g, quality=98)
    back = decode_jpeg(buf)
    assert back.shape == (48, 64, 4)
    # grayscale stream decodes with R == G == B == Y, opaque alpha
    assert (back[..., 0] == back[..., 1]).all()
    assert (back[..., 0] == back[..., 2]).all()
    assert (back[..., 3] == 255).all()
    assert _psnr(back[..., 0], g) >= 40.0
    assert len(buf) < g.size  # headers amortized: actually compresses


def test_gray_jpeg_odd_dims_and_flat():
    g = np.full((17, 23), 200, dtype=np.uint8)
    back = decode_jpeg(encode_jpeg(g, 90))
    assert back.shape == (17, 23, 4)
    assert _psnr(back[..., 0], g) >= 40.0


def test_mjpeg_roundtrip_all_frames():
    frames = _planes(7, 64, 48, 5).astype(np.uint8)
    buf = mjpeg.encode(frames, quality=98)
    back = mjpeg.decode(buf, 64, 48, 5)
    assert back.shape == frames.shape
    assert _psnr(back, frames) >= 40.0


def test_mjpeg_decode_frame_matches_full_decode():
    frames = _planes(11, 40, 40, 6).astype(np.uint8)
    buf = mjpeg.encode(frames, quality=95)
    full = mjpeg.decode(buf, 40, 40, 6)
    for fi in (0, 3, 5):
        one = mjpeg.decode_frame(buf, 40, 40, 6, fi)
        assert (one == full[fi]).all()


def test_mjpeg_malformed_raises_valueerror():
    frames = _planes(3, 40, 40, 3).astype(np.uint8)
    buf = mjpeg.encode(frames)
    with pytest.raises(ValueError):
        mjpeg.decode(b"XXXX" + buf[4:], 40, 40, 3)  # bad magic
    with pytest.raises(ValueError):
        mjpeg.decode(buf[:10], 40, 40, 3)  # truncated payload
    with pytest.raises(ValueError):
        mjpeg.decode(buf + b"\x00", 40, 40, 3)  # trailing bytes
    with pytest.raises(ValueError):
        mjpeg.decode(buf, 40, 40, 4)  # n_frames beyond container
    with pytest.raises(ValueError):
        mjpeg.decode(buf, 39, 40, 3)  # metadata dims mismatch
    # frame-level corruption inside a JPEG stream also folds to
    # ValueError (the jpeg fuzz contract) — flip bytes mid-stream
    corrupt = bytearray(buf)
    for k in range(20, 26):
        corrupt[k] ^= 0xFF
    try:
        mjpeg.decode(bytes(corrupt), 40, 40, 3)
    except ValueError:
        pass  # raising ValueError is the contract; decoding is fine too


def test_mjpeg_fuzz_truncations_valueerror_only():
    frames = _planes(5, 40, 40, 4).astype(np.uint8)
    buf = mjpeg.encode(frames)
    for cut in range(0, len(buf), 97):
        try:
            mjpeg.decode(buf[:cut], 40, 40, 4)
        except ValueError:
            continue
        except Exception as e:  # pragma: no cover
            raise AssertionError(
                f"cut={cut}: {type(e).__name__} escaped (contract is "
                f"ValueError-only)"
            )


def test_batch_sampler_matches_scalar_decode():
    pdf = gen_mjpeg_video_pdf(9)
    out = mm.frame_sample_batch(pdf, every=2, skip_undecodable=False)
    assert (out["video_id"].str.startswith("mjv_")).all()
    by_vid = dict(tuple(out.groupby("video_id", sort=False)))
    for r in pdf.itertuples(index=False):
        full = mm.decode_video(
            r.bytes, "mjpeg", int(r.w), int(r.h), int(r.n_frames)
        )
        got = by_vid[r.video_id].sort_values("frame_idx")
        want_idx = list(range(0, int(r.n_frames), 2))
        assert list(got["frame_idx"]) == want_idx
        for fi, frame_bytes, luma in zip(
            got["frame_idx"], got["frame"], got["mean_luma"]
        ):
            plane = np.frombuffer(frame_bytes, dtype=np.uint8).reshape(
                int(r.h), int(r.w)
            )
            assert (plane == full[fi]).all()
            assert luma == pytest.approx(
                float(full[fi].sum(dtype=np.int64)) / (r.w * r.h)
            )


def test_batch_sampler_mixed_corpus_policies():
    from mapnik_vector_tile_spark.sources.multimodal import gen_video_pdf

    mixed = pd.concat(
        [gen_mjpeg_video_pdf(6), gen_video_pdf(12)], ignore_index=True
    )
    out = mm.frame_sample_batch(mixed, every=4, skip_undecodable=True)
    # every corpus codec decodes for real now — mjpeg, the lossless
    # pair (rawvid8 / dvid8-rle), and the mpeg1v rows that replaced
    # the former h264 stub must all appear in the sampled output
    assert (out["video_id"].str.startswith("mjv_")).any()
    assert (out["video_id"].str.startswith("vid_")).any()
    m1_ids = set(mixed.loc[mixed["codec"] == "mpeg1v", "video_id"])
    assert m1_ids and m1_ids <= set(out["video_id"])
    # an unknown codec row is still skipped (the old stub behavior,
    # now exercised synthetically)
    unk = mixed.iloc[[0]].copy()
    unk["video_id"] = ["unk_0"]
    unk["codec"] = ["h264-stub"]
    out2 = mm.frame_sample_batch(
        pd.concat([mixed, unk], ignore_index=True), every=4,
        skip_undecodable=True,
    )
    assert "unk_0" not in set(out2["video_id"])
    # strict mode: a truncated mjpeg row raises ValueError
    bad = gen_mjpeg_video_pdf(3)
    bad.loc[1, "bytes"] = bad.loc[1, "bytes"][:8]
    with pytest.raises(ValueError):
        mm.frame_sample_batch(bad, every=2, skip_undecodable=False)
    ok = mm.frame_sample_batch(bad, every=2, skip_undecodable=True)
    assert bad.loc[1, "video_id"] not in set(ok["video_id"])


def test_mjpeg_corpus_psnr_and_compression_contract():
    pdf = gen_mjpeg_video_pdf(24)
    raw = (pdf["w"] * pdf["h"] * pdf["n_frames"]).to_numpy()
    comp = pdf["bytes"].map(len).to_numpy()
    assert (comp < raw).all()
    for r in pdf.itertuples(index=False):
        i = int(r.video_id[4:])
        ref = _planes(i, int(r.w), int(r.h), int(r.n_frames))
        back = mjpeg.decode(r.bytes, int(r.w), int(r.h), int(r.n_frames))
        assert _psnr(back, ref) >= 40.0


def test_corrupt_metadata_folds_to_valueerror_not_memoryerror():
    """A row whose typed metadata is garbage (huge n_frames/dims, tiny
    buffer) must fold to ValueError — allocation happens per DECODED
    frame, never from raw metadata."""
    frames = _planes(1, 40, 40, 2).astype(np.uint8)
    buf = mjpeg.encode(frames)
    with pytest.raises(ValueError):
        mjpeg.decode(buf, 1 << 20, 1 << 20, 1 << 20)
    with pytest.raises(ValueError):
        mjpeg.decode(buf, 40, 40, 0)  # non-positive frame count
    with pytest.raises(ValueError):
        mjpeg.decode(buf, 40, 40, -3)


def test_frame_dims_header_parse():
    frames = _planes(2, 56, 40, 1).astype(np.uint8)
    buf = mjpeg.encode(frames)
    ln = int.from_bytes(buf[4:8], "big")
    w, h = mjpeg.frame_dims(buf[8 : 8 + ln])
    assert (w, h) == (56, 40)
    with pytest.raises(ValueError):
        mjpeg.frame_dims(b"\x00\x01")


def test_sampler_rejects_mixed_dims_container_whole():
    """Frame 1 has different dims than metadata: even when only frame 0
    is sampled (every=2), the batch sampler must reject the row WHOLE
    (header-level dims validation of skipped frames), matching the
    scalar decode_video contract."""
    from mapnik_vector_tile_spark.functions.jpeg import encode_jpeg

    f0 = _planes(1, 40, 40, 1).astype(np.uint8)[0]
    f1 = np.zeros((64, 64), dtype=np.uint8)
    parts = [mjpeg.MAGIC]
    for fr in (f0, f1):
        j = encode_jpeg(fr, 95)
        parts += [len(j).to_bytes(4, "big"), j]
    buf = b"".join(parts)
    pdf = pd.DataFrame(
        {
            "video_id": ["bad"],
            "bytes": [buf],
            "w": np.array([40], dtype=np.int32),
            "h": np.array([40], dtype=np.int32),
            "n_frames": np.array([2], dtype=np.int32),
            "fps": np.array([10], dtype=np.int32),
            "codec": ["mjpeg"],
            "caption": ["c"],
        }
    )
    # scalar decode rejects
    with pytest.raises(ValueError):
        mm.decode_video(buf, "mjpeg", 40, 40, 2)
    # batch sampler: skip policy drops the row whole, strict raises
    out = mm.frame_sample_batch(pdf, every=2, skip_undecodable=True)
    assert out is None or "bad" not in set(out["video_id"])
    with pytest.raises(ValueError):
        mm.frame_sample_batch(pdf, every=2, skip_undecodable=False)
