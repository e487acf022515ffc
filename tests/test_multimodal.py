"""Multimodal binary-column plumbing: deterministic synth, decode
kernels, windowed audio features, 1→N frame sampling, stub policy."""

import numpy as np
import pytest

from mapnik_vector_tile_spark.operators import multimodal as mm
from mapnik_vector_tile_spark.sources import multimodal as src


def test_gen_audio_deterministic_and_decodable():
    a = src.gen_audio_pdf(20, 0)
    b = src.gen_audio_pdf(20, 0)
    assert list(a["audio_id"]) == list(b["audio_id"])
    assert all(x == y for x, y in zip(a["bytes"], b["bytes"]))
    row = a[a["codec"] == "pcm16le"].iloc[0]
    x = mm.decode_audio(row["bytes"], row["codec"], int(row["n_samples"]))
    assert x.shape == (int(row["n_samples"]),)
    assert np.abs(x).max() <= 1.0


def test_gen_video_shape_and_decode():
    v = src.gen_video_pdf(10, 5)
    row = v[v["codec"] == "rawvid8"].iloc[0]
    vid = mm.decode_video(
        row["bytes"], row["codec"], int(row["w"]), int(row["h"]),
        int(row["n_frames"]),
    )
    assert vid.shape == (int(row["n_frames"]), int(row["h"]), int(row["w"]))


def test_decode_stubs_raise():
    with pytest.raises(NotImplementedError):
        mm.decode_audio(b"", "mp3-stub", 0)
    with pytest.raises(NotImplementedError):
        mm.decode_video(b"", "h264-stub", 1, 1, 1)


def test_audio_features_distributed(spark):
    df = src.audio_df(spark, 60, slices=4)
    feats = mm.audio_features(df).toPandas()
    # since r3 EVERY corpus codec decodes (mp1 rows included — the
    # former mp3 stub is a real MPEG-1 Layer I decoder now)
    assert len(feats) == 60
    assert (feats["n_windows"] >= 1).all()
    assert feats["rms_mean"].between(0, 1).all()
    # caption preserved bit-exact (input_hint invariant analog)
    pdf = src.gen_audio_pdf(60, 0)
    caps = dict(zip(pdf["audio_id"], pdf["caption"]))
    assert all(caps[r.audio_id] == r.caption for r in feats.itertuples())


def test_frame_sample_fanout(spark):
    df = src.video_df(spark, 30, slices=3)
    frames = mm.sample_frames(df, every=4).toPandas()
    pdf = src.gen_video_pdf(30, 0)
    # every corpus codec decodes (mpeg1v included since r4)
    expected = int(sum((pdf["n_frames"] + 3) // 4))
    assert len(frames) == expected
    # frame payload round-trips to the exact source plane
    r = frames.iloc[0]
    srow = pdf[pdf["video_id"] == r["video_id"]].iloc[0]
    vid = mm.decode_video(
        srow["bytes"], srow["codec"], int(srow["w"]), int(srow["h"]),
        int(srow["n_frames"]),
    )
    got = np.frombuffer(r["frame"], dtype=np.uint8).reshape(
        int(r["h"]), int(r["w"])
    )
    assert (got == vid[int(r["frame_idx"])]).all()
    assert abs(float(r["mean_luma"]) - float(vid[int(r["frame_idx"])].mean())) < 1e-9


def test_strict_mode_surfaces_stub(spark):
    # every corpus codec decodes since r3, so strict mode is
    # exercised with an explicit stub-codec row
    rows = [
        ("ok", (b"\x00\x01" * 2048), 8000, 2048, "pcm16le", "c"),
        ("bad", b"\x00" * 64, 8000, 64, "opus-stub", "c"),
    ]
    df = spark.createDataFrame(
        rows,
        "audio_id string, bytes binary, sr int, n_samples int, "
        "codec string, caption string",
    )
    with pytest.raises(Exception):  # Py4J wraps the NotImplementedError
        mm.audio_features(df, skip_undecodable=False).collect()
    assert mm.audio_features(df).count() == 1  # skip mode drops it


def test_batch_audio_decode_matches_scalar_all_codecs():
    a = src.gen_audio_pdf(63, 0)
    pos, samples, offs, nsv = mm._batch_decode_audio(a, True)
    assert set(a.iloc[list(pos)]["codec"]) == {
        "pcm16le", "mulaw", "alaw", "mp1",
    }
    for k, i in enumerate(pos):
        row = a.iloc[int(i)]
        ref = mm.decode_audio(
            row["bytes"], row["codec"], int(row["n_samples"])
        )
        got = samples[offs[k]:offs[k + 1]].astype(np.float64) / 32768.0
        assert np.array_equal(ref, got), row["codec"]


def test_batch_video_decodes_compressed_rows():
    v = src.gen_video_pdf(60, 0)
    out = mm.frame_sample_batch(v, 4, True)
    dv_ids = set(v[v["codec"] == "dvid8-rle"]["video_id"])
    assert dv_ids and dv_ids <= set(out["video_id"])
    sub = out[out["video_id"].isin(dv_ids)]
    for _, r in sub.iterrows():
        srow = v[v["video_id"] == r["video_id"]].iloc[0]
        vid = mm.decode_video(
            srow["bytes"], srow["codec"], int(srow["w"]), int(srow["h"]),
            int(srow["n_frames"]),
        )
        got = np.frombuffer(r["frame"], np.uint8).reshape(
            int(r["h"]), int(r["w"])
        )
        assert (got == vid[int(r["frame_idx"])]).all()
        assert (
            abs(float(r["mean_luma"]) - float(vid[int(r["frame_idx"])].mean()))
            < 1e-9
        )


def test_batch_video_skips_malformed_dvid8():
    v = src.gen_video_pdf(30, 0).copy()
    # isolate the malformed-dvid8 contract from the (slower) lossy
    # sub-path: keep only fixed-stride codecs, truncate one payload
    v = v[v["codec"] != "mpeg1v"].reset_index(drop=True)
    dvpos = v.index[v["codec"] == "dvid8-rle"][0]
    v.loc[dvpos, "bytes"] = v.loc[dvpos, "bytes"][:-1]  # odd length
    out = mm.frame_sample_batch(v, 4, True)
    assert v.loc[dvpos, "video_id"] not in set(out["video_id"])
    with pytest.raises(ValueError):
        mm.frame_sample_batch(v, 4, False)


def test_scene_cuts_threshold_and_codecs(spark):
    """T14b: smooth motion below threshold emits nothing, a hard cut
    emits exactly its boundary with the exact integer SAD, dvid8-rle
    decodes through the same path, undecodable codecs are skipped."""
    import numpy as np

    from mapnik_vector_tile_spark.functions import dvid8
    from mapnik_vector_tile_spark.operators.multimodal import scene_cuts

    w = h = 8
    smooth = np.stack(
        [np.full((h, w), 10 + 2 * f, np.uint8) for f in range(5)]
    )
    cutv = smooth.copy()
    cutv[3:] = 200  # hard cut at frame 3: SAD = |200-14|*64 = 11904
    rows = [
        ("smooth", smooth.tobytes(), w, h, 5, 10, "rawvid8", "c"),
        ("cut", cutv.tobytes(), w, h, 5, 10, "rawvid8", "c"),
        ("cut_rle", dvid8.encode(cutv), w, h, 5, 10, "dvid8-rle", "c"),
        ("stub", b"\x00" * 16, 2, 2, 4, 10, "h264-stub", "c"),
    ]
    df = spark.createDataFrame(
        rows,
        "video_id string, bytes binary, w int, h int, n_frames int, "
        "fps int, codec string, caption string",
    )
    got = {
        r.video_id: (r.frame_idx, r.sad)
        for r in scene_cuts(df, thr_per_px=40).collect()
    }
    assert got == {
        "cut": (3, (200 - 14) * 64),
        "cut_rle": (3, (200 - 14) * 64),
    }


def test_silence_trim_runs_and_codecs(spark):
    """T13c: leading/trailing runs counted in full frames, interior
    silence counted but not trimmed, all-silent clip reports
    lead == trail == n_win, mulaw decodes through the same path."""
    import numpy as np

    from mapnik_vector_tile_spark.functions.g711 import mulaw_encode
    from mapnik_vector_tile_spark.operators.multimodal import silence_trim

    W = 256
    tone = np.full(W, 5000, dtype=np.int64)
    zero = np.zeros(W, dtype=np.int64)
    # lead 2 frames, active 3, interior silent 1, active 1, trail 1
    sig = np.concatenate([zero, zero, tone, tone, tone, zero, tone, zero])
    rows = [
        ("a", sig.astype("<i2").tobytes(), 8000, len(sig), "pcm16le", "c"),
        ("b", np.zeros(3 * W, "<i2").tobytes(), 8000, 3 * W, "pcm16le", "c"),
        ("c", mulaw_encode(sig).tobytes(), 8000, len(sig), "mulaw", "c"),
        ("d", b"\x00" * 32, 8000, 512, "mp3-stub", "c"),
    ]
    df = spark.createDataFrame(
        rows,
        "audio_id string, bytes binary, sr int, n_samples int, "
        "codec string, caption string",
    )
    got = {
        r.audio_id: (r.n_win, r.n_silent, r.lead, r.trail)
        for r in silence_trim(df, window=W, thr_per_sample=10_000).collect()
    }
    assert got["a"] == (8, 4, 2, 1)
    assert got["b"] == (3, 3, 3, 3)
    # mulaw is lossy but 5000 -> companded value stays >> threshold
    assert got["c"] == (8, 4, 2, 1)
    assert "d" not in got


def test_resample_decimate_floor_and_tail(spark):
    """T13d: floor-divided block means (negatives floor toward -inf,
    matching the SQL twin's pmod construction), tail partial block
    dropped, undecodable codecs skipped."""
    import numpy as np

    from mapnik_vector_tile_spark.operators.multimodal import (
        resample_decimate,
    )

    s = np.array([1, 2, 3, -1, -2, -2, 7], dtype="<i2")  # 7 samples, M=3
    df = spark.createDataFrame(
        [
            ("a", s.tobytes(), "pcm16le", 7),
            ("b", b"", "mp3", 100),  # stub codec: skipped
        ],
        "audio_id string, bytes binary, codec string, n_samples long",
    )
    out = {r.audio_id: r for r in resample_decimate(df, factor=3).collect()}
    assert set(out) == {"a"}
    # blocks: (1+2+3)//3 = 2; (-1-2-2)//3 = -5//3 = -2 (floor!); tail [7] dropped
    assert out["a"].n_out == 2
    assert out["a"].dec_sum == 2 + (-2)
    assert out["a"].dec_min == -2 and out["a"].dec_max == 2


def test_mpeg1_l1_roundtrip_psnr_gate():
    """Every mp1 corpus clip round-trips through the real Layer I
    codec at PSNR >= 40 dB (full-scale int16), with spec framing:
    672-byte frames, fixed 448k/32kHz mono header."""
    from mapnik_vector_tile_spark.functions import mpeg1 as mp
    from mapnik_vector_tile_spark.sources.synth import splitmix64

    for idx in (0, 21, 42, 462, 483):
        h = int(splitmix64(np.array([idx], dtype=np.uint64))[0])
        ns = 2000 + h % 6001
        amp = 6000 + ((h >> 16) % 26000)
        p = 16 + ((h >> 40) % 480)
        a = 1 + 2 * ((h >> 8) % 128)
        k = np.arange(ns, dtype=np.int64)
        pcm = (((k % p) * a) % (2 * amp) - amp).astype(np.int16)
        enc = mp.mpeg1_l1_encode(pcm)
        assert len(enc) % mp.FRAME_BYTES == 0
        assert all(
            enc[f : f + 4] == mp.HEADER
            for f in range(0, len(enc), mp.FRAME_BYTES)
        )
        dec = mp.mpeg1_l1_decode(enc, ns)
        mse = np.mean((dec.astype(np.float64) - pcm) ** 2)
        psnr = 10 * np.log10(32768.0**2 / max(mse, 1e-12))
        assert psnr >= 40.0, (idx, psnr)


def test_mpeg1_filterbank_zero_delay_alignment():
    """Impulse through analysis+synthesis peaks exactly at its input
    position (the indexing convention _DELAY = 0 documents)."""
    from mapnik_vector_tile_spark.functions import mpeg1 as mp

    x = np.zeros(4000)
    x[2000] = 1.0
    y = mp._synthesis(mp._analysis(x))
    assert int(np.argmax(np.abs(y))) == mp.TAPS + 2000


def test_mpeg1_decode_error_contracts():
    from mapnik_vector_tile_spark.functions import mpeg1 as mp

    with pytest.raises(ValueError, match="truncated"):
        mp.mpeg1_l1_decode(b"\x00" * 100, 10)
    with pytest.raises(ValueError, match="header"):
        mp.mpeg1_l1_decode(b"\x00" * mp.FRAME_BYTES, 10)
    # forbidden allocation code 15 in the first band
    bad = bytearray(mp.HEADER) + bytearray(mp.FRAME_BYTES - 4)
    bad[4] = 0xF0
    with pytest.raises(ValueError, match="allocation"):
        mp.mpeg1_l1_decode(bytes(bad), 10)


def test_mpeg1_rows_decode_in_batch_kernel(spark):
    """mp1 rows flow through the vectorized batch decoder and land in
    the windowed features with plausible energy (lossy: compare rms
    against the exact pcm16 rms of the same waveform within 1%)."""
    pdf = src.gen_audio_pdf(43, 0)
    mp1 = pdf[pdf["codec"] == "mp1"]
    assert len(mp1) == 3  # idx 0, 21, 42
    df = src.audio_df(spark, 43, slices=2)
    feats = mm.audio_features(df).toPandas().set_index("audio_id")
    for aid in mp1["audio_id"]:
        row = pdf[pdf["audio_id"] == aid].iloc[0]
        from mapnik_vector_tile_spark.sources.synth import splitmix64

        idx = int(aid.split("_")[1])
        h = int(splitmix64(np.array([idx], dtype=np.uint64))[0])
        ns = int(row["n_samples"])
        amp = 6000 + ((h >> 16) % 26000)
        p = 16 + ((h >> 40) % 480)
        a = 1 + 2 * ((h >> 8) % 128)
        k = np.arange(ns, dtype=np.int64)
        pcm = (((k % p) * a) % (2 * amp) - amp) / 32768.0
        # reference = the same statistic (mean of per-full-window rms)
        # on the EXACT waveform; the lossy codec must stay within 1%
        nw = ns // 1024
        wins = pcm[: nw * 1024].reshape(nw, 1024)
        rms_ref = float(np.mean(np.sqrt(np.mean(wins**2, axis=1))))
        got = float(feats.loc[aid, "rms_mean"])
        assert abs(got - rms_ref) <= 0.01 * max(rms_ref, 1e-9) + 1e-4
