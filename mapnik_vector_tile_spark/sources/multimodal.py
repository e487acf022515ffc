"""Deterministic synthetic multimodal tables — opaque ``binary``
payload + typed metadata, the training-data-pipeline column shape the
task brief mandates beyond the image path (which operators.raster
covers with real codecs).

Schemas (metadata typed, payload opaque):

- audio: (audio_id string, bytes binary, sr int, n_samples int,
  codec string, caption string)
- video: (video_id string, bytes binary, w int, h int, n_frames int,
  fps int, codec string, caption string)

Payloads are synthesized from the row index via splitmix64 slices, so
any executor can regenerate a row bit-exactly — same recipe as
sources.synth images (FIXTURES.md §1, seed 42). Codecs: ``pcm16le``
(bare little-endian int16 mono), ``mulaw`` and ``alaw`` (both G.711
companding variants, functions.g711 — the same waveform compressed
on the wire),
``rawvid8`` (uint8[n_frames,h,w] luma planes, frame-major) and
``dvid8-rle`` (delta+RLE compressed video, functions.dvid8) are REAL,
as is ``mp1`` (MPEG-1 Audio Layer I frames, functions.mpeg1 — 1 in
21 audio rows, formerly the mp3 stub; lossy, PSNR-gated by
q_audio_mp1) and ``mpeg1v`` (MPEG-1 VIDEO I-frame streams,
functions.mpeg1video — 1 in 27 video rows, formerly the h264 stub;
lossy, PSNR-gated by q_video_mpeg1).  EVERY corpus codec now
decodes for real; the skip/strict policy paths are exercised by
explicit malformed/unknown-codec rows in tests, not by stub rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from mapnik_vector_tile_spark.functions import dvid8
from mapnik_vector_tile_spark.functions.g711 import alaw_encode, mulaw_encode
from mapnik_vector_tile_spark.sources.synth import _WORDS, splitmix64

AUDIO_SCHEMA = (
    "audio_id string, bytes binary, sr int, n_samples int, "
    "codec string, caption string"
)
VIDEO_SCHEMA = (
    "video_id string, bytes binary, w int, h int, n_frames int, "
    "fps int, codec string, caption string"
)


def _caption(h: np.ndarray, prefix: str) -> list[str]:
    w = len(_WORDS)
    a = (h % w).astype(np.int64)
    b = ((h >> np.uint64(16)) % w).astype(np.int64)
    return [f"{prefix} {_WORDS[x]} {_WORDS[y]}" for x, y in zip(a, b)]


def gen_audio_pdf(n: int, start: int = 0) -> pd.DataFrame:
    """Rows [start, start+n): mono sawtooth-with-wraparound clips,
    sr=8000, 0.25-1.0 s.

    The waveform is PURE INTEGER arithmetic on purpose (it replaced an
    earlier sine mixture): sample_k = ((k mod p)·a) mod 2·amp − amp
    with per-clip (amp, p, a) drawn from splitmix64(idx). That makes
    every on-wire int16 reproducible bit-exactly in DuckDB SQL — the
    same trick as the video corpus — so the windowed-feature query can
    be value-hash-gated instead of rows-only (a sine corpus drifts:
    numpy SIMD sin vs DuckDB libm differ ~1 ulp, flipping int16
    truncation near boundaries)."""
    idx = np.arange(start, start + n, dtype=np.uint64)
    h = splitmix64(idx)
    sr = 8000
    n_samples = (2000 + (h % np.uint64(6001))).astype(np.int64)
    # codec mix: 6/7 pcm16le, 1/21 mulaw + 1/21 alaw (both REAL G.711
    # companding variants), 1/21 mp1 (REAL MPEG-1 Layer I frames via
    # functions.mpeg1 — replaced the former mp3-stub; lossy, so the
    # exact-twin feature oracles exclude it and its gate is the
    # q_audio_mp1 PSNR contract). The WAVEFORM is identical across
    # codecs; only the wire encoding differs, so the DuckDB twins
    # regenerate samples closed-form and apply encode∘decode for
    # mulaw/alaw rows.
    def _codec(i: int) -> str:
        if i % 7:
            return "pcm16le"
        if i % 21 == 0:
            return "mp1"
        return "alaw" if i % 14 == 0 else "mulaw"

    codecs = [_codec(int(i)) for i in idx]
    bufs = []
    for i in range(n):
        hp = int(h[i])
        amp = 6000 + ((hp >> 16) % 26000)  # [6000, 31999] ⊂ int16
        p = 16 + ((hp >> 40) % 480)  # samples per ramp period
        a = 1 + 2 * ((hp >> 8) % 128)  # odd step ⇒ varied wraparound
        k = np.arange(int(n_samples[i]), dtype=np.int64)
        s = ((k % p) * a) % (2 * amp) - amp
        if codecs[i] == "mulaw":
            bufs.append(mulaw_encode(s).tobytes())
        elif codecs[i] == "alaw":
            bufs.append(alaw_encode(s).tobytes())
        elif codecs[i] == "mp1":
            from mapnik_vector_tile_spark.functions.mpeg1 import (
                mpeg1_l1_encode,
            )

            bufs.append(mpeg1_l1_encode(s.astype(np.int16)))
        else:
            bufs.append(s.astype("<i2").tobytes())
    return pd.DataFrame(
        {
            "audio_id": [f"aud_{int(i)}" for i in idx],
            "bytes": bufs,
            "sr": np.full(n, sr, dtype=np.int32),
            "n_samples": n_samples.astype(np.int32),
            "codec": codecs,
            "caption": _caption(h, "audio"),
        }
    )


def gen_video_pdf(n: int, start: int = 0) -> pd.DataFrame:
    """Rows [start, start+n): moving-gradient luma planes, 8-32 frames."""
    idx = np.arange(start, start + n, dtype=np.uint64)
    h = splitmix64(idx)
    w = (16 + (h % np.uint64(4)) * np.uint64(8)).astype(np.int64)  # 16..40
    ht = (16 + ((h >> np.uint64(4)) % np.uint64(4)) * np.uint64(8)).astype(
        np.int64
    )
    n_frames = (8 + (h >> np.uint64(12)) % np.uint64(25)).astype(np.int64)
    # codec mix: 8/9 rawvid8, ~2/27 dvid8-rle (REAL lossless delta+RLE
    # compression — decoded frames are bit-identical to the raw
    # planes, so the DuckDB twins' closed-form pixel formula covers
    # both), 1/27 mpeg1v (REAL lossy MPEG-1 I-frame streams,
    # functions.mpeg1video — these decode, but NOT bit-exactly, so
    # exact-pixel oracles exclude them; their decode contract is
    # PSNR-gated by q_video_mpeg1 on its own corpus).  The corpus
    # carries no undecodable codec anymore — the skip/strict policy
    # paths are exercised by explicit malformed rows in tests.
    codecs = [
        "rawvid8" if int(i) % 9
        else ("mpeg1v" if int(i) % 27 == 0 else "dvid8-rle")
        for i in idx
    ]
    bufs = []
    for i in range(n):
        W, H, NF = int(w[i]), int(ht[i]), int(n_frames[i])
        fy, fx = np.mgrid[0:H, 0:W]
        phase = int(h[i] % np.uint64(251))
        frames = (
            (fx[None] * 3 + fy[None] * 5)
            + (np.arange(NF)[:, None, None] * 7 + phase)
        ) % 256
        planes = frames.astype(np.uint8)
        if codecs[i] == "dvid8-rle":
            bufs.append(dvid8.encode(planes))
        elif codecs[i] == "mpeg1v":
            from mapnik_vector_tile_spark.functions import mpeg1video

            bufs.append(mpeg1video.encode(planes))
        else:
            bufs.append(planes.tobytes())
    return pd.DataFrame(
        {
            "video_id": [f"vid_{int(i)}" for i in idx],
            "bytes": bufs,
            "w": w.astype(np.int32),
            "h": ht.astype(np.int32),
            "n_frames": n_frames.astype(np.int32),
            "fps": np.full(n, 10, dtype=np.int32),
            "codec": codecs,
            "caption": _caption(h, "video"),
        }
    )


def gen_mjpeg_video_pdf(n: int, start: int = 0) -> pd.DataFrame:
    """Rows [start, start+n): the LOSSY-video corpus — same
    moving-gradient luma recipe as gen_video_pdf (mod-256 wraps give
    JPEG its hardest edges) but larger frames (40-88 px, where JPEG
    headers amortize) and every row ``mjpeg``-encoded (functions.mjpeg,
    q=98). Frame pixels are closed-form in (idx, x, y, frame): the
    q_video_mjpeg oracle regenerates them to compute the PSNR contract,
    and its DuckDB twin regenerates the METADATA (w, h, n_frames)
    from the same splitmix64 slices."""
    from mapnik_vector_tile_spark.functions import mjpeg

    idx = np.arange(start, start + n, dtype=np.uint64)
    h = splitmix64(idx)
    w = (40 + (h % np.uint64(3)) * np.uint64(24)).astype(np.int64)  # 40/64/88
    ht = (40 + ((h >> np.uint64(4)) % np.uint64(3)) * np.uint64(16)).astype(
        np.int64
    )  # 40/56/72
    n_frames = (4 + (h >> np.uint64(12)) % np.uint64(5)).astype(np.int64)
    bufs = []
    for i in range(n):
        W, H, NF = int(w[i]), int(ht[i]), int(n_frames[i])
        fy, fx = np.mgrid[0:H, 0:W]
        phase = int(h[i] % np.uint64(251))
        frames = (
            (fx[None] * 3 + fy[None] * 5)
            + (np.arange(NF)[:, None, None] * 7 + phase)
        ) % 256
        bufs.append(mjpeg.encode(frames.astype(np.uint8), quality=98))
    return pd.DataFrame(
        {
            "video_id": [f"mjv_{int(i)}" for i in idx],
            "bytes": bufs,
            "w": w.astype(np.int32),
            "h": ht.astype(np.int32),
            "n_frames": n_frames.astype(np.int32),
            "fps": np.full(n, 10, dtype=np.int32),
            "codec": ["mjpeg"] * n,
            "caption": _caption(h, "video"),
        }
    )


def _range_df(spark, n: int, gen_pdf, schema: str, slices: int | None):
    from pyspark.sql import functions as F  # noqa: F401

    slices = slices or max(8, spark.sparkContext.defaultParallelism)
    base = spark.range(0, n, 1, slices)

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            splits = np.nonzero(np.diff(ids) != 1)[0] + 1
            for seg in np.split(ids, splits):
                yield gen_pdf(len(seg), int(seg[0]))

    return base.mapInPandas(gen, schema=schema)


def audio_df(spark, n: int, slices: int | None = None):
    """Distributed deterministic audio table (born partitioned)."""
    return _range_df(spark, n, gen_audio_pdf, AUDIO_SCHEMA, slices)


def video_df(spark, n: int, slices: int | None = None):
    """Distributed deterministic video table (born partitioned)."""
    return _range_df(spark, n, gen_video_pdf, VIDEO_SCHEMA, slices)


def mjpeg_video_df(spark, n: int, slices: int | None = None):
    """Distributed deterministic MJPEG (lossy) video table."""
    return _range_df(spark, n, gen_mjpeg_video_pdf, VIDEO_SCHEMA, slices)


def gen_mpeg1_video_pdf(n: int, start: int = 0) -> pd.DataFrame:
    """Rows [start, start+n): the MPEG-1 I-frame lossy-video corpus —
    the gen_mjpeg_video_pdf recipe (same splitmix64 dims/frames/phase
    slices, same mod-256 moving-gradient luma: the hardest content
    for a DCT codec) but every row encoded as a real MPEG-1 video
    elementary stream (functions.mpeg1video, qscale=2).  Frame pixels
    are closed-form in (idx, x, y, frame): the q_video_mpeg1 oracle
    regenerates them for the PSNR contract, and its DuckDB twin
    regenerates the metadata from the same splitmix64 slices."""
    from mapnik_vector_tile_spark.functions import mpeg1video

    idx = np.arange(start, start + n, dtype=np.uint64)
    h = splitmix64(idx)
    w = (40 + (h % np.uint64(3)) * np.uint64(24)).astype(np.int64)
    ht = (40 + ((h >> np.uint64(4)) % np.uint64(3)) * np.uint64(16)).astype(
        np.int64
    )
    n_frames = (4 + (h >> np.uint64(12)) % np.uint64(5)).astype(np.int64)
    bufs = []
    for i in range(n):
        W, H, NF = int(w[i]), int(ht[i]), int(n_frames[i])
        fy, fx = np.mgrid[0:H, 0:W]
        phase = int(h[i] % np.uint64(251))
        frames = (
            (fx[None] * 3 + fy[None] * 5)
            + (np.arange(NF)[:, None, None] * 7 + phase)
        ) % 256
        bufs.append(mpeg1video.encode(frames.astype(np.uint8)))
    return pd.DataFrame(
        {
            "video_id": [f"m1v_{int(i)}" for i in idx],
            "bytes": bufs,
            "w": w.astype(np.int32),
            "h": ht.astype(np.int32),
            "n_frames": n_frames.astype(np.int32),
            "fps": np.full(n, 10, dtype=np.int32),
            "codec": ["mpeg1v"] * n,
            "caption": _caption(h, "video"),
        }
    )


def mpeg1_video_df(spark, n: int, slices: int | None = None):
    """Distributed deterministic MPEG-1 I-frame (lossy) video table."""
    return _range_df(spark, n, gen_mpeg1_video_pdf, VIDEO_SCHEMA, slices)
