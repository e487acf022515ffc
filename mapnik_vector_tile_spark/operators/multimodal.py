"""Multimodal feature extraction over opaque binary columns — the
training-data-pipeline surface for audio/video payloads (images are
handled for real in operators.raster).

Everything is Arrow-batched ``mapInPandas`` over the typed-metadata
tables of sources.multimodal: decode is a per-codec kernel (real for
the sandbox codecs ``pcm16le``/``rawvid8``, NotImplementedError stubs
for compressed codecs — no audio/video libs in this container), and
the Spark-side plumbing (schema, batch shape, partitioning, 1→N frame
explode) is fully real and tested.

Scale posture: per-row decode is embarrassingly parallel — one narrow
mapInPandas stage, no shuffle; frame sampling is a 1→N fan-out like
tile assignment (operators.tiling), rows amplified inside the batch,
never via a driver loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

AUDIO_FEATURES_SCHEMA = (
    "audio_id string, n_windows int, rms_mean double, rms_max double, "
    "zcr_mean double, caption string"
)
FRAME_SAMPLE_SCHEMA = (
    "video_id string, frame_idx int, w int, h int, mean_luma double, "
    "frame binary, caption string"
)
AUDIO_WINDOWS_SCHEMA = (
    "audio_id string, win bigint, sum_sq bigint, n_zc bigint"
)


def decode_audio(buf: bytes, codec: str, n_samples: int) -> np.ndarray:
    """bytes -> float64[n_samples] in [-1, 1). Stub for compressed."""
    if codec == "pcm16le":
        return (
            np.frombuffer(buf, dtype="<i2", count=n_samples).astype(np.float64)
            / 32768.0
        )
    raise NotImplementedError(
        f"audio codec {codec!r}: no decoder in this sandbox (stub)"
    )


def decode_video(
    buf: bytes, codec: str, w: int, h: int, n_frames: int
) -> np.ndarray:
    """bytes -> uint8[n_frames, h, w] luma. Stub for compressed."""
    if codec == "rawvid8":
        return np.frombuffer(buf, dtype=np.uint8, count=w * h * n_frames).reshape(
            n_frames, h, w
        )
    raise NotImplementedError(
        f"video codec {codec!r}: no decoder in this sandbox (stub)"
    )


# rms_mean is defined on a 1e-12 grid (per-window rms quantized to an
# int64 before the cross-window average) so the clip-level aggregate
# is a sum of integers — order-free under any partitioning / shuffle /
# SQL engine, the standard determinism trick for distributed float
# reductions.  Per-window rms itself is bit-exact everywhere: Σs² is
# an exact int64 and the divisor window·32768² is a power of two.
RMS_GRID = 1e12


def audio_features(
    audio: DataFrame, window: int = 1024, skip_undecodable: bool = True
) -> DataFrame:
    """Per-clip windowed RMS + zero-crossing-rate features.

    Every output is order-free and engine-exact (full DuckDB oracle
    q_audio_features): rms_max is a max over deterministic doubles,
    zcr_mean is an exact integer ratio Σzc / (n_w·(window−1)), and
    rms_mean averages 1e-12-grid-quantized per-window rms values
    (see RMS_GRID).  Undecodable codecs are skipped (the standard
    pipeline policy for a corpus with mixed codecs) unless
    ``skip_undecodable=False``, which surfaces the stub's
    NotImplementedError."""
    denom = float(window) * 32768.0 * 32768.0

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "audio_id", "n_windows", "rms_mean", "rms_max", "zcr_mean",
                "caption",
            )}
            for row in pdf.itertuples(index=False):
                try:
                    x = decode_audio(row.bytes, row.codec, int(row.n_samples))
                except (NotImplementedError, ValueError):
                    # NotImplementedError: stub codec; ValueError:
                    # truncated/corrupt payload (frombuffer short
                    # read) — one bad row must not abort the corpus
                    if skip_undecodable:
                        continue
                    raise
                n_w = len(x) // window
                if n_w == 0:
                    continue
                s = (x[: n_w * window] * 32768.0).astype(np.int64)
                xw = s.reshape(n_w, window)
                sum_sq = (xw * xw).sum(axis=1)
                neg = xw < 0
                n_zc = (neg[:, 1:] != neg[:, :-1]).sum(axis=1)
                rms = np.sqrt(sum_sq / denom)
                rms_q = np.floor(rms * RMS_GRID + 0.5)
                out["audio_id"].append(row.audio_id)
                out["n_windows"].append(n_w)
                out["rms_mean"].append(float(rms_q.sum() / (n_w * RMS_GRID)))
                out["rms_max"].append(float(rms.max()))
                out["zcr_mean"].append(
                    float(int(n_zc.sum()) / (n_w * (window - 1.0)))
                )
                out["caption"].append(row.caption)
            yield pd.DataFrame(out)

    return audio.mapInPandas(gen, schema=AUDIO_FEATURES_SCHEMA)


def audio_window_features(
    audio: DataFrame, window: int = 1024, skip_undecodable: bool = True
) -> DataFrame:
    """Per-window INTEGER-EXACT features: energy = Σ s² over the raw
    int16 samples of each full ``window``-sample block, and zero
    crossings = count of (s<0) sign transitions inside the block.

    This is the full-oracle counterpart of the float clip-level
    ``audio_features``: integer outputs mean no float summation
    anywhere, so the DuckDB twin (plans.oracle_pairs.q_audio_windows)
    value-hashes bit-exactly. The clip-level query stays rows-only
    because its rms_mean/zcr_mean average unrounded float64 across
    windows, where SQL aggregation order is unspecified."""

    def gen(batches):
        for pdf in batches:
            ids: list[str] = []
            wins: list[np.ndarray] = []
            sums: list[np.ndarray] = []
            zcs: list[np.ndarray] = []
            for row in pdf.itertuples(index=False):
                try:
                    x = decode_audio(row.bytes, row.codec, int(row.n_samples))
                except (NotImplementedError, ValueError):
                    if skip_undecodable:
                        continue
                    raise
                # decode_audio yields s/32768 with s int16 — the scale
                # is a power of two, so multiplying back is exact
                s = (x * 32768.0).astype(np.int64)
                n_w = len(s) // window
                if n_w == 0:
                    continue
                xw = s[: n_w * window].reshape(n_w, window)
                neg = xw < 0
                ids.extend([row.audio_id] * n_w)
                wins.append(np.arange(n_w, dtype=np.int64))
                sums.append((xw * xw).sum(axis=1))
                zcs.append((neg[:, 1:] != neg[:, :-1]).sum(axis=1))
            yield pd.DataFrame(
                {
                    "audio_id": ids,
                    "win": np.concatenate(wins) if wins else [],
                    "sum_sq": np.concatenate(sums) if sums else [],
                    "n_zc": np.concatenate(zcs) if zcs else [],
                }
            )

    return audio.mapInPandas(gen, schema=AUDIO_WINDOWS_SCHEMA)


def sample_frames(
    video: DataFrame, every: int = 4, skip_undecodable: bool = True
) -> DataFrame:
    """1→N frame sampling: every ``every``-th frame as its own row with
    mean-luma feature + raw frame bytes (downstream encoders attach
    here). Fan-out happens inside the Arrow batch — no driver loop."""

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in (
                "video_id", "frame_idx", "w", "h", "mean_luma", "frame",
                "caption",
            )}
            for row in pdf.itertuples(index=False):
                try:
                    vid = decode_video(
                        row.bytes, row.codec, int(row.w), int(row.h),
                        int(row.n_frames),
                    )
                except (NotImplementedError, ValueError):
                    # NotImplementedError: stub codec; ValueError:
                    # truncated/corrupt payload (frombuffer short
                    # read) — one bad row must not abort the corpus
                    if skip_undecodable:
                        continue
                    raise
                sel = np.arange(0, vid.shape[0], every)
                frames = vid[sel]
                lumas = frames.mean(axis=(1, 2))
                for j, fi in enumerate(sel):
                    out["video_id"].append(row.video_id)
                    out["frame_idx"].append(int(fi))
                    out["w"].append(int(row.w))
                    out["h"].append(int(row.h))
                    out["mean_luma"].append(float(lumas[j]))
                    out["frame"].append(frames[j].tobytes())
                    out["caption"].append(row.caption)
            yield pd.DataFrame(out)

    return video.mapInPandas(gen, schema=FRAME_SAMPLE_SCHEMA)
