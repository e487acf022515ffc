"""dvid8-rle: lossless inter-frame delta + run-length video codec —
pure numpy, fully vectorized, the sandbox-real "compressed video"
codec for the input_hint media corpus (sources.multimodal).

Bitstream: flatten the uint8 luma planes [n_frames, h, w] frame-major,
transform to mod-256 deltas (d[0] = x[0], d[k] = x[k] - x[k-1] mod
256 — the temporal/spatial predictor), then emit maximal runs of equal
delta bytes as (run_len - 1 : uint8, value : uint8) pairs, runs longer
than 256 split. Slowly-varying content (gradients, static shots)
collapses to long constant-delta runs, so this genuinely compresses
(the synthetic moving-gradient corpus shrinks ~100x; tests pin < 0.5
on it and exact round-trip on adversarial random frames, where RLE
pays its worst-case 2x and stays a *correct* codec).

Decode is two vectorized ops — np.repeat of the run values and a
cumulative sum mod 256 — with no per-sample Python, and the same two
ops batch across MANY videos at once: operators.multimodal expands all
rows' runs in one array and re-bases each row's cumsum by subtracting
the prefix total at its row start (exact under mod-256), so a mixed
Arrow batch decodes without a per-row loop.

Error contract (fuzz-pinned like functions.jpeg): malformed payloads
raise ValueError — odd byte length, or expanded size != w*h*n_frames.
"""

from __future__ import annotations

import numpy as np


def encode(frames: np.ndarray) -> bytes:
    """uint8[n_frames, h, w] (or any uint8 array) -> dvid8-rle bytes."""
    flat = np.asarray(frames, dtype=np.uint8).ravel().astype(np.int64)
    n = len(flat)
    if n == 0:
        return b""
    d = np.empty(n, dtype=np.int64)
    d[0] = flat[0]
    d[1:] = (flat[1:] - flat[:-1]) % 256
    change = np.nonzero(np.diff(d))[0] + 1
    starts = np.concatenate([[0], change])
    lens = np.diff(np.concatenate([starts, [n]]))
    vals = d[starts]
    # split runs > 256 into uint8-addressable chunks
    n_chunks = (lens + 255) // 256
    rep = np.repeat(np.arange(len(lens), dtype=np.int64), n_chunks)
    total_chunks = len(rep)
    chunk_start = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
    intra = np.arange(total_chunks, dtype=np.int64) - np.repeat(
        chunk_start, n_chunks
    )
    lens_r = np.minimum(lens[rep] - 256 * intra, 256)
    out = np.empty(2 * total_chunks, dtype=np.uint8)
    out[0::2] = (lens_r - 1).astype(np.uint8)
    out[1::2] = vals[rep].astype(np.uint8)
    return out.tobytes()


def decode(buf: bytes, w: int, h: int, n_frames: int) -> np.ndarray:
    """dvid8-rle bytes -> uint8[n_frames, h, w]. ValueError on
    malformed input (odd length, expanded size mismatch)."""
    need = int(w) * int(h) * int(n_frames)
    arr = np.frombuffer(buf, dtype=np.uint8)
    if len(arr) % 2:
        raise ValueError(
            f"dvid8-rle: odd payload length {len(arr)} (must be "
            f"(run,value) pairs)"
        )
    lens = arr[0::2].astype(np.int64) + 1
    vals = arr[1::2]
    total = int(lens.sum())
    if total != need:
        raise ValueError(
            f"dvid8-rle: payload expands to {total} samples, header "
            f"says {need} (w={w} h={h} n_frames={n_frames})"
        )
    if need == 0:
        return np.zeros((n_frames, h, w), dtype=np.uint8)
    flat = np.cumsum(np.repeat(vals, lens).astype(np.int64)) % 256
    return flat.astype(np.uint8).reshape(int(n_frames), int(h), int(w))
