"""IMA/DVI ADPCM (4-bit) — a REAL lossy audio codec from the public
IMA ADPCM specification (the compression used by WAV fmt 0x11, aiff
'ima4', and countless telephony stacks), implemented exactly: every
operation is integer (step table lookup, bit-test quantizer, >>3
reconstruction, [-32768, 32767] predictor clamp, [0, 88] index
clamp), so an encode∘decode chain is bit-reproducible anywhere —
including the DuckDB recursive twin in q_audio_adpcm.

Codec framing (this repo's, documented): no RIFF container — a clip
is raw 4-bit codes packed two per byte (low nibble first), predictor
and index both start at 0. 4:1 compression vs pcm16.
"""

from __future__ import annotations

import numpy as np

# public IMA ADPCM tables
STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)
INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)


def _encode_sample(sample: int, pred: int, idx: int) -> tuple[int, int, int]:
    """One quantizer step: returns (code, new_pred, new_idx)."""
    step = STEP_TABLE[idx]
    diff = sample - pred
    code = 0
    if diff < 0:
        code = 8
        diff = -diff
    if diff >= step:
        code |= 4
        diff -= step
    if diff >= step >> 1:
        code |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        code |= 1
    return code, *_decode_step(code, pred, idx)


def _decode_step(code: int, pred: int, idx: int) -> tuple[int, int]:
    """Reconstruction shared by encoder and decoder: (new_pred,
    new_idx)."""
    step = STEP_TABLE[idx]
    diffq = step >> 3
    if code & 4:
        diffq += step
    if code & 2:
        diffq += step >> 1
    if code & 1:
        diffq += step >> 2
    pred = pred - diffq if code & 8 else pred + diffq
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + INDEX_TABLE[code & 7]))
    return pred, idx


def adpcm_encode(samples: np.ndarray) -> bytes:
    """int16 mono samples → packed 4-bit codes (low nibble first;
    odd counts pad the final high nibble with 0)."""
    pred, idx = 0, 0
    codes = []
    for s in np.asarray(samples, dtype=np.int64):
        code, pred, idx = _encode_sample(int(s), pred, idx)
        codes.append(code)
    if len(codes) % 2:
        codes.append(0)
    arr = np.asarray(codes, dtype=np.uint8)
    return (arr[0::2] | (arr[1::2] << 4)).tobytes()


def adpcm_decode(buf: bytes, n_samples: int) -> np.ndarray:
    """Packed codes → int16 samples (count must be supplied — the
    padding nibble is not data)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    codes = np.empty(b.size * 2, dtype=np.uint8)
    codes[0::2] = b & 15
    codes[1::2] = b >> 4
    pred, idx = 0, 0
    out = np.empty(n_samples, dtype=np.int16)
    for t in range(n_samples):
        pred, idx = _decode_step(int(codes[t]), pred, idx)
        out[t] = pred
    return out
