"""G.711 mu-law audio codec — pure numpy, fully vectorized, exact.

The canonical CCITT/ITU G.711 reference algorithm (the Sun g711.c
lineage every telephony stack derives from): encode shifts int16 PCM
to 14-bit, biases by 33, finds the logarithmic segment, and packs
(sign, segment, mantissa) into one complemented byte; decode is the
exact integer inverse. Both directions are branch-free numpy on whole
arrays and INTEGER arithmetic end-to-end, which is the property the
engine needs: the DuckDB oracle twin replays encode-then-decode
closed-form in SQL (plans.oracle_pairs), so mu-law clips in the
corpus are value-hash-gated, not merely "decoded without crashing".

This is the sandbox-real "compressed audio" codec for the input_hint
media corpus (sources.multimodal) — a genuine lossy telephony codec,
not a stub: 2x smaller on the wire than pcm16le, ~38 dB SNR on
speech-band material.

Spec pins (tests/test_g711.py): encode(0) == 0xFF, encode(32767) ==
0x80, decode(0x80) == 32124, decode(0xFF) == 0, and encode(decode(c))
== c for every code except 0x7F (negative zero folds to 0xFF, the
classic G.711 degeneracy).
"""

from __future__ import annotations

import numpy as np

BIAS = 0x84  # 132 — decode-side bias on the 16-bit scale


def mulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 (any int dtype) PCM -> uint8 mu-law codes, vectorized.

    14-bit reference form: x = pcm >> 2 (arithmetic shift = floor),
    magnitude biased by 33 and clipped to 0x1FFF (the seg-8 overflow
    row of the reference table collapses to the same 0x80/0x00 codes
    as a biased value of 8191, so one clip replaces the search's
    out-of-range branch).
    """
    x = np.asarray(pcm).astype(np.int64) >> 2
    neg = x < 0
    v = np.minimum(np.where(neg, -x, x) + 33, 0x1FFF)
    seg = (
        (v > 0x3F).astype(np.int64)
        + (v > 0x7F)
        + (v > 0xFF)
        + (v > 0x1FF)
        + (v > 0x3FF)
        + (v > 0x7FF)
        + (v > 0xFFF)
    )
    uval = (seg << 4) | ((v >> (seg + 1)) & 0xF)
    return np.where(neg, uval ^ 0x7F, uval ^ 0xFF).astype(np.uint8)


def mulaw_decode(code: np.ndarray) -> np.ndarray:
    """uint8 mu-law codes -> int16 PCM, vectorized exact inverse."""
    u = (~np.asarray(code).astype(np.int64)) & 0xFF
    t = (((u & 0xF) << 3) + BIAS) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, BIAS - t, t - BIAS).astype(np.int16)


# 256-entry decode table — the fast path operators.multimodal uses:
# decoding a batch is one fancy-index gather, no arithmetic at all.
MULAW_TABLE: np.ndarray = mulaw_decode(np.arange(256, dtype=np.uint8))


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    """int16 PCM -> uint8 A-law codes, vectorized (the G.711 European
    companding variant — 13-bit, segment thresholds at powers of two,
    alternate-bit inversion 0x55 instead of mu-law's complement).

    Reference form (Sun g711.c linear2alaw): x = pcm >> 3 (arithmetic
    shift, 16->13 bit), negatives fold as v = -x - 1 (one's
    complement), segment = count of thresholds 0x1F..0x7FF exceeded,
    mantissa = (v >> max(seg, 1)) & 0xF, code = (seg<<4 | mantissa)
    XOR (0xD5 positive / 0x55 negative). v <= 4095 always, so the
    reference's seg-8 overflow branch is unreachable for int16 input.
    """
    x = np.asarray(pcm).astype(np.int64) >> 3
    neg = x < 0
    v = np.where(neg, -x - 1, x)
    seg = (
        (v > 0x1F).astype(np.int64)
        + (v > 0x3F)
        + (v > 0x7F)
        + (v > 0xFF)
        + (v > 0x1FF)
        + (v > 0x3FF)
        + (v > 0x7FF)
    )
    mant = (v >> np.maximum(seg, 1)) & 0xF
    code = (seg << 4) | mant
    return np.where(neg, code ^ 0x55, code ^ 0xD5).astype(np.uint8)


def alaw_decode(code: np.ndarray) -> np.ndarray:
    """uint8 A-law codes -> int16 PCM, vectorized exact inverse."""
    a = np.asarray(code).astype(np.int64) ^ 0x55
    t0 = (a & 0xF) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t0 + 8, (t0 + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t).astype(np.int16)


ALAW_TABLE: np.ndarray = alaw_decode(np.arange(256, dtype=np.uint8))
