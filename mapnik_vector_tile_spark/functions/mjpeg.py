"""Motion-JPEG video codec — the engine's real LOSSY compressed-video
path (SURVEY §2.11 T14; reference analogue: mapnik's lossy raster
formats via ``save_to_string``, applied per frame).

MJPEG is the standard intraframe video codec (RFC 2435 carries exactly
this payload over RTP; AVI/QuickTime 'MJPG' tracks are the container
cousins): every frame is an independent baseline JPEG, so there is no
inter-frame state, which makes the codec embarrassingly parallel at
decode — any frame subset decodes without touching the rest, the
property a distributed frame-sampling operator wants (decode cost is
proportional to SAMPLED frames, not stored frames; see
operators.multimodal.frame_sample_batch's mjpeg branch).

Wire layout (this module's container — MJPEG has no single canonical
elementary-stream framing):

    b"MJPG"                       magic
    repeat n_frames times:
        u32 BE                    length of the next JPEG stream
        bytes                     one grayscale baseline JFIF frame

Frames are encoded with functions.jpeg's 1-component (grayscale) mode
— video payloads in this corpus are luma planes (sources.multimodal).
Lossy: round-trip is gated by PSNR (input_hint invariant: PSNR ≥ 40 dB
for lossy codecs), pinned by tests/test_mjpeg.py and the
q_video_mjpeg contract oracle.

Error contract (matches functions.jpeg / dvid8): every malformed
input raises ValueError — never a bare IndexError/struct.error — so
the pipeline's skip-undecodable policy can catch one exception type.
"""

from __future__ import annotations

import numpy as np

from mapnik_vector_tile_spark.functions.jpeg import decode_jpeg, encode_jpeg

MAGIC = b"MJPG"


def encode(frames: np.ndarray, quality: int = 98) -> bytes:
    """uint8[n_frames, h, w] luma planes -> MJPG container bytes."""
    if frames.ndim != 3:
        raise ValueError("mjpeg.encode expects uint8[n_frames, h, w]")
    parts = [MAGIC]
    for f in frames:
        j = encode_jpeg(np.ascontiguousarray(f), quality)
        parts.append(len(j).to_bytes(4, "big"))
        parts.append(j)
    return b"".join(parts)


def decode(buf: bytes, w: int, h: int, n_frames: int) -> np.ndarray:
    """MJPG container bytes -> uint8[n_frames, h, w] luma planes.

    Validates the magic, every frame's dimensions against the typed
    metadata, and that the container holds exactly ``n_frames`` frames
    with no trailing bytes (the dvid8 exact-expansion stance).

    Allocation is per DECODED frame, never from the raw metadata — a
    corrupt (n_frames, w, h) row must fold to ValueError (the
    skip-undecodable contract), not a MemoryError from preallocating
    n_frames·h·w before any byte was validated."""
    buf = bytes(buf)
    if buf[:4] != MAGIC:
        raise ValueError("mjpeg: missing MJPG magic")
    planes: list[np.ndarray] = []
    pos = 4
    for i in range(max(0, n_frames)):
        if pos + 4 > len(buf):
            raise ValueError("mjpeg: truncated frame header")
        ln = int.from_bytes(buf[pos : pos + 4], "big")
        pos += 4
        if pos + ln > len(buf):
            raise ValueError("mjpeg: truncated frame payload")
        rgba = decode_jpeg(buf[pos : pos + ln])  # ValueError on malformed
        if rgba.shape[0] != h or rgba.shape[1] != w:
            raise ValueError(
                f"mjpeg: frame {i} is {rgba.shape[1]}x{rgba.shape[0]}, "
                f"metadata says {w}x{h}"
            )
        planes.append(np.ascontiguousarray(rgba[..., 0]))
        pos += ln
    if pos != len(buf):
        raise ValueError("mjpeg: trailing bytes after final frame")
    if n_frames <= 0:
        raise ValueError("mjpeg: n_frames must be positive")
    return np.stack(planes)


def frame_dims(jpeg: bytes) -> tuple[int, int]:
    """(w, h) from a baseline JPEG's SOF0 header — a marker walk with
    ZERO entropy decode, so the frame sampler can validate EVERY
    frame's dimensions against the typed metadata at header cost while
    only paying full decode for sampled frames. ValueError contract."""
    jpeg = bytes(jpeg)
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = jpeg[pos + 1]
        if marker == 0xC0:
            if pos + 9 > len(jpeg):
                raise ValueError("jpeg: truncated SOF")
            h = int.from_bytes(jpeg[pos + 5 : pos + 7], "big")
            w = int.from_bytes(jpeg[pos + 7 : pos + 9], "big")
            return w, h
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        ln = int.from_bytes(jpeg[pos + 2 : pos + 4], "big")
        if ln < 2:
            raise ValueError("jpeg: bad segment length")
        pos += 2 + ln
    raise ValueError("jpeg: no SOF0 before end of stream")


def decode_frame(buf: bytes, w: int, h: int, n_frames: int,
                 frame_idx: int) -> np.ndarray:
    """Decode ONE frame without decoding the others — the random-access
    property that makes MJPEG the right lossy codec for distributed
    frame sampling. Walks the length-prefixed index (O(n_frames) header
    reads, zero entropy decode for skipped frames)."""
    buf = bytes(buf)
    if buf[:4] != MAGIC:
        raise ValueError("mjpeg: missing MJPG magic")
    if not 0 <= frame_idx < n_frames:
        raise ValueError(f"mjpeg: frame_idx {frame_idx} out of range")
    pos = 4
    for i in range(frame_idx + 1):
        if pos + 4 > len(buf):
            raise ValueError("mjpeg: truncated frame header")
        ln = int.from_bytes(buf[pos : pos + 4], "big")
        pos += 4
        if pos + ln > len(buf):
            raise ValueError("mjpeg: truncated frame payload")
        if i == frame_idx:
            rgba = decode_jpeg(buf[pos : pos + ln])
            if rgba.shape[0] != h or rgba.shape[1] != w:
                raise ValueError(
                    f"mjpeg: frame {i} is {rgba.shape[1]}x{rgba.shape[0]}, "
                    f"metadata says {w}x{h}"
                )
            return rgba[..., 0]
        pos += ln
    raise AssertionError("unreachable")
