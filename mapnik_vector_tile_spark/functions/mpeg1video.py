"""Pure-numpy MPEG-1 VIDEO I-frame codec (ISO/IEC 11172-2) — retires
the last multimodal video stub (SURVEY §2.11 T14: the reference's
"opaque compressed video payload" row; r3 resolved the audio analogue
with functions.mpeg1's Layer I).  The sandbox has no external video
library, so the engine carries its own intra-only MPEG-1 encoder +
decoder pair, built from the public spec.

Scope and honesty (the functions.mpeg1 stance):

- I-FRAMES ONLY (every picture is intra-coded) — exactly the subset a
  distributed frame sampler wants: any picture decodes without
  touching any other, like MJPEG, but in the real MPEG-1 syntax
  (sequence header, picture/slice start codes, macroblock/block
  layer, intra quantizer matrix, DC prediction per slice, run/level
  AC VLCs).  No P/B pictures, no motion vectors.
- The bitstream grammar (start codes, header fields, VLC tables
  B.1/B.12/B.13/B.14, escape coding, oddification) is transcribed
  from public knowledge of ISO/IEC 11172-2; the encoder and decoder
  share ONE table definition, so pair round-trip consistency is
  structural.  No conformance decoder exists in this sandbox, so
  external spec-exactness is asserted by construction + documented,
  not demonstrated — same contract as mpeg1.py's documented
  filterbank substitute.
- Lossy: round-trip is PSNR-gated (input_hint invariant ≥ 40 dB),
  pinned by tests/test_mpeg1video.py and the q_video_mpeg1 contract
  oracle.  Content is luma planes (the corpus is grayscale); the
  4:2:0 chroma blocks are coded flat-128 and discarded on decode.

Error contract (matches jpeg/dvid8/mjpeg): malformed input raises
ValueError — never a bare IndexError/KeyError — so the pipeline's
skip-undecodable policy catches one exception type.

Scale posture: decode cost is proportional to DECODED pictures —
``decode_frame`` start-code-scans to one picture (O(bytes) scan, zero
entropy decode for skipped frames), the random-access property the
distributed frame sampler (operators.multimodal) relies on.
"""

from __future__ import annotations

import numpy as np

from mapnik_vector_tile_spark.functions.jpeg import _D, _ZZ

# --- constants (ISO/IEC 11172-2) -------------------------------------------

# default intra quantizer matrix (§2.4.3.3), row-major
_INTRA_Q = np.array([
    [8, 16, 19, 22, 26, 27, 29, 34],
    [16, 16, 22, 24, 27, 29, 34, 37],
    [19, 22, 26, 27, 29, 34, 34, 38],
    [22, 24, 27, 29, 32, 35, 38, 40],
    [26, 27, 29, 32, 35, 40, 48, 58],
    [26, 27, 29, 34, 38, 46, 56, 69],
    [27, 29, 35, 38, 46, 56, 69, 83],
    [34, 37, 38, 40, 48, 58, 69, 83],
], dtype=np.int64)
_INTRA_Q_ZZ = _INTRA_Q.ravel()[_ZZ]

_SEQ_START = b"\x00\x00\x01\xb3"
_PIC_START = b"\x00\x00\x01\x00"
_SEQ_END = b"\x00\x00\x01\xb7"

# Table B.12 / B.13: dct_dc_size VLCs
_DC_LUMA = {
    0: "100", 1: "00", 2: "01", 3: "101", 4: "110", 5: "1110",
    6: "11110", 7: "111110", 8: "1111110",
}
_DC_CHROMA = {
    0: "00", 1: "01", 2: "10", 3: "110", 4: "1110", 5: "11110",
    6: "111110", 7: "1111110", 8: "11111110",
}

# Table B.14 (dct_coeff_next) — (run, |level|) -> code, sign bit
# appended by the writer (0 positive, 1 negative).  EOB and ESCAPE are
# handled out of band.  Pairs absent here are escape-coded (legal per
# spec; decoders must accept escapes for any run/level).
_AC_CODES = {
    (0, 1): "11", (0, 2): "0100", (0, 3): "00101", (0, 4): "0000110",
    (0, 5): "00100110", (0, 6): "00100001", (0, 7): "0000001010",
    (0, 8): "000000011101", (0, 9): "000000011000",
    (0, 10): "000000010011", (0, 11): "000000010000",
    (0, 12): "0000000011010", (0, 13): "0000000011001",
    (0, 14): "0000000011000", (0, 15): "0000000010111",
    (1, 1): "011", (1, 2): "000110", (1, 3): "00100101",
    (1, 4): "0000001100", (1, 5): "000000011011",
    (1, 6): "0000000010110", (1, 7): "0000000010101",
    (2, 1): "0101", (2, 2): "0000100", (2, 3): "0000001011",
    (2, 4): "000000010100", (2, 5): "0000000010100",
    (3, 1): "00111", (3, 2): "00100100", (3, 3): "000000011100",
    (3, 4): "0000000010011",
    (4, 1): "00110", (4, 2): "0000001111", (4, 3): "000000010010",
    (5, 1): "000111", (5, 2): "0000001001", (5, 3): "0000000010010",
    (6, 1): "000101", (6, 2): "000000011110",
    (7, 1): "000100", (7, 2): "000000010101",
    (8, 1): "0000111", (8, 2): "000000010001",
    (9, 1): "0000101", (9, 2): "0000000010001",
    (10, 1): "00100111", (10, 2): "0000000010000",
    (11, 1): "00100011", (12, 1): "00100010", (13, 1): "00100000",
    (14, 1): "0000001110", (15, 1): "0000001101", (16, 1): "0000001000",
    (17, 1): "000000011111", (18, 1): "000000011010",
    (19, 1): "000000011001", (20, 1): "000000010111",
    (21, 1): "000000010110", (22, 1): "0000000011111",
    (23, 1): "0000000011110", (24, 1): "0000000011101",
    (25, 1): "0000000011100", (26, 1): "0000000011011",
}
_EOB = "10"
_ESCAPE = "000001"


def _decode_lut(codes: dict) -> dict:
    """'bitstring' table -> {(length, code_int): key}; asserts the
    union with EOB/ESCAPE is prefix-free (decoder soundness)."""
    lut = {}
    strs = []
    for key, s in codes.items():
        strs.append(s)
        lut[(len(s), int(s, 2))] = key
    strs += [_EOB, _ESCAPE]
    for i, a in enumerate(strs):
        for b in strs[i + 1:]:
            assert not (a.startswith(b) or b.startswith(a)), (a, b)
    return lut


_AC_LUT = _decode_lut(_AC_CODES)
_AC_LUT[(len(_EOB), int(_EOB, 2))] = "EOB"
_AC_LUT[(len(_ESCAPE), int(_ESCAPE, 2))] = "ESC"
_DC_LUMA_LUT = {(len(s), int(s, 2)): v for v, s in _DC_LUMA.items()}
_DC_CHROMA_LUT = {(len(s), int(s, 2)): v for v, s in _DC_CHROMA.items()}
_AC_MAXLEN = max(ln for ln, _ in _AC_LUT)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_str(self, s: str) -> None:
        self.write(int(s, 2), len(s))

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        self.align()
        return bytes(self.out)


class _BitReader:
    def __init__(self, buf: bytes, pos_bytes: int = 0) -> None:
        self.buf = buf
        self.pos = pos_bytes * 8

    def read(self, bits: int) -> int:
        if self.pos + bits > len(self.buf) * 8:
            raise ValueError("mpeg1video: truncated bitstream")
        out = 0
        pos = self.pos
        buf = self.buf
        for _ in range(bits):
            out = (out << 1) | ((buf[pos >> 3] >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return out

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def read_vlc(self, lut: dict, what: str):
        code = 0
        for length in range(1, _AC_MAXLEN + 1):
            code = (code << 1) | self.read(1)
            hit = lut.get((length, code))
            if hit is not None:
                return hit
        raise ValueError(f"mpeg1video: invalid {what} VLC")


def _dc_bits(diff: int) -> tuple[int, int]:
    """(size, amplitude bits) — T.81-style magnitude coding, which is
    also 11172-2's dct_dc_differential convention."""
    if diff == 0:
        return 0, 0
    size = abs(diff).bit_length()
    bits = diff if diff > 0 else diff + (1 << size) - 1
    return size, bits


def _dc_undiff(size: int, bits: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def _recon_mag(lvl_abs: int, qscale: int, q: int) -> int:
    """Decoder-side AC magnitude for |level| (§2.4.4.2: scale,
    oddify toward zero, clamp)."""
    mag = (2 * lvl_abs * qscale * q) // 16
    if mag % 2 == 0 and mag > 0:
        mag -= 1
    return min(mag, 2047)


def _best_level(coef: float, qscale: int, q: int) -> int:
    """The level whose DECODER reconstruction (oddification included)
    lands closest to ``coef`` — naive rounding ignores the oddify
    step and leaves a systematic Q·qscale/16 bias that alone costs
    several dB of PSNR."""
    l0 = int(round(8.0 * coef / (qscale * q)))
    sign = 1 if coef >= 0 else -1
    best, best_err = 0, abs(coef)
    for cand in (abs(l0) - 1, abs(l0), abs(l0) + 1):
        if not 1 <= cand <= 255:
            continue
        err = abs(sign * _recon_mag(cand, qscale, q) - coef)
        if err < best_err:
            best, best_err = sign * cand, err
    return best


def _encode_block(w: _BitWriter, coefs_zz: np.ndarray, pred: int,
                  qscale: int, chroma: bool) -> int:
    """Quantize + entropy-code one intra block (zigzag float coefs);
    returns the new DC predictor (quantized-DC units)."""
    dc_q = int(np.clip(round(coefs_zz[0] / 8.0), 0, 255))
    size, bits = _dc_bits(dc_q - pred)
    w.write_str((_DC_CHROMA if chroma else _DC_LUMA)[size])
    if size:
        w.write(bits, size)
    run = 0
    for i in range(1, 64):
        lvl = _best_level(float(coefs_zz[i]), qscale, int(_INTRA_Q_ZZ[i]))
        if lvl == 0:
            run += 1
            continue
        code = _AC_CODES.get((run, abs(lvl)))
        if code is not None:
            w.write_str(code)
            w.write(0 if lvl > 0 else 1, 1)
        else:
            w.write_str(_ESCAPE)
            w.write(run, 6)
            if -127 <= lvl <= 127:
                w.write(lvl & 0xFF, 8)
            elif lvl > 0:
                w.write(0, 8)
                w.write(lvl, 8)
            else:
                w.write(0x80, 8)
                w.write(lvl & 0xFF, 8)
        run = 0
    w.write_str(_EOB)
    return dc_q


def _decode_block(r: _BitReader, pred: int, qscale: int,
                  chroma: bool) -> tuple[np.ndarray, int]:
    """One intra block -> (8x8 spatial int array, new DC pred)."""
    size = r.read_vlc(_DC_CHROMA_LUT if chroma else _DC_LUMA_LUT, "dc")
    diff = _dc_undiff(size, r.read(size) if size else 0)
    pred = pred + diff
    coefs = np.zeros(64, dtype=np.float64)
    coefs[0] = pred * 8
    i = 0
    while True:
        hit = r.read_vlc(_AC_LUT, "ac")
        if hit == "EOB":
            break
        if hit == "ESC":
            run = r.read(6)
            b = r.read(8)
            if b == 0:
                lvl = r.read(8)
            elif b == 0x80:
                lvl = r.read(8) - 256
            else:
                lvl = b - 256 if b >= 128 else b
            if lvl == 0:
                raise ValueError("mpeg1video: escape level 0")
        else:
            run, lvl = hit
            if r.read(1):
                lvl = -lvl
        i += run + 1
        if i > 63:
            raise ValueError("mpeg1video: coefficient index overflow")
        # §2.4.4.2 intra reconstruction with oddification
        mag = (2 * abs(lvl) * qscale * int(_INTRA_Q_ZZ[i])) // 16
        if mag % 2 == 0 and mag > 0:
            mag -= 1
        mag = min(mag, 2047)
        coefs[i] = mag if lvl > 0 else -mag
    blk = np.zeros((8, 8), dtype=np.float64)
    blk.flat[_ZZ] = coefs
    spatial = _D.T @ blk @ _D
    return spatial, pred


def encode(frames: np.ndarray, qscale: int = 2) -> bytes:
    """uint8[n_frames, h, w] luma planes -> MPEG-1 video elementary
    stream (I-frames only, one slice per macroblock row, flat-gray
    chroma).  Dimensions need not be multiples of 16: edge pixels are
    replicated to fill the macroblock grid and decode crops.

    Default qscale=2: levels are capped at ±255 by the syntax, and at
    qscale=1 the largest low-frequency coefficients of hard content
    (a mod-256 wrap step) overflow the cap and clip catastrophically;
    qscale=2 keeps every level in range with reconstruction
    granularity ≤ qscale·Q/8 ≈ 4–21, measured ≥ 45 dB PSNR on the
    corpus recipe."""
    if frames.ndim != 3:
        raise ValueError("mpeg1video.encode expects uint8[n, h, w]")
    if not 1 <= qscale <= 31:
        raise ValueError("mpeg1video: quantizer_scale must be in 1..31")
    n, h, w0 = frames.shape
    if not (0 < w0 < 4096 and 0 < h < 4096):
        raise ValueError("mpeg1video: dimensions out of 12-bit range")
    mbw, mbh = (w0 + 15) // 16, (h + 15) // 16
    pad = np.empty((n, mbh * 16, mbw * 16), dtype=np.uint8)
    pad[:, :h, :w0] = frames
    pad[:, h:, :w0] = frames[:, h - 1 : h, :]
    pad[:, :, w0:] = pad[:, :, w0 - 1 : w0]

    bw = _BitWriter()
    bw.out += _SEQ_START
    bw.write(w0, 12)
    bw.write(h, 12)
    bw.write(0b0001, 4)   # pel_aspect_ratio: square
    bw.write(0b0011, 4)   # picture_rate: 25 fps
    bw.write(0x3FFFF, 18)  # bit_rate: variable
    bw.write(1, 1)        # marker
    bw.write(0, 10)       # vbv_buffer_size
    bw.write(0, 1)        # constrained_parameters_flag
    bw.write(0, 1)        # load_intra_quantizer_matrix (default)
    bw.write(0, 1)        # load_non_intra_quantizer_matrix
    bw.align()
    for fi in range(n):
        bw.out += _PIC_START
        bw.write(fi % 1024, 10)  # temporal_reference
        bw.write(1, 3)           # picture_coding_type: I
        bw.write(0xFFFF, 16)     # vbv_delay
        bw.write(0, 1)           # extra_bit_picture
        bw.align()
        f = pad[fi].astype(np.float64)
        for row in range(mbh):
            bw.out += b"\x00\x00\x01" + bytes([row + 1])  # slice
            bw.write(qscale, 5)
            bw.write(0, 1)  # extra_bit_slice
            pred_y = pred_cb = pred_cr = 128
            for col in range(mbw):
                bw.write(1, 1)  # macroblock_address_increment = 1
                bw.write(1, 1)  # macroblock_type: intra
                for by in range(2):
                    for bx in range(2):
                        blk = f[
                            row * 16 + by * 8 : row * 16 + by * 8 + 8,
                            col * 16 + bx * 8 : col * 16 + bx * 8 + 8,
                        ]
                        cz = (_D @ blk @ _D.T).ravel()[_ZZ]
                        pred_y = _encode_block(
                            bw, cz, pred_y, qscale, False
                        )
                # flat-gray 4:2:0 chroma: DC 128, no ACs
                flat = np.zeros(64)
                flat[0] = 8 * 128.0
                pred_cb = _encode_block(bw, flat, pred_cb, qscale, True)
                pred_cr = _encode_block(bw, flat, pred_cr, qscale, True)
            bw.align()
    bw.align()
    bw.out += _SEQ_END
    return bw.bytes()


def _parse_seq_header(buf: bytes) -> tuple[int, int, int]:
    """-> (w, h, pos_after_header_bytes)."""
    if buf[:4] != _SEQ_START:
        raise ValueError("mpeg1video: missing sequence header")
    r = _BitReader(buf, 4)
    w0 = r.read(12)
    h = r.read(12)
    r.read(4 + 4 + 18 + 1 + 10 + 1)
    load_iq = r.read(1)
    if load_iq:
        raise ValueError("mpeg1video: custom intra matrix unsupported")
    if r.read(1):
        raise ValueError("mpeg1video: custom non-intra matrix unsupported")
    r.align()
    return w0, h, r.pos // 8


def _decode_picture(buf: bytes, pos: int, w0: int, h: int) -> tuple[
    np.ndarray, int
]:
    """Decode one picture starting at its picture start code byte
    offset -> (uint8[h, w0], byte offset after the last slice)."""
    if buf[pos : pos + 4] != _PIC_START:
        raise ValueError("mpeg1video: expected picture start code")
    mbw, mbh = (w0 + 15) // 16, (h + 15) // 16
    r = _BitReader(buf, pos + 4)
    r.read(10)  # temporal_reference
    if r.read(3) != 1:
        raise ValueError("mpeg1video: only I pictures supported")
    r.read(16)  # vbv_delay
    if r.read(1):
        raise ValueError("mpeg1video: extra picture information")
    r.align()
    out = np.empty((mbh * 16, mbw * 16), dtype=np.uint8)
    for row in range(mbh):
        sp = r.pos // 8
        if buf[sp : sp + 3] != b"\x00\x00\x01" or buf[sp + 3] != row + 1:
            raise ValueError(
                f"mpeg1video: missing slice start for row {row}"
            )
        r.pos = (sp + 4) * 8
        qscale = r.read(5)
        if not 1 <= qscale <= 31:
            raise ValueError("mpeg1video: invalid quantizer_scale")
        if r.read(1):
            raise ValueError("mpeg1video: extra slice information")
        pred_y = pred_cb = pred_cr = 128
        for col in range(mbw):
            if r.read(1) != 1:
                raise ValueError(
                    "mpeg1video: only address increment 1 supported"
                )
            if r.read(1) != 1:
                raise ValueError("mpeg1video: non-intra macroblock")
            for by in range(2):
                for bx in range(2):
                    spatial, pred_y = _decode_block(
                        r, pred_y, qscale, False
                    )
                    px = np.clip(np.rint(spatial), 0, 255)
                    out[
                        row * 16 + by * 8 : row * 16 + by * 8 + 8,
                        col * 16 + bx * 8 : col * 16 + bx * 8 + 8,
                    ] = px.astype(np.uint8)
            _, pred_cb = _decode_block(r, pred_cb, qscale, True)
            _, pred_cr = _decode_block(r, pred_cr, qscale, True)
        r.align()
    return out[:h, :w0], r.pos // 8


def decode(buf: bytes, w: int, h: int, n_frames: int) -> np.ndarray:
    """MPEG-1 I-frame stream -> uint8[n_frames, h, w] luma planes.
    Validates dimensions against typed metadata, the exact frame
    count, and the sequence end code (the dvid8 exact-expansion
    stance)."""
    buf = bytes(buf)
    if n_frames <= 0:
        raise ValueError("mpeg1video: n_frames must be positive")
    w0, h0, pos = _parse_seq_header(buf)
    if (w0, h0) != (w, h):
        raise ValueError(
            f"mpeg1video: stream is {w0}x{h0}, metadata says {w}x{h}"
        )
    planes = []
    for _ in range(n_frames):
        plane, pos = _decode_picture(buf, pos, w0, h0)
        planes.append(plane)
    if buf[pos : pos + 4] != _SEQ_END:
        raise ValueError("mpeg1video: missing sequence end code")
    if pos + 4 != len(buf):
        raise ValueError("mpeg1video: trailing bytes after sequence end")
    return np.stack(planes)


def decode_frame(buf: bytes, w: int, h: int, n_frames: int,
                 frame_idx: int) -> np.ndarray:
    """Decode ONE picture without entropy-decoding the others: scan
    byte-aligned picture start codes (every start code is byte-aligned
    by construction and 00 00 01 00 cannot occur inside entropy data
    undetected because slices are whole-byte spans between start
    codes) — O(bytes) scan, one picture's entropy decode."""
    buf = bytes(buf)
    if not 0 <= frame_idx < n_frames:
        raise ValueError(f"mpeg1video: frame_idx {frame_idx} out of range")
    w0, h0, pos = _parse_seq_header(buf)
    if (w0, h0) != (w, h):
        raise ValueError(
            f"mpeg1video: stream is {w0}x{h0}, metadata says {w}x{h}"
        )
    seen = 0
    while pos < len(buf):
        nxt = buf.find(_PIC_START, pos)
        if nxt < 0:
            break
        if seen == frame_idx:
            plane, _ = _decode_picture(buf, nxt, w0, h0)
            return plane
        seen += 1
        pos = nxt + 4
    raise ValueError(
        f"mpeg1video: picture {frame_idx} not found in stream"
    )
