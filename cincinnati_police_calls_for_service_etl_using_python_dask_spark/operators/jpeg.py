"""Baseline JPEG (JFIF) codec — the round-5 multimodal stretch item
(VERDICT r4 "What's missing" #1: real corpora are mostly JPEG).

Self-contained baseline sequential DCT codec for 8-bit grayscale,
implementing the public ITU-T T.81 format: marker segments (SOI / APP0
/ DQT / SOF0 / DHT / SOS / EOI), canonical Huffman coding of DC
deltas + AC run/size pairs with byte stuffing, zigzag ordering,
quantization, and the type-II DCT. The decoder is GENERAL for that
profile — it builds Huffman tables from the file's own DHT segments,
handles ZRL/EOB, dequantizes with the file's DQT, and runs a
vectorized float64 IDCT over all blocks at once. Pillow, when
importable, is preferred at the operator layer (multimodal.py); this
module keeps the path real when no codec library exists.

Cross-engine exactness: the DuckDB oracle cannot replay a DCT, so the
FIXTURE (attach_jpeg_payload) synthesizes images whose 8×8 blocks are
FLAT (one byte value per block, cycling the text) and whose quant
table is all-ones. A flat block quantizes to a DC-only coefficient
(the AC float residue, ~1e-16, rounds to zero), and a DC-only block
reconstructs integer-exactly (pixel = DC/8 + 128 to within ~1e-13 of
an integer), so the oracle predicts every decoded pixel from the text
bytes alone while the engine still exercises the full entropy-coded
path. Lossy behavior on arbitrary images is pinned separately by
roundtrip-tolerance tests (tests/test_curation_ops.py).
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan order: ZIGZAG[k] = (row, col) flattened index of the k-th
# coefficient in scan order.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Standard luminance Huffman tables (ITU-T T.81 Annex K.3). BITS[i] =
# number of codes of length i+1; VALUES in canonical order. The tables
# are carried in the file's DHT segment, so encoder and decoder only
# need to agree via the bitstream, not via this constant.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALUES = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALUES = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits: list, values: list) -> dict:
    """value -> (code, length) for a canonical JPEG Huffman table."""
    out, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list, values: list) -> dict:
    """(length, code) -> value for canonical decoding."""
    out, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


# DCT basis A[u, x] = C(u)/2 * cos((2x+1)*u*pi/16); FDCT of a block B
# is A @ B @ A.T, IDCT is A.T @ S @ A.
def _dct_matrix() -> np.ndarray:
    u = np.arange(8).reshape(8, 1).astype(np.float64)
    x = np.arange(8).reshape(1, 8).astype(np.float64)
    a = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
    a[0, :] /= np.sqrt(2.0)
    return a


_A = _dct_matrix()

# Encoder-side canonical code tables (the encoder always writes the
# standard tables into DHT, so these are process constants).
_DC_CODES = _canonical_codes(DC_BITS, DC_VALUES)
_AC_CODES = _canonical_codes(AC_BITS, AC_VALUES)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            byte = ((self.acc << pad) | ((1 << pad) - 1)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.acc, self.nbits = 0, 0
        return bytes(self.buf)


class _BitReader:
    """MSB-first reader over the entropy-coded scan with FF00
    unstuffing; any other FFxx marker inside the scan ends it."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated scan")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated scan at FF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                raise ValueError("marker inside scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_code(self, table: dict) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.read_bit()
            length += 1
            hit = table.get((length, code))
            if hit is not None:
                return hit
        raise ValueError("bad Huffman code")


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _value_bits(v: int, cat: int) -> int:
    return v if v >= 0 else v + (1 << cat) - 1


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def _segment(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def encode_jpeg_gray(
    width: int, height: int, pixels: bytes, quant: np.ndarray | None = None
) -> bytes:
    """Baseline JFIF encode of an 8-bit grayscale image (no
    subsampling, single scan). ``quant`` is the 8×8 quantization table
    (default all-ones — numerically near-lossless, and exactly lossless
    for block-flat images, which is what the oracle fixture relies on).
    Edge blocks are padded by edge replication, the standard choice."""
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixel bytes, got {len(pixels)}")
    q = np.ones((8, 8), dtype=np.int64) if quant is None else np.asarray(quant, dtype=np.int64)
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width).astype(np.float64)
    bh, bw = (height + 7) // 8, (width + 7) // 8
    padded = np.empty((bh * 8, bw * 8), dtype=np.float64)
    padded[:height, :width] = img
    padded[height:, :width] = img[-1:, :]
    padded[:height, width:] = img[:, -1:]
    padded[height:, width:] = img[-1, -1]
    # FDCT all blocks at once: (bh, bw, 8, 8) -> A @ B @ A.T
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
    coefs = np.einsum("ux,ijxy,vy->ijuv", _A, blocks, _A)
    qcoefs = np.round(coefs / q).astype(np.int64)

    dc_codes, ac_codes = _DC_CODES, _AC_CODES
    w = _BitWriter()
    prev_dc = 0
    for j in range(bh):
        for i in range(bw):
            zz = qcoefs[j, i].reshape(64)[ZIGZAG]
            diff = int(zz[0]) - prev_dc
            prev_dc = int(zz[0])
            cat = _category(diff) if diff else 0
            code, length = dc_codes[cat]
            w.write(code, length)
            if cat:
                w.write(_value_bits(diff, cat), cat)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for k in range(1, 64):
                v = int(zz[k])
                if k > last_nz:
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_codes[0xF0]  # ZRL
                    w.write(code, length)
                    run -= 16
                cat = _category(v)
                code, length = ac_codes[(run << 4) | cat]
                w.write(code, length)
                w.write(_value_bits(v, cat), cat)
                run = 0
            if last_nz < 63:
                code, length = ac_codes[0x00]  # EOB
                w.write(code, length)
    scan = w.flush()

    qzz = bytes(int(q.reshape(64)[ZIGZAG[k]]) for k in range(64))
    out = bytearray(b"\xff\xd8")  # SOI
    out += _segment(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _segment(0xFFDB, b"\x00" + qzz)  # DQT, table 0, 8-bit
    out += _segment(
        0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + b"\x01\x11\x00"
    )  # SOF0: precision 8, 1 component, no subsampling, quant table 0
    out += _segment(
        0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALUES)
    )  # DHT DC table 0
    out += _segment(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALUES))  # AC 0
    out += _segment(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")  # SOS
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg_gray(data: bytes) -> tuple:
    """Decode a baseline grayscale JPEG produced by any conformant
    encoder of this profile (8-bit, 1 component, no subsampling, one
    scan, no restart markers). Returns (width, height, pixel_bytes).
    Tables come from the file's own DQT/DHT segments. Raises
    ValueError on anything malformed or outside the profile."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    quant: dict = {}
    huff: dict = {}
    width = height = None
    q_id = dc_id = ac_id = None
    scan_pos = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = (data[pos] << 8) | data[pos + 1]
        if marker == 0xFFD9:
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xFFDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8).astype(np.int64)
                if len(zz) != 64:
                    raise ValueError("short DQT")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = zz
                quant[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xFFC4:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                values = list(body[p + 17 : p + 17 + n])
                if len(values) != n:
                    raise ValueError("short DHT")
                huff[(tc, th)] = _decode_table(bits, values)
                p += 17 + n
        elif marker == 0xFFC0:
            precision, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8 or ncomp != 1:
                raise ValueError("unsupported SOF0 (grayscale 8-bit only)")
            if body[7] != 0x11:
                raise ValueError("subsampling unsupported")
            q_id = body[8]
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7):
            raise ValueError("non-baseline frame type")
        elif marker == 0xFFDA:
            if body[0] != 1:
                raise ValueError("multi-component scan unsupported")
            dc_id, ac_id = body[2] >> 4, body[2] & 0xF
            scan_pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if width is None or scan_pos is None or q_id not in quant:
        raise ValueError("missing SOF/SOS/DQT")
    dc_tbl = huff.get((0, dc_id))
    ac_tbl = huff.get((1, ac_id))
    if dc_tbl is None or ac_tbl is None:
        raise ValueError("missing DHT")
    q = quant[q_id]

    bh, bw = (height + 7) // 8, (width + 7) // 8
    r = _BitReader(data, scan_pos)
    zz_blocks = np.zeros((bh * bw, 64), dtype=np.int64)
    prev_dc = 0
    for b in range(bh * bw):
        cat = r.read_code(dc_tbl)
        prev_dc += _extend(r.read_bits(cat), cat) if cat else 0
        zz_blocks[b, 0] = prev_dc
        k = 1
        while k < 64:
            sym = r.read_code(ac_tbl)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            run, cat = sym >> 4, sym & 0xF
            k += run
            if k > 63 or cat == 0:
                raise ValueError("AC coefficient overruns block")
            zz_blocks[b, k] = _extend(r.read_bits(cat), cat)
            k += 1
    # De-zigzag + dequant + IDCT, vectorized over every block at once.
    coefs = np.zeros((bh * bw, 64), dtype=np.float64)
    coefs[:, ZIGZAG] = zz_blocks
    coefs = coefs.reshape(-1, 8, 8) * q
    pix = np.einsum("xu,buv,yv->bxy", _A.T, coefs, _A.T) + 128.0
    pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
    full = (
        pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    )
    return width, height, full[:height, :width].tobytes()


# ---------------------------------------------------------------------------
# Color (YCbCr) baseline — round-5 extension: 3-component interleaved
# scans with 4:2:0 chroma subsampling (the layout virtually every real
# photographic JPEG uses) or 4:4:4. Same entropy/DCT machinery as the
# grayscale path; what's new is the MCU interleave (per ITU-T T.81
# §A.2.3: within an MCU each component contributes h×v blocks in
# raster order), per-component DC predictors, a second quant/Huffman
# table pair (standard chroma tables, Annex K.3), and the color
# transform.
#
# COLOR TRANSFORM CONTRACT: YCbCr↔RGB runs in 16.16 FIXED-POINT
# INTEGER arithmetic (libjpeg's constants), not floats — so a DuckDB
# oracle can replay the decoder's output bit-exactly with integer
# `//` math. The bias-then-shift spelling keeps every intermediate
# non-negative, so floor-shift == truncating division on both engines.
# ---------------------------------------------------------------------------

DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALUES_C = list(range(12))
AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALUES_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

_DC_CODES_C = _canonical_codes(DC_BITS_C, DC_VALUES_C)
_AC_CODES_C = _canonical_codes(AC_BITS_C, AC_VALUES_C)

# 16.16 fixed-point color constants (libjpeg jdcolor.c / jccolor.c).
_FIX_R_CR = 91881       # 1.40200
_FIX_G_CB = 22554       # 0.34414
_FIX_G_CR = 46802       # 0.71414
_FIX_B_CB = 116130      # 1.77200
_BIAS = 1 << 28         # multiple of 65536, dominates any negative term


def ycbcr_to_rgb_int(y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
    """Integer 16.16 YCbCr→RGB (full-range JFIF). All intermediates are
    biased non-negative so >>16 is plain division — a DuckDB oracle
    replays this with `(x + 268435456) // 65536 - 4096`."""
    y = y.astype(np.int64)
    cbb = cb.astype(np.int64) - 128
    crb = cr.astype(np.int64) - 128
    half = 32768
    r = ((y << 16) + _FIX_R_CR * crb + half + _BIAS >> 16) - 4096
    g = ((y << 16) - _FIX_G_CB * cbb - _FIX_G_CR * crb + half + _BIAS >> 16) - 4096
    b = ((y << 16) + _FIX_B_CB * cbb + half + _BIAS >> 16) - 4096
    clip = lambda v: np.clip(v, 0, 255).astype(np.uint8)  # noqa: E731
    return clip(r), clip(g), clip(b)


def rgb_to_ycbcr_int(r: np.ndarray, g: np.ndarray, b: np.ndarray):
    """Integer 16.16 RGB→YCbCr. Luma weights sum to exactly 65536 so
    white maps to Y=255 (the off-by-one every naive rounding hits)."""
    r = r.astype(np.int64)
    g = g.astype(np.int64)
    b = b.astype(np.int64)
    half = 32768
    y = (19595 * r + 38470 * g + 7471 * b + half) >> 16
    cb = ((-11059 * r - 21712 * g + 32768 * b + half + _BIAS) >> 16) - 4096 + 128
    cr = ((32768 * r - 27439 * g - 5329 * b + half + _BIAS) >> 16) - 4096 + 128
    clip = lambda v: np.clip(v, 0, 255).astype(np.uint8)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (mh, mw)."""
    h, w = plane.shape
    ph, pw = -h % mh, -w % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane (H, W multiples of 8) → (bh, bw, 64)
    quantized int64 coefficients in row-major block order (the writer
    applies the zigzag permutation)."""
    h, w = plane.shape
    bh, bw = h // 8, w // 8
    blocks = plane.astype(np.float64).reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
    coefs = np.einsum("ux,ijxy,vy->ijuv", _A, blocks, _A)
    return np.round(coefs / q).astype(np.int64).reshape(bh, bw, 64)


def _write_block(w: _BitWriter, zz: np.ndarray, prev_dc: int, dc_codes, ac_codes) -> int:
    """Entropy-encode one zigzag block; returns the new DC predictor."""
    diff = int(zz[0]) - prev_dc
    cat = _category(diff) if diff else 0
    code, length = dc_codes[cat]
    w.write(code, length)
    if cat:
        w.write(_value_bits(diff, cat), cat)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            w.write(code, length)
            run -= 16
        cat = _category(v)
        code, length = ac_codes[(run << 4) | cat]
        w.write(code, length)
        w.write(_value_bits(v, cat), cat)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]
        w.write(code, length)
    return int(zz[0])


def encode_jpeg_color(
    width: int,
    height: int,
    y: bytes,
    cb: bytes,
    cr: bytes,
    quant_y: np.ndarray | None = None,
    quant_c: np.ndarray | None = None,
    subsample: bool = True,
) -> bytes:
    """Baseline JFIF encode of full-resolution Y/Cb/Cr planes as a
    3-component interleaved scan — 4:2:0 (``subsample=True``, chroma
    box-averaged 2×2) or 4:4:4. Standard luma/chroma Huffman tables
    (written into DHT), two quant tables (default all-ones: exactly
    lossless for block-flat planes — the oracle-fixture contract shared
    with the grayscale path)."""
    if len(y) != width * height or len(cb) != width * height or len(cr) != width * height:
        raise ValueError("need full-resolution planes for all 3 components")
    qy = np.ones((8, 8), dtype=np.int64) if quant_y is None else np.asarray(quant_y, dtype=np.int64)
    qc = np.ones((8, 8), dtype=np.int64) if quant_c is None else np.asarray(quant_c, dtype=np.int64)

    yp = np.frombuffer(y, dtype=np.uint8).reshape(height, width)
    cbp = np.frombuffer(cb, dtype=np.uint8).reshape(height, width)
    crp = np.frombuffer(cr, dtype=np.uint8).reshape(height, width)

    if subsample:
        mcu_h = mcu_w = 16
        samp_y, samp_c = 0x22, 0x11
        yp = _pad_to(yp, 16, 16)
        # 2x2 box average in integer (round-half-up), then pad to 8s
        cpad = [_pad_to(p, 2, 2).astype(np.int64) for p in (cbp, crp)]
        cbp, crp = (
            _pad_to(
                (
                    (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2] + 2)
                    // 4
                ).astype(np.uint8),
                8,
                8,
            )
            for p in cpad
        )
    else:
        mcu_h = mcu_w = 8
        samp_y, samp_c = 0x11, 0x11
        yp = _pad_to(yp, 8, 8)
        cbp = _pad_to(cbp, 8, 8)
        crp = _pad_to(crp, 8, 8)

    zz_y = _fdct_quant(yp, qy)
    zz_cb = _fdct_quant(cbp, qc)
    zz_cr = _fdct_quant(crp, qc)

    mcus_y = (height + mcu_h - 1) // mcu_h
    mcus_x = (width + mcu_w - 1) // mcu_w

    w = _BitWriter()
    dc = [0, 0, 0]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if subsample:
                for vy in range(2):
                    for vx in range(2):
                        zz = zz_y[my * 2 + vy, mx * 2 + vx].reshape(64)[ZIGZAG]
                        dc[0] = _write_block(w, zz, dc[0], _DC_CODES, _AC_CODES)
            else:
                zz = zz_y[my, mx].reshape(64)[ZIGZAG]
                dc[0] = _write_block(w, zz, dc[0], _DC_CODES, _AC_CODES)
            for ci, zz_c in ((1, zz_cb), (2, zz_cr)):
                zz = zz_c[my, mx].reshape(64)[ZIGZAG]
                dc[ci] = _write_block(w, zz, dc[ci], _DC_CODES_C, _AC_CODES_C)
    scan = w.flush()

    def qtab(tid: int, q: np.ndarray) -> bytes:
        return bytes([tid]) + bytes(int(q.reshape(64)[ZIGZAG[k]]) for k in range(64))

    out = bytearray(b"\xff\xd8")
    out += _segment(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _segment(0xFFDB, qtab(0, qy) + qtab(1, qc))
    out += _segment(
        0xFFC0,
        struct.pack(">BHHB", 8, height, width, 3)
        + bytes([1, samp_y, 0])
        + bytes([2, samp_c, 1])
        + bytes([3, samp_c, 1]),
    )
    out += _segment(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALUES))
    out += _segment(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALUES))
    out += _segment(0xFFC4, b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALUES_C))
    out += _segment(0xFFC4, b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALUES_C))
    out += _segment(0xFFDA, b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00")
    out += scan
    out += b"\xff\xd9"
    return bytes(out)


def decode_jpeg_color(data: bytes) -> tuple:
    """Decode a baseline 3-component interleaved JPEG (4:2:0 or 4:4:4,
    one scan, no restart markers) from any conformant encoder of the
    profile. Returns ``(width, height, rgb_bytes)`` — interleaved RGB,
    produced by the fixed-point integer transform
    (:func:`ycbcr_to_rgb_int`), chroma upsampled by replication.
    Tables come from the file's own DQT/DHT; per-component quant and
    Huffman selectors from SOF0/SOS. Raises ValueError outside the
    profile (progressive, 16-bit tables, restart intervals, component
    counts other than 3)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    quant: dict = {}
    huff: dict = {}
    width = height = None
    comps: list = []  # (comp_id, h, v, tq)
    scan_sel: dict = {}
    scan_pos = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker alignment")
        marker = (data[pos] << 8) | data[pos + 1]
        if marker == 0xFFD9:
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xFFDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8).astype(np.int64)
                if len(zz) != 64:
                    raise ValueError("short DQT")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = zz
                quant[tq] = tbl.reshape(8, 8)
                p += 65
        elif marker == 0xFFC4:
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                values = list(body[p + 17 : p + 17 + n])
                if len(values) != n:
                    raise ValueError("short DHT")
                huff[(tc, th)] = _decode_table(bits, values)
                p += 17 + n
        elif marker == 0xFFC0:
            precision, height, width, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8 or ncomp != 3:
                raise ValueError("decode_jpeg_color handles 8-bit 3-component only")
            for c in range(3):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, samp >> 4, samp & 0xF, tq))
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3, 0xFFC5, 0xFFC6, 0xFFC7):
            raise ValueError("non-baseline frame type")
        elif marker == 0xFFDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xFFDA:
            if body[0] != 3:
                raise ValueError("expected 3-component scan")
            for c in range(3):
                cid, sel = body[1 + 2 * c], body[2 + 2 * c]
                scan_sel[cid] = (sel >> 4, sel & 0xF)
            scan_pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if width is None or scan_pos is None or len(comps) != 3:
        raise ValueError("missing SOF/SOS")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    supported = {(1, 1), (2, 2)}
    if (hmax, vmax) not in supported or any(
        (c[1], c[2]) not in ((hmax, vmax), (1, 1)) for c in comps
    ):
        raise ValueError("only 4:4:4 and 4:2:0 sampling supported")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h

    grids = []  # per comp: (zz_blocks ndarray, bw, bh)
    for cid, ch, cv, tq in comps:
        bw, bh = mcus_x * ch, mcus_y * cv
        grids.append(np.zeros((bh * bw, 64), dtype=np.int64))

    r = _BitReader(data, scan_pos)
    prev_dc = [0, 0, 0]

    def read_block(ci: int, bidx: int) -> None:
        cid = comps[ci][0]
        dc_tbl = huff.get((0, scan_sel[cid][0]))
        ac_tbl = huff.get((1, scan_sel[cid][1]))
        if dc_tbl is None or ac_tbl is None:
            raise ValueError("missing DHT")
        blk = grids[ci][bidx]
        cat = r.read_code(dc_tbl)
        prev_dc[ci] += _extend(r.read_bits(cat), cat) if cat else 0
        blk[0] = prev_dc[ci]
        k = 1
        while k < 64:
            sym = r.read_code(ac_tbl)
            if sym == 0x00:
                break
            if sym == 0xF0:
                k += 16
                continue
            run, cat = sym >> 4, sym & 0xF
            k += run
            if k > 63 or cat == 0:
                raise ValueError("AC coefficient overruns block")
            blk[k] = _extend(r.read_bits(cat), cat)
            k += 1

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (cid, ch, cv, tq) in enumerate(comps):
                bw = mcus_x * ch
                for vy in range(cv):
                    for vx in range(ch):
                        bidx = (my * cv + vy) * bw + mx * ch + vx
                        read_block(ci, bidx)

    planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        q = quant.get(tq)
        if q is None:
            raise ValueError("missing DQT")
        bw, bh = mcus_x * ch, mcus_y * cv
        coefs = np.zeros((bh * bw, 64), dtype=np.float64)
        coefs[:, ZIGZAG] = grids[ci]
        coefs = coefs.reshape(-1, 8, 8) * q
        pix = np.einsum("xu,buv,yv->bxy", _A.T, coefs, _A.T) + 128.0
        pix = np.clip(np.round(pix), 0, 255).astype(np.uint8)
        full = pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # upsample to luma resolution by replication, crop to image
        full = np.repeat(np.repeat(full, vmax // cv, axis=0), hmax // ch, axis=1)
        planes.append(full[:height, :width])

    r8, g8, b8 = ycbcr_to_rgb_int(*planes)
    rgb = np.stack([r8, g8, b8], axis=-1)
    return width, height, rgb.tobytes()
