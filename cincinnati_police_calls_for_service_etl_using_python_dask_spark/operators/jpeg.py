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
