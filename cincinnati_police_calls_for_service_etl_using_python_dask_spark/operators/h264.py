"""H.264 / AVC (ITU-T H.264, ISO/IEC 14496-10) BITSTREAM analysis —
the metadata tier of lossy-video support: Annex-B byte-stream
demuxing (start-code scan, emulation-prevention-byte removal), NAL
unit classification, and sequence-parameter-set parsing with a real
Exp-Golomb reader, recovering geometry (pic_width_in_mbs /
pic_height_in_map_units / frame cropping), profile and level from the
bits. No slice DECODING is attempted — entropy decode of CABAC/CAVLC
residuals is explicitly out of scope (the same boundary as
multimodal.py's codec family: container/bitstream structure is real,
pixel reconstruction of lossy codecs is not) — but everything here IS
the real bitstream syntax, so a conformant Annex-B stream from any
encoder parses, and malformed streams raise.

Written from the public spec (ITU-T H.264 §7.3.2.1 seq_parameter_set,
§7.4.1 NAL semantics, Annex B byte-stream format). Reference note:
the Dask reference (app.py) has no media path at all; this extends
the engine's training-data surface the same way jpeg.py/mp4.py do.
"""

from __future__ import annotations

# NAL unit types (ITU-T H.264 Table 7-1)
NAL_SLICE = 1          # coded slice, non-IDR
NAL_IDR = 5            # coded slice, IDR picture
NAL_SEI = 6
NAL_SPS = 7
NAL_PPS = 8
NAL_AUD = 9


class _BitWriter:
    """MSB-first bit writer with ue(v) Exp-Golomb (§9.1)."""

    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, n: int, v: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        # codeNum v => [v+1].bit_length()-1 leading zeros + binary(v+1)
        n = (v + 1).bit_length()
        self.u(n - 1, 0)
        self.u(n, v + 1)

    def rbsp_trailing(self) -> None:
        self.bits.append(1)  # rbsp_stop_one_bit
        while len(self.bits) % 8:
            self.bits.append(0)

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


class _BitReader:
    """MSB-first bit reader with ue(v) Exp-Golomb (§9.1)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            i, off = divmod(self.pos, 8)
            if i >= len(self.data):
                raise ValueError("SPS truncated mid-field")
            v = (v << 1) | ((self.data[i] >> (7 - off)) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("malformed Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)


def _ep_insert(rbsp: bytes) -> bytes:
    """Emulation prevention (§7.4.1.1): 00 00 0x → 00 00 03 0x for
    x in {0,1,2,3} inside the NAL payload."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _ep_remove(ebsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    n = len(ebsp)
    while i < n:
        b = ebsp[i]
        if zeros >= 2 and b == 3:
            if i + 1 < n and ebsp[i + 1] > 3:
                raise ValueError("invalid emulation prevention byte")
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def build_sps(width: int, height: int, profile_idc: int = 66,
              level_idc: int = 30) -> bytes:
    """Baseline-profile SPS RBSP for even ``width``/``height``
    (4:2:0, frame_mbs_only: the crop unit is 2 px in both axes, so an
    odd geometry is not representable — §7.4.2.1.1)."""
    if width % 2 or height % 2 or width <= 0 or height <= 0:
        raise ValueError("SPS geometry must be positive and even")
    w_mbs = (width + 15) // 16
    h_mbs = (height + 15) // 16
    crop_r = (w_mbs * 16 - width) // 2
    crop_b = (h_mbs * 16 - height) // 2
    w = _BitWriter()
    w.u(8, profile_idc)
    w.u(8, 0)                # constraint flags + reserved
    w.u(8, level_idc)
    w.ue(0)                  # seq_parameter_set_id
    if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        w.ue(1)              # chroma_format_idc = 4:2:0
        w.ue(0)              # bit_depth_luma_minus8
        w.ue(0)              # bit_depth_chroma_minus8
        w.u(1, 0)            # qpprime_y_zero_transform_bypass_flag
        w.u(1, 0)            # seq_scaling_matrix_present_flag
    w.ue(4)                  # log2_max_frame_num_minus4
    w.ue(0)                  # pic_order_cnt_type
    w.ue(4)                  # log2_max_pic_order_cnt_lsb_minus4
    w.ue(1)                  # max_num_ref_frames
    w.u(1, 0)                # gaps_in_frame_num_value_allowed_flag
    w.ue(w_mbs - 1)          # pic_width_in_mbs_minus1
    w.ue(h_mbs - 1)          # pic_height_in_map_units_minus1
    w.u(1, 1)                # frame_mbs_only_flag
    w.u(1, 1)                # direct_8x8_inference_flag
    if crop_r or crop_b:
        w.u(1, 1)            # frame_cropping_flag
        w.ue(0)              # crop_left
        w.ue(crop_r)         # crop_right  (units of 2 px, 4:2:0)
        w.ue(0)              # crop_top
        w.ue(crop_b)         # crop_bottom
    else:
        w.u(1, 0)
    w.u(1, 0)                # vui_parameters_present_flag
    w.rbsp_trailing()
    return w.bytes()


def parse_sps(rbsp: bytes) -> dict:
    """Recover profile/level/geometry from an SPS RBSP (§7.3.2.1).
    High profiles' chroma_format_idc branch is parsed for 4:2:0;
    other chroma formats raise (out of the supported profile)."""
    r = _BitReader(rbsp)
    profile_idc = r.u(8)
    r.u(8)  # constraint flags
    level_idc = r.u(8)
    r.ue()  # seq_parameter_set_id
    if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        chroma = r.ue()
        if chroma != 1:
            raise ValueError("only 4:2:0 chroma supported")
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            raise ValueError("scaling matrices unsupported")
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif poc_type == 1:
        r.u(1)
        r.ue()
        r.ue()
        for _ in range(r.ue()):
            r.ue()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    w_mbs = r.ue() + 1
    h_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    crop = [0, 0, 0, 0]
    if r.u(1):  # frame_cropping_flag
        crop = [r.ue(), r.ue(), r.ue(), r.ue()]
    # CropUnitX=2, CropUnitY=2*(2-frame_mbs_only_flag) for 4:2:0
    unit_y = 2 * (2 - frame_mbs_only)
    width = w_mbs * 16 - 2 * (crop[0] + crop[1])
    height = (2 - frame_mbs_only) * h_units * 16 - unit_y * (crop[2] + crop[3])
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "width": width,
        "height": height,
    }


def build_annexb(nals: list[tuple[int, bytes]]) -> bytes:
    """Annex-B byte stream: 4-byte start code + NAL header + RBSP with
    emulation prevention applied."""
    out = bytearray()
    for typ, rbsp in nals:
        out += b"\x00\x00\x00\x01"
        ref_idc = 3 if typ in (NAL_SPS, NAL_PPS, NAL_IDR) else 2
        out.append((ref_idc << 5) | typ)
        out += _ep_insert(rbsp)
    return bytes(out)


def parse_annexb(data: bytes) -> list[tuple[int, bytes]]:
    """Split an Annex-B stream into (nal_type, rbsp) units: start-code
    scan (3- or 4-byte), forbidden_zero_bit check, emulation
    prevention removed. Raises on malformed streams."""
    if not data:
        raise ValueError("empty stream")
    # find all start codes
    starts = []
    i = 0
    n = len(data)
    while i + 3 <= n:
        if data[i] == 0 and data[i + 1] == 0:
            if data[i + 2] == 1:
                starts.append((i, i + 3))
                i += 3
                continue
            if i + 4 <= n and data[i + 2] == 0 and data[i + 3] == 1:
                starts.append((i, i + 4))
                i += 4
                continue
        i += 1
    if not starts or starts[0][0] != 0:
        raise ValueError("no leading start code")
    out = []
    for j, (_, body) in enumerate(starts):
        end = starts[j + 1][0] if j + 1 < len(starts) else n
        if body >= end:
            raise ValueError("empty NAL unit")
        hdr = data[body]
        if hdr & 0x80:
            raise ValueError("forbidden_zero_bit set")
        out.append((hdr & 0x1F, _ep_remove(data[body + 1 : end])))
    return out


def stream_metadata(data: bytes) -> dict:
    """Demux + SPS parse in one call: the per-document kernel of the
    ``video_h264_metadata`` operator. Requires exactly one SPS."""
    nals = parse_annexb(data)
    sps = [rbsp for typ, rbsp in nals if typ == NAL_SPS]
    if len(sps) != 1:
        raise ValueError(f"expected exactly one SPS, got {len(sps)}")
    info = parse_sps(sps[0])
    types = [typ for typ, _ in nals]
    info.update(
        n_nals=len(nals),
        n_idr=sum(1 for t in types if t == NAL_IDR),
        n_slices=sum(1 for t in types if t in (NAL_SLICE, NAL_IDR)),
    )
    return info
