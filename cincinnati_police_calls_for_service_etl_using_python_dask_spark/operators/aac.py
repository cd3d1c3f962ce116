"""AAC / ADTS (ISO/IEC 14496-3) BITSTREAM analysis — the audio twin
of :mod:`.h264`'s metadata tier: Audio Data Transport Stream framing
(syncword lock, fixed+variable header decode, CRC skip), a per-frame
census, and stream-level metadata (audio object type, sample rate,
channel configuration, frame count, duration). No spectral DECODING
is attempted — the filterbank/Huffman reconstruction of AAC raw data
blocks is explicitly out of scope (the same boundary as the codec
family: container/bitstream structure is real, lossy sample
reconstruction is not) — but the framing here IS the real ADTS
syntax, so a conformant stream from any encoder parses and malformed
streams raise.

Written from the public spec (ISO/IEC 14496-3 §1.A.2.2 adts_frame /
adts_fixed_header / adts_variable_header; Table 1.18 sampling
frequency index; Table 1.3 audioObjectType). The parser walks frames
by ``aac_frame_length`` (it does NOT blind-resync on 0xFFF, which can
occur inside payload), which is the spec-correct traversal for an
intact stream. Reference note: the Dask reference (app.py) has no
media path at all; this extends the engine's training-data surface
the same way jpeg.py/mp4.py/h264.py do.
"""

from __future__ import annotations

# ISO/IEC 14496-3 Table 1.18
SAMPLE_RATES = (
    96000, 88200, 64000, 48000, 44100, 32000,
    24000, 22050, 16000, 12000, 11025, 8000, 7350,
)

_HDR = 7      # adts_fixed_header + adts_variable_header, bytes
_CRC = 2      # crc_check when protection_absent == 0


def build_adts_frame(
    aot: int,
    freq_idx: int,
    channels: int,
    payload: bytes,
    protection_absent: bool = True,
) -> bytes:
    """One ADTS frame: 56-bit header (+16-bit CRC slot when
    ``protection_absent`` is False) + raw payload. ``aot`` is the
    audioObjectType (1..4: Main/LC/SSR/LTP — the 2-bit profile field
    carries aot-1); ``channels`` the channel_configuration (1..7).
    The CRC slot, when present, is filled with a simple 16-bit byte
    sum of the payload — a deterministic placeholder, NOT the spec's
    CRC-16 polynomial (the metadata tier never verifies CRCs, it only
    skips the slot; documented boundary)."""
    if not 1 <= aot <= 4:
        raise ValueError("audioObjectType must be 1..4 for ADTS profile bits")
    if not 0 <= freq_idx < len(SAMPLE_RATES):
        raise ValueError("bad sampling_frequency_index")
    if not 1 <= channels <= 7:
        raise ValueError("channel_configuration must be 1..7")
    flen = _HDR + (0 if protection_absent else _CRC) + len(payload)
    if flen >= (1 << 13):
        raise ValueError("aac_frame_length overflows 13 bits")
    bits = 0
    for width, v in (
        (12, 0xFFF),                    # syncword
        (1, 0),                         # ID: MPEG-4
        (2, 0),                         # layer: always 00
        (1, 1 if protection_absent else 0),
        (2, aot - 1),                   # profile
        (4, freq_idx),
        (1, 0),                         # private_bit
        (3, channels),
        (1, 0),                         # original/copy
        (1, 0),                         # home
        (1, 0),                         # copyright_identification_bit
        (1, 0),                         # copyright_identification_start
        (13, flen),
        (11, 0x7FF),                    # adts_buffer_fullness: VBR
        (2, 0),                         # number_of_raw_data_blocks - 1
    ):
        bits = (bits << width) | v
    out = bytearray(bits.to_bytes(7, "big"))
    if not protection_absent:
        out += (sum(payload) & 0xFFFF).to_bytes(2, "big")
    out += payload
    return bytes(out)


def parse_adts(data: bytes) -> list[dict]:
    """Split an ADTS stream into frames by walking
    ``aac_frame_length`` from offset 0. Returns one dict per frame:
    ``aot``, ``freq_idx``, ``channels``, ``has_crc``, ``n_blocks``
    (raw data blocks), ``frame_len`` and ``payload`` (CRC slot
    excluded). Raises ValueError on malformed streams: bad syncword,
    nonzero layer, reserved frequency index, channel_configuration 0
    (PCE-carried configs are out of the supported profile), a frame
    length shorter than its own header, or truncation."""
    if not data:
        raise ValueError("empty stream")
    frames: list[dict] = []
    i = 0
    n = len(data)
    while i < n:
        if i + _HDR > n:
            raise ValueError("truncated ADTS header")
        h = data[i : i + _HDR]
        if h[0] != 0xFF or (h[1] & 0xF0) != 0xF0:
            raise ValueError(f"bad syncword at byte {i}")
        if (h[1] >> 1) & 0x3:
            raise ValueError("nonzero layer")
        protection_absent = h[1] & 1
        aot = ((h[2] >> 6) & 0x3) + 1
        freq_idx = (h[2] >> 2) & 0xF
        if freq_idx >= len(SAMPLE_RATES):
            raise ValueError(f"reserved sampling_frequency_index {freq_idx}")
        channels = ((h[2] & 0x1) << 2) | ((h[3] >> 6) & 0x3)
        if channels == 0:
            raise ValueError("channel_configuration 0 (PCE) unsupported")
        flen = ((h[3] & 0x3) << 11) | (h[4] << 3) | ((h[5] >> 5) & 0x7)
        n_blocks = (h[6] & 0x3) + 1
        skip = _HDR + (0 if protection_absent else _CRC)
        if flen < skip:
            raise ValueError("aac_frame_length shorter than its header")
        if i + flen > n:
            raise ValueError("truncated ADTS frame")
        frames.append({
            "aot": aot,
            "freq_idx": freq_idx,
            "channels": channels,
            "has_crc": not protection_absent,
            "n_blocks": n_blocks,
            "frame_len": flen,
            "payload": data[i + skip : i + flen],
        })
        i += flen
    return frames


def stream_metadata(data: bytes) -> dict:
    """Frame census + stream metadata in one call: the per-document
    kernel of the ``audio_aac_metadata`` operator. All frames must
    agree on (aot, freq_idx, channels) — a mid-stream configuration
    change raises (the fixture contract, and the common real-stream
    shape). Duration assumes 1024 output samples per raw data block
    (long-window AAC; 960-sample framing is out of the supported
    profile)."""
    frames = parse_adts(data)
    cfg = {(f["aot"], f["freq_idx"], f["channels"]) for f in frames}
    if len(cfg) != 1:
        raise ValueError(f"inconsistent stream configuration: {sorted(cfg)}")
    aot, freq_idx, channels = next(iter(cfg))
    rate = SAMPLE_RATES[freq_idx]
    blocks = sum(f["n_blocks"] for f in frames)
    return {
        "aot": aot,
        "sample_rate": rate,
        "channels": channels,
        "n_frames": len(frames),
        "n_crc": sum(1 for f in frames if f["has_crc"]),
        "dur_us": blocks * 1024 * 1_000_000 // rate,
        "payload_bytes": sum(len(f["payload"]) for f in frames),
        "payload_sum": sum(sum(f["payload"]) for f in frames),
    }
