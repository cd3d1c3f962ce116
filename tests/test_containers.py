"""Container codec tests (round 5): the real ISO-BMFF demuxer
(operators/mp4.py) and RIFF/WAVE reader (operators/audio.py) against
layouts their fixture generator does NOT emit — the point is that the
parsers implement the spec, not the writer's habits."""

from __future__ import annotations

import struct

import pytest

from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
    audio,
    mp4,
)

# ---------------------------------------------------------------------------
# MP4
# ---------------------------------------------------------------------------


def test_mp4_roundtrip_multi_chunk_ragged():
    frames = [bytes([i] * (i + 1)) for i in range(10)]
    durs = [100] * 4 + [200] * 6  # two stts runs
    data = mp4.encode_mp4(frames, durs, chunk_size=4, width=320, height=240)
    info = mp4.parse_mp4(data)
    assert (info["width"], info["height"]) == (320, 240)
    assert info["duration"] == sum(durs)
    assert [s[1] for s in info["samples"]] == [i + 1 for i in range(10)]
    assert [s[2] for s in info["samples"]] == [0, 100, 200, 300, 400, 600, 800, 1000, 1200, 1400]
    for i, (off, size, _) in enumerate(info["samples"]):
        assert data[off : off + size] == frames[i]


def test_mp4_co64_variant():
    frames = [b"abc", b"defg", b"h"]
    data = mp4.encode_mp4(frames, [40, 40, 40], use_co64=True, chunk_size=2)
    info = mp4.parse_mp4(data)
    assert [data[o : o + s] for o, s, _ in info["samples"]] == frames


def test_mp4_moov_before_mdat():
    """Faststart layout: the parser's box walk must be order-free.
    Relocate the moov box in front of mdat and patch the chunk offsets
    by the shift — a layout the writer never produces."""
    frames = [b"xy", b"zw", b"q"]
    data = mp4.encode_mp4(frames, [40, 40, 40], chunk_size=2)
    # locate top-level boxes
    boxes = []
    pos = 0
    while pos < len(data):
        size = struct.unpack_from(">I", data, pos)[0]
        boxes.append((data[pos + 4 : pos + 8], pos, size))
        pos += size
    order = {t: (p, s) for t, p, s in boxes}
    moov_p, moov_s = order[b"moov"]
    moov = data[moov_p : moov_p + moov_s]
    pre = data[: order[b"mdat"][0]]
    mdat = data[order[b"mdat"][0] : order[b"mdat"][0] + order[b"mdat"][1]]
    shift = moov_s  # mdat moves right by len(moov)
    # patch stco offsets inside the relocated moov
    idx = moov.find(b"stco")
    (n_chunks,) = struct.unpack_from(">I", moov, idx + 8)
    patched = bytearray(moov)
    for i in range(n_chunks):
        off = struct.unpack_from(">I", moov, idx + 12 + 4 * i)[0]
        struct.pack_into(">I", patched, idx + 12 + 4 * i, off + shift)
    relaid = pre + bytes(patched) + mdat
    info = mp4.parse_mp4(relaid)
    assert [relaid[o : o + s] for o, s, _ in info["samples"]] == frames


def test_mp4_largesize_and_size0_boxes():
    """64-bit largesize mdat + size-0 (to-EOF) trailing moov."""
    frames = [b"ab", b"cd"]
    data = mp4.encode_mp4(frames, [40, 40], chunk_size=2)
    # rewrite mdat header as largesize (+8 bytes), patch stco, and
    # rewrite the trailing moov's size field to 0 (extends to EOF)
    pos = 0
    spans = {}
    while pos < len(data):
        size = struct.unpack_from(">I", data, pos)[0]
        spans[data[pos + 4 : pos + 8]] = (pos, size)
        pos += size
    mp_, ms = spans[b"mdat"]
    mdat_payload = data[mp_ + 8 : mp_ + ms]
    big_mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(mdat_payload)) + mdat_payload
    vp, vs = spans[b"moov"]
    moov = bytearray(data[vp : vp + vs])
    struct.pack_into(">I", moov, 0, 0)  # size 0: to end of file
    idx = bytes(moov).find(b"stco")
    (n_chunks,) = struct.unpack_from(">I", bytes(moov), idx + 8)
    for i in range(n_chunks):
        off = struct.unpack_from(">I", bytes(moov), idx + 12 + 4 * i)[0]
        struct.pack_into(">I", moov, idx + 12 + 4 * i, off + 8)  # largesize header grew by 8
    relaid = data[:mp_] + big_mdat + bytes(moov)
    info = mp4.parse_mp4(relaid)
    assert [relaid[o : o + s] for o, s, _ in info["samples"]] == frames


def test_mp4_unknown_boxes_skipped_and_audio_trak_ignored():
    """Insert an unknown top-level box and an audio ('soun') trak ahead
    of the video trak: the parser must skip both."""
    frames = [b"vid"]
    data = mp4.encode_mp4(frames, [40])
    pos = 0
    spans = {}
    while pos < len(data):
        size = struct.unpack_from(">I", data, pos)[0]
        spans[data[pos + 4 : pos + 8]] = (pos, size)
        pos += size
    vp, vs = spans[b"moov"]
    # audio trak: hdlr 'soun', no stbl needed (parser must not pick it)
    hdlr = mp4._full(b"hdlr", 0, 0, struct.pack(">I", 0) + b"soun" + b"\x00" * 12 + b"a\x00")
    mdia = mp4._box(b"mdia", hdlr)
    audio_trak = mp4._box(b"trak", mdia)
    moov_payload = data[vp + 8 : vp + vs]
    # splice the audio trak at the start of moov's payload (before mvhd)
    new_moov = mp4._box(b"moov", audio_trak + moov_payload)
    unknown = mp4._box(b"wide", b"\x00" * 4)
    relaid = data[:vp] + unknown + new_moov
    # mdat position unchanged (insertions are after it) — offsets valid
    info = mp4.parse_mp4(relaid)
    assert [relaid[o : o + s] for o, s, _ in info["samples"]] == frames


@pytest.mark.parametrize("cut_at", ["header", "half", "tail"])
def test_mp4_truncation_raises(cut_at):
    data = mp4.encode_mp4([b"abcd", b"ef"], [40, 40])
    cut = {"header": 10, "half": len(data) // 2, "tail": len(data) - 5}[cut_at]
    with pytest.raises(ValueError):
        mp4.parse_mp4(data[:cut])


def test_mp4_table_cardinality_mismatch_raises():
    data = bytearray(mp4.encode_mp4([b"ab", b"cd", b"ef"], [40, 40, 40]))
    idx = bytes(data).find(b"stsz")
    # claim 2 samples while stts still expands to 3
    struct.pack_into(">I", data, idx + 12, 2)
    with pytest.raises(ValueError):
        mp4.parse_mp4(bytes(data))


def test_mp4_ctts_rejected():
    data = mp4.encode_mp4([b"ab"], [40])
    # stbl payload starts at the stsd box header (size field precedes
    # the 4-byte type tag found by find())
    insert_at = data.find(b"stsd") - 4
    ctts = mp4._full(b"ctts", 0, 0, struct.pack(">III", 1, 1, 10))
    # splice a ctts into stbl: grow stbl/minf/mdia/trak/moov sizes
    relaid = bytearray(data)
    relaid[insert_at:insert_at] = ctts
    for typ in (b"stbl", b"minf", b"mdia", b"trak", b"moov"):
        t = bytes(relaid).find(typ)
        size = struct.unpack_from(">I", bytes(relaid), t - 4)[0]
        struct.pack_into(">I", relaid, t - 4, size + len(ctts))
    with pytest.raises(ValueError, match="ctts"):
        mp4.parse_mp4(bytes(relaid))


def test_mp4_fixture_model_matches_spec():
    """The deterministic fixture contract the oracles replay."""
    for text in (b"", b"a", b"some document text here", b"x" * 121):
        nb = len(text)
        data = mp4.fixture_mp4_bytes(text)
        info = mp4.parse_mp4(data)
        assert len(info["samples"]) == nb % 7 + 1
        assert info["width"] == nb % 16 + 1 and info["height"] == nb % 12 + 1
        dts = 0
        for i, (off, size, d) in enumerate(info["samples"]):
            assert size == (nb + i) % 9 + 1
            assert d == dts
            dts += ((nb + i) % 3 + 1) * 40
            expect = (
                bytes(text[(i * 3 + k) % nb] for k in range(size)) if nb else bytes([77]) * size
            )
            assert data[off : off + size] == expect


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def test_wav_roundtrip_and_pad_bytes():
    # odd-length ISFT payload inside encode_wav exercises pad handling;
    # also roundtrip odd sample counts (odd data size / 2-byte samples
    # keeps data even — craft an odd chunk explicitly below)
    s = [100, -200, 300, -400, 5]
    d = audio.decode_wav(audio.encode_wav(s, 16000))
    assert d["samples"] == s and d["rate"] == 16000


def test_wav_odd_chunk_before_data():
    """An odd-sized unknown chunk before data: readers that forget the
    RIFF pad byte misalign and fail here."""
    s = [1, -1, 2]
    base = audio.encode_wav(s, 8000)
    # build manually: RIFF(WAVE fmt odd-junk data)
    fmt_start = base.find(b"fmt ")
    fmt_chunk = base[fmt_start : fmt_start + 8 + 16]
    data_start = base.find(b"data")
    data_chunk = base[data_start : data_start + 8 + len(s) * 2]
    junk = b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd size + pad
    body = b"WAVE" + fmt_chunk + junk + data_chunk
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    assert audio.decode_wav(raw)["samples"] == s


def test_wav_multichannel_flat():
    s = [1, 2, 3, 4]  # 2 frames x 2 channels
    d = audio.decode_wav(audio.encode_wav(s, 44100, channels=2))
    assert d["channels"] == 2 and d["samples"] == s


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b"RIFX" + b[4:],  # bad magic
        lambda b: b[:18],  # truncated fmt
        lambda b: b[: len(b) - 3],  # truncated data
    ],
)
def test_wav_malformed_raises(mutate):
    raw = audio.encode_wav([1, 2, 3], 8000)
    with pytest.raises(ValueError):
        audio.decode_wav(mutate(raw))


def test_wav_non_pcm_rejected():
    raw = bytearray(audio.encode_wav([1, 2], 8000))
    idx = bytes(raw).find(b"fmt ")
    struct.pack_into("<H", raw, idx + 8, 3)  # IEEE float tag
    with pytest.raises(ValueError, match="format tag"):
        audio.decode_wav(bytes(raw))


def test_mp4_property_roundtrip():
    """Property sweep: arbitrary frame/duration/chunking/offset-width
    combinations must roundtrip byte-exactly through the independent
    writer/parser pair."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        frames=st.lists(st.binary(min_size=1, max_size=40), min_size=1, max_size=20),
        durs=st.data(),
        chunk_size=st.integers(min_value=1, max_value=7),
        co64=st.booleans(),
        timescale=st.sampled_from([600, 1000, 90000]),
    )
    def check(frames, durs, chunk_size, co64, timescale):
        durations = durs.draw(
            st.lists(
                st.integers(min_value=1, max_value=5000),
                min_size=len(frames),
                max_size=len(frames),
            )
        )
        data = mp4.encode_mp4(
            frames, durations, timescale=timescale, chunk_size=chunk_size, use_co64=co64
        )
        info = mp4.parse_mp4(data)
        assert info["timescale"] == timescale
        assert info["duration"] == sum(durations)
        assert len(info["samples"]) == len(frames)
        dts = 0
        for i, (off, size, d) in enumerate(info["samples"]):
            assert data[off : off + size] == frames[i]
            assert d == dts
            dts += durations[i]

    check()


def test_wav_property_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        samples=st.lists(
            st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=64
        ),
        rate=st.sampled_from([8000, 16000, 44100, 48000]),
    )
    def check(samples, rate):
        d = audio.decode_wav(audio.encode_wav(samples, rate))
        assert d["samples"] == samples and d["rate"] == rate and d["bits"] == 16

    check()


def test_wav_fixture_model_matches_spec():
    for text in (b"", b"a", b"hello corpus", b"y" * 87):
        nb = len(text)
        rate, n, dur, ssum, sabs, energy, zc = audio.audio_features(
            audio.fixture_wav_bytes(text)
        )
        assert rate == 8000 * (nb % 3 + 1)
        assert n == nb % 50 + 4
        assert dur == n * 1_000_000 // rate
        exp = [(text[k % nb] - 128) * 256 for k in range(n)] if nb else [42 * 256] * n
        assert ssum == sum(exp) and energy == sum(x * x for x in exp)


# ---------------------------------------------------------------------------
# H.264 Annex-B bitstream analysis (operators/h264.py)
# ---------------------------------------------------------------------------


def test_h264_sps_geometry_roundtrip():
    """build_sps → parse_sps recovers exact geometry across crop
    configurations and profile layouts (baseline and the high-profile
    chroma branch)."""
    import random

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import h264 as H

    rng = random.Random(5)
    for _ in range(100):
        w, h = 2 * rng.randrange(1, 300), 2 * rng.randrange(1, 200)
        p = rng.choice([66, 77, 100, 110])
        info = H.parse_sps(H.build_sps(w, h, profile_idc=p, level_idc=40))
        assert (info["width"], info["height"], info["profile_idc"],
                info["level_idc"]) == (w, h, p, 40)
    with pytest.raises(ValueError, match="even"):
        H.build_sps(33, 32)


def test_h264_annexb_demux_and_emulation_prevention():
    """Start-code demux survives payloads containing raw start-code
    and zero runs: emulation prevention inserts 00 00 03 xx on write
    and the parser strips it, byte-exactly."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import h264 as H

    tricky = b"\x00\x00\x01\x00\x00\x00\x02\x03\x00\x00"
    nals = [
        (H.NAL_SPS, H.build_sps(48, 32)),
        (H.NAL_PPS, b"\xc8\x42"),
        (H.NAL_IDR, tricky),
        (H.NAL_SLICE, b"\x7f" * 5),
    ]
    data = H.build_annexb(nals)
    # the wire form must not contain a bare start code inside a NAL
    body = data[4:]
    assert b"\x00\x00\x01" not in body.replace(b"\x00\x00\x00\x01", b"")
    back = H.parse_annexb(data)
    assert [t for t, _ in back] == [H.NAL_SPS, H.NAL_PPS, H.NAL_IDR, H.NAL_SLICE]
    assert back[2][1] == tricky
    meta = H.stream_metadata(data)
    assert meta == {
        "profile_idc": 66, "level_idc": 30, "width": 48, "height": 32,
        "n_nals": 4, "n_idr": 1, "n_slices": 2,
    }


def test_h264_malformed_streams_raise():
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import h264 as H

    good = H.build_annexb([(H.NAL_SPS, H.build_sps(32, 32))])
    for bad, pat in (
        (b"", "empty"),
        (b"junk" + good, "leading start code"),
        (b"\x00\x00\x01\xff\x00", "forbidden_zero_bit"),
        (b"\x00\x00\x01", "empty NAL"),
    ):
        with pytest.raises(ValueError, match=pat):
            H.parse_annexb(bad)
    # no SPS / several SPS
    with pytest.raises(ValueError, match="exactly one SPS"):
        H.stream_metadata(H.build_annexb([(H.NAL_PPS, b"\x01")]))
    with pytest.raises(ValueError, match="truncated"):
        H.parse_sps(b"\x42\x00")


def test_aac_adts_roundtrip_and_census():
    """ADTS framing (ISO/IEC 14496-3): build frames across the config
    space, parse them back, and check the stream census — including
    CRC-slot skipping (payload must exclude the 2-byte slot) and the
    1024-samples-per-block duration model."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import aac as A

    payloads = [b"\x01\x02\x03", b"", b"\xff" * 40, bytes(range(17))]
    stream = b"".join(
        A.build_adts_frame(2, 4, 2, p, protection_absent=(i % 2 == 0))
        for i, p in enumerate(payloads)
    )
    frames = A.parse_adts(stream)
    assert [f["payload"] for f in frames] == payloads
    assert [f["has_crc"] for f in frames] == [False, True, False, True]
    assert all(f["aot"] == 2 and f["freq_idx"] == 4 and f["channels"] == 2
               for f in frames)
    m = A.stream_metadata(stream)
    assert m["sample_rate"] == 44100
    assert m["n_frames"] == 4 and m["n_crc"] == 2
    assert m["payload_bytes"] == sum(len(p) for p in payloads)
    assert m["payload_sum"] == sum(sum(p) for p in payloads)
    assert m["dur_us"] == 4 * 1024 * 1_000_000 // 44100

    # every (aot, freq_idx, channels) cell round-trips its header
    for aot in (1, 2, 3, 4):
        for fi in range(13):
            for ch in (1, 3, 7):
                f = A.parse_adts(A.build_adts_frame(aot, fi, ch, b"x"))[0]
                assert (f["aot"], f["freq_idx"], f["channels"]) == (aot, fi, ch)


def test_aac_malformed_streams_raise():
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import aac as A

    good = A.build_adts_frame(2, 4, 2, b"abc")
    with pytest.raises(ValueError, match="empty"):
        A.parse_adts(b"")
    with pytest.raises(ValueError, match="syncword"):
        A.parse_adts(b"\x00" + good)
    with pytest.raises(ValueError, match="truncated ADTS header"):
        A.parse_adts(good[:5])
    with pytest.raises(ValueError, match="truncated ADTS frame"):
        A.parse_adts(good[:-1])
    # nonzero layer (flip a layer bit in byte 1)
    bad = bytearray(good); bad[1] |= 0x02
    with pytest.raises(ValueError, match="layer"):
        A.parse_adts(bytes(bad))
    # reserved sampling_frequency_index (15)
    bad = bytearray(good); bad[2] = (bad[2] & 0xC3) | (15 << 2)
    with pytest.raises(ValueError, match="reserved sampling"):
        A.parse_adts(bytes(bad))
    # channel_configuration 0 (PCE)
    bad = bytearray(good); bad[2] &= 0xFE; bad[3] &= 0x3F
    with pytest.raises(ValueError, match="channel_configuration 0"):
        A.parse_adts(bytes(bad))
    # frame_length below header size
    bad = bytearray(good)
    bad[3] = (bad[3] & 0xFC); bad[4] = 0; bad[5] = (3 << 5) | (bad[5] & 0x1F)
    with pytest.raises(ValueError, match="shorter than its header"):
        A.parse_adts(bytes(bad))
    # builder argument validation
    for kw, pat in (
        (dict(aot=0, freq_idx=0, channels=1), "audioObjectType"),
        (dict(aot=2, freq_idx=13, channels=1), "sampling_frequency_index"),
        (dict(aot=2, freq_idx=0, channels=0), "channel_configuration"),
        (dict(aot=2, freq_idx=0, channels=8), "channel_configuration"),
    ):
        with pytest.raises(ValueError, match=pat):
            A.build_adts_frame(payload=b"", **kw)
    with pytest.raises(ValueError, match="overflows 13 bits"):
        A.build_adts_frame(2, 0, 1, b"\x00" * 8200)
    # mid-stream config change rejected by the census
    mixed = A.build_adts_frame(2, 4, 2, b"a") + A.build_adts_frame(2, 5, 2, b"b")
    with pytest.raises(ValueError, match="inconsistent stream configuration"):
        A.stream_metadata(mixed)


def test_aac_fixture_model_matches_spec():
    """The deterministic ADTS fixture must agree with the oracle's
    closed-form model (config from length, per-frame payload lengths,
    CRC cadence) — byte-level, independent of the parser."""
    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        aac as A,
        multimodal as mm,
    )

    for s in (b"", b"x", b"hello adts", b"q" * 33, bytes(range(65, 91))):
        nb = len(s)
        frames = A.parse_adts(mm._aac_fixture_bytes(s))
        assert len(frames) == nb % 5 + 1
        for i, f in enumerate(frames):
            assert f["aot"] == nb % 4 + 1
            assert f["freq_idx"] == nb % 13
            assert f["channels"] == nb % 7 + 1
            assert f["has_crc"] == ((nb + i) % 3 == 0)
            plen = (nb + 7 * i) % 17 + 1
            exp = bytes(
                s[(i * 5 + k) % nb] if nb else 85 for k in range(plen)
            )
            assert f["payload"] == exp


def test_aac_property_roundtrip():
    """Property sweep: arbitrary frame sequences (payload bytes, CRC
    cadence) over any shared stream config must round-trip through the
    independent build/parse pair, and the census must equal the
    closed-form aggregates."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import aac as A

    @settings(max_examples=60, deadline=None)
    @given(
        aot=st.integers(min_value=1, max_value=4),
        fi=st.integers(min_value=0, max_value=12),
        ch=st.integers(min_value=1, max_value=7),
        frames=st.lists(
            st.tuples(st.binary(min_size=0, max_size=60), st.booleans()),
            min_size=1,
            max_size=12,
        ),
    )
    def check(aot, fi, ch, frames):
        stream = b"".join(
            A.build_adts_frame(aot, fi, ch, p, protection_absent=not crc)
            for p, crc in frames
        )
        parsed = A.parse_adts(stream)
        assert [(f["payload"], f["has_crc"]) for f in parsed] == frames
        m = A.stream_metadata(stream)
        assert m["aot"] == aot and m["channels"] == ch
        assert m["sample_rate"] == A.SAMPLE_RATES[fi]
        assert m["n_frames"] == len(frames)
        assert m["n_crc"] == sum(1 for _p, crc in frames if crc)
        assert m["payload_bytes"] == sum(len(p) for p, _c in frames)
        assert m["payload_sum"] == sum(sum(p) for p, _c in frames)
        assert m["dur_us"] == len(frames) * 1024 * 1_000_000 // A.SAMPLE_RATES[fi]

    check()


def test_h264_property_roundtrip():
    """Property sweep: arbitrary NAL sequences (payloads designed to
    hit emulation-prevention runs) with one SPS of any even geometry
    must round-trip demux + SPS parse through the independent
    build/parse pair."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import h264 as H

    @settings(max_examples=60, deadline=None)
    @given(
        w2=st.integers(min_value=1, max_value=200),
        h2=st.integers(min_value=1, max_value=150),
        profile=st.sampled_from([66, 77, 100]),
        level=st.sampled_from([10, 30, 41, 51]),
        slices=st.lists(
            st.tuples(
                st.booleans(),  # idr?
                st.binary(min_size=0, max_size=30),
            ),
            min_size=0,
            max_size=8,
        ),
    )
    def check(w2, h2, profile, level, slices):
        width, height = 2 * w2, 2 * h2
        nals = [(H.NAL_SPS, H.build_sps(width, height, profile, level)),
                (H.NAL_PPS, b"\xc8\x42")]
        for idr, body in slices:
            # prepend a raw 00 00 0x run so EP insertion/removal is hit
            nals.append((H.NAL_IDR if idr else H.NAL_SLICE,
                         b"\x00\x00\x01" + body))
        data = H.build_annexb(nals)
        parsed = H.parse_annexb(data)
        assert [(t, r) for t, r in parsed] == nals
        m = H.stream_metadata(data)
        assert (m["width"], m["height"]) == (width, height)
        assert (m["profile_idc"], m["level_idc"]) == (profile, level)
        assert m["n_nals"] == len(nals)
        assert m["n_idr"] == sum(1 for i, _b in slices if i)
        assert m["n_slices"] == len(slices)

    check()


def test_bitstream_parsers_never_crash_on_garbage():
    """Fuzz contract: arbitrary bytes fed to the ADTS / Annex-B / SPS
    parsers either parse or raise ValueError — never IndexError /
    struct.error / silent wrong types — so a corrupt document degrades
    to an 'error' row in the operators instead of killing the task."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cincinnati_police_calls_for_service_etl_using_python_dask_spark.operators import (
        aac as A,
        h264 as H,
    )

    @settings(max_examples=200, deadline=None)
    @given(data=st.binary(min_size=0, max_size=200))
    def check(data):
        for fn in (A.parse_adts, A.stream_metadata,
                   H.parse_annexb, H.stream_metadata, H.parse_sps):
            try:
                fn(data)
            except ValueError:
                pass

        # seeded-garbage variant biased toward syncword / start-code
        # prefixes so the walk gets past the first gate
        for prefix in (b"\xff\xf1", b"\x00\x00\x00\x01\x67",
                       b"\x00\x00\x01\x65"):
            for fn, mod in ((A.parse_adts, A), (H.parse_annexb, H)):
                try:
                    fn(prefix + data)
                except ValueError:
                    pass

    check()
