"""functions/mediainfo.py — container-metadata probes for the
stubbed-codec formats (mp3 / webp / mp4), from the public specs."""

import struct

import pytest

from pg_logical_replication_spark.functions.mediainfo import (
    mp3_info,
    mp4_info,
    webp_info,
)


# ----------------------------------------------------------------- mp3
def _mp3_frames(n, bitrate_nibble=0x9, sr=44100, kbps=128):
    frame_size = 144 * kbps * 1000 // sr
    hdr = bytes([0xFF, 0xFB, (bitrate_nibble << 4) | 0x00, 0x00])
    return (hdr + b"\x00" * (frame_size - 4)) * n


def test_mp3_cbr_walk():
    info = mp3_info(_mp3_frames(6))
    assert info["n_frames"] == 6
    assert info["sample_rate"] == 44100
    assert info["n_samples"] == 6 * 1152
    assert info["duration_ms"] == 6 * 1152 * 1000 // 44100
    assert info["avg_bitrate_kbps"] == 128
    assert info["vbr_tag"] is False


def test_mp3_vbr_per_frame_bitrates_summed():
    # alternate 128 (idx 9) and 192 (idx 11) kbps frames
    f128 = _mp3_frames(1, 0x9, kbps=128)
    f192 = _mp3_frames(1, 0xB, kbps=192)
    info = mp3_info(f128 + f192 + f128 + f192)
    assert info["n_frames"] == 4
    assert info["avg_bitrate_kbps"] == 160  # true mean, not first-frame


def test_mp3_skips_id3v2_and_requires_double_sync():
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 20]) + b"\x00" * 20
    info = mp3_info(id3 + _mp3_frames(3))
    assert info["n_frames"] == 3
    # a lone false sync in garbage is rejected (needs a 2nd frame)
    with pytest.raises(ValueError, match="frame sync"):
        mp3_info(b"\x00" * 64 + b"\xff\xfb\x90\x00" + b"\x12" * 40 + b"\x00" * 500)


def test_mp3_mpeg2_layer3():
    # MPEG-2 (vbits=10 → b1=0xF3), Layer III, 22050 Hz, 64 kbps (idx 8)
    size = 576 // 8 * 64000 // 22050
    hdr = bytes([0xFF, 0xF3, 0x80, 0x00])
    data = (hdr + b"\x00" * (size - 4)) * 5
    info = mp3_info(data)
    assert info["sample_rate"] == 22050
    assert info["n_samples"] == 5 * 576


# ---------------------------------------------------------------- webp
def _webp_l(w, h):
    bits = (w - 1) | ((h - 1) << 14)
    body = bytes([0x2F]) + struct.pack("<I", bits)
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) & 1 else b""
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def test_webp_vp8l_dims():
    assert webp_info(_webp_l(33, 47)) == {
        "format": "VP8L", "width": 33, "height": 47,
    }
    assert webp_info(_webp_l(1, 1))["width"] == 1
    assert webp_info(_webp_l(16383, 16383))["height"] == 16383


def test_webp_vp8_lossy_dims():
    body = b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", 320, 240)
    chunk = b"VP8 " + struct.pack("<I", len(body)) + body
    data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert webp_info(data) == {"format": "VP8", "width": 320, "height": 240}


def test_webp_vp8x_canvas():
    body = b"\x00" * 4 + (639).to_bytes(3, "little") + (359).to_bytes(3, "little")
    chunk = b"VP8X" + struct.pack("<I", len(body)) + body
    data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    assert webp_info(data) == {"format": "VP8X", "width": 640, "height": 360}


def test_webp_refusals():
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        webp_info(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError, match="start code"):
        body = b"\x00\x00\x00" + b"\xff\xff\xff" + struct.pack("<HH", 1, 1)
        chunk = b"VP8 " + struct.pack("<I", len(body)) + body
        webp_info(b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk)


# ----------------------------------------------------------------- mp4
def _box(typ, payload):
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _mp4(w, h, dur_ms, tkhd_v1=False):
    mvhd = _box(
        b"mvhd",
        b"\x00" * 4 + b"\x00" * 8 + struct.pack(">II", 1000, dur_ms)
        + b"\x00" * 80,
    )
    if tkhd_v1:
        # v1: FullBox + creation(8)+modification(8)+track(4)+resv(4)+
        # duration(8) = 36, then 52 bytes to dims
        tkhd = _box(
            b"tkhd",
            b"\x01" + b"\x00" * 35 + b"\x00" * 52
            + struct.pack(">II", w << 16, h << 16),
        )
    else:
        # v0: FullBox + 5×u32 = 24, then 52 bytes to dims
        tkhd = _box(
            b"tkhd",
            b"\x00" * 24 + b"\x00" * 52
            + struct.pack(">II", w << 16, h << 16),
        )
    hdlr = _box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 12)
    trak = _box(b"trak", tkhd + _box(b"mdia", hdlr))
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isom") + _box(
        b"moov", mvhd + trak
    )


@pytest.mark.parametrize("v1", [False, True])
def test_mp4_box_walk_both_tkhd_versions(v1):
    info = mp4_info(_mp4(640, 360, 5500, tkhd_v1=v1))
    assert info["timescale"] == 1000 and info["duration_ms"] == 5500
    assert info["tracks"][0] == {
        "width": 640, "height": 360, "handler": "vide",
    }


def test_mp4_mvhd_v1_64bit_duration():
    mvhd = _box(
        b"mvhd",
        b"\x01\x00\x00\x00" + b"\x00" * 16
        + struct.pack(">IQ", 90000, 90000 * 7) + b"\x00" * 80,
    )
    data = _box(b"ftyp", b"isom\x00\x00\x02\x00isom") + _box(b"moov", mvhd)
    info = mp4_info(data)
    assert info["duration_ms"] == 7000


def test_mp4_refusals():
    with pytest.raises(ValueError, match="ftyp"):
        mp4_info(_box(b"mdat", b"\x00" * 8))
    with pytest.raises(ValueError, match="malformed|too short"):
        mp4_info(b"\x00\x00\x00\x03xxx")


# ----------------------------------------------------------- webm/EBML
def _ebml(eid, body):
    n = len(body)
    size = bytes([0x80 | n]) if n < 0x7F else bytes([0x40 | (n >> 8), n & 0xFF])
    return eid + size + body


def _webm(w, h, dur_ms, codec=b"V_VP9"):
    video = _ebml(b"\xb0", w.to_bytes(2, "big")) + _ebml(
        b"\xba", h.to_bytes(2, "big")
    )
    track = _ebml(b"\x86", codec) + _ebml(b"\xe0", video)
    info = _ebml(b"\x2a\xd7\xb1", (1_000_000).to_bytes(3, "big")) + _ebml(
        b"\x44\x89", struct.pack(">f", float(dur_ms))
    )
    segment = _ebml(b"\x15\x49\xa9\x66", info) + _ebml(
        b"\x16\x54\xae\x6b", _ebml(b"\xae", track)
    )
    return _ebml(b"\x1a\x45\xdf\xa3", b"") + _ebml(b"\x18\x53\x80\x67", segment)


def test_webm_ebml_walk():
    from pg_logical_replication_spark.functions.mediainfo import webm_info

    info = webm_info(_webm(640, 360, 7500))
    assert info["duration_ms"] == 7500
    assert info["tracks"][0] == {"codec": "V_VP9", "width": 640, "height": 360}


def test_webm_float64_duration_and_refusal():
    from pg_logical_replication_spark.functions.mediainfo import webm_info

    info = _ebml(b"\x2a\xd7\xb1", (1_000_000).to_bytes(3, "big")) + _ebml(
        b"\x44\x89", struct.pack(">d", 1234.0)
    )
    seg = _ebml(b"\x15\x49\xa9\x66", info)
    doc = _ebml(b"\x1a\x45\xdf\xa3", b"") + _ebml(b"\x18\x53\x80\x67", seg)
    assert webm_info(doc)["duration_ms"] == 1234
    with pytest.raises(ValueError, match="EBML"):
        webm_info(b"\x00\x00\x00\x00")


# ----------------------------------------------------------- h264 SPS
class _BW:
    def __init__(self):
        self.bits = []

    def b(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v):
        k = v + 1
        n = k.bit_length()
        self.b(0, n - 1)
        self.b(k, n)

    def nal(self, header=0x67):
        while len(self.bits) % 8:
            self.bits.append(0)
        out = bytearray([header])
        for i in range(0, len(self.bits), 8):
            byte = 0
            for bit in self.bits[i : i + 8]:
                byte = (byte << 1) | bit
            out.append(byte)
        return bytes(out)


def _sps(mbs_w, mbs_h, crop=None, profile=66):
    w = _BW()
    w.b(profile, 8)
    w.b(0, 8)
    w.b(30, 8)
    w.ue(0)
    if profile == 100:
        w.ue(1)   # chroma_format_idc 4:2:0
        w.ue(0); w.ue(0)
        w.b(0, 1)
        w.b(0, 1)  # no scaling matrices
    w.ue(4)
    w.ue(0)
    w.ue(4)
    w.ue(1)
    w.b(0, 1)
    w.ue(mbs_w - 1)
    w.ue(mbs_h - 1)
    w.b(1, 1)
    w.b(0, 1)
    if crop:
        w.b(1, 1)
        for c in crop:
            w.ue(c)
    else:
        w.b(0, 1)
    w.b(0, 1)
    return w.nal()


def test_h264_sps_dims_baseline_and_high():
    from pg_logical_replication_spark.functions.mediainfo import h264_sps_info

    s = h264_sps_info(_sps(4, 3))
    assert (s["width"], s["height"]) == (64, 48)
    assert s["profile_idc"] == 66 and not s["interlaced"]
    # high profile with 4:2:0 cropping: 1920x1080 = 120x68 MBs crop 8 bottom
    s2 = h264_sps_info(_sps(120, 68, crop=(0, 0, 0, 4), profile=100))
    assert (s2["width"], s2["height"]) == (1920, 1080)


def test_h264_sps_refusals():
    from pg_logical_replication_spark.functions.mediainfo import h264_sps_info

    with pytest.raises(ValueError, match="SPS"):
        h264_sps_info(bytes([0x61]) + b"\x00" * 8)  # slice NAL, not SPS
    with pytest.raises(ValueError, match="empty"):
        h264_sps_info(b"")
