"""Container/metadata probes for media formats whose full CODECS remain
stubbed — stdlib-only, from the public format specifications.

A training-data pipeline's first pass over raw media rarely decodes
pixels/samples: it filters by dimensions, duration, bitrate and sample
rate straight from container headers (tens of bytes) at scan speed.
These probes make that pass REAL for the formats whose entropy decoders
are out of stdlib reach (``operators/multimodal.py`` ``REAL_CODECS``):

* :func:`mp3_info` — MPEG audio (ISO/IEC 11172-3 frame header): sync
  scan, version/layer/bitrate/samplerate tables, frame walk for an
  exact CBR/VBR frame count + duration, Xing/Info VBR tag detection.
* :func:`webp_info` — RIFF/WEBP: ``VP8 `` lossy frame-tag dimensions,
  ``VP8L`` lossless 14-bit dimensions, ``VP8X`` extended canvas.
* :func:`mp4_info` — ISO BMFF (MPEG-4 Part 12) box walk: ``mvhd``
  timescale/duration, per-track ``tkhd`` dimensions and ``hdlr`` kinds
  — the h264-in-mp4 metadata path.

Decoding the payload of any of these still raises the loud
``NotImplementedError`` stub in ``operators/multimodal.py``; nothing
here pretends otherwise.
"""

from __future__ import annotations

import struct

# ---------------------------------------------------------------- mp3
# Bitrate table (kbps), ISO 11172-3 / 13818-3: [version_key][layer][idx]
_MP3_BITRATE = {
    # MPEG-1: layers 1..3
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    # MPEG-2 / 2.5
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_MP3_SAMPLERATE = {
    3: [44100, 48000, 32000],  # MPEG-1 (version bits 11)
    2: [22050, 24000, 16000],  # MPEG-2 (10)
    0: [11025, 12000, 8000],   # MPEG-2.5 (00)
}
_SAMPLES_PER_FRAME = {(1, 1): 384, (1, 2): 1152, (1, 3): 1152,
                      (2, 1): 384, (2, 2): 1152, (2, 3): 576}


def _mp3_frame(data: bytes, pos: int):
    """Parse one MPEG audio frame header at ``pos``; returns
    (frame_bytes, samples, sample_rate, bitrate_kbps) or None."""
    if pos + 4 > len(data):
        return None
    b0, b1, b2, _b3 = data[pos : pos + 4]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return None
    vbits = (b1 >> 3) & 0x3
    if vbits == 1:
        return None  # reserved version
    version_key = 1 if vbits == 3 else 2
    layer = 4 - ((b1 >> 1) & 0x3)
    if layer == 4:
        return None  # reserved layer
    br_idx = (b2 >> 4) & 0xF
    sr_idx = (b2 >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / bad
    bitrate = _MP3_BITRATE[(version_key, layer)][br_idx]
    sr = _MP3_SAMPLERATE[vbits][sr_idx]
    padding = (b2 >> 1) & 1
    samples = _SAMPLES_PER_FRAME[(version_key, layer)]
    if layer == 1:
        size = (12 * bitrate * 1000 // sr + padding) * 4
    else:
        per = samples // 8
        size = per * bitrate * 1000 // sr + padding
    if size <= 4:
        return None
    return size, samples, sr, bitrate


def mp3_info(data: bytes, max_scan: int = 1 << 16) -> dict:
    """Walk MPEG audio frames → exact metadata without decoding.

    Skips an ID3v2 tag if present, scans up to ``max_scan`` bytes for
    the first valid frame sync, then walks frame-to-frame (handles VBR
    — per-frame bitrates are summed, not assumed constant). Raises
    ``ValueError`` when no frame sync is found.
    """
    pos = 0
    if data[:3] == b"ID3" and len(data) >= 10:
        # syncsafe 28-bit size
        sz = (
            (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
        )
        pos = 10 + sz
    start = None
    for p in range(pos, min(len(data), pos + max_scan)):
        f = _mp3_frame(data, p)
        if f is not None:
            # require a second consecutive valid frame (classic probe
            # trick: random data produces false syncs)
            nxt = _mp3_frame(data, p + f[0])
            if nxt is not None or p + f[0] >= len(data):
                start = p
                break
    if start is None:
        raise ValueError("mp3: no MPEG audio frame sync found")
    frames = 0
    samples = 0
    bitrate_sum = 0
    sr = None
    p = start
    while p < len(data):
        f = _mp3_frame(data, p)
        if f is None:
            break
        size, smp, rate, br = f
        frames += 1
        samples += smp
        bitrate_sum += br
        sr = rate
        p += size
    vbr = data.find(b"Xing", start, start + 200) != -1 or (
        data.find(b"Info", start, start + 200) != -1
    )
    return {
        "sample_rate": sr,
        "n_frames": frames,
        "n_samples": samples,
        "duration_ms": (samples * 1000) // sr if sr else None,
        "avg_bitrate_kbps": round(bitrate_sum / frames) if frames else None,
        "vbr_tag": vbr,
    }


# --------------------------------------------------------------- webp
def webp_info(data: bytes) -> dict:
    """RIFF/WEBP dimensions without decoding (container spec,
    developers.google.com/speed/webp/docs/riff_container)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP container")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8 ":
            # lossy: 3-byte frame tag, then 3-byte start code 9d 01 2a,
            # then 14-bit width / 14-bit height (little-endian)
            if body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("webp: bad VP8 keyframe start code")
            w = struct.unpack_from("<H", body, 6)[0] & 0x3FFF
            h = struct.unpack_from("<H", body, 8)[0] & 0x3FFF
            return {"format": "VP8", "width": w, "height": h}
        if fourcc == b"VP8L":
            if body[0] != 0x2F:
                raise ValueError("webp: bad VP8L signature")
            (bits,) = struct.unpack_from("<I", body, 1)
            w = (bits & 0x3FFF) + 1
            h = ((bits >> 14) & 0x3FFF) + 1
            return {"format": "VP8L", "width": w, "height": h}
        if fourcc == b"VP8X":
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            return {"format": "VP8X", "width": w, "height": h}
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    raise ValueError("webp: no VP8/VP8L/VP8X chunk found")


# ---------------------------------------------------------------- mp4
def mp4_info(data: bytes) -> dict:
    """ISO BMFF box walk → movie duration + video track dimensions.

    Parses ``moov/mvhd`` (timescale, duration) and every
    ``moov/trak/tkhd`` (dimensions are 16.16 fixed point) +
    ``mdia/hdlr`` handler types. The h264/vp9 SAMPLE data stays
    untouched — this is the metadata pass only.
    """
    def boxes(buf, pos, end):
        while pos + 8 <= end:
            (size,) = struct.unpack_from(">I", buf, pos)
            typ = buf[pos + 4 : pos + 8]
            if size == 1:  # 64-bit largesize
                (size,) = struct.unpack_from(">Q", buf, pos + 8)
                header = 16
            elif size == 0:
                size = end - pos
                header = 8
            else:
                header = 8
            if size < header or pos + size > end:
                raise ValueError("mp4: malformed box size")
            yield typ, pos + header, pos + size
            pos += size

    if len(data) < 8:
        raise ValueError("mp4: too short")
    top = {t: (s, e) for t, s, e in boxes(data, 0, len(data))}
    if b"ftyp" not in top or b"moov" not in top:
        raise ValueError("mp4: missing ftyp/moov")
    info: dict = {"tracks": []}
    ms, me = top[b"moov"]
    for typ, s, e in boxes(data, ms, me):
        if typ == b"mvhd":
            ver = data[s]
            if ver == 1:
                ts, dur = struct.unpack_from(">IQ", data, s + 4 + 16)
            else:
                ts, dur = struct.unpack_from(">II", data, s + 4 + 8)
            info["timescale"] = ts
            info["duration_ms"] = (dur * 1000) // ts if ts else None
        elif typ == b"trak":
            track: dict = {}
            for t2, s2, e2 in boxes(data, s, e):
                if t2 == b"tkhd":
                    ver = data[s2]
                    # v0: FullBox(4) + creation/modification/track_ID/
                    # reserved/duration (5×4) = 24; v1 widens the two
                    # times and duration to 64-bit = 36. Then
                    # reserved(8) + layer/group/volume/reserved(8) +
                    # matrix(36) = 52 to the 16.16 width/height.
                    off = s2 + (24 if ver == 0 else 36)
                    w16, h16 = struct.unpack_from(">II", data, off + 52)
                    track["width"] = w16 >> 16
                    track["height"] = h16 >> 16
                elif t2 == b"mdia":
                    for t3, s3, e3 in boxes(data, s2, e2):
                        if t3 == b"hdlr":
                            track["handler"] = data[s3 + 8 : s3 + 12].decode(
                                "ascii", "replace"
                            )
            info["tracks"].append(track)
    return info


# --------------------------------------------------------- webm (EBML)
def _ebml_vint(data: bytes, pos: int, strip_marker: bool) -> tuple[int, int]:
    """EBML variable-length integer at ``pos`` → (value, new_pos).
    ``strip_marker`` clears the length-descriptor bit (element IDs keep
    it, sizes strip it — RFC 8794 §4)."""
    first = data[pos]
    if first == 0:
        raise ValueError("ebml: invalid vint")
    length = 9 - first.bit_length()
    v = first & (0xFF >> length) if strip_marker else first
    for i in range(1, length):
        v = (v << 8) | data[pos + i]
    return v, pos + length


def webm_info(data: bytes) -> dict:
    """Matroska/WebM (RFC 8794 EBML + the public Matroska spec) →
    duration + per-video-track dims + codec ids — the vp9-in-webm
    metadata path. Walks EBML elements; sample blocks stay untouched."""
    if data[:4] != b"\x1a\x45\xdf\xa3":
        raise ValueError("webm: missing EBML header magic")

    def walk(pos, end, out, scale_holder):
        while pos < end:
            eid, pos = _ebml_vint(data, pos, strip_marker=False)
            size, pos = _ebml_vint(data, pos, strip_marker=True)
            body_end = pos + size
            if eid in (0x18538067, 0x1549A966, 0x1654AE6B, 0xAE, 0xE0):
                # Segment / Info / Tracks / TrackEntry / Video: recurse
                if eid == 0xAE:
                    track: dict = {}
                    walk(pos, body_end, track, scale_holder)
                    if track:
                        out.setdefault("tracks", []).append(track)
                else:
                    walk(pos, body_end, out, scale_holder)
            elif eid == 0x2AD7B1:  # TimestampScale (ns per tick)
                scale_holder[0] = int.from_bytes(data[pos:body_end], "big")
            elif eid == 0x4489:  # Duration (float ticks)
                raw = data[pos:body_end]
                out["_duration_ticks"] = struct.unpack(
                    ">f" if len(raw) == 4 else ">d", raw
                )[0]
            elif eid == 0x86:  # CodecID
                out["codec"] = data[pos:body_end].decode("ascii", "replace")
            elif eid == 0xB0:  # PixelWidth
                out["width"] = int.from_bytes(data[pos:body_end], "big")
            elif eid == 0xBA:  # PixelHeight
                out["height"] = int.from_bytes(data[pos:body_end], "big")
            pos = body_end
        return out

    info: dict = {}
    scale = [1_000_000]  # Matroska default: 1 ms ticks
    walk(0, len(data), info, scale)
    ticks = info.pop("_duration_ticks", None)
    if ticks is not None:
        info["duration_ms"] = int(ticks * scale[0] / 1_000_000)
    return info


# ----------------------------------------------------------- h264 SPS
class _ExpGolomb:
    """Bit reader with ue(v)/se(v) Exp-Golomb decode (H.264 spec §9.1)
    over an RBSP (emulation-prevention 00 00 03 bytes already removed).
    """

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def bit(self) -> int:
        b = (self.data[self.pos >> 3] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def ue(self) -> int:
        zeros = 0
        while self.bit() == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("h264: bad exp-golomb code")
        return (1 << zeros) - 1 + (self.bits(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def h264_sps_info(nal: bytes) -> dict:
    """Parse one H.264 sequence parameter set NAL → profile/level and
    the true coded dimensions (incl. frame cropping) — the codec-level
    dims for avc1 tracks whose containers lie or are absent. Decoding
    slices remains out of scope (the stub boundary).
    """
    if not nal:
        raise ValueError("h264: empty NAL")
    if (nal[0] & 0x1F) != 7:
        raise ValueError("h264: not an SPS NAL")
    # strip emulation prevention bytes from the RBSP
    rbsp = bytearray()
    i = 1
    while i < len(nal):
        if i + 2 < len(nal) and nal[i : i + 3] == b"\x00\x00\x03":
            rbsp += b"\x00\x00"
            i += 3
        else:
            rbsp.append(nal[i])
            i += 1
    r = _ExpGolomb(bytes(rbsp))
    profile_idc = r.bits(8)
    r.bits(8)  # constraint flags + reserved
    level_idc = r.bits(8)
    r.ue()  # seq_parameter_set_id
    chroma_format_idc = 1
    if profile_idc in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138,
                       139, 134, 135):
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.bit()  # separate_colour_plane_flag
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.bit()  # qpprime_y_zero_transform_bypass_flag
        if r.bit():  # seq_scaling_matrix_present_flag
            raise NotImplementedError("h264: scaling matrices unsupported")
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()
    elif poc_type == 1:
        r.bit()
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.bit()  # gaps_in_frame_num_value_allowed_flag
    pic_width_in_mbs = r.ue() + 1
    pic_height_in_map_units = r.ue() + 1
    frame_mbs_only = r.bit()
    if not frame_mbs_only:
        r.bit()  # mb_adaptive_frame_field_flag
    r.bit()  # direct_8x8_inference_flag
    width = pic_width_in_mbs * 16
    height = (2 - frame_mbs_only) * pic_height_in_map_units * 16
    if r.bit():  # frame_cropping_flag
        cl, cr, ct, cb = r.ue(), r.ue(), r.ue(), r.ue()
        # crop units (4:2:0: x2 horizontally, x2·(2-fmof) vertically)
        sub_w = 2 if chroma_format_idc in (1, 2) else 1
        sub_h = 2 if chroma_format_idc == 1 else 1
        width -= (cl + cr) * sub_w
        height -= (ct + cb) * sub_h * (2 - frame_mbs_only)
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "width": width,
        "height": height,
        "interlaced": not frame_mbs_only,
    }
