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
    if vbits != 3:
        pass  # _MP3_SAMPLERATE keyed by vbits handles 2/2.5 directly
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
