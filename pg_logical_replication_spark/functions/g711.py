"""G.711 companded audio — μ-law and A-law, the telephony codecs.

Pure-Python implementation of ITU-T G.711 (the 8-bit logarithmic PCM
used by virtually every telephone-speech corpus: Switchboard, Fisher,
CallHome ship as 8 kHz μ-law/A-law). Formulas follow the canonical Sun
Microsystems reference implementation (g711.c, public domain) that
CCITT distributed and that CPython's ``audioop`` reproduced — the test
suite cross-checks every 16-bit value against ``audioop`` where that
module still exists.

Unlike ADPCM (stateful predictor), G.711 is MEMORYLESS: each sample
companding is a closed-form integer function, so a SQL oracle can
replay decode(encode(s)) exactly — the whole lossy round-trip is
deterministic arithmetic.

The WAV container here is the plain RIFF layout with format tag 7
(μ-law) / 6 (A-law), 8 bits per sample — hand-rolled because stdlib
``wave`` only accepts PCM (format 1).
"""

from __future__ import annotations

import struct

_ULAW_BIAS = 0x84  # 132 (decode domain); encode works in 14-bit: 33
_ULAW_CLIP14 = 8159


def linear2ulaw(s: int) -> int:
    """16-bit signed linear → μ-law byte (G.711 encode).

    The 14-bit formulation (input arithmetic-shifted by 2 BEFORE
    negation) — the variant CCITT's reference tables and CPython's
    ``audioop`` use; the test suite pins equality with ``audioop``
    over the full 16-bit range.
    """
    pcm = s >> 2
    if pcm < 0:
        pcm = -pcm
        mask = 0x7F
    else:
        mask = 0xFF
    if pcm > _ULAW_CLIP14:
        pcm = _ULAW_CLIP14
    pcm += _ULAW_BIAS >> 2  # 33
    # segment: 0 for pcm <= 0x3F, else highest-bit position - 6
    seg = max(pcm.bit_length() - 6, 0)
    if seg >= 8:  # pragma: no cover - only reachable at the clip bound
        return 0x7F ^ mask
    return ((seg << 4) | ((pcm >> (seg + 1)) & 0x0F)) ^ mask


def ulaw2linear(u: int) -> int:
    """μ-law byte → 16-bit signed linear (G.711 decode)."""
    u = ~u & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    s = (((mant << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return -s if sign else s


def linear2alaw(s: int) -> int:
    """16-bit signed linear → A-law byte (G.711 encode)."""
    if s >= 0:
        mask = 0xD5  # sign bit set (A-law transmits positives as 1)
        pcm = s >> 3
    else:
        mask = 0x55
        pcm = (-s - 1) >> 3
    # segment: 0 for pcm <= 0x1F, else highest-bit position - 5
    seg = max(pcm.bit_length() - 5, 0)
    if seg == 0:
        aval = (pcm >> 1) & 0x0F
    else:
        aval = (seg << 4) | ((pcm >> seg) & 0x0F)
    return aval ^ mask


def alaw2linear(a: int) -> int:
    """A-law byte → 16-bit signed linear (G.711 decode)."""
    a ^= 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


_LAW_TAGS = {"ulaw": 7, "alaw": 6}
_TAG_LAWS = {v: k for k, v in _LAW_TAGS.items()}
_ENCODERS = {"ulaw": linear2ulaw, "alaw": linear2alaw}
_DECODERS = {"ulaw": ulaw2linear, "alaw": alaw2linear}


def encode_wav_g711(
    samples: list[int], sample_rate: int = 8000, law: str = "ulaw"
) -> bytes:
    """16-bit mono samples → RIFF/WAVE bytes with format tag 7 (μ-law)
    or 6 (A-law), 8 bits stored per sample."""
    enc = _ENCODERS[law]
    data = bytes(enc(int(s)) for s in samples)
    fmt = struct.pack(
        "<HHIIHH",
        _LAW_TAGS[law],  # wFormatTag
        1,  # channels
        sample_rate,
        sample_rate,  # byte rate (1 byte/sample)
        1,  # block align
        8,  # bits per sample
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_g711(buf: bytes) -> tuple[list[int], int, str]:
    """RIFF/WAVE (fmt 7 or 6) → (16-bit samples, sample_rate, law).

    Chunk-walks the container; raises ValueError on anything that is
    not a mono 8-bit G.711 stream.
    """
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("g711: not a RIFF/WAVE stream")
    pos = 12
    rate = None
    law = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            tag, ch, rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", body)
            if tag not in _TAG_LAWS:
                raise ValueError(f"g711: format tag {tag} is not G.711")
            if ch != 1 or bits != 8:
                raise ValueError("g711: only mono 8-bit streams")
            law = _TAG_LAWS[tag]
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks pad to even
    if law is None or data is None:
        raise ValueError("g711: missing fmt or data chunk")
    dec = _DECODERS[law]
    return [dec(b) for b in data], rate, law
