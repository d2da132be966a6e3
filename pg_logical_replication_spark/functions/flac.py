"""FLAC codec (lossless audio), stdlib-only — from the PUBLIC format
specification (xiph.org/flac/format.html, now RFC 9639).

Scope:

* **decode**: STREAMINFO parsing, frame sync + header (block size /
  sample rate / channel assignment / sample size codes, UTF-8-style
  coded frame number, CRC-8 header check, CRC-16 frame check),
  subframe types CONSTANT, VERBATIM, FIXED (orders 0-4) and LPC
  (arbitrary order, quantized coefficients + shift), Rice residual
  partitions (methods 0 and 1, escape-to-raw), wasted bits, and all
  four stereo decorrelation modes (independent, left/side, right/side,
  mid/side). STREAMINFO MD5 of the unencoded samples is verified when
  present.
* **encode**: 16-bit mono/stereo, independent channels, per-subframe
  choice of CONSTANT / FIXED order 0-2 with per-partition Rice
  parameter estimation — a real compressing encoder (constant and
  low-order-predictable signals shrink dramatically), byte-exact
  losslessness guaranteed by the format.

Like ``functions/png.py`` and ``functions/jpeg.py`` this graduates a
multimodal stub into a REAL codec: FLAC is lossless, so synthesized
integer sample formulas survive a full encode → decode round-trip
bit-exactly and a SQL oracle can predict every decoded statistic in
closed form (``operators/multimodal.py:synthesize_flac_assets``).
"""

from __future__ import annotations

import hashlib
import struct

# ------------------------------------------------------------- tables
_BLOCK_SIZE_CODE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_RATE_CODE = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZE_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _crc8(data: bytes) -> int:
    """CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — the frame-header CRC."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — the frame CRC."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


# ---------------------------------------------------------- bit I/O
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits:
            self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
            self._n += nbits
            while self._n >= 8:
                self.out.append((self._acc >> (self._n - 8)) & 0xFF)
                self._n -= 8
            self._acc &= (1 << self._n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            b = self.data[self.byte]
            v = (v << 1) | ((b >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, nbits: int) -> int:
        v = self.read(nbits)
        if v >= 1 << (nbits - 1):
            v -= 1 << nbits
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _zigzag(v: int) -> int:
    return (v << 1) if v >= 0 else ((-v << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _utf8_coded(n: int) -> bytes:
    """FLAC's UTF-8-style coded number for frame/sample indices."""
    if n < 0x80:
        return bytes([n])
    out = []
    marks = [(0x7FF, 0xC0, 1), (0xFFFF, 0xE0, 2), (0x1FFFFF, 0xF0, 3),
             (0x3FFFFFF, 0xF8, 4), (0x7FFFFFFF, 0xFC, 5),
             (0xFFFFFFFFF, 0xFE, 6)]
    for limit, lead, cont in marks:
        if n <= limit:
            out.append(lead | (n >> (6 * cont)))
            for i in range(cont - 1, -1, -1):
                out.append(0x80 | ((n >> (6 * i)) & 0x3F))
            return bytes(out)
    raise ValueError("frame number too large")


def _read_utf8_coded(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n_cont = 0
    mask = 0x40
    while b0 & mask:
        n_cont += 1
        mask >>= 1
    v = b0 & (mask - 1)
    for _ in range(n_cont):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("flac: bad coded number continuation")
        v = (v << 6) | (c & 0x3F)
    return v


# -------------------------------------------------------------- encode
def _best_rice_param(residuals: list[int], max_p: int = 14) -> int:
    total = sum(_zigzag(r) for r in residuals)
    if not residuals:
        return 0
    mean = total / len(residuals)
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < max_p:
        p += 1
    return p


def _encode_subframe(w: _BitWriter, samples: list[int], bps: int) -> None:
    """CONSTANT if flat, else best of FIXED orders 0-2 by residual
    magnitude, Rice-coded (partition order 0)."""
    if all(s == samples[0] for s in samples):
        w.write(0, 1)
        w.write(0, 6)  # type CONSTANT
        w.write(0, 1)  # no wasted bits
        w.write(samples[0] & ((1 << bps) - 1), bps)
        return
    best = None
    for order in (0, 1, 2):
        if len(samples) <= order:
            continue
        res = _residuals(samples, order)
        cost = sum(_zigzag(x).bit_length() for x in res)
        if best is None or cost < best[0]:
            best = (cost, order, res)
    _cost, order, res = best
    w.write(0, 1)
    w.write(0b001000 | order, 6)  # type FIXED, order
    w.write(0, 1)  # no wasted bits
    for s in samples[:order]:  # warm-up, raw
        w.write(s & ((1 << bps) - 1), bps)
    # residual: method 0 (4-bit rice), partition order 0
    w.write(0, 2)
    w.write(0, 4)
    p = _best_rice_param(res)
    w.write(p, 4)
    for x in res:
        u = _zigzag(x)
        w.write_unary(u >> p)
        w.write(u & ((1 << p) - 1), p)


def _residuals(samples: list[int], order: int) -> list[int]:
    coefs = _FIXED_COEFS[order]
    out = []
    for i in range(order, len(samples)):
        pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        out.append(samples[i] - pred)
    return out


def encode_flac(
    samples: list[int] | list[list[int]],
    sample_rate: int = 16000,
    bits_per_sample: int = 16,
    block_size: int = 4096,
) -> bytes:
    """Lossless FLAC encode of 16-bit PCM (mono list or per-channel
    lists), independent channels, CONSTANT/FIXED-order subframes."""
    if bits_per_sample != 16:
        raise NotImplementedError("encoder profile: 16-bit samples only")
    chans: list[list[int]] = (
        [samples] if samples and isinstance(samples[0], int) else list(samples)  # type: ignore[list-item]
    )
    if not chans or not (1 <= len(chans) <= 2):
        raise ValueError("encoder profile: 1 or 2 channels")
    n = len(chans[0])
    if any(len(c) != n for c in chans):
        raise ValueError("channels must be equal length")

    # MD5 of the unencoded little-endian interleaved samples
    md5 = hashlib.md5()
    inter = bytearray()
    for i in range(n):
        for c in chans:
            inter += struct.pack("<h", c[i])
    md5.update(bytes(inter))

    frames = bytearray()
    frame_idx = 0
    pos = 0
    min_fs = max_fs = None
    while pos < n:
        bs = min(block_size, n - pos)
        body = _encode_frame(
            [c[pos : pos + bs] for c in chans],
            frame_idx, bs, sample_rate, bits_per_sample, block_size,
        )
        min_fs = len(body) if min_fs is None else min(min_fs, len(body))
        max_fs = max(max_fs or 0, len(body))
        frames += body
        frame_idx += 1
        pos += bs

    info = _BitWriter()
    info.write(block_size, 16)  # min block size
    info.write(block_size, 16)  # max block size
    info.write(min_fs or 0, 24)
    info.write(max_fs or 0, 24)
    info.write(sample_rate, 20)
    info.write(len(chans) - 1, 3)
    info.write(bits_per_sample - 1, 5)
    info.write(n, 36)
    streaminfo = bytes(info.out) + md5.digest()
    assert len(streaminfo) == 34
    out = bytearray(b"fLaC")
    out += bytes([0x80 | 0]) + struct.pack(">I", 34)[1:]  # last block, type 0
    out += streaminfo
    out += frames
    return bytes(out)


def _encode_frame(
    block_chans: list[list[int]],
    frame_idx: int,
    bs: int,
    sample_rate: int,
    bps: int,
    nominal_bs: int,
) -> bytes:
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 1)  # reserved
    hdr.write(0, 1)  # fixed block size strategy (frame number coded)
    # block size: use code 7 (16-bit value at end) for full generality
    hdr.write(7, 4)
    sr_code = next(
        (k for k, v in _SAMPLE_RATE_CODE.items() if v == sample_rate), 0
    )
    hdr.write(sr_code, 4)
    hdr.write(len(block_chans) - 1, 4)  # independent channels
    ss_code = next(k for k, v in _SAMPLE_SIZE_CODE.items() if v == bps)
    hdr.write(ss_code, 3)
    hdr.write(0, 1)  # reserved
    hdr.align()
    header = bytes(hdr.out) + _utf8_coded(frame_idx)
    header += struct.pack(">H", bs - 1)  # block size code 7 payload
    if sr_code == 0:
        # sample rate not in the code table: fall back is not encoded
        # here; the decoder then reads it from STREAMINFO
        pass
    header += bytes([_crc8(header)])

    body = _BitWriter()
    for ch in block_chans:
        _encode_subframe(body, ch, bps)
    body.align()
    frame = header + bytes(body.out)
    return frame + struct.pack(">H", _crc16(frame))


# -------------------------------------------------------------- decode
def decode_flac(data: bytes, verify_md5: bool = True):
    """FLAC → ``(sample_rate, channels, bits_per_sample, [[ch samples]])``.

    Full subframe support (CONSTANT/VERBATIM/FIXED/LPC), all stereo
    decorrelation modes, Rice methods 0/1 with escapes, CRC-8/16
    verified per frame, STREAMINFO MD5 verified at the end (16-bit
    only; pass ``verify_md5=False`` to skip).
    """
    if data[:4] != b"fLaC":
        raise ValueError("flac: missing fLaC magic")
    pos = 4
    streaminfo = None
    while True:
        hdr = data[pos : pos + 4]
        last = hdr[0] & 0x80
        btype = hdr[0] & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + hdr[1:4])
        body = data[pos + 4 : pos + 4 + length]
        if btype == 0:
            streaminfo = body
        pos += 4 + length
        if last:
            break
    if streaminfo is None:
        raise ValueError("flac: missing STREAMINFO")
    r = _BitReader(streaminfo)
    r.read(16)  # min bs
    r.read(16)  # max bs
    r.read(24)
    r.read(24)
    sample_rate = r.read(20)
    nchan = r.read(3) + 1
    bps = r.read(5) + 1
    total = r.read(36)
    md5_expect = streaminfo[18:34]

    chans: list[list[int]] = [[] for _ in range(nchan)]
    while pos < len(data) and (total == 0 or len(chans[0]) < total):
        pos = _decode_frame(data, pos, chans, sample_rate, nchan, bps)
    if total:
        for c in chans:
            del c[total:]

    if verify_md5 and md5_expect != b"\x00" * 16 and bps == 16:
        md5 = hashlib.md5()
        inter = bytearray()
        for i in range(len(chans[0])):
            for c in chans:
                inter += struct.pack("<h", c[i])
        md5.update(bytes(inter))
        if md5.digest() != md5_expect:
            raise ValueError("flac: STREAMINFO MD5 mismatch (corrupt data)")
    return sample_rate, nchan, bps, chans


def _decode_frame(
    data: bytes, pos: int, chans: list[list[int]], sr: int, nchan: int,
    bps_default: int,
) -> int:
    r = _BitReader(data, pos)
    sync = r.read(14)
    if sync != 0b11111111111110:
        raise ValueError(f"flac: lost frame sync at byte {pos}")
    r.read(1)  # reserved
    r.read(1)  # blocking strategy
    bs_code = r.read(4)
    sr_code = r.read(4)
    chan_code = r.read(4)
    ss_code = r.read(3)
    r.read(1)  # reserved
    _read_utf8_coded(r)  # frame/sample number (order implied by stream)
    if bs_code == 6:
        bs = r.read(8) + 1
    elif bs_code == 7:
        bs = r.read(16) + 1
    else:
        bs = _BLOCK_SIZE_CODE[bs_code]
    if sr_code == 12:
        r.read(8)
    elif sr_code in (13, 14):
        r.read(16)
    elif sr_code == 15:
        raise ValueError("flac: invalid sample-rate code 15")
    bps = _SAMPLE_SIZE_CODE.get(ss_code, bps_default)
    hdr_end = r.byte
    if _crc8(data[pos:hdr_end]) != r.read(8):
        raise ValueError("flac: frame header CRC-8 mismatch")

    if chan_code < 8:
        n_sub = chan_code + 1
        mode = "indep"
    elif chan_code == 8:
        n_sub, mode = 2, "left_side"
    elif chan_code == 9:
        n_sub, mode = 2, "right_side"
    elif chan_code == 10:
        n_sub, mode = 2, "mid_side"
    else:
        raise ValueError("flac: reserved channel assignment")
    if mode == "indep" and n_sub != nchan:
        raise ValueError("flac: channel count mismatch")

    subs = []
    for ci in range(n_sub):
        ch_bps = bps
        # side channels carry one extra bit
        if (mode == "left_side" and ci == 1) or (
            mode == "right_side" and ci == 0
        ) or (mode == "mid_side" and ci == 1):
            ch_bps += 1
        subs.append(_decode_subframe(r, bs, ch_bps))
    r.align()
    frame_end = r.byte
    if _crc16(data[pos:frame_end]) != r.read(16):
        raise ValueError("flac: frame CRC-16 mismatch")

    if mode == "indep":
        for ci in range(n_sub):
            chans[ci].extend(subs[ci])
    elif mode == "left_side":
        for left, side in zip(subs[0], subs[1]):
            chans[0].append(left)
            chans[1].append(left - side)
    elif mode == "right_side":
        for side, right in zip(subs[0], subs[1]):
            chans[0].append(right + side)
            chans[1].append(right)
    else:  # mid_side
        for mid, side in zip(subs[0], subs[1]):
            m = (mid << 1) | (side & 1)
            chans[0].append((m + side) >> 1)
            chans[1].append((m - side) >> 1)
    return r.byte


def _decode_subframe(r: _BitReader, bs: int, bps: int) -> list[int]:
    if r.read(1) != 0:
        raise ValueError("flac: subframe padding bit set")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
        bps -= wasted
    if stype == 0:  # CONSTANT
        v = r.read_signed(bps)
        out = [v] * bs
    elif stype == 1:  # VERBATIM
        out = [r.read_signed(bps) for _ in range(bs)]
    elif 8 <= stype <= 12:  # FIXED
        order = stype - 8
        out = [r.read_signed(bps) for _ in range(order)]
        res = _decode_residual(r, bs, order)
        coefs = _FIXED_COEFS[order]
        for i, e in enumerate(res):
            pred = sum(
                c * out[order + i - 1 - j] for j, c in enumerate(coefs)
            )
            out.append(pred + e)
    elif stype >= 32:  # LPC
        order = stype - 31
        out = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise ValueError("flac: invalid qlp precision")
        shift = r.read_signed(5)
        coefs = [r.read_signed(precision) for _ in range(order)]
        res = _decode_residual(r, bs, order)
        for i, e in enumerate(res):
            pred = sum(
                c * out[order + i - 1 - j] for j, c in enumerate(coefs)
            ) >> shift
            out.append(pred + e)
    else:
        raise ValueError(f"flac: reserved subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def _decode_residual(r: _BitReader, bs: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise ValueError("flac: reserved residual coding method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    out: list[int] = []
    for part in range(nparts):
        count = bs >> porder
        if part == 0:
            count -= order
        p = r.read(pbits)
        if p == escape:  # raw residuals
            raw_bits = r.read(5)
            out.extend(r.read_signed(raw_bits) for _ in range(count))
        else:
            for _ in range(count):
                q = r.read_unary()
                u = (q << p) | r.read(p)
                out.append(_unzigzag(u))
    return out
