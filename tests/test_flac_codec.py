"""functions/flac.py — the real FLAC codec (RFC 9639 / xiph spec
profile). Losslessness makes every round-trip assertion exact."""

import math
import struct

import pytest

from pg_logical_replication_spark.functions.flac import (
    _BitWriter,
    _crc8,
    _crc16,
    _utf8_coded,
    decode_flac,
    encode_flac,
)


def _formula(n, seed=37):
    return [((seed * 5 + i * 101) % 2001) - 1000 for i in range(n)]


# ----------------------------------------------------- encoder paths
@pytest.mark.parametrize("n", [1, 63, 256, 1000])
def test_mono_roundtrip_exact(n):
    s = _formula(n)
    sr, nc, bps, chans = decode_flac(encode_flac(s, sample_rate=16000))
    assert (sr, nc, bps) == (16000, 1, 16)
    assert chans[0] == s


def test_stereo_roundtrip_and_compression():
    L = [int(1000 * math.sin(i / 20)) for i in range(3000)]
    R = [int(800 * math.cos(i / 15)) for i in range(3000)]
    buf = encode_flac([L, R], sample_rate=44100, block_size=1024)
    sr, nc, _, ch = decode_flac(buf)
    assert (sr, nc) == (44100, 2) and ch == [L, R]
    assert len(buf) < 2 * 2 * 3000 * 0.5  # FIXED predictors actually compress


def test_constant_signal_tiny_file():
    buf = encode_flac([123] * 5000)
    assert decode_flac(buf)[3][0] == [123] * 5000
    assert len(buf) < 100


def test_extreme_amplitudes():
    s = [32767, -32768] * 100 + [-32768] * 50 + [32767] * 50
    assert decode_flac(encode_flac(s))[3][0] == s


def test_md5_detects_corruption():
    buf = bytearray(encode_flac(_formula(2000), block_size=512))
    # flip a residual bit deep in a frame body; some flips land where
    # CRC16 catches them, MD5 is the backstop for the rest
    with pytest.raises(ValueError):
        bad = bytearray(buf)
        bad[len(bad) - 40] ^= 0x10
        decode_flac(bytes(bad))


def test_encoder_input_validation():
    with pytest.raises(NotImplementedError, match="16-bit"):
        encode_flac([1, 2], bits_per_sample=24)
    with pytest.raises(ValueError, match="channels"):
        encode_flac([[1], [2], [3]])
    with pytest.raises(ValueError, match="equal length"):
        encode_flac([[1, 2], [3]])


def test_not_flac_refused():
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFFxxxxWAVE")


# ------------------------------- decoder-only paths (hand-built frames)
def _hand_frame(subframe_writer, bs, chan_code, n_sub):
    """Assemble one valid FLAC stream around hand-written subframes."""
    hdr = _BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)
    hdr.write(7, 4)       # block size: 16-bit payload
    hdr.write(5, 4)       # 16 kHz
    hdr.write(chan_code, 4)
    hdr.write(4, 3)       # 16-bit
    hdr.write(0, 1)
    hdr.align()
    header = bytes(hdr.out) + _utf8_coded(0) + struct.pack(">H", bs - 1)
    header += bytes([_crc8(header)])
    body = _BitWriter()
    for ci in range(n_sub):
        subframe_writer(body, ci)
    body.align()
    frame = header + bytes(body.out)
    frame += struct.pack(">H", _crc16(frame))

    info = _BitWriter()
    info.write(bs, 16); info.write(bs, 16)
    info.write(0, 24); info.write(0, 24)
    info.write(16000, 20)
    info.write(n_sub - 1 if chan_code < 8 else 1, 3)
    info.write(15, 5)  # bps-1
    info.write(bs, 36)
    streaminfo = bytes(info.out) + b"\x00" * 16  # MD5 unset → skip check
    return (
        b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:]
        + streaminfo + frame
    )


def test_decodes_verbatim_subframe():
    vals = [7, -3, 1000, -32768, 32767, 0, 42, -1]

    def sub(w, _ci):
        w.write(0, 1); w.write(1, 6); w.write(0, 1)  # VERBATIM
        for v in vals:
            w.write(v & 0xFFFF, 16)

    data = _hand_frame(sub, len(vals), chan_code=0, n_sub=1)
    assert decode_flac(data)[3][0] == vals


def test_decodes_lpc_subframe():
    """LPC order 1, precision 3, shift 1, coef [2]: pred = prev — a
    constant run encoded the long way. The encoder never emits LPC, so
    only the decoder's LPC math is on trial."""

    def sub(w, _ci):
        w.write(0, 1); w.write(32, 6); w.write(0, 1)  # LPC order 1
        w.write(100 & 0xFFFF, 16)       # warm-up
        w.write(2, 4)                   # precision-1 = 2 → 3 bits
        w.write(1, 5)                   # shift 1
        w.write(2, 3)                   # coef [2]
        w.write(0, 2); w.write(0, 4)    # rice method 0, porder 0
        w.write(0, 4)                   # rice param 0
        for _ in range(7):              # residuals all 0 (unary '1')
            w.write(1, 1)

    data = _hand_frame(sub, 8, chan_code=0, n_sub=1)
    assert decode_flac(data)[3][0] == [100] * 8


def test_decodes_mid_side_stereo():
    """Mid/side decorrelation: hand-encode mid/side constants for
    L=10, R=4 → side=6, mid=(10+4)>>1=7."""

    def sub(w, ci):
        w.write(0, 1); w.write(0, 6); w.write(0, 1)  # CONSTANT
        if ci == 0:
            w.write(7 & 0xFFFF, 16)        # mid, 16 bits
        else:
            w.write(6 & 0x1FFFF, 17)       # side, 17 bits (one extra)

    data = _hand_frame(sub, 4, chan_code=10, n_sub=2)
    _, nc, _, chans = decode_flac(data)
    assert nc == 2
    assert chans[0] == [10] * 4 and chans[1] == [4] * 4


def test_decodes_rice_method1_and_escape_partitions():
    """Residual method 1 (5-bit params) with partition order 1: one
    Rice partition and one escaped raw partition."""
    vals = [5, 5, 5, 5, 9, -9, 20, -20]

    def sub(w, _ci):
        w.write(0, 1); w.write(8, 6); w.write(0, 1)  # FIXED order 0
        w.write(1, 2)                   # residual method 1
        w.write(1, 4)                   # partition order 1 → 2 partitions
        w.write(2, 5)                   # partition 1: rice param 2
        from pg_logical_replication_spark.functions.flac import _zigzag
        for v in vals[:4]:
            u = _zigzag(v)
            w.write_unary(u >> 2)
            w.write(u & 3, 2)
        w.write(31, 5)                  # partition 2: escape (11111)
        w.write(8, 5)                   # raw bits = 8
        for v in vals[4:]:
            w.write(v & 0xFF, 8)

    data = _hand_frame(sub, 8, chan_code=0, n_sub=1)
    assert decode_flac(data)[3][0] == vals


def test_decodes_wasted_bits():
    """Wasted-bits flag: samples stored >>1 with k=1 restored by <<1."""

    def sub(w, _ci):
        w.write(0, 1); w.write(0, 6)    # CONSTANT
        w.write(1, 1)                   # wasted bits present
        w.write(1, 1)                   # unary k-1=0 → k=1
        w.write(21 & 0x7FFF, 15)        # bps-1 bits, value 21 → 42

    data = _hand_frame(sub, 4, chan_code=0, n_sub=1)
    assert decode_flac(data)[3][0] == [42] * 4
