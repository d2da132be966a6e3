"""Ogg container pins (functions/ogg.py)."""

import struct

import pytest

from pg_logical_replication_spark.functions.ogg import (
    encode_ogg_page,
    encode_ogg_stream,
    ogg_crc,
    probe_ogg,
)


def test_roundtrip_both_codecs():
    for codec, ch, rate in (("vorbis", 2, 44100), ("opus", 1, 48000)):
        buf = encode_ogg_stream(codec, ch, rate, 3, 4800)
        info = probe_ogg(buf)
        assert info["codec_name"] == codec
        assert (info["channels"], info["sample_rate"]) == (ch, rate)
        assert info["n_pages"] == 4
        assert info["duration_ms"] == (3 * 4800 * 1000) // rate


def test_crc_catches_any_single_bit_flip():
    buf = bytearray(encode_ogg_stream("opus", 1, 48000, 2, 100))
    for pos in range(0, len(buf), 17):
        if 22 <= pos % 1000 < 26:  # flipping the CRC field itself is
            pass                   # still caught (value mismatch)
        b2 = bytearray(buf)
        b2[pos] ^= 0x01
        with pytest.raises(ValueError):
            probe_ogg(bytes(b2))


def test_lacing_reassembles_multi_segment_packets():
    """A 600-byte packet spans three lacing values (255+255+90); the
    probe must reassemble the FIRST packet across segments."""
    ident = b"OpusHead" + struct.pack("<BBHIhB", 1, 2, 312, 48000, 0, 0)
    big = ident + bytes(600 - len(ident))
    pages = encode_ogg_page([big], 0, 9, 0, header_type=0x02)
    pages += encode_ogg_page([b"x" * 10], 4800, 9, 1, header_type=0x04)
    info = probe_ogg(pages)
    assert info["codec_name"] == "opus" and info["channels"] == 2


def test_crc_is_the_unreflected_0x04c11db7():
    """Pin the CRC parameterization itself: shifting-register reference
    implementation (MSB-first, poly 0x04C11DB7, init 0, xorout 0) must
    match the table-driven one byte-for-byte."""
    def ref(data):
        crc = 0
        for byte in data:
            for k in range(7, -1, -1):
                bit = (byte >> k) & 1
                top = (crc >> 31) & 1
                crc = ((crc << 1) & 0xFFFFFFFF) | bit
                if top:
                    crc ^= 0x04C11DB7
        # flush 32 zero bits
        for _ in range(32):
            top = (crc >> 31) & 1
            crc = (crc << 1) & 0xFFFFFFFF
            if top:
                crc ^= 0x04C11DB7
        return crc

    for data in (b"", b"\x00", b"123456789", b"OggS" + bytes(30)):
        assert ogg_crc(data) == ref(data), data


def test_garbage_rejects():
    with pytest.raises(ValueError):
        probe_ogg(b"\x00" * 64)
    with pytest.raises(ValueError):
        probe_ogg(encode_ogg_stream("opus", 1, 48000, 1, 10)[:-3])
