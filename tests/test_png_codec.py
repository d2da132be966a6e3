"""functions/png.py — the real stdlib PNG codec (W3C spec profile:
8-bit grey/RGB/RGBA, filters 0-4, no interlace)."""

import base64

import pytest

from pg_logical_replication_spark.functions.png import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
)


def _px(n, seed=1):
    return bytes((seed * 31 + i * 7) % 256 for i in range(n))


@pytest.mark.parametrize("channels", [1, 3, 4])
@pytest.mark.parametrize("dims", [(1, 1), (7, 11), (16, 5), (33, 9)])
def test_roundtrip_all_channels_and_filters(channels, dims):
    w, h = dims
    px = _px(w * h * channels)
    out = decode_png(encode_png(w, h, px, channels))
    assert out == (w, h, channels, px)


def test_encoder_exercises_every_filter_type():
    """Rows cycle filter types 0-4, so any ≥5-row image proves the
    decoder's Sub/Up/Average/Paeth inverses against the encoder."""
    import zlib

    data = encode_png(4, 6, _px(24), 1)
    # IDAT payload: find chunk, inflate, read per-row filter bytes
    pos = 8
    raw = b""
    while pos < len(data):
        length = int.from_bytes(data[pos : pos + 4], "big")
        typ = data[pos + 4 : pos + 8]
        if typ == b"IDAT":
            raw += data[pos + 8 : pos + 8 + length]
        pos += 12 + length
    lines = zlib.decompress(raw)
    fts = [lines[r * 5] for r in range(6)]
    assert fts == [0, 1, 2, 3, 4, 0]


def test_decodes_external_png():
    """A widely-published minimal 1x1 RGBA PNG from a DIFFERENT encoder —
    symmetric encoder/decoder bugs cannot cancel out here."""
    b = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkY"
        "PhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
    )
    w, h, ch, px = decode_png(b)
    assert (w, h, ch) == (1, 1, 4)
    assert len(px) == 4


def test_corrupt_crc_rejected():
    data = bytearray(encode_png(4, 4, _px(16), 1))
    data[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_bad_signature_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNX" + b"\x00" * 16)


def test_truncation_rejected():
    data = encode_png(4, 4, _px(16), 1)
    with pytest.raises(ValueError):
        decode_png(data[: len(data) - 6])


def test_unsupported_features_raise_not_implemented():
    import struct
    import zlib as z

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", z.crc32(typ + body) & 0xFFFFFFFF)
        )

    # 16-bit depth
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    with pytest.raises(NotImplementedError, match="depth"):
        decode_png(PNG_SIGNATURE + chunk(b"IHDR", ihdr))
    # Adam7 interlace
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1)
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(PNG_SIGNATURE + chunk(b"IHDR", ihdr))


def test_encode_validates_input():
    with pytest.raises(ValueError, match="channels"):
        encode_png(2, 2, b"\x00" * 8, channels=2)
    with pytest.raises(ValueError, match="pixel bytes"):
        encode_png(2, 2, b"\x00" * 3, channels=1)


def test_ancillary_chunks_skipped():
    import struct
    import zlib as z

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", z.crc32(typ + body) & 0xFFFFFFFF)
        )

    data = encode_png(2, 2, _px(4), 1)
    # splice a tEXt chunk between IHDR and IDAT
    ihdr_end = 8 + 12 + 13
    spliced = (
        data[:ihdr_end] + chunk(b"tEXt", b"k\x00v") + data[ihdr_end:]
    )
    assert decode_png(spliced) == decode_png(data)
