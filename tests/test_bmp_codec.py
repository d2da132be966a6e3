"""BMP codec (functions/bmp.py): roundtrips across all profiles,
top-down decode, RLE compression effect, corruption rejection, fuzz."""

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pg_logical_replication_spark.functions.bmp import decode_bmp, encode_bmp


def test_all_profiles_roundtrip():
    px = [(i * 37) % 256 for i in range(19 * 7)]
    for bits, rle in ((8, False), (24, False), (8, True)):
        w, h, out = decode_bmp(encode_bmp(19, 7, px, bits=bits, rle=rle))
        assert (w, h, out) == (19, 7, px)


def test_top_down_negative_height_decodes():
    enc = bytearray(encode_bmp(3, 2, [1, 2, 3, 4, 5, 6]))
    off = struct.unpack("<I", enc[10:14])[0]
    enc[22:26] = struct.pack("<i", -2)
    rows, rb = enc[off:], 4  # 3 px + 1 pad byte
    td = bytes(rows[rb : 2 * rb] + rows[0:rb])
    assert decode_bmp(bytes(enc[:off]) + td) == (3, 2, [1, 2, 3, 4, 5, 6])


def test_rle_compresses_flat_image():
    flat = encode_bmp(32, 32, [7] * 1024, rle=True)
    raw = encode_bmp(32, 32, [7] * 1024)
    assert len(flat) < len(raw)


def test_rejections():
    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"PNG" + b"\x00" * 60)
    enc = encode_bmp(8, 8, list(range(64)))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(enc[:-10])
    rle = bytearray(encode_bmp(8, 8, list(range(64)), rle=True))
    with pytest.raises(ValueError, match="end-of-bitmap"):
        decode_bmp(bytes(rle[:-2]))
    with pytest.raises(ValueError, match="pixel count"):
        encode_bmp(4, 4, [0] * 15)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(1, 40), st.integers(1, 20),
    st.sampled_from([(8, False), (24, False), (8, True)]),
    st.randoms(use_true_random=False),
)
def test_fuzz_roundtrip(w, h, mode, rng):
    px = [rng.randrange(256) for _ in range(w * h)]
    bits, rle = mode
    assert decode_bmp(encode_bmp(w, h, px, bits=bits, rle=rle)) == (w, h, px)


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_garbage_fails_cleanly(junk):
    try:
        decode_bmp(junk)
    except Exception as e:
        assert isinstance(e, ValueError) or isinstance(e, struct.error)
