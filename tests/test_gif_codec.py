"""functions/gif.py — GIF87a/89a with real variable-width LZW."""

import base64
import random
import struct

import pytest

from pg_logical_replication_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


@pytest.mark.parametrize("dims", [(1, 1), (7, 3), (16, 16), (33, 9)])
@pytest.mark.parametrize("interlace", [False, True])
def test_roundtrip_random_indices(dims, interlace):
    w, h = dims
    rng = random.Random(42)
    px = bytes(rng.randrange(256) for _ in range(w * h))
    sw, sh, frames = decode_gif(encode_gif(w, h, px, interlace=interlace))
    assert (sw, sh) == (w, h)
    assert frames[0]["indices"] == px
    assert frames[0]["palette"][42] == (42, 42, 42)


def test_lzw_actually_compresses():
    rep = bytes([7] * 5000)
    assert len(_lzw_encode(8, rep)) < 200  # runs collapse into codes


def test_lzw_dictionary_overflow_clears():
    """>4096 distinct phrases forces a mid-stream CLEAR; decode must
    resync."""
    rng = random.Random(9)
    px = bytes(rng.randrange(256) for _ in range(30000))
    assert _lzw_decode(8, _lzw_encode(8, px), len(px)) == px


def test_decodes_external_1x1_transparent_gif():
    """The ubiquitous 43-byte 1x1 transparent GIF (authored by a
    DIFFERENT encoder decades ago) — symmetric codec bugs cannot
    cancel here."""
    b = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    sw, sh, frames = decode_gif(b)
    f = frames[0]
    assert (sw, sh) == (1, 1)
    assert f["indices"] == b"\x00"
    assert f["transparent"] == 0
    assert f["palette"][:2] == [(0, 0, 0), (255, 255, 255)]


def test_multi_frame_animation_with_delays():
    """Two frames concatenated with graphic-control delays decode as an
    animation; hand-assembled container around encoder frames."""
    f1 = encode_gif(4, 4, bytes(range(16)))
    f2 = encode_gif(4, 4, bytes(reversed(range(16))))
    # splice: header+GCT from f1, then GCE+image of each, trailer
    hdr_end = 13 + 768
    img1 = f1[hdr_end:-1]
    img2 = f2[hdr_end:-1]
    gce = b"\x21\xf9\x04\x00" + struct.pack("<H", 25) + b"\x00\x00"
    data = f1[:hdr_end] + gce + img1 + gce + img2 + b"\x3b"
    sw, sh, frames = decode_gif(data)
    assert len(frames) == 2
    assert frames[0]["delay_ms"] == 250 and frames[1]["delay_ms"] == 250
    assert frames[0]["indices"] == bytes(range(16))
    assert frames[1]["indices"] == bytes(reversed(range(16)))


def test_refusals():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"PNG....")
    with pytest.raises(ValueError, match="width"):
        encode_gif(4, 4, b"\x00" * 15)
    good = encode_gif(8, 8, bytes(64))
    with pytest.raises(Exception):
        decode_gif(good[: len(good) // 2])
