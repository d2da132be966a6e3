"""functions/vp8l.py — WebP lossless bitstream codec.

The encoder emits only the literal/flat-code subset, so every decoder
feature beyond it (normal prefix codes with 16/17/18 repeats, LZ77
backrefs + the 2D distance map, color cache, the four transforms,
sub-byte palette packing) is exercised by streams HAND-ASSEMBLED from
the public spec here — symmetric encoder/decoder bugs cannot cancel.
"""

import random

import pytest

from pg_logical_replication_spark.functions.vp8l import (
    _BitsW,
    decode_vp8l,
    decode_webp_lossless,
    encode_vp8l,
    encode_webp_lossless,
)


# ------------------------------------------------------- roundtrips
@pytest.mark.parametrize("dims", [(1, 1), (3, 2), (16, 9), (40, 23)])
def test_roundtrip_random_argb(dims):
    w, h = dims
    rng = random.Random(42)
    px = [rng.getrandbits(32) for _ in range(w * h)]
    assert decode_webp_lossless(encode_webp_lossless(w, h, px)) == (w, h, px)


def test_container_and_refusals():
    import struct

    buf = encode_webp_lossless(2, 2, [0] * 4)
    assert buf[:4] == b"RIFF" and buf[8:12] == b"WEBP"
    with pytest.raises(ValueError, match="signature"):
        decode_vp8l(b"\x00\x01\x02")
    body = b"\x00" * 10
    lossy = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP"
        + b"VP8 " + struct.pack("<I", len(body)) + body
    )
    with pytest.raises(NotImplementedError, match="LOSSY"):
        decode_webp_lossless(lossy)


# --------------------------------------------- hand-built bitstreams
def _header(w, h, width, height):
    w.write(0x2F, 8)
    w.write(width - 1, 14)
    w.write(height - 1, 14)
    w.write(1, 1)  # alpha hint
    w.write(0, 3)  # version


def _single_symbol(w, sym):
    w.write(1, 1)
    w.write(0, 1)
    if sym < 2:
        w.write(0, 1)
        w.write(sym, 1)
    else:
        w.write(1, 1)
        w.write(sym, 8)


def _two_symbol_normal(w, sym_a, sym_b, alphabet):
    """Normal prefix code with exactly two length-1 symbols, written
    through the code-length code (exercises 17/18 zero-runs)."""
    assert sym_a < sym_b < alphabet
    w.write(0, 1)             # not simple
    w.write(0, 4)             # num_code_lengths = 4 → order 17,18,0,1
    for _ in range(4):        # cl lengths: 17,18,0,1 all length 2
        w.write(2, 3)
    w.write(0, 1)             # no max_symbol cap
    # canonical cl codes: 0→00, 1→01, 17→10, 18→11

    def zeros(n):
        while n:
            if n >= 11:
                take = min(n, 138)
                w.write_code(0b11, 2)      # 18
                w.write(take - 11, 7)
                n -= take
            elif n >= 3:
                take = min(n, 10)
                w.write_code(0b10, 2)      # 17
                w.write(take - 3, 3)
                n -= take
            else:
                w.write_code(0b00, 2)      # literal zero length
                n -= 1

    zeros(sym_a)
    w.write_code(0b01, 2)                  # length-1 for sym_a
    zeros(sym_b - sym_a - 1)
    w.write_code(0b01, 2)                  # length-1 for sym_b
    zeros(alphabet - sym_b - 1)
    # canonical: sym_a → code 0, sym_b → code 1


def test_hand_lz77_backref_with_distance_map():
    """4x2: first row four literals (same color), second row one LZ77
    backref of length 4 at distance_code 1 = (0,1) = one row up."""
    w = _BitsW()
    _header(w, None, 4, 2) if False else _header(w, 2, 4, 2)
    w.write(0, 1)  # no transform
    w.write(0, 1)  # no color cache
    w.write(0, 1)  # no meta image
    # green: symbols {50 literal, 259 = length-code 3 → length 4}
    _two_symbol_normal(w, 50, 259, 256 + 24)
    _single_symbol(w, 60)    # red
    _single_symbol(w, 70)    # blue
    _single_symbol(w, 255)   # alpha
    _single_symbol(w, 0)     # distance: symbol 0 → dist_code 1
    for _ in range(4):
        w.write_code(0, 1)   # green literal (code 0)
    w.write_code(1, 1)       # green sym 259: length code 3 → length 4
    w.flush()
    dw, dh, px = decode_vp8l(bytes(w.out))
    expect = (255 << 24) | (60 << 16) | (50 << 8) | 70
    assert (dw, dh) == (4, 2)
    assert px == [expect] * 8


def test_hand_color_cache_hit():
    """2x1: one literal, then a color-cache reference to it."""
    lit = (255 << 24) | (60 << 16) | (50 << 8) | 70
    cache_bits = 1
    idx = (0x1E35A7BD * lit & 0xFFFFFFFF) >> (32 - cache_bits)
    w = _BitsW()
    _header(w, 2, 2, 1)
    w.write(0, 1)  # no transform
    w.write(1, 1)  # color cache present (cache-info precedes meta bit)
    w.write(cache_bits, 4)
    w.write(0, 1)  # no meta
    # green alphabet = 256 + 24 + 2; symbols {50, 280 + idx}
    _two_symbol_normal(w, 50, 256 + 24 + idx, 256 + 24 + 2)
    _single_symbol(w, 60)
    _single_symbol(w, 70)
    _single_symbol(w, 255)
    _single_symbol(w, 0)
    w.write_code(0, 1)  # literal
    w.write_code(1, 1)  # cache hit
    w.flush()
    assert decode_vp8l(bytes(w.out)) == (2, 1, [lit, lit])


def test_hand_subtract_green_transform():
    """Literal (r=10, g=20, b=30) under SUBTRACT_GREEN must decode to
    (r=30, g=20, b=50): g is added back to r and b mod 256."""
    w = _BitsW()
    _header(w, 2, 1, 1)
    w.write(1, 1)  # a transform
    w.write(2, 2)  # SUBTRACT_GREEN
    w.write(0, 1)  # no more transforms
    w.write(0, 1)  # no cache
    w.write(0, 1)  # no meta
    _single_symbol(w, 20)   # green
    _single_symbol(w, 10)   # red (residual)
    _single_symbol(w, 30)   # blue (residual)
    _single_symbol(w, 255)  # alpha
    _single_symbol(w, 0)    # distance
    # all codes single-symbol → zero data bits for the 1 pixel
    w.flush()
    _, _, px = decode_vp8l(bytes(w.out))
    assert px == [(255 << 24) | (30 << 16) | (20 << 8) | 50]


def test_hand_palette_with_subbyte_packing():
    """COLOR_INDEXING, 4 colors → 2 bits/pixel, width 5 packs into
    ceil(5/4)=2 green bytes; palette entries are delta-coded."""
    w = _BitsW()
    _header(w, 5, 5, 1)
    w.write(1, 1)  # a transform
    w.write(3, 2)  # COLOR_INDEXING
    w.write(3, 8)  # n_colors - 1 = 3
    w.write(0, 1)  # palette sub-image: no color cache
    # palette image: 4 pixels, delta-coded. Choose palette deltas:
    # p0 = FF000000|101010? keep simple: deltas via literals.
    # green / red / blue two-symbol codes so entries can differ
    _two_symbol_normal(w, 1, 2, 256 + 24)   # green deltas 1 or 2
    _single_symbol(w, 5)                     # red delta always 5
    _single_symbol(w, 9)                     # blue delta always 9
    _two_symbol_normal(w, 0, 255, 256)       # alpha: 255 first, 0 after
    _single_symbol(w, 0)
    # entries (argb deltas): e0 = (255,5,1,9), e1..e3 = (0,5,2,9)
    w.write_code(0, 1)  # g=1
    w.write_code(1, 1)  # alpha=255
    for _ in range(3):
        w.write_code(1, 1)  # g=2
        w.write_code(0, 1)  # alpha=0
    # main image: width ceil(5/4)=2, 1 row; indices 0,1,2,3,2 packed
    # 2 bits each LSB-first within the green byte:
    b0 = 0 | (1 << 2) | (2 << 4) | (3 << 6)
    b1 = 2
    w.write(0, 1)  # no more transforms
    w.write(0, 1)  # no cache
    w.write(0, 1)  # no meta
    _two_symbol_normal(w, min(b0, b1), max(b0, b1), 256 + 24)  # green
    _single_symbol(w, 0)    # red
    _single_symbol(w, 0)    # blue
    _single_symbol(w, 255)  # alpha
    _single_symbol(w, 0)    # dist
    w.write_code(0 if b0 <= b1 else 1, 1)
    w.write_code(1 if b0 <= b1 else 0, 1)
    w.flush()
    dw, dh, px = decode_vp8l(bytes(w.out))
    # cumulative palette: p0=(255,5,1,9); p1=(255,10,3,18);
    # p2=(255,15,5,27); p3=(255,20,7,36)
    def argb(a, r, g, b):
        return (a << 24) | (r << 16) | (g << 8) | b
    pal = [argb(255, 5, 1, 9), argb(255, 10, 3, 18),
           argb(255, 15, 5, 27), argb(255, 20, 7, 36)]
    assert (dw, dh) == (5, 1)
    assert px == [pal[0], pal[1], pal[2], pal[3], pal[2]]


def test_hand_predictor_transform_left_mode():
    """PREDICTOR transform, one 4-pixel row, block bits covering the
    whole image with mode 1 (L). Residuals accumulate left-to-right;
    pixel (0,0) predicts opaque black (0xff000000)."""
    w = _BitsW()
    _header(w, 4, 4, 1)
    w.write(1, 1)  # a transform
    w.write(0, 2)  # PREDICTOR
    w.write(2, 3)  # size_bits = 4 → 16x16 blocks → 1x1 mode image
    w.write(0, 1)  # mode sub-image: no color cache
    # mode sub-image: 1 pixel, mode in GREEN channel = 1 (L)
    _single_symbol(w, 1)    # green = mode 1
    _single_symbol(w, 0)
    _single_symbol(w, 0)
    _single_symbol(w, 0)
    _single_symbol(w, 0)
    w.write(0, 1)  # no more transforms
    w.write(0, 1)  # no cache
    w.write(0, 1)  # no meta
    # residuals: all pixels (a=1, r=2, g=3, b=4)
    _single_symbol(w, 3)
    _single_symbol(w, 2)
    _single_symbol(w, 4)
    _single_symbol(w, 1)
    _single_symbol(w, 0)
    w.flush()
    _, _, px = decode_vp8l(bytes(w.out))

    def argb(a, r, g, b):
        return (a << 24) | (r << 16) | (g << 8) | b

    # (0,0): residual + ff000000 = (0x00,2,3,4)+(ff,0,0,0)
    assert px[0] == argb(0x00, 2, 3, 4)
    # then L-accumulation along the row
    assert px[1] == argb(0x01, 4, 6, 8)
    assert px[2] == argb(0x02, 6, 9, 12)
    assert px[3] == argb(0x03, 8, 12, 16)


def test_decoder_rejects_incomplete_code():
    w = _BitsW()
    _header(w, 1, 1, 1)
    w.write(0, 1)
    w.write(0, 1)
    w.write(0, 1)
    # normal code with ONE symbol at length 2 → kraft-incomplete
    w.write(0, 1)             # not simple
    w.write(0, 4)             # 4 code lengths (17,18,0,1)
    for ln in (0, 0, 0, 2):   # only literal-0 present at length 2
        w.write(ln, 3)
    w.flush()
    with pytest.raises(ValueError):
        decode_vp8l(bytes(w.out))
