"""VP8L — the WebP LOSSLESS bitstream (public spec:
"WebP Lossless Bitstream Specification", RFC 9649 / the
developers.google.com specification) — stdlib-only.

Scope:

* **decode**: the full entropy layer — LSB-first bit reader, simple
  (1-2 symbol) and normal prefix codes (code-length codes with 16/17/18
  repeats, optional max_symbol counter), meta prefix images (spatially
  varying code groups), color cache, LZ77 backward references with the
  2D distance mapping — and all four transforms applied in reverse
  order: PREDICTOR (14 modes), COLOR (per-block color-transform
  deltas), SUBTRACT_GREEN, COLOR_INDEXING (palette, incl. sub-byte
  pixel packing for palettes ≤ 16 colors).
* **encode**: a spec-valid subset — no transforms, no LZ77, no color
  cache, flat 8-bit literal codes per channel — enough to write real
  VP8L files that any conformant decoder reads, and to round-trip
  arbitrary ARGB images bit-exactly (VP8L is lossless).

The LOSSY VP8 bitstream stays a loud stub
(``operators/multimodal.py``); this module graduates only the lossless
half of WebP, which is what palette graphics / screenshots / UI assets
in web scrapes predominantly use.

Pixels are ARGB uint32, row-major. Predictor edge conventions follow
the spec: pixel (0,0) predicts 0xff000000, the rest of row 0 predicts
L, column 0 predicts T, and the top-right neighbor of the last column
falls back to T.
"""

from __future__ import annotations

import struct

# distance_code 1..120 → (dx, dy) close-neighborhood offsets (spec §5.2)
DIST_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]

CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10,
                     11, 12, 13, 14, 15]


class _Bits:
    """LSB-first bit reader (VP8L reads little-endian bit packing)."""

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.data[self.pos >> 3]
            v |= ((byte >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _Prefix:
    """Canonical prefix code: decode walks bits MSB-of-code-first
    (each read bit extends the code), DEFLATE canonical assignment."""

    def __init__(self, lengths: list[int]):
        self.single: int | None = None
        present = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if len(present) == 1:
            self.single = present[0][1]
            return
        if not present:
            raise ValueError("vp8l: empty prefix code")
        # kraft completeness check
        if sum(1 << (15 - ln) for ln, _ in present) != 1 << 15:
            raise ValueError("vp8l: prefix code not complete")
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        last_len = 0
        for ln, sym in sorted(present):
            code <<= ln - last_len
            last_len = ln
            self.lut[(ln, code)] = sym
            code += 1

    def decode(self, r: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | r.read(1)
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("vp8l: invalid prefix code")


def _read_prefix_code(r: _Bits, alphabet_size: int) -> _Prefix:
    if r.read(1):  # simple code
        num_symbols = r.read(1) + 1
        if r.read(1):  # first symbol is 8 bits
            sym0 = r.read(8)
        else:
            sym0 = r.read(1)
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            sym1 = r.read(8)
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            lengths[sym0] = 1  # single-symbol code: zero-bit decode
            p = _Prefix.__new__(_Prefix)
            p.single = sym0
            return p
        return _Prefix(lengths)
    # normal code: code-length code first
    num_code_lengths = 4 + r.read(4)
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[CODE_LENGTH_ORDER[i]] = r.read(3)
    cl_code = _Prefix(cl_lengths)
    # optional cap on the number of coded symbols
    if r.read(1):
        length_nbits = 2 + 2 * r.read(3)
        max_symbol = 2 + r.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        code_len = cl_code.decode(r)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev = code_len
        elif code_len == 16:
            rep = 3 + r.read(2)
            for _ in range(rep):
                if symbol < alphabet_size:
                    lengths[symbol] = prev
                    symbol += 1
        elif code_len == 17:
            symbol += 3 + r.read(3)
        else:  # 18
            symbol += 11 + r.read(7)
    return _Prefix(lengths)


def _prefix_value(r: _Bits, code: int) -> int:
    """LZ77 length/distance prefix decoding (spec §5.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + r.read(extra) + 1


def _div_round_up(a: int, b: int) -> int:
    return (a + b - 1) // b


def _read_entropy_image(
    r: _Bits, w: int, h: int, allow_meta: bool
) -> tuple[list["_Group"], list[int] | None, int, int]:
    """Prefix-code groups + optional meta image; returns
    (groups, meta_pixels or None, meta_bits, cache_bits).

    Bitstream order per the spec ABNF (RFC 9649 §6 /
    libwebp DecodeImageStream): color-cache-info FIRST, then the
    meta-prefix (huffman image) bit, then the code groups.
    """
    cache_bits = 0
    if r.read(1):  # color cache
        cache_bits = r.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("vp8l: invalid color cache size")
    meta: list[int] | None = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and r.read(1):  # huffman image present
        meta_bits = r.read(3) + 2
        mw = _div_round_up(w, 1 << meta_bits)
        mh = _div_round_up(h, 1 << meta_bits)
        meta = _decode_image_data(r, mw, mh, allow_meta=False)
        n_groups = max((p >> 8) & 0xFFFF for p in meta) + 1
    groups = []
    for _ in range(n_groups):
        g = _Group(
            _read_prefix_code(r, 256 + 24 + (1 << cache_bits if cache_bits else 0)),
            _read_prefix_code(r, 256),
            _read_prefix_code(r, 256),
            _read_prefix_code(r, 256),
            _read_prefix_code(r, 40),
        )
        groups.append(g)
    return groups, meta, meta_bits, cache_bits


class _Group:
    __slots__ = ("green", "red", "blue", "alpha", "dist")

    def __init__(self, green, red, blue, alpha, dist):
        self.green = green
        self.red = red
        self.blue = blue
        self.alpha = alpha
        self.dist = dist


def _decode_image_data(
    r: _Bits, w: int, h: int, allow_meta: bool
) -> list[int]:
    """Spatially-coded ARGB image (used for the main image AND the
    transform/meta sub-images)."""
    groups, meta, meta_bits, cache_bits = _read_entropy_image(
        r, w, h, allow_meta
    )
    cache = [0] * (1 << cache_bits) if cache_bits else None
    n = w * h
    out: list[int] = [0] * n
    pos = 0
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            mp = meta[
                (y >> meta_bits) * _div_round_up(w, 1 << meta_bits)
                + (x >> meta_bits)
            ]
            g = groups[(mp >> 8) & 0xFFFF]
        else:
            g = groups[0]
        sym = g.green.decode(r)
        if sym < 256:  # literal
            red = g.red.decode(r)
            blue = g.blue.decode(r)
            alpha = g.alpha.decode(r)
            px = (alpha << 24) | (red << 16) | (sym << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
            pos += 1
        elif sym < 256 + 24:  # LZ77 backref
            length = _prefix_value(r, sym - 256)
            dist_code = _prefix_value(r, g.dist.decode(r))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or length > n - pos:
                raise ValueError("vp8l: backref out of bounds")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                if cache is not None:
                    cache[
                        (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
                pos += 1
        else:  # color-cache hit
            if cache is None:
                raise ValueError("vp8l: cache index without color cache")
            out[pos] = cache[sym - 256 - 24]
            pos += 1
    return out


# ---------------------------------------------------------- transforms
def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) & 0xFF) + ((b >> 24) & 0xFF)) // 2) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) // 2) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) // 2) << 8
        | ((((a) & 0xFF) + ((b) & 0xFF)) // 2)
    )


def _add_pixels(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) & 0xFF) << 24)
        | ((((a >> 16) + (b >> 16)) & 0xFF) << 16) & 0xFF0000
        | ((((a >> 8) + (b >> 8)) & 0xFF) << 8)
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(left: int, top: int, topleft: int) -> int:
    p_a = abs(((top >> 24) & 0xFF) - ((topleft >> 24) & 0xFF)) + \
        abs(((top >> 16) & 0xFF) - ((topleft >> 16) & 0xFF)) + \
        abs(((top >> 8) & 0xFF) - ((topleft >> 8) & 0xFF)) + \
        abs((top & 0xFF) - (topleft & 0xFF))
    p_b = abs(((left >> 24) & 0xFF) - ((topleft >> 24) & 0xFF)) + \
        abs(((left >> 16) & 0xFF) - ((topleft >> 16) & 0xFF)) + \
        abs(((left >> 8) & 0xFF) - ((topleft >> 8) & 0xFF)) + \
        abs((left & 0xFF) - (topleft & 0xFF))
    return left if p_a <= p_b else top


def _cas_full(left: int, top: int, topleft: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        v = _clamp(
            ((left >> shift) & 0xFF) + ((top >> shift) & 0xFF)
            - ((topleft >> shift) & 0xFF)
        )
        out |= v << shift
    return out


def _cas_half(ave: int, topleft: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        a = (ave >> shift) & 0xFF
        t = (topleft >> shift) & 0xFF
        v = _clamp(a + (a - t) // 2)
        out |= v << shift
    return out


def _predict(mode: int, px: list[int], x: int, y: int, w: int) -> int:
    pos = y * w + x
    left = px[pos - 1] if x > 0 else 0
    top = px[pos - w] if y > 0 else 0
    topleft = px[pos - w - 1] if (x > 0 and y > 0) else 0
    topright = px[pos - w + 1] if (y > 0 and x + 1 < w) else top
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:
        return _select(left, top, topleft)
    if mode == 12:
        return _cas_full(left, top, topleft)
    if mode == 13:
        return _cas_half(_avg2(left, top), topleft)
    raise ValueError(f"vp8l: predictor mode {mode}")


def _inv_predictor(px: list[int], w: int, h: int, bits: int,
                   modes: list[int]) -> None:
    mw = _div_round_up(w, 1 << bits)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                mode = 0
            elif y == 0:
                mode = 1  # row 0: L
            elif x == 0:
                mode = 2  # col 0: T
            else:
                mode = (modes[(y >> bits) * mw + (x >> bits)] >> 8) & 0xFF
            pred = _predict(mode, px, x, y, w)
            px[y * w + x] = _add_pixels(px[y * w + x], pred)


def _cdelta(t: int, c: int) -> int:
    # signed int8 × signed int8 >> 5 (spec §4.2)
    ts = t - 256 if t > 127 else t
    cs = c - 256 if c > 127 else c
    return (ts * cs) >> 5


def _inv_color_transform(px: list[int], w: int, h: int, bits: int,
                         elems: list[int]) -> None:
    mw = _div_round_up(w, 1 << bits)
    for y in range(h):
        for x in range(w):
            e = elems[(y >> bits) * mw + (x >> bits)]
            g2r = e & 0xFF          # blue channel of the element
            g2b = (e >> 8) & 0xFF   # green channel
            r2b = (e >> 16) & 0xFF  # red channel
            p = px[y * w + x]
            a = (p >> 24) & 0xFF
            r_ = (p >> 16) & 0xFF
            g = (p >> 8) & 0xFF
            b = p & 0xFF
            r_ = (r_ + _cdelta(g2r, g)) & 0xFF
            b = (b + _cdelta(g2b, g) + _cdelta(r2b, r_)) & 0xFF
            px[y * w + x] = (a << 24) | (r_ << 16) | (g << 8) | b


def _inv_subtract_green(px: list[int]) -> None:
    for i, p in enumerate(px):
        g = (p >> 8) & 0xFF
        r = ((p >> 16) + g) & 0xFF
        b = (p + g) & 0xFF
        px[i] = (p & 0xFF00FF00) | (r << 16) | b


# -------------------------------------------------------------- decode
def decode_vp8l(data: bytes) -> tuple[int, int, list[int]]:
    """VP8L chunk payload → (width, height, ARGB pixels)."""
    if not data or data[0] != 0x2F:
        raise ValueError("vp8l: bad signature")
    r = _Bits(data, 8)
    w = r.read(14) + 1
    h = r.read(14) + 1
    r.read(1)  # alpha-is-used hint
    if r.read(3) != 0:
        raise ValueError("vp8l: unsupported version")

    transforms = []  # applied in reverse at the end
    seen = set()
    xsize = w
    while r.read(1):
        ttype = r.read(2)
        if ttype in seen:
            raise ValueError("vp8l: duplicate transform")
        seen.add(ttype)
        if ttype == 0:  # PREDICTOR
            bits = r.read(3) + 2
            mw = _div_round_up(xsize, 1 << bits)
            mh = _div_round_up(h, 1 << bits)
            sub = _decode_image_data(r, mw, mh, allow_meta=False)
            transforms.append(("predictor", bits, sub))
        elif ttype == 1:  # COLOR
            bits = r.read(3) + 2
            mw = _div_round_up(xsize, 1 << bits)
            mh = _div_round_up(h, 1 << bits)
            sub = _decode_image_data(r, mw, mh, allow_meta=False)
            transforms.append(("color", bits, sub))
        elif ttype == 2:  # SUBTRACT_GREEN
            transforms.append(("subtract_green",))
        else:  # COLOR_INDEXING
            n_colors = r.read(8) + 1
            palette = _decode_image_data(r, n_colors, 1, allow_meta=False)
            # palette entries are delta-coded left-to-right
            for i in range(1, n_colors):
                palette[i] = _add_pixels(palette[i], palette[i - 1])
            if n_colors <= 2:
                pack_bits = 3  # 8 pixels/byte
            elif n_colors <= 4:
                pack_bits = 2
            elif n_colors <= 16:
                pack_bits = 1
            else:
                pack_bits = 0
            transforms.append(("palette", palette, pack_bits))
            xsize = _div_round_up(xsize, 1 << pack_bits)

    px = _decode_image_data(r, xsize, h, allow_meta=True)

    for tf in reversed(transforms):
        if tf[0] == "predictor":
            _inv_predictor(px, xsize, h, tf[1], tf[2])
        elif tf[0] == "color":
            _inv_color_transform(px, xsize, h, tf[1], tf[2])
        elif tf[0] == "subtract_green":
            _inv_subtract_green(px)
        else:  # palette: unpack sub-byte pixels, then map indices
            palette, pack_bits = tf[1], tf[2]
            if pack_bits:
                per = 1 << pack_bits  # pixels packed per green byte
                ibits = 8 >> pack_bits
                mask = (1 << ibits) - 1
                wide: list[int] = []
                for y in range(h):
                    row: list[int] = []
                    for x in range(xsize):
                        g = (px[y * xsize + x] >> 8) & 0xFF
                        for k in range(per):
                            row.append((g >> (k * ibits)) & mask)
                    wide.extend(row[:w])
                idx = wide
            else:
                idx = [(p >> 8) & 0xFF for p in px]
            out = []
            for i in idx:
                if i >= len(palette):
                    out.append(0)  # spec: out-of-range index → black
                else:
                    out.append(palette[i])
            px = out
            xsize = w
    if len(px) != w * h:
        raise ValueError("vp8l: decoded size mismatch")
    return w, h, px


def decode_webp_lossless(data: bytes) -> tuple[int, int, list[int]]:
    """RIFF/WEBP container → VP8L decode (lossy VP8 refuses loudly)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP container")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            return decode_vp8l(body)
        if fourcc == b"VP8 ":
            raise NotImplementedError(
                "webp: LOSSY VP8 decode is out of the stdlib profile "
                "(only lossless VP8L is implemented)"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("webp: no VP8L chunk")


# -------------------------------------------------------------- encode
class _BitsW:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, v: int, n: int) -> None:
        self._acc |= (v & ((1 << n) - 1)) << self._n
        self._n += n
        while self._n >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix CODES are traversed MSB-first by the decoder while the
        stream packs bits LSB-first — emit the code bit-reversed."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def flush(self) -> None:
        if self._n:
            self.out.append(self._acc & 0xFF)
            self._acc = 0
            self._n = 0


def _write_flat8_code(w: _BitsW, _alphabet_size: int) -> None:
    """Normal prefix code: symbols 0..255 all length 8 (complete),
    symbols ≥256 absent — written via the code-length code."""
    w.write(0, 1)  # not simple
    # code-length code: we need symbol '8' with some length; give
    # lengths: cl[8]=1 → single-entry code-length code? A single-symbol
    # prefix code decodes with ZERO bits, so 256 reads of '8' cost 0
    # bits. num_code_lengths must cover index of 8 in the order table.
    order_idx = CODE_LENGTH_ORDER.index(8)  # = 13
    w.write(order_idx + 1 - 4, 4)  # num_code_lengths = 14
    for i in range(order_idx + 1):
        w.write(1 if CODE_LENGTH_ORDER[i] == 8 else 0, 3)
    # use max_symbol so exactly 256 symbols are coded
    w.write(1, 1)
    # length_nbits = 2 + 2*k; need to express 256-2=254 → k=3 → 8 bits
    w.write(3, 3)
    w.write(254, 8)
    # the 256 length-8 entries then cost zero bits (single-symbol CL code)


def _write_single_symbol_code(w: _BitsW, sym: int) -> None:
    w.write(1, 1)  # simple
    w.write(0, 1)  # one symbol
    if sym < 2:
        w.write(0, 1)  # 1-bit symbol
        w.write(sym, 1)
    else:
        w.write(1, 1)
        w.write(sym, 8)


def encode_vp8l(width: int, height: int, pixels: list[int]) -> bytes:
    """Subset VP8L encoder: literal-only, flat 8-bit channel codes.

    ~1 byte/channel/pixel plus headers — no compression, but spec-valid
    and LOSSLESS; the decoder (this module's or any conformant one)
    reproduces the ARGB input bit-exactly.
    """
    if len(pixels) != width * height:
        raise ValueError("pixel count != width*height")
    if not (1 <= width <= 16384 and 1 <= height <= 16384):
        raise ValueError("vp8l dims out of range")
    w = _BitsW()
    w.write(0x2F, 8)
    w.write(width - 1, 14)
    w.write(height - 1, 14)
    w.write(1, 1)  # alpha hint
    w.write(0, 3)  # version
    w.write(0, 1)  # no transforms
    w.write(0, 1)  # no color cache (cache-info precedes the meta bit)
    w.write(0, 1)  # no huffman (meta) image
    _write_flat8_code(w, 256 + 24)  # green (length symbols absent)
    _write_flat8_code(w, 256)       # red
    _write_flat8_code(w, 256)       # blue
    _write_flat8_code(w, 256)       # alpha
    _write_single_symbol_code(w, 0)  # distance (never used)
    # flat 8-bit canonical code: symbol i ↔ code i, written MSB-first
    for p in pixels:
        w.write_code((p >> 8) & 0xFF, 8)   # green
        w.write_code((p >> 16) & 0xFF, 8)  # red
        w.write_code(p & 0xFF, 8)          # blue
        w.write_code((p >> 24) & 0xFF, 8)  # alpha
    w.flush()
    return bytes(w.out)


def encode_webp_lossless(
    width: int, height: int, pixels: list[int]
) -> bytes:
    """RIFF/WEBP container around :func:`encode_vp8l`."""
    body = encode_vp8l(width, height, pixels)
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
