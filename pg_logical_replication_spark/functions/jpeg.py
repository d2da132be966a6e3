"""Baseline sequential DCT JPEG codec, stdlib + numpy only.

The dominant training-corpus image format, implemented from the PUBLIC
ITU-T T.81 spec (the JPEG standard): encoder and decoder for baseline
sequential Huffman JPEGs — SOI/APP0/DQT/SOF0/DHT/DRI/SOS/RSTn/EOI
marker structure, the Annex K example quantization + Huffman tables,
zigzag, DC prediction, run-length AC coding with ZRL/EOB, byte
stuffing, restart intervals, arbitrary h×v sampling factors on decode
(4:4:4, 4:2:2, 4:2:0, grayscale), BT.601 YCbCr.

Out of profile — refused loudly, never silently mis-decoded:
progressive (SOF2), extended sequential (SOF1), lossless, arithmetic
coding, 12-bit precision.

Sibling of ``functions/png.py`` (the codec-graduation pattern from
review r2 #8): payload bytes are REAL, executor-side, Arrow-batched via
``operators/multimodal.py``; quality=100 maps to all-ones quantization
tables (the IJG scaling formula), which makes block-constant images
bit-exact through the full pipeline — that is what lets a SQL oracle
predict decoded statistics in closed form while Spark actually runs
entropy decode + IDCT.

The DCT is the float matrix form (orthonormal DCT-II, numpy); per-block
work is vectorized, only the Huffman bit stream is Python-serial — fine
for the corpus-asset sizes this engine decodes in ``mapInPandas``
batches, and the plumbing (schema, batching, partitioning) is identical
to what a C-backed codec would use.
"""

from __future__ import annotations

import struct

import numpy as np

# -------------------------------------------------------------- tables
# Zigzag scan order (T.81 Figure 5): index i of the scan → (row, col).
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]
_UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1 / K.2 example quantization tables (luminance / chrominance).
STD_LUMA_QUANT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
STD_CHROMA_QUANT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Annex K.3 example Huffman tables: (bits[1..16], values).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Orthonormal 8-point DCT-II matrix: F = C @ X @ C.T, X = C.T @ F @ C.
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """The IJG quality scaling (public libjpeg convention): 1..100 →
    scaled Annex K tables; 100 → all-ones (distortion only from DCT
    float rounding, i.e. none for block-constant inputs)."""
    if not 1 <= quality <= 100:
        raise ValueError("jpeg quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (STD_LUMA_QUANT, STD_CHROMA_QUANT):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int32))
    return out[0], out[1]


# ---------------------------------------------------------- bit writer
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (T.81 C.2): value → (code, length)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _magnitude(v: int) -> tuple[int, int]:
    """DC/AC coefficient → (category, appended bits), T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


# -------------------------------------------------------------- encode
def _to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _encode_block(
    w: _BitWriter, block: np.ndarray, qt: np.ndarray,
    dc_tab: dict, ac_tab: dict, dc_pred: int,
) -> int:
    """FDCT + quantize + entropy-code one 8×8 block; returns new DC."""
    coeffs = _C @ (block - 128.0) @ _C.T
    zz = np.rint(coeffs / qt).astype(np.int64).flatten()[ZIGZAG]
    diff = int(zz[0]) - dc_pred
    cat, mbits = _magnitude(diff)
    code, ln = dc_tab[cat]
    w.write(code, ln)
    if cat:
        w.write(mbits, cat)
    run = 0
    emitted_to = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL: 16 zeros
            w.write(code, ln)
            run -= 16
        cat, mbits = _magnitude(v)
        code, ln = ac_tab[(run << 4) | cat]
        w.write(code, ln)
        w.write(mbits, cat)
        run = 0
        emitted_to = k
    if emitted_to < 63:
        code, ln = ac_tab[0x00]  # EOB
        w.write(code, ln)
    return int(zz[0])


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    quality: int = 75,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """Baseline JFIF encode: grayscale (1 component) or RGB
    (``subsampling='444'`` or ``'420'`` — the dominant real-world
    chroma layout, 2×2 luma blocks per MCU with box-averaged chroma).

    ``pixels`` is row-major, ``width*height*channels`` bytes. The
    entropy coder uses the Annex K example Huffman tables; quantization
    follows :func:`quant_tables`.
    """
    if channels not in (1, 3):
        raise ValueError("encode_jpeg supports channels=1 (gray) or 3 (RGB)")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match width*height*channels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    qt_l, qt_c = quant_tables(quality)
    img = np.frombuffer(pixels, dtype=np.uint8).astype(np.float64)
    img = img.reshape(height, width, channels)
    huff_l = (
        _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS),
        _huff_codes(AC_LUMA_BITS, AC_LUMA_VALS),
    )
    huff_c = (
        _huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
        _huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
    )
    if channels == 3:
        ycc = _to_ycbcr(img)
        if subsampling == "420":
            # box-average chroma over 2×2 (pad odd dims by edge first)
            ph = (height + 1) // 2 * 2
            pw = (width + 1) // 2 * 2
            cpad = np.pad(
                ycc, ((0, ph - height), (0, pw - width), (0, 0)), mode="edge"
            )
            cb = cpad[0::2, 0::2, 1:3] / 4 + cpad[0::2, 1::2, 1:3] / 4 \
                + cpad[1::2, 0::2, 1:3] / 4 + cpad[1::2, 1::2, 1:3] / 4
            comps = [
                (ycc[..., 0], qt_l, huff_l, 2, 2),
                (cb[..., 0], qt_c, huff_c, 1, 1),
                (cb[..., 1], qt_c, huff_c, 1, 1),
            ]
        else:
            comps = [
                (ycc[..., 0], qt_l, huff_l, 1, 1),
                (ycc[..., 1], qt_c, huff_c, 1, 1),
                (ycc[..., 2], qt_c, huff_c, 1, 1),
            ]
    else:
        comps = [(img[..., 0], qt_l, huff_l, 1, 1)]

    hmax = max(c[3] for c in comps)
    vmax = max(c[4] for c in comps)
    mcus_x = (width + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (height + 8 * vmax - 1) // (8 * vmax)
    # pad each plane to its own MCU-grid extent by edge replication
    # (the spec's recommended extension; avoids wrap-around ringing)
    padded = []
    for plane, qt_, hf, ch, cv in comps:
        th, tw = mcus_y * cv * 8, mcus_x * ch * 8
        padded.append((
            np.pad(
                plane,
                ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
                mode="edge",
            ),
            qt_, hf, ch, cv,
        ))

    w = _BitWriter()
    dc_pred = [0] * len(comps)
    mcu_count = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                w.flush()
                w.out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                dc_pred = [0] * len(comps)
            mcu_count += 1
            for ci, (plane, qt_, (dc_tab, ac_tab), ch, cv) in enumerate(padded):
                for v in range(cv):
                    for hh in range(ch):
                        y0 = (my * cv + v) * 8
                        x0 = (mx * ch + hh) * 8
                        dc_pred[ci] = _encode_block(
                            w,
                            plane[y0 : y0 + 8, x0 : x0 + 8],
                            qt_, dc_tab, ac_tab, dc_pred[ci],
                        )
    w.flush()

    # ---- marker stream
    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HHBB", 1, 1, 0, 0)
    )  # APP0: version 1.1, 1:1 aspect, no thumbnail
    # DQT (8-bit precision), table 0 (+1 for color)
    for tid, qt in ([(0, qt_l)] if channels == 1 else [(0, qt_l), (1, qt_c)]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid])
        out += bytes(int(qt.flatten()[z]) for z in ZIGZAG)
    # SOF0: baseline sequential
    out += b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * channels, 8, height, width, channels
    )
    for ci, (_p, _q, _h, ch, cv) in enumerate(padded):
        qtid = 0 if ci == 0 else 1
        out += bytes([ci + 1, (ch << 4) | cv, qtid if channels == 3 else 0])
    # DHT
    def dht(cls, tid, bits, vals):
        seg = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", len(seg) + 2) + seg

    out += dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if channels == 3:
        out += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * channels, channels)
    for ci in range(channels):
        tabs = 0x00 if ci == 0 else 0x11
        out += bytes([ci + 1, tabs])
    out += bytes([0, 63, 0])  # spectral selection (baseline fixed)
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# -------------------------------------------------------------- decode
class _BitReader:
    """Entropy-segment bit reader (stuffed 0xFF00 already unstuffed)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise EOFError("jpeg: entropy data exhausted")
            self._acc = self.data[self.pos]
            self.pos += 1
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _receive_extend(r: _BitReader, cat: int) -> int:
    if cat == 0:
        return 0
    v = r.bits(cat)
    if v < (1 << (cat - 1)):  # negative branch (T.81 F.2.2.1 EXTEND)
        v -= (1 << cat) - 1
    return v


class _HuffDecoder:
    def __init__(self, bits: list[int], vals: list[int]):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, r: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | r.bit()
            v = self.lut.get((length, code))
            if v is not None:
                return v
        raise ValueError("jpeg: invalid Huffman code")


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Baseline JPEG → ``(width, height, channels, pixels)``.

    Supports grayscale and 3-component YCbCr with arbitrary baseline
    sampling factors (4:4:4 / 4:2:2 / 4:2:0), restart intervals, and
    multi-table DQT/DHT segments. Non-baseline frames raise
    ``NotImplementedError`` naming the marker.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None  # (width, height, [(cid, h, v, qtid)])
    restart_interval = 0
    scan = None

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # optional fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                off += 1
                if pq:  # 16-bit table
                    vals = struct.unpack_from(f">{64}H", seg, off)
                    off += 128
                else:
                    vals = seg[off : off + 64]
                    off += 64
                t = np.zeros(64, dtype=np.int32)
                for i, z in enumerate(ZIGZAG):
                    t[z] = vals[i]
                qt[tq] = t.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = list(seg[off + 17 : off + 17 + n])
                off += 17 + n
                (huff_ac if tc else huff_dc)[th] = _HuffDecoder(bits, vals)
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w_, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError("jpeg: only 8-bit precision")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (w_, h, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: SOF{marker - 0xC0} not baseline sequential "
                "(progressive/extended/lossless/arithmetic unsupported)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan_tabs = []
            for i in range(ns):
                cs, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_tabs.append((cs, tabs >> 4, tabs & 0xF))
            # collect entropy-coded segments up to the next real marker,
            # unstuffing FF00 and splitting on RSTn
            segments: list[bytes] = []
            cur = bytearray()
            while pos < len(data):
                b = data[pos]
                if b != 0xFF:
                    cur.append(b)
                    pos += 1
                    continue
                nxt = data[pos + 1]
                if nxt == 0x00:
                    cur.append(0xFF)
                    pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    segments.append(bytes(cur))
                    cur = bytearray()
                    pos += 2
                else:
                    break  # real marker (EOI or next segment)
            segments.append(bytes(cur))
            scan = (scan_tabs, segments)
            # decode now — baseline has exactly one scan
            break
        # APPn / COM / others: skipped

    if frame is None or scan is None:
        raise ValueError("jpeg: missing SOF0/SOS")
    width, height, comps = frame
    scan_tabs, segments = scan
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (width + mcu_w - 1) // mcu_w
    mcus_y = (height + mcu_h - 1) // mcu_h

    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8))

    tab_for = {cs: (dc, ac) for cs, dc, ac in scan_tabs}
    dc_pred = {cid: 0 for cid, *_ in comps}
    seg_iter = iter(segments)
    r = _BitReader(next(seg_iter))
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r = _BitReader(next(seg_iter))  # RSTn: realign + reset
                dc_pred = {cid: 0 for cid, *_ in comps}
            mcu_count += 1
            for cid, ch, cv, tq in comps:
                dct, act = tab_for[cid]
                for v in range(cv):
                    for hh in range(ch):
                        zz = np.zeros(64, dtype=np.int64)
                        cat = huff_dc[dct].decode(r)
                        diff = _receive_extend(r, cat)
                        dc_pred[cid] += diff
                        zz[0] = dc_pred[cid]
                        k = 1
                        while k < 64:
                            rs = huff_ac[act].decode(r)
                            run, size = rs >> 4, rs & 0xF
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            zz[k] = _receive_extend(r, size)
                            k += 1
                        block = (zz[_UNZIGZAG].reshape(8, 8) * qt[tq]).astype(
                            np.float64
                        )
                        pix = _C.T @ block @ _C + 128.0
                        y0 = (my * cv + v) * 8
                        x0 = (mx * ch + hh) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = pix

    # upsample to full resolution (nearest) and crop
    full = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        if ch != hmax or cv != vmax:
            p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:height, :width])

    if len(full) == 1:
        out = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return width, height, 1, out.tobytes()
    y, cb, cr = full
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    out = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return width, height, 3, out.tobytes()
