"""Baseline TIFF codec, stdlib-only — from the public TIFF 6.0
specification (Adobe, 1992).

Scope — the scanned-document / export profile that dominates real
corpora:

* **decode**: both byte orders (II/MM), IFD walk (all 12-byte entry
  types needed for the baseline tags), 8-bit grayscale and RGB,
  strip-based layout (StripOffsets / StripByteCounts / RowsPerStrip),
  compressions 1 (none), 5 (TIFF-LZW: MSB-first codes WITH the
  early-change rule — deliberately different from GIF's LSB-first
  LZW) and 32773 (PackBits RLE), multi-IFD (multi-page) files.
* **encode**: single-page 8-bit gray/RGB, uncompressed or PackBits,
  little-endian — spec-valid files any reader opens; lossless, so the
  synthesized-formula oracle contract holds.

Out of profile, refused loudly: tiled layout, 16-bit samples,
palette/CMYK photometrics, JPEG-in-TIFF, predictors.
"""

from __future__ import annotations

import struct

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


# ---------------------------------------------------------- compressions
def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:  # literal run of n+1
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:  # repeat next byte 257-n times
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("tiff: PackBits strip short")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            # literal stretch until the next ≥2 run (max 128)
            j = i + 1
            while (
                j < n
                and j - i < 128
                and not (j + 1 < n and data[j + 1] == data[j])
            ):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out)


def _tiff_lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF-LZW (spec §13): MSB-first code packing, clear=256, EOI=257,
    and the EARLY-CHANGE rule — code width grows one code earlier than
    GIF's LZW."""
    out = bytearray()
    pos = 0
    nbits = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > nbits:
            raise ValueError("tiff: LZW stream truncated")
        v = 0
        for i in range(width):
            v = (v << 1) | ((data[(pos + i) >> 3] >> (7 - ((pos + i) & 7))) & 1)
        pos += width
        return v

    CLEAR, EOI = 256, 257
    width = 9
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    while len(out) < expected:
        code = read(width)
        if code == CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("tiff: invalid LZW code")
        out += entry
        prev = entry
        # early change: grow width when ONE entry before the boundary
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
    return bytes(out[:expected])


# -------------------------------------------------------------- decode
def _read_ifd(data: bytes, off: int, fmt: str) -> tuple[dict, int]:
    (n,) = struct.unpack_from(fmt + "H", data, off)
    tags: dict[int, list] = {}
    for i in range(n):
        base = off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(fmt + "HHI", data, base)
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(fmt + "I", data, base + 8)
        if typ in (3,):  # SHORT
            vals = list(struct.unpack_from(f"{fmt}{count}H", data, voff))
        elif typ in (4,):  # LONG
            vals = list(struct.unpack_from(f"{fmt}{count}I", data, voff))
        elif typ in (1, 2, 6, 7):  # BYTE-ish
            vals = list(data[voff : voff + count])
        elif typ == 5:  # RATIONAL
            raw = struct.unpack_from(f"{fmt}{2 * count}I", data, voff)
            vals = [raw[2 * i] / (raw[2 * i + 1] or 1) for i in range(count)]
        else:
            vals = []
        tags[tag] = vals
    (nxt,) = struct.unpack_from(fmt + "I", data, off + 2 + 12 * n)
    return tags, nxt


def decode_tiff(data: bytes):
    """TIFF → (width, height, channels, pixel bytes) of the FIRST page,
    plus the page count. Returns (w, h, ch, pixels, n_pages)."""
    if data[:4] == b"II*\x00":
        fmt = "<"
    elif data[:4] == b"MM\x00*":
        fmt = ">"
    else:
        raise ValueError("tiff: bad magic")
    (off,) = struct.unpack_from(fmt + "I", data, 4)
    first = None
    n_pages = 0
    while off:
        tags, off = _read_ifd(data, off, fmt)
        n_pages += 1
        if first is None:
            first = tags
    if first is None:
        raise ValueError("tiff: no IFD")
    tags = first
    w = tags[256][0]
    h = tags[257][0]
    spp = tags.get(277, [1])[0]
    bps = tags.get(258, [8])
    if any(b != 8 for b in bps):
        raise NotImplementedError("tiff: only 8-bit samples supported")
    if spp not in (1, 3):
        raise NotImplementedError("tiff: only gray/RGB supported")
    if 322 in tags or 323 in tags:
        raise NotImplementedError("tiff: tiled layout unsupported")
    comp = tags.get(259, [1])[0]
    photometric = tags.get(262, [1])[0]
    if photometric not in (0, 1, 2):
        raise NotImplementedError(f"tiff: photometric {photometric}")
    offsets = tags[273]
    counts = tags[279]
    rows_per_strip = tags.get(278, [h])[0]
    row_bytes = w * spp
    out = bytearray()
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        strip_rows = min(rows_per_strip, h - si * rows_per_strip)
        expected = strip_rows * row_bytes
        raw = data[so : so + sc]
        if comp == 1:
            strip = raw[:expected]
            if len(strip) < expected:
                raise ValueError("tiff: strip short")
        elif comp == 5:
            strip = _tiff_lzw_decode(raw, expected)
        elif comp == 32773:
            strip = _packbits_decode(raw, expected)
        else:
            raise NotImplementedError(f"tiff: compression {comp}")
        out += strip
    px = bytes(out[: h * row_bytes])
    if photometric == 0:  # WhiteIsZero: invert to the usual convention
        px = bytes(255 - b for b in px)
    return w, h, spp, px, n_pages


# -------------------------------------------------------------- encode
def encode_tiff(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    compression: str = "packbits",
) -> bytes:
    """Single-page little-endian TIFF; ``compression`` = 'none' or
    'packbits'. Lossless."""
    if channels not in (1, 3):
        raise ValueError("encode_tiff: channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer does not match dimensions")
    if compression == "none":
        comp_id, strip = 1, pixels
    elif compression == "packbits":
        comp_id, strip = 32773, _packbits_encode(pixels)
    else:
        raise ValueError("compression must be 'none' or 'packbits'")

    # layout: header(8) + strip + IFD
    strip_off = 8
    ifd_off = strip_off + len(strip)
    if ifd_off % 2:  # IFDs must be word-aligned
        strip = strip + b"\x00"
        ifd_off += 1
    entries = [
        (256, 3, 1, width),
        (257, 3, 1, height),
        (258, 3, channels, None),  # bits per sample (maybe offset)
        (259, 3, 1, comp_id),
        (262, 3, 1, 1 if channels == 1 else 2),
        (273, 4, 1, strip_off),
        (277, 3, 1, channels),
        (278, 3, 1, height),
        (279, 4, 1, len(strip)),
    ]
    n = len(entries)
    extra_off = ifd_off + 2 + 12 * n + 4
    extra = bytearray()
    ifd = bytearray(struct.pack("<H", n))
    for tag, typ, count, val in entries:
        if tag == 258:
            if channels == 1:
                ifd += struct.pack("<HHIHH", tag, typ, 1, 8, 0)
            else:
                ifd += struct.pack("<HHII", tag, typ, 3, extra_off + len(extra))
                extra += struct.pack("<3H", 8, 8, 8) + b"\x00\x00"
        elif typ == 3:
            ifd += struct.pack("<HHIHH", tag, typ, count, val, 0)
        else:
            ifd += struct.pack("<HHII", tag, typ, count, val)
    ifd += struct.pack("<I", 0)  # no next IFD
    return (
        b"II*\x00" + struct.pack("<I", ifd_off) + strip
        + bytes(ifd) + bytes(extra)
    )
