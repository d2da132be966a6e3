"""Pure-stdlib PNG codec (zlib + struct) — the one REAL media codec.

Implements the public W3C PNG specification (ISO/IEC 15948): 8-bit
greyscale / RGB / RGBA, all five scanline filter types (None, Sub, Up,
Average, Paeth), CRC-checked chunks, non-interlaced. No external media
library — ``zlib`` handles DEFLATE and CRC32, ``struct`` the chunk
framing — so the multimodal pipeline's image path runs a genuine
byte→pixels decode on executors instead of the declared fake
(operators/multimodal.py REAL_CODECS stub, review r2 #8).

Deliberately NOT implemented (raise, never silently misdecode):
interlace (Adam7), bit depths other than 8, palette images, ancillary
colour-management chunks (they are skipped, as the spec allows).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: color type → samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 6: 4}
_COLOR_TYPE = {1: 0, 3: 2, 4: 6}


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _filter_line(ft: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    """Apply scanline filter ``ft`` (encoder side, spec §9)."""
    out = bytearray(len(line))
    for i, x in enumerate(line):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 0:
            v = x
        elif ft == 1:
            v = x - a
        elif ft == 2:
            v = x - b
        elif ft == 3:
            v = x - (a + b) // 2
        elif ft == 4:
            v = x - _paeth(a, b, c)
        else:
            raise ValueError(f"png: bad filter type {ft}")
        out[i] = v & 0xFF
    return bytes(out)


def _unfilter_line(ft: int, line: bytearray, prev: bytes, bpp: int) -> None:
    """Reverse scanline filter in place (decoder side, spec §9)."""
    if ft == 0:
        return
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ft == 1:
            line[i] = (line[i] + a) & 0xFF
        elif ft == 2:
            line[i] = (line[i] + b) & 0xFF
        elif ft == 3:
            line[i] = (line[i] + (a + b) // 2) & 0xFF
        elif ft == 4:
            line[i] = (line[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"png: bad filter type {ft}")


def encode_png(
    width: int, height: int, pixels: bytes, channels: int = 1
) -> bytes:
    """8-bit pixels (row-major, ``width*height*channels`` bytes) → PNG.

    Scanline filters cycle 0-4 by row so every filter type is exercised
    in a round-trip — the encoder is also the decoder's adversarial
    fixture generator.
    """
    if channels not in _COLOR_TYPE:
        raise ValueError(f"png: channels must be 1, 3 or 4, got {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"png: expected {stride * height} pixel bytes, got {len(pixels)}"
        )
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _COLOR_TYPE[channels], 0, 0, 0
    )
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        line = pixels[r * stride : (r + 1) * stride]
        ft = r % 5
        raw.append(ft)
        raw += _filter_line(ft, line, prev, channels)
        prev = line
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """PNG bytes → (width, height, channels, row-major 8-bit pixels).

    CRC-checks every chunk, concatenates multiple IDATs, reverses all
    five filter types. Raises ValueError on corrupt input and
    NotImplementedError on spec features outside the supported profile
    (interlace, depth ≠ 8, palette).
    """
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("png: bad signature")
    pos = 8
    width = height = channels = None
    idat = bytearray()
    seen_end = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("png: truncated chunk header")
        (length,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("png: truncated chunk body")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != zlib.crc32(typ + body) & 0xFFFFFFFF:
            raise ValueError(f"png: CRC mismatch in {typ!r}")
        pos += 12 + length
        if typ == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"png: bit depth {depth} unsupported")
            if color not in _CHANNELS:
                raise NotImplementedError(f"png: color type {color} unsupported")
            if interlace:
                raise NotImplementedError("png: Adam7 interlace unsupported")
            if comp or filt:
                raise ValueError("png: bad compression/filter method")
            channels = _CHANNELS[color]
        elif typ == b"IDAT":
            idat += body
        elif typ == b"IEND":
            seen_end = True
            break
        # ancillary chunks are skipped per spec
    if width is None or channels is None:
        raise ValueError("png: missing IHDR")
    if not seen_end:
        raise ValueError("png: missing IEND")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("png: decompressed size mismatch")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for r in range(height):
        ft = raw[r * (stride + 1)]
        line = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        _unfilter_line(ft, line, prev, channels)
        out[r * stride : (r + 1) * stride] = line
        prev = bytes(line)
    return width, height, channels, bytes(out)
