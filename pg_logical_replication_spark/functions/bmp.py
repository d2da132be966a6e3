"""REAL BMP codec, stdlib-only (struct): the Windows DIB bitmap — the
legacy raster format scanned-document and screenshot corpora still
carry in bulk.

Profile: BITMAPFILEHEADER + BITMAPINFOHEADER (40-byte v3), bottom-up
row order, 4-byte row padding; 24-bit BGR truecolor and 8-bit paletted,
uncompressed (BI_RGB) or RLE8-compressed 8-bit (BI_RLE8: run / literal
/ end-of-line / end-of-bitmap opcodes). Top-down images (negative
height) decode too. Like the other codecs here (functions/png.py,
tiff.py), this backs the multimodal binary-column pipeline; the
reference repo has no raster surface.
"""

from __future__ import annotations

import struct

_BI_RGB = 0
_BI_RLE8 = 1


def encode_bmp(
    width: int,
    height: int,
    pixels: list[int],
    bits: int = 8,
    rle: bool = False,
) -> bytes:
    """Greyscale pixels (row-major, top-down, values 0..255) → BMP.

    ``bits=8`` writes a paletted image with the identity grey palette
    (optionally RLE8-compressed); ``bits=24`` writes BGR truecolor with
    r=g=b=value. Rows are stored bottom-up with 4-byte padding, per the
    format.
    """
    if len(pixels) != width * height:
        raise ValueError("pixel count != width*height")
    if bits not in (8, 24):
        raise ValueError("profile: 8 or 24 bpp")
    if rle and bits != 8:
        raise ValueError("RLE8 requires 8 bpp")
    rows = [
        pixels[y * width : (y + 1) * width] for y in range(height)
    ][::-1]  # bottom-up
    palette = b"" if bits == 24 else b"".join(
        struct.pack("<BBBB", v, v, v, 0) for v in range(256)
    )
    if rle:
        body = bytearray()
        for yi, row in enumerate(rows):
            x = 0
            while x < len(row):
                run = 1
                while (
                    x + run < len(row)
                    and row[x + run] == row[x]
                    and run < 255
                ):
                    run += 1
                body += bytes((run, row[x]))
                x += run
            body += b"\x00\x00"  # end of line
        body[-2:] = b"\x00\x01"  # last EOL becomes end of bitmap
        data = bytes(body)
        compression = _BI_RLE8
    else:
        rowbytes = width * (bits // 8)
        pad = (-rowbytes) % 4
        out = bytearray()
        for row in rows:
            if bits == 8:
                out += bytes(row)
            else:
                out += b"".join(bytes((v, v, v)) for v in row)
            out += b"\x00" * pad
        data = bytes(out)
        compression = _BI_RGB
    off = 14 + 40 + len(palette)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, bits, compression,
        len(data), 2835, 2835, 256 if bits == 8 else 0, 0,
    )
    head = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    return head + info + palette + data


def decode_bmp(data: bytes) -> tuple[int, int, list[int]]:
    """BMP bytes → (width, height, top-down row-major grey pixels).

    Accepts the encode profile plus top-down (negative height) input;
    24-bit pixels reduce to their blue channel (the encoder writes
    r=g=b). Truncated or out-of-profile streams raise ValueError.
    """
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    off = struct.unpack("<I", data[10:14])[0]
    hdr_size, w, h, planes, bits, comp = struct.unpack(
        "<IiiHHI", data[14:34]
    )
    if hdr_size < 40 or planes != 1:
        raise ValueError("profile: BITMAPINFOHEADER v3+")
    top_down = h < 0
    h = abs(h)
    if bits not in (8, 24) or comp not in (_BI_RGB, _BI_RLE8):
        raise ValueError(f"profile: bits={bits} compression={comp}")
    if comp == _BI_RLE8 and bits != 8:
        raise ValueError("RLE8 requires 8 bpp")
    if w <= 0 or h <= 0 or w * h > 1 << 26:
        raise ValueError("bad dimensions")
    raw = data[off:]
    rows: list[list[int]]
    if comp == _BI_RLE8:
        rows = [[0] * w for _ in range(h)]
        y, x, pos = 0, 0, 0
        while pos + 1 < len(raw):
            n, v = raw[pos], raw[pos + 1]
            pos += 2
            if n:  # encoded run
                if y >= h or x + n > w:
                    raise ValueError("RLE run overflows row")
                rows[y][x : x + n] = [v] * n
                x += n
            elif v == 0:  # end of line
                y, x = y + 1, 0
            elif v == 1:  # end of bitmap
                break
            elif v == 2:  # delta — not in profile
                raise ValueError("RLE delta not supported")
            else:  # absolute literal mode
                if y >= h or x + v > w or pos + v > len(raw):
                    raise ValueError("RLE literal overflows")
                rows[y][x : x + v] = list(raw[pos : pos + v])
                pos += v + (v & 1)  # word-aligned
                x += v
        else:
            raise ValueError("RLE stream missing end-of-bitmap")
    else:
        rowbytes = w * (bits // 8)
        pad = (-rowbytes) % 4
        need = (rowbytes + pad) * h
        if len(raw) < need:
            raise ValueError("truncated pixel data")
        rows = []
        for y in range(h):
            base = y * (rowbytes + pad)
            r = raw[base : base + rowbytes]
            if bits == 8:
                rows.append(list(r))
            else:
                rows.append(list(r[0::3]))  # blue channel
    if not top_down:
        rows = rows[::-1]
    return w, h, [v for row in rows for v in row]
