"""GIF87a/89a codec, stdlib-only — from the public GIF specification
(CompuServe GIF89a spec / W3C notes).

* **decode**: logical screen descriptor, global/local color tables,
  image descriptors (incl. INTERLACED four-pass row order), graphic
  control extensions (transparency index, frame delay), full variable-
  width LZW decompression (clear/EOI codes, 4096-entry dictionary,
  deferred clear), multi-frame animations.
* **encode**: real LZW compression (dictionary build, width growth,
  clear at table overflow) of 8-bit indexed frames with a 256-entry
  color table — lossless, so synthesized index formulas survive a
  round-trip bit-exactly (the ``q_mm_gif_decode`` oracle contract).

GIF is pervasive in web scrapes; like PNG/JPEG/FLAC/VP8L this makes
the decode pass REAL while staying inside the stdlib.
"""

from __future__ import annotations

import struct


# --------------------------------------------------------------- LZW
def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytes:
    """Variable-width LZW (GIF flavor): codes packed LSB-first."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader over the concatenated sub-block bytes
    pos = 0
    nbits = len(data) * 8

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > nbits:
            raise ValueError("gif: LZW stream truncated")
        v = 0
        for i in range(width):
            v |= ((data[(pos + i) >> 3] >> ((pos + i) & 7)) & 1) << i
        pos += width
        return v

    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("gif: invalid LZW code")
        out += entry
        prev = entry
        if (
            len(table) == (1 << width)
            and width < 12
        ):
            width += 1
        if len(out) >= expected:
            # image fully decoded; a trailing EOI may follow — done
            break
    return bytes(out[:expected])


def _lzw_encode(min_code_size: int, pixels: bytes) -> bytes:
    """Real LZW compression with dictionary growth + clear handling."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    out_bits.append((clear, width))
    prev = b""
    for b in pixels:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        out_bits.append((table[prev], width))
        if next_code < 4096:
            table[cur] = next_code
            # GIF width growth: after EMITTING code next_code-1 at the
            # old width, codes up to next_code fit once width grows
            if next_code == (1 << width):
                width += 1
            next_code += 1
        else:
            out_bits.append((clear, width))
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([b])
    if prev:
        out_bits.append((table[prev], width))
    out_bits.append((eoi, width))
    # pack LSB-first
    acc = 0
    n = 0
    packed = bytearray()
    for code, w in out_bits:
        acc |= code << n
        n += w
        while n >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        packed.append(acc & 0xFF)
    return bytes(packed)


def _sub_blocks(data: bytes) -> bytes:
    """Split payload into ≤255-byte sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


# ------------------------------------------------------------- encode
def encode_gif(
    width: int,
    height: int,
    indices: bytes,
    palette: list[tuple[int, int, int]] | None = None,
    interlace: bool = False,
) -> bytes:
    """One-frame GIF89a from 8-bit palette indices (row-major).

    ``palette`` defaults to the 256-entry grayscale ramp. LZW is real
    compression; ``interlace=True`` writes rows in four-pass order.
    """
    if len(indices) != width * height:
        raise ValueError("index buffer does not match width*height")
    if palette is None:
        palette = [(i, i, i) for i in range(256)]
    if len(palette) != 256:
        raise ValueError("encoder profile: 256-entry palette")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0xF7, 0, 0])  # GCT present, 8-bit, 256 entries
    for r, g, b in palette:
        out += bytes([r, g, b])
    # image descriptor
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
    out += bytes([0x40 if interlace else 0x00])
    if interlace:
        rows = []
        for start, step in _INTERLACE_PASSES:
            rows.extend(range(start, height, step))
        data = b"".join(
            indices[r * width : (r + 1) * width] for r in rows
        )
    else:
        data = indices
    out += bytes([8])  # LZW min code size
    out += _sub_blocks(_lzw_encode(8, data))
    out += b"\x3b"
    return bytes(out)


# ------------------------------------------------------------- decode
def decode_gif(data: bytes):
    """GIF → (width, height, frames) with frames =
    [{'indices': bytes, 'palette': [(r,g,b)...], 'transparent': idx|None,
    'delay_ms': int, 'left': int, 'top': int, 'width': w, 'height': h}].

    The logical-screen dims come from the header; each frame carries
    its own sub-rectangle and effective color table.
    """
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("gif: bad signature")
    sw, sh = struct.unpack_from("<HH", data, 6)
    flags = data[10]
    pos = 13
    gct: list[tuple[int, int, int]] | None = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = [
            (data[pos + 3 * i], data[pos + 3 * i + 1], data[pos + 3 * i + 2])
            for i in range(n)
        ]
        pos += 3 * n
    frames = []
    transparent = None
    delay_ms = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                sz = data[pos]
                gflags = data[pos + 1]
                (delay_cs,) = struct.unpack_from("<H", data, pos + 2)
                delay_ms = delay_cs * 10
                transparent = data[pos + 4] if gflags & 1 else None
                pos += 1 + sz
            else:  # skip any other extension's sub-blocks
                pass
            while True:
                sz = data[pos]
                pos += 1
                if sz == 0:
                    break
                pos += sz
        elif block == 0x2C:  # image descriptor
            left, top, w, h = struct.unpack_from("<HHHH", data, pos)
            iflags = data[pos + 8]
            pos += 9
            lct = None
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                lct = [
                    (
                        data[pos + 3 * i],
                        data[pos + 3 * i + 1],
                        data[pos + 3 * i + 2],
                    )
                    for i in range(n)
                ]
                pos += 3 * n
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while True:
                sz = data[pos]
                pos += 1
                if sz == 0:
                    break
                lzw += data[pos : pos + sz]
                pos += sz
            raw = _lzw_decode(min_code, bytes(lzw), w * h)
            if iflags & 0x40:  # interlaced: undo four-pass row order
                rows = []
                for start, step in _INTERLACE_PASSES:
                    rows.extend(range(start, h, step))
                fixed = bytearray(w * h)
                for src, dst in enumerate(rows):
                    fixed[dst * w : (dst + 1) * w] = raw[
                        src * w : (src + 1) * w
                    ]
                raw = bytes(fixed)
            pal = lct or gct
            if pal is None:
                raise ValueError("gif: no color table for frame")
            frames.append(
                {
                    "indices": raw,
                    "palette": pal,
                    "transparent": transparent,
                    "delay_ms": delay_ms,
                    "left": left,
                    "top": top,
                    "width": w,
                    "height": h,
                }
            )
            transparent = None
            delay_ms = 0
        else:
            raise ValueError(f"gif: unknown block 0x{block:02x}")
    if not frames:
        raise ValueError("gif: no image data")
    return sw, sh, frames
