"""Ogg container (RFC 3533) — REAL page walk with the Ogg CRC.

Pattern of ``functions/warc.py`` / the mediainfo probes: parse actual
container bytes (here: capture pattern, lacing-value packet
reassembly, and the Ogg CRC-32 — polynomial 0x04C11DB7, UNreflected,
init/xorout 0, which is NOT zlib's crc32), identify the codec from
the first packet's magic (Vorbis ``\\x01vorbis`` / Opus ``OpusHead``)
and extract channels / sample rate / duration (last granule position
over the rate) without decoding a single audio sample — the
filter-before-decode pass for the web's default free-audio container.

The encoder exists so tests and queries can synthesize spec-valid
streams (the honest stub boundary stays at entropy decode, like
mp3/h264/vp9).
"""

from __future__ import annotations

import struct

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if _r & 0x80000000 else (
            (_r << 1) & 0xFFFFFFFF
        )
    _CRC_TABLE.append(_r)


def ogg_crc(data: bytes) -> int:
    """The Ogg page checksum: CRC-32/0x04C11DB7, no reflection,
    init 0, xorout 0 (RFC 3533 appendix A)."""
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ b]
    return crc


def encode_ogg_page(
    packets: list[bytes],
    granule: int,
    serial: int,
    page_seq: int,
    header_type: int = 0,
) -> bytes:
    """One complete Ogg page holding whole ``packets`` (each < 255*255
    bytes here; lacing values per RFC 3533 §6)."""
    lacing = bytearray()
    body = bytearray()
    for p in packets:
        n = len(p)
        while n >= 255:
            lacing.append(255)
            n -= 255
        lacing.append(n)
        body += p
    if len(lacing) > 255:
        raise ValueError("ogg: too many segments for one page")
    head = (
        b"OggS"
        + bytes([0, header_type])
        + struct.pack("<qIII", granule, serial, page_seq, 0)
        + bytes([len(lacing)])
        + bytes(lacing)
    )
    page = bytearray(head + bytes(body))
    crc = ogg_crc(bytes(page))
    page[22:26] = struct.pack("<I", crc)
    return bytes(page)


def vorbis_id_packet(channels: int, rate: int) -> bytes:
    return (
        b"\x01vorbis"
        + struct.pack("<IB I i i i", 0, channels, rate, 0, 0, 0)
        + bytes([0x66, 0x01])  # blocksizes nibble pair + framing bit
    )


def opus_head_packet(channels: int, rate: int) -> bytes:
    return b"OpusHead" + struct.pack("<BBHIhB", 1, channels, 312, rate, 0, 0)


def encode_ogg_stream(
    codec: str, channels: int, rate: int, n_data_pages: int,
    samples_per_page: int, serial: int = 1,
) -> bytes:
    """A spec-valid single-stream Ogg file: BOS page with the codec ID
    header, ``n_data_pages`` data pages (filler packet bytes — the
    honest stub boundary), EOS flag on the last, granule positions
    accumulating ``samples_per_page`` per data page."""
    ident = (
        vorbis_id_packet(channels, rate)
        if codec == "vorbis"
        else opus_head_packet(channels, rate)
    )
    pages = [encode_ogg_page([ident], 0, serial, 0, header_type=0x02)]
    for i in range(n_data_pages):
        flags = 0x04 if i == n_data_pages - 1 else 0
        payload = bytes((serial * 7 + i * 13 + j) % 256 for j in range(40))
        pages.append(
            encode_ogg_page(
                [payload], (i + 1) * samples_per_page, serial, i + 1, flags
            )
        )
    return b"".join(pages)


def probe_ogg(buf: bytes) -> dict:
    """Walk every page (capture pattern + CRC verified), reassemble the
    first packet, identify the codec, and report stream facts."""
    pos = 0
    n_pages = 0
    last_granule = 0
    first_packet = b""
    got_first = False
    while pos + 27 <= len(buf):
        if buf[pos : pos + 4] != b"OggS":
            raise ValueError("ogg: lost page sync")
        nseg = buf[pos + 26]
        lacing = buf[pos + 27 : pos + 27 + nseg]
        if len(lacing) < nseg:
            raise ValueError("ogg: truncated lacing table")
        body_len = sum(lacing)
        page_end = pos + 27 + nseg + body_len
        if page_end > len(buf):
            raise ValueError("ogg: truncated page body")
        page = bytearray(buf[pos:page_end])
        stated = struct.unpack_from("<I", page, 22)[0]
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != stated:
            raise ValueError("ogg: page CRC mismatch")
        (granule,) = struct.unpack_from("<q", buf, pos + 6)
        if granule >= 0:
            last_granule = max(last_granule, granule)
        if not got_first:
            first_packet = buf[pos + 27 + nseg : pos + 27 + nseg + lacing[0]]
            got_first = True
        n_pages += 1
        pos = page_end
    if not got_first:
        raise ValueError("ogg: no pages")
    if first_packet.startswith(b"\x01vorbis"):
        codec = "vorbis"
        channels = first_packet[11]
        (rate,) = struct.unpack_from("<I", first_packet, 12)
    elif first_packet.startswith(b"OpusHead"):
        codec = "opus"
        channels = first_packet[9]
        (rate,) = struct.unpack_from("<I", first_packet, 12)
    else:
        raise ValueError("ogg: unknown codec id header")
    return {
        "codec_name": codec,
        "channels": channels,
        "sample_rate": rate,
        "n_pages": n_pages,
        "duration_ms": (last_granule * 1000) // rate if rate else None,
    }
