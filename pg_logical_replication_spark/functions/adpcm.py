"""REAL IMA ADPCM codec (WAVE format 0x11), stdlib-only.

The classic 4-bit adaptive-differential speech/audio codec: each sample
is coded as a 4-bit quantized difference against a predictor, with an
89-entry adaptive step table (IMA ADPCM reference algorithm, as carried
by the WAVE `fmt` tag 0x0011 and the DVI4 RTP payload). 4:1 compression
vs 16-bit PCM; pervasive in telephony corpora, games, and old datasets.

Container: a real RIFF/WAVE file — `fmt ` chunk with wFormatTag=0x0011,
wBitsPerSample=4, the 2-byte extension carrying wSamplesPerBlock, a
`fact` chunk with the true sample count, and block-aligned `data`.
Each block opens with a 4-byte header (initial predictor int16, initial
step index uint8, reserved byte) followed by packed nibbles (low nibble
first). The block header stores the block's first sample VERBATIM —
that structural exactness is what the SQL oracle pins; the remaining
samples are lossy (quantized differences) and carry a bounded-error
contract instead.

Reference semantics: the public IMA ADPCM reference algorithm
(IMA Digital Audio Focus Group, 1992) / the WAVE spec's DVI/IMA
section. The reference repo has no audio surface; this backs the
multimodal pipeline's audio columns like functions/flac.py does.
"""

from __future__ import annotations

import struct

STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
]

INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8]


def _clamp16(v: int) -> int:
    return -32768 if v < -32768 else (32767 if v > 32767 else v)


def _clamp_idx(i: int) -> int:
    return 0 if i < 0 else (88 if i > 88 else i)


def _encode_nibble(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """Quantize one sample against (pred, index); returns
    (nibble, new_pred, new_index) — decoder-mirrored reconstruction."""
    step = STEP_TABLE[index]
    diff = sample - pred
    nib = 0
    if diff < 0:
        nib = 8
        diff = -diff
    # successive-approximation against step, step/2, step/4
    delta = step >> 3
    if diff >= step:
        nib |= 4
        diff -= step
        delta += step
    if diff >= step >> 1:
        nib |= 2
        diff -= step >> 1
        delta += step >> 1
    if diff >= step >> 2:
        nib |= 1
        delta += step >> 2
    pred = _clamp16(pred - delta if nib & 8 else pred + delta)
    index = _clamp_idx(index + INDEX_TABLE[nib & 7])
    return nib, pred, index


def _decode_nibble(nib: int, pred: int, index: int) -> tuple[int, int]:
    step = STEP_TABLE[index]
    delta = step >> 3
    if nib & 4:
        delta += step
    if nib & 2:
        delta += step >> 1
    if nib & 1:
        delta += step >> 2
    pred = _clamp16(pred - delta if nib & 8 else pred + delta)
    return pred, _clamp_idx(index + INDEX_TABLE[nib & 7])


def encode_wav_adpcm(
    samples: list[int], sample_rate: int, block_align: int = 68
) -> bytes:
    """16-bit mono PCM → RIFF/WAVE with IMA ADPCM (fmt 0x0011) data.

    ``block_align`` bytes per block → ``(block_align - 4) * 2 + 1``
    samples per block (header sample + packed nibbles). The final
    block is zero-nibble padded to ``block_align``; the ``fact`` chunk
    records the true sample count for the decoder to truncate to.
    """
    if not samples:
        raise ValueError("empty signal")
    spb = (block_align - 4) * 2 + 1
    index = 0
    blocks = []
    for start in range(0, len(samples), spb):
        chunk = samples[start : start + spb]
        pred = _clamp16(int(chunk[0]))
        head = struct.pack("<hBB", pred, index, 0)
        nibs = []
        for s in chunk[1:]:
            nib, pred, index = _encode_nibble(int(s), pred, index)
            nibs.append(nib)
        nibs += [0] * ((spb - 1) - len(nibs))  # pad partial final block
        body = bytes(
            (nibs[i] & 0xF) | ((nibs[i + 1] & 0xF) << 4)
            for i in range(0, len(nibs), 2)
        )
        blocks.append(head + body)
    data = b"".join(blocks)
    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x0011, 1, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    fact = struct.pack("<I", len(samples))
    out = b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"fact" + struct.pack("<I", len(fact)) + fact
    out += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(out)) + out


def decode_wav_adpcm(data: bytes) -> tuple[int, list[int], int]:
    """RIFF/WAVE IMA-ADPCM bytes → (sample_rate, samples, n_blocks).

    Validates the RIFF walk, requires wFormatTag 0x0011 mono, and
    truncates to the ``fact`` sample count (the padded tail nibbles of
    the final block are not samples).
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, 8 + struct.unpack("<I", data[4:8])[0]
    fmt = fact_n = raw = None
    while pos + 8 <= end:
        cid, clen = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise ValueError(f"torn {cid!r} chunk: {len(body)} < {clen}")
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHHHH", body[:20])
        elif cid == b"fact":
            fact_n = struct.unpack("<I", body[:4])[0]
        elif cid == b"data":
            raw = body
        pos += 8 + clen + (clen & 1)
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    tag, channels, rate, _, block_align, bits, _, spb = fmt
    if tag != 0x0011 or channels != 1 or bits != 4:
        raise ValueError(f"not mono IMA ADPCM: tag={tag:#x} ch={channels} bits={bits}")
    if spb != (block_align - 4) * 2 + 1:
        raise ValueError("inconsistent samples-per-block")
    samples: list[int] = []
    n_blocks = 0
    for start in range(0, len(raw), block_align):
        block = raw[start : start + block_align]
        if len(block) < 4:
            raise ValueError("torn ADPCM block")
        pred, index, _ = struct.unpack("<hBB", block[:4])
        index = _clamp_idx(index)
        n_blocks += 1
        samples.append(pred)
        for byte in block[4:]:
            for nib in (byte & 0xF, byte >> 4):
                pred, index = _decode_nibble(nib, pred, index)
                samples.append(pred)
    if fact_n is not None:
        samples = samples[:fact_n]
    return rate, samples, n_blocks
