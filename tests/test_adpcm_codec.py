"""IMA-ADPCM codec (functions/adpcm.py) — WAVE fmt 0x0011.

Structural exactness (block-header anchors, counts, fact truncation),
bounded lossy error on smooth signals, loud rejection of corrupt or
out-of-profile containers, and determinism fuzz.
"""

import math
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pg_logical_replication_spark.functions.adpcm import (
    STEP_TABLE,
    decode_wav_adpcm,
    encode_wav_adpcm,
)

SPB = (68 - 4) * 2 + 1  # 129 samples / 68-byte block


def synth(did, n):
    return [((did * 41 + i * 97) % 2001) - 1000 for i in range(n)]


def test_step_table_shape():
    assert len(STEP_TABLE) == 89
    assert STEP_TABLE[0] == 7 and STEP_TABLE[-1] == 32767
    assert STEP_TABLE == sorted(STEP_TABLE)


def test_block_header_anchors_are_exact():
    sig = synth(123, 300)  # 3 blocks
    rate, dec, nb = decode_wav_adpcm(encode_wav_adpcm(sig, 8000))
    assert (rate, len(dec), nb) == (8000, 300, 3)
    for b in range(nb):
        assert dec[b * SPB] == sig[b * SPB]


def test_fact_chunk_truncates_padded_tail():
    sig = synth(7, 130)  # 1 full block + 1 sample
    _, dec, nb = decode_wav_adpcm(encode_wav_adpcm(sig, 16000))
    assert len(dec) == 130 and nb == 2


def test_smooth_signal_small_error():
    sig = [int(1000 * math.sin(i / 30)) for i in range(500)]
    _, dec, _ = decode_wav_adpcm(encode_wav_adpcm(sig, 8000))
    assert max(abs(a - b) for a, b in zip(sig, dec)) <= 64


def test_synth_family_error_contract():
    for did in (0, 1, 99, 4567, 99999):
        sig = synth(did, 64 + did % 200)
        _, dec, _ = decode_wav_adpcm(encode_wav_adpcm(sig, 8000))
        errs = [abs(a - b) for a, b in zip(sig, dec)]
        assert max(errs) <= 4095 and sum(errs) <= 512 * len(sig)


def test_rejects_corruption_and_profile():
    enc = bytearray(encode_wav_adpcm(synth(1, 100), 8000))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_adpcm(b"JUNK" + bytes(enc[4:]))
    pcm = bytearray(enc)
    fmt_at = bytes(enc).index(b"fmt ") + 8
    pcm[fmt_at : fmt_at + 2] = struct.pack("<H", 1)  # wFormatTag=PCM
    with pytest.raises(ValueError, match="not mono IMA ADPCM"):
        decode_wav_adpcm(bytes(pcm))
    with pytest.raises(ValueError):
        decode_wav_adpcm(bytes(enc[: len(enc) // 2]))  # torn data
    with pytest.raises(ValueError, match="empty"):
        encode_wav_adpcm([], 8000)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
    st.sampled_from([8000, 16000, 44100]),
)
def test_fuzz_roundtrip_structure(sig, rate):
    enc = encode_wav_adpcm(sig, rate)
    assert enc == encode_wav_adpcm(sig, rate)  # deterministic
    r, dec, nb = decode_wav_adpcm(enc)
    assert r == rate and len(dec) == len(sig)
    assert nb == (len(sig) + SPB - 1) // SPB
    assert dec[0] == sig[0]
    assert all(-32768 <= s <= 32767 for s in dec)
