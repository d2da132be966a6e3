"""G.711 codec pins (functions/g711.py).

The strongest check is external: CPython 3.11 still ships ``audioop``
(the C implementation of the same Sun/CCITT reference tables), so both
laws are pinned byte-equal over the ENTIRE 16-bit input range and all
256 code bytes. Guarded: when audioop is gone (3.13+), those pins skip
and the structural tests still run.
"""

import struct

import pytest

from pg_logical_replication_spark.functions.g711 import (
    alaw2linear,
    decode_wav_g711,
    encode_wav_g711,
    linear2alaw,
    linear2ulaw,
    ulaw2linear,
)

try:  # deprecated, removed in 3.13 — external cross-check only
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop
except ImportError:  # pragma: no cover
    audioop = None


@pytest.mark.skipif(audioop is None, reason="audioop removed")
def test_encode_matches_audioop_over_full_range():
    for s in range(-32768, 32768):
        b = struct.pack("<h", s)
        assert linear2ulaw(s) == audioop.lin2ulaw(b, 2)[0], s
        assert linear2alaw(s) == audioop.lin2alaw(b, 2)[0], s


@pytest.mark.skipif(audioop is None, reason="audioop removed")
def test_decode_matches_audioop_all_bytes():
    for u in range(256):
        assert ulaw2linear(u) == struct.unpack(
            "<h", audioop.ulaw2lin(bytes([u]), 2)
        )[0]
        assert alaw2linear(u) == struct.unpack(
            "<h", audioop.alaw2lin(bytes([u]), 2)
        )[0]


def test_codebook_idempotence_and_monotone():
    """decode∘encode is idempotent on codebook values, and encode is
    monotone in magnitude (larger |s| never decodes smaller)."""
    for law_enc, law_dec in ((linear2ulaw, ulaw2linear),
                             (linear2alaw, alaw2linear)):
        prev = None
        for s in range(0, 32768, 7):
            y = law_dec(law_enc(s))
            assert law_dec(law_enc(y)) == y
            if prev is not None:
                assert y >= prev
            prev = y


def test_wav_container_roundtrip_both_laws():
    samples = [((11 * i * 89) % 2001) - 1000 for i in range(300)]
    for law in ("ulaw", "alaw"):
        wav = encode_wav_g711(samples, 8000, law)
        dec, rate, l2 = decode_wav_g711(wav)
        assert (rate, l2, len(dec)) == (8000, law, 300)
        # quantization error bounded by the segment step
        assert all(abs(a - b) <= 128 for a, b in zip(samples, dec))


def test_container_rejects_non_g711():
    import io
    import wave

    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(1)
    w.setsampwidth(2)
    w.setframerate(8000)
    w.writeframes(struct.pack("<4h", 1, 2, 3, 4))
    w.close()
    with pytest.raises(ValueError, match="not G.711"):
        decode_wav_g711(buf.getvalue())
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_g711(b"\x00" * 64)


def test_container_fuzz_never_crashes():
    """Random bytes either raise ValueError/struct.error or decode to a
    sane sample list — never crash the worker another way (the DLQ
    contract every codec in this repo honors)."""
    import random
    import struct as _struct

    rng = random.Random(99)
    ok = 0
    for trial in range(300):
        n = rng.randint(0, 120)
        buf = bytes(rng.randrange(256) for _ in range(n))
        if rng.random() < 0.3:  # bias toward plausible RIFF headers
            buf = b"RIFF" + buf
        if rng.random() < 0.2:
            buf = b"RIFF" + _struct.pack("<I", n) + b"WAVE" + buf
        try:
            samples, rate, law = decode_wav_g711(buf)
            ok += 1
            assert law in ("ulaw", "alaw")
            assert all(-32768 <= s <= 32767 for s in samples)
        except (ValueError, _struct.error):
            pass
    # overwhelmingly rejects; decoding garbage silently is its own bug
    assert ok <= 3
