"""Property-based codec tests (hypothesis) — the adversarial coverage
SURVEY §7 flags for the quirky formats, which the reference itself never
had (its tests are example-based against a live PG only).

Pure-Python properties run at full hypothesis example counts; the one
Spark-backed property (test_decoding quoting) batches all generated
values into a single decode job per example to keep runtime sane.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pg_logical_replication_spark.sources import decoderbufs_format as dbf
from pg_logical_replication_spark.sources import pgoutput_format as fmt

# PG text-format values: any unicode minus NUL (cstring terminator).
_pg_text = st.text(
    alphabet=st.characters(blacklist_characters="\x00", blacklist_categories=("Cs",)),
    max_size=64,
)
_col_name = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters="_"
    ),
    min_size=1,
    max_size=12,
)


def _tuple_of(values):
    """pgoutput wire tuple for a list of optional strings."""
    return [("n", None) if v is None else ("t", v) for v in values]


@given(st.lists(st.tuples(_col_name, st.one_of(st.none(), _pg_text)), min_size=1,
                max_size=8, unique_by=lambda t: t[0]))
def test_pgoutput_insert_roundtrip(cols):
    cache = {}
    fmt.parse_message(
        fmt.encode_relation(9, "s", "t", [(n, 25) for n, _ in cols],
                            key_columns=[cols[0][0]]),
        cache,
    )
    ev = fmt.parse_message(
        fmt.encode_insert(9, _tuple_of([v for _, v in cols])), cache
    )
    assert ev["op"] == "insert"
    assert ev["after"] == {n: v for n, v in cols}


@given(
    st.lists(st.one_of(st.none(), _pg_text), min_size=1, max_size=6),
    st.lists(st.one_of(st.none(), _pg_text), min_size=1, max_size=6),
)
def test_pgoutput_update_full_old_image_roundtrip(new, old):
    n = max(len(new), len(old))
    new = (new + [None] * n)[:n]
    old = (old + [None] * n)[:n]
    cache = {}
    names = [f"c{i}" for i in range(n)]
    fmt.parse_message(
        fmt.encode_relation(9, "s", "t", [(c, 25) for c in names],
                            key_columns=[names[0]], replica_identity="full"),
        cache,
    )
    ev = fmt.parse_message(
        fmt.encode_update(9, _tuple_of(new), old=_tuple_of(old), old_kind="O"),
        cache,
    )
    assert ev["after"] == dict(zip(names, new))
    assert ev["before"] == dict(zip(names, old))


@given(st.binary(max_size=64), _pg_text)
def test_pgoutput_binary_kind_and_message_roundtrip(payload, prefix):
    cache = {}
    fmt.parse_message(
        fmt.encode_relation(9, "s", "t", [("b", 17)], key_columns=["b"]), cache
    )
    ev = fmt.parse_message(fmt.encode_insert(9, [("b", payload)]), cache)
    # binary attribute kind 'b' surfaces as PG bytea hex text (\x…)
    assert ev["after"]["b"] == "\\x" + payload.hex()
    msg = fmt.parse_message(
        fmt.encode_logical_message("0/10", prefix.replace("\x00", ""), payload),
        cache,
    )
    assert msg["op"] == "message"


_datum = st.one_of(
    st.none(),
    st.integers(min_value=-(2**31), max_value=2**31 - 1).map(lambda v: ("int32", v)),
    st.integers(min_value=-(2**63), max_value=2**63 - 1).map(lambda v: ("int64", v)),
    st.floats(allow_nan=False, width=64).map(lambda v: ("float64", v)),
    st.booleans().map(lambda v: ("boolean", v)),
    _pg_text.map(lambda v: ("string", v)),
    st.binary(max_size=32).map(lambda v: ("binary", v)),
)


@given(st.lists(_datum, min_size=1, max_size=6))
def test_decoderbufs_datum_roundtrip(datums):
    new_tuple = []
    for i, d in enumerate(datums):
        if d is None:
            new_tuple.append(dbf.encode_datum(f"c{i}", 25))  # missing ≙ TOAST
        else:
            kind, v = d
            new_tuple.append(dbf.encode_datum(f"c{i}", 25, **{kind: v}))
    ev = dbf.parse_row_message(
        dbf.encode_row_message("insert", xid=1, table="s.t", new_tuple=new_tuple)
    )
    for i, d in enumerate(datums):
        got = ev["after"][f"c{i}"]
        if d is None:
            assert got is None
            continue
        kind, v = d
        if kind == "boolean":
            assert got in ("true", "false") and (got == "true") == v
        elif kind == "binary":
            assert got == "\\x" + v.hex()
        elif kind == "float64":
            assert float(got) == v
        else:
            assert got == str(v)


@pytest.mark.usefixtures("spark")
@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.text(
    alphabet=st.characters(blacklist_characters="\x00\r\n",
                           blacklist_categories=("Cs",)),
    max_size=40,
), min_size=1, max_size=50))
def test_test_decoding_quoting_survives_adversarial_values(spark, values):
    """The grammar's quote-escape rule (decoder.ts:29-37): '' inside a
    quoted value is a literal quote. All generated values go through one
    decode job per hypothesis example."""
    from pg_logical_replication_spark.sources import decode

    lines = [
        (i, "table public.t: INSERT: id[bigint]:%d v[text]:'%s'"
            % (i, v.replace("'", "''")))
        for i, v in enumerate(values)
    ]
    raw = spark.createDataFrame(lines, "seq long, value string")
    got = {
        int(r["after"]["id"]): r["after"]["v"]
        for r in decode(raw, "test_decoding").filter("op = 'insert'").collect()
    }
    assert got == {i: v for i, v in enumerate(values)}


@pytest.mark.usefixtures("spark")
@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.one_of(
    st.none(),
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.booleans(),
), min_size=1, max_size=40))
def test_wal2json_value_domain_stringifies(spark, values):
    """Arbitrary JSON scalars (unicode strings incl. quotes/newlines,
    numbers, booleans, null) survive the declarative decode into the
    text-format value domain: null→NULL, true/false lowercase, numbers
    verbatim, strings identical."""
    import json as _json

    lines = [
        (i, _json.dumps({
            "change": [{
                "kind": "insert", "schema": "public", "table": "t",
                "columnnames": ["id", "v"], "columntypes": ["bigint", "text"],
                "columnvalues": [i, v],
            }],
            "xid": i, "nextlsn": f"0/{8 * i + 16:X}",
        }))
        for i, v in enumerate(values)
    ]
    from pg_logical_replication_spark.sources import decode

    raw = spark.createDataFrame(lines, "seq long, value string")
    got = {
        int(r["after"]["id"]): r["after"]["v"]
        for r in decode(raw, "wal2json").collect()
    }
    def expect(v):
        if v is None:
            return None
        if v is True:
            return "true"
        if v is False:
            return "false"
        return str(v)
    assert got == {i: expect(v) for i, v in enumerate(values)}


def _pg_array_literal(elems):
    """Format a 1-D array as PostgreSQL's text output would (quote when
    the element is empty/NULL-spelled/contains specials; escape \\ and ")."""
    out = []
    for e in elems:
        if e is None:
            out.append("NULL")
            continue
        needs_quote = (
            e == ""
            or e.upper() == "NULL"
            or any(c in e for c in '{},"\\')
            or e != e.strip()
            or any(ch.isspace() for ch in e)
        )
        if needs_quote:
            out.append('"' + e.replace("\\", "\\\\").replace('"', '\\"') + '"')
        else:
            out.append(e)
    return "{" + ",".join(out) + "}"


@pytest.mark.usefixtures("spark")
@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.one_of(st.none(), st.text(
    alphabet=st.characters(blacklist_characters="\x00", blacklist_categories=("Cs",)),
    max_size=12,
)), max_size=6), min_size=1, max_size=30))
def test_pg_array_parses_postgres_output_format(spark, arrays):
    """pg_array inverts PostgreSQL's array text output for arbitrary
    element content: quoting, backslash/quote escapes, NULL vs "NULL",
    empty arrays — the quote-escape rules SURVEY §7 flags."""
    from pg_logical_replication_spark.functions import pg_array

    rows = [(i, _pg_array_literal(a)) for i, a in enumerate(arrays)]
    df = spark.createDataFrame(rows, "i long, v string")
    got = {
        r["i"]: r["parsed"]
        for r in df.select("i", pg_array("v").alias("parsed")).collect()
    }
    assert got == {i: a for i, a in enumerate(arrays)}


@given(
    xid=st.integers(min_value=0, max_value=2**31 - 1),
    subxid=st.integers(min_value=0, max_value=2**31 - 1),
    ts=st.integers(min_value=0, max_value=2**62 // 1000),
    cols=st.lists(
        st.tuples(_col_name, st.one_of(st.none(), _pg_text)),
        min_size=1, max_size=6, unique_by=lambda t: t[0],
    ),
)
def test_protocol_v2_stream_roundtrip(xid, subxid, ts, cols):
    """S/E/c/A control messages and spliced-xid DML survive the wire
    (any xid incl. the full int32 range, any unicode values)."""
    ts_us = ts + fmt.PG_EPOCH_OFFSET_US
    s = fmt.parse_message(fmt.encode_stream_start(xid), {})
    assert s["op"] == "stream_start" and s["xid"] == xid
    c = fmt.parse_message(
        fmt.encode_stream_commit(xid, "00000001/00000010", "00000001/00000020", ts_us), {}
    )
    assert c["xid"] == xid and c["commit_ts_us"] == ts_us
    a = fmt.parse_message(fmt.encode_stream_abort(xid, subxid), {})
    assert a["xid"] == xid and a["meta"]["subxid"] == str(subxid)

    cache = {}
    fmt.parse_message(
        fmt.with_stream_xid(
            xid,
            fmt.encode_relation(9, "s", "t", [(n, 25) for n, _ in cols],
                                key_columns=[cols[0][0]]),
        ),
        cache,
        streamed=True,
    )
    ev = fmt.parse_message(
        fmt.with_stream_xid(subxid, fmt.encode_insert(9, _tuple_of([v for _, v in cols]))),
        cache,
        streamed=True,
    )
    assert ev["xid"] == subxid
    assert ev["after"] == {n: v for n, v in cols}


# ---------------------------------------------------------- png (round 3)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    ch=st.sampled_from([1, 3, 4]),
    data=st.data(),
)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_property(w, h, ch, data):
    from pg_logical_replication_spark.functions.png import decode_png, encode_png

    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * ch, max_size=w * h * ch
            )
        )
    )
    assert decode_png(encode_png(w, h, px, ch)) == (w, h, ch, px)


@given(junk=st.binary(min_size=0, max_size=64))
@settings(max_examples=40, deadline=None)
def test_png_garbage_never_misdecodes(junk):
    """Arbitrary bytes must raise, never return fabricated pixels."""
    import pytest as _pytest

    from pg_logical_replication_spark.functions.png import (
        PNG_SIGNATURE,
        decode_png,
    )

    with _pytest.raises((ValueError, NotImplementedError, Exception)):
        decode_png(junk if junk[:8] != PNG_SIGNATURE else junk + b"x")


# -------------------------------------------------------- pbshim (round 3)
@given(
    status=st.integers(min_value=-(2**31), max_value=2**31 - 1),
    err=st.text(max_size=40),
    value=st.binary(max_size=64),
)
@settings(max_examples=40, deadline=None)
def test_pbshim_state_response_roundtrip(status, err, value):
    import importlib.util

    import pg_logical_replication_spark  # noqa: F401 (installs shim path)

    spec = importlib.util.find_spec("google.protobuf")
    if spec is not None and "pbshim" not in (spec.origin or ""):
        return  # real protobuf present; shim inactive by design
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    msg = sm.StateResponse(statusCode=status, errorMessage=err, value=value)
    out = sm.StateResponse()
    out.ParseFromString(msg.SerializeToString())
    assert (out.statusCode, out.errorMessage, out.value) == (status, err, value)


@given(
    vals=st.lists(st.binary(max_size=32), max_size=8),
    ts=st.lists(
        st.integers(min_value=-(2**62), max_value=2**62), max_size=5
    ),
)
@settings(max_examples=40, deadline=None)
def test_pbshim_repeated_roundtrip(vals, ts):
    import importlib.util

    import pg_logical_replication_spark  # noqa: F401

    spec = importlib.util.find_spec("google.protobuf")
    if spec is not None and "pbshim" not in (spec.origin or ""):
        return
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    put = sm.ListStatePut(value=vals)
    p2 = sm.ListStatePut()
    p2.ParseFromString(put.SerializeToString())
    assert list(p2.value) == vals

    resp = sm.StateResponseWithTimer(
        timer=[sm.TimerInfo(timestampMs=t) for t in ts]
    )
    r2 = sm.StateResponseWithTimer()
    r2.ParseFromString(resp.SerializeToString())
    assert [t.timestampMs for t in r2.timer] == ts


# ------------------------------------------------- round-4 codec props
@given(
    st.integers(1, 4),
    st.integers(1, 3),
    st.integers(0, 2**31 - 1),
)
@settings(max_examples=30, deadline=None)
def test_jpeg_q100_block_constant_lossless_property(bw, bh, seed):
    """Any block-constant grayscale image is bit-exact through the
    quality-100 JPEG pipeline — the q_mm_jpeg_decode oracle invariant,
    generalized."""
    from pg_logical_replication_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    w, h = 8 * bw, 8 * bh
    px = bytes(
        (seed * 31 + ((y // 8) * bw + (x // 8)) * 7) % 256
        for y in range(h)
        for x in range(w)
    )
    assert decode_jpeg(encode_jpeg(w, h, px, 1, quality=100)) == (w, h, 1, px)


@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=2000),
    st.sampled_from([64, 256, 4096]),
)
@settings(max_examples=30, deadline=None)
def test_flac_roundtrip_lossless_property(samples, block_size):
    """FLAC is lossless for ANY 16-bit signal at any block size."""
    from pg_logical_replication_spark.functions.flac import (
        decode_flac,
        encode_flac,
    )

    sr, nc, bps, chans = decode_flac(
        encode_flac(samples, sample_rate=16000, block_size=block_size)
    )
    assert chans[0] == samples and (nc, bps) == (1, 16)


# ------------------------------------------ round-4 decoder fuzzing
@given(st.binary(min_size=0, max_size=400), st.integers(0, 3))
@settings(max_examples=120, deadline=None)
def test_new_decoders_fail_cleanly_on_garbage(data, which):
    """Random bytes must produce a clean exception (or a valid parse),
    never a hang or a non-Exception crash — the DLQ contract every
    mapInPandas decode stage relies on."""
    from pg_logical_replication_spark.functions.flac import decode_flac
    from pg_logical_replication_spark.functions.jpeg import decode_jpeg
    from pg_logical_replication_spark.functions.mediainfo import (
        mp3_info,
        mp4_info,
        webm_info,
        webp_info,
    )
    from pg_logical_replication_spark.functions.gif import decode_gif
    from pg_logical_replication_spark.functions.tiff import decode_tiff
    from pg_logical_replication_spark.functions.warc import parse_warc
    from pg_logical_replication_spark.functions.vp8l import decode_vp8l
    from pg_logical_replication_spark.functions.adpcm import decode_wav_adpcm
    from pg_logical_replication_spark.functions.bmp import decode_bmp

    decoders = [
        decode_jpeg, decode_flac, decode_vp8l,
        lambda b: (mp3_info(b), mp4_info(b), webp_info(b), webm_info(b),
                   decode_gif(b), decode_tiff(b), parse_warc(b),
                   decode_wav_adpcm(b), decode_bmp(b)),
    ]
    try:
        decoders[which](data)
    except Exception:
        pass  # any clean exception is acceptable; hangs/aborts are not


@given(st.binary(min_size=8, max_size=300))
@settings(max_examples=60, deadline=None)
def test_truncated_valid_jpeg_prefix_fails_cleanly(junk):
    """A VALID header followed by truncation/junk — the harder fuzz
    case than pure noise, since parsing gets deep before failing."""
    from pg_logical_replication_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    good = encode_jpeg(8, 8, bytes(64), 1)
    for cut in (len(good) // 3, len(good) // 2):
        try:
            decode_jpeg(good[:cut] + junk)
        except Exception:
            pass
