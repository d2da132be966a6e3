"""pgoutput binary codec unit tests — pure Python, no SparkSession.

Mirrors the reference's message-shape assertions
(decoder-pgoutput.spec.ts:47-233) and the 'missing relation' contract
(pgoutput-parser.ts:151-153) against our encoder-built golden bytes
(FIXTURES.md §3c)."""

import pytest

from pg_logical_replication_spark.sources import pgoutput_format as fmt

USERS_COLS = [
    ("id", 20),
    ("firstname", 25),
    ("lastname", 25),
    ("email", 1043),
    ("phone", 1043),
    ("deleted", 16),
    ("created", 1184),
]


def _relation(oid=16385, identity="default"):
    return fmt.encode_relation(
        oid, "public", "users", USERS_COLS, key_columns=["id"], replica_identity=identity
    )


def test_begin_commit_roundtrip():
    cache = {}
    b = fmt.parse_message(fmt.encode_begin("00000000/016B3D88", 1_755_000_000_000_000, 771), cache)
    assert b == {
        "op": "begin",
        "lsn": "00000000/016B3D88",
        "commit_ts_us": 1_755_000_000_000_000,
        "xid": 771,
    }
    c = fmt.parse_message(
        fmt.encode_commit("00000000/016B3D88", "00000000/016B3DFF", 1_755_000_000_000_000),
        cache,
    )
    assert c["op"] == "commit"
    assert c["meta"]["end_lsn"] == "00000000/016B3DFF"


def test_relation_caches_and_key_flags():
    cache = {}
    ev = fmt.parse_message(_relation(), cache)
    assert ev["op"] == "relation"
    assert ev["meta"]["key_columns"] == "id"
    assert ev["meta"]["replica_identity"] == "default"
    assert 16385 in cache
    assert cache[16385].key_columns == ["id"]


def test_insert_tuple_kinds():
    cache = {}
    fmt.parse_message(_relation(), cache)
    ins = fmt.encode_insert(
        16385,
        [
            ("t", "1"),
            ("t", "alice"),
            ("t", "smith"),
            ("n", None),
            ("b", b"\x01\x02"),
            ("t", "f"),
            ("t", "2026-08-13 00:00:00+00"),
        ],
    )
    ev = fmt.parse_message(ins, cache)
    assert ev["op"] == "insert"
    assert ev["table"] == "users"
    assert ev["after"]["id"] == "1"
    assert ev["after"]["email"] is None
    assert ev["after"]["phone"] == "\\x0102"  # bytea hex text form


def test_missing_relation_raises():
    with pytest.raises(ValueError, match="missing relation"):
        fmt.parse_message(fmt.encode_insert(999, [("t", "1")]), {})


def test_delete_key_vs_full_identity():
    """Identity default → key only, before null; full → before populated
    (asserted by the reference at decoder-pgoutput.spec.ts:146-159)."""
    cache = {}
    fmt.parse_message(_relation(), cache)
    key_tuple = [("t", "1"), ("n", None), ("n", None), ("n", None), ("n", None), ("n", None), ("n", None)]
    ev = fmt.parse_message(fmt.encode_delete(16385, key_tuple, kind="K"), cache)
    assert ev["key"] == {"id": "1"}
    assert ev["before"] is None

    full = [("t", "1"), ("t", "a"), ("t", "b"), ("n", None), ("n", None), ("t", "f"), ("t", "x")]
    ev2 = fmt.parse_message(fmt.encode_delete(16385, full, kind="O"), cache)
    assert ev2["key"] == {"id": "1"}
    assert ev2["before"]["firstname"] == "a"


def test_update_submessages():
    cache = {}
    fmt.parse_message(_relation(), cache)
    new = [("t", "2"), ("t", "a2"), ("t", "b2"), ("n", None), ("n", None), ("t", "f"), ("t", "x")]
    # N only: no key/old
    ev = fmt.parse_message(fmt.encode_update(16385, new), cache)
    assert ev["key"] is None and ev["before"] is None and ev["after"]["id"] == "2"
    # K: old key (key changed)
    old_key = [("t", "1"), ("n", None), ("n", None), ("n", None), ("n", None), ("n", None), ("n", None)]
    ev2 = fmt.parse_message(fmt.encode_update(16385, new, old=old_key, old_kind="K"), cache)
    assert ev2["key"] == {"id": "1"} and ev2["before"] is None
    # O: full old row
    old_full = [("t", "1"), ("t", "a"), ("t", "b"), ("n", None), ("n", None), ("t", "f"), ("t", "x")]
    ev3 = fmt.parse_message(fmt.encode_update(16385, new, old=old_full, old_kind="O"), cache)
    assert ev3["before"]["firstname"] == "a" and ev3["key"] == {"id": "1"}


def test_unchanged_toast_fallback():
    """'u' kind falls back to the old image when present
    (pgoutput-parser.ts:260-261), else null + meta marker."""
    cache = {}
    fmt.parse_message(_relation(), cache)
    new = [("t", "1"), ("u", None), ("t", "b2"), ("n", None), ("n", None), ("t", "f"), ("t", "x")]
    old_full = [("t", "1"), ("t", "BIGVALUE"), ("t", "b"), ("n", None), ("n", None), ("t", "f"), ("t", "x")]
    ev = fmt.parse_message(fmt.encode_update(16385, new, old=old_full, old_kind="O"), cache)
    assert ev["after"]["firstname"] == "BIGVALUE"
    ev2 = fmt.parse_message(fmt.encode_update(16385, new), cache)
    assert ev2["after"]["firstname"] is None
    assert ev2["meta"]["unchanged_toast"] == "firstname"


def test_truncate_and_message_and_origin_and_type():
    cache = {}
    fmt.parse_message(_relation(), cache)
    t = fmt.parse_message(fmt.encode_truncate([16385], cascade=True), cache)
    assert t["op"] == "truncate" and t["meta"]["cascade"] == "true" and t["table"] == "users"
    m = fmt.parse_message(
        fmt.encode_logical_message("00000000/00000010", "audit", b"hello", transactional=True),
        cache,
    )
    assert m["op"] == "message" and m["meta"]["prefix"] == "audit"
    assert m["meta"]["content"] == "\\x" + b"hello".hex()
    o = fmt.parse_message(fmt.encode_origin("00000000/00000001", "origin1"), cache)
    assert o["op"] == "origin" and o["meta"]["origin"] == "origin1"
    y = fmt.parse_message(fmt.encode_type(99999, "public", "mood"), cache)
    assert y["op"] == "type" and y["meta"]["type_name"] == "mood"


def test_unknown_tag_raises():
    with pytest.raises(ValueError, match="unknown pgoutput"):
        fmt.parse_message(b"Z\x00", {})


# ---------------------------------------------------- protocol v2 streaming
def test_stream_control_messages_roundtrip():
    """S/E/c/A wire shapes (public spec, protocol v2 — beyond the
    reference's v1-only parser, pgoutput-parser.ts:24-52)."""
    s = fmt.parse_message(fmt.encode_stream_start(777, first_segment=True), {})
    assert s == {
        "op": "stream_start", "xid": 777, "meta": {"first_segment": "true"}
    }
    s2 = fmt.parse_message(fmt.encode_stream_start(777, first_segment=False), {})
    assert s2["meta"]["first_segment"] == "false"
    e = fmt.parse_message(fmt.encode_stream_stop(), {})
    assert e == {"op": "stream_stop"}
    c = fmt.parse_message(
        fmt.encode_stream_commit(777, "00000001/000000A0", "00000001/000000B0", 1_700_000_000_000_000),
        {},
    )
    assert c["op"] == "stream_commit" and c["xid"] == 777
    assert c["lsn"] == "00000001/000000A0" and c["meta"]["end_lsn"] == "00000001/000000B0"
    assert c["commit_ts_us"] == 1_700_000_000_000_000
    a = fmt.parse_message(fmt.encode_stream_abort(777, 778), {})
    assert a["op"] == "stream_abort" and a["xid"] == 777 and a["meta"]["subxid"] == "778"
    a2 = fmt.parse_message(fmt.encode_stream_abort(777), {})
    assert a2["meta"]["subxid"] == "777"  # top-level abort: subxid = xid


def test_streamed_dml_carries_spliced_xid():
    """Inside [S, E) every R/I/U/D/M message carries an Int32 xid after
    the tag; parse_message(streamed=True) reads and attaches it."""
    cache = {}
    rel = fmt.with_stream_xid(777, _relation())
    ev_r = fmt.parse_message(rel, cache, streamed=True)
    assert ev_r["op"] == "relation" and ev_r["xid"] == 777
    assert 16385 in cache  # relation cached despite the splice

    ins = fmt.with_stream_xid(
        778,  # a SUBtransaction xid
        fmt.encode_insert(16385, [("t", "1"), ("t", "a"), ("t", "b"),
                                  ("n", None), ("n", None), ("t", "f"), ("t", "x")]),
    )
    ev_i = fmt.parse_message(ins, cache, streamed=True)
    assert ev_i["op"] == "insert" and ev_i["xid"] == 778
    assert ev_i["after"]["id"] == "1"

    # the same bytes parsed as non-streamed must NOT silently succeed
    with pytest.raises(Exception):
        fmt.parse_message(ins, cache)


def test_streamed_parse_does_not_affect_control_tags():
    """B/C never carry the spliced xid even in streamed mode (they frame
    non-streamed transactions only)."""
    b = fmt.encode_begin("00000000/00000010", 1_700_000_000_000_000, 55)
    ev = fmt.parse_message(b, {}, streamed=True)
    assert ev["op"] == "begin" and ev["xid"] == 55


# ------------------------------------------------------- two-phase commit
def test_two_phase_messages_roundtrip():
    """b/P/K/r wire shapes (two_phase slot option, PG 15+ public spec)."""
    TS = 1_700_000_000_000_000
    b = fmt.parse_message(
        fmt.encode_begin_prepare("00000001/00000010", "00000001/00000020", TS, 900, "gid-1"),
        {},
    )
    assert b["op"] == "begin_prepare" and b["xid"] == 900
    assert b["meta"]["gid"] == "gid-1" and b["commit_ts_us"] == TS

    p = fmt.parse_message(
        fmt.encode_prepare("00000001/00000010", "00000001/00000020", TS, 900, "gid-1"),
        {},
    )
    assert p["op"] == "prepare" and p["xid"] == 900 and p["meta"]["gid"] == "gid-1"

    k = fmt.parse_message(
        fmt.encode_commit_prepared("00000001/00000030", "00000001/00000040", TS + 5, 900, "gid-1"),
        {},
    )
    assert k["op"] == "commit_prepared" and k["xid"] == 900
    assert k["commit_ts_us"] == TS + 5

    sp = fmt.parse_message(
        fmt.encode_stream_prepare("00000001/00000010", "00000001/00000020", TS, 901, "gid-2"),
        {},
    )
    assert sp["op"] == "stream_prepare" and sp["xid"] == 901

    r = fmt.parse_message(
        fmt.encode_rollback_prepared(
            "00000001/00000020", "00000001/00000050", TS, TS + 9, 902, "gid-3"
        ),
        {},
    )
    assert r["op"] == "rollback_prepared" and r["xid"] == 902
    assert r["meta"]["gid"] == "gid-3" and r["commit_ts_us"] == TS + 9
    assert r["meta"]["prepare_ts_us"] == str(TS)


def test_parse_message_fuzz_never_hangs_or_succeeds_silently():
    """Hypothesis fuzz: arbitrary bytes either parse to a dict with a
    known op, or raise a clean ValueError/KeyError/struct-style error —
    never hang, loop, or return garbage types. The per-batch hard-error
    contract (SURVEY §2.3 #24: binary formats fail loudly) depends on
    exceptions being catchable and prompt."""
    from hypothesis import given, settings, strategies as st

    from pg_logical_replication_spark.sources import pgoutput_format as fmt

    known_ops = {
        "begin", "commit", "origin", "relation", "type", "insert",
        "update", "delete", "truncate", "message", "stream_start",
        "stream_stop", "stream_commit", "stream_abort", "begin_prepare",
        "prepare", "commit_prepared", "rollback_prepared",
        "stream_prepare",
    }

    @settings(max_examples=300, deadline=1000)
    @given(st.binary(min_size=0, max_size=64), st.booleans())
    def run(buf, streamed):
        try:
            ev = fmt.parse_message(buf, {}, streamed=streamed)
        except Exception as ex:  # noqa: BLE001 — the contract IS "raises"
            assert not isinstance(ex, (SystemExit, KeyboardInterrupt))
            return
        assert isinstance(ev, dict) and ev.get("op") in known_ops

    run()


def test_xids_beyond_2_31_roundtrip():
    """TransactionId is unsigned 32-bit: a cluster past 2^31 txns emits
    xids like 3_000_000_000 — they must encode and decode unchanged
    (signed packing raised struct.error / decoded negative; review r2)."""
    xid = 3_000_000_000
    ev = fmt.parse_message(
        fmt.encode_begin("0/10", 1_600_000_000_000_000, xid), {}
    )
    assert ev["xid"] == xid
    ev = fmt.parse_message(fmt.encode_stream_start(xid), {})
    assert ev["xid"] == xid
    ev = fmt.parse_message(fmt.encode_stream_abort(xid), {})
    assert ev["xid"] == xid


def test_pre2000_timestamp_roundtrips_signed():
    """PG TimestampTz is a SIGNED int64 on the wire: a pre-2000 commit
    timestamp (negative µs since the PG epoch) must roundtrip, not
    overflow or decode to a bogus huge value."""
    from pg_logical_replication_spark.sources import pgoutput_format as pf

    msg = pf.encode_begin("0/1000", 0, 42)  # unix epoch 1970 < PG epoch 2000
    begin = pf.parse_message(msg)
    assert begin["commit_ts_us"] == 0
    assert begin["xid"] == 42
