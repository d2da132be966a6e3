"""pgoutput protocol-v2 streamed in-progress transactions, end-to-end:

encode S/E/c/A segments + spliced-xid DML → decode_pgoutput (per-
partition stream-state tracking) → resolve_streamed (commit gating,
top-level and subtransaction abort invisibility, commit_ts inheritance).

This is the engine's scale path for the reference's 'huge transaction'
scenario (decoder-pgoutput.spec.ts:324-373): transactions larger than
logical_decoding_work_mem stream before their fate is known instead of
spooling server-side; the resolver applies the fate after the fact.
"""

import datetime

from pg_logical_replication_spark.operators.transactions import resolve_streamed
from pg_logical_replication_spark.sources import pgoutput_format as fmt
from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput

OID = 16385
TS_US = 1_700_000_000_000_000


def _rel():
    return fmt.encode_relation(OID, "public", "users", [("id", 20)], key_columns=["id"])


def _ins(row_id):
    return fmt.encode_insert(OID, [("t", str(row_id))])


def _wire():
    """R; txn 100 (2 segments, one subxact-aborted row); txn 200
    (top-aborted); a plain non-streamed txn 300."""
    msgs = [
        _rel(),
        # txn 100, segment 1
        fmt.encode_stream_start(100, first_segment=True),
        fmt.with_stream_xid(100, _ins(1)),
        fmt.with_stream_xid(101, _ins(2)),  # subtransaction 101
        fmt.encode_stream_stop(),
        # txn 200 interleaves
        fmt.encode_stream_start(200, first_segment=True),
        fmt.with_stream_xid(200, _ins(4)),
        fmt.encode_stream_stop(),
        # txn 100, segment 2
        fmt.encode_stream_start(100, first_segment=False),
        fmt.with_stream_xid(100, _ins(3)),
        fmt.encode_stream_stop(),
        # fates: subxact 101 aborts, txn 100 commits, txn 200 top-aborts
        fmt.encode_stream_abort(100, 101),
        fmt.encode_stream_commit(100, "00000000/00000100", "00000000/00000110", TS_US),
        fmt.encode_stream_abort(200),
        # a plain v1 transaction flows through untouched
        fmt.encode_begin("00000000/00000200", TS_US, 300),
        _ins(5),
        fmt.encode_commit("00000000/00000200", "00000000/00000210", TS_US),
    ]
    return [(f"0/{16 + 8 * i:X}", i, bytearray(m)) for i, m in enumerate(msgs)]


def test_streamed_transactions_resolve(spark):
    raw = spark.createDataFrame(
        _wire(), "lsn string, seq long, data binary"
    ).repartition(1)
    decoded = decode_pgoutput(raw)

    ops = {r["op"] for r in decoded.select("op").collect()}
    assert {"stream_start", "stream_stop", "stream_commit", "stream_abort"} <= ops

    resolved = resolve_streamed(decoded)
    inserts = {
        r["after"]["id"]: r
        for r in resolved.filter("op = 'insert'").collect()
    }
    # committed streamed rows survive; subxact-aborted and top-aborted die
    assert sorted(inserts) == ["1", "3", "5"]
    assert inserts["1"]["top_xid"] == 100 and inserts["3"]["top_xid"] == 100
    # commit_ts inherited from the stream_commit
    expect_ts = datetime.datetime.fromtimestamp(TS_US / 1e6, datetime.timezone.utc)
    for rid in ("1", "3"):
        got = inserts[rid]["commit_ts"]
        assert got is not None
        if got.tzinfo is None:
            got = got.replace(tzinfo=datetime.timezone.utc)
        assert got == expect_ts
    # control rows are consumed
    assert resolved.filter("op like 'stream%'").count() == 0


def test_streamed_relation_prescan_fallback(spark):
    """A relation announced ONLY inside a streamed segment still feeds
    the pre-scan cache (streamed retry in _collect_relations)."""
    msgs = [
        fmt.encode_stream_start(42, first_segment=True),
        fmt.with_stream_xid(42, _rel()),
        fmt.with_stream_xid(42, _ins(9)),
        fmt.encode_stream_stop(),
        fmt.encode_stream_commit(42, "00000000/00000300", "00000000/00000310", TS_US),
    ]
    raw = spark.createDataFrame(
        [(f"0/{16 + 8 * i:X}", i, bytearray(m)) for i, m in enumerate(msgs)],
        "lsn string, seq long, data binary",
    ).repartition(1)
    out = resolve_streamed(decode_pgoutput(raw)).filter("op = 'insert'").collect()
    assert len(out) == 1 and out[0]["after"]["id"] == "9"
    assert out[0]["top_xid"] == 42


def test_prepared_transactions_resolve(spark):
    """Two-phase commit: b..P framed changes are withheld until their
    commit_prepared; rollback_prepared drops them; interleaved v1
    traffic passes untouched (gid null)."""
    from pg_logical_replication_spark.operators.transactions import resolve_prepared

    msgs = [
        _rel(),
        # prepared txn 900 → later committed
        fmt.encode_begin_prepare("0/100", "0/110", TS_US, 900, "gid-commit"),
        _ins(1),
        fmt.encode_prepare("0/100", "0/110", TS_US, 900, "gid-commit"),
        # plain v1 txn between the prepare and its fate
        fmt.encode_begin("0/200", TS_US, 300),
        _ins(5),
        fmt.encode_commit("0/200", "0/210", TS_US),
        # prepared txn 901 → rolled back
        fmt.encode_begin_prepare("0/300", "0/310", TS_US, 901, "gid-roll"),
        _ins(2),
        fmt.encode_prepare("0/300", "0/310", TS_US, 901, "gid-roll"),
        # fates
        fmt.encode_commit_prepared("0/400", "0/410", TS_US + 7_000_000, 900, "gid-commit"),
        fmt.encode_rollback_prepared("0/310", "0/420", TS_US, TS_US + 8_000_000, 901, "gid-roll"),
    ]
    raw = spark.createDataFrame(
        [(f"0/{16 + 8 * i:X}", i, bytearray(m)) for i, m in enumerate(msgs)],
        "lsn string, seq long, data binary",
    ).repartition(1)
    resolved = resolve_prepared(decode_pgoutput(raw))
    inserts = {r["after"]["id"]: r for r in resolved.filter("op = 'insert'").collect()}
    assert sorted(inserts) == ["1", "5"]
    assert inserts["1"]["xid"] == 900 and inserts["1"]["gid"] == "gid-commit"
    assert inserts["1"]["commit_ts"] is not None
    assert inserts["5"]["gid"] is None
    # 2PC frame/fate rows consumed; plain begin/commit markers remain
    ops = {r["op"] for r in resolved.collect()}
    assert "begin" in ops and "commit" in ops
    assert not ops & {"begin_prepare", "prepare", "commit_prepared", "rollback_prepared"}


def test_streamed_prepared_transaction_resolves_via_commit_prepared(spark):
    """A STREAMED two-phase txn (segments → stream_prepare → later
    commit_prepared / rollback_prepared) gates on the prepared fate in
    resolve_streamed."""
    msgs = [
        _rel(),
        fmt.encode_stream_start(950, first_segment=True),
        fmt.with_stream_xid(950, _ins(10)),
        fmt.encode_stream_stop(),
        fmt.encode_stream_prepare("0/500", "0/510", TS_US, 950, "gid-sp"),
        fmt.encode_stream_start(951, first_segment=True),
        fmt.with_stream_xid(951, _ins(11)),
        fmt.encode_stream_stop(),
        fmt.encode_stream_prepare("0/600", "0/610", TS_US, 951, "gid-sr"),
        fmt.encode_commit_prepared("0/520", "0/530", TS_US + 3_000_000, 950, "gid-sp"),
        fmt.encode_rollback_prepared("0/610", "0/620", TS_US, TS_US + 4_000_000, 951, "gid-sr"),
    ]
    raw = spark.createDataFrame(
        [(f"0/{16 + 8 * i:X}", i, bytearray(m)) for i, m in enumerate(msgs)],
        "lsn string, seq long, data binary",
    ).repartition(1)
    out = resolve_streamed(decode_pgoutput(raw)).filter("op = 'insert'").collect()
    assert [r["after"]["id"] for r in out] == ["10"]
    assert out[0]["top_xid"] == 950


def test_filter_by_origin(spark):
    """Origin loop guard: transactions carrying a foreign origin marker
    ('O' message in-frame) drop wholesale; local txns pass; with an
    explicit filter list only the named origins drop."""
    from pg_logical_replication_spark.operators.transactions import filter_by_origin

    msgs = [
        _rel(),
        # local txn 1
        fmt.encode_begin("0/100", TS_US, 1), _ins(1),
        fmt.encode_commit("0/100", "0/110", TS_US),
        # foreign txn 2 (origin replica-a)
        fmt.encode_begin("0/200", TS_US, 2),
        fmt.encode_origin("0/200", "replica-a"), _ins(2),
        fmt.encode_commit("0/200", "0/210", TS_US),
        # foreign txn 3 (origin replica-b)
        fmt.encode_begin("0/300", TS_US, 3),
        fmt.encode_origin("0/300", "replica-b"), _ins(3),
        fmt.encode_commit("0/300", "0/310", TS_US),
    ]
    raw = spark.createDataFrame(
        [(f"0/{16 + 8 * i:X}", i, bytearray(m)) for i, m in enumerate(msgs)],
        "lsn string, seq long, data binary",
    ).repartition(1)
    decoded = decode_pgoutput(raw)

    # default: any foreign origin drops
    ids = sorted(
        r["after"]["id"]
        for r in filter_by_origin(decoded).filter("op = 'insert'").collect()
    )
    assert ids == ["1"]

    # explicit list: only replica-a drops
    ids2 = sorted(
        r["after"]["id"]
        for r in filter_by_origin(decoded, filter_origins=["replica-a"])
        .filter("op = 'insert'").collect()
    )
    assert ids2 == ["1", "3"]

    # origin marker rows are consumed either way
    assert filter_by_origin(decoded).filter("op = 'origin'").count() == 0


def test_mixed_streamed_and_plain_two_phase_either_order(spark):
    """ADVICE r1 (medium): a stream carrying BOTH a streamed 2PC txn and
    a plain b..P 2PC txn must gate both — each resolver consumes only
    the commit_prepared/rollback_prepared fates it owns and passes the
    rest through, so resolve_streamed ∘ resolve_prepared works in either
    order (and resolve_transactions packages the canonical chain)."""
    from pg_logical_replication_spark.operators.transactions import (
        resolve_prepared,
        resolve_streamed,
        resolve_transactions,
    )

    msgs = [
        _rel(),
        # streamed 2PC txn 950 → commit_prepared
        fmt.encode_stream_start(950, first_segment=True),
        fmt.with_stream_xid(950, _ins(10)),
        fmt.encode_stream_stop(),
        fmt.encode_stream_prepare("0/500", "0/510", TS_US, 950, "gid-s"),
        # plain 2PC txn 900 → commit_prepared
        fmt.encode_begin_prepare("0/100", "0/110", TS_US, 900, "gid-p"),
        _ins(1),
        fmt.encode_prepare("0/100", "0/110", TS_US, 900, "gid-p"),
        # plain 2PC txn 901 → rollback_prepared
        fmt.encode_begin_prepare("0/300", "0/310", TS_US, 901, "gid-r"),
        _ins(2),
        fmt.encode_prepare("0/300", "0/310", TS_US, 901, "gid-r"),
        # streamed 2PC txn 951 → rollback_prepared
        fmt.encode_stream_start(951, first_segment=True),
        fmt.with_stream_xid(951, _ins(11)),
        fmt.encode_stream_stop(),
        fmt.encode_stream_prepare("0/600", "0/610", TS_US, 951, "gid-t"),
        # plain v1 txn 300 flows through
        fmt.encode_begin("0/200", TS_US, 300),
        _ins(5),
        fmt.encode_commit("0/200", "0/210", TS_US),
        # all four prepared fates, interleaved
        fmt.encode_commit_prepared("0/520", "0/530", TS_US + 1_000_000, 950, "gid-s"),
        fmt.encode_commit_prepared("0/400", "0/410", TS_US + 2_000_000, 900, "gid-p"),
        fmt.encode_rollback_prepared("0/310", "0/420", TS_US, TS_US + 3_000_000, 901, "gid-r"),
        fmt.encode_rollback_prepared("0/610", "0/620", TS_US, TS_US + 4_000_000, 951, "gid-t"),
    ]
    raw = spark.createDataFrame(
        [(f"0/{16 + 8 * i:X}", i, bytearray(m)) for i, m in enumerate(msgs)],
        "lsn string, seq long, data binary",
    ).repartition(1)
    decoded = decode_pgoutput(raw)

    for label, out in (
        ("streamed_then_prepared", resolve_prepared(resolve_streamed(decoded))),
        ("prepared_then_streamed", resolve_streamed(resolve_prepared(decoded))),
        ("resolve_transactions", resolve_transactions(decoded)),
    ):
        inserts = {
            r["after"]["id"]: r for r in out.filter("op = 'insert'").collect()
        }
        assert sorted(inserts) == ["1", "10", "5"], (label, sorted(inserts))
        assert inserts["1"]["xid"] == 900, label
        assert inserts["10"]["commit_ts"] is not None, label
        ops = {r["op"] for r in out.collect()}
        assert not ops & {"commit_prepared", "rollback_prepared"}, (label, ops)


def test_streamed_relation_silent_misparse_guard(spark):
    """ADVICE r1: a streamed 'R' whose oid bytes are all nonzero parses
    as NON-streamed without raising — the xid reads as oid and the oid
    bytes vanish into the schema cstring, fully consuming the buffer.
    Positional S/E context in the pre-scan (not an exception heuristic)
    must pick the streamed parse, so the DML resolves the real table."""
    odd_oid = 0x01010101  # 16843009 — no zero byte for a cstring to stop at
    rel = fmt.encode_relation(
        odd_oid, "public", "tricky", [("id", 20)], key_columns=["id"]
    )
    # prove the trap: the plain parse of the spliced message succeeds
    spliced = bytes(fmt.with_stream_xid(777, rel))
    tmp: dict = {}
    fmt.parse_message(spliced, tmp, require_full_consume=True)  # no raise!
    # garbage entry under oid=xid, oid bytes swallowed into the schema
    assert 777 in tmp and tmp[777].schema != "public"

    msgs = [
        fmt.encode_stream_start(777, first_segment=True),
        fmt.with_stream_xid(777, rel),
        fmt.with_stream_xid(
            777, fmt.encode_insert(odd_oid, [("t", "42")])
        ),
        fmt.encode_stream_stop(),
        fmt.encode_stream_commit(777, "00000000/00000100", "00000000/00000110", TS_US),
    ]
    raw = spark.createDataFrame(
        [(f"0/{16 + 8 * i:X}", i, bytearray(m)) for i, m in enumerate(msgs)],
        "lsn string, seq long, data binary",
    ).repartition(1)
    out = resolve_streamed(decode_pgoutput(raw)).filter("op = 'insert'").collect()
    assert len(out) == 1
    assert out[0]["table"] == "tricky"
    assert out[0]["after"]["id"] == "42"


def test_streamed_txn_query_survives_tiny_arrow_batches(spark):
    """ADVICE r1: q_cdc_streamed_txn's seq-block scheme must hold when a
    transaction's rows straddle many Arrow batches (nonstandard
    maxRecordsPerBatch) — 1e6-wide blocks give 499 segment slots, and
    the encoder asserts rather than silently mis-attributing."""
    import duckdb

    from pg_logical_replication_spark.plans.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "30")  # 100-row txns → 4 segments each
    try:
        got = {
            r["top_xid"]: (r["n"], r["sum_eid"])
            for r in QUERIES["q_cdc_streamed_txn"].builder(spark, sf).collect()
        }
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(QUERIES["q_cdc_streamed_txn"].oracle).fetchall()
    }
    assert got == want


def test_decode_stamps_prepared_frames(spark):
    """decode_pgoutput stamps b..P-framed DML with meta.prepared_xid /
    prepared_gid (per-partition frame state, analogous to
    stream_top_xid) so the streaming gate can key plain 2PC rows
    without positional attribution."""
    msgs = [
        _rel(),
        fmt.encode_begin_prepare("0/100", "0/110", TS_US, 900, "gid-x"),
        _ins(1),
        fmt.encode_prepare("0/100", "0/110", TS_US, 900, "gid-x"),
        # plain v1 txn after the frame: must NOT be stamped
        fmt.encode_begin("0/200", TS_US, 300),
        _ins(5),
        fmt.encode_commit("0/200", "0/210", TS_US),
    ]
    raw = spark.createDataFrame(
        [(f"0/{16 + 8 * i:X}", i, bytearray(m)) for i, m in enumerate(msgs)],
        "lsn string, seq long, data binary",
    ).repartition(1)
    rows = {
        r["after"]["id"]: r
        for r in decode_pgoutput(raw).filter("op = 'insert'").collect()
    }
    framed = rows["1"]["meta"]
    assert framed["prepared_xid"] == "900" and framed["prepared_gid"] == "gid-x"
    plain_meta = rows["5"]["meta"] or {}
    assert "prepared_xid" not in plain_meta
