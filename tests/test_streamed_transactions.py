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
