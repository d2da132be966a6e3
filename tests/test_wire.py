"""Unit tests for the Catalyst-only COPY-stream wire demux
(sources/wire.py ≙ reference logical-replication-service.ts:146-174)."""

import struct

from pg_logical_replication_spark.sources.wire import (
    PG_EPOCH_OFFSET_US,
    demux_copy_stream,
)


def _w(start: int, end: int, ts_us: int, payload: bytes) -> bytes:
    return b"w" + struct.pack(">QQq", start, end, ts_us) + payload


def _k(end: int, ts_us: int, respond: bool) -> bytes:
    return b"k" + struct.pack(">Qq", end, ts_us) + (b"\x01" if respond else b"\x00")


def test_demux_splits_and_decodes_headers(spark):
    frames = [
        (_w(0x1_0000_0007, 0x1_0000_000C, 5_000_000, b"hello"),),
        (_k(0x2_0000_0008, 6_000_000, True),),
        (_k(0x2_0000_0009, 7_000_000, False),),
        (b"z" + b"\x00" * 24,),  # unknown tag → '?' row, not dropped
    ]
    raw = spark.createDataFrame(frames, "data binary")
    rows = {r["msg_type"]: r for r in demux_copy_stream(raw).collect()}
    # collect() keeps one row per type here except the two k's — recollect
    out = demux_copy_stream(raw).collect()
    w = next(r for r in out if r["msg_type"] == "w")
    assert w["wal_start"] == 0x1_0000_0007
    assert w["wal_end"] == 0x1_0000_000C
    assert bytes(w["payload"]) == b"hello"
    assert w["should_respond"] is None
    ks = [r for r in out if r["msg_type"] == "k"]
    assert sorted(k["wal_end"] for k in ks) == [0x2_0000_0008, 0x2_0000_0009]
    assert sorted(k["should_respond"] for k in ks) == [False, True]
    assert all(k["payload"] is None and k["wal_start"] is None for k in ks)
    unknown = [r for r in out if r["msg_type"] == "?"]
    assert len(unknown) == 1  # warned-and-kept, the DLQ-friendly branch
    assert rows  # silence lint on the convenience dict


def test_demux_timestamp_is_pg_epoch_shifted(spark):
    raw = spark.createDataFrame([(_k(1, 0, False),)], "data binary")
    row = demux_copy_stream(raw).collect()[0]
    # ts_us=0 ≙ 2000-01-01T00:00:00Z (the PG epoch)
    import datetime

    expected = datetime.datetime.fromtimestamp(
        PG_EPOCH_OFFSET_US / 1e6, tz=datetime.timezone.utc
    ).replace(tzinfo=None)
    assert row["server_ts"] == expected


def test_demux_plan_has_no_python_stage(spark):
    raw = spark.createDataFrame([(_k(1, 0, False),)], "data binary")
    plan = demux_copy_stream(raw)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # pure Catalyst: no UDF/mapInPandas eval
