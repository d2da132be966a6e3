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
    from pyspark.sql import functions as F

    raw = spark.createDataFrame([(_k(1, 0, False),)], "data binary")
    # ts_us=0 ≙ 2000-01-01T00:00:00Z (the PG epoch); assert via JVM-side
    # unix_micros so the check is independent of the OS timezone
    row = (
        demux_copy_stream(raw)
        .select(F.unix_micros("server_ts").alias("us"))
        .collect()[0]
    )
    assert row["us"] == PG_EPOCH_OFFSET_US


def test_demux_roundtrip_property(spark):
    """Randomized frames (hypothesis): every header field survives the
    Catalyst hex/conv decode exactly — full u64 range included (top-bit
    values land as the documented two's-complement wraparound)."""
    from hypothesis import given, settings, strategies as st

    u64 = st.integers(min_value=0, max_value=2**64 - 1)

    def as_signed(v: int) -> int:
        return v - 2**64 if v >= 2**63 else v

    ts = st.integers(min_value=0, max_value=2**40)  # µs past PG epoch
    frames = st.lists(
        st.one_of(
            st.tuples(st.just("w"), u64, u64, ts, st.binary(max_size=40)),
            st.tuples(st.just("k"), u64, ts, st.booleans()),
        ),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=10, deadline=None)
    @given(frames)
    def run(fs):
        raws, expect = [], []
        for f in fs:
            if f[0] == "w":
                _, a, b, t_, payload = f
                raws.append((_w(a, b, t_, payload),))
                expect.append(
                    ("w", as_signed(a), as_signed(b), t_, bytes(payload), None)
                )
            else:
                _, b, t_, resp = f
                raws.append((_k(b, t_, resp),))
                expect.append(("k", None, as_signed(b), t_, None, resp))
        from pyspark.sql import functions as F

        df = spark.createDataFrame(raws, "data binary")
        # compare the timestamp as JVM-side unix_micros: collected Python
        # datetimes render in the OS-local zone, which would make the
        # assertion depend on the machine's TZ
        out = demux_copy_stream(df).withColumn(
            "ts_us", F.unix_micros("server_ts") - F.lit(PG_EPOCH_OFFSET_US)
        )
        got = [
            (
                r["msg_type"],
                r["wal_start"],
                r["wal_end"],
                r["ts_us"],
                bytes(r["payload"]) if r["payload"] is not None else None,
                r["should_respond"],
            )
            for r in out.collect()
        ]
        assert sorted(got, key=str) == sorted(expect, key=str)

    run()


def test_demux_plan_has_no_python_stage(spark):
    raw = spark.createDataFrame([(_k(1, 0, False),)], "data binary")
    plan = demux_copy_stream(raw)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # pure Catalyst: no UDF/mapInPandas eval
