"""Streaming windows / watermark / stream-static join over the decoded
change stream — the §2.2 matrix rows the batch queries can't witness:

* tumbling-window aggregation on commit_ts with a watermark;
* late data beyond the watermark is dropped (the reference has no such
  notion — single ordered socket — so this is the engine's documented
  semantics for out-of-order logs at scale);
* stream-static broadcast join (decoded stream × dimension table).
"""

import json
import os
import time

from pyspark.sql import functions as F

from pg_logical_replication_spark.streaming import LogicalReplicationService

_MTIME_BASE = time.time() - 10_000


def _write(src, name, lines, order):
    """File-source batch order is MODIFICATION TIME, not name — pin it."""
    p = os.path.join(str(src), name)
    with open(p, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.utime(p, (_MTIME_BASE + order * 10, _MTIME_BASE + order * 10))


def _cs(xid, lsn, ts, table="t", vid=1):
    return json.dumps(
        {
            "change": [
                {
                    "kind": "insert", "schema": "public", "table": table,
                    "columnnames": ["id"], "columntypes": ["bigint"],
                    "columnvalues": [vid],
                }
            ],
            "xid": xid, "nextlsn": lsn, "timestamp": ts,
        }
    )


def test_tumbling_window_with_watermark_drops_late_rows(spark, tmp_path):
    src = tmp_path / "wal"; src.mkdir()
    # batch-per-file: minute-0 rows; a minute-2 row advancing the
    # watermark; a minute-3 row whose batch finalizes+evicts window 00:00
    # (watermark 00:01:30 > window end); then a VERY late minute-0 row.
    _write(src, "000.jsonl", [_cs(1, "0/100", "2026-08-13 00:00:10.000000+00"),
                              _cs(2, "0/200", "2026-08-13 00:00:20.000000+00")], 0)
    _write(src, "001.jsonl", [_cs(3, "0/300", "2026-08-13 00:02:30.000000+00")], 1)
    _write(src, "002.jsonl", [_cs(4, "0/400", "2026-08-13 00:03:30.000000+00")], 2)
    _write(src, "003.jsonl", [_cs(5, "0/500", "2026-08-13 00:00:30.000000+00")], 3)

    svc = LogicalReplicationService(
        spark, str(src), str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    ev = svc.changes("wal2json")
    agg = (
        ev.withWatermark("commit_ts", "1 minute")
        .groupBy(F.window("commit_ts", "1 minute").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory").queryName("win_out")
        .option("checkpointLocation", str(tmp_path / "ckpt" / "q"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    # the 00:00 window is emitted EXACTLY ONCE, with only its two
    # on-time rows — the xid=5 row arriving after eviction is dropped
    rows = [
        (r["ws"].strftime("%H:%M"), r["n"])
        for r in spark.sql("select * from win_out order by ws").collect()
    ]
    assert rows == [("00:00", 2)]


def test_streaming_session_window(spark, tmp_path):
    """session_window over the decoded stream: changes separated by less
    than the gap coalesce into one session; a larger silence closes it
    (state bounded by the watermark — the 100 TB requirement)."""
    src = tmp_path / "wal"; src.mkdir()
    _write(src, "000.jsonl",
           [_cs(1, "0/100", "2026-08-13 00:00:10.000000+00"),
            _cs(2, "0/200", "2026-08-13 00:01:00.000000+00"),   # same session
            _cs(3, "0/300", "2026-08-13 00:10:00.000000+00")], 0)  # new session
    _write(src, "001.jsonl",
           [_cs(4, "0/400", "2026-08-13 01:00:00.000000+00")], 1)  # close all

    svc = LogicalReplicationService(
        spark, str(src), str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    agg = (
        svc.changes("wal2json")
        .withWatermark("commit_ts", "1 minute")
        .groupBy(  # streaming session windows need a grouping key
            F.col("table"), F.session_window("commit_ts", "2 minutes").alias("s")
        )
        .agg(F.count("*").alias("n"))
        .select(F.col("s.start").alias("start"), "n")
    )
    q = (
        agg.writeStream.format("memory").queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "ckpt" / "q"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = [(r["start"].strftime("%H:%M"), r["n"])
            for r in spark.sql("select * from sess_out order by start").collect()]
    assert rows == [("00:00", 2), ("00:10", 1)]


def test_streaming_dedup_suppresses_redelivery(spark, tmp_path):
    """At-least-once redelivery (same changeset appearing twice in the
    log — a replayed segment) collapses to exactly-once with watermarked
    dropDuplicates on (lsn, xid); the watermark bounds the dedup state,
    which is what keeps it viable at 100 TB."""
    src = tmp_path / "wal"; src.mkdir()
    line = _cs(1, "0/100", "2026-08-13 00:00:01.000000+00", vid=1)
    _write(src, "000.jsonl", [line], 0)
    _write(src, "001.jsonl", [line,  # exact redelivery
                              _cs(2, "0/200", "2026-08-13 00:00:02.000000+00", vid=2)], 1)

    svc = LogicalReplicationService(
        spark, str(src), str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    ev = (
        svc.changes("wal2json")
        .withWatermark("commit_ts", "10 minutes")
        .dropDuplicates(["lsn", "xid"])
    )
    q = (
        ev.writeStream.format("memory").queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt" / "q"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.sql("select lsn from dedup_out").collect()
    assert sorted(r["lsn"] for r in rows) == ["0/100", "0/200"]


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Stream-stream inner join: decoded changes from two slots joined
    on key within a time bound, both sides watermarked (the state-expiry
    contract that keeps the join's state bounded at 100 TB)."""
    src_a = tmp_path / "wal_a"; src_a.mkdir()
    src_b = tmp_path / "wal_b"; src_b.mkdir()
    # stream A: orders 1, 2; stream B: payment for 1 (within the hour)
    # and for 3 (no matching order)
    _write(src_a, "000.jsonl",
           [_cs(1, "0/100", "2026-08-13 00:00:05.000000+00", table="orders", vid=1),
            _cs(2, "0/200", "2026-08-13 00:00:10.000000+00", table="orders", vid=2)], 0)
    _write(src_b, "000.jsonl",
           [_cs(7, "0/700", "2026-08-13 00:10:00.000000+00", table="pays", vid=1),
            _cs(8, "0/800", "2026-08-13 00:20:00.000000+00", table="pays", vid=3)], 0)

    svc_a = LogicalReplicationService(spark, str(src_a), str(tmp_path / "ck_a"))
    svc_b = LogicalReplicationService(spark, str(src_b), str(tmp_path / "ck_b"))
    orders = (
        svc_a.changes("wal2json")
        .select(
            F.col("after").getItem("id").cast("long").alias("order_id"),
            F.col("commit_ts").alias("order_ts"),
        )
        .withWatermark("order_ts", "1 minute")
    )
    pays = (
        svc_b.changes("wal2json")
        .select(
            F.col("after").getItem("id").cast("long").alias("pay_id"),
            F.col("commit_ts").alias("pay_ts"),
        )
        .withWatermark("pay_ts", "1 minute")
    )
    joined = orders.join(
        pays,
        (F.col("order_id") == F.col("pay_id"))
        & (F.col("pay_ts") >= F.col("order_ts"))
        & (F.col("pay_ts") <= F.col("order_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("order_id", "order_ts", "pay_ts")
    q = (
        joined.writeStream.format("memory").queryName("ss_join_out")
        .option("checkpointLocation", str(tmp_path / "ck_q"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.sql("select order_id from ss_join_out").collect()
    assert [r["order_id"] for r in rows] == [1]


def test_stream_static_broadcast_join(spark, tmp_path):
    src = tmp_path / "wal"; src.mkdir()
    with open(src / "000.jsonl", "w") as f:
        f.write(_cs(1, "0/100", "2026-08-13 00:00:01.000000+00", vid=1) + "\n")
        f.write(_cs(2, "0/200", "2026-08-13 00:00:02.000000+00", vid=2) + "\n")

    dim = spark.createDataFrame([(1, "gold"), (2, "silver")], "id long, tier string")
    svc = LogicalReplicationService(spark, str(src), str(tmp_path / "ckpt"))
    ev = svc.changes("wal2json").withColumn(
        "id", F.col("after").getItem("id").cast("long")
    )
    joined = ev.join(F.broadcast(dim), "id", "left").select("id", "tier", "lsn_long")
    q = (
        joined.writeStream.format("memory").queryName("dim_out")
        .option("checkpointLocation", str(tmp_path / "ckpt" / "q"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {(r["id"], r["tier"]) for r in spark.sql("select * from dim_out").collect()}
    assert got == {(1, "gold"), (2, "silver")}
