"""pg_cdc Python DataSource: batch scan, seq pushdown pruning, binary
segments, streaming offsets/resume (≙ acknowledge + replay,
reference src/test/acknowledge.spec.ts:32-76)."""

import os

import pandas as pd
import pytest

from pg_logical_replication_spark.operators.apply_changes import apply_changes
from pg_logical_replication_spark.sources import decode
from pg_logical_replication_spark.sources.datasource import register


def _w2j_line(xid: int, rid: int, v: str) -> str:
    return (
        '{"change":[{"kind":"insert","schema":"public","table":"t",'
        '"columnnames":["id","v"],"columntypes":["integer","text"],'
        f'"columnvalues":[{rid},"{v}"]}}],"nextlsn":"0/{xid * 16:X}","xid":{xid}}}'
    )


@pytest.fixture()
def w2j_log(tmp_path):
    d = tmp_path / "log"
    d.mkdir()
    (d / "seg000.jsonl").write_text(
        _w2j_line(1, 1, "a") + "\n" + _w2j_line(2, 2, "b") + "\n"
    )
    (d / "seg001.jsonl").write_text(_w2j_line(3, 3, "c") + "\n")
    return str(d)


def test_batch_read_and_decode(spark, w2j_log):
    register(spark)
    raw = spark.read.format("pg_cdc").option("path", w2j_log).load()
    assert [f.name for f in raw.schema.fields] == ["lsn", "seq", "value", "data"]
    ev = decode(raw, "wal2json")
    snap = apply_changes(
        ev, key_columns=["id"], table="t", columns={"id": "integer", "v": "text"}
    )
    assert {(r["id"], r["v"]) for r in snap.collect()} == {(1, "a"), (2, "b"), (3, "c")}


def test_seq_pushdown_prunes_files(spark, w2j_log):
    register(spark)
    raw = spark.read.format("pg_cdc").option("path", w2j_log).load()
    # seq >= 1<<32 ⇒ only seg001; the pushed band kills seg000 pre-open
    out = raw.filter(raw.seq >= (1 << 32)).collect()
    assert len(out) == 1 and '"xid":3' in out[0]["value"]
    # file-level pruning: the scan plans exactly one partition
    pruned = raw.filter(raw.seq >= (1 << 32))
    assert pruned.rdd.getNumPartitions() == 1


def test_binary_parquet_segments(spark, tmp_path):
    from pg_logical_replication_spark.sources import pgoutput_format as fmt

    d = tmp_path / "binlog"
    d.mkdir()
    rel = fmt.encode_relation(
        16385, "public", "users", [("id", 20), ("name", 25)], key_columns=["id"]
    )
    msgs = [rel] + [
        fmt.encode_insert(16385, [("t", str(i)), ("t", f"u{i}")]) for i in range(5)
    ]
    pd.DataFrame(
        {"lsn": [f"0/{16 + 8 * i:X}" for i in range(len(msgs))], "data": msgs}
    ).to_parquet(d / "seg000.parquet")

    register(spark)
    raw = spark.read.format("pg_cdc").option("path", str(d)).load()
    ev = decode(raw, "pgoutput").filter("op = 'insert'")
    rows = ev.collect()
    assert len(rows) == 5
    assert {r["after"]["name"] for r in rows} == {f"u{i}" for i in range(5)}


def test_stream_resume_is_acknowledge(spark, tmp_path, w2j_log):
    register(spark)
    cp = str(tmp_path / "cp")

    def drain(name):
        got = []
        q = (
            spark.readStream.format("pg_cdc")
            .option("path", w2j_log)
            .load()
            .writeStream.foreachBatch(
                lambda df, _bid: got.extend(df.collect())
            )
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return got

    assert len(drain("ds_b1")) == 3  # both segments

    # new segment after the committed offset → ONLY it is delivered
    with open(os.path.join(w2j_log, "seg002.jsonl"), "w") as f:
        f.write(_w2j_line(4, 4, "d") + "\n")
    out2 = drain("ds_b2")
    assert len(out2) == 1 and '"xid":4' in out2[0]["value"]

    # fresh checkpoint ≙ replay from 0/00000000: everything again
    import shutil

    shutil.rmtree(cp)
    assert len(drain("ds_b3")) == 4


def test_batch_reads_frame_segments(spark, tmp_path):
    """Archived .seg frame logs (the frames transport's durable form)
    are batch-readable: one partition per segment, frames demuxable
    downstream — the backfill-over-WAL-history path."""
    import struct

    from pg_logical_replication_spark.sources.transport import write_frame
    from pg_logical_replication_spark.sources.wire import demux_copy_stream

    d = str(tmp_path / "wal")
    os.makedirs(d)
    for si, name in enumerate(["000001.seg", "000002.seg"]):
        with open(os.path.join(d, name), "ab") as f:
            for j in range(3):
                lsn = 0x1000 * (si + 1) + 8 * j
                write_frame(
                    f,
                    b"w"
                    + struct.pack(">QQQ", lsn, lsn + 8, 0)
                    + f"payload-{si}-{j}".encode(),
                )
    register(spark)
    raw = spark.read.format("pg_cdc").option("path", d).load()
    assert raw.count() == 6
    assert raw.rdd.getNumPartitions() == 2
    dm = demux_copy_stream(raw).filter("msg_type = 'w'")
    payloads = {bytes(r["payload"]).decode() for r in dm.collect()}
    assert payloads == {f"payload-{s}-{j}" for s in range(2) for j in range(3)}
    # lsn pre-extracted from the frame header
    first = raw.orderBy("seq").first()
    assert first["lsn"] == "00000000/00001000"


def test_relations_from_frame_log_builds_registry(spark, tmp_path):
    """The operational closer for streaming resume (r4): rebuild the
    pgoutput schema registry from the archived frame log, newest 'R'
    version per oid, and decode a later segment's DML with it."""
    import struct

    from pg_logical_replication_spark.sources import pgoutput_format as pf
    from pg_logical_replication_spark.sources.pgoutput import (
        decode_pgoutput,
        relations_from_frame_log,
    )
    from pg_logical_replication_spark.sources.transport import write_frame

    d = str(tmp_path / "wal")
    os.makedirs(d)

    def frame(lsn, payload):
        return b"w" + struct.pack(">QQQ", lsn, lsn + 8, 0) + payload

    # seg1: R v1 (id only) then R v2 (id, v) — ALTER TABLE mid-stream
    with open(os.path.join(d, "000001.seg"), "ab") as f:
        write_frame(f, frame(0x10, pf.encode_relation(
            16400, "public", "t", [("id", 20)], key_columns=["id"])))
        write_frame(f, frame(0x18, pf.encode_relation(
            16400, "public", "t", [("id", 20), ("v", 25)],
            key_columns=["id"])))
    reg = relations_from_frame_log(spark, d)
    assert set(reg) == {16400}
    assert [c["name"] for c in reg[16400].columns] == ["id", "v"]  # newest

    # a later segment's DML (no R in sight) decodes fully with the
    # rebuilt registry — the exact situation the error rows point at
    raw = spark.createDataFrame(
        [("0/20", 0, pf.encode_insert(16400, [("t", "7"), ("t", "x")]))],
        "lsn string, seq long, data binary",
    )
    row = decode_pgoutput(raw, relations=reg).first()
    assert row["op"] == "insert" and row["after"] == {"id": "7", "v": "x"}
