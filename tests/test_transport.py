"""WAL transport seam (sources/transport.py) + the pg_cdc frames mode:
appends become visible batches, keepalive shouldRespond is answered with
a ping, and commit acknowledges with the +1/32-bit-carry rule
(reference logical-replication-service.ts:165-171, :254-300)."""

import os
import socket
import struct
import threading

import pytest

from pg_logical_replication_spark.model import lsn_to_long
from pg_logical_replication_spark.sources.transport import (
    FrameLogTailTransport,
    SocketFrameTransport,
    parse_standby_status,
    standby_status_frame,
    write_frame,
)


def _xlog(wal_start, payload=b"p", ts=0):
    return b"w" + struct.pack(">QQQ", wal_start, wal_start + 8, ts) + payload


def _keepalive(wal_end, should_respond=False, ts=0):
    return (
        b"k"
        + struct.pack(">QQ", wal_end, ts)
        + (b"\x01" if should_respond else b"\x00")
    )


# ------------------------------------------------------- status frames
def test_standby_status_frame_plus_one_carry():
    s = parse_standby_status(standby_status_frame("0/16B3E00", now_us=0))
    assert s["written"] == s["flushed"] == s["applied"] == 0x16B3E01
    assert s["ping"] is False
    # 32-bit carry: lower word 0xFFFFFFFF rolls into the upper word
    s2 = parse_standby_status(standby_status_frame("1/FFFFFFFF", ping=True))
    assert s2["written"] == (2 << 32)
    assert s2["ping"] is True


def test_standby_status_roundtrip_timestamp():
    s = parse_standby_status(
        standby_status_frame("0/10", now_us=1_700_000_000_000_000)
    )
    assert s["ts_us"] == 1_700_000_000_000_000


# --------------------------------------------------- frame-log tailing
def test_tail_transport_incremental_appends(tmp_path):
    d = str(tmp_path / "frames")
    os.makedirs(d)
    seg = os.path.join(d, "000001.seg")
    t = FrameLogTailTransport(d)
    assert t.poll() == []

    with open(seg, "ab") as f:
        write_frame(f, _xlog(0x10))
        write_frame(f, _xlog(0x18))
    assert [fr[:1] for fr in t.poll()] == [b"w", b"w"]
    # same segment grows → only the NEW frame arrives (incremental offset)
    with open(seg, "ab") as f:
        write_frame(f, _keepalive(0x20))
    out = t.poll()
    assert len(out) == 1 and out[0][:1] == b"k"

    # partial frame (writer mid-append) is not surfaced...
    with open(seg, "ab") as f:
        f.write(struct.pack(">I", 30) + b"w123")  # 30 declared, 4 present
    assert t.poll() == []
    # ...until completed
    with open(seg, "ab") as f:
        f.write(b"x" * 26)
    assert len(t.poll()) == 1


def test_tail_transport_crosses_segments_and_resumes(tmp_path):
    d = str(tmp_path / "frames")
    os.makedirs(d)
    for i, n in enumerate(["000001.seg", "000002.seg"]):
        with open(os.path.join(d, n), "ab") as f:
            write_frame(f, _xlog(0x10 + 8 * i))
    t = FrameLogTailTransport(d)
    assert len(t.poll()) == 2
    pos = t.position()
    assert pos["seg"] == "000002.seg"

    # a NEW transport from the checkpointed position sees only new data
    with open(os.path.join(d, "000002.seg"), "ab") as f:
        write_frame(f, _xlog(0x20))
    t2 = FrameLogTailTransport(d, position=pos)
    assert len(t2.poll()) == 1

    # max_frames bounds the drain and the cursor stays consistent
    with open(os.path.join(d, "000003.seg"), "ab") as f:
        write_frame(f, _xlog(0x28))
        write_frame(f, _xlog(0x30))
    t3 = FrameLogTailTransport(d, position=t2.position())
    assert len(t3.poll(max_frames=1)) == 1
    assert len(t3.poll()) == 1


def test_tail_transport_status_audit(tmp_path):
    d = str(tmp_path / "frames")
    t = FrameLogTailTransport(d)
    t.send_standby_status("0/100", ping=True)
    t.send_standby_status("0/200")
    sent = t.sent_statuses()
    assert [s["flushed"] for s in sent] == [0x101, 0x201]
    assert [s["ping"] for s in sent] == [True, False]
    # the status log must never be mistaken for a segment
    assert t.poll() == []


# ------------------------------------------------------ socket transport
def test_socket_transport_frames_and_status_roundtrip():
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    received = {}

    def server():
        conn, _ = srv.accept()
        with conn:
            for fr in (_xlog(0x10), _keepalive(0x18, should_respond=True)):
                conn.sendall(struct.pack(">I", len(fr)) + fr)
            # read back one status frame
            hdr = b""
            while len(hdr) < 4:
                hdr += conn.recv(4 - len(hdr))
            (ln,) = struct.unpack(">I", hdr)
            body = b""
            while len(body) < ln:
                body += conn.recv(ln - len(body))
            received["status"] = parse_standby_status(body)

    th = threading.Thread(target=server, daemon=True)
    th.start()
    t = SocketFrameTransport("127.0.0.1", port)
    frames = []
    for _ in range(200):
        frames.extend(t.poll())
        if len(frames) >= 2:
            break
        import time

        time.sleep(0.01)
    assert [f[:1] for f in frames] == [b"w", b"k"]
    t.send_standby_status("0/18", ping=True)
    th.join(timeout=5)
    t.close()
    srv.close()
    assert received["status"]["flushed"] == 0x19
    assert received["status"]["ping"] is True


# ---------------------------------------------- pg_cdc frames stream mode
def test_frames_stream_end_to_end(spark, tmp_path):
    """Appends become visible micro-batches WITHOUT file rotation;
    shouldRespond keepalive answered with a ping during read; commit
    acknowledges with +1/carry once Spark durably advances (ack lags one
    batch — the checkpoint-commit cadence); frames demux downstream."""
    import time

    from pg_logical_replication_spark.sources.datasource import register
    from pg_logical_replication_spark.sources.wire import demux_copy_stream

    register(spark)
    d = str(tmp_path / "frames")
    os.makedirs(d)
    cp = str(tmp_path / "cp")
    seg = os.path.join(d, "000001.seg")

    with open(seg, "ab") as f:
        write_frame(f, _xlog(0x1000, b"payload-1"))
        write_frame(f, _keepalive(0x1008, should_respond=True))

    got = []
    q = (
        spark.readStream.format("pg_cdc")
        .option("path", d)
        .option("transport", "frames")
        .load()
        .writeStream.foreachBatch(lambda df, _b: got.extend(df.collect()))
        .option("checkpointLocation", cp)
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 30
        while len(got) < 2 and time.time() < deadline:
            time.sleep(0.1)
        assert len(got) == 2, got
        assert got[0]["lsn"] == "00000000/00001000"

        # append to the SAME segment → the new frame arrives incrementally
        with open(seg, "ab") as f:
            write_frame(f, _xlog(0x1010, b"payload-2"))
        while len(got) < 3 and time.time() < deadline:
            time.sleep(0.1)
        assert len(got) == 3
        assert got[2]["lsn"] == "00000000/00001010"

        # ping: answered during read at the keepalive walEnd (+1)
        # ack: the first batch's commit lands once a later batch advances
        def statuses():
            return FrameLogTailTransport(d).sent_statuses()

        while time.time() < deadline:
            sent = statuses()
            if any(s["ping"] for s in sent) and any(
                not s["ping"] for s in sent
            ):
                break
            time.sleep(0.1)
        sent = statuses()
        pings = [s for s in sent if s["ping"]]
        acks = [s for s in sent if not s["ping"]]
        assert pings and pings[0]["flushed"] == 0x1009
        assert acks and acks[0]["flushed"] == 0x1009
    finally:
        q.stop()

    # the delivered frames demux downstream, no custom parsing needed
    raw = spark.createDataFrame(
        [(r["lsn"], r["seq"], r["value"], r["data"]) for r in got],
        "lsn string, seq long, value string, data binary",
    )
    dm = demux_copy_stream(raw).collect()
    assert sorted(r["msg_type"] for r in dm) == ["k", "w", "w"]
    ws = [r for r in dm if r["msg_type"] == "w"]
    assert {bytes(r["payload"]) for r in ws} == {b"payload-1", b"payload-2"}
