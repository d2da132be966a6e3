"""Stateful streaming transaction assembly: commit-gated emission across
micro-batch boundaries (≙ the reference's framing guarantee,
decoder-pgoutput.spec.ts:260-274 rollback invisibility) for streams
whose rows carry xid (pgoutput protoVersion>=2 in-progress streaming)."""

import json
import os

from pg_logical_replication_spark.streaming.stateful import (
    assemble_transactions_stream,
)

EVENT_SCHEMA = (
    "op string, lsn string, lsn_long long, seq long, xid long, "
    "commit_ts string, schema string, table string, "
    "key map<string,string>, before map<string,string>, "
    "after map<string,string>"
)


def _ev(op, lsn_long, seq, xid, table=None, after=None, commit_ts=None):
    return {
        "op": op, "lsn": f"0/{lsn_long:X}", "lsn_long": lsn_long, "seq": seq,
        "xid": xid, "commit_ts": commit_ts, "schema": "public", "table": table,
        "key": None, "before": None, "after": after,
    }


def test_cross_batch_assembly_and_rollback_invisibility(spark, tmp_path):
    src = tmp_path / "src"; src.mkdir()
    # txn 1 spans two micro-batches; txn 2 never commits
    batch1 = [
        _ev("begin", 0x100, 0, 1),
        _ev("insert", 0x101, 1, 1, "users", {"id": "1", "v": "a"}),
        _ev("insert", 0x102, 2, 1, "users", {"id": "2", "v": "b"}),
    ]
    batch2 = [
        _ev("insert", 0x103, 3, 1, "users", {"id": "3", "v": "c"}),
        _ev("commit", 0x104, 4, 1, commit_ts="2026-08-13 00:00:05.000000"),
        _ev("begin", 0x200, 5, 2),
        _ev("insert", 0x201, 6, 2, "users", {"id": "9", "v": "never"}),
    ]
    for i, batch in enumerate([batch1, batch2]):
        with open(src / f"{i:03d}.jsonl", "w") as f:
            for e in batch:
                f.write(json.dumps(e) + "\n")

    raw = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("commit_ts", __import__("pyspark").sql.functions.to_timestamp("commit_ts"))
    )
    out = assemble_transactions_stream(raw)
    q = (
        out.writeStream.format("memory")
        .queryName("txn_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from txn_out order by lsn_long").collect()

    # only txn 1's three inserts, in wire order, commit_ts stamped
    assert [r["after"]["v"] for r in rows] == ["a", "b", "c"]
    assert all(r["xid"] == 1 for r in rows)
    assert all(r["commit_ts"] is not None for r in rows)
    assert all(r["commit_ts"].second == 5 for r in rows)
    # txn 2 (no commit) is withheld — rollback invisibility
    assert all(r["after"]["v"] != "never" for r in rows)


def test_single_batch_multi_txn(spark, tmp_path):
    src = tmp_path / "src"; src.mkdir()
    evs = [
        _ev("begin", 0x10, 0, 7),
        _ev("insert", 0x11, 1, 7, "t", {"k": "x"}),
        _ev("commit", 0x12, 2, 7, commit_ts="2026-08-13 00:00:01.000000"),
        _ev("begin", 0x20, 3, 8),
        _ev("delete", 0x21, 4, 8, "t"),
        _ev("commit", 0x22, 5, 8, commit_ts="2026-08-13 00:00:02.000000"),
    ]
    with open(src / "000.jsonl", "w") as f:
        for e in evs:
            f.write(json.dumps(e) + "\n")
    from pyspark.sql import functions as F

    raw = (
        spark.readStream.schema(EVENT_SCHEMA).json(str(src))
        .withColumn("commit_ts", F.to_timestamp("commit_ts"))
    )
    out = assemble_transactions_stream(raw)
    q = (
        out.writeStream.format("memory").queryName("txn_out2")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from txn_out2 order by lsn_long").collect()
    assert [(r["op"], r["xid"]) for r in rows] == [("insert", 7), ("delete", 8)]
    assert os.path.exists(str(tmp_path / "ckpt"))


def test_toast_fill_stream_across_micro_batches(spark, tmp_path):
    """Unchanged-TOAST columns fill from a prior image that committed in
    an EARLIER micro-batch; explicit NULLs overwrite the image and are
    never resurrected (batch operator's contract, now cross-batch)."""
    import time as _time

    from pyspark.sql import functions as F

    from pg_logical_replication_spark.streaming.stateful import toast_fill_stream

    schema = EVENT_SCHEMA + ", meta map<string,string>"
    src = tmp_path / "src"; src.mkdir()
    batches = [
        [dict(_ev("insert", 0x100, 0, 1, "users",
                  {"id": "1", "doc": "BIGDOC", "v": "a"}), meta=None)],
        # TOASTed doc unchanged → marker, no value on the wire
        [dict(_ev("update", 0x200, 1, 1, "users",
                  {"id": "1", "doc": None, "v": "b"}),
              meta={"unchanged_toast": "doc"})],
        # explicit SQL NULL (no marker) must stick...
        [dict(_ev("update", 0x300, 2, 1, "users",
                  {"id": "1", "doc": None, "v": "c"}), meta=None)],
        # ...even against a later unchanged-TOAST marker
        [dict(_ev("update", 0x400, 3, 1, "users",
                  {"id": "1", "doc": None, "v": "d"}),
              meta={"unchanged_toast": "doc"})],
    ]
    base = _time.time() - 10_000
    for i, batch in enumerate(batches):
        p = src / f"{i:03d}.jsonl"
        with open(p, "w") as f:
            for e in batch:
                f.write(json.dumps(e) + "\n")
        os.utime(p, (base + i * 10, base + i * 10))

    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("commit_ts", F.to_timestamp("commit_ts"))
    )
    out = toast_fill_stream(raw, key_columns=["id"])
    q = (
        out.writeStream.format("memory").queryName("toast_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = {r["seq"]: dict(r["after"]) for r in spark.sql("select * from toast_out").collect()}
    assert rows[0]["doc"] == "BIGDOC"
    assert rows[1] == {"id": "1", "doc": "BIGDOC", "v": "b"}   # cross-batch fill
    assert rows[2]["doc"] is None                              # explicit NULL
    assert rows[3]["doc"] is None                              # NULL not resurrected


def test_streamed_txn_gate_across_micro_batches(spark, tmp_path):
    """Protocol-v2 streamed changes buffer until their fate arrives in a
    LATER micro-batch: commit flushes (minus aborted subxacts) with
    commit_ts + top xid stamped; top-level abort drops everything;
    non-streamed rows pass through."""
    import pyspark.sql.functions as F

    from pg_logical_replication_spark.streaming.stateful import (
        resolve_streamed_stream,
    )

    schema = EVENT_SCHEMA + ", meta map<string,string>"

    def sev(op, lsn_long, seq, xid, top=None, sub=None, after=None, commit_ts=None):
        e = _ev(op, lsn_long, seq, xid, "users" if after else None, after, commit_ts)
        meta = {}
        if top is not None:
            meta["stream_top_xid"] = str(top)
        if sub is not None:
            meta["subxid"] = str(sub)
        e["meta"] = meta or None
        return e

    batch1 = [
        # txn 100: two rows, one under subxact 101
        sev("insert", 0x101, 1, 100, top=100, after={"id": "1", "v": "keep"}),
        sev("insert", 0x102, 2, 101, top=100, after={"id": "2", "v": "subdrop"}),
        # txn 200: will top-abort
        sev("insert", 0x201, 3, 200, top=200, after={"id": "9", "v": "topdrop"}),
        # plain v1 row passes through untouched
        sev("insert", 0x301, 4, 300, after={"id": "5", "v": "plain"}),
    ]
    batch2 = [
        sev("stream_abort", 0x110, 5, 100, sub=101),
        sev("stream_commit", 0x111, 6, 100, commit_ts="2026-08-13 00:00:07.000000"),
        sev("stream_abort", 0x210, 7, 200, sub=200),  # top-level abort
    ]
    src = tmp_path / "src"; src.mkdir()
    for i, batch in enumerate([batch1, batch2]):
        with open(src / f"{i:03d}.jsonl", "w") as f:
            for e in batch:
                f.write(json.dumps(e) + "\n")

    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("commit_ts", F.to_timestamp("commit_ts"))
    )
    out = resolve_streamed_stream(raw)
    q = (
        out.writeStream.format("memory").queryName("stream_gate")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from stream_gate order by lsn_long").collect()
    vs = [r["after"]["v"] for r in rows]
    assert "keep" in vs and "plain" in vs
    assert "subdrop" not in vs and "topdrop" not in vs
    kept = next(r for r in rows if r["after"]["v"] == "keep")
    assert kept["xid"] == 100 and kept["commit_ts"].second == 7


def test_streamed_two_phase_gate_across_micro_batches(spark, tmp_path):
    """Streamed 2PC: segments buffer through stream_prepare; the later
    commit_prepared flushes, rollback_prepared drops."""
    import pyspark.sql.functions as F

    from pg_logical_replication_spark.streaming.stateful import (
        resolve_streamed_stream,
    )

    schema = EVENT_SCHEMA + ", meta map<string,string>"

    def sev(op, lsn_long, seq, xid, top=None, after=None, commit_ts=None):
        e = _ev(op, lsn_long, seq, xid, "users" if after else None, after, commit_ts)
        e["meta"] = {"stream_top_xid": str(top)} if top is not None else None
        return e

    batch1 = [
        sev("insert", 0x401, 1, 400, top=400, after={"id": "1", "v": "kept2pc"}),
        sev("stream_prepare", 0x402, 2, 400),
        sev("insert", 0x501, 3, 500, top=500, after={"id": "2", "v": "rolled2pc"}),
        sev("stream_prepare", 0x502, 4, 500),
    ]
    batch2 = [
        sev("commit_prepared", 0x410, 5, 400,
            commit_ts="2026-08-13 00:00:09.000000"),
        sev("rollback_prepared", 0x510, 6, 500),
    ]
    src = tmp_path / "src"; src.mkdir()
    for i, batch in enumerate([batch1, batch2]):
        with open(src / f"{i:03d}.jsonl", "w") as f:
            for e in batch:
                f.write(json.dumps(e) + "\n")

    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("commit_ts", F.to_timestamp("commit_ts"))
    )
    q = (
        resolve_streamed_stream(raw)
        .writeStream.format("memory").queryName("gate_2pc")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from gate_2pc").collect()
    vs = [r["after"]["v"] for r in rows]
    assert vs == ["kept2pc"]
    assert rows[0]["xid"] == 400 and rows[0]["commit_ts"].second == 9


def test_plain_two_phase_fates_pass_through_stream_gate(spark, tmp_path):
    """ADVICE r1: commit_prepared/rollback_prepared fates for NON-
    streamed 2PC txns (no streamed state under their xid) must not
    vanish into the stateful gate — they re-emit for a downstream
    prepared-frame resolver, alongside the passthrough b..P changes."""
    import pyspark.sql.functions as F

    from pg_logical_replication_spark.streaming.stateful import (
        resolve_streamed_stream,
    )

    schema = EVENT_SCHEMA + ", meta map<string,string>"

    def sev(op, lsn_long, seq, xid, top=None, after=None, commit_ts=None):
        e = _ev(op, lsn_long, seq, xid, "users" if after else None, after, commit_ts)
        e["meta"] = {"stream_top_xid": str(top)} if top is not None else None
        return e

    batch1 = [
        # plain 2PC txn 700: b..P changes take the passthrough branch
        sev("begin_prepare", 0x700, 0, 700),
        sev("insert", 0x701, 1, 700, after={"id": "1", "v": "plain2pc"}),
        sev("prepare", 0x702, 2, 700),
        # streamed txn 800 for contrast
        sev("insert", 0x801, 3, 800, top=800, after={"id": "2", "v": "streamed"}),
    ]
    batch2 = [
        sev("commit_prepared", 0x710, 4, 700,
            commit_ts="2026-08-13 00:00:11.000000"),
        sev("stream_commit", 0x810, 5, 800,
            commit_ts="2026-08-13 00:00:12.000000"),
    ]
    src = tmp_path / "src"; src.mkdir()
    for i, batch in enumerate([batch1, batch2]):
        with open(src / f"{i:03d}.jsonl", "w") as f:
            for e in batch:
                f.write(json.dumps(e) + "\n")

    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("commit_ts", F.to_timestamp("commit_ts"))
    )
    out = resolve_streamed_stream(raw)
    q = (
        out.writeStream.format("memory").queryName("plain_2pc_gate")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from plain_2pc_gate order by lsn_long").collect()
    ops = [r["op"] for r in rows]
    # the plain fate re-emitted, not swallowed
    assert "commit_prepared" in ops
    fate = next(r for r in rows if r["op"] == "commit_prepared")
    assert fate["xid"] == 700 and fate["commit_ts"] is not None
    # its b..P changes passed through ungated (downstream gate's job)
    assert any(r["op"] == "insert" and r["after"]["v"] == "plain2pc" for r in rows)
    # the genuinely streamed txn still gates normally
    streamed = next(r for r in rows if r["op"] == "insert" and r["after"]["v"] == "streamed")
    assert streamed["xid"] == 800 and streamed["commit_ts"] is not None
    # stream control fate consumed
    assert "stream_commit" not in ops


def test_resolve_transactions_stream_mixed_shapes(spark, tmp_path):
    """One stateful gate for a mixed stream: a streamed txn, a plain 2PC
    txn (decode-stamped prepared_xid) that commits, one that rolls
    back, and v1 passthrough — all gated in a single query (Spark
    allows one arbitrary-stateful op per streaming query)."""
    import pyspark.sql.functions as F

    from pg_logical_replication_spark.streaming.stateful import (
        resolve_transactions_stream,
    )

    schema = EVENT_SCHEMA + ", meta map<string,string>"

    def sev(op, lsn_long, seq, xid, top=None, prep=None, after=None,
            commit_ts=None):
        e = _ev(op, lsn_long, seq, xid, "users" if after else None, after, commit_ts)
        meta = {}
        if top is not None:
            meta["stream_top_xid"] = str(top)
        if prep is not None:
            meta["prepared_xid"] = str(prep)
        e["meta"] = meta or None
        return e

    batch1 = [
        # streamed txn 800
        sev("insert", 0x801, 1, 800, top=800, after={"id": "1", "v": "streamed"}),
        # plain 2PC txn 700 (frame markers consumed as controls)
        sev("begin_prepare", 0x700, 2, 700),
        sev("insert", 0x701, 3, None, prep=700, after={"id": "2", "v": "kept2pc"}),
        sev("prepare", 0x702, 4, 700),
        # plain 2PC txn 600 → will roll back
        sev("begin_prepare", 0x600, 5, 600),
        sev("insert", 0x601, 6, None, prep=600, after={"id": "3", "v": "rolled2pc"}),
        sev("prepare", 0x602, 7, 600),
        # plain v1 passthrough
        sev("insert", 0x301, 8, 300, after={"id": "4", "v": "plain"}),
    ]
    batch2 = [
        sev("stream_commit", 0x810, 9, 800,
            commit_ts="2026-08-13 00:00:12.000000"),
        sev("commit_prepared", 0x710, 10, 700,
            commit_ts="2026-08-13 00:00:13.000000"),
        sev("rollback_prepared", 0x610, 11, 600),
        # zero-DML prepared txn: its fate has no state — the COMBINED
        # gate must swallow it (batch resolve_transactions consumes it
        # via the frame too), not re-emit a stray fate row
        sev("commit_prepared", 0x910, 12, 900,
            commit_ts="2026-08-13 00:00:14.000000"),
    ]
    src = tmp_path / "src"; src.mkdir()
    for i, batch in enumerate([batch1, batch2]):
        with open(src / f"{i:03d}.jsonl", "w") as f:
            for e in batch:
                f.write(json.dumps(e) + "\n")

    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("commit_ts", F.to_timestamp("commit_ts"))
    )
    out = resolve_transactions_stream(raw)
    q = (
        out.writeStream.format("memory").queryName("mixed_gate")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from mixed_gate order by lsn_long").collect()
    by_v = {r["after"]["v"]: r for r in rows if r["op"] == "insert"}
    assert sorted(by_v) == ["kept2pc", "plain", "streamed"]
    assert by_v["streamed"]["xid"] == 800
    assert by_v["kept2pc"]["xid"] == 700  # stamped frame xid applied
    assert by_v["kept2pc"]["commit_ts"] is not None
    assert by_v["plain"]["xid"] == 300 and by_v["plain"]["commit_ts"] is None
    ops = {r["op"] for r in rows}
    # all controls and owned fates consumed; nothing re-emitted (every
    # fate found its buffered state)
    assert not ops & {"begin_prepare", "prepare", "stream_commit",
                      "commit_prepared", "rollback_prepared"}


def test_stream_gate_state_survives_query_restart(spark, tmp_path):
    """Buffered segments must gate correctly when the fate arrives after
    a full query STOP + RESTART on the same checkpoint (state-store
    persistence), not merely in a later micro-batch of one run."""
    import pyspark.sql.functions as F

    from pg_logical_replication_spark.streaming.stateful import (
        resolve_transactions_stream,
    )

    schema = EVENT_SCHEMA + ", meta map<string,string>"

    def sev(op, lsn_long, seq, xid, top=None, after=None, commit_ts=None):
        e = _ev(op, lsn_long, seq, xid, "users" if after else None, after, commit_ts)
        e["meta"] = {"stream_top_xid": str(top)} if top is not None else None
        return e

    src = tmp_path / "src"; src.mkdir()

    out_dir = str(tmp_path / "out")

    def run_once():
        raw = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
            .withColumn("commit_ts", F.to_timestamp("commit_ts"))
        )
        # memory sink can't recover a checkpoint; parquet sink can
        q = (
            resolve_transactions_stream(raw)
            .writeStream.format("parquet").option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()

    # run 1: segments only — nothing may emit
    with open(src / "000.jsonl", "w") as f:
        f.write(json.dumps(
            sev("insert", 0x101, 1, 100, top=100, after={"id": "1", "v": "kept"})
        ) + "\n")
        f.write(json.dumps(
            sev("insert", 0x201, 2, 200, top=200, after={"id": "2", "v": "dropped"})
        ) + "\n")
    run_once()
    assert spark.read.parquet(out_dir).count() == 0

    # run 2 (fresh query, same checkpoint): fates arrive
    with open(src / "001.jsonl", "w") as f:
        f.write(json.dumps(
            sev("stream_commit", 0x110, 3, 100,
                commit_ts="2026-08-13 00:00:21.000000")
        ) + "\n")
        f.write(json.dumps(sev("stream_abort", 0x210, 4, 200)) + "\n")
    run_once()
    rows = spark.read.parquet(out_dir).collect()
    vs = [r["after"]["v"] for r in rows if r["op"] == "insert"]
    assert vs == ["kept"]
    assert rows[0]["xid"] == 100 and rows[0]["commit_ts"] is not None


def test_pack_sequences_stream_agrees_with_batch(spark, tmp_path):
    """Streaming packing across TWO micro-batches (doc_id arrival
    order) must equal the batch pack of the same corpus — including a
    bin left half-open at the batch boundary being continued, not
    restarted."""
    import json
    import os

    from pg_logical_replication_spark.operators.packing import pack_sequences
    from pg_logical_replication_spark.streaming.packing import (
        pack_sequences_stream,
    )

    rows = [(i, " ".join(["w"] * (3 + i % 5))) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    want = {
        r["doc_id"]: (r["bin_id"], r["bin_seq"])
        for r in pack_sequences(docs, budget=16, bucket_size=20).collect()
    }

    d = str(tmp_path / "docs")
    os.makedirs(d)
    # two batches split MID-bucket so open bins must carry across
    for bname, chunk in (("b0.jsonl", rows[:25]), ("b1.jsonl", rows[25:])):
        with open(os.path.join(d, bname), "w") as f:
            for rid, text in chunk:
                f.write(json.dumps({"doc_id": rid, "text": text}) + "\n")
        ts = 1_700_000_000 + (0 if bname == "b0.jsonl" else 100)
        os.utime(os.path.join(d, bname), (ts, ts))

    got = {}
    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).json(d)
    q = (
        pack_sequences_stream(stream, budget=16, bucket_size=20)
        .writeStream.foreachBatch(
            lambda df, _b: got.update(
                {r["doc_id"]: (r["bin_id"], r["bin_seq"]) for r in df.collect()}
            )
        )
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert got == want


def test_cusum_stream_alarms_on_level_shift(spark, tmp_path):
    """Streaming CUSUM: an in-control first micro-batch raises no
    alarm; a level-shifted second batch trips the HIGH chart with the
    cumulative sum carried across the batch boundary; the chart resets
    after the alarm."""
    import json
    import os

    from pg_logical_replication_spark.streaming.monitor import cusum_stream

    d = str(tmp_path / "vals")
    os.makedirs(d)

    def write(name, rows, ts):
        with open(os.path.join(d, name), "w") as f:
            for o, v in rows:
                f.write(json.dumps({"key": "m", "ord": o, "value": v}) + "\n")
        os.utime(os.path.join(d, name), (ts, ts))

    # mean_ref=10, k=1, h=12: in-control batch (values 9..11) never
    # accumulates; the shifted batch (value 15 -> +4/step) alarms on
    # the 3rd shifted point (4+4+4 = 12 >= h)
    write("b0.jsonl", [(i, 10 + (i % 3) - 1) for i in range(6)], 1_700_000_000)
    write("b1.jsonl", [(10 + i, 15) for i in range(4)], 1_700_000_100)

    got = []
    stream = spark.readStream.schema(
        "key string, ord long, value long"
    ).option("maxFilesPerTrigger", 1).json(d)
    q = (
        cusum_stream(stream, mean_ref=10, k=1, h=12)
        .writeStream.foreachBatch(lambda df, _b: got.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert len(got) == 1, got
    a = got[0]
    assert (a["direction"], a["ord"], a["s_hi"]) == ("high", 12, 12)
