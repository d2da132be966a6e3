"""transformWithStateInPandas txn assembly (Spark 4 ListState path).

Same scenarios as test_stateful_streaming's assembly tests, plus an
agreement check against the applyInPandasWithState implementation.
"""

import json

import pytest  # noqa: F401

# no protobuf skip: pg_logical_replication_spark appends the vendored
# mini-protobuf runtime (_vendor/pbshim) when google.protobuf is absent,
# so the transformWithState path runs everywhere

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


@pytest.fixture()
def rocksdb(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    yield spark
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


def test_tws_cross_batch_assembly_and_rollback_invisibility(rocksdb, tmp_path):
    import pyspark.sql.functions as F

    from pg_logical_replication_spark.streaming.tws import (
        assemble_transactions_tws,
    )

    spark = rocksdb
    src = tmp_path / "src"; src.mkdir()
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
        .withColumn("commit_ts", F.to_timestamp("commit_ts"))
    )
    out = assemble_transactions_tws(raw)
    q = (
        out.writeStream.format("memory").queryName("tws_asm")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from tws_asm order by lsn_long").collect()
    # txn 1 committed: all three rows, wire order, stamped
    assert [r["after"]["v"] for r in rows] == ["a", "b", "c"]
    assert all(r["xid"] == 1 and r["commit_ts"] is not None for r in rows)
    # txn 2 never committed: invisible
    assert not any(r["after"]["v"] == "never" for r in rows)


def test_tws_agrees_with_apply_in_pandas_with_state(rocksdb, tmp_path):
    """Both stateful backends produce the identical committed stream."""
    import pyspark.sql.functions as F

    from pg_logical_replication_spark.streaming.stateful import (
        assemble_transactions_stream,
    )
    from pg_logical_replication_spark.streaming.tws import (
        assemble_transactions_tws,
    )

    spark = rocksdb
    src = tmp_path / "src"; src.mkdir()
    batches = [
        [
            _ev("begin", 0x100, 0, 1),
            _ev("insert", 0x101, 1, 1, "users", {"id": "1", "v": "a"}),
            _ev("begin", 0x300, 2, 3),
            _ev("update", 0x301, 3, 3, "users", {"id": "7", "v": "x"}),
        ],
        [
            _ev("commit", 0x310, 4, 3, commit_ts="2026-08-13 00:00:06.000000"),
            _ev("delete", 0x102, 5, 1, "users", {"id": "1"}),
            _ev("commit", 0x110, 6, 1, commit_ts="2026-08-13 00:00:07.000000"),
        ],
    ]
    for i, batch in enumerate(batches):
        with open(src / f"{i:03d}.jsonl", "w") as f:
            for e in batch:
                f.write(json.dumps(e) + "\n")

    def run(op, name, ckpt):
        raw = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
            .withColumn("commit_ts", F.to_timestamp("commit_ts"))
        )
        q = (
            op(raw).writeStream.format("memory").queryName(name)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        return [
            tuple(r)
            for r in spark.sql(
                f"select op, lsn_long, seq, xid, commit_ts, after from {name} "
                "order by xid, lsn_long"
            ).collect()
        ]

    a = run(assemble_transactions_tws, "tws_cmp_a", "ckpt_a")
    b = run(assemble_transactions_stream, "tws_cmp_b", "ckpt_b")
    assert a == b
    assert len(a) == 3
