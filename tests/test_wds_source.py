"""WebDataset shard source (sources/wds.py) — export→import identity
through REAL tar files on disk, batch and streaming."""

import os

from pyspark.sql import functions as F


def _write_shards(spark, tmp_path, n_docs=30, docs_per_shard=10):
    from pg_logical_replication_spark.operators.multimodal import (
        pack_tar_shards,
    )

    docs = spark.createDataFrame(
        [(i, f"document number {i} body text") for i in range(n_docs)],
        "doc_id long, text string",
    )
    d = str(tmp_path / "shards")
    os.makedirs(d, exist_ok=True)
    for r in pack_tar_shards(docs, docs_per_shard=docs_per_shard).collect():
        with open(os.path.join(d, f"shard-{r['shard_id']:06d}.tar"), "wb") as f:
            f.write(bytes(r["payload"]))
    return docs, d


def test_batch_read_roundtrips_export(spark, tmp_path):
    from pg_logical_replication_spark.sources.wds import register

    docs, d = _write_shards(spark, tmp_path)
    register(spark)
    back = spark.read.format("wds").option("path", d).load()
    # one partition per shard — the WebDataset parallelism unit
    assert back.rdd.getNumPartitions() == 3
    rows = back.collect()
    assert len(rows) == 30
    assert {r["ext"] for r in rows} == {"txt"}
    got = {
        int(r["key"]): bytes(r["payload"]).decode() for r in rows
    }
    want = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert got == want
    # shard/member naming follows the convention
    assert all(r["member"] == f"{int(r['key']):012d}.txt" for r in rows)


def test_stream_tails_new_shards(spark, tmp_path):
    import time

    from pg_logical_replication_spark.sources.wds import register

    _docs, d = _write_shards(spark, tmp_path, n_docs=20, docs_per_shard=10)
    register(spark)
    got = []
    q = (
        spark.readStream.format("wds")
        .option("path", d)
        .load()
        .select("shard", "key")
        .writeStream.foreachBatch(lambda df, _b: got.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 30
        while len(got) < 20 and time.time() < deadline:
            time.sleep(0.1)
        assert len(got) == 20

        # a NEW shard landing in the directory streams in
        from pg_logical_replication_spark.operators.multimodal import (
            pack_tar_shards,
        )

        extra = spark.createDataFrame(
            [(100 + i, f"late doc {i}") for i in range(5)],
            "doc_id long, text string",
        )
        for r in pack_tar_shards(extra, docs_per_shard=10).collect():
            with open(
                os.path.join(d, f"shard-{r['shard_id']:06d}.tar"), "wb"
            ) as f:
                f.write(bytes(r["payload"]))
        while len(got) < 25 and time.time() < deadline:
            time.sleep(0.1)
        assert len(got) == 25
        assert {r["shard"] for r in got[20:]} == {"shard-000010.tar"}
    finally:
        q.stop()


def test_sample_grouping_by_key(spark, tmp_path):
    """Members group back into samples with a plain groupBy(key) —
    the downstream shape for multi-extension WebDataset samples."""
    from pg_logical_replication_spark.sources.wds import register

    _docs, d = _write_shards(spark, tmp_path, n_docs=10, docs_per_shard=5)
    register(spark)
    back = spark.read.format("wds").option("path", d).load()
    per = back.groupBy("key").agg(
        F.count("*").alias("n"),
        F.sum(F.length("payload")).alias("bytes"),
    )
    rows = per.collect()
    assert len(rows) == 10 and all(r["n"] == 1 for r in rows)
