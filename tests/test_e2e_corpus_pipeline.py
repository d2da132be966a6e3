"""End-to-end composition: CDC half feeding the corpus-curation half.

A wal2json change log streams through LogicalReplicationService into a
MergeOnReadTable; the materialized documents snapshot (post updates and
deletes) then runs the training-data operators — exact dedup, PII scrub,
repetition — proving the two halves compose on one engine.
"""

import json

from pg_logical_replication_spark.operators.dedup import exact_dedup
from pg_logical_replication_spark.operators.text import pii_scrub
from pg_logical_replication_spark.streaming.apply import MergeOnReadTable
from pg_logical_replication_spark.streaming.service import (
    LogicalReplicationService,
)


def _change(kind, doc_id, text=None, lsn=None):
    cols = {
        "kind": kind, "schema": "public", "table": "documents",
        "columnnames": ["doc_id", "text"], "columntypes": ["bigint", "text"],
        "columnvalues": [doc_id, text],
    }
    if kind != "insert":
        cols["oldkeys"] = {
            "keynames": ["doc_id"], "keytypes": ["bigint"],
            "keyvalues": [doc_id],
        }
        if kind == "delete":
            del cols["columnvalues"], cols["columnnames"], cols["columntypes"]
    return {"change": [cols], "nextlsn": lsn}


def test_cdc_snapshot_feeds_corpus_operators(spark, tmp_path):
    log = tmp_path / "log"; log.mkdir()
    msgs = [
        _change("insert", 1, "contact me at bob@example.com today", "0/10"),
        _change("insert", 2, "dup dup dup body", "0/20"),
        _change("insert", 3, "dup dup dup body", "0/30"),       # exact dup of 2
        _change("insert", 4, "will be deleted", "0/40"),
        _change("update", 2, "dup dup dup body v2", "0/50"),    # un-dups itself
        _change("delete", 4, None, "0/60"),
        _change("insert", 5, "dup dup dup body", "0/70"),       # dup of 3
    ]
    with open(log / "000.jsonl", "w") as f:
        for m in msgs:
            f.write(json.dumps(m) + "\n")

    svc = LogicalReplicationService(spark, str(log), str(tmp_path / "ckpt"))
    tbl = MergeOnReadTable(
        spark, str(tmp_path / "tbl"), key_columns=["doc_id"], table="documents"
    )
    svc.subscribe_and_wait("wal2json", "slot_e2e", tbl.writer())

    snap = tbl.snapshot_columns({"doc_id": "bigint", "text": "text"})
    docs = {r["doc_id"]: r["text"] for r in snap.collect()}
    assert set(docs) == {1, 2, 3, 5}           # 4 deleted
    assert docs[2].endswith("v2")              # update applied

    # corpus ops run straight on the snapshot
    dups = exact_dedup(snap).filter("n_dups > 1").collect()
    assert len(dups) == 1
    assert dups[0]["representative_id"] == 3 and dups[0]["n_dups"] == 2

    pii = {r["doc_id"]: r for r in pii_scrub(snap).collect()}
    assert pii[1]["n_email"] == 1
    assert pii[1]["n_chars_scrubbed"] != pii[1]["n_chars_raw"]
    assert all(pii[i]["n_email"] == 0 for i in (2, 3, 5))
