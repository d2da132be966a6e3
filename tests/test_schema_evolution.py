"""Schema evolution through materialization (VERDICT r8 #2).

Decode-side ALTER handling existed since round 4
(``q_cdc_schema_evolution`` — versioned relation decode ≙
``pgoutput-parser.ts:86-110``); these tests pin the CONSUMER side: the
additive contract fold (operators/schema_evolution.py), apply_changes
``columns='evolve'``, and MergeOnReadTable's evolved snapshot across
real micro-batches — Debezium's schema-change-topic story, Delta's
mergeSchema rule, built on the engine's own relation rows.
"""

import os

import pytest
from pyspark.sql import functions as F

from pg_logical_replication_spark.operators.schema_evolution import (
    merge_column_contract,
    merge_type,
    stream_column_contract,
)
from pg_logical_replication_spark.sources import pgoutput_format as pgf
from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput

OID = 61001


def _wire_df(spark, rows):
    return spark.createDataFrame(
        [(f"0/{seq * 8 + 16:X}", seq, bytearray(data)) for seq, data in rows],
        "lsn string, seq long, data binary",
    )


def _evolving_rows():
    """v1 (id) inserts 0..2, ALTER adds v, v2 inserts 3..5 with v=100*id,
    then a v2 UPDATE backfills id=0."""
    rows = [(0, pgf.encode_relation(
        OID, "public", "t", [("id", 20)], key_columns=["id"]))]
    for i in range(3):
        rows.append((1 + i, pgf.encode_insert(OID, [("t", str(i))])))
    rows.append((10, pgf.encode_relation(
        OID, "public", "t", [("id", 20), ("v", 23)], key_columns=["id"])))
    for i in range(3, 6):
        rows.append((11 + i, pgf.encode_insert(
            OID, [("t", str(i)), ("t", str(i * 100))])))
    rows.append((30, pgf.encode_update(OID, [("t", "0"), ("t", "999")])))
    return rows


EXPECT = {0: 999, 1: None, 2: None, 3: 300, 4: 400, 5: 500}


# ---------------------------------------------------------- type rules
def test_merge_type_widenings():
    assert merge_type("t", "x", "smallint", "integer") == "integer"
    assert merge_type("t", "x", "integer", "bigint") == "bigint"
    assert merge_type("t", "x", "real", "double precision") == "double precision"
    assert merge_type("t", "x", "integer", "numeric") == "numeric"
    assert merge_type("t", "x", "double precision", "numeric") == "numeric"
    assert merge_type("t", "x", "bigint", "text") == "text"
    assert merge_type("t", "x", "date", "text") == "text"
    assert merge_type("t", "x", "bigint", "bigint") == "bigint"
    # same family, no rank: typmod growth
    assert (
        merge_type("t", "x", "character varying(20)", "character varying(40)")
        == "character varying(40)"
    )


@pytest.mark.parametrize(
    "old,new",
    [("bigint", "integer"), ("double precision", "real"),
     ("text", "bigint"), ("date", "integer"), ("numeric", "bigint")],
)
def test_merge_type_incompatible_raises(old, new):
    with pytest.raises(ValueError, match="incompatible type change"):
        merge_type("public.t", "c", old, new)


def test_merge_contract_drop_retained_and_order():
    out = merge_column_contract(
        [
            [("id", "bigint"), ("a", "text")],
            [("id", "bigint"), ("a", "text"), ("b", "integer")],
            [("id", "bigint"), ("b", "bigint")],  # drops a, widens b
        ]
    )
    assert list(out.items()) == [
        ("id", "bigint"), ("a", "text"), ("b", "bigint")
    ]


# ------------------------------------------------------ batch contract
def test_stream_contract_from_relation_rows(spark):
    decoded = decode_pgoutput(_wire_df(spark, _evolving_rows()))
    assert stream_column_contract(decoded, table="t") == {
        "id": "bigint", "v": "integer"
    }


def test_stream_contract_wal2json_fallback(spark):
    """No relation rows: the per-row coltypes metadata (wal2json shape)
    drives the fold — v1 rows carry (id), later rows (id, v)."""
    import json

    from pg_logical_replication_spark.sources.wal2json import decode_wal2json

    lines = []
    for i in range(2):
        lines.append(json.dumps({"nextlsn": f"0/{16 + i:X}", "change": [{
            "kind": "insert", "schema": "public", "table": "t",
            "columnnames": ["id"], "columntypes": ["bigint"],
            "columnvalues": [i]}]}))
    lines.append(json.dumps({"nextlsn": "0/100", "change": [{
        "kind": "insert", "schema": "public", "table": "t",
        "columnnames": ["id", "v"], "columntypes": ["bigint", "integer"],
        "columnvalues": [2, 200]}]}))
    raw = spark.createDataFrame([(s,) for s in lines], "value string")
    decoded = decode_wal2json(raw)
    assert stream_column_contract(decoded, table="t") == {
        "id": "bigint", "v": "integer"
    }
    snap = __import__(
        "pg_logical_replication_spark.operators.apply_changes",
        fromlist=["apply_changes"],
    ).apply_changes(decoded, key_columns=["id"], table="t", columns="evolve")
    got = {r["id"]: r["v"] for r in snap.collect()}
    assert got == {0: None, 1: None, 2: 200}


def test_stream_contracts_plural_agrees_with_singular(spark):
    """The one-pass multi-table fold (optimization r10) must return the
    same per-table contracts as table-by-table stream_column_contract —
    on both the relation-rows path and the per-row-signatures path."""
    import json

    from pg_logical_replication_spark.operators.schema_evolution import (
        stream_column_contracts,
    )
    from pg_logical_replication_spark.sources.wal2json import decode_wal2json

    # relation-rows path: two pgoutput tables, one evolves
    oid_a, oid_b = 71001, 71002
    rows = [
        (1, pgf.encode_relation(oid_a, "public", "ta", [("id", 20)],
                                key_columns=["id"])),
        (2, pgf.encode_relation(oid_b, "public", "tb",
                                [("id", 20), ("x", 23)],
                                key_columns=["id"])),
        (3, pgf.encode_insert(oid_a, [("t", "1")])),
        (4, pgf.encode_insert(oid_b, [("t", "1"), ("t", "2")])),
        (5, pgf.encode_relation(oid_a, "public", "ta",
                                [("id", 20), ("v", 20)],
                                key_columns=["id"])),
        (6, pgf.encode_insert(oid_a, [("t", "2"), ("t", "9")])),
    ]
    decoded = decode_pgoutput(_wire_df(spark, rows))
    plural = stream_column_contracts(decoded, ["ta", "tb"])
    assert plural == {
        "ta": stream_column_contract(decoded, table="ta"),
        "tb": stream_column_contract(decoded, table="tb"),
    }

    # signatures path: wal2json, two tables, one evolves
    lines = [
        json.dumps({"nextlsn": "0/10", "change": [{
            "kind": "insert", "schema": "public", "table": "wa",
            "columnnames": ["id"], "columntypes": ["bigint"],
            "columnvalues": [1]}]}),
        json.dumps({"nextlsn": "0/11", "change": [{
            "kind": "insert", "schema": "public", "table": "wb",
            "columnnames": ["id", "w"],
            "columntypes": ["bigint", "numeric(10,2)"],
            "columnvalues": [1, "1.25"]}]}),
        json.dumps({"nextlsn": "0/12", "change": [{
            "kind": "insert", "schema": "public", "table": "wa",
            "columnnames": ["id", "v"], "columntypes": ["bigint", "text"],
            "columnvalues": [2, "x"]}]}),
    ]
    raw = spark.createDataFrame([(s,) for s in lines], "value string")
    wdec = decode_wal2json(raw)
    plural = stream_column_contracts(wdec, ["wa", "wb"])
    assert plural == {
        "wa": stream_column_contract(wdec, table="wa"),
        "wb": stream_column_contract(wdec, table="wb"),
    }

    # missing table raises the same loud error
    with pytest.raises(ValueError, match="no schema information"):
        stream_column_contracts(wdec, ["wa", "nosuch"])


def test_stream_contract_no_schema_info_raises(spark):
    rows = [(1 + i, pgf.encode_insert(OID, [("t", str(i))])) for i in range(2)]
    rel = pgf.RelationInfo(
        OID, "public", "t",
        "d", [{"flags": 1, "name": "id", "type_oid": 20, "type_mod": -1}],
        ["id"],
    )
    decoded = decode_pgoutput(_wire_df(spark, rows), relations={OID: rel})
    with pytest.raises(ValueError, match="no schema information"):
        stream_column_contract(decoded, table="t")


def test_apply_changes_evolve_batch(spark):
    from pg_logical_replication_spark.operators.apply_changes import (
        apply_changes,
    )

    decoded = decode_pgoutput(_wire_df(spark, _evolving_rows())).persist()
    snap = apply_changes(decoded, key_columns=["id"], table="t",
                         columns="evolve")
    assert [f.dataType.simpleString() for f in snap.schema.fields] == [
        "bigint", "int"
    ]
    assert {r["id"]: r["v"] for r in snap.collect()} == EXPECT


# -------------------------------------------------------- MOR streaming
def test_mor_schema_evolution_across_micro_batches(spark, tmp_path):
    """The VERDICT r8 #2 streaming leg: micro-batch 0 materializes the
    v1 contract; micro-batch 1 carries the in-band ALTER ('R' v2) and
    the snapshot schema WIDENS — v1 rows NULL-backfilled, the post-ALTER
    update reaching a v1 key, all through a real Structured Streaming
    query with a checkpoint."""
    from pg_logical_replication_spark.streaming.apply import MergeOnReadTable

    rows = _evolving_rows()
    d = str(tmp_path / "wire")
    os.makedirs(d)
    b0 = [r for r in rows if r[0] < 10]   # R v1 + v1 inserts
    b1 = [r for r in rows if r[0] >= 10]  # R v2 + v2 inserts + update
    for i, batch in enumerate([b0, b1]):
        _wire_df(spark, batch).coalesce(1).write.parquet(f"{d}/f{i}")
    # two files -> two micro-batches (each R precedes its rows in-file,
    # the streaming decode contract)
    stream = (
        spark.readStream.schema("lsn string, seq long, data binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/f*")
    )
    tbl = MergeOnReadTable(spark, str(tmp_path / "tbl"),
                           key_columns=["id"], table="t")
    contracts = []

    def sink(df, bid):
        tbl.apply_batch(df, bid)
        contracts.append(tbl.evolved_columns())

    q = (
        decode_pgoutput(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert contracts[0] == {"id": "bigint"}
    assert contracts[-1] == {"id": "bigint", "v": "integer"}
    snap = tbl.snapshot_evolved()
    assert [f.name for f in snap.schema.fields] == ["id", "v"]
    assert {r["id"]: r["v"] for r in snap.collect()} == EXPECT


def test_mor_dropped_column_retained_and_compact(spark, tmp_path):
    from pg_logical_replication_spark.streaming.apply import MergeOnReadTable

    tbl = MergeOnReadTable(spark, str(tmp_path / "tbl"),
                           key_columns=["id"], table="t")
    decoded = decode_pgoutput(_wire_df(spark, _evolving_rows())).persist()
    tbl.apply_batch(decoded, 0)
    # v3 drops v — contract RETAINS it; the new row reads NULL
    rel_v1 = pgf.RelationInfo(
        OID, "public", "t",
        "d", [{"flags": 1, "name": "id", "type_oid": 20, "type_mod": -1}],
        ["id"],
    )
    v3 = [(40, pgf.encode_relation(OID, "public", "t", [("id", 20)],
                                   key_columns=["id"])),
          (41, pgf.encode_insert(OID, [("t", "7")]))]
    tbl.apply_batch(
        decode_pgoutput(_wire_df(spark, v3), relations={OID: rel_v1}), 1
    )
    assert tbl.evolved_columns() == {"id": "bigint", "v": "integer"}
    got = {r["id"]: r["v"] for r in tbl.snapshot_evolved().collect()}
    assert got == {**EXPECT, 7: None}
    # compaction folds images but the schema history survives
    tbl.compact()
    assert tbl.evolved_columns() == {"id": "bigint", "v": "integer"}
    assert {r["id"]: r["v"]
            for r in tbl.snapshot_evolved().collect()} == {**EXPECT, 7: None}


def test_mor_evolved_from_types_maps_wal2json(spark, tmp_path):
    """wal2json logs have no relation rows — the per-image `types` maps
    stored by apply_batch drive the same evolution."""
    import json

    from pg_logical_replication_spark.sources.wal2json import decode_wal2json
    from pg_logical_replication_spark.streaming.apply import MergeOnReadTable

    def line(lsn, names, types, vals):
        return json.dumps({"nextlsn": lsn, "change": [{
            "kind": "insert", "schema": "public", "table": "t",
            "columnnames": names, "columntypes": types,
            "columnvalues": vals}]})

    raw0 = spark.createDataFrame(
        [(line("0/10", ["id"], ["bigint"], [1]),)], "value string")
    raw1 = spark.createDataFrame(
        [(line("0/20", ["id", "v"], ["bigint", "integer"], [2, 42]),)],
        "value string")
    tbl = MergeOnReadTable(spark, str(tmp_path / "tbl"),
                           key_columns=["id"], table="t")
    tbl.apply_batch(decode_wal2json(raw0), 0)
    tbl.apply_batch(decode_wal2json(raw1), 1)
    assert tbl.evolved_columns() == {"id": "bigint", "v": "integer"}
    got = {r["id"]: r["v"] for r in tbl.snapshot_evolved().collect()}
    assert got == {1: None, 2: 42}


# --------------------------------------------- round-10 widening matrix
def test_merge_type_numeric_typmods_keep_widest():
    """ADVICE r9: within the numeric family the WIDEST typmod survives
    (bare numeric = unconstrained = widest); a narrowing ALTER never
    narrows the contract and never raises."""
    assert merge_type("t", "x", "numeric(10,2)", "numeric(12,2)") == "numeric(12,2)"
    assert merge_type("t", "x", "numeric(10,2)", "numeric(5,1)") == "numeric(10,2)"
    # mixed: integer digits widen but scale narrows -> unconstrained
    assert merge_type("t", "x", "numeric(10,2)", "numeric(12,1)") == "numeric"
    assert merge_type("t", "x", "numeric", "numeric(10,2)") == "numeric"
    assert merge_type("t", "x", "numeric(10,2)", "numeric") == "numeric"


def test_merge_type_int_float_to_bounded_numeric():
    # numeric(12,2) provably holds every integer (p-s=10 digits)
    assert merge_type("t", "x", "integer", "numeric(12,2)") == "numeric(12,2)"
    # numeric(5,1) cannot hold every integer -> unconstrained fallback
    assert merge_type("t", "x", "integer", "numeric(5,1)") == "numeric"
    assert merge_type("t", "x", "bigint", "numeric(18,0)") == "numeric"
    assert merge_type("t", "x", "bigint", "numeric(19,0)") == "numeric(19,0)"
    # floats are unbounded -> any typmod'd numeric falls back
    assert merge_type("t", "x", "real", "numeric(10,2)") == "numeric"


def test_merge_type_text_family_keeps_wider():
    """ADVICE r9: text→varchar kept the narrower NEW type; the wider
    (old) declaration must survive."""
    assert merge_type("t", "x", "text", "character varying(20)") == "text"
    assert (
        merge_type("t", "x", "character varying(40)", "character varying(20)")
        == "character varying(40)"
    )
    assert merge_type("t", "x", "character varying(20)", "text") == "text"
    assert merge_type("t", "x", "varchar", "character varying(20)") == "varchar"
    # cross-family into a BOUNDED varchar: contract stays unbounded —
    # pre-ALTER values carry no length guarantee
    assert merge_type("t", "x", "bigint", "character varying(5)") == "text"
    assert merge_type("t", "x", "bigint", "text") == "text"


def test_merge_type_timestamp_typmod_folds_tz_change_raises():
    """VERDICT r9 #5 verdicts pinned: a typmod-only change on the same
    timestamp type folds (wider precision survives); timestamp <->
    timestamptz is a MEANING change (offset suffix on the wire) — loud
    error, never a silent merge."""
    assert (
        merge_type("t", "x", "timestamp(3) without time zone",
                   "timestamp(6) without time zone")
        == "timestamp(6) without time zone"
    )
    assert (
        merge_type("t", "x", "timestamp(6) without time zone",
                   "timestamp(3) without time zone")
        == "timestamp(6) without time zone"
    )
    assert (
        merge_type("t", "x", "timestamp without time zone",
                   "timestamp(3) without time zone")
        == "timestamp without time zone"
    )
    for old, new in [
        ("timestamp without time zone", "timestamp with time zone"),
        ("timestamp with time zone", "timestamp without time zone"),
    ]:
        with pytest.raises(ValueError, match="incompatible type change"):
            merge_type("t", "x", old, new)


def test_signature_split_is_typmod_aware(spark):
    """ADVICE r9 (medium): wal2json emits typmod'd type names by default
    (include_typmod=True) — numeric(10,2)'s embedded comma must not
    shear the coltypes CSV, silently dropping the signature and with it
    the evolved column."""
    import json

    from pg_logical_replication_spark.sources.wal2json import decode_wal2json

    def line(lsn, names, types, vals):
        return json.dumps({"nextlsn": lsn, "change": [{
            "kind": "insert", "schema": "public", "table": "t",
            "columnnames": names, "columntypes": types,
            "columnvalues": vals}]})

    raw = spark.createDataFrame(
        [
            (line("0/10", ["id", "amt"], ["bigint", "numeric(10,2)"],
                  [1, "1.25"]),),
            (line("0/20", ["id", "amt", "note"],
                  ["bigint", "numeric(10,2)", "character varying(30)"],
                  [2, "2.50", "hi"]),),
        ],
        "value string",
    )
    decoded = decode_wal2json(raw)  # include_typmod defaults True
    assert stream_column_contract(decoded, table="t") == {
        "id": "bigint", "amt": "numeric(10,2)",
        "note": "character varying(30)",
    }


def test_signature_arity_mismatch_raises_loudly():
    """A residual name/type arity mismatch is corrupt metadata — raise
    with the explicit-contract pointer, never return a partial fold."""
    from pg_logical_replication_spark.operators.schema_evolution import (
        _versions_from_signatures,
    )

    with pytest.raises(ValueError, match="malformed schema signature"):
        _versions_from_signatures(
            [((0, 0), "id,amt", "bigint")], table="public.t"
        )


def test_relation_reannouncements_fold_distinct(spark):
    """VERDICT r9 #3: pgoutput re-announces relations per decoder
    session — repeated identical 'R' rows must pre-reduce to DISTINCT
    declarations (signature-sized driver fold), and an A→B→A revert
    resolves to the widened contract, not an error."""
    rows = [(0, pgf.encode_relation(
        OID, "public", "t", [("id", 20)], key_columns=["id"]))]
    # 40 re-announcements of the same two versions (reconnect churn)
    for k in range(20):
        rows.append((100 + k, pgf.encode_relation(
            OID, "public", "t", [("id", 20)], key_columns=["id"])))
    rows.append((500, pgf.encode_relation(
        OID, "public", "t", [("id", 20), ("v", 23)], key_columns=["id"])))
    for k in range(20):
        rows.append((600 + k, pgf.encode_relation(
            OID, "public", "t", [("id", 20), ("v", 23)], key_columns=["id"])))
    rows.append((900, pgf.encode_insert(OID, [("t", "1"), ("t", "2")])))
    decoded = decode_pgoutput(_wire_df(spark, rows))
    assert stream_column_contract(decoded, table="t") == {
        "id": "bigint", "v": "integer"
    }


def test_mor_compact_keeps_schemas_distinct(spark, tmp_path):
    """ADVICE r9: compact()'s relation dedupe key includes 'schema' —
    identically-declared same-named tables in different PG schemas
    (public.users vs audit.users) must keep BOTH relation rows."""
    from pg_logical_replication_spark.streaming.apply import MergeOnReadTable

    def batch(schema_name, val):
        import json

        line = json.dumps({"nextlsn": "0/10", "change": [{
            "kind": "insert", "schema": schema_name, "table": "users",
            "columnnames": ["id"], "columntypes": ["bigint"],
            "columnvalues": [val]}]})
        from pg_logical_replication_spark.sources.wal2json import (
            decode_wal2json,
        )

        return decode_wal2json(
            spark.createDataFrame([(line,)], "value string")
        )

    tbl = MergeOnReadTable(spark, str(tmp_path / "tbl"), key_columns=["id"],
                           table="users")
    tbl.apply_batch(batch("public", 1), 0)
    tbl.apply_batch(batch("audit", 2), 1)
    tbl.compact()
    log = spark.read.parquet(str(tmp_path / "tbl"))
    got = {(r["schema"], r["id"]) for r in log.filter(
        F.col("op") != "relation"
    ).selectExpr("schema", "after['id'] as id").collect()}
    assert got == {("public", "1"), ("audit", "2")}


def test_mor_multi_table_evolution_isolation(spark, tmp_path):
    """VERDICT r9 #4 streaming leg: one stream interleaves two relations
    that evolve INDEPENDENTLY (different micro-batches) and a third that
    never evolves; three MOR tables fed from the same foreachBatch must
    materialize three correct snapshots — per-table contract isolation
    through the OID-keyed relation cache semantics
    (pgoutput-parser.ts:22,107)."""
    from pg_logical_replication_spark.streaming.apply import MergeOnReadTable

    O, U, I = 61010, 61011, 61012

    def r(oid, name, cols, key):
        return pgf.encode_relation(oid, "public", name, cols,
                                   key_columns=[key])

    b0 = [
        (0, r(O, "orders", [("order_id", 20)], "order_id")),
        (1, r(U, "users", [("uid", 20)], "uid")),
        (2, r(I, "items", [("item_id", 20), ("qty", 20)], "item_id")),
        (10, pgf.encode_insert(O, [("t", "1")])),
        (11, pgf.encode_insert(U, [("t", "1")])),
        (12, pgf.encode_insert(I, [("t", "1"), ("t", "5")])),
    ]
    # each micro-batch re-announces its tables' CURRENT versions (the
    # walsender re-announces per decoder session — the engine's
    # streaming contract needs each relation's R within the batch; the
    # identical re-announcements also exercise the distinct-declaration
    # pre-reduction, VERDICT r9 #3)
    b1 = [  # orders evolves; users/items keep v1
        (20, r(O, "orders", [("order_id", 20), ("amount", 20)], "order_id")),
        (21, r(U, "users", [("uid", 20)], "uid")),
        (23, pgf.encode_insert(O, [("t", "2"), ("t", "200")])),
        (24, pgf.encode_insert(U, [("t", "2")])),
    ]
    b2 = [  # users evolves; orders stays v2, items still v1
        (30, r(U, "users", [("uid", 20), ("score", 20)], "uid")),
        (31, r(I, "items", [("item_id", 20), ("qty", 20)], "item_id")),
        (33, pgf.encode_insert(U, [("t", "3"), ("t", "30")])),
        (34, pgf.encode_insert(I, [("t", "2"), ("t", "7")])),
    ]
    d = str(tmp_path / "wire")
    os.makedirs(d)
    for i, batch in enumerate([b0, b1, b2]):
        _wire_df(spark, batch).coalesce(1).write.parquet(f"{d}/f{i}")
    stream = (
        spark.readStream.schema("lsn string, seq long, data binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/f*")
    )
    tbls = {
        "orders": MergeOnReadTable(spark, str(tmp_path / "orders"),
                                   key_columns=["order_id"], table="orders"),
        "users": MergeOnReadTable(spark, str(tmp_path / "users"),
                                  key_columns=["uid"], table="users"),
        "items": MergeOnReadTable(spark, str(tmp_path / "items"),
                                  key_columns=["item_id"], table="items"),
    }

    def sink(df, bid):
        df = df.persist()
        for tb in tbls.values():
            tb.apply_batch(df, bid)
        df.unpersist()

    q = (
        decode_pgoutput(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert tbls["orders"].evolved_columns() == {
        "order_id": "bigint", "amount": "bigint"
    }
    assert tbls["users"].evolved_columns() == {
        "uid": "bigint", "score": "bigint"
    }
    # the untouched table's contract never widens
    assert tbls["items"].evolved_columns() == {
        "item_id": "bigint", "qty": "bigint"
    }
    assert {r["order_id"]: r["amount"] for r in
            tbls["orders"].snapshot_evolved().collect()} == {1: None, 2: 200}
    assert {r["uid"]: r["score"] for r in
            tbls["users"].snapshot_evolved().collect()} == {
        1: None, 2: None, 3: 30
    }
    assert {r["item_id"]: r["qty"] for r in
            tbls["items"].snapshot_evolved().collect()} == {1: 5, 2: 7}


def test_acknowledge_ping_survives_restart(spark, tmp_path):
    """ADVICE r9: the slot's source is persisted beside the checkpoint —
    a NEW service instance (process restart, no re-subscribe) still
    emits the standby-status frame for acknowledge(ping=True)."""
    import glob
    import warnings

    from pg_logical_replication_spark.streaming.service import (
        LogicalReplicationService,
    )

    log_dir = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(log_dir)
    svc = LogicalReplicationService(spark, log_dir, ckpt)
    svc._slot_source["s1"] = "frames"
    svc._persist_slot_source("s1", "frames")

    svc2 = LogicalReplicationService(spark, log_dir, ckpt)  # "restart"
    svc2.acknowledge("s1", "0/20", ping=True)
    frames = glob.glob(os.path.join(log_dir, "*"))
    assert frames, "restart ack with ping must append a status frame"
    # unknown slot: warn, never silently drop
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        svc2.acknowledge("nope", "0/20", ping=True)
    assert any("unknown slot" in str(x.message) for x in w)


def test_mor_pre_evolution_log_raises_clearly(spark, tmp_path):
    """A log written before schema evolution existed (no relation rows,
    no per-image types) must fail LOUDLY with the snapshot_columns
    pointer — never return a wrong contract."""
    p = str(tmp_path / "tbl")
    old = spark.createDataFrame(
        [("insert", 16, "t", None, {"id": "1"}, 16, 0)],
        "op string, lsn_long long, table string, "
        "key map<string,string>, after map<string,string>, "
        "_ord1 long, batch int",
    )
    old.write.partitionBy("batch").parquet(p)
    from pg_logical_replication_spark.streaming.apply import MergeOnReadTable

    tbl = MergeOnReadTable(spark, p, key_columns=["id"], table="t")
    with pytest.raises(ValueError, match="snapshot_columns"):
        tbl.evolved_columns()
    # the untyped surfaces still work on the old log
    assert tbl.snapshot().count() == 1
    assert {r["id"] for r in
            tbl.snapshot_columns({"id": "bigint"}).collect()} == {1}
