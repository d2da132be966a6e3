"""Python UDTF surface: wal2json changeset exploder via SQL LATERAL."""

import json

from pg_logical_replication_spark.sources.udtf_explode import (
    register_wal2json_explode,
)


def _line(*changes, xid=1):
    return json.dumps({"change": list(changes), "xid": xid})


def _chg(kind, table, names, values):
    return {
        "kind": kind, "schema": "public", "table": table,
        "columnnames": names, "columntypes": ["text"] * len(names),
        "columnvalues": values,
    }


def test_udtf_explodes_changesets(spark):
    register_wal2json_explode(spark)
    lines = [
        (_line(_chg("insert", "users", ["id", "ok"], [1, True]),
               _chg("delete", "users", ["id"], [2])),),
        (_line(_chg("update", "pets", ["name"], [None])),),
        ("{not json",),  # malformed → zero rows, batch survives
        (_line(),),  # empty changeset (keepalive-style) → zero rows
    ]
    spark.createDataFrame(lines, "value string").createOrReplaceTempView("raw")
    rows = spark.sql(
        "SELECT f.* FROM raw, LATERAL wal2json_explode(raw.value) f"
    ).collect()
    assert len(rows) == 3
    by_op = {r["op"]: r for r in rows}
    assert by_op["insert"]["after"] == {"id": "1", "ok": "true"}
    assert by_op["insert"]["table_name"] == "users"
    assert by_op["delete"]["after"] == {"id": "2"}
    assert by_op["update"]["after"] == {"name": None}


def test_udtf_matches_declarative_decoder_row_count(spark):
    """The UDTF and the declarative wal2json path agree on DML rows."""
    from pg_logical_replication_spark.sources import decode

    register_wal2json_explode(spark)
    lines = [
        (_line(_chg("insert", "t", ["id"], [i]),
               _chg("update", "t", ["id"], [i])),)
        for i in range(10)
    ]
    raw = spark.createDataFrame(lines, "value string")
    raw.createOrReplaceTempView("raw2")
    n_udtf = spark.sql(
        "SELECT f.* FROM raw2, LATERAL wal2json_explode(raw2.value) f"
    ).count()
    n_decl = decode(raw, "wal2json").filter("op in ('insert','update')").count()
    assert n_udtf == n_decl == 20
