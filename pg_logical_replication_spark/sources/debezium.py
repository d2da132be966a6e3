"""Debezium JSON envelope — interop decode/encode.

The reference is a PG-specific client; the ecosystem's lingua franca for
CDC at rest (Kafka topics, S3 archives) is the Debezium envelope:
``{"before", "after", "source": {"schema", "table", "lsn", "txId"},
"op": "c|u|d|r", "ts_ms"}``. Supporting it means (a) change streams
captured by Debezium connectors can be queried by this engine without
re-capture, and (b) this engine's streams can feed any Debezium-aware
consumer — the "a user of the reference could switch" interop story in
both directions.

Decode is fully declarative (``from_json`` projection, zero UDFs, same
scale shape as wal2json v2); ``to_debezium`` is the inverse
(``to_json``), and the two round-trip (tested + oracle-gated).

Envelope notes: the payload may arrive bare or wrapped in Connect's
``{"schema": …, "payload": …}``; both are accepted. ``op`` ``r``
(snapshot read) decodes as an ``insert`` with ``meta['snapshot']`` set,
the standard treatment for initial-load records.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pg_logical_replication_spark.model import lsn_str_expr

_PAYLOAD = (
    "struct<"
    "  before: map<string,string>, after: map<string,string>,"
    "  source: struct<schema: string, table: string, lsn: bigint,"
    "                 txId: bigint>,"
    "  op: string, ts_ms: bigint"
    ">"
)
DEBEZIUM_SCHEMA = f"struct<schema: string, payload: {_PAYLOAD}>"

_OPS = {"c": "insert", "u": "update", "d": "delete", "r": "insert", "t": "truncate", "m": "message"}


def decode_debezium(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Debezium JSON lines → normalized ChangeEvent rows."""
    bare = F.from_json(F.col(value_col), _PAYLOAD)
    wrapped = F.from_json(F.col(value_col), DEBEZIUM_SCHEMA).getField("payload")
    parsed = raw.select(
        F.when(bare.getField("op").isNotNull(), bare).otherwise(wrapped).alias("p")
    ).filter(
        # filter on the MAPPED op: an unknown envelope op code must
        # drop the row, not emit op=NULL into the non-null ChangeEvent
        # discriminator (review r2)
        F.col("p.op").isin(*_OPS)
    )

    op_raw = parsed["p.op"]
    op = F.coalesce(
        *[F.when(op_raw == k, F.lit(v)) for k, v in _OPS.items()]
    )
    lsn_long = parsed["p.source.lsn"]
    return parsed.select(
        op.alias("op"),
        lsn_str_expr(lsn_long).alias("lsn"),
        lsn_long.alias("lsn_long"),
        parsed["p.source.txId"].alias("xid"),
        F.timestamp_millis(parsed["p.ts_ms"]).alias("commit_ts"),
        parsed["p.source.schema"].alias("schema"),
        parsed["p.source.table"].alias("table"),
        # Debezium carries the old row image in `before`; for deletes and
        # updates that image IS the key/identity (wal2json oldkeys
        # equivalent), which apply-changes keys tombstones off
        F.when(op_raw.isin("d", "u"), parsed["p.before"]).alias("key"),
        parsed["p.before"].alias("before"),
        parsed["p.after"].alias("after"),
        F.when(op_raw == "r", F.create_map(F.lit("snapshot"), F.lit("true")))
        .otherwise(F.create_map().cast("map<string,string>"))
        .alias("meta"),
    )


def to_debezium(events: DataFrame) -> DataFrame:
    """Normalized ChangeEvents → one Debezium JSON line per row
    (``value`` column), the shape a Debezium-aware sink (Kafka topic,
    archive) expects. Inverse of :func:`decode_debezium`."""
    inv = {"insert": "c", "update": "u", "delete": "d", "truncate": "t"}
    op = F.coalesce(
        *[F.when(F.col("op") == k, F.lit(v)) for k, v in inv.items()]
    )
    return events.filter(F.col("op").isin(*inv)).select(
        F.to_json(
            F.struct(
                F.col("before"),
                F.col("after"),
                F.struct(
                    F.col("schema").alias("schema"),
                    F.col("table").alias("table"),
                    F.col("lsn_long").alias("lsn"),
                    F.col("xid").alias("txId"),
                ).alias("source"),
                op.alias("op"),
                F.unix_millis(F.col("commit_ts")).alias("ts_ms"),
            )
        ).alias("value")
    )
