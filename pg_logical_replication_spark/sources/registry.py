"""Format-keyed decoder registry — the engine's plugin dispatch.

≙ reference ``src/output-plugins/abstract.plugin.ts:3-9`` (strategy
interface with ``name``/``start``/``parse``) — here a format name mapped
to a DataFrame transform sharing the normalized ChangeEvent schema, so
``decode(df, 'wal2json')`` is the whole integration surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pg_logical_replication_spark.sources.debezium import decode_debezium
from pg_logical_replication_spark.sources.decoderbufs import decode_decoderbufs
from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput
from pg_logical_replication_spark.sources.test_decoding import decode_test_decoding
from pg_logical_replication_spark.sources.wal2json import decode_wal2json

_DECODERS = {
    "debezium": decode_debezium,
    "wal2json": decode_wal2json,
    "test_decoding": decode_test_decoding,
    "pgoutput": decode_pgoutput,
    "decoderbufs": decode_decoderbufs,
}


def decode(raw: DataFrame, fmt: str, **options) -> DataFrame:
    """Dispatch to the named decoder; raises on unknown format
    (≙ the reference throwing on an unknown plugin/message)."""
    try:
        decoder = _DECODERS[fmt]
    except KeyError:
        raise ValueError(
            f"unknown output plugin format {fmt!r}; expected one of {sorted(_DECODERS)}"
        ) from None
    return decoder(raw, **options)


def formats() -> list[str]:
    return sorted(_DECODERS)


def dead_letters(
    raw: DataFrame, fmt: str, value_col: str = "value", format_version: int = 1
) -> DataFrame:
    """Rows the decoder would silently drop — the error channel (#24).

    The reference emits per-message ``error`` events without halting the
    queue (``logical-replication-service.ts:213-216``); Spark's
    equivalent is the DLQ pattern: the happy path keeps flowing and the
    rejects land here for alerting/replay. Returns the offending input
    rows with a ``reason`` column. Same scan, Catalyst-shared with the
    main decode when both run in one job.

    Text formats only — binary formats (pgoutput/decoderbufs) surface
    malformed messages as hard per-batch errors in the decode UDF, the
    right behavior for a protocol stream where one bad frame means the
    relay itself is broken.
    """
    from pyspark.sql import functions as F

    if fmt == "debezium":
        from pg_logical_replication_spark.sources.debezium import (
            DEBEZIUM_SCHEMA,
            _PAYLOAD,
        )

        bare = F.from_json(F.col(value_col), _PAYLOAD)
        wrapped = F.from_json(F.col(value_col), DEBEZIUM_SCHEMA).getField("payload")
        bad = bare.getField("op").isNull() & wrapped.getField("op").isNull()
        return raw.filter(F.col(value_col).isNotNull() & bad).select(
            F.col(value_col).alias("value"),
            F.lit("unparseable debezium envelope").alias("reason"),
        )
    if fmt == "wal2json" and format_version == 2:
        from pg_logical_replication_spark.sources.wal2json import WAL2JSON_V2_SCHEMA

        parsed = F.from_json(F.col(value_col), WAL2JSON_V2_SCHEMA)
        # v2: every valid line is one action object
        bad = parsed.isNull() | parsed.getField("action").isNull()
        return raw.filter(F.col(value_col).isNotNull() & bad).select(
            F.col(value_col).alias("value"),
            F.lit("unparseable wal2json v2").alias("reason"),
        )
    if fmt == "wal2json":
        from pg_logical_replication_spark.sources.wal2json import WAL2JSON_SCHEMA

        parsed = F.from_json(F.col(value_col), WAL2JSON_SCHEMA)
        # from_json is PERMISSIVE: unparseable JSON → null struct; JSON
        # of the wrong shape → struct with no recognized fields
        bad = parsed.isNull() | (
            parsed.getField("change").isNull()
            & parsed.getField("xid").isNull()
            & parsed.getField("nextlsn").isNull()
        )
        return raw.filter(F.col(value_col).isNotNull() & bad).select(
            F.col(value_col).alias("value"), F.lit("unparseable wal2json").alias("reason")
        )
    if fmt == "test_decoding":
        from pg_logical_replication_spark.sources.test_decoding import (
            _BEGIN_RE,
            _COMMIT_RE,
            _QUAL_RE,
        )

        line = F.col(value_col)
        ok = (
            (F.regexp_extract(line, _QUAL_RE, 3) != "")
            | line.rlike(_BEGIN_RE)
            | line.rlike(_COMMIT_RE)
        )
        return raw.filter(line.isNotNull() & (line != "") & ~ok).select(
            line.alias("value"), F.lit("unparseable test_decoding").alias("reason")
        )
    raise ValueError(
        f"dead_letters supports text formats only, not {fmt!r}"
    )
