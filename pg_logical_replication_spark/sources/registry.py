"""Format-keyed decoder registry — the engine's plugin dispatch.

≙ reference ``src/output-plugins/abstract.plugin.ts:3-9`` (strategy
interface with ``name``/``start``/``parse``) — here a format name mapped
to a DataFrame transform sharing the normalized ChangeEvent schema, so
``decode(df, 'wal2json')`` is the whole integration surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pg_logical_replication_spark.sources.decoderbufs import decode_decoderbufs
from pg_logical_replication_spark.sources.pgoutput import decode_pgoutput
from pg_logical_replication_spark.sources.test_decoding import decode_test_decoding
from pg_logical_replication_spark.sources.wal2json import decode_wal2json

_DECODERS = {
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
