"""decoderbufs decoder — mapInPandas over the pure-Python protobuf codec.

≙ reference ``src/output-plugins/decoderbufs/decoderbufs-plugin.ts:38-40``
(``RowMessage.decode(buffer)``). Unlike pgoutput, every RowMessage is
self-describing (column names travel with every datum), so no relation
cache / pre-scan is needed and decode is embarrassingly parallel.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pg_logical_replication_spark.model import CHANGE_EVENT_SCHEMA, lsn_long_expr
from pg_logical_replication_spark.sources import decoderbufs_format as fmt


def decode_decoderbufs(
    raw: DataFrame, data_col: str = "data", lsn_col: str | None = "lsn"
) -> DataFrame:
    """Raw protobuf RowMessages → normalized ChangeEvent rows."""
    has_lsn = lsn_col is not None and lsn_col in raw.columns
    cols = [f.name for f in CHANGE_EVENT_SCHEMA.fields]

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            lsns = pdf[lsn_col] if has_lsn else [None] * len(pdf)
            for data, lsn in zip(pdf[data_col], lsns):
                ev = fmt.parse_row_message(bytes(data))
                ts_us = ev.get("commit_ts_us")
                rows.append(
                    {
                        "op": ev["op"],
                        "lsn": lsn,
                        "lsn_long": None,
                        "xid": ev.get("xid"),
                        "commit_ts": pd.Timestamp(ts_us, unit="us") if ts_us else None,
                        "schema": ev.get("schema"),
                        "table": ev.get("table"),
                        "key": ev.get("key"),
                        "before": ev.get("before"),
                        "after": ev.get("after"),
                        "meta": ev.get("meta"),
                    }
                )
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(columns=cols)

    decoded = raw.mapInPandas(decode, schema=CHANGE_EVENT_SCHEMA)
    return decoded.withColumn("lsn_long", lsn_long_expr("lsn"))
