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
            # columnar accumulation + one vectorized to_datetime — same
            # ~3× batch-building win as sources/pgoutput.py
            out: dict[str, list] = {c: [] for c in cols}
            lsns = pdf[lsn_col] if has_lsn else [None] * len(pdf)
            for data, lsn in zip(pdf[data_col], lsns):
                ev = fmt.parse_row_message(bytes(data))
                out["op"].append(ev["op"])
                out["lsn"].append(lsn)
                out["xid"].append(ev.get("xid"))
                out["commit_ts"].append(ev.get("commit_ts_us"))
                out["schema"].append(ev.get("schema"))
                out["table"].append(ev.get("table"))
                out["key"].append(ev.get("key"))
                out["before"].append(ev.get("before"))
                out["after"].append(ev.get("after"))
                out["meta"].append(ev.get("meta"))
            out["lsn_long"] = [None] * len(out["op"])
            res = pd.DataFrame(out, columns=cols)
            res["commit_ts"] = pd.to_datetime(
                pd.Series(out["commit_ts"], dtype="object"), unit="us", errors="coerce"
            )
            yield res

    decoded = raw.mapInPandas(decode, schema=CHANGE_EVENT_SCHEMA)
    return decoded.withColumn("lsn_long", lsn_long_expr("lsn"))
