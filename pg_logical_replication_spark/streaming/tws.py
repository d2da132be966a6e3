"""transformWithStateInPandas twin of the txn-assembly gate (Spark 4).

``streaming/stateful.py`` implements commit-gated transaction assembly on
``applyInPandasWithState``, whose state is one opaque value per key —
every micro-batch REWRITES the whole buffered array even when it only
appends. This module is the same operator on Spark 4's
``transformWithStateInPandas`` (public API, SPARK-49564): buffered rows
live in a **ListState**, so a long-running transaction's segments append
incrementally in the RocksDB state store instead of rewriting an
ever-growing blob — the difference between O(txn) and O(txn²) total
state I/O for the reference's 500k-row huge-transaction scenario
(decoder-pgoutput.spec.ts:324-373).

Semantics are identical to ``assemble_transactions_stream`` (begin/
commit framed v1 traffic, rollback invisibility by state eviction);
``tests/test_tws.py`` asserts agreement between the two paths.

Requires the RocksDB state store provider
(``spark.sql.streaming.stateStore.providerClass`` →
``RocksDBStateStoreProvider``) — the caller sets it; local HDFS-backed
stores don't support column families. Also requires ``google.protobuf``
(the transformWithState Python runtime speaks protobuf to the JVM);
:func:`assemble_transactions_tws` raises a clear ImportError when it is
absent, and ``tests/test_tws.py`` skips — the applyInPandasWithState
path in ``streaming/stateful.py`` (identical contract, asserted by the
agreement test where both can run) stays the tested default.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame

from pg_logical_replication_spark.streaming.stateful import (
    _DML_OPS,
    _EVENT_FIELDS,
    _OUT_COLUMNS,
    TXN_OUTPUT_SCHEMA,
)


def _txn_assembler_class():
    """Late import: stateful_processor needs a Spark 4 runtime."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TxnAssembler(StatefulProcessor):
        def __init__(self, ttl_ms: int | None):
            self._ttl_ms = ttl_ms

        def init(self, handle: StatefulProcessorHandle) -> None:
            # one JSON-encoded ChangeEvent per list element → appends are
            # incremental writes, never a rewrite of prior elements
            self._buf = handle.getListState(
                "buffered", "ev string", ttlDurationMs=self._ttl_ms
            )

        def handleInputRows(
            self, key: tuple, rows: Iterator[pd.DataFrame], timerValues: Any
        ) -> Iterator[pd.DataFrame]:
            (xid,) = key
            fresh: list[tuple[str]] = []
            commit: dict[str, Any] | None = None
            for pdf in rows:
                for row in pdf.to_dict("records"):
                    op = row["op"]
                    if op == "commit":
                        ts = row.get("commit_ts")
                        commit = {
                            "commit_ts": None if ts is None or pd.isna(ts) else ts
                        }
                    elif op in _DML_OPS:
                        ev = {f: row.get(f) for f in _EVENT_FIELDS}
                        for f in ("lsn_long", "seq"):
                            v = ev.get(f)
                            ev[f] = None if v is None or pd.isna(v) else int(v)
                        # same Arrow-runtime normalization as the
                        # applyInPandasWithState gate (stateful._as_dict)
                        from pg_logical_replication_spark.streaming.stateful import (
                            _as_dict,
                        )

                        for f in ("key", "before", "after"):
                            ev[f] = _as_dict(ev.get(f))
                        ev["commit_ts"] = None
                        fresh.append((json.dumps(ev),))

            if commit is None:
                if fresh:
                    self._buf.appendList(fresh)
                return
                yield  # pragma: no cover — make this a generator

            out = [json.loads(s) for (s,) in self._buf.get()] if self._buf.exists() else []
            out.extend(json.loads(s) for (s,) in fresh)
            out.sort(key=lambda r: (r.get("lsn_long") or 0, r.get("seq") or 0))
            self._buf.clear()
            if out:
                for r in out:
                    r["xid"] = xid
                    r["commit_ts"] = commit["commit_ts"]
                yield pd.DataFrame(out, columns=_OUT_COLUMNS)

        def close(self) -> None:
            pass

    return TxnAssembler


def assemble_transactions_tws(
    events: DataFrame, ttl_ms: int | None = None
) -> DataFrame:
    """Commit-gated txn assembly via transformWithStateInPandas.

    Same contract as ``assemble_transactions_stream``: DML of committed
    transactions only, stamped with xid + commit_ts, wire-ordered within
    the transaction; uncommitted/aborted txns never emit. ``ttl_ms``
    evicts abandoned transactions' state (rollback invisibility GC) —
    requires ``timeMode='ProcessingTime'``, so leave it ``None`` for
    drain-and-stop (``availableNow``) runs.
    """
    from pyspark.sql import functions as F

    try:
        # either the real protobuf package or the vendored mini-runtime
        # (_vendor/pbshim, appended by the package __init__ when the
        # real one is absent)
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:  # pragma: no cover — env-dependent
        raise ImportError(
            "transformWithStateInPandas needs the google.protobuf package "
            "(its Python worker speaks protobuf to the JVM state server) "
            "or the vendored pbshim, which failed to load; "
            "use streaming.stateful.assemble_transactions_stream instead"
        ) from exc

    cols = ["op", "lsn", "lsn_long", "xid", "commit_ts", "schema", "table",
            "key", "before", "after"]
    ev = events.select(
        *[F.col(c) for c in cols if c in events.columns],
        *(
            [F.col("seq").cast("long").alias("seq")]
            if "seq" in events.columns
            # same fallback as assemble_transactions_stream: wal2json
            # carries intra-txn order in meta['pos'] (review r2 — a
            # NULL seq lost the tiebreaker and emitted arbitrary order)
            else [
                F.coalesce(
                    F.col("meta").getItem("pos").cast("long"), F.lit(0)
                ).alias("seq")
            ]
            if "meta" in events.columns
            else [F.lit(0).cast("long").alias("seq")]
        ),
    )
    return ev.groupBy("xid").transformWithStateInPandas(
        statefulProcessor=_txn_assembler_class()(ttl_ms),
        outputStructType=TXN_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="None" if ttl_ms is None else "ProcessingTime",
    )
