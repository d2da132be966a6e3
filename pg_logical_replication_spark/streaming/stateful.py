"""Stateful streaming transaction assembly — commit-gated emission.

The reference's stream is transactionally framed and **rolled-back
transactions are never streamed at all** (asserted by the reference's
pgoutput spec, ``decoder-pgoutput.spec.ts:260-274``) — PostgreSQL only
decodes committed WAL. When the engine's *input* is a raw message log
where a transaction's changes may arrive in a different micro-batch than
its COMMIT (or a crash leaves an unterminated transaction), that
guarantee has to be re-established engine-side. This operator does it
with ``applyInPandasWithState``:

* key = ``xid``; state = the transaction's buffered change rows;
* DML rows buffer; a ``commit`` row flushes the buffer downstream with
  ``commit_ts``/commit LSN stamped on every row (wire order preserved
  via ``lsn_long``/``seq`` sort);
* a transaction whose commit never arrives times out
  (``ProcessingTimeTimeout``) and its state is dropped — the streaming
  equivalent of rollback invisibility.

Scale: state per in-flight transaction is bounded by that transaction's
size; PG's ``logical_decoding_work_mem`` (64 MB default, reference
``postgresql-16.conf:145``) bounds the server side the same way. Keys
(xids) hash-distribute across executors; a mega-transaction is one hot
key — the same constraint the reference has (single connection), minus
everything else running in parallel around it.
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from typing import TYPE_CHECKING, Any

import pandas as pd

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.state import GroupState

# Buffered/emitted event shape (JSON-serialized in state; state schemas
# cannot hold maps).
_EVENT_FIELDS = [
    "op", "lsn", "lsn_long", "seq", "schema", "table", "key", "before", "after",
]

TXN_OUTPUT_SCHEMA = (
    "op string, lsn string, lsn_long long, seq long, xid long, "
    "commit_ts timestamp, schema string, table string, "
    "key map<string,string>, before map<string,string>, "
    "after map<string,string>"
)

STATE_SCHEMA = "buffered array<string>"

_DML_OPS = ("insert", "update", "delete", "truncate")


_OUT_COLUMNS = [
    "op", "lsn", "lsn_long", "seq", "xid", "commit_ts", "schema", "table",
    "key", "before", "after",
]


def _make_assemble(timeout_ms: int | None):
    """Closure over the timeout so executors see the configured value."""

    def _assemble(key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"):
        (xid,) = key
        if state.hasTimedOut:
            # abandoned (aborted/crashed) txn — rollback invisibility
            state.remove()
            return

        buffered: list[str] = list(state.get[0]) if state.exists else []
        commit: dict[str, Any] | None = None

        for pdf in pdfs:
            for row in pdf.to_dict("records"):
                op = row["op"]
                if op == "commit":
                    ts = row.get("commit_ts")
                    commit = {"commit_ts": None if ts is None or pd.isna(ts) else ts}
                elif op in _DML_OPS:
                    ev = {f: row.get(f) for f in _EVENT_FIELDS}
                    for f in ("lsn_long", "seq"):
                        v = ev.get(f)
                        ev[f] = None if v is None or pd.isna(v) else int(v)
                    # maps can surface as (k, v) pair-lists depending on
                    # the Arrow→pandas runtime (see _as_dict); normalize
                    # like the sibling gates so the JSON round-trip
                    # restores dicts. commit_ts is stamped from the
                    # commit row at emission — never buffer the
                    # non-JSON-serializable pre-commit placeholder.
                    for f in ("key", "before", "after"):
                        ev[f] = _as_dict(ev.get(f))
                    ev["commit_ts"] = None
                    buffered.append(json.dumps(ev))
                # 'begin' rows only open the frame; nothing to buffer

        if commit is not None:
            rows = [json.loads(s) for s in buffered]
            rows.sort(key=lambda r: (r.get("lsn_long") or 0, r.get("seq") or 0))
            for r in rows:
                r["xid"] = xid
                r["commit_ts"] = commit["commit_ts"]
            state.remove()
            if rows:
                yield pd.DataFrame(rows, columns=_OUT_COLUMNS)
        else:
            state.update((buffered,))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)

    return _assemble


def assemble_transactions_stream(
    events: DataFrame, timeout_ms: int | None = None
) -> DataFrame:
    """Streaming ChangeEvents → committed-transaction rows only.

    Input: the decoded stream including ``begin``/``commit`` markers
    (e.g. ``decode_wal2json(..., include_transaction_markers=True)``).
    Output: DML rows of committed transactions, stamped with xid +
    commit_ts, in commit order within each transaction. Uncommitted
    transactions are withheld (never emitted — rollback invisibility
    holds regardless of timeout config).

    ``timeout_ms`` additionally GARBAGE-COLLECTS abandoned transactions'
    state after that much processing-time silence. Leave it ``None``
    for drain-and-stop (``availableNow``) runs: registering a
    processing-time timeout keeps the query alive waiting to fire it,
    so the trigger never terminates. Set it only for continuously
    running queries.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    cols = ["op", "lsn", "lsn_long", "xid", "commit_ts", "schema", "table",
            "key", "before", "after"]
    ev = events.select(
        *[F.col(c) for c in cols if c in events.columns],
        *(
            [F.col("seq").cast("long").alias("seq")]
            if "seq" in events.columns
            else [F.coalesce(F.col("meta").getItem("pos").cast("long"), F.lit(0)).alias("seq")]
        ),
    )
    return ev.groupBy("xid").applyInPandasWithState(
        _make_assemble(timeout_ms),
        outputStructType=TXN_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )


# --------------------------------------- chunked-JSON stream reassembly
def _make_reassemble():
    def _reassemble(key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"):
        import re as _re

        carry, depth, start_seq = (
            state.get if state.exists else ("", 0, 0)
        )
        frags: list[tuple[int, str]] = []
        for pdf in pdfs:
            for row in pdf.to_dict("records"):
                v = row.get("value")
                if v is None or not str(v).strip():
                    continue
                frags.append((int(row["seq"]), str(v)))
        frags.sort()  # wire order within the micro-batch
        out: list[tuple[int, str]] = []
        for seq, val in frags:
            stripped = _re.sub(r'"[^"\\]*(?:\\.[^"\\]*)*"', "", val)
            delta = stripped.count("{") - stripped.count("}")
            if not carry:
                start_seq = seq
            carry += val
            depth += delta
            if depth == 0:
                out.append((start_seq, carry))
                carry, depth = "", 0
        state.update((carry, depth, start_seq))
        if out:
            yield pd.DataFrame(out, columns=["seq", "value"])

    return _reassemble


def reassemble_json_documents_stream(
    raw: DataFrame,
    value_col: str = "value",
    order_col: str = "seq",
    slot_col: str | None = None,
) -> DataFrame:
    """Streaming twin of
    :func:`~pg_logical_replication_spark.sources.wal2json.reassemble_json_documents`:
    wal2json ``write-in-chunks`` / ``pretty-print`` fragments → one row
    per complete JSON document, with a partial document CARRIED ACROSS
    micro-batches in keyed state until its closing brace arrives.

    State per slot is one pending document (text, brace depth, starting
    seq) — O(max document size), independent of stream length. Fragments
    must arrive in ``order_col`` wire order per slot and split only at
    structural boundaries (never inside a string literal) — the
    plugin's own chunking contract. Emission is append-mode: a document
    row appears in the micro-batch that completes it.

    ``slot_col`` keys the state (N slots reassemble in parallel);
    without it the whole stream is one slot — serial, like the
    transport that produced it.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    key = slot_col if slot_col is not None else "__slot"
    df = raw.select(
        *( [F.col(slot_col)] if slot_col is not None else [F.lit(0).alias(key)] ),
        F.col(order_col).cast("long").alias("seq"),
        F.col(value_col).cast("string").alias("value"),
    )
    out = df.groupBy(key).applyInPandasWithState(
        _make_reassemble(),
        outputStructType="seq long, value string",
        stateStructType="carry string, depth long, start_seq long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    renames = out.withColumnRenamed("seq", order_col).withColumnRenamed(
        "value", value_col
    )
    return renames


# ------------------------------------------- streamed (protocol v2) txns
STREAM_STATE_SCHEMA = "buffered array<string>, aborted array<long>"


def _make_stream_resolve(timeout_ms: int | None, reemit_unmatched_fates: bool = True):
    def _resolve(key: tuple, pdfs: Iterator[pd.DataFrame], state: "GroupState"):
        (top_xid,) = key
        if state.hasTimedOut:
            state.remove()  # fate never arrived (crash) — withhold
            return

        if state.exists:
            buffered = list(state.get[0])
            aborted = set(state.get[1])
        else:
            buffered, aborted = [], set()

        rows: list[dict[str, Any]] = []
        for pdf in pdfs:
            rows.extend(pdf.to_dict("records"))
        rows.sort(key=lambda r: (
            0 if r.get("lsn_long") is None or pd.isna(r.get("lsn_long")) else int(r["lsn_long"]),
            0 if r.get("seq") is None or pd.isna(r.get("seq")) else int(r.get("seq")),
        ))

        # A key whose ONLY traffic ever is commit_prepared/rollback_
        # prepared has no buffered state to gate. When this operator is
        # the streamed-only gate (reemit_unmatched_fates=True), that
        # means a PLAIN 2PC transaction whose b..P changes took the
        # passthrough branch — emit the fate rows unchanged so a
        # downstream prepared-frame gate (e.g. batch resolve_prepared in
        # a foreachBatch sink) can consume them. When it is the COMBINED
        # gate (False), nothing downstream wants fates: a state-less
        # fate is a zero-DML prepared txn or a timeout-GC'd streamed
        # txn's late fate — swallow it, matching the batch resolvers.
        if not state.exists and rows and all(
            r["op"] in ("commit_prepared", "rollback_prepared") for r in rows
        ):
            if not reemit_unmatched_fates:
                return
            out = []
            for row in rows:
                ev = {f: row.get(f) for f in _EVENT_FIELDS}
                for f in ("lsn_long", "seq"):
                    v = ev.get(f)
                    ev[f] = None if v is None or pd.isna(v) else int(v)
                ev["xid"] = top_xid
                ts = row.get("commit_ts")
                ev["commit_ts"] = None if ts is None or pd.isna(ts) else ts
                ev["key"] = _as_dict(ev.get("key"))
                ev["before"] = _as_dict(ev.get("before"))
                ev["after"] = _as_dict(ev.get("after"))
                out.append(ev)
            yield pd.DataFrame(out, columns=_OUT_COLUMNS)
            return

        commit: dict[str, Any] | None = None
        for row in rows:
            op = row["op"]
            if op in ("stream_commit", "commit_prepared"):
                ts = row.get("commit_ts")
                commit = {"commit_ts": None if ts is None or pd.isna(ts) else ts}
            elif op == "rollback_prepared":  # streamed 2PC rolled back
                if state.exists:
                    state.remove()
                return
            elif op == "stream_prepare":
                pass  # informational: fate is the later K/r by xid
            elif op == "stream_abort":
                sub = row.get("_subxid")
                sub = None if sub is None or pd.isna(sub) else int(sub)
                if sub is None or sub == top_xid:  # top-level abort
                    state.remove()
                    return
                aborted.add(sub)
            elif op in _DML_OPS:
                ev = {f: row.get(f) for f in _EVENT_FIELDS}
                for f in ("lsn_long", "seq"):
                    v = ev.get(f)
                    ev[f] = None if v is None or pd.isna(v) else int(v)
                rx = row.get("xid")
                ev["_rowxid"] = None if rx is None or pd.isna(rx) else int(rx)
                ev["key"] = _as_dict(ev.get("key"))
                ev["before"] = _as_dict(ev.get("before"))
                ev["after"] = _as_dict(ev.get("after"))
                buffered.append(json.dumps(ev))

        if commit is not None:
            out = []
            for s in buffered:
                ev = json.loads(s)
                if ev.pop("_rowxid", None) in aborted:
                    continue
                ev["xid"] = top_xid
                ev["commit_ts"] = commit["commit_ts"]
                out.append(ev)
            out.sort(key=lambda r: (r.get("lsn_long") or 0, r.get("seq") or 0))
            state.remove()
            if out:
                yield pd.DataFrame(out, columns=_OUT_COLUMNS)
        else:
            state.update((buffered, sorted(aborted)))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)

    return _resolve


def resolve_streamed_stream(
    events: DataFrame, timeout_ms: int | None = None, passthrough: bool = True
) -> DataFrame:
    """Streaming commit gate for pgoutput protocol-v2 streamed txns.

    The batch resolver (``operators.transactions.resolve_streamed``)
    attributes changes to segments positionally — a window, unsupported
    on streaming DataFrames. Here attribution already happened at decode
    time: ``decode_pgoutput`` stamps every streamed DML row with its
    segment's top-level xid (``meta['stream_top_xid']``), so the stream
    groups by that key and buffers until the fate row arrives — in this
    or ANY LATER micro-batch:

    * ``stream_commit`` → flush the buffer (minus aborted
      subtransactions), commit_ts + top xid stamped, wire order
      preserved;
    * ``stream_abort`` with subxid = xid → drop everything (top-level
      rollback invisibility); subxid ≠ xid → drop just that
      subtransaction's rows, past and future;
    * no fate + ``timeout_ms`` elapsed → state GC'd, nothing emitted.

    ``passthrough=True`` unions non-streamed rows (begin/commit-framed
    v1 traffic) through untouched, so the operator is drop-in on a mixed
    stream. ``commit_prepared``/``rollback_prepared`` fates whose key
    has no streamed state (plain 2PC transactions — their b..P changes
    take the passthrough branch) are re-emitted rather than swallowed,
    so a downstream prepared-frame gate still sees them. State per in-flight streamed txn is bounded by that txn's
    change volume — the same bound PG's reorderbuffer spills under;
    keys hash-distribute across executors.
    """
    from pyspark.sql import functions as F

    top = F.col("meta").getItem("stream_top_xid").cast("long")
    ctrl_ops = ["stream_start", "stream_stop"]
    return _gated_stream(events, top, ctrl_ops, timeout_ms, passthrough)


def resolve_transactions_stream(
    events: DataFrame, timeout_ms: int | None = None, passthrough: bool = True
) -> DataFrame:
    """One stateful gate for BOTH transaction shapes on a mixed stream:
    protocol-v2 streamed txns AND plain two-phase (b..P framed) txns.

    Spark allows one arbitrary-stateful operator per streaming query, so
    chaining ``resolve_streamed_stream`` with a prepared gate is not an
    option — this combines them. Keying uses the decode-time stamps
    (``decode_pgoutput``): ``meta['stream_top_xid']`` for streamed rows,
    ``meta['prepared_xid']`` for b..P-framed rows (frames are atomic
    wire blocks, so the stamp is exact); fates carry their xid natively.
    Fate handling is shared: ``stream_commit``/``commit_prepared``
    flush, ``stream_abort``/``rollback_prepared`` drop, and a fate whose
    key never buffered anything re-emits (see the fate-only passthrough
    note in ``_make_stream_resolve``). ``begin_prepare``/``prepare``
    markers are consumed like stream controls; plain v1 traffic passes
    through when ``passthrough``.
    """
    from pyspark.sql import functions as F

    top = F.coalesce(
        F.col("meta").getItem("stream_top_xid").cast("long"),
        F.col("meta").getItem("prepared_xid").cast("long"),
    )
    ctrl_ops = ["stream_start", "stream_stop", "begin_prepare", "prepare"]
    return _gated_stream(
        events, top, ctrl_ops, timeout_ms, passthrough,
        reemit_unmatched_fates=False,
    )


# Measured aip-vs-tws crossover (SCALE.md round 6, RocksDB store,
# one txn held open across micro-batches, fate last): 64k buffered rows
# aip wins (18.5 vs 30.2 s — tws pays per-batch state-server protocol
# constants), ~192k near-tie, 500k ListState wins x1.56 and the gap
# grows quadratically (aip rewrites the whole buffer per batch; tws
# appends). This constant is that measurement, not an asymptotic guess.
TXN_GATE_LISTSTATE_CROSSOVER_ROWS = 200_000


def _pick_gate_backend(backend: str, expected_txn_rows: int | None) -> str:
    if backend not in ("auto", "aip", "tws"):
        raise ValueError(
            f"backend={backend!r}: expected 'auto', 'aip', or 'tws'"
        )
    if backend != "auto":
        return backend
    if (
        expected_txn_rows is not None
        and expected_txn_rows >= TXN_GATE_LISTSTATE_CROSSOVER_ROWS
    ):
        return "tws"
    return "aip"


def resolve_streamed_gate(
    events: DataFrame,
    backend: str = "auto",
    expected_txn_rows: int | None = None,
    timeout_ms: int | None = None,
    passthrough: bool = True,
) -> DataFrame:
    """Streamed-txn commit gate with an explicit state-backend pick —
    the deployment rule from SCALE.md r6 as a flag (VERDICT r6 #7).

    ``backend='aip'`` is the ``applyInPandasWithState`` form (lower
    per-batch constants — wins for OLTP-shaped transactions);
    ``backend='tws'`` is the ``transformWithStateInPandas`` ListState
    twin (per-batch APPEND instead of full-buffer rewrite — wins when
    one transaction buffers ~2×10⁵+ changes, exactly the workloads
    ``logical_decoding_work_mem`` streaming exists for). ``'auto'``
    picks by ``expected_txn_rows`` (e.g. the workload's
    ``logical_decoding_work_mem`` row estimate) against the MEASURED
    crossover ``TXN_GATE_LISTSTATE_CROSSOVER_ROWS``; with no estimate
    it stays on aip, the right default for typical OLTP streams. The
    two backends are contract-identical (agreement-tested on the full
    scenario matrix in tests/test_tws.py). Note the tws backend needs
    the RocksDB state store provider
    (``spark.sql.streaming.stateStore.providerClass`` →
    ``...state.RocksDBStateStoreProvider``) — the default HDFS store
    has no column families and fails the query at start."""
    if _pick_gate_backend(backend, expected_txn_rows) == "tws":
        from pg_logical_replication_spark.streaming.tws import (
            resolve_streamed_tws,
        )

        return resolve_streamed_tws(
            events, ttl_ms=timeout_ms, passthrough=passthrough
        )
    return resolve_streamed_stream(
        events, timeout_ms=timeout_ms, passthrough=passthrough
    )


def resolve_transactions_gate(
    events: DataFrame,
    backend: str = "auto",
    expected_txn_rows: int | None = None,
    timeout_ms: int | None = None,
    passthrough: bool = True,
) -> DataFrame:
    """Combined streamed + plain-2PC gate with the same backend flag as
    :func:`resolve_streamed_gate` (see its docstring for the measured
    crossover semantics)."""
    if _pick_gate_backend(backend, expected_txn_rows) == "tws":
        from pg_logical_replication_spark.streaming.tws import (
            resolve_transactions_tws,
        )

        return resolve_transactions_tws(
            events, ttl_ms=timeout_ms, passthrough=passthrough
        )
    return resolve_transactions_stream(
        events, timeout_ms=timeout_ms, passthrough=passthrough
    )


def gate_frames(
    events: DataFrame, top, ctrl_ops: list[str], prefix: str
) -> tuple[DataFrame, DataFrame, str]:
    """Shared scaffolding for BOTH stateful-backend gates (this module's
    applyInPandasWithState form and streaming/tws.py's
    transformWithStateInPandas twin): the streamish predicate, the
    gate-input projection, and the passthrough remainder — one source of
    truth so the two contractually-agreeing gates cannot drift
    (round-6 review #6; they already had once, over the tws Arrow
    bridge's leading-underscore column rename — hence ``prefix``).

    Returns ``(gate_input, passthrough_rest, key_col_name)`` where
    gate_input carries ``{prefix}top`` / ``{prefix}subxid``.
    """
    from pyspark.sql import functions as F

    is_fate = F.col("op").isin(
        "stream_commit", "stream_abort", "stream_prepare",
        "commit_prepared", "rollback_prepared",
    )
    is_ctrl = F.col("op").isin(*ctrl_ops)
    streamish = (top.isNotNull() | is_fate) & ~is_ctrl

    cols = ["op", "lsn", "lsn_long", "xid", "commit_ts", "schema", "table",
            "key", "before", "after"]
    seq_cols = (
        [F.col("seq").cast("long").alias("seq")]
        if "seq" in events.columns
        else [F.lit(None).cast("long").alias("seq")]
    )
    key_col = f"{prefix}top"
    gate_input = events.filter(streamish).select(
        *[F.col(c) for c in cols if c in events.columns],
        *seq_cols,
        F.coalesce(top, F.col("xid")).alias(key_col),
        F.col("meta").getItem("subxid").cast("long").alias(f"{prefix}subxid"),
    )
    rest = events.filter(~streamish & ~is_ctrl).select(
        *[
            F.col(c) if c in events.columns else F.lit(None).cast("string").alias(c)
            for c in ["op", "lsn"]
        ],
        F.col("lsn_long"),
        *seq_cols,
        F.col("xid"),
        F.col("commit_ts"),
        F.col("schema"),
        F.col("table"),
        F.col("key"),
        F.col("before"),
        F.col("after"),
    )
    return gate_input, rest, key_col


def _gated_stream(
    events: DataFrame,
    top,
    ctrl_ops: list[str],
    timeout_ms: int | None,
    passthrough: bool,
    reemit_unmatched_fates: bool = True,
) -> DataFrame:
    from pyspark.sql.streaming.state import GroupStateTimeout

    gate_input, rest, key_col = gate_frames(events, top, ctrl_ops, "_")
    gated = gate_input.groupBy(key_col).applyInPandasWithState(
        _make_stream_resolve(timeout_ms, reemit_unmatched_fates),
        outputStructType=TXN_OUTPUT_SCHEMA,
        stateStructType=STREAM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if timeout_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
    if not passthrough:
        return gated
    return gated.unionByName(rest)


# --------------------------------------------------------------- TOAST fill
# the TOAST-fill output IS the ChangeEvent shape the txn gate emits —
# aliased, not restated, so a schema change can't desynchronize them
TOAST_OUTPUT_SCHEMA = TXN_OUTPUT_SCHEMA
_TOAST_OUT_COLS = _OUT_COLUMNS


def _as_dict(v):
    if v is None or isinstance(v, dict):
        return v
    try:  # Arrow map columns surface in pandas as a list of (k, v) pairs
        return dict(v)
    except (TypeError, ValueError):
        return None


def _make_toast_fill():
    def _fill(key, pdfs: Iterator[pd.DataFrame], state: "GroupState"):
        img: dict[str, Any] = json.loads(state.get[0]) if state.exists else {}
        rows: list[dict[str, Any]] = []
        for pdf in pdfs:
            rows.extend(pdf.to_dict("records"))
        rows.sort(key=lambda r: (
            0 if r.get("lsn_long") is None or pd.isna(r.get("lsn_long")) else int(r["lsn_long"]),
            0 if r.get("seq") is None or pd.isna(r.get("seq")) else int(r.get("seq")),
        ))
        out = []
        for row in rows:
            after = _as_dict(row.get("after"))
            if after is not None:
                toasted = set((row.get("_toast") or "").split(",")) - {""}
                for c in toasted:
                    if after.get(c) is None and c in img:
                        after[c] = img[c]
                # post-fill image is the next event's prior image; explicit
                # SQL NULLs (None outside the toast set) overwrite it
                img.update(after)
            # map-typed outputs must be dicts for the Arrow conversion
            row["after"] = after
            row["key"] = _as_dict(row.get("key"))
            row["before"] = _as_dict(row.get("before"))
            out.append({f: row.get(f) for f in _TOAST_OUT_COLS})
        state.update((json.dumps(img),))
        if out:
            yield pd.DataFrame(out, columns=_TOAST_OUT_COLS)

    return _fill


def toast_fill_stream(events: DataFrame, key_columns: list[str]) -> DataFrame:
    """Streaming unchanged-TOAST completion across micro-batches.

    The batch operator (``operators.apply_changes.toast_fill``) fills
    from prior images *within the DataFrame it is given*; in a live
    stream the prior image of a key usually committed in an EARLIER
    micro-batch, so the fill needs per-key state. State = the key's last
    post-fill row image (one image per key — bounded the way a replica
    table is); columns to fill come from each row's own
    ``meta['unchanged_toast']`` marker (pgoutput 'u' kind,
    reference ``pgoutput-parser.ts:260-261``), so no column list is
    configured. Explicit SQL NULLs overwrite the stored image and are
    never themselves overwritten — same contract as the batch operator.

    Scale: grouped on (table, key) — the same partitioning apply-changes
    uses; state is one row image per live key, the same asymptote as the
    MOR snapshot itself.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    # null parts map to an explicit sentinel: concat_ws SKIPS nulls, so
    # (NULL,'x') and ('x',NULL) would otherwise collide on one state key
    identity = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(
                F.col("key").getItem(k),
                F.col("after").getItem(k),
                F.lit("\x1e"),
            )
            for k in key_columns
        ],
    )
    ev = events.select(
        *[F.col(c) for c in _TOAST_OUT_COLS if c in events.columns],
        *(
            []
            if "seq" in events.columns
            else [F.lit(None).cast("long").alias("seq")]
        ),
        F.col("meta").getItem("unchanged_toast").alias("_toast"),
        identity.alias("_identity"),
    )
    # schema is part of the state key: public.users(id=1) and
    # audit.users(id=1) must not share a TOAST image
    return ev.groupBy("schema", "table", "_identity").applyInPandasWithState(
        _make_toast_fill(),
        outputStructType=TOAST_OUTPUT_SCHEMA,
        stateStructType="img string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
