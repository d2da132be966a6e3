"""wal2json decoder — Spark built-ins only, zero UDFs.

The reference parses a wal2json changeset with one ``JSON.parse`` call
(reference ``src/output-plugins/wal2json/wal2json-plugin.ts:31-34``); the
output shape — ``{change: [{kind, schema, table, columnnames, columntypes,
columnvalues, oldkeys}], xid, nextlsn, timestamp}`` — is documented in
``wal2json-plugin-output.type.ts:1-66``.

Here the whole decode is declarative: ``from_json`` → ``posexplode`` →
``map_from_arrays``. Catalyst sees every step, so column pruning and filter
pushdown reach the raw scan — e.g. a downstream
``filter(col('table') == 'users')`` mirrors the plugin's server-side
``filter-tables`` option (``wal2json-plugin-options.type.ts:83-119``)
without any custom source code, and at 100 TB the JSON parse runs
JVM-side in whole-stage codegen (no Python worker round-trip).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pg_logical_replication_spark.model import lsn_long_expr

# Heterogeneous JSON values (numbers / bools / strings) are read as
# StringType — Spark's JSON reader stringifies any scalar token — which is
# exactly the text-format value domain of the normalized ChangeEvent map.
WAL2JSON_SCHEMA = (
    "struct<"
    "  change: array<struct<"
    "    kind: string, schema: string, table: string,"
    "    columnnames: array<string>, columntypes: array<string>,"
    "    columnvalues: array<string>,"
    "    oldkeys: struct<keynames: array<string>, keytypes: array<string>,"
    "                    keyvalues: array<string>>,"
    "    origin: string,"
    # logical messages (kind='message'; wal2json messages support)
    "    prefix: string, content: string, transactional: boolean,"
    # enrichment options the plugin can be asked to emit
    # (include-column-positions / include-type-oids / include-not-null /
    # include-default / include-pk, wal2json-plugin-options.type.ts:38-59);
    # absent fields parse as null at zero cost
    "    columnpositions: array<int>, columntypeoids: array<bigint>,"
    "    columnoptionals: array<boolean>, columndefaults: array<string>,"
    "    pk: struct<pknames: array<string>, pktypes: array<string>>"
    "  >>,"
    "  xid: bigint, nextlsn: string, timestamp: string"
    ">"
)


def reassemble_json_documents(
    raw: DataFrame,
    value_col: str = "value",
    order_col: str = "seq",
    lsn_col: str | None = None,
    partition_col: str | None = None,
) -> DataFrame:
    """Fragments → complete JSON documents, Spark built-ins only.

    wal2json's ``write-in-chunks`` emits a changeset as several output
    chunks (header / per-change / footer) and ``pretty-print`` spreads
    one document across many lines
    (``wal2json-plugin-options.type.ts:65-74``); the reference's
    ``JSON.parse`` swallows any whole-buffer shape, but a line/frame
    decoder sees partial documents. This pre-pass stitches fragments
    back into one row per complete JSON document so the SAME
    ``decode_wal2json`` runs unchanged downstream.

    Mechanism (all JVM-side, whole-stage codegen): string literals are
    stripped with one ``regexp_replace`` (escape-aware), per-fragment
    brace depth delta is a ``translate``/``length`` count, a running
    window sum finds the rows where depth returns to zero (document
    ends), and a second window numbers documents; fragments then group
    by document id and concatenate in ``order_col`` order. An
    incomplete trailing document (depth never closed — e.g. a live
    stream caught mid-changeset) is HELD BACK, not emitted broken.

    Contract: fragments split at structural boundaries, never inside a
    string literal — which is how the plugin writes them (it emits
    whole tokens per chunk). ``order_col`` must give the wire order.

    Scale: reassembly of one slot's stream is inherently serial (the
    same reason transport ingest is — fragments interleave in wire
    order), so the default single window matches the data's true
    shape; pass ``partition_col`` (e.g. the segment/file id) when
    chunk boundaries are known not to cross partitions and the window
    parallelizes per partition.
    """
    from pyspark.sql import Window

    # strip string literals (handles \" escapes), then count braces.
    # Unrolled-loop form of the literal matcher (optimization r10):
    # "[^"\]*(\.[^"\]*)* recognizes exactly the same language as the
    # alternation ("(\.|[^"\])*") but without per-character backtracking
    # between branches — measured 2x on the 300k-fragment reassembly
    # pass, verified equal on adversarial escape sequences.
    stripped = F.regexp_replace(
        F.col(value_col), '"[^"\\\\]*(\\\\.[^"\\\\]*)*"', ""
    )
    n_open = F.length(stripped) - F.length(F.translate(stripped, "{", ""))
    n_close = F.length(stripped) - F.length(F.translate(stripped, "}", ""))

    base = (
        Window.partitionBy(partition_col)
        if partition_col is not None
        else Window.partitionBy()
    )
    w_cum = base.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_prev = base.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, -1
    )

    df = raw.filter(F.length(F.trim(F.col(value_col))) > 0).withColumn(
        "__delta", n_open - n_close
    )
    df = df.withColumn("__cum", F.sum("__delta").over(w_cum))
    df = df.withColumn(
        "__doc",
        F.coalesce(
            F.sum(F.when(F.col("__cum") == 0, 1).otherwise(0)).over(w_prev),
            F.lit(0),
        ),
    )
    keys = ([partition_col] if partition_col is not None else []) + ["__doc"]
    # Global window: it leaves ONE partition, which trivially satisfies
    # the groupBy's clustering — Spark would run the whole aggregation
    # (and everything above it) serially; redistribute on the document
    # id so only the depth scan is serial. Partitioned window: its
    # hashpartitioning(partition_col) ALSO satisfies the clustering, but
    # skipping this repartition measured SLOWER (3.3 → 4.2 s at sf0.1):
    # AQE coalesces the window's exchange by byte size, and the stitch +
    # downstream decode then run on those few coalesced partitions —
    # the explicit repartition buys back full-width parallelism for the
    # CPU-bound stages and is worth the second byte shuffle.
    df = df.repartition(*keys)
    aggs = [
        F.min(order_col).alias(order_col),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(order_col).alias("s"),
                            F.col(value_col).alias("v"),
                        )
                    )
                ),
                lambda x: x["v"],
            ),
            "",
        ).alias(value_col),
        F.max_by("__cum", F.col(order_col)).alias("__final_depth"),
    ]
    if lsn_col is not None:
        aggs.append(F.min_by(lsn_col, F.col(order_col)).alias(lsn_col))
    out = df.groupBy(*keys).agg(*aggs)
    # held-back incomplete tail: final depth != 0 means the document's
    # closing brace has not arrived yet
    out = out.filter(F.col("__final_depth") == 0)
    return out.drop("__doc", "__final_depth")


def table_pattern_pred(patterns: list[str]):
    """wal2json table-pattern list → boolean Column over (schema, table).

    Patterns are ``schema.table`` with ``*`` wildcards on either side
    (wal2json's filter-tables / add-tables syntax — the server-side
    option the reference serializes, ``wal2json-plugin.ts:18-29`` /
    ``wal2json-plugin-options.type.ts``). Evaluated as a JVM-side OR
    chain, so Catalyst can push it through the decode projections and,
    on table-partitioned layouts, into partition pruning.
    """
    pred = F.lit(False)
    for pat in patterns:
        sch, _, tbl = pat.rpartition(".")
        sch = sch or "*"
        p = F.lit(True)
        if sch != "*":
            p = p & (F.col("schema") == sch)
        if tbl != "*":
            p = p & (F.col("table") == tbl)
        pred = pred | p
    return pred


# format-version 2 (wal2json docs; the reference serializes the option at
# wal2json-plugin-options.type.ts:112-114): ONE JSON object per action —
# B/C/I/U/D/T/M lines with columns/identity as arrays of {name,type,value}.
WAL2JSON_V2_SCHEMA = (
    "struct<"
    "  action: string, schema: string, table: string,"
    "  xid: bigint, timestamp: string, lsn: string,"
    "  columns: array<struct<name: string, type: string, value: string>>,"
    "  identity: array<struct<name: string, type: string, value: string>>,"
    "  prefix: string, content: string, transactional: boolean"
    ">"
)

_V2_OPS = {
    "B": "begin", "C": "commit", "I": "insert", "U": "update",
    "D": "delete", "T": "truncate", "M": "message",
}


def decode_wal2json_v2(
    raw: DataFrame,
    value_col: str = "value",
    lsn_col: str | None = None,
    include_transaction_markers: bool = False,
    filter_tables: list[str] | None = None,
    add_tables: list[str] | None = None,
    actions: list[str] | None = None,
    filter_msg_prefixes: list[str] | None = None,
    add_msg_prefixes: list[str] | None = None,
    include_typmod: bool = True,
) -> DataFrame:
    """wal2json ``format-version 2`` lines → normalized ChangeEvent rows.

    v2 emits one JSON object PER ACTION (no changeset array), so the
    decode is a straight ``from_json`` projection — no explode at all,
    strictly narrower than v1. B/C framing lines are native to the
    format; they are dropped unless ``include_transaction_markers`` to
    match ``decode_wal2json``'s default surface. Option pushdown
    (filter/add tables, actions) is identical to v1.
    """
    name_of = {v: k for k, v in _V2_OPS.items()}

    def entries(col):
        return F.map_from_entries(
            F.transform(F.col(col), lambda c: F.struct(c["name"], c["value"]))
        )

    parsed = raw.select(
        F.from_json(F.col(value_col), WAL2JSON_V2_SCHEMA).alias("a"),
        (F.col(lsn_col) if lsn_col else F.col("a.lsn")).alias("_lsn"),
    ).filter(F.col("a.action").isNotNull())

    op = parsed["a.action"]
    out = parsed.select(
        F.coalesce(
            *[F.when(op == k, F.lit(v)) for k, v in _V2_OPS.items()]
        ).alias("op"),
        F.col("_lsn").alias("lsn"),
        lsn_long_expr("_lsn").alias("lsn_long"),
        F.col("a.xid").alias("xid"),
        F.to_timestamp(F.col("a.timestamp")).alias("commit_ts"),
        F.col("a.schema").alias("schema"),
        F.col("a.table").alias("table"),
        F.when(F.col("a.identity").isNotNull(), entries("a.identity")).alias("key"),
        F.lit(None).cast("map<string,string>").alias("before"),
        F.when(F.col("a.columns").isNotNull(), entries("a.columns")).alias("after"),
        F.map_concat(
            F.when(
                F.col("a.columns").isNotNull(),
                F.create_map(
                    F.lit("coltypes"),
                    F.array_join(
                        F.transform(
                            F.col("a.columns"),
                            (lambda c: c["type"])
                            if include_typmod
                            else (lambda c: strip_typmod(c["type"])),
                        ),
                        ",",
                    ),
                ),
            ).otherwise(F.create_map().cast("map<string,string>")),
            F.when(
                F.col("a.prefix").isNotNull(),
                F.create_map(
                    F.lit("prefix"), F.col("a.prefix"),
                    F.lit("content"), F.col("a.content"),
                ),
            ).otherwise(F.create_map().cast("map<string,string>")),
        ).alias("meta"),
    )

    if not include_transaction_markers:
        out = out.filter(~F.col("op").isin("begin", "commit"))
    # table/action pushdown applies to CHANGE rows only: B/C markers
    # carry null schema/table, so a bare predicate evaluates to NULL and
    # silently drops the transaction framing (review r2) — v1 keeps
    # markers unconditionally, v2 must match
    is_marker = F.col("op").isin("begin", "commit")
    # M lines carry no schema/table either — exempt them from table
    # predicates like the markers (they have their own prefix filters)
    is_msg = F.col("op") == "message"
    if add_tables:
        out = out.filter(is_marker | is_msg | table_pattern_pred(add_tables))
    if filter_tables:
        out = out.filter(
            is_marker
            | is_msg
            | ~F.coalesce(table_pattern_pred(filter_tables), F.lit(False))
        )
    if actions:
        out = out.filter(is_marker | F.col("op").isin(list(actions)))
    if filter_msg_prefixes:
        pfx = F.col("meta").getItem("prefix")
        out = out.filter(
            ~(is_msg & F.coalesce(pfx.isin(list(filter_msg_prefixes)), F.lit(False)))
        )
    if add_msg_prefixes:
        pfx = F.col("meta").getItem("prefix")
        out = out.filter(
            ~is_msg | F.coalesce(pfx.isin(list(add_msg_prefixes)), F.lit(False))
        )
    return out


def _opt_map(cond, *kv) -> Column:
    """Conditional meta fragment: {k: v, ...} when ``cond``, else {}."""
    empty = F.create_map().cast("map<string,string>")
    return F.when(cond, F.create_map(*kv)).otherwise(empty)


def _csv(col) -> Column:
    """Array → comma-joined string meta value (positions/oids/flags —
    element domains that cannot contain commas)."""
    return F.array_join(F.transform(col, lambda x: x.cast("string")), ",")


def strip_typmod(type_col) -> Column:
    """Remove type modifiers: ``varchar(20)`` → ``varchar``,
    ``numeric(10,2)`` → ``numeric`` — the decoder-side realization of the
    plugin's ``include-typmod=false`` (options type :21-24)."""
    return F.regexp_replace(type_col, r"\([^)]*\)", "")


def decode_wal2json(
    raw: DataFrame,
    value_col: str = "value",
    lsn_col: str | None = None,
    include_transaction_markers: bool = False,
    filter_tables: list[str] | None = None,
    add_tables: list[str] | None = None,
    actions: list[str] | None = None,
    filter_origins: list[str] | None = None,
    filter_msg_prefixes: list[str] | None = None,
    add_msg_prefixes: list[str] | None = None,
    include_typmod: bool = True,
    format_version: int = 1,
    reassemble_chunks: bool = False,
    order_col: str = "seq",
) -> DataFrame:
    """Raw JSON changesets (one per row) → normalized ChangeEvent rows.

    ``lsn_col`` optionally names a column carrying the wire LSN (the
    reference takes it from the XLogData header,
    ``logical-replication-service.ts:151-152``); when absent we use the
    changeset's ``nextlsn``. One changeset = one committed transaction, so
    intra-transaction order is the change-array index; we fold it into the
    ordering key ``lsn_long`` is derived from.

    ``include_transaction_markers`` adds ``begin``/``commit`` rows framing
    each transaction, mirroring pgoutput's B/C messages so downstream
    transaction assembly is format-agnostic.

    ``filter_tables`` (exclude), ``add_tables`` (include-only) and
    ``actions`` (op include-list) are the reference's server-side
    wal2json option pushdown (#12, ``wal2json-plugin.ts:18-29``): here
    they are declarative filters attached directly to the decode plan —
    Catalyst collapses them into the scan stage, so excluded tables
    never reach a shuffle (and never leave the scan on
    table-partitioned file layouts).

    ``filter_msg_prefixes`` / ``add_msg_prefixes`` apply to logical
    messages only (``kind='message'`` entries carrying prefix/content —
    wal2json messages support): exclusion runs before inclusion, exactly
    the plugin's documented order (options type :100-109). ``actions``
    treats ``'message'`` as a filterable op like the plugin does.

    ``include_typmod=False`` normalizes type modifiers away
    (``varchar(20)`` → ``varchar``) in the surfaced column types — the
    decoder-side twin of the plugin's emission toggle. The enrichment
    columns the plugin can add (``include-column-positions``,
    ``include-type-oids``, ``include-not-null``, ``include-default``,
    ``include-pk``) are surfaced automatically whenever present in the
    JSON: meta keys ``colpositions``/``coltypeoids``/``coloptionals``
    (comma-joined), ``coldefaults`` (JSON array — defaults may contain
    commas), ``pknames``/``pktypes``.

    ``format_version=2`` dispatches to :func:`decode_wal2json_v2` (the
    reference's ``formatVersion`` option, options type :112-114).

    ``reassemble_chunks=True`` prepends
    :func:`reassemble_json_documents` so ``write-in-chunks`` /
    ``pretty-print`` streams (fragments in ``order_col`` wire order)
    decode identically to whole-document streams.
    """
    if reassemble_chunks:
        if raw.isStreaming:
            # stateful streaming twin: partial documents carry across
            # micro-batches in keyed state (streaming/stateful.py)
            from pg_logical_replication_spark.streaming.stateful import (
                reassemble_json_documents_stream,
            )

            raw = reassemble_json_documents_stream(
                raw, value_col=value_col, order_col=order_col
            )
            lsn_col = None  # the per-fragment wire LSN does not survive
        else:
            raw = reassemble_json_documents(
                raw, value_col=value_col, order_col=order_col, lsn_col=lsn_col
            )
    if format_version == 2:
        if filter_origins:
            raise ValueError(
                "filter_origins is not supported for wal2json "
                "format_version=2 (v2 action lines carry no origin "
                "field in this decoder); use format_version=1"
            )
        return decode_wal2json_v2(
            raw,
            value_col=value_col,
            lsn_col=lsn_col,
            include_transaction_markers=include_transaction_markers,
            filter_tables=filter_tables,
            add_tables=add_tables,
            actions=actions,
            filter_msg_prefixes=filter_msg_prefixes,
            add_msg_prefixes=add_msg_prefixes,
            include_typmod=include_typmod,
        )
    parsed = raw.select(
        F.from_json(F.col(value_col), WAL2JSON_SCHEMA).alias("cs"),
        (F.col(lsn_col) if lsn_col else F.col("cs.nextlsn")).alias("_lsn"),
    )

    base = parsed.select(
        "_lsn",
        F.col("cs.xid").alias("xid"),
        F.to_timestamp(F.col("cs.timestamp")).alias("commit_ts"),
        F.posexplode_outer("cs.change").alias("_pos", "c"),
    )

    changes = base.filter(F.col("c").isNotNull()).select(
        F.col("c.kind").alias("op"),
        F.col("_lsn").alias("lsn"),
        lsn_long_expr("_lsn").alias("lsn_long"),
        F.col("xid"),
        F.col("commit_ts"),
        F.col("c.schema").alias("schema"),
        F.col("c.table").alias("table"),
        F.when(
            F.col("c.oldkeys").isNotNull(),
            F.map_from_arrays("c.oldkeys.keynames", "c.oldkeys.keyvalues"),
        ).alias("key"),
        F.lit(None).cast("map<string,string>").alias("before"),
        F.when(
            F.col("c.columnnames").isNotNull(),
            F.map_from_arrays("c.columnnames", "c.columnvalues"),
        ).alias("after"),
        F.map_concat(
            F.create_map(F.lit("pos"), F.col("_pos").cast("string")),
            _opt_map(
                F.col("c.columntypes").isNotNull(),
                F.lit("coltypes"),
                F.array_join(
                    F.transform(
                        F.col("c.columntypes"),
                        (lambda t: t) if include_typmod else strip_typmod,
                    ),
                    ",",
                ),
            ),
            _opt_map(
                F.col("c.origin").isNotNull(), F.lit("origin"), F.col("c.origin")
            ),
            # logical message payload (kind='message')
            _opt_map(
                F.col("c.prefix").isNotNull(),
                F.lit("prefix"), F.col("c.prefix"),
                F.lit("content"), F.col("c.content"),
            ),
            _opt_map(
                F.col("c.transactional").isNotNull(),
                F.lit("transactional"), F.col("c.transactional").cast("string"),
            ),
            # enrichment columns (surfaced whenever the plugin emitted them)
            _opt_map(
                F.col("c.columnpositions").isNotNull(),
                F.lit("colpositions"), _csv(F.col("c.columnpositions")),
            ),
            _opt_map(
                F.col("c.columntypeoids").isNotNull(),
                F.lit("coltypeoids"), _csv(F.col("c.columntypeoids")),
            ),
            _opt_map(
                F.col("c.columnoptionals").isNotNull(),
                F.lit("coloptionals"), _csv(F.col("c.columnoptionals")),
            ),
            _opt_map(
                F.col("c.columndefaults").isNotNull(),
                F.lit("coldefaults"), F.to_json(F.col("c.columndefaults")),
            ),
            _opt_map(
                F.col("c.pk").isNotNull(),
                F.lit("pknames"), F.array_join("c.pk.pknames", ","),
                F.lit("pktypes"), F.array_join("c.pk.pktypes", ","),
            ),
        ).alias("meta"),
    )

    # logical messages carry no schema/table: table predicates must not
    # null-drop them (same trap as the v2 transaction markers, review r2)
    is_msg = F.col("op") == "message"
    if add_tables:
        changes = changes.filter(is_msg | table_pattern_pred(add_tables))
    if filter_tables:
        changes = changes.filter(
            is_msg | ~F.coalesce(table_pattern_pred(filter_tables), F.lit(False))
        )
    if actions:
        changes = changes.filter(F.col("op").isin(list(actions)))
    if filter_origins:
        # wal2json filter-origins: EXCLUDE changes replicated from the
        # listed origins (options type :96-99). Local changes carry no
        # origin and always pass.
        org = F.col("meta").getItem("origin")
        changes = changes.filter(org.isNull() | ~org.isin(list(filter_origins)))
    if filter_msg_prefixes:
        pfx = F.col("meta").getItem("prefix")
        changes = changes.filter(
            ~(is_msg & F.coalesce(pfx.isin(list(filter_msg_prefixes)), F.lit(False)))
        )
    if add_msg_prefixes:
        pfx = F.col("meta").getItem("prefix")
        changes = changes.filter(
            ~is_msg | F.coalesce(pfx.isin(list(add_msg_prefixes)), F.lit(False))
        )

    if not include_transaction_markers:
        return changes

    # unparseable line (DLQ territory): from_json under PERMISSIVE mode
    # yields an all-null struct, so test the FIELDS — it must not
    # synthesize a phantom all-null begin/commit pair (review r2)
    txn = parsed.filter(
        F.col("cs.change").isNotNull() | F.col("cs.xid").isNotNull()
    ).select(
        "_lsn",
        F.col("cs.xid").alias("xid"),
        F.to_timestamp(F.col("cs.timestamp")).alias("commit_ts"),
    ).dropDuplicates(["_lsn", "xid"])
    markers = txn.select(
        F.explode(F.array(F.lit("begin"), F.lit("commit"))).alias("op"),
        F.col("_lsn").alias("lsn"),
        lsn_long_expr("_lsn").alias("lsn_long"),
        "xid",
        "commit_ts",
        F.lit(None).cast("string").alias("schema"),
        F.lit(None).cast("string").alias("table"),
        F.lit(None).cast("map<string,string>").alias("key"),
        F.lit(None).cast("map<string,string>").alias("before"),
        F.lit(None).cast("map<string,string>").alias("after"),
        F.lit(None).cast("map<string,string>").alias("meta"),
    )
    return changes.unionByName(markers)
