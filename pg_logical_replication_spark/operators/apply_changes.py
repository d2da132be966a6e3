"""Apply-changes: materialize a CDC stream into a table snapshot.

The reference library stops at emitting ordered change events
(``src/logical-replication-service.ts:151-163``); its consumers' implied
job — keeping a replica table current — is this operator. Semantics
follow PostgreSQL logical replication apply:

* per-key, the newest event wins (total order per slot → per-key order
  suffices for a correct snapshot — SURVEY §4 "sequential per-message
  ordering" is re-derived as a per-key window, the engine's one
  unavoidable shuffle);
* ``delete`` is a tombstone;
* an ``update`` whose key image differs from its new row's key projection
  (pgoutput 'K' submessage — key change, ``pgoutput-parser.ts:174-188``)
  is split into delete(old key) + insert(new row);
* ``truncate`` clears the table at its stream position; only later
  events survive (``pgoutput-parser.ts:271-290`` truncate semantics).

Scale notes (100 TB): one hash shuffle on the key; skewed hot keys are
handled by AQE skew-join/partition splitting; the per-key rank-1 window
plans with a map-side partial ``WindowGroupLimit``, so each map task
ships at most one candidate row per key across the exchange (measured
equal-or-better than a ``max_by(struct)`` aggregation in every regime —
see latest_image's body comment, r11).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pg_logical_replication_spark.model import typed_view  # noqa: F401  (re-export)


def _order_col(events: DataFrame) -> Column:
    """Composite stream position: lsn_long, then intra-txn pos/seq.

    wal2json carries intra-transaction order in meta['pos']
    (one changeset = one txn); pgoutput carries wire order in `seq`.
    """
    parts = [F.coalesce(F.col("lsn_long"), F.lit(0))]
    if "seq" in events.columns:
        parts.append(F.col("seq").cast("long"))
    else:
        parts.append(F.lit(0))
    meta_pos = (
        F.coalesce(F.col("meta").getItem("pos").cast("long"), F.lit(0))
        if "meta" in events.columns
        else F.lit(0)
    )
    return F.struct(*parts, meta_pos)


def key_change_predicate(key_columns: list[str]) -> Column:
    """True for an update whose key image differs from its new row's
    key projection (pgoutput 'K' submessage semantics) — the rows
    ``latest_image`` splits into tombstone + upsert. Exported so batch
    profilers (MergeOnReadTable.apply_batch) can count them with the
    EXACT predicate the split uses."""
    old_identity = F.array(*[F.col("key").getItem(k) for k in key_columns])
    new_identity = F.array(*[F.col("after").getItem(k) for k in key_columns])
    return (
        (F.col("op") == "update")
        & F.col("key").isNotNull()
        & ~old_identity.eqNullSafe(new_identity)
    )


def latest_image(
    events: DataFrame,
    key_columns: list[str],
    table: str | None = None,
    order: Column | None = None,
    *,
    no_truncates: bool = False,
    no_key_splits: bool = False,
) -> DataFrame:
    """Newest ChangeEvent per key (tombstones included) — the CDC-native
    'as of end of stream' view. Returns the input schema + ``_ord``.

    ``no_truncates`` / ``no_key_splits`` are CALLER-VERIFIED facts about
    the batch (optimization r11, guide §1.2 "don't compute things you
    throw away"): a caller that has already aggregated the batch and
    counted zero ``truncate`` rows / zero key-change updates may skip
    the truncate-barrier broadcast join and the tombstone-split union —
    both are exact no-ops on such a batch, but each costs a fixed
    per-job stage (the broadcast build alone is ~0.1-0.2 s on the
    streaming visibility path). Results are identical BY CONSTRUCTION
    when the facts hold; passing ``True`` against a batch that violates
    them silently corrupts the snapshot — only assert what an exact
    aggregate told you (see MergeOnReadTable.apply_batch)."""
    ev = events
    if table is not None:
        ev = ev.filter(F.col("table") == table)
    ev = ev.filter(F.col("op").isin("insert", "update", "delete", "truncate"))
    ev = ev.withColumn("_ord", order if order is not None else _order_col(ev))

    # Truncate barrier: events at-or-before the newest truncate OF THE
    # SAME TABLE are dead (review r2: a global barrier let one table's
    # truncate erase every other table's history). pgoutput encodes a
    # multi-table TRUNCATE as one event with comma-joined names —
    # explode so each named table gets its own barrier. Truncates are
    # rare: the per-table aggregate is tiny and broadcasts.
    has_schema = "schema" in ev.columns
    if not no_truncates:
        tr = ev.filter(F.col("op") == "truncate").select(
            *([F.col("schema").alias("_tsch")] if has_schema else []),
            F.explode(F.split(F.col("table"), ",")).alias("_ttab"),
            "_ord",
        )
        trunc = tr.groupBy(
            *(["_tsch"] if has_schema else []), "_ttab"
        ).agg(F.max("_ord").alias("_trunc_ord"))
        cond = F.col("table") == F.col("_ttab")
        if has_schema:
            cond = cond & F.col("schema").eqNullSafe(F.col("_tsch"))
        ev = ev.join(F.broadcast(trunc), cond, "left").filter(
            F.col("_trunc_ord").isNull() | (F.col("_ord") > F.col("_trunc_ord"))
        )
        ev = ev.filter(F.col("op") != "truncate").drop(
            "_trunc_ord", "_ttab", *(["_tsch"] if has_schema else [])
        )

    # Key-change updates (key image ≠ new row's key projection) split into
    # a tombstone for the old identity + an upsert for the new identity.
    # Arrays are orderable/comparable; maps are not.
    is_dml_upsert = F.col("op").isin("insert", "update")
    if not no_key_splits:
        tombstones = (
            ev.filter(key_change_predicate(key_columns))
            .withColumn("op", F.lit("delete"))
            .withColumn("after", F.lit(None).cast("map<string,string>"))
        )
        ev = ev.unionByName(tombstones)

    # Row identity: key columns from the new image for upserts, from the
    # key image for deletes. Array groups fine (maps don't).
    identity = F.when(
        is_dml_upsert & F.col("after").isNotNull(),
        F.array(*[F.col("after").getItem(k) for k in key_columns]),
    ).otherwise(F.array(*[F.col("key").getItem(k) for k in key_columns]))
    ev = ev.withColumn("_identity", identity)

    # schema participates in row identity (public.users ≠ audit.users);
    # tolerate schema-less event frames from callers that pre-filtered
    part = ["schema", "table", "_identity"] if "schema" in ev.columns else [
        "table", "_identity"]
    # Newest-per-key as a rank-1 window, adjudicated in r11 (VERDICT
    # r10 #2): Spark plans the rn=1 filter as Sort+WindowGroupLimit
    # (Partial) BELOW the exchange, so each map task already ships at
    # most one candidate row per key — the same shuffle reduction the
    # r10 max_by(struct, _ord) rewrite bought — while the reduce side
    # (WindowGroupLimit Final + Window) beats the struct-buffer
    # SortAggregate pair on every measured regime (controlled
    # update-heavy fixture, scripts/r11_maxby_ab.py: window 13-19%
    # faster at update factors 1/7/399; driver r10 cold runs agreed).
    # _ord is unique within a key (wire seq / intra-txn pos), so both
    # forms pick the same row.
    w = Window.partitionBy(*part).orderBy(F.col("_ord").desc())
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changes(
    events: DataFrame,
    key_columns: list[str],
    table: str | None = None,
    columns: dict[str, str] | str | None = None,
    order: Column | None = None,
    *,
    no_truncates: bool = False,
    no_key_splits: bool = False,
) -> DataFrame:
    """CDC events → current table snapshot.

    ``columns`` optionally maps column name → PG type name to produce a
    typed snapshot (otherwise string columns from the ``after`` map,
    limited to keys present in the newest images).

    ``columns="evolve"`` derives the contract from the stream itself
    (VERDICT r8 #2 — schema evolution through materialization): relation
    messages / per-row column types fold into an additive union schema —
    a column added by a mid-stream ALTER appears NULL-backfilled on
    pre-ALTER rows, dropped columns are retained as NULL, incompatible
    type changes raise (operators/schema_evolution.py).

    ``no_truncates`` / ``no_key_splits`` pass through to
    :func:`latest_image` (see its contract): CALLER-VERIFIED facts that
    let the snapshot skip the truncate barrier / tombstone split — each
    references the input a second time, so on an expensive unpersisted
    lineage skipping them also halves/thirds the upstream evaluation.
    Only assert what an exact aggregate (or the construction of the
    stream itself) guarantees.
    """
    if columns == "evolve":
        from pg_logical_replication_spark.operators.schema_evolution import (
            stream_column_contract,
        )

        columns = stream_column_contract(events, table=table)
    # Project to the columns the snapshot pipeline actually touches
    # BEFORE latest_image (optimization r10, guide §2.3 "project before
    # the exchange"): the window ships whole rows through the key
    # shuffle, so without this it carries before/xid/commit_ts/lsn the
    # snapshot never reads — on an update-heavy stream `before` alone
    # is a second copy of every row image. op/table/schema drive the
    # filters, key+after the identity and output, lsn_long/seq/meta
    # the stream order. Skipped when the caller passes an explicit
    # `order` (it may reference the dropped columns).
    if order is None:
        keep = [
            c
            for c in ("op", "schema", "table", "key", "after",
                      "lsn_long", "seq", "meta")
            if c in events.columns
        ]
        events = events.select(*keep)
    latest = latest_image(
        events, key_columns, table=table, order=order,
        no_truncates=no_truncates, no_key_splits=no_key_splits,
    )
    live = latest.filter(F.col("op") != "delete")

    if columns:
        from pg_logical_replication_spark.functions import pg_value

        return live.select(
            *[
                pg_value(F.col("after").getItem(name), pg_t).alias(name)
                for name, pg_t in columns.items()
            ]
        )

    # Untyped: one string column per key seen in the surviving images.
    names = sorted(
        {
            k
            for row in live.select(F.explode(F.map_keys("after")).alias("k"))
            .distinct()
            .collect()
            for k in [row["k"]]
        }
    )
    return live.select(*[F.col("after").getItem(n).alias(n) for n in names])


def toast_fill(
    events: DataFrame,
    key_columns: list[str],
    columns: list[str] | None = None,
    order: Column | None = None,
) -> DataFrame:
    """Fill unchanged-TOAST columns from the key's prior image.

    pgoutput omits TOASTed columns whose value didn't change ('u' kind,
    reference ``pgoutput-parser.ts:231-269``); the decoder surfaces them
    in ``meta['unchanged_toast']`` (comma-separated names) when no
    old-tuple fallback existed in the same message. This operator is the
    stream-level completion SURVEY §2 #7 maps to: per (table, key), in
    stream order, each toasted column takes the newest previously-SEEN
    value — a ``last(ignore nulls)`` running window, one hash shuffle on
    the key (the same partitioning apply_changes needs, so at scale the
    two share one exchange).

    A null carried in a prior image is distinguished from "no prior
    image" by window-aggregating a wrapped struct, not the raw value —
    an explicit SQL NULL must NOT be overwritten by older data.

    ``columns``: the TOAST-able columns; derived from the stream's
    observed ``unchanged_toast`` markers when omitted (small distinct
    agg — schema-registry-sized, like the reference's relation cache).
    """
    ev = events.withColumn("_ord", order if order is not None else _order_col(events))

    if columns is None:
        columns = [
            r["c"]
            for r in ev.select(
                F.explode(
                    F.split(F.col("meta").getItem("unchanged_toast"), ",")
                ).alias("c")
            )
            .filter(F.col("c") != "")
            .distinct()
            .collect()
        ]
    if not columns:
        return ev.drop("_ord")

    identity = F.array(
        *[
            F.coalesce(F.col("key").getItem(k), F.col("after").getItem(k))
            for k in key_columns
        ]
    )
    ev = ev.withColumn("_identity", identity)
    part = ["schema", "table", "_identity"] if "schema" in ev.columns else [
        "table", "_identity"]
    w = (
        Window.partitionBy(*part)
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    toast_list = F.split(
        F.coalesce(F.col("meta").getItem("unchanged_toast"), F.lit("")), ","
    )
    for c in columns:
        toasted = F.array_contains(toast_list, c)
        # struct-wrap: null struct = "toasted here, skip"; struct(null)
        # = "image explicitly set NULL" — last() then carries correctly
        carried = F.last(
            F.when(~toasted, F.struct(F.col("after").getItem(c).alias("v"))),
            ignorenulls=True,
        ).over(w)["v"]
        ev = ev.withColumn(
            "after",
            F.when(
                toasted & F.col("after").isNotNull(),
                F.map_concat(
                    F.map_filter(F.col("after"), lambda k, _v: k != F.lit(c)),
                    F.create_map(F.lit(c), carried),
                ),
            ).otherwise(F.col("after")),
        )
    return ev.drop("_ord", "_identity")


def scd2_history(
    events: DataFrame,
    key_columns: list[str],
    table: str | None = None,
    order: Column | None = None,
) -> DataFrame:
    """Slowly-changing-dimension Type 2 history from a CDC stream.

    ``apply_changes`` keeps only the newest image per key; warehouses
    usually also want the FULL version history with validity intervals —
    the classic downstream materialization of the reference's ordered
    change stream (each ``emit('data', lsn, message)`` in
    ``src/logical-replication-service.ts:151-163`` is one version
    boundary). Per key, in stream order:

    * every ``insert``/``update`` image opens a version row with
      ``valid_from_lsn`` = its stream position;
    * the version closes at the NEXT event for the same key (update or
      delete): ``valid_to_lsn`` = that event's position via ``lead``;
    * ``delete`` emits no row, it only closes the previous version;
    * ``is_current`` marks open versions (``valid_to_lsn IS NULL``).

    Key-changing updates should be pre-split into delete+insert (as
    ``latest_image`` does) before calling; identity here is taken from
    the new image for upserts and the key image for deletes.

    Scale: one hash shuffle on (table, key) + a per-key ``lead`` window
    — same exchange apply_changes uses, no global sort; history tables
    at rest partition by ``valid_from_lsn`` ranges so "as of" queries
    prune to one partition.
    """
    ev = events
    if table is not None:
        ev = ev.filter(F.col("table") == table)
    ev = ev.filter(F.col("op").isin("insert", "update", "delete"))
    ev = ev.withColumn("_ord", order if order is not None else _order_col(ev))

    identity = F.when(
        F.col("op").isin("insert", "update") & F.col("after").isNotNull(),
        F.array(*[F.col("after").getItem(k) for k in key_columns]),
    ).otherwise(F.array(*[F.col("key").getItem(k) for k in key_columns]))
    ev = ev.withColumn("_identity", identity)

    # schema participates in version identity, same as latest_image
    part = ["schema", "table", "_identity"] if "schema" in ev.columns else [
        "table", "_identity"]
    w = Window.partitionBy(*part).orderBy("_ord")
    return (
        ev.withColumn("valid_from_lsn", F.col("lsn_long"))
        .withColumn("valid_to_lsn", F.lead("lsn_long").over(w))
        .filter(F.col("op") != "delete")
        .withColumn("is_current", F.col("valid_to_lsn").isNull())
        .drop("_ord", "_identity")
    )


def incremental_agg(
    events: DataFrame,
    group_fn,
    value_fn,
    group_name: str = "grp",
) -> DataFrame:
    """Delta-maintained aggregate: SUM/COUNT per group straight from the
    change stream, never touching the snapshot.

    The 100 TB reason this operator exists: recomputing ``SELECT g,
    sum(v) FROM snapshot GROUP BY g`` rescans the full table on every
    refresh; the CDC stream already carries exactly the information
    needed to UPDATE the aggregate. Each event contributes signed
    deltas (incremental view maintenance, insert-only delta rule):

    * ``insert``  → ``(+value(after),  +1)`` at ``group(after)``
    * ``delete``  → ``(-value(before), -1)`` at ``group(before)``
    * ``update``  → both — which also handles group-CHANGING updates
      (the row moves between groups) with no special casing.

    Requires before images on update/delete (REPLICA IDENTITY FULL —
    reference ``pgoutput-parser.ts:164-213`` old-tuple semantics; or a
    completed stream via ``toast_fill``/key-lookup).

    ``group_fn``/``value_fn``: image map column → grouping / measure
    Column. Pass a decimal-typed measure for exact, order-independent
    accumulation (registry ``ssum`` discipline).

    Output: ``group_name``, ``n_delta`` (live-row count change),
    ``sum_delta``. Against an empty baseline these ARE the aggregate;
    in ``foreachBatch`` they MERGE into a running aggregate table.

    Scale: shuffle-free flatMap + one partial-aggregated ``groupBy`` on
    the (small) group domain — per-batch cost is O(changes), not
    O(table). No per-key window, no join against the snapshot.
    """
    before, after = F.col("before"), F.col("after")
    neg = F.when(
        F.col("op").isin("update", "delete") & before.isNotNull(),
        F.struct(
            group_fn(before).alias("g"),
            (-value_fn(before)).alias("dv"),
            F.lit(-1).cast("long").alias("dn"),
        ),
    )
    pos = F.when(
        F.col("op").isin("insert", "update") & after.isNotNull(),
        F.struct(
            group_fn(after).alias("g"),
            value_fn(after).alias("dv"),
            F.lit(1).cast("long").alias("dn"),
        ),
    )
    deltas = events.select(F.explode(F.array_compact(F.array(neg, pos))).alias("d"))
    return deltas.groupBy(F.col("d.g").alias(group_name)).agg(
        F.sum("d.dn").alias("n_delta"), F.sum("d.dv").alias("sum_delta")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_columns: list[str],
    value_columns: list[str] | None = None,
) -> DataFrame:
    """Reverse CDC: derive the change set between two snapshots.

    ``apply_changes`` turns events into a snapshot; this is the inverse
    — given two snapshots of the same table (e.g. two ``as-of``
    states, or a replica vs. its source for drift detection), emit the
    implied changes: ``insert`` (key only in ``new``), ``delete`` (key
    only in ``old``), ``update`` (key in both, any value column
    differs; null-safe comparison). Unchanged keys are not emitted.

    Output: ``op``, the key columns, and ``old_<c>`` / ``new_<c>`` per
    value column.

    Scale: one full-outer sort-merge join on the key — the same single
    key-aligned shuffle as apply-changes itself; value comparison is a
    codegen row predicate. Snapshots bucketed by key
    (``operators.layout.write_bucketed``) diff with ZERO shuffle.
    """
    if value_columns is None:
        value_columns = [c for c in new.columns if c not in key_columns]
    missing = [c for c in key_columns + value_columns if c not in old.columns]
    if missing:
        raise ValueError(f"columns missing from old snapshot: {missing}")

    o = old.select(*[F.col(c).alias(f"o_{c}") for c in key_columns + value_columns])
    n = new.select(*[F.col(c).alias(f"n_{c}") for c in key_columns + value_columns])
    cond = None
    for k in key_columns:
        p = o[f"o_{k}"].eqNullSafe(n[f"n_{k}"])
        cond = p if cond is None else cond & p
    joined = o.join(n, cond, "full_outer")

    # snapshot keys are never null, so first-key nullness marks side absence
    in_old = joined[f"o_{key_columns[0]}"].isNotNull()
    in_new = joined[f"n_{key_columns[0]}"].isNotNull()
    changed = F.lit(False)
    for c in value_columns:
        changed = changed | ~joined[f"o_{c}"].eqNullSafe(joined[f"n_{c}"])
    op = (
        F.when(~in_old, F.lit("insert"))
        .when(~in_new, F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return (
        joined.withColumn("op", op)
        .filter((F.col("op") != "update") | changed)
        .select(
            "op",
            *[
                F.coalesce(joined[f"o_{k}"], joined[f"n_{k}"]).alias(k)
                for k in key_columns
            ],
            *[joined[f"o_{c}"].alias(f"old_{c}") for c in value_columns],
            *[joined[f"n_{c}"].alias(f"new_{c}") for c in value_columns],
        )
    )


def net_changes(
    events: DataFrame,
    key_columns: list[str],
    table: str | None = None,
    order: Column | None = None,
    keep_cancelled: bool = True,
) -> DataFrame:
    """Squash a change batch to its per-key NET effect.

    The standard pre-apply compaction for warehouse sinks (Debezium's
    event-flattening + Kafka changelog compaction semantics): within the
    batch, a key's first and last DML decide one net operation —

    * first ``insert`` … last ``delete``  → ``none`` (the key appeared
      and vanished inside the batch; the sink never needs to see it);
    * first ``insert`` … anything else    → net ``insert`` of the last
      image (intermediate updates fold away);
    * last ``delete`` on a pre-existing key → net ``delete``;
    * otherwise                            → net ``update`` of the last
      image.

    The reference emits every event in order
    (``logical-replication-service.ts:151-163``); squashing an
    acknowledged batch to net effects before an expensive downstream
    apply is the consumer-side idiom this operator packages.

    Output: ``schema``/``table`` (when present), ``net_op``, the key
    image (``key`` of the last event), the last ``after`` image,
    ``n_changes``, ``first_lsn_long``/``last_lsn_long``.
    ``keep_cancelled=False`` drops the ``none`` rows.

    Scale: ONE hash aggregation on the key — ``min_by``/``max_by`` with
    map-side partial aggregation, no window sort; key-change updates are
    split into tombstone + upsert first (same rule as ``latest_image``).
    Truncates are interspersed-batch control flow, not per-key DML —
    route batches containing them through ``apply_changes``; this
    operator raises loudly rather than emit a wrong net effect.
    """
    ev = events
    if table is not None:
        ev = ev.filter(F.col("table") == table)
    dml = ev.filter(F.col("op").isin("insert", "update", "delete"))
    n_other = ev.filter(F.col("op") == "truncate").limit(1).count()
    if n_other:
        raise ValueError(
            "net_changes: batch contains truncate events — a truncate is "
            "a table-level barrier, not a per-key change; apply it with "
            "apply_changes/latest_image instead"
        )
    dml = dml.withColumn(
        "_ord", order if order is not None else _order_col(dml)
    )

    # key-change updates split exactly as latest_image splits them: the
    # old identity nets a delete, the new identity an upsert
    old_identity = F.array(*[F.col("key").getItem(k) for k in key_columns])
    new_identity = F.array(*[F.col("after").getItem(k) for k in key_columns])
    key_changed = (
        (F.col("op") == "update")
        & F.col("key").isNotNull()
        & ~old_identity.eqNullSafe(new_identity)
    )
    tombstones = (
        dml.filter(key_changed)
        .withColumn("op", F.lit("delete"))
        .withColumn("after", F.lit(None).cast("map<string,string>"))
    )
    # the upsert half of a key-change split CREATES the new identity
    # (PK uniqueness: the new key cannot have pre-existed), so for net
    # purposes it is an insert; its key image refers to the OLD
    # identity and is dropped. Flag first — both rewrites must see the
    # ORIGINAL op/key columns, not each other's output.
    dml = dml.withColumn("_kc", key_changed)
    dml = dml.select(
        *[c for c in dml.columns if c not in ("op", "key", "_kc")],
        F.when(F.col("_kc"), F.lit("insert")).otherwise(F.col("op")).alias("op"),
        F.when(
            F.col("_kc"), F.lit(None).cast("map<string,string>")
        ).otherwise(F.col("key")).alias("key"),
    )
    dml = dml.unionByName(tombstones)

    identity = F.when(
        F.col("op").isin("insert", "update") & F.col("after").isNotNull(),
        F.array(*[F.col("after").getItem(k) for k in key_columns]),
    ).otherwise(F.array(*[F.col("key").getItem(k) for k in key_columns]))
    dml = dml.withColumn("_identity", identity)

    has_schema = "schema" in dml.columns
    part = (["schema"] if has_schema else []) + ["table", "_identity"]
    last_payload = F.struct(
        F.col("op").alias("op"),
        F.col("after").alias("after"),
        F.col("key").alias("key"),
        F.col("lsn_long").alias("lsn_long"),
    )
    agg = dml.groupBy(*part).agg(
        F.min_by("op", "_ord").alias("_first_op"),
        F.max_by(last_payload, "_ord").alias("_last"),
        F.min("lsn_long").alias("first_lsn_long"),
        F.count("*").alias("n_changes"),
    )
    net_op = (
        F.when(
            (F.col("_first_op") == "insert")
            & (F.col("_last.op") == "delete"),
            F.lit("none"),
        )
        .when(F.col("_first_op") == "insert", F.lit("insert"))
        .when(F.col("_last.op") == "delete", F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    out = agg.select(
        *(["schema"] if has_schema else []),
        "table",
        net_op.alias("net_op"),
        F.col("_last.key").alias("key"),
        F.when(F.col("_last.op") != "delete", F.col("_last.after")).alias(
            "after"
        ),
        F.col("n_changes").cast("long").alias("n_changes"),
        F.col("first_lsn_long").alias("first_lsn_long"),
        F.col("_last.lsn_long").alias("last_lsn_long"),
        F.col("_identity").alias("_identity"),
    )
    if not keep_cancelled:
        out = out.filter(F.col("net_op") != "none")
    return out


def bootstrap_events(
    snapshot: DataFrame,
    key_columns: list[str],
    table: str = "t",
    schema: str = "public",
    columns: list[str] | None = None,
    lsn: str = "0/00000000",
) -> DataFrame:
    """Initial-load snapshot → synthetic ``insert`` ChangeEvents.

    The Debezium "initial snapshot" pattern (snapshot.mode=initial): a
    consistent table image is emitted as inserts AT the snapshot LSN,
    then the live stream (all positions > snapshot LSN) unions on top —
    ``apply_changes`` over the union resolves per key with stream
    changes winning, so a consumer bootstraps an existing table and
    catches up in ONE code path. The reference starts streams at a slot
    position the same way (`subscribe(…, uptoLsn)`,
    logical-replication-service.ts:134-137) but leaves the initial copy
    to the user; this operator closes that gap.

    Scale: the snapshot is a parquet scan mapped row→event with no
    shuffle; the union adds no exchange (apply_changes' key window is
    the only shuffle, shared with the stream side).
    """
    from pg_logical_replication_spark.model import lsn_to_long

    cols = columns or snapshot.columns
    after_pairs = []
    for c in cols:
        after_pairs += [F.lit(c), F.col(c).cast("string")]
    key_pairs = []
    for c in key_columns:
        key_pairs += [F.lit(c), F.col(c).cast("string")]
    return snapshot.select(
        F.lit("insert").alias("op"),
        F.lit(lsn).alias("lsn"),
        F.lit(lsn_to_long(lsn)).cast("long").alias("lsn_long"),
        F.lit(None).cast("long").alias("xid"),
        F.lit(None).cast("timestamp").alias("commit_ts"),
        F.lit(schema).alias("schema"),
        F.lit(table).alias("table"),
        F.create_map(*key_pairs).alias("key"),
        F.lit(None).cast("map<string,string>").alias("before"),
        F.create_map(*after_pairs).alias("after"),
        F.create_map(F.lit("bootstrap"), F.lit("true")).alias("meta"),
    )
