"""Additive schema evolution for CDC materialization.

The decode layer already handles mid-stream ``ALTER TABLE``: pgoutput
re-announces a relation with an in-band 'R' message and every DML row
resolves the newest relation version at or below its wire position
(``sources/pgoutput.py _VersionedRelations`` ≙ the reference's
``_relationCache`` under ALTER, ``pgoutput-parser.ts:86-110``). What the
reference — a transport client with no materialization layer — never
needed is the CONSUMER side of that story: a replica table whose OUTPUT
schema follows the relation versions. Debezium solves it with a
schema-change topic; Delta/Iceberg call it schema evolution /
``mergeSchema``. This module is that layer for ``apply_changes`` and
``MergeOnReadTable`` (VERDICT r8 #2):

* **additive merge** — a column added mid-stream appears in the output
  contract; rows decoded before the ALTER surface it as NULL (their
  ``after`` map simply lacks the key — NULL backfill is free);
* **dropped columns are retained** — once a column has existed it stays
  in the contract (as NULL on post-drop rows), so downstream readers
  never lose a column they may already depend on (the Delta rule);
* **type changes** — widenings within a family are accepted and the
  contract takes the newest type (smallint→integer→bigint,
  real→double precision, int/float→numeric, anything→text — PG's own
  implicit-cast directions over text-format values); anything else
  (narrowing, cross-family) is a LOUD ``ValueError`` naming the table,
  column and both types — silently coercing would corrupt the replica.

Contract sources, in priority order:

1. relation messages (``op='relation'`` rows with ``meta['columns']`` /
   ``meta['type_oids']``) — pgoutput's authoritative declaration;
2. per-row column types (``meta['coltypes']`` aligned with the
   ``after`` map's key order) — wal2json / test_decoding streams, which
   carry types on every DML row instead of relation messages.

Both reductions are schema-registry-sized (versions × columns, not
rows): the relation path collects the handful of 'R' rows; the DML path
first reduces to DISTINCT (colnames, coltypes) signatures — one hash
aggregate over the stream, tiny output — before anything reaches the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# widening families: a type may evolve to a HIGHER rank in its family
# (taking the newest type), never to a lower one or across families
_INT_RANK = {"smallint": 1, "int2": 1, "integer": 2, "int": 2, "int4": 2,
             "bigint": 3, "int8": 3}
_FLOAT_RANK = {"real": 1, "float4": 1, "double precision": 2, "float8": 2}


def _family(pg_type: str) -> str:
    t = pg_type.strip().lower()
    if t in _INT_RANK:
        return "int"
    if t in _FLOAT_RANK:
        return "float"
    if t.startswith(("numeric", "decimal")):
        return "numeric"
    if t in ("text", "varchar") or t.startswith(
        ("character varying", "character", "varchar")
    ):
        return "text"
    return t  # exact-match families (date, uuid, bytea, ...)


def merge_type(table: str, column: str, old: str, new: str) -> str:
    """The evolved type of one column: ``old`` observed earlier in the
    stream, ``new`` later. Returns the surviving contract type or raises
    ``ValueError`` on an incompatible change."""
    if old.strip().lower() == new.strip().lower():
        return new
    fo, fn = _family(old), _family(new)
    if fn == "text":
        return new  # anything → text: the values are already text
    if fo == fn == "int":
        if _INT_RANK[new.strip().lower()] >= _INT_RANK[old.strip().lower()]:
            return new
    elif fo == fn == "float":
        if _FLOAT_RANK[new.strip().lower()] >= _FLOAT_RANK[old.strip().lower()]:
            return new
    elif fn == "numeric" and fo in ("int", "float", "numeric"):
        return new
    elif fo == fn:
        return new  # same family, no rank (e.g. varchar(20)→varchar(40))
    raise ValueError(
        f"incompatible type change on {table}.{column}: {old!r} -> {new!r} "
        "(only widenings are supported: smallint->integer->bigint, "
        "real->double precision, int/float->numeric, anything->text). "
        "Materialize the table under a new name or fix the contract "
        "explicitly with columns={...}."
    )


def merge_column_contract(
    versions: list[list[tuple[str, str]]], table: str = "?"
) -> dict[str, str]:
    """Fold schema versions (stream order) into one output contract:
    column → PG type, insertion-ordered by first appearance; dropped
    columns retained; widenings applied; incompatible changes raise."""
    out: dict[str, str] = {}
    for ver in versions:
        for name, typ in ver:
            out[name] = (
                typ if name not in out else merge_type(table, name, out[name], typ)
            )
    return out


def _versions_from_relation_rows(rows) -> list[list[tuple[str, str]]]:
    """rows: (ord_key, columns_csv, type_oids_csv) tuples, any order."""
    from pg_logical_replication_spark.functions.pg_values import OID_TO_PG_TYPE

    versions = []
    for _ord, names_csv, oids_csv in sorted(rows, key=lambda r: r[0]):
        names = [n for n in (names_csv or "").split(",") if n]
        oids = [o for o in (oids_csv or "").split(",") if o]
        versions.append(
            [
                (n, OID_TO_PG_TYPE.get(int(o), "text"))
                for n, o in zip(names, oids)
            ]
        )
    return versions


def _versions_from_signatures(rows) -> list[list[tuple[str, str]]]:
    """rows: (first_ord, colnames_csv, coltypes_csv) — one per DISTINCT
    per-row schema signature, ordered by first appearance. Types may
    contain commas only for typmods like numeric(10,2) — the decoder
    emits them comma-free or typmod-stripped in ``coltypes``; a length
    mismatch drops the signature (defensive, never wrong contract)."""
    versions = []
    for _ord, names_csv, types_csv in sorted(rows, key=lambda r: r[0]):
        names = [n for n in (names_csv or "").split(",") if n]
        types = (types_csv or "").split(",")
        if len(names) != len(types):
            continue
        versions.append(list(zip(names, types)))
    return versions


def stream_column_contract(
    events: DataFrame,
    table: str | None = None,
    schema: str | None = None,
) -> dict[str, str]:
    """Derive the evolved output contract (column → PG type) from a
    decoded ChangeEvent DataFrame. Relation messages win; DML per-row
    ``coltypes`` metadata is the fallback. Raises ``ValueError`` when no
    schema information exists in the stream (caller must pass an
    explicit ``columns={...}`` contract) or on an incompatible change.
    """
    ev = events
    if table is not None:
        ev = ev.filter(F.col("table") == table)
    if schema is not None and "schema" in ev.columns:
        ev = ev.filter(F.col("schema") == schema)
    has_meta = "meta" in ev.columns
    tbl = f"{schema or ''}{'.' if schema else ''}{table or '?'}"
    if has_meta:
        seq = (
            F.col("seq").cast("long")
            if "seq" in ev.columns
            else F.lit(0).cast("long")
        )
        ordk = F.struct(
            F.coalesce(F.col("lsn_long"), F.lit(0)).alias("l"),
            F.coalesce(seq, F.lit(0)).alias("s"),
        )
        rel = (
            ev.filter(
                (F.col("op") == "relation")
                & F.col("meta").getItem("columns").isNotNull()
            )
            .select(
                ordk.alias("o"),
                F.col("meta").getItem("columns").alias("cols"),
                F.col("meta").getItem("type_oids").alias("oids"),
            )
            .collect()
        )
        if rel:
            return merge_column_contract(
                _versions_from_relation_rows(
                    [((r["o"]["l"], r["o"]["s"]), r["cols"], r["oids"]) for r in rel]
                ),
                table=tbl,
            )
        # DML signature fallback: DISTINCT (names, types) pairs with
        # their first stream position — one small hash aggregate
        sigs = (
            ev.filter(
                F.col("op").isin("insert", "update")
                & F.col("after").isNotNull()
                & F.col("meta").getItem("coltypes").isNotNull()
            )
            .select(
                ordk.alias("o"),
                F.concat_ws(",", F.map_keys("after")).alias("cols"),
                F.col("meta").getItem("coltypes").alias("typs"),
            )
            .groupBy("cols", "typs")
            .agg(F.min("o").alias("o"))
            .collect()
        )
        if sigs:
            return merge_column_contract(
                _versions_from_signatures(
                    [((r["o"]["l"], r["o"]["s"]), r["cols"], r["typs"]) for r in sigs]
                ),
                table=tbl,
            )
    raise ValueError(
        f"columns='evolve' found no schema information for {tbl}: the "
        "stream carries neither relation messages (pgoutput 'R') nor "
        "per-row column types (wal2json/test_decoding meta['coltypes']). "
        "Pass an explicit columns={name: pg_type} contract."
    )


def _oid_name_map_expr():
    """OID → PG type name as a literal map expression (JVM-side lookup,
    the declarative form of functions.pg_values.OID_TO_PG_TYPE)."""
    from pg_logical_replication_spark.functions.pg_values import (
        OID_TO_PG_TYPE,
    )

    entries = []
    for oid, name in OID_TO_PG_TYPE.items():
        entries.extend([F.lit(str(oid)), F.lit(name)])
    return F.create_map(*entries)


def schema_change_log(events: DataFrame, table: str | None = None) -> DataFrame:
    """The schema-change LOG of a decoded stream — one row per relation
    version with the diff against its predecessor: the batch form of
    what Debezium publishes on its schema-change topic, derived from the
    pgoutput 'R' announcements the reference's relation cache consumes
    (``pgoutput-parser.ts:86-110``).

    Returns (schema?, table, version, lsn_long, n_columns, added,
    dropped, widened) — added/dropped are comma-joined column names,
    widened is ``col:old_type->new_type`` entries (any type change,
    named whether or not :func:`merge_type` would accept it — the log
    REPORTS; enforcement is apply-time).

    Scale: relation rows are schema-registry-sized (versions × tables,
    never data-sized) — the per-table window sort is over that tiny set;
    everything is array expressions, zero UDF, zero collect.
    """
    from pyspark.sql import Window

    ev = events.filter(
        (F.col("op") == "relation") & F.col("meta").getItem("columns").isNotNull()
    )
    if table is not None:
        ev = ev.filter(F.col("table") == table)
    has_schema = "schema" in ev.columns
    seq = (
        F.col("seq").cast("long") if "seq" in ev.columns else F.lit(0)
    )
    oid_map = _oid_name_map_expr()
    base = ev.select(
        *(["schema"] if has_schema else []),
        "table",
        F.coalesce(F.col("lsn_long"), F.lit(0)).alias("lsn_long"),
        F.coalesce(seq, F.lit(0)).alias("_seq"),
        F.split(F.col("meta").getItem("columns"), ",").alias("cols"),
        F.transform(
            F.split(F.col("meta").getItem("type_oids"), ","),
            lambda o: F.coalesce(oid_map[o], F.lit("text")),
        ).alias("typs"),
    )
    part = ["schema", "table"] if has_schema else ["table"]
    w = Window.partitionBy(*part).orderBy("lsn_long", "_seq")
    # fold cache refreshes first: pgoutput re-sends 'R' after reconnect
    # with an unchanged declaration — the log records CHANGES (the
    # Debezium schema-change-topic rule), so identical consecutive
    # announcements drop and versions number the survivors
    decl = F.concat_ws("|", F.array_join("cols", ","), F.array_join("typs", ","))
    changed = base.withColumn("_decl", decl).withColumn(
        "_pdecl", F.lag("_decl").over(w)
    ).filter(
        F.col("_pdecl").isNull() | (F.col("_decl") != F.col("_pdecl"))
    ).drop("_decl", "_pdecl")
    cur = changed.select(
        *part,
        "lsn_long",
        "cols",
        F.map_from_arrays("cols", "typs").alias("m"),
        F.row_number().over(w).alias("version"),
        F.coalesce(
            F.lag("cols").over(w), F.array().cast("array<string>")
        ).alias("pcols"),
        F.lag(F.map_from_arrays("cols", "typs")).over(w).alias("pm"),
    )
    widened = F.array_join(
        F.transform(
            F.filter(
                F.col("cols"),
                lambda c: F.element_at(F.col("pm"), c).isNotNull()
                & (F.element_at(F.col("pm"), c) != F.element_at(F.col("m"), c)),
            ),
            lambda c: F.concat(
                c,
                F.lit(":"),
                F.element_at(F.col("pm"), c),
                F.lit("->"),
                F.element_at(F.col("m"), c),
            ),
        ),
        ",",
    )
    return cur.select(
        *part,
        F.col("version").cast("long").alias("version"),
        "lsn_long",
        F.size("cols").cast("long").alias("n_columns"),
        F.array_join(F.array_except("cols", "pcols"), ",").alias("added"),
        F.array_join(F.array_except("pcols", "cols"), ",").alias("dropped"),
        widened.alias("widened"),
    )
