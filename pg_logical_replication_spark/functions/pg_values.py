"""PostgreSQL text-format value parsing — the engine's type registry.

The reference decodes every column value from PG *text format* through
the ``pg`` package's OID-keyed parser registry
(``parser: types.getTypeParser(typeOid)``, reference
``src/output-plugins/pgoutput/pgoutput-parser.ts:144``, applied at
``:255``). Here the registry is (a) an OID → Spark-type table and (b) a
set of *declarative* parse expressions — every parser is a Column
expression (JVM-side, whole-stage codegen), no Python UDFs, so typed
projection of a 100 TB change log is as fast as any built-in cast.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pg_logical_replication_spark.model import pg_type_to_spark

# Common pg_type.oid values → PG type name (the subset the reference's
# test fixtures exercise plus the usual analytic types; unknown OIDs
# fall back to text, matching getTypeParser's identity fallback).
OID_TO_PG_TYPE: dict[int, str] = {
    16: "boolean",
    17: "bytea",
    20: "bigint",
    21: "smallint",
    23: "integer",
    25: "text",
    114: "json",
    700: "real",
    701: "double precision",
    1042: "character",
    1043: "character varying",
    1082: "date",
    1083: "time",
    1114: "timestamp without time zone",
    1184: "timestamp with time zone",
    1186: "interval",
    1700: "numeric",
    2950: "uuid",
    3802: "jsonb",
    # array OIDs (pg_type.typarray) — getTypeParser routes these to the
    # array parser; here they route to pg_array via the "[]" suffix
    1000: "boolean[]",
    1001: "bytea[]",
    1005: "smallint[]",
    1007: "integer[]",
    1009: "text[]",
    1014: "character[]",
    1015: "character varying[]",
    1016: "bigint[]",
    1021: "real[]",
    1022: "double precision[]",
    1115: "timestamp without time zone[]",
    1182: "date[]",
    1231: "numeric[]",
    2951: "uuid[]",
}


def oid_to_spark(oid: int) -> str:
    """Type OID → Spark SQL type string (unknown → string)."""
    return pg_type_to_spark(OID_TO_PG_TYPE.get(oid, "text"))


def pg_bool(col: Column | str) -> Column:
    """PG boolean text → BooleanType. Accepts 't'/'f' (text format) and
    'true'/'false' (wal2json JSON); anything else → null."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c.isin("t", "true", "True"), True)
        .when(c.isin("f", "false", "False"), False)
        .cast("boolean")
    )


def pg_bytea(col: Column | str) -> Column:
    """PG bytea hex literal (``\\xDEADBEEF``) → BinaryType; non-hex-form
    input → null (PG escape format is not emitted by any of the four
    plugins' text output)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.startswith("\\x"), F.unhex(c.substr(F.lit(3), F.length(c))))


def pg_numeric(col: Column | str, precision: int = 38, scale: int = 18) -> Column:
    """PG numeric text → DecimalType(38,18) — wide enough for any
    numeric the testdata carries; NaN → null (Decimal has no NaN)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c != "NaN", c).cast(f"decimal({precision},{scale})")


def pg_timestamp(col: Column | str) -> Column:
    """PG timestamp[tz] text ('2026-08-13 00:00:00.123456+00') →
    TimestampType. Spark's to_timestamp handles the space separator and
    offset suffix natively."""
    c = F.col(col) if isinstance(col, str) else col
    return F.to_timestamp(c)


# PG array element: a double-quoted string with backslash escapes, or a
# run of non-comma chars (decoder.ts:29-37 documents the same quoting
# rules for test_decoding values).
_ELEM = r'("(?:[^"\\]|\\.)*"|[^,]+)'


def pg_array(col: Column | str) -> Column:
    """PG array literal (``{a,NULL,"c d",...}``) → ``array<string>``.

    Fully declarative: regexp_extract_all splits elements honoring
    quoting, transform unquotes/unescapes and maps unquoted NULL to
    null. One-dimensional arrays only; multi-dimensional literals
    (nested braces) return NULL rather than a mangled split (review
    r2) — the testdata and the reference's fixtures carry only 1-D
    arrays.
    Compose with a cast for typed arrays:
    ``pg_array(c).cast('array<int>')``.
    """
    c = F.col(col) if isinstance(col, str) else col
    inner = F.regexp_replace(c, r"^\{|\}$", "")
    elems = F.regexp_extract_all(inner, F.lit(_ELEM), F.lit(1))

    def unquote(e: Column) -> Column:
        body = e.substr(F.lit(2), F.length(e) - 2)
        return (
            F.when(e == "NULL", F.lit(None).cast("string"))
            .when(e.startswith('"'), F.regexp_replace(body, r"\\(.)", "$1"))
            .otherwise(e)
        )

    return F.when(
        c.isNotNull() & c.startswith("{") & ~c.startswith("{{"),
        F.when(inner == "", F.array().cast("array<string>")).otherwise(
            F.transform(elems, unquote)
        ),
    )


_PARSERS = {
    "boolean": pg_bool,
    "bool": pg_bool,
    "bytea": pg_bytea,
}


def pg_value(col: Column | str, pg_type: str) -> Column:
    """Parse one PG text value by type name — the getTypeParser
    equivalent. Types without a special parser cast via
    ``pg_type_to_spark`` (ints, floats, text, dates, timestamps)."""
    c = F.col(col) if isinstance(col, str) else col
    t = pg_type.strip().lower()
    if t.endswith("[]"):
        return pg_array(c)
    if t in _PARSERS:
        return _PARSERS[t](c)
    if t.startswith(("numeric", "decimal")):
        return pg_numeric(c)
    return c.cast(pg_type_to_spark(t))
