"""test_decoding text-format decoder — regex built-ins, zero UDFs.

The reference parses this format with a 1,610-line generated PEG parser
(reference ``src/output-plugins/test_decoding/decoder.ts``; the ~30-line
grammar is in its header comment, lines 11-43). The grammar:

    table <schema>.<table>: INSERT|UPDATE|DELETE: (<name>[<type>]:<value>)+
    BEGIN [xid]
    COMMIT [xid] [(at <time>)]

with ``""``-escaped double-quoted identifiers, ``''``-escaped
single-quoted values, bare space-terminated values, and literal ``null``
(grammar lines 29-37). We express the same grammar with
``regexp_extract_all`` + ``transform`` + ``map_from_entries`` — fully
JVM-side, whole-stage-codegen friendly, no generated parser to maintain.

Extension beyond the reference: ``old-key:`` / ``new-tuple:`` submessages
(emitted by test_decoding under REPLICA IDENTITY FULL) populate
``key``/``after`` separately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pg_logical_replication_spark.model import lsn_long_expr

# One datum: name[type]:value  (grammar `datum`, decoder.ts:40)
_DATUM_RE = r'("(?:[^"]|"")*"|[^\[\s]+)\[([^\]]+)\]:(\'(?:[^\']|\'\')*\'|[^ \t]+)'
_QUAL_RE = r'^table ("(?:[^"]|"")*"|[^.]+)\.("(?:[^"]|"")*"|[^:]+): (INSERT|UPDATE|DELETE|TRUNCATE): ?(.*)$'
_BEGIN_RE = r"^BEGIN(?: (\d+))?\s*$"
_COMMIT_RE = r"^COMMIT(?: (\d+))?(?: \(at ([^)]+)\))?\s*$"


def _unquote_ident(c):
    """Strip "" quoting (grammar double_quote_escaped_string, decoder.ts:31)."""
    return F.when(
        c.rlike('^".*"$'),
        F.replace(F.substring(c, 2, F.length(c) - 2), F.lit('""'), F.lit('"')),
    ).otherwise(c)


def _unquote_value(c):
    """null → NULL; '…''…' → unescaped; bare token unchanged (decoder.ts:30)."""
    return (
        F.when(c == "null", F.lit(None).cast("string"))
        .when(
            c.rlike("^'.*'$"),
            F.replace(F.substring(c, 2, F.length(c) - 2), F.lit("''"), F.lit("'")),
        )
        .otherwise(c)
    )


def _datum_map(data_col):
    """'a[int]:1 b[text]:'x''y'' → map<name,value>, all built-ins."""
    toks = F.regexp_extract_all(data_col, F.lit(_DATUM_RE), 0)
    entries = F.transform(
        toks,
        lambda t: F.struct(
            _unquote_ident(F.regexp_extract(t, _DATUM_RE, 1)).alias("key"),
            _unquote_value(F.regexp_extract(t, _DATUM_RE, 3)).alias("value"),
        ),
    )
    return F.map_from_entries(entries)


def _datum_types(data_col):
    toks = F.regexp_extract_all(data_col, F.lit(_DATUM_RE), 0)
    return F.array_join(F.transform(toks, lambda t: F.regexp_extract(t, _DATUM_RE, 2)), ",")


def decode_test_decoding(
    raw: DataFrame,
    value_col: str = "value",
    lsn_col: str | None = None,
    seq_col: str | None = None,
) -> DataFrame:
    """Raw test_decoding lines → normalized ChangeEvent rows.

    One input row per line. ``lsn_col`` optionally carries the wire LSN.
    ``seq_col`` optionally carries wire order; when present, DML rows are
    framed into their transactions (xid + COMMIT timestamp attached —
    test_decoding emits both only on BEGIN/COMMIT lines, grammar
    trx_begin/trx_commit, decoder.ts:16-17) via
    ``operators.transactions.assign_transactions``.
    """
    line = F.col(value_col)
    lsn = F.col(lsn_col) if lsn_col else F.lit(None).cast("string")

    passthrough = [F.col(seq_col).alias("seq")] if seq_col else []
    parsed = raw.select(
        line.alias("_line"),
        lsn.alias("lsn"),
        F.when(line.rlike(_BEGIN_RE), "begin")
        .when(line.rlike(_COMMIT_RE), "commit")
        .when(line.rlike(_QUAL_RE), F.lower(F.regexp_extract(line, _QUAL_RE, 3)))
        .alias("op"),
        *passthrough,
    ).filter(F.col("op").isNotNull())

    data = F.regexp_extract(F.col("_line"), _QUAL_RE, 4)
    # REPLICA IDENTITY FULL updates: "old-key: <datums> new-tuple: <datums>"
    has_old = data.contains("old-key:") & data.contains("new-tuple:")
    old_part = F.regexp_extract(data, r"old-key: (.*?) ?new-tuple:", 1)
    new_part = F.when(has_old, F.regexp_extract(data, r"new-tuple: (.*)$", 1)).otherwise(data)

    out = parsed.select(
        "op",
        "lsn",
        lsn_long_expr("lsn").alias("lsn_long"),
        F.when(F.col("op") == "begin", F.regexp_extract("_line", _BEGIN_RE, 1))
        .when(F.col("op") == "commit", F.regexp_extract("_line", _COMMIT_RE, 1))
        .cast("long")
        .alias("xid"),
        F.when(
            F.col("op") == "commit", F.to_timestamp(F.regexp_extract("_line", _COMMIT_RE, 2))
        ).alias("commit_ts"),
        F.when(
            F.col("op").isin("insert", "update", "delete", "truncate"),
            _unquote_ident(F.regexp_extract("_line", _QUAL_RE, 1)),
        ).alias("schema"),
        F.when(
            F.col("op").isin("insert", "update", "delete", "truncate"),
            _unquote_ident(F.regexp_extract("_line", _QUAL_RE, 2)),
        ).alias("table"),
        # DELETE datums are the replica-identity key image (PG docs);
        # UPDATE old-key: likewise.
        F.when(F.col("op") == "delete", _datum_map(new_part))
        .when((F.col("op") == "update") & has_old, _datum_map(old_part))
        .alias("key"),
        F.lit(None).cast("map<string,string>").alias("before"),
        F.when(F.col("op").isin("insert", "update"), _datum_map(new_part)).alias("after"),
        F.when(
            F.col("op").isin("insert", "update", "delete"),
            F.create_map(F.lit("coltypes"), _datum_types(new_part)),
        ).alias("meta"),
        *([F.col("seq")] if seq_col else []),
    )

    if not seq_col:
        return out

    from pg_logical_replication_spark.operators.transactions import assign_transactions

    return assign_transactions(out, "seq")
