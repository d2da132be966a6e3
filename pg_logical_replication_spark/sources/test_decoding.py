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
# non-capturing datum (same token grammar) for the old-key/new-tuple
# splitter: the old section is a run of WHOLE tokens, so the separator
# can only bind outside quoted values
_DATUM_NC = r'(?:"(?:[^"]|"")*"|[^\[\s]+)\[[^\]]+\]:(?:\'(?:[^\']|\'\')*\'|[^ \t]+)'
_OLDNEW_RE = r"(?s)\Aold-key: ((?:" + _DATUM_NC + r" ?)*)new-tuple: (.*)\z" 
# (?s) + \z because Java regex counts U+0085/U+2028/U+2029 as line
# terminators: without DOTALL, `.` refuses them and `$` can bind before
# a trailing one, silently dropping any row whose VALUE contains such a
# character (found by hypothesis). Line framing is still plain \n — the
# file source splits on newline only, so these characters are data.
_QUAL_RE = r'(?s)^table ("(?:[^"]|"")*"|[^.]+)\.("(?:[^"]|"")*"|[^:]+): (INSERT|UPDATE|DELETE|TRUNCATE): ?(.*)\z'
_BEGIN_RE = r"^BEGIN(?: (\d+))?\s*$"
_COMMIT_RE = r"^COMMIT(?: (\d+))?(?: \(at ([^)]+)\))?\s*$"
# stream-changes=1 block lines (PG contrib/test_decoding stream_*
# callbacks; the reference pushes the option down, reference
# test-decoding-plugin.ts:47-59, but never parses the resulting lines —
# its grammar covers only table/BEGIN/COMMIT, decoder.ts:11-43)
_STREAM_RE = (
    r"^(opening a streamed block for transaction"
    r"|closing a streamed block for transaction"
    r"|aborting streamed \(sub\)transaction"
    r"|committing streamed transaction"
    r"|streaming change for transaction)(?: TXID (\d+))?\s*$"
)
# include-sequences=1 lines (PG 16+ contrib/test_decoding pg_decode_
# sequence; option pushed down by the reference, the lines unparsed)
_SEQUENCE_RE = (
    r'(?s)^sequence ("(?:[^"]|"")*"|[^.]+)\.("(?:[^"]|"")*"|[^:]+):'
    r" transactional:(\d) last_value: (\d+) log_cnt: (\d+) is_called:(\d)\s*\z"
)


def _unquote_ident(c):
    """Strip "" quoting (grammar double_quote_escaped_string, decoder.ts:31).

    Regex-free on purpose: these run inside ``transform`` lambdas, which
    Spark interprets per element — string predicates are ~10× cheaper
    there than ``rlike``.
    """
    quoted = c.startswith('"') & c.endswith('"') & (F.length(c) >= 2)
    return F.when(
        quoted, F.replace(F.substring(c, 2, F.length(c) - 2), F.lit('""'), F.lit('"'))
    ).otherwise(c)


def _unquote_value(c):
    """null → NULL; '…''…' → unescaped; bare token unchanged (decoder.ts:30)."""
    quoted = c.startswith("'") & c.endswith("'") & (F.length(c) >= 2)
    return (
        F.when(c == "null", F.lit(None).cast("string"))
        .when(
            quoted, F.replace(F.substring(c, 2, F.length(c) - 2), F.lit("''"), F.lit("'"))
        )
        .otherwise(c)
    )


def _datum_map(names_col, vals_col):
    """Pre-extracted name/value token arrays → map<name,value>."""
    return F.map_from_arrays(
        F.transform(names_col, _unquote_ident), F.transform(vals_col, _unquote_value)
    )


def decode_test_decoding(
    raw: DataFrame,
    value_col: str = "value",
    lsn_col: str | None = None,
    seq_col: str | None = None,
    include_xids: bool = True,
    include_timestamp: bool = True,
) -> DataFrame:
    """Raw test_decoding lines → normalized ChangeEvent rows.

    One input row per line. ``lsn_col`` optionally carries the wire LSN.
    ``seq_col`` optionally carries wire order; when present, DML rows are
    framed into their transactions (xid + COMMIT timestamp attached —
    test_decoding emits both only on BEGIN/COMMIT lines, grammar
    trx_begin/trx_commit, decoder.ts:16-17) via
    ``operators.transactions.assign_transactions``.

    ``include_xids`` / ``include_timestamp`` mirror the reference's
    test_decoding option pushdown (#14,
    ``test-decoding-plugin.ts:47-59``): the server-side options suppress
    those fields at the source; here the equivalent is column pruning of
    the decode plan — the disabled metadata never enters the projection,
    so Catalyst removes the producing expressions entirely.
    """
    line = F.col(value_col)
    lsn = F.col(lsn_col) if lsn_col else F.lit(None).cast("string")

    passthrough = [F.col(seq_col).alias("seq")] if seq_col else []

    # Layered selects: every regex result is computed ONCE into a named
    # column and only cheap expressions reference it afterwards —
    # inlining (CollapseProject / Generate projections) would otherwise
    # re-run _QUAL_RE/_DATUM_RE per downstream reference (~17 regex
    # evaluations per row before this shape; ~9 after, measured 2× on
    # the roundtrip bench).
    parsed = raw.select(
        line.alias("_line"),
        lsn.alias("lsn"),
        F.lower(F.regexp_extract(line, _QUAL_RE, 3)).alias("_action"),
        F.regexp_extract(line, _QUAL_RE, 1).alias("_sch_raw"),
        F.regexp_extract(line, _QUAL_RE, 2).alias("_tbl_raw"),
        F.regexp_extract(line, _QUAL_RE, 4).alias("_data"),
        line.rlike(_BEGIN_RE).alias("_is_begin"),
        line.rlike(_COMMIT_RE).alias("_is_commit"),
        F.regexp_extract(line, _STREAM_RE, 1).alias("_stream_kind"),
        F.regexp_extract(line, _STREAM_RE, 2).alias("_stream_xid"),
        line.rlike(_SEQUENCE_RE).alias("_is_seq"),
        *passthrough,
    ).select(
        "*",
        F.when(F.col("_action") != "", F.col("_action"))
        .when(F.col("_is_begin"), "begin")
        .when(F.col("_is_commit"), "commit")
        .when(F.col("_stream_kind").startswith("opening"), "stream_start")
        .when(F.col("_stream_kind").startswith("closing"), "stream_stop")
        .when(F.col("_stream_kind").startswith("aborting"), "stream_abort")
        .when(F.col("_stream_kind").startswith("committing"), "stream_commit")
        .when(F.col("_stream_kind").startswith("streaming"), "stream_change")
        .when(F.col("_is_seq"), "sequence")
        .alias("op"),
    ).filter(F.col("op").isNotNull())

    # REPLICA IDENTITY FULL updates: "old-key: <datums> new-tuple: <datums>".
    # The split is TOKEN-AWARE: the old section must parse as complete
    # datum tokens before the separator, so a quoted VALUE containing
    # the literals 'old-key:'/'new-tuple:' can't mis-split the row
    # (review r2 — plain substring contains() did); \A anchors old-key
    # at data start, exactly where the reference grammar puts it.
    data = F.col("_data")
    has_old = data.rlike(_OLDNEW_RE)
    parts = parsed.select(
        "*",
        has_old.alias("_has_old"),
        F.when(has_old, F.regexp_extract(data, _OLDNEW_RE, 2))
        .otherwise(data)
        .alias("_new"),
        F.when(has_old, F.regexp_extract(data, _OLDNEW_RE, 1))
        .otherwise(F.lit(""))
        .alias("_old"),
    )
    toks = parts.select(
        "*",
        F.regexp_extract_all(F.col("_new"), F.lit(_DATUM_RE), 1).alias("_names"),
        F.regexp_extract_all(F.col("_new"), F.lit(_DATUM_RE), 2).alias("_types"),
        F.regexp_extract_all(F.col("_new"), F.lit(_DATUM_RE), 3).alias("_vals"),
        F.regexp_extract_all(F.col("_old"), F.lit(_DATUM_RE), 1).alias("_onames"),
        F.regexp_extract_all(F.col("_old"), F.lit(_DATUM_RE), 3).alias("_ovals"),
    )

    is_dml = F.col("op").isin("insert", "update", "delete", "truncate")
    out = toks.select(
        "op",
        "lsn",
        lsn_long_expr("lsn").alias("lsn_long"),
        F.nullif(  # xid-less BEGIN/COMMIT/stream lines (include-xids off)
            F.when(F.col("_is_begin"), F.regexp_extract("_line", _BEGIN_RE, 1))
            .when(F.col("_is_commit"), F.regexp_extract("_line", _COMMIT_RE, 1))
            .when(F.col("_stream_kind") != "", F.col("_stream_xid")),
            F.lit(""),
        )
        .cast("long")
        .alias("xid"),
        F.when(
            F.col("_is_commit"),
            # nullif('') first: without include-timestamp the real server
            # emits bare "COMMIT <xid>" and the unmatched group extracts ''
            # which to_timestamp rejects under ANSI mode (found by the
            # live-PG 15.18 conformance run, round 6).
            F.to_timestamp(
                F.nullif(F.regexp_extract("_line", _COMMIT_RE, 2), F.lit(""))
            ),
        ).alias("commit_ts"),
        F.when(is_dml, _unquote_ident(F.col("_sch_raw")))
        .when(F.col("_is_seq"), _unquote_ident(F.regexp_extract("_line", _SEQUENCE_RE, 1)))
        .alias("schema"),
        F.when(is_dml, _unquote_ident(F.col("_tbl_raw")))
        .when(F.col("_is_seq"), _unquote_ident(F.regexp_extract("_line", _SEQUENCE_RE, 2)))
        .alias("table"),
        # DELETE datums are the replica-identity key image (PG docs);
        # UPDATE old-key: likewise.
        F.when(F.col("op") == "delete", _datum_map(F.col("_names"), F.col("_vals")))
        .when(
            (F.col("op") == "update") & F.col("_has_old"),
            _datum_map(F.col("_onames"), F.col("_ovals")),
        )
        .alias("key"),
        F.lit(None).cast("map<string,string>").alias("before"),
        F.when(
            F.col("op").isin("insert", "update"),
            _datum_map(F.col("_names"), F.col("_vals")),
        ).alias("after"),
        F.when(
            F.col("op").isin("insert", "update", "delete"),
            F.create_map(F.lit("coltypes"), F.array_join(F.col("_types"), ",")),
        )
        .when(
            F.col("_is_seq"),
            F.create_map(
                F.lit("transactional"), F.regexp_extract("_line", _SEQUENCE_RE, 3),
                F.lit("last_value"), F.regexp_extract("_line", _SEQUENCE_RE, 4),
                F.lit("log_cnt"), F.regexp_extract("_line", _SEQUENCE_RE, 5),
                F.lit("is_called"), F.regexp_extract("_line", _SEQUENCE_RE, 6),
            ),
        )
        .alias("meta"),
        *([F.col("seq")] if seq_col else []),
    )

    if not seq_col:
        if not include_xids:
            out = out.withColumn("xid", F.lit(None).cast("long"))
        if not include_timestamp:
            out = out.withColumn("commit_ts", F.lit(None).cast("timestamp"))
        return out

    from pg_logical_replication_spark.operators.transactions import assign_transactions

    return assign_transactions(
        out, "seq", attach_xid=include_xids, attach_ts=include_timestamp
    )
