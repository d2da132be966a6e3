"""Python UDTF surface (SURVEY §2.2 UDF/UDAF/UDTF row): one encoded
changeset → many change rows, as a LATERAL-joinable table function.

The production wal2json path is fully declarative (``from_json`` +
``posexplode`` in sources/wal2json.py — JVM-side, codegen) and should
stay that way; this UDTF exists because the capability matrix promises
the one-message→many-rows *imperative* surface for formats whose parse
can't be expressed declaratively (nested/conditional layouts). It is
the template: ``eval`` yields zero-or-more tuples per input row,
malformed input yields zero rows (the DLQ path in sources/registry.py
is where rejects get surfaced, not an exception that kills the batch).

Scale: UDTFs run in the Python worker per partition — same process
model as the pgoutput ``mapInPandas`` decode, so parallelism is the
partition count; no shuffle is introduced by the lateral join itself.

Usage::

    from pg_logical_replication_spark.sources.udtf_explode import (
        register_wal2json_explode)
    register_wal2json_explode(spark)
    spark.sql("SELECT f.* FROM raw, LATERAL wal2json_explode(raw.value) f")
"""

from __future__ import annotations

import json

from pyspark.sql.functions import udtf


@udtf(
    returnType="op string, schema_name string, table_name string, "
    "after map<string,string>"
)
class Wal2JsonExplode:
    """Explode one wal2json changeset line into its change rows.

    Values are normalized to the text forms the normalized ChangeEvent
    layer uses (reference wal2json output shape:
    wal2json-plugin-output.type.ts:26-60): null stays NULL, booleans
    lowercase, everything else str().
    """

    def eval(self, line: str):  # noqa: D102 — UDTF contract
        if not line:
            return
        try:
            changeset = json.loads(line)
        except (ValueError, TypeError):
            return  # malformed → zero rows; DLQ reporting is decode-level
        def to_text(v):
            if v is None:
                return None
            return "true" if v is True else "false" if v is False else str(v)

        for change in changeset.get("change") or []:
            names = change.get("columnnames") or []
            values = change.get("columnvalues") or []
            after = {n: to_text(v) for n, v in zip(names, values)}
            # deletes (and identity-carrying updates) identify their row
            # through oldkeys; fold them in prefixed so the consumer can
            # tell which row was touched (review r2: dropped entirely,
            # making delete rows identity-less)
            ok = change.get("oldkeys") or {}
            for n, v in zip(
                ok.get("keynames") or [], ok.get("keyvalues") or []
            ):
                after.setdefault(f"_key_{n}", to_text(v))
            yield (
                change.get("kind"),
                change.get("schema"),
                change.get("table"),
                after,
            )


def register_wal2json_explode(spark, name: str = "wal2json_explode") -> None:
    """Register the UDTF for SQL LATERAL use."""
    spark.udtf.register(name, Wal2JsonExplode)
