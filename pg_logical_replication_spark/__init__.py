"""pg_logical_replication_spark — a PySpark-native CDC analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference TypeScript library ``kibae/pg-logical-replication`` (a PostgreSQL
logical-replication / CDC client), re-expressed Spark-first:

* ``sources``   — decoders for the four PostgreSQL logical-decoding output
  formats (``pgoutput`` binary, ``wal2json`` JSON, ``test_decoding`` text,
  ``decoderbufs`` protobuf) producing one normalized ``ChangeEvent``
  DataFrame schema (see ``model.CHANGE_EVENT_SCHEMA``).
* ``operators`` — apply-changes materialization (CDC → snapshot), dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
  similarity search, text analysis, as-of joins.
* ``plans``     — the relational query layer (joins, aggregations, windows,
  set ops, top-k) over materialized tables, built on DataFrame/SQL so
  Catalyst handles pushdown, pruning, and join strategy.
* ``streaming`` — Structured Streaming equivalents: file-source change
  streams, checkpoint/resume (the reference's acknowledge/replay),
  foreachBatch merge, watermarks.

Everything here uses only the public PySpark API; custom logic drops to
Arrow-batched pandas UDFs only where built-ins cannot express the semantics
(the pgoutput binary parse and decoderbufs protobuf parse).
"""

__version__ = "0.4.0"


def _ensure_protobuf_shim() -> None:
    """Make ``transformWithStateInPandas`` work without the protobuf
    package: its PySpark runtime speaks protobuf to the JVM state
    server, so when ``google.protobuf`` is absent we append the vendored
    mini-runtime (``_vendor/pbshim``, see its docstring) to BOTH
    ``sys.path`` (driver) and ``PYTHONPATH`` (inherited by Python
    workers — must happen before the first worker daemon spawns, hence
    at package import). A real protobuf installation always wins: the
    shim path is only added when the import is missing."""
    import importlib.util
    import os
    import sys

    try:
        present = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        present = False
    if present:
        return
    shim = os.path.join(os.path.dirname(__file__), "_vendor", "pbshim")
    if shim not in sys.path:
        sys.path.append(shim)
    parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if shim not in parts:
        os.environ["PYTHONPATH"] = os.pathsep.join(
            [p for p in parts if p] + [shim]
        )


_ensure_protobuf_shim()

from pg_logical_replication_spark.model import (  # noqa: F401
    CHANGE_EVENT_SCHEMA,
    lsn_to_long,
    long_to_lsn,
    ack_lsn,
    lsn_long_expr,
)
from pg_logical_replication_spark.session import get_spark, register_tables  # noqa: F401
