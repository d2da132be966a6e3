"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` expose the engine's query inventory
(SURVEY.md §2) from ``pg_logical_replication_spark.plans``; the driver
runs each Spark query against its DuckDB oracle at sf0.01 (row count +
schema + order-insensitive value hash). ``entry`` runs the flagship
TPC-H-style pricing summary at sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Python workers deserialize mapInPandas closures that reference the
# package — make it importable even when the driver runs from another
# cwd (workers inherit PYTHONPATH when it is set before the JVM forks).
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
if _REPO not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else _REPO
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pg_logical_replication_spark.plans import QUERIES

    return QUERIES["q1_pricing_summary"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pg_logical_replication_spark.plans import QUERIES

    return {name: spec.builder for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins; queries without an oracle (engine-
    specific sketches/LSH recall) are omitted → rows-only check."""
    from pg_logical_replication_spark.plans import QUERIES

    return {
        name: spec.oracle for name, spec in QUERIES.items() if spec.oracle is not None
    }
