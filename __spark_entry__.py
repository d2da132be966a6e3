"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` expose the engine's query inventory
(SURVEY.md §2) from ``pg_logical_replication_spark.plans``; the driver
runs each Spark query against its DuckDB oracle at sf0.01 (row count +
schema + order-insensitive value hash). ``entry`` runs the flagship
TPC-H-style pricing summary at sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


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
