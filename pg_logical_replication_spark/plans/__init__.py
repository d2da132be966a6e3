"""Query layer: the relational/dataflow capability matrix of SURVEY §2.2.

Every query is registered in ``registry.QUERIES`` as a (Spark builder,
DuckDB oracle SQL) pair; ``__spark_entry__.py`` exposes them to the
driver's correctness gate. Import order matters only in that importing
this package registers everything.
"""

from pg_logical_replication_spark.plans.registry import QUERIES, QuerySpec  # noqa: F401
from pg_logical_replication_spark.plans import relational  # noqa: F401
from pg_logical_replication_spark.plans import tpch_extra  # noqa: F401
from pg_logical_replication_spark.plans import cdc_queries  # noqa: F401
from pg_logical_replication_spark.plans import pipeline  # noqa: F401
from pg_logical_replication_spark.plans import multimodal  # noqa: F401
from pg_logical_replication_spark.plans import analytics_extra  # noqa: F401
from pg_logical_replication_spark.plans import timeseries_stats  # noqa: F401
