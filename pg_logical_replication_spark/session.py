"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]`` in one JVM; the configs below are chosen so
the same logical plans scale to a multi-executor cluster at ~100 TB:

* AQE on (runtime re-planning, skew-join splitting, partition coalescing),
* Arrow on (pandas-UDF decode path is Arrow-batched),
* shuffle partitions sized to cores locally; on a real cluster this is
  overridden (AQE coalesces away the difference),
* UTC session timezone so CDC commit timestamps are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pg_logical_replication_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` or all cores. On a real
    cluster you would drop ``.master`` and submit normally; nothing else
    here is local-mode-specific.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Keep CPU-dense small shuffles parallel: the default 1 MB floor
        # lets AQE coalesce a few-MB compressed shuffle to ONE partition,
        # serializing every downstream stage (measured 2-4× on the
        # dedup bench). At cluster scale partitions are far above 64 KB,
        # so this floor never binds there.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # At 100 TB: files are split into ≤128 MB tasks; AQE re-coalesces
        # small post-shuffle partitions, so over-partitioning is safe.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Small-input parallelism: target at least one split per core —
        # Spark's split size is min(maxPartitionBytes, max(openCost,
        # totalBytes/minPartitionNum)), so this only SHRINKS splits when
        # the input is small relative to the cores (a 15 MB sf0.1 table
        # otherwise scans as 3 tasks on 32 cores); at 100 TB
        # totalBytes/cores ≫ 128 MB and the cap binds as before.
        .config("spark.sql.files.minPartitionNum", str(cpus))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def register_tables(spark: SparkSession, sf_dir: str, prefix: str = "") -> list[str]:
    """Register the engine's tables as temp views for plain-SQL use.

    A consumer of the reference library that today runs SQL against the
    replicated PostgreSQL can point ``spark.sql`` at the materialized
    tables instead: every TESTDATA table (and, in production, every
    apply_changes snapshot) becomes a named view. Returns the view
    names. Views are lazy — registration reads only parquet footers.
    """
    from pg_logical_replication_spark.plans.registry import TABLES, t

    names = []
    for name in TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(prefix + name)
        names.append(prefix + name)
    return names
