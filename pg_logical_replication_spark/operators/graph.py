"""Iterative graph operators as co-partitioned join loops.

SCALE.md's 'PageRank' section prescribed this formulation in prose for
graphs whose edge list outgrows the driver; this module is that code
(review r2 #7). The arithmetic is kept BIT-IDENTICAL to the driver-side
replicated loop in ``plans/analytics_extra.q_graph_pagerank``: per-edge
contribution ``rank·w/outw`` in IEEE double, half-up-stabilized to
``decimal(38,18)`` (Spark's double→decimal cast rounds HALF_UP, same as
the Python ``Decimal.quantize`` twin), exact decimal summation, then the
damping step back in double — so the two formulations agree exactly and
an oracle written for one checks the other.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    teleport: float | None = None,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """Weighted PageRank as a distributed join loop → (v, rank).

    Per round: ranks ⋈ edges on src (one hash shuffle), per-edge double
    contribution stabilized to decimal(38,18), exact decimal groupBy on
    dst (partial-aggregatable), left-join back onto the node set for the
    damping step. ``localCheckpoint`` truncates lineage per round, the
    standard Pregel-loop shape (same as ``dedup.connected_components``).

    Scale: state per round is (v, rank) pairs — never adjacency — and
    every join keys on the vertex id, so AQE co-partitions the rounds.
    Rank mass of dangling nodes (no out-edges) follows the driver twin:
    it simply decays (no redistribution), which is what makes the two
    formulations and the SQL oracle agree term-for-term.

    ``teleport`` defaults to ``1 - damping``; pass it explicitly when a
    caller needs the exact float literal of a replicated implementation
    (e.g. ``0.15`` is not bit-equal to ``1 - 0.85`` in IEEE double).
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).alias("w"),
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    ew = e.join(outw, "src").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    tele = (teleport if teleport is not None else 1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            ew.join(ranks, ew["src"] == ranks["v"])
            .select(
                "dst",
                (F.col("rank") * F.col("w") / F.col("outw"))
                .cast("decimal(38,18)")
                .alias("contrib"),
            )
            .groupBy("dst")
            .agg(F.sum("contrib").alias("mass"))
        )
        ranks = (
            nodes.join(contribs, nodes["v"] == contribs["dst"], "left")
            .select(
                "v",
                (
                    F.lit(tele)
                    + F.lit(damping)
                    * F.coalesce(F.col("mass").cast("double"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
