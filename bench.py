#!/usr/bin/env python3
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line: {"metric", "value" (total sec), "unit", "queries"
(per-query sec), "sf"}. Each query is forced end-to-end with the noop
sink (full execution, no driver collect overhead). Session startup and a
warmup run are excluded — we measure query time, not JVM boot.
"""

from __future__ import annotations

import json
import os
import re
import time

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q_window_topk",
    "q_sessionize",
    # CDC layer (decoder throughput is the reference's only perf signal)
    "q_cdc_wal2json_roundtrip",
    "q_cdc_test_decoding_roundtrip",
    "q_cdc_pgoutput_roundtrip",
    "q_cdc_apply_events",
    # LLM-pipeline ops
    "q_dedup_minhash_bands",
    "q_dedup_jaccard_top",
    "q_dedup_simhash",
    "q_ann_cosine_topk",
    "q_text_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)

    from pg_logical_replication_spark.plans import QUERIES
    from pg_logical_replication_spark.session import get_spark

    spark = get_spark(app_name="plrs-bench", cpus=cpus, shuffle_partitions=cpus)

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # warmup: JIT + codegen + parquet footer caches
    QUERIES["q1_pricing_summary"].builder(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    # Two timed runs, report the min: the first run of a query includes
    # one-off driver-side plan compilation (~0.5-1 s), which is not the
    # steady-state cost a 100 TB deployment pays per query.
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[name].builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        per_query[name] = round(best, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(per_query.values()), 3),
                "unit": "sec",
                "queries": per_query,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
