#!/usr/bin/env python
"""Warm per-query timing (build + noop action, the bench's shape) for
a named subset — the round-11 A/B harness. Run from the checkout being
measured; prints min/median of N warm reps per query.

Usage: [SPARK_GRAFT_SF_DIR=...] python scripts/r11_time_queries.py \
           [--reps 5] [--cpus 0] q_a q_b ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=0)
    args = ap.parse_args()

    from pg_logical_replication_spark.plans.registry import QUERIES
    from pg_logical_replication_spark.session import get_spark

    cpus = args.cpus or (os.cpu_count() or 4)
    spark = get_spark(app_name="r11-time", cpus=cpus,
                      shuffle_partitions=cpus)
    QUERIES["q1_pricing_summary"].builder(spark, SF_DIR).write.format(
        "noop").mode("overwrite").save()  # session warmup
    for name in args.queries:
        def run() -> float:
            t0 = time.perf_counter()
            QUERIES[name].builder(spark, SF_DIR).write.format("noop").mode(
                "overwrite").save()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            return dt

        run()  # warmup
        times = sorted(run() for _ in range(args.reps))
        print(f"{name}: min {times[0]:.3f} "
              f"median {times[len(times) // 2]:.3f} "
              f"all {[round(t, 3) for t in times]}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
