#!/usr/bin/env python
"""Dump explain('formatted') for named queries to plans/r11/.

Usage: python scripts/r11_dump_plans.py SUFFIX q_a q_b ...
  SUFFIX is 'before' or 'after'; run from the repo checkout whose plans
  you want (the before-worktree or the optimized HEAD). Output always
  lands in the MAIN repo's plans/r11/.
"""

from __future__ import annotations

import os
import sys

# import the package from the CURRENT WORKING DIRECTORY's checkout —
# the script may be invoked from a before-worktree whose code must be
# the one planned (inserting the script's own repo would silently plan
# the optimized code twice)
sys.path.insert(0, os.getcwd())
_OUT = "/root/repo/plans/r11"

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from pg_logical_replication_spark.plans.registry import QUERIES
    from pg_logical_replication_spark.session import get_spark

    spark = get_spark(app_name=f"r11-plans-{suffix}", cpus=8,
                      shuffle_partitions=8)
    os.makedirs(_OUT, exist_ok=True)
    for name in names:
        df = QUERIES[name].builder(spark, SF_DIR)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(_OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        n_ex = txt.count("Exchange")
        print(f"{name}: {len(txt.splitlines())} lines, "
              f"{n_ex} Exchange -> {path}", flush=True)
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    sys.exit(main())
