#!/usr/bin/env python
"""VERDICT r10 #4 — profile the e2e visibility leg's fixed costs.

Reproduces bench.py's _e2e_visibility_latency shape but with an
instrumented foreachBatch sink that replicates the service's
tracked_sink + MergeOnReadTable.apply_batch phase by phase, so the
~800-1050 ms per-batch latency decomposes into:

  pickup   append -> foreachBatch entry (trigger poll + offset planning
           + micro-batch construction)
  stats    the persist-materializing count/max-lsn aggregate job
  write    latest_image + coalesce + parquet write job
  commit   foreachBatch exit -> ack observed by the poller (offset/commit
           log writes + poll granularity)

Usage: python scripts/r11_vis_profile.py [--batches 6] [--cpus 0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--cpus", type=int, default=0)
    args = ap.parse_args()

    from pg_logical_replication_spark.operators.apply_changes import (
        latest_image,
    )
    from pg_logical_replication_spark.session import get_spark
    from pg_logical_replication_spark.sources import decode

    cpus = args.cpus or (os.cpu_count() or 4)
    spark = get_spark(app_name="r11-vis-profile", cpus=cpus,
                      shuffle_partitions=cpus)

    root = tempfile.mkdtemp(prefix="plrs_visprof_")
    log = os.path.join(root, "log")
    tbl = os.path.join(root, "tbl")
    os.makedirs(log)

    marks: dict[int, dict[str, float]] = {}
    append_t: dict[int, float] = {}

    def sink(batch_df, batch_id: int) -> None:
        m = marks.setdefault(batch_id, {})
        m["enter"] = time.perf_counter()
        batch_df.persist()
        stats = batch_df.agg(
            F.count("*").alias("n"),
            F.max("lsn_long").alias("m"),
            F.max_by("lsn", "lsn_long").alias("s"),
        ).first()
        m["stats"] = time.perf_counter()
        latest = latest_image(batch_df, ["id"], table="t")
        out = latest.select(
            "op", "lsn_long", "schema", "table", "key", "after",
            F.lit(None).cast("map<string,string>").alias("types"),
            F.col("_ord").getField("col1").alias("_ord1"),
        )
        if (stats["n"] or 0) <= 10_000:
            out = out.coalesce(1)
        out.write.mode("overwrite").parquet(
            os.path.join(tbl, f"batch={batch_id}")
        )
        m["write"] = time.perf_counter()
        m["n"] = stats["n"]
        m["last"] = stats["s"]
        batch_df.unpersist()

    ev = decode(
        spark.readStream.format("text").load(log), "wal2json"
    )
    q = (
        ev.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(root, "ckpt"))
        .outputMode("append")
        .start()
    )
    rows = []
    try:
        total = 0
        for batch in range(args.batches):
            t0 = time.perf_counter()
            with open(os.path.join(log, f"{batch:03d}.jsonl"), "w") as f:
                for i in range(100):
                    rid = batch * 100 + i
                    f.write(json.dumps({
                        "change": [{
                            "kind": "insert", "schema": "public",
                            "table": "t",
                            "columnnames": ["id", "v"],
                            "columntypes": ["bigint", "text"],
                            "columnvalues": [rid, f"v{rid}"],
                        }],
                        "nextlsn": f"0/{16 + 8 * rid:X}",
                    }) + "\n")
            append_t[batch] = t0
            total += 100
            want = f"0/{16 + 8 * (total - 1):X}".upper()
            while True:
                done = [
                    bid for bid, m in marks.items()
                    if "last" in m and m["last"] is not None
                    and m["last"].upper() >= want
                ]
                if done:
                    break
                time.sleep(0.005)
            t_vis = time.perf_counter()
            # the batch that carried this append's last LSN
            bid = max(done)
            m = marks[bid]
            row = {
                "append_batch": batch,
                "micro_batch": bid,
                "pickup_ms": round((m["enter"] - t0) * 1000),
                "stats_ms": round((m["stats"] - m["enter"]) * 1000),
                "write_ms": round((m["write"] - m["stats"]) * 1000),
                "commit_ms": round((t_vis - m["write"]) * 1000),
                "total_ms": round((t_vis - t0) * 1000),
            }
            rows.append(row)
            print(row, flush=True)
    finally:
        q.stop()
    steady = rows[1:]
    if steady:
        for k in ("pickup_ms", "stats_ms", "write_ms", "commit_ms",
                  "total_ms"):
            vals = sorted(r[k] for r in steady)
            print(f"{k}: min {vals[0]} median {vals[len(vals)//2]} "
                  f"max {vals[-1]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
