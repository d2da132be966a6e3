#!/usr/bin/env python
"""VERDICT r10 #2 — adjudicate latest_image's max_by rewrite under a
controlled UPDATE-HEAVY fixture.

Round 10 rewrote latest_image's newest-per-key from a row_number window
(whose plan already had a map-side WindowGroupLimit) to groupBy +
max_by(struct, _ord) (partial SortAggregate). The builder's warm A/Bs
showed small wins; the driver's cold r10 runs showed
q_cdc_apply_type_widening −19% / q_cdc_bootstrap_apply flat. Both
shapes limit rows map-side, so the shuffle-volume argument is weaker
than the r10 ledger claimed. This script settles it the way VERDICT
prescribes: a synthetic CDC stream with update factor ≥5 written to
parquet, then ALTERNATING warm A/B (window vs max_by) through the noop
sink, min-of-N per arm.

Usage: python scripts/r11_maxby_ab.py [--keys 500000] [--updates 7]
       [--reps 5] [--cpus 0]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def latest_image_window(events: DataFrame, key_columns: list[str]) -> DataFrame:
    """The pre-r10 shape: identical filters/identity, newest-per-key via
    row_number over a descending window (plans with WindowGroupLimit)."""
    ev = events.filter(
        F.col("op").isin("insert", "update", "delete", "truncate")
    )
    from pg_logical_replication_spark.operators.apply_changes import _order_col

    ev = ev.withColumn("_ord", _order_col(ev))
    identity = F.when(
        F.col("op").isin("insert", "update") & F.col("after").isNotNull(),
        F.array(*[F.col("after").getItem(k) for k in key_columns]),
    ).otherwise(F.array(*[F.col("key").getItem(k) for k in key_columns]))
    ev = ev.withColumn("_identity", identity)
    part = ["schema", "table", "_identity"] if "schema" in ev.columns else [
        "table", "_identity"]
    w = Window.partitionBy(*part).orderBy(F.col("_ord").desc())
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def latest_image_maxby(events: DataFrame, key_columns: list[str]) -> DataFrame:
    """The r10 shape, minus the truncate/key-change branches neither arm
    exercises on this fixture (both arms skip them identically via the
    published operator below when they matter — here we isolate the
    newest-per-key core both arms share)."""
    ev = events.filter(
        F.col("op").isin("insert", "update", "delete", "truncate")
    )
    from pg_logical_replication_spark.operators.apply_changes import _order_col

    ev = ev.withColumn("_ord", _order_col(ev))
    identity = F.when(
        F.col("op").isin("insert", "update") & F.col("after").isNotNull(),
        F.array(*[F.col("after").getItem(k) for k in key_columns]),
    ).otherwise(F.array(*[F.col("key").getItem(k) for k in key_columns]))
    ev = ev.withColumn("_identity", identity)
    part = ["schema", "table", "_identity"] if "schema" in ev.columns else [
        "table", "_identity"]
    cols = ev.columns
    agg = ev.groupBy(*part).agg(
        F.max_by(
            F.struct(*[c for c in cols if c not in part]), F.col("_ord")
        ).alias("_st")
    )
    return agg.select(
        *[
            F.col("_st").getField(c).alias(c) if c not in part else F.col(c)
            for c in cols
        ]
    )


def make_fixture(spark, path: str, n_keys: int, updates: int) -> None:
    """Update-heavy decoded CDC stream: n_keys keys, `updates` updates
    each after the insert, shuffled wire order, written as parquet in
    the projected shape apply_changes ships to latest_image."""
    n = n_keys * (1 + updates)
    df = (
        spark.range(n)
        .select(
            (F.col("id") % n_keys).alias("k"),
            F.col("id").alias("ord"),
        )
        .select(
            F.when(F.col("ord") < n_keys, F.lit("insert"))
            .otherwise(F.lit("update"))
            .alias("op"),
            F.lit("public").alias("schema"),
            F.lit("t").alias("table"),
            F.create_map(
                F.lit("id"), F.col("k").cast("string")
            ).alias("key"),
            F.create_map(
                F.lit("id"), F.col("k").cast("string"),
                F.lit("v"), F.concat(F.lit("v"), F.col("ord").cast("string")),
                F.lit("pad"), F.repeat(F.lit("x"), 40),
            ).alias("after"),
            (F.col("ord") * 8 + 16).alias("lsn_long"),
            F.col("ord").alias("seq"),
            F.lit(None).cast("map<string,string>").alias("meta"),
        )
    )
    # shuffle wire order across files so neither arm gets pre-grouped input
    df.repartition(32, F.col("seq")).write.mode("overwrite").parquet(path)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", type=int, default=500_000)
    ap.add_argument("--updates", type=int, default=7)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=0)
    args = ap.parse_args()

    from pg_logical_replication_spark.session import get_spark

    cpus = args.cpus or (os.cpu_count() or 4)
    spark = get_spark(app_name="r11-maxby-ab", cpus=cpus,
                      shuffle_partitions=cpus)
    path = os.path.join(tempfile.mkdtemp(prefix="plrs_ab_"), "events")
    make_fixture(spark, path, args.keys, args.updates)
    src = spark.read.parquet(path)
    n = src.count()
    print(f"fixture: {n} events, {args.keys} keys, "
          f"update factor {args.updates}, {cpus} cores", flush=True)

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(src, ["id"]).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # warm both arms once (codegen/JIT), then alternate
    run(latest_image_window)
    run(latest_image_maxby)
    win, mx = [], []
    for _ in range(args.reps):
        win.append(run(latest_image_window))
        mx.append(run(latest_image_maxby))
    fmt = lambda xs: " ".join(f"{x:.3f}" for x in xs)  # noqa: E731
    print(f"window reps: {fmt(win)}  min {min(win):.3f}  "
          f"median {sorted(win)[len(win)//2]:.3f}")
    print(f"max_by reps: {fmt(mx)}  min {min(mx):.3f}  "
          f"median {sorted(mx)[len(mx)//2]:.3f}")
    print(f"min-ratio window/max_by: {min(win)/min(mx):.3f} "
          f"(>1 means max_by faster)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
