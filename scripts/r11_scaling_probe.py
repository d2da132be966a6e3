#!/usr/bin/env python
"""VERDICT r10 #5 — measured parallel-scaling evidence for the heavy
distributed operator paths.

The r10 driver's 8-vs-32-core sweep showed every HEADLINE query flat or
inverse-scaling — a property of the bench SF (fixed per-job overhead
dominates sub-second queries), leaving the 100 TB claims plan-shape-
only. This probe blows up SYNTHETIC inputs in-session (generated fresh
on every invocation — nothing cached across runs, deterministic seeds)
until the operators are compute-bound, then times the operator pass
through the noop sink at the invoking core count. Run it twice:

    SPARK_GRAFT_CPUS=8  python scripts/r11_scaling_probe.py
    SPARK_GRAFT_CPUS=32 python scripts/r11_scaling_probe.py

and compare per-operator seconds (docs/SCALING_r11.md records a
committed pair of runs). Operators probed:

  minhash      exploded-shingle minhash signature + band keys over a
               synthetic corpus (the md5-family dedup pipeline)
  exact_substr duplicated_span_coverage over the same corpus (window
               digest + coverage rollup)
  latest_image the CDC newest-per-key window over a synthetic
               update-heavy decoded stream (the apply-changes shuffle)
  pg_decode    decode_pgoutput over synthetic wire (Arrow-batched
               Python decode, the decoder-throughput path)

Each phase: generate to parquet in /tmp (untimed), one warm-up, then
min/median of --reps timed noop-sink runs.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.getcwd())

from pyspark.sql import functions as F  # noqa: E402


def _time(label, fn, reps):
    fn()
    ts = sorted(fn() for _ in range(reps))
    print(
        f"RESULT {label}: min {ts[0]:.2f} median {ts[len(ts) // 2]:.2f} "
        f"all {[round(t, 2) for t in ts]}",
        flush=True,
    )
    return ts[0]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=150_000)
    ap.add_argument("--events", type=int, default=40_000_000)
    ap.add_argument("--msgs", type=int, default=2_000_000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    from pg_logical_replication_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (
        os.cpu_count() or 4
    )
    spark = get_spark(app_name=f"r11-scaling-{cpus}", cpus=cpus,
                      shuffle_partitions=cpus)
    root = tempfile.mkdtemp(prefix="plrs_scale_")
    print(f"cores={cpus} root={root}", flush=True)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    def want(name):
        return args.only is None or name in args.only

    # ---- corpus: ~60 deterministic pseudo-words per doc, word overlap
    # across docs so shingles repeat (the dedup-relevant regime)
    corpus_path = os.path.join(root, "corpus")
    if want("minhash") or want("exact_substr"):
        words = F.expr(
            "transform(sequence(0, 59),"
            " i -> concat('w', pmod(id * 37 + i * 101 + (i * i) * 7, 5000)))"
        )
        (
            spark.range(args.docs)
            .select(
                F.col("id").alias("doc_id"),
                F.array_join(words, " ").alias("text"),
            )
            .repartition(cpus * 4)
            .write.mode("overwrite")
            .parquet(corpus_path)
        )
        corpus = spark.read.parquet(corpus_path)

    if want("minhash"):
        from pg_logical_replication_spark.operators.dedup import (
            minhash_bands,
            minhash_signature,
        )

        def run_minhash():
            t0 = time.perf_counter()
            noop(minhash_bands(minhash_signature(corpus, num_hashes=8),
                               band_size=2))
            return time.perf_counter() - t0

        _time(f"minhash_c{cpus}", run_minhash, args.reps)

    if want("exact_substr"):
        from pg_logical_replication_spark.operators.dedup import (
            duplicated_span_coverage,
        )

        def run_substr():
            t0 = time.perf_counter()
            noop(duplicated_span_coverage(corpus))
            return time.perf_counter() - t0

        _time(f"exact_substr_c{cpus}", run_substr, args.reps)

    if want("latest_image"):
        from pg_logical_replication_spark.operators.apply_changes import (
            latest_image,
        )

        ev_path = os.path.join(root, "events")
        n_keys = args.events // 8
        (
            spark.range(args.events)
            .select(
                (F.col("id") % n_keys).alias("k"),
                F.col("id").alias("ord"),
            )
            .select(
                F.when(F.col("ord") < n_keys, F.lit("insert"))
                .otherwise(F.lit("update")).alias("op"),
                F.lit("public").alias("schema"),
                F.lit("t").alias("table"),
                F.create_map(F.lit("id"),
                             F.col("k").cast("string")).alias("key"),
                F.create_map(
                    F.lit("id"), F.col("k").cast("string"),
                    F.lit("v"),
                    F.concat(F.lit("v"), F.col("ord").cast("string")),
                ).alias("after"),
                (F.col("ord") * 8 + 16).alias("lsn_long"),
                F.col("ord").alias("seq"),
                F.lit(None).cast("map<string,string>").alias("meta"),
            )
            .repartition(cpus * 4, F.col("seq"))
            .write.mode("overwrite")
            .parquet(ev_path)
        )
        events = spark.read.parquet(ev_path)

        def run_latest():
            t0 = time.perf_counter()
            noop(latest_image(events, ["id"]))
            return time.perf_counter() - t0

        _time(f"latest_image_c{cpus}", run_latest, args.reps)

    if want("pg_decode"):
        from pg_logical_replication_spark.sources import pgoutput_format as fmt
        from pg_logical_replication_spark.sources.pgoutput import (
            decode_pgoutput,
        )

        rel = fmt.encode_relation(
            16385, "public", "huge_transaction",
            [(f"col{j:02d}", 25) for j in range(20)],
            key_columns=["col00"],
        )
        cache: dict = {}
        fmt.parse_message(rel, cache)

        def make(_idx, it):
            for i in it:
                yield (
                    f"0/{16 + 8 * i:X}",
                    i,
                    fmt.encode_insert(
                        16385, [("t", f"v{i}_{j}") for j in range(20)]
                    ),
                )

        wire_path = os.path.join(root, "wire")
        rdd = spark.sparkContext.parallelize(
            range(args.msgs), cpus * 4
        ).mapPartitionsWithIndex(make)
        spark.createDataFrame(
            rdd, "lsn string, seq long, data binary"
        ).write.mode("overwrite").parquet(wire_path)
        wire = spark.read.parquet(wire_path)

        def run_decode():
            t0 = time.perf_counter()
            noop(decode_pgoutput(wire, relations=cache))
            return time.perf_counter() - t0

        _time(f"pg_decode_c{cpus}", run_decode, args.reps)

    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
