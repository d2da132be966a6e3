"""10x scale probe for the star-contraction pair (VERDICT r7 #4).

Methodology = SCALE.md r5/r6 probes: 10x sf0.1 documents with shifted
doc_ids (each replica's ids offset by k * 10_000_000 so dup clusters
replicate rather than merge), median of 3, noop sink. Additionally
records the contraction ROUND COUNT via the new stats= hook, at 1x and
10x, to put a measured number on the "chains close in ~log2(n) rounds"
claim.
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from pg_logical_replication_spark import get_spark
from pg_logical_replication_spark.operators import dedup as D
from pg_logical_replication_spark.plans import QUERIES

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="star-probe", cpus=32, shuffle_partitions=32)

docs1 = spark.read.parquet(f"{SF}/documents.parquet")

# 10x: shifted ids
reps = []
for k in range(10):
    reps.append(
        docs1.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(k * 10_000_000)).cast("long")
        )
    )
big = reps[0]
for r in reps[1:]:
    big = big.unionByName(r)
d10 = "/tmp/star_probe_docs10"
big.repartition(32).write.mode("overwrite").parquet(d10)
docs10 = spark.read.parquet(d10)
print("rows 1x:", docs1.count(), "10x:", docs10.count(), flush=True)

# round counts (one instrumented run per scale)
for tag, docs in (("1x", docs1), ("10x", docs10)):
    stats = {}
    t0 = time.perf_counter()
    D.connected_components_star(
        D.minhash_candidate_pairs(docs), stats=stats
    ).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(
        f"star {tag}: rounds={stats['rounds']} "
        f"edges_per_round={stats['edges_per_round']} sec={dt:.2f}",
        flush=True,
    )

# full-query timings, median of 3 (1x via registry, 10x via the same
# builder body pointed at the 10x docs)


def run_query(name, docs):
    if name == "q_corpus_leakage_split":
        labels = D.connected_components_star(D.minhash_candidate_pairs(docs))
        assigned = (
            docs.select("doc_id", "lang", "n_chars")
            .join(labels, "doc_id", "left")
            .withColumn("label", F.coalesce("label", "doc_id"))
        )
        out = (
            assigned.withColumn("split", D.split_assign_expr())
            .groupBy("split")
            .agg(
                F.count("*").alias("n_docs"),
                F.countDistinct("label").cast("bigint").alias("n_clusters"),
                F.sum("n_chars").cast("bigint").alias("chars"),
            )
            .orderBy("split")
        )
    else:
        labels = D.connected_components_star(D.minhash_candidate_pairs(docs))
        sizes = labels.groupBy("label").agg(F.count("*").alias("sz"))
        out = (
            docs.select("doc_id", "lang")
            .join(labels, "doc_id", "left")
            .join(sizes, "label", "left")
            .select("lang", D.soft_weight_expr().alias("w_ppm"))
            .groupBy("lang")
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("w_ppm").cast("bigint").alias("effective_docs_ppm"),
                (F.count("*") * 1000000 - F.sum("w_ppm"))
                .cast("bigint")
                .alias("dup_mass_ppm"),
            )
            .orderBy("lang")
        )
    out.write.format("noop").mode("overwrite").save()


for name in ("q_corpus_leakage_split", "q_dedup_soft_weights"):
    for tag, docs in (("1x", docs1), ("10x", docs10)):
        run_query(name, docs)  # warm-up
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run_query(name, docs)
            times.append(time.perf_counter() - t0)
        print(
            f"{name} {tag}: median={statistics.median(times):.2f} "
            f"times={[round(t,2) for t in times]}",
            flush=True,
        )

spark.stop()
