"""Banded hyperplane LSH: collision guarantees and candidate hygiene."""

import math
import random

from pg_logical_replication_spark.operators.similarity import hyperplane_band_pairs

DIM = 16


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_identical_vectors_always_collide_and_score_exact(spark):
    rng = random.Random(7)
    v = [rng.uniform(-1, 1) for _ in range(DIM)]
    far = [[rng.uniform(-1, 1) for _ in range(DIM)] for _ in range(3)]
    df = _emb(spark, [v, v] + far)
    pairs = {
        (r["id_a"], r["id_b"]): r["dot"]
        for r in hyperplane_band_pairs(df, dim=DIM).collect()
    }
    assert (0, 1) in pairs  # equal vectors share every band signature
    expected = sum(math.floor(x * 1000) ** 2 for x in df.collect()[0]["embedding"])
    assert pairs[(0, 1)] == expected


def test_pairs_are_deduped_and_ordered(spark):
    rng = random.Random(11)
    vecs = [[rng.uniform(-1, 1) for _ in range(DIM)] for _ in range(30)]
    vecs += [list(v) for v in vecs[:5]]  # 5 exact dup pairs -> both bands match
    rows = hyperplane_band_pairs(_emb(spark, vecs), dim=DIM).collect()
    keys = [(r["id_a"], r["id_b"]) for r in rows]
    assert len(keys) == len(set(keys))  # band overlap never duplicates a pair
    assert all(a < b for a, b in keys)
    assert {(i, 30 + i) for i in range(5)} <= set(keys)


def _near_dup_fixture(spark):
    """Deterministic 64-d corpus with planted near-duplicates: 20 seeded
    base vectors each with a 1%-perturbed twin (cosine ≈ 0.999) plus 100
    random fillers. The sf0.001 embeddings are uniform-random (max pair
    cosine ≈ 0.48), so near-dup behavior needs planted structure."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for _ in range(20):
        base = rng.standard_normal(64)
        twin = base + 0.01 * rng.standard_normal(64)
        for v in (base, twin):
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(100):
        rows.append((vid, [float(x) for x in rng.standard_normal(64)]))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_near_dup_bucketed_agrees_with_global(spark):
    """The distributed per-LSH-bucket near-dup kernel must agree with the
    exact driver-broadcast matmul at near-dup thresholds: identical
    scores for found pairs, and full recall on the planted twins (review
    r2 #2 done-criterion)."""
    from pg_logical_replication_spark.operators.similarity import (
        _near_dup_pairs_global,
        cosine_near_dup_pairs_bucketed,
    )

    emb = _near_dup_fixture(spark)
    glob = {
        (r.a_id, r.b_id): r.cosine
        for r in _near_dup_pairs_global(emb, 0.95, "vec_id", "embedding").collect()
    }
    buck = {
        (r.a_id, r.b_id): r.cosine
        for r in cosine_near_dup_pairs_bucketed(emb, threshold=0.95).collect()
    }
    assert len(glob) == 20, glob  # exactly the planted twins
    # bucketed ⊆ global (a bucket pair is an exact-scored real pair) …
    assert set(buck) <= set(glob)
    # … scores identical where both found the pair …
    assert all(abs(buck[p] - glob[p]) < 1e-12 for p in buck)
    # … and at cosine ≈ 0.999 / 8 tables the miss probability is ~1e-10:
    # nothing escapes every table
    assert set(buck) == set(glob)


def test_near_dup_guard_routes_to_bucketed(spark):
    """Above max_collect_rows the public entry point must never collect
    the corpus: it should return the bucketed plan (visible as the
    FlatMapGroupsInPandas node), and still find the planted pairs."""
    from pg_logical_replication_spark.operators.similarity import (
        cosine_near_dup_pairs,
    )

    emb = _near_dup_fixture(spark)
    routed = cosine_near_dup_pairs(emb, threshold=0.95, max_collect_rows=10)
    plan = routed._jdf.queryExecution().optimizedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert routed.count() == 20


def test_hot_bucket_valve_bounds_task_size(spark):
    """A dense duplicate cluster (10k IDENTICAL vectors — every one
    lands in the same bucket of every table) must not produce an O(k²)
    task: with bucket_cap the per-(table, bucket, sub) groups stay
    ~cap-sized, every reported pair is still an exact cosine 1.0, and
    (nearly) every member of the cluster survives into at least one
    pair, so connected-component dedup still collapses the cluster
    (VERDICT r4 #2 done-criterion)."""
    import pyspark.sql.functions as F

    from pg_logical_replication_spark.operators.similarity import (
        bucket_sub_salt_expr,
        cosine_near_dup_pairs_bucketed,
        hyperplane_signs,
    )

    n, cap = 10_000, 64
    vec = [float((d * 7) % 13 - 6) for d in range(64)]
    emb = (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            F.array(*[F.lit(x) for x in vec])
            .cast("array<double>")
            .alias("embedding"),
        )
    )

    # Bounded tasks: replay the valve's grouping and check the max
    # sub-group size (expected ~cap; 2*cap is ~8 sigma of the md5 salt).
    sig_arr = F.array(
        *[hyperplane_signs("embedding", 64, 4, table=t_) for t_ in range(8)]
    )
    ex = emb.select(
        F.col("vec_id").alias("_id"), F.posexplode(sig_arr).alias("tbl", "bucket")
    )
    census = ex.groupBy("tbl", "bucket").agg(F.count("*").alias("_bn"))
    sized = (
        ex.join(F.broadcast(census), ["tbl", "bucket"])
        .withColumn("sub", F.expr(bucket_sub_salt_expr(cap=cap)))
        .groupBy("tbl", "bucket", "sub")
        .count()
    )
    stats = sized.agg(
        F.max("count").alias("mx"), F.count("*").alias("groups")
    ).collect()[0]
    assert stats["mx"] <= 2 * cap, stats
    assert stats["groups"] >= 8 * (n // cap) // 2, stats

    pairs = cosine_near_dup_pairs_bucketed(
        emb, threshold=0.95, bucket_cap=cap
    )
    got = pairs.agg(
        F.count("*").alias("n_pairs"),
        F.min("cosine").alias("mn"),
        (
            F.size(
                F.array_distinct(
                    F.flatten(F.collect_list(F.array("a_id", "b_id")))
                )
            )
        ).alias("n_members"),
    ).collect()[0]
    assert got["n_pairs"] > 0
    assert got["mn"] == 1.0  # exact cosine on identical vectors
    # each survivor links into the cluster; singleton sub-buckets are
    # ~impossible at these sizes, but allow a handful
    assert got["n_members"] >= n - 10, got


def test_kmeans_recovers_planted_blobs(spark):
    """Three well-separated blobs, k=3: Lloyd's must recover the exact
    planted partition in 2 rounds, the per-row assignment must be a
    zero-shuffle plan (centroids are inlined literals), and k > n must
    raise loudly."""
    import numpy as np
    import pytest as _pt
    import pyspark.sql.functions as F

    from pg_logical_replication_spark.operators.similarity import (
        kmeans_assign,
    )

    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    for c in range(3):
        center = np.zeros(64)
        center[c * 20] = 50.0  # far-apart axis blobs
        for _ in range(40):
            v = center + 0.1 * rng.standard_normal(64)
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, true_blob int, embedding array<float>"
    )
    out = kmeans_assign(df, k=3, iters=2)
    joined = out.join(df.select("vec_id", "true_blob"), "vec_id")
    # each k-means cluster maps 1:1 onto one planted blob
    purity = joined.groupBy("cluster").agg(
        F.countDistinct("true_blob").alias("nb"), F.count("*").alias("n")
    )
    got = purity.collect()
    assert len(got) == 3
    assert all(r["nb"] == 1 and r["n"] == 40 for r in got), got

    # the returned assignment plan moves no rows: scan + project only
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

    with _pt.raises(ValueError, match="k=200 > corpus size"):
        kmeans_assign(df, k=200, iters=1)


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """A seed that captures no members on re-assignment must keep its
    previous centroid (no division by zero, stable cluster count)."""
    from pg_logical_replication_spark.operators.similarity import (
        kmeans_assign,
    )

    # two tight blobs, k=3: one seed inevitably goes memberless after
    # the first update when both blob centroids absorb everything
    rows = [(i, [10.0] * 64) for i in range(20)]
    rows += [(100 + i, [-10.0] * 64) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = kmeans_assign(df, k=3, iters=3)
    import pyspark.sql.functions as F

    sizes = {r["cluster"]: r["n"] for r in
             out.groupBy("cluster").agg(F.count("*").alias("n")).collect()}
    assert sum(sizes.values()) == 40
    # identical vectors per blob: each blob lands in exactly one cluster
    assert len(sizes) <= 3


def test_precomputed_signature_column_matches_inline(spark, tmp_path):
    """The write-time path: materializing ann_signature_col at INGEST
    (parquet round trip, like a production write pipeline) and passing
    sig_col= must produce the identical pair set (same valve, same
    kernel) with zero hyperplane dot products left in the read plan."""
    from pg_logical_replication_spark.operators.similarity import (
        ann_signature_col,
        cosine_near_dup_pairs_bucketed,
    )

    emb = _near_dup_fixture(spark)
    inline = sorted(
        tuple(r)
        for r in cosine_near_dup_pairs_bucketed(emb, threshold=0.95).collect()
    )
    path = str(tmp_path / "signed")
    emb.withColumn("sig", ann_signature_col()).write.parquet(path)
    signed = spark.read.parquet(path)
    pre = sorted(
        tuple(r)
        for r in cosine_near_dup_pairs_bucketed(
            signed, threshold=0.95, sig_col="sig"
        ).collect()
    )
    assert pre == inline and len(pre) == 20
    # with signatures on disk, the read plan contains no hyperplane
    # dot products (zip_with exists only at signature WRITE time)
    plan = (
        cosine_near_dup_pairs_bucketed(signed, threshold=0.95, sig_col="sig")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "zip_with" not in plan, plan


def test_auto_planes_scales_with_corpus(spark):
    """planes='auto' sizes the bucket count from the corpus row count
    (~log2(n/512)), and exact duplicates survive any planes setting
    (identical vectors always share every signature)."""
    import pyspark.sql.functions as F

    from pg_logical_replication_spark.operators.similarity import (
        cosine_near_dup_pairs_bucketed,
    )

    vec = [float((d * 5) % 11 - 5) for d in range(64)]
    emb = spark.range(6000).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") % 3000 < 1, F.array(*[F.lit(x) for x in vec]))
        .otherwise(
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: (F.col("id") * 37 + i * 11) % 97 - 48.0,
            )
        )
        .cast("array<double>")
        .alias("embedding"),
    )
    # n=6000 → planes = max(4, ceil(log2(6000/512))) = 4; bump the
    # target down to force more planes and check the knob moves
    pairs_auto = cosine_near_dup_pairs_bucketed(
        emb, threshold=0.999, planes="auto", auto_target_bucket=64
    )
    # ids 0 and 3000 carry the identical planted vector: exact dups
    # must survive however many planes "auto" picks
    got = {(r.a_id, r.b_id) for r in pairs_auto.collect()}
    assert (0, 3000) in got


def test_hyperplane_signs_rejects_wrong_length_vectors(spark):
    """Round-6 review #1: a vector LONGER than dims null-padded the
    weights side of the zip_with and collapsed every signature to one
    all-'0' bucket (silent brute force). Both directions must raise."""
    import pytest
    from pyspark.sql import functions as F

    from pg_logical_replication_spark.operators.similarity import (
        hyperplane_signs,
    )

    long_vec = spark.createDataFrame(
        [(1, [0.1] * 128)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="length must equal dims"):
        long_vec.select(
            hyperplane_signs("embedding", 64, 4).alias("s")
        ).collect()
    short_vec = spark.createDataFrame(
        [(1, [0.1] * 32)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="length must equal dims"):
        short_vec.select(
            hyperplane_signs("embedding", 64, 4).alias("s")
        ).collect()
    ok = spark.createDataFrame(
        [(1, [0.1] * 64)], "vec_id long, embedding array<float>"
    )
    sig = ok.select(hyperplane_signs("embedding", 64, 4).alias("s")).collect()
    assert len(sig[0]["s"]) == 4


def test_bq_code_words_small_dims_no_double_count(spark):
    """Round-6 review #2: for dims <= 32 the second word re-tested the
    last dimension via a DESCENDING sequence and shiftleft(1L,-1) ->
    bit 63. The second word must be 0 and the first exact."""
    from pg_logical_replication_spark.operators.similarity import (
        bq_code_words,
    )

    df = spark.createDataFrame(
        [(1, [1.0] * 32), (2, [-1.0] * 31 + [1.0])],
        "vec_id long, embedding array<float>",
    )
    w0, w1 = bq_code_words("embedding", dims=32)
    rows = {r["vec_id"]: (r["w0"], r["w1"])
            for r in df.select("vec_id", w0.alias("w0"), w1.alias("w1")).collect()}
    assert rows[1] == ((1 << 32) - 1, 0)      # all 32 bits in word0 only
    assert rows[2] == (1 << 31, 0)            # last dim ONCE, bit 31


def test_hyperplane_band_pairs_rejects_short_vectors(spark):
    """Round-6 review #3: short vectors nulled every band signature and
    silently vanished from the candidate join; they must raise."""
    import pytest

    from pg_logical_replication_spark.operators.similarity import (
        hyperplane_band_pairs,
    )

    df = spark.createDataFrame(
        [(1, [0.5] * 32), (2, [0.5] * 32)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="length must equal dim"):
        hyperplane_band_pairs(df, dim=64).collect()


def test_hyperplane_band_pairs_rejects_empty_and_null_vectors(spark):
    """ADVICE r6: transform() never evaluates its lambda for an empty
    array and yields null for a NULL array, so a guard hidden inside
    the element lambda missed exactly those rows — they silently
    vanished from the candidate set. Both must raise now."""
    import pytest

    from pg_logical_replication_spark.operators.similarity import (
        hyperplane_band_pairs,
    )

    empty = spark.createDataFrame(
        [(1, [0.5] * 32), (2, [])],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="length must equal dim"):
        hyperplane_band_pairs(empty, dim=32).collect()

    null = spark.createDataFrame(
        [(1, [0.5] * 32), (2, None)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="length must equal dim"):
        hyperplane_band_pairs(null, dim=32).collect()
