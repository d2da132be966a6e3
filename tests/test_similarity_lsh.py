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
