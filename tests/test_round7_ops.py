"""Edge-case unit tests for the round-7 additions: quantized char
entropy, leakage-free group split, SoftDeDup reweighting (the oracle
parity tests cover the bulk path on driver data; these pin corners and
plan shapes).
"""

from pyspark.sql import functions as F

from pg_logical_replication_spark.operators.dedup import (
    connected_components,
    minhash_candidate_pairs,
)
from pg_logical_replication_spark.operators.text import char_entropy


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_char_entropy_hand_computed(spark):
    rows = [
        (1, "aaaa"),  # one bucket: 4*floor(log2(4/4)) = 0 bits
        (2, "ab"),    # two buckets: 1*floor(log2(2)) twice = 2 bits / 2 chars
        (3, "aaab"),  # 3*floor(log2(4//3=1))=0 + 1*floor(log2(4))=2 bits
        (4, "A!"),    # lower -> 'a!': a=1 bit, other(!)=1 bit over n=2
        (5, ""),      # empty: filtered out entirely
    ]
    out = {r["doc_id"]: r for r in char_entropy(_docs(spark, rows)).collect()}
    assert 5 not in out
    assert (out[1]["surprisal_bits"], out[1]["bpc_ppm"]) == (0, 0)
    assert (out[2]["surprisal_bits"], out[2]["bpc_ppm"]) == (2, 1000000)
    assert (out[3]["surprisal_bits"], out[3]["bpc_ppm"]) == (2, 500000)
    assert (out[4]["surprisal_bits"], out[4]["bpc_ppm"]) == (2, 1000000)


def test_char_entropy_low_beats_high(spark):
    rows = [
        (1, "spam spam spam spam spam spam spam spam"),
        (2, "the quick brown fox jumps over the lazy dog vexing wizards"),
    ]
    out = {r["doc_id"]: r for r in char_entropy(_docs(spark, rows)).collect()}
    assert out[1]["bpc_ppm"] < out[2]["bpc_ppm"]


def test_char_entropy_plan_has_no_exchange(spark):
    """The per-doc gate must stay a pure scan projection: no shuffle,
    no explode-generated row blowup in the executed plan."""
    df = _docs(spark, [(1, "some text here")])
    plan = char_entropy(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode


def test_leakage_split_is_cluster_atomic(spark):
    """Every member of a near-dup cluster must land in the same split —
    the property the operator exists for, checked structurally on a
    corpus with planted near-duplicate groups."""
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest before nightfall comes down"
    )
    rows = []
    for g in range(8):
        text = base.replace("fox", f"fox{g}")
        for m in range(3):  # 3 near-identical members per group
            rows.append((g * 10 + m, (text + " extra") if m else text))
    docs = _docs(spark, rows)
    labels = connected_components(minhash_candidate_pairs(docs))
    assigned = (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .withColumn("label", F.coalesce("label", "doc_id"))
    )
    h2 = F.substring(F.md5(F.col("label").cast("string")), 1, 2)
    split = F.when(h2 < "0d", "val").when(h2 < "1a", "test").otherwise("train")
    per_cluster = (
        assigned.withColumn("split", split)
        .groupBy("label")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert per_cluster and all(r["n_splits"] == 1 for r in per_cluster)


def test_soft_weights_exact_small_clusters(spark):
    """Singletons weigh 1e6; a k-cluster weighs 1e6 div k per member
    (ppm integers — the float-free SoftDeDup accounting)."""
    text = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    rows = [(1, text), (2, text), (3, text), (4, "totally different words "
            "describing an unrelated subject matter entirely elsewhere")]
    docs = _docs(spark, rows)
    labels = connected_components(minhash_candidate_pairs(docs))
    sizes = labels.groupBy("label").agg(F.count("*").alias("sz"))
    weighted = (
        docs.select("doc_id")
        .join(labels, "doc_id", "left")
        .join(sizes, "label", "left")
        .selectExpr("doc_id", "1000000 div coalesce(sz, 1) AS w_ppm")
        .collect()
    )
    w = {r["doc_id"]: r["w_ppm"] for r in weighted}
    assert w[4] == 1000000
    assert w[1] == w[2] == w[3] == 333333
