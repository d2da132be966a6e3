"""connected_components: transitive closure via fixed-round min-label
propagation, cross-checked against a plain union-find."""

from pyspark.sql import functions as F  # noqa: F401

from pg_logical_replication_spark.operators.dedup import connected_components


def _uf_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _spark_components(spark, pairs):
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    return {r["doc_id"]: r["label"] for r in connected_components(df).collect()}


def test_chain_collapses_to_one_cluster(spark):
    # path 1-2-3-4-5-6: needs multiple propagation rounds end to end
    pairs = [(i, i + 1) for i in range(1, 6)]
    got = _spark_components(spark, pairs)
    assert got == {i: 1 for i in range(1, 7)}


def test_mixed_graph_matches_union_find(spark):
    pairs = [
        (10, 11), (11, 12),          # triangle-ish chain
        (20, 21),                    # pair
        (30, 31), (31, 32), (30, 32),  # clique
        (40, 41), (42, 41),          # star centered off-min
    ]
    assert _spark_components(spark, pairs) == _uf_components(pairs)


def test_disjoint_pairs_stay_separate(spark):
    pairs = [(1, 2), (3, 4), (5, 6)]
    got = _spark_components(spark, pairs)
    assert got == {1: 1, 2: 1, 3: 3, 4: 3, 5: 5, 6: 5}


# ----------------------------------------------- until_converged (r4)
def test_converged_mode_agrees_on_clique(spark):
    """On a dense clique both modes give identical labels."""
    pairs = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    fixed = {r["doc_id"]: r["label"]
             for r in connected_components(df).collect()}
    conv = {r["doc_id"]: r["label"]
            for r in connected_components(df, until_converged=True).collect()}
    assert fixed == conv == {i: 0 for i in range(6)}


def test_converged_mode_closes_deep_chains_fixed_mode_splits(spark):
    """A 12-hop path graph: 6 fixed rounds cannot reach the far end
    (documented split), until_converged labels the whole chain 0."""
    chain = [(i, i + 1) for i in range(12)]
    df = spark.createDataFrame(chain, "a_id long, b_id long")
    fixed = {r["doc_id"]: r["label"]
             for r in connected_components(df, iterations=3).collect()}
    assert len(set(fixed.values())) > 1  # split: the documented behavior
    conv = {r["doc_id"]: r["label"]
            for r in connected_components(df, until_converged=True).collect()}
    assert set(conv.values()) == {0}
    assert len(conv) == 13


def test_converged_mode_loud_cap(spark):
    import pytest as _pytest

    chain = [(i, i + 1) for i in range(8)]
    df = spark.createDataFrame(chain, "a_id long, b_id long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, until_converged=True, max_iterations=1)


# ------------------------------------ large-star/small-star CC (r4)
def test_star_cc_agrees_with_label_propagation(spark):
    """Random graph: star-contraction labels must equal the converged
    label-propagation labels exactly."""
    import random

    from pg_logical_replication_spark.operators.dedup import (
        connected_components_star,
    )

    rng = random.Random(11)
    pairs = list({(rng.randrange(40), rng.randrange(40)) for _ in range(45)})
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    star = {r["doc_id"]: r["label"]
            for r in connected_components_star(df).collect()}
    conv = {r["doc_id"]: r["label"]
            for r in connected_components(df, until_converged=True).collect()}
    assert star == conv


def test_star_cc_local_fastpath_agrees_with_distributed(spark):
    """The bounded driver-side union-find fast path (optimization r10)
    must produce byte-identical (doc_id, label) sets to the distributed
    contraction — same component minima, across random graphs with
    chains, singleton-free edges, and multiple components."""
    import random

    from pg_logical_replication_spark.operators.dedup import (
        connected_components_star,
    )

    rng = random.Random(7)
    pairs = list({(rng.randrange(60), rng.randrange(60)) for _ in range(70)})
    pairs = [(a, b) for a, b in pairs if a != b]
    pairs += [(100 + i, 101 + i) for i in range(10)]  # a chain component
    df = spark.createDataFrame(pairs, "a_id long, b_id long")
    stats_local, stats_dist = {}, {}
    local = {(r["doc_id"], r["label"]) for r in connected_components_star(
        df, stats=stats_local).collect()}
    dist = {(r["doc_id"], r["label"]) for r in connected_components_star(
        df, stats=stats_dist, local_max_edges=0).collect()}
    assert stats_local["local"] is True
    assert stats_dist["local"] is False and stats_dist["rounds"] >= 1
    assert local == dist


def test_star_cc_long_chain(spark):
    from pg_logical_replication_spark.operators.dedup import (
        connected_components_star,
    )

    chain = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(chain, "a_id long, b_id long")
    # log2(65) ≈ 6.02 — a cap of 12 is generous for the log bound and
    # impossibly small for per-hop propagation (which needs 64);
    # local_max_edges=0 pins the DISTRIBUTED contraction (the round
    # bound is what this test is about, not the fast path)
    out = {r["doc_id"]: r["label"]
           for r in connected_components_star(
               df, max_rounds=12, local_max_edges=0).collect()}
    assert set(out.values()) == {0} and len(out) == 65


def test_duplicated_span_coverage_planted_overlap(spark):
    """Two docs share exactly one 25-token span: its 6 stride-1
    20-grams repeat, and the interval union must collapse them to
    exactly 25 covered tokens per doc — not 6x20. A third unique doc
    must not appear."""
    from pg_logical_replication_spark.operators.dedup import (
        duplicated_span_coverage,
    )

    span = " ".join(f"shared{i}" for i in range(25))
    docs = spark.createDataFrame(
        [
            (1, "a1 b1 c1 d1 e1 " + span + " x1 y1 z1"),
            (2, "p2 q2 r2 " + span + " k2"),
            (3, " ".join(f"unique{i}" for i in range(40))),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in duplicated_span_coverage(docs).collect()}
    assert sorted(got) == [1, 2]
    for did in (1, 2):
        assert got[did]["n_dup_windows"] == 6
        assert got[did]["n_dup_tokens"] == 25, got[did]
    assert got[1]["n_tokens"] == 33 and got[2]["n_tokens"] == 29


def test_simhash_pairs_rejects_unreachable_hamming(spark):
    """Round-6 review #4: max_hamming >= bands breaks the pigeonhole
    recall guarantee (input-dependent subset output) — must assert."""
    import pytest

    from pg_logical_replication_spark.operators.dedup import simhash_pairs

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(AssertionError, match="pigeonhole"):
        simhash_pairs(df, bits=16, bands=4, max_hamming=5)


def test_minhash_bands_rejects_non_divisible_band_size(spark):
    """Round-6 review #7: num_hashes not divisible by band_size
    silently dropped trailing minhashes — must raise."""
    import pytest

    from pg_logical_replication_spark.operators.dedup import (
        minhash_bands,
        minhash_signature,
    )

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    sig = minhash_signature(df, num_hashes=9)
    with pytest.raises(ValueError, match="do not fold"):
        minhash_bands(sig, band_size=2)


def test_star_cc_local_fastpath_preserves_input_id_type(spark):
    """ADVICE r10 medium: the driver union-find fast path must return
    the INPUT id type (the distributed contraction preserves it), and
    must fall through to the contraction for id types outside its
    Python-ordering guarantee — never crash or silently widen."""
    from pyspark.sql import types as T

    from pg_logical_replication_spark.operators.dedup import (
        connected_components_star,
    )

    pairs = [(1, 2), (2, 3), (10, 11)]
    # integer ids: fast path fires AND keeps IntegerType
    df_int = spark.createDataFrame(pairs, "a_id int, b_id int")
    stats: dict = {}
    out = connected_components_star(df_int, stats=stats)
    assert stats["local"] is True
    assert isinstance(out.schema["doc_id"].dataType, T.IntegerType)
    assert isinstance(out.schema["label"].dataType, T.IntegerType)
    got = {(r["doc_id"], r["label"]) for r in out.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}

    # string ids: fast path fires (UTF-8 order == Python str order)
    df_str = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "a_id string, b_id string"
    )
    stats = {}
    out = connected_components_star(df_str, stats=stats)
    assert stats["local"] is True
    assert isinstance(out.schema["doc_id"].dataType, T.StringType)
    got = {(r["doc_id"], r["label"]) for r in out.collect()}
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"),
                   ("y", "x")}

    # an id type outside the guard (double) falls through to the
    # distributed contraction instead of crashing the fast path
    df_dbl = spark.createDataFrame(
        [(1.0, 2.0), (2.0, 3.0)], "a_id double, b_id double"
    )
    stats = {}
    out = connected_components_star(df_dbl, stats=stats)
    assert stats["local"] is False
    assert isinstance(out.schema["doc_id"].dataType, T.DoubleType)
    got = {(r["doc_id"], r["label"]) for r in out.collect()}
    assert got == {(1.0, 1.0), (2.0, 1.0), (3.0, 1.0)}
