"""Edge-case unit tests for the round-8 additions: quality PR sweep,
key-skew census, multi-origin write-write conflict detection (oracle
parity tests cover the bulk path on driver data; these pin semantics
on hand-built inputs and plan shapes)."""

from pyspark.sql import functions as F

from pg_logical_replication_spark.operators.layout import key_skew_census
from pg_logical_replication_spark.operators.text import quality_pr_sweep


def test_pr_sweep_confusion_invariants(spark):
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(10))) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = quality_pr_sweep(
        df,
        weak_label=F.col("doc_id") % 3 == 0,
        thresholds_milli=(-100000, 0, 100000),
    ).collect()
    assert [r.tau_milli for r in out] == [-100000, 0, 100000]
    n_pos = sum(1 for i in range(60) if i % 3 == 0)
    for r in out:
        # row conservation and label conservation at every threshold
        assert r.tp + r.fp + r.fn + r.tn == 60
        assert r.tp + r.fn == n_pos
    # predicted-positive count is monotone non-increasing in tau
    preds = [r.tp + r.fp for r in out]
    assert preds == sorted(preds, reverse=True)


def test_pr_sweep_degenerate_thresholds_zero_metrics(spark):
    """A threshold above every score predicts nothing positive:
    precision/recall/F1 must be 0 (guarded div), never a crash."""
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    row = quality_pr_sweep(
        df, weak_label=F.lit(True), thresholds_milli=(10**9,)
    ).collect()[0]
    assert (row.tp, row.fp) == (0, 0)
    assert row.precision_ppm == 0 and row.recall_ppm == 0 and row.f1_ppm == 0


def test_pr_sweep_perfect_classifier_ppm(spark):
    """When prediction == label exactly, precision = recall = f1 = 1e6."""
    # score sign is deterministic per text; use labels FROM the scorer
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(8))) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from pg_logical_replication_spark.operators.text import (
        linear_quality_score,
    )

    scored = linear_quality_score(df)
    keep_ids = {
        r.doc_id for r in scored.filter("keep").select("doc_id").collect()
    }
    assert 0 < len(keep_ids) < 40  # both classes present
    row = quality_pr_sweep(
        df, weak_label=F.col("doc_id").isin(keep_ids), thresholds_milli=(0,)
    ).collect()[0]
    assert row.fp == 0 and row.fn == 0
    assert row.precision_ppm == row.recall_ppm == row.f1_ppm == 1000000


def test_key_skew_census_planted_hot_key(spark):
    # 90 rows on key 'hot', 10 singleton keys
    rows = [("hot",)] * 90 + [(f"k{i}",) for i in range(10)]
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_census(df, ["k"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r.key_col == "k"
    assert r.n_rows == 100 and r.n_keys == 11
    assert r.max_group == 90
    assert r.top1_share_ppm == 900000
    # mean = 100/11 -> 9090 milli; max/mean = 90*11*1000//100 = 9900 milli
    assert r.mean_group_milli == 9090
    assert r.max_over_mean_milli == 9900
    # rank convention: sizes asc = [1x10, 90]; ceil(.5*11)=6 -> 1,
    # ceil(.9*11)=10 -> 1, ceil(.99*11)=11 -> 90
    assert (r.p50_group, r.p90_group, r.p99_group) == (1, 1, 90)


def test_key_skew_census_uniform_keys(spark):
    rows = [(f"k{i % 4}",) for i in range(40)]
    df = spark.createDataFrame(rows, "k string")
    r = key_skew_census(df, ["k"]).collect()[0]
    assert r.max_group == 10 and r.n_keys == 4
    assert r.max_over_mean_milli == 1000  # max == mean
    assert (r.p50_group, r.p90_group, r.p99_group) == (10, 10, 10)


def test_key_skew_census_no_single_partition_sort(spark):
    rows = [(f"k{i % 7}",) for i in range(70)]
    df = spark.createDataFrame(rows, "k string")
    plan = key_skew_census(df, ["k"])._jdf.queryExecution().executedPlan().toString()
    # percentile ranks come from global_row_number (range exchange
    # inside its localCheckpoint, invisible here) — what must NOT
    # appear is the anti-pattern this exists to avoid: a window
    # function or a global sort over the size table
    low = plan.lower()
    assert "window" not in low
    assert "sort [" not in low  # no Sort operator anywhere
    # the only SinglePartition exchanges are the two scalar aggregates
    assert low.count("exchange singlepartition") <= 2


def test_update_conflicts_hand_built(spark):
    # window 0: key 1 written by origins 0 and 1 (conflict, last write
    # event 31 -> origin 1); key 2 only origin 0 (no conflict).
    # window 1: key 1 single write (no conflict).
    rows = [
        (30, 1),  # origin 0
        (31, 1),  # origin 1 — winner (latest)
        (33, 2),  # origin 0
        (36, 2),  # origin 0 again — same origin, not a conflict
        (130, 1),  # window 1, lone write
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long")
    out = (
        ev.select(
            F.expr("event_id div 100").alias("win"),
            (F.col("event_id") % 3).alias("origin"),
            "user_id",
            "event_id",
        )
        .groupBy("win", "user_id")
        .agg(
            F.countDistinct("origin").alias("n_origins"),
            F.count("*").cast("long").alias("n_writes"),
            F.max_by("origin", "event_id").cast("long").alias("winner_origin"),
        )
        .filter(F.col("n_origins") >= 2)
        .collect()
    )
    assert len(out) == 1
    c = out[0]
    assert (c.win, c.user_id, c.n_writes, c.winner_origin) == (0, 1, 2, 1)


def test_global_running_max_agrees_with_window(spark):
    from pyspark.sql import Window as W

    from pg_logical_replication_spark.operators.layout import (
        global_running_max,
    )

    rows = [(i, v) for i, v in enumerate([5, 3, None, 9, 1, None, 9, 12, 2])]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r.k: r.cum_max
        for r in global_running_max(df, ["k"], "v", num_partitions=4).collect()
    }
    w = W.orderBy("k").rowsBetween(W.unboundedPreceding, W.currentRow)
    want = {
        r.k: r.m
        for r in df.withColumn("m", F.max("v").over(w)).collect()
    }
    assert got == want


def test_global_running_max_all_null_prefix(spark):
    from pg_logical_replication_spark.operators.layout import (
        global_running_max,
    )

    df = spark.createDataFrame(
        [(0, None), (1, None), (2, 7), (3, None)], "k long, v long"
    )
    got = {
        r.k: r.cum_max
        for r in global_running_max(df, ["k"], "v", num_partitions=3).collect()
    }
    assert got == {0: None, 1: None, 2: 7, 3: 7}


def test_global_running_max_empty_input(spark):
    from pg_logical_replication_spark.operators.layout import (
        global_running_max,
    )

    df = spark.createDataFrame([], "k long, v long")
    out = global_running_max(df, ["k"], "v")
    assert out.count() == 0
    assert "cum_max" in out.columns


def test_mojibake_census_hand_built(spark):
    from pg_logical_replication_spark.operators.text import mojibake_census

    rows = [
        (1, "clean ascii text"),
        (2, "cafÃ© menu"),          # 'cafÃ©' — latin1 lead-in
        (3, "itâ€™s here"),     # 'itâ€™s' — smart punct
        (4, "lossy � char"),              # U+FFFD
        (5, "bell\x07 and esc\x1b"),           # control chars only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in mojibake_census(df).collect()}
    assert not got[1].mojibake_suspect
    assert got[2].n_latin1 == 1 and got[2].mojibake_suspect
    assert got[3].n_smartpunct == 1 and got[3].mojibake_suspect
    assert got[4].n_replacement == 1 and got[4].mojibake_suspect
    # control chars alone flag n_ctrl but are NOT mojibake (legit in
    # some formats; they gate a different cleanup)
    assert got[5].n_ctrl == 2 and not got[5].mojibake_suspect


def test_mmr_pure_relevance_equals_cosine_order(spark):
    """lambda = 1.0 degenerates MMR to plain relevance ranking."""
    import math

    from pg_logical_replication_spark.operators.similarity import mmr_select

    def vec(theta):
        return [math.cos(theta), math.sin(theta)]

    rows = [(i, vec(0.1 * i)) for i in range(1, 9)]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    query = spark.createDataFrame(
        [(0, vec(0.0))], "vec_id long, embedding array<float>"
    )
    out = mmr_select(corpus, query, k=3, lam_milli=1000).collect()
    # closest angles first: 1, 2, 3
    assert [r.vec_id for r in out] == [1, 2, 3]


def test_mmr_skips_duplicate_of_first_pick(spark):
    """A near-duplicate of pick 1 ranks second by relevance but MUST be
    deferred by the redundancy penalty."""
    import math

    from pg_logical_replication_spark.operators.similarity import mmr_select

    def vec(theta):
        return [math.cos(theta), math.sin(theta)]

    corpus = spark.createDataFrame(
        [
            (1, vec(0.05)),   # most relevant
            (2, vec(0.06)),   # near-duplicate of 1, second most relevant
            (3, vec(0.80)),   # less relevant but diverse
        ],
        "vec_id long, embedding array<float>",
    )
    query = spark.createDataFrame(
        [(0, vec(0.0))], "vec_id long, embedding array<float>"
    )
    # lambda=0.3: 2's near-1.0 redundancy penalty outweighs 3's
    # relevance deficit (at lambda=0.5 the duplicate still wins here —
    # its rel gap to pick 1 is only 0.0005)
    out = mmr_select(corpus, query, k=2, lam_milli=300).collect()
    assert [r.vec_id for r in out] == [1, 3]
    # and the deferred duplicate's redundancy is visible in max_sim
    out3 = mmr_select(corpus, query, k=3, lam_milli=300).collect()
    assert out3[2].vec_id == 2 and out3[2].max_sim > 0.99


def test_mmr_shortlist_guard(spark):
    """VERDICT r8 #6: mmr_select localCheckpoints its whole candidate
    projection — correct for re-ranking a retrieved shortlist, O(corpus)
    materialization if misused. The bounded limit(max+1).count() probe
    (the cosine_near_dup_pairs pattern) must refuse oversized inputs
    with a pointer at ANN-shortlist-then-MMR."""
    import math

    import pytest as _pytest

    from pg_logical_replication_spark.operators.similarity import mmr_select

    def vec(theta):
        return [math.cos(theta), math.sin(theta)]

    corpus = spark.createDataFrame(
        [(i, vec(0.1 * i)) for i in range(1, 9)],
        "vec_id long, embedding array<float>",
    )
    query = spark.createDataFrame(
        [(0, vec(0.0))], "vec_id long, embedding array<float>"
    )
    with _pytest.raises(ValueError, match="shortlist"):
        mmr_select(corpus, query, k=2, max_candidates=5)
    # at exactly the cap it runs
    assert len(mmr_select(corpus, query, k=2, max_candidates=8).collect()) == 2


def test_mmr_local_fastpath_agrees_with_distributed(spark):
    """The bounded driver-side greedy (optimization r10) must return
    row-identical (rnk, vec_id, rel, max_sim) to the distributed
    per-step path — including the exact rounded doubles — on the real
    fixture embeddings AND on adversarial random float32 vectors."""
    import os
    import random

    from pg_logical_replication_spark.operators.similarity import mmr_select

    def both(corpus, query, **kw):
        local = mmr_select(corpus, query, **kw).collect()
        os.environ["PLRS_MMR_LOCAL_MAX_CANDIDATES"] = "0"
        try:
            dist = mmr_select(corpus, query, **kw).collect()
        finally:
            del os.environ["PLRS_MMR_LOCAL_MAX_CANDIDATES"]
        return [tuple(r) for r in local], [tuple(r) for r in dist]

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    from pyspark.sql import functions as F

    local, dist = both(
        emb.filter(F.col("vec_id") != 0),
        emb.filter(F.col("vec_id") == 0),
        k=5,
        lam_milli=700,
    )
    assert local == dist and len(local) == 5

    rng = random.Random(1234)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(1, 40)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    query = spark.createDataFrame(
        [(0, [rng.uniform(-1, 1) for _ in range(16)])],
        "vec_id long, embedding array<float>",
    )
    local, dist = both(corpus, query, k=6, lam_milli=450)
    assert local == dist and len(local) == 6


def test_mmr_k_exceeds_corpus(spark):
    from pg_logical_replication_spark.operators.similarity import mmr_select

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    query = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    out = mmr_select(corpus, query, k=10).collect()
    assert [r.rnk for r in out] == [1, 2]  # stops when exhausted


def test_ivf_recall_grid_agrees_with_per_point_ivf(spark):
    """ivf_recall_grid's shared-pass top-k (optimization r10) must be
    row-identical — (q_id, n_id, cosine, rnk) — to an independent
    ivf_cosine_topk call at every grid point."""
    from pg_logical_replication_spark.operators.similarity import (
        ivf_cosine_topk,
        ivf_recall_grid,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter("vec_id < 10")
    grid = ivf_recall_grid(
        emb, queries, k=5, n_probes=(1, 2, 4, 8, 16)
    ).collect()
    by_p = {}
    for r in grid:
        by_p.setdefault(r["n_probe"], set()).add(
            (r["q_id"], r["n_id"], r["cosine"], r["rnk"])
        )
    for p in (1, 2, 4, 8, 16):
        single = {
            (r["q_id"], r["n_id"], r["cosine"], r["rnk"])
            for r in ivf_cosine_topk(emb, queries, k=5, n_probe=p).collect()
        }
        assert by_p.get(p, set()) == single, f"n_probe={p} diverges"


def test_recall_grid_full_probe_point_is_brute(spark):
    """r11: with max(n_probes) == n_centroids the most permissive grid
    point probes every cell, so its (q_id, n_id) set must equal the
    exact cosine_topk brute ranking — the equivalence q_ann_recall_curve
    now derives its brute set from instead of a second corpus pass.
    Includes a null-vector corpus row and an exact cosine tie (both
    order on (cosine DESC, n_id) with nulls last)."""
    from pg_logical_replication_spark.operators.similarity import (
        cosine_topk,
        ivf_recall_grid,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.filter("vec_id < 10")
    grid = ivf_recall_grid(emb, queries, k=5, n_probes=(1, 2, 4, 8, 16))
    full_point = {
        (r["q_id"], r["n_id"])
        for r in grid.collect()
        if r["n_probe"] == 16
    }
    brute = {
        (r["q_id"], r["n_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    assert full_point == brute

    # synthetic edge: an exact duplicate vector (cosine tie broken on
    # n_id) and a null-vector corpus row (NULL cosine, ranked last)
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0]),
        (4, None),
        (5, [0.6, 0.8, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id = 0")
    g = {
        (r["q_id"], r["n_id"])
        for r in ivf_recall_grid(
            df, q, k=3, n_centroids=2, n_probes=(1, 2)
        ).collect()
        if r["n_probe"] == 2
    }
    b = {(r["q_id"], r["n_id"]) for r in cosine_topk(df, q, k=3).collect()}
    assert g == b


def test_ann_recall_curve_invariants(spark):
    """Recall is monotone non-decreasing in n_probe and EXACTLY 1.0 at
    n_probe = n_centroids (probing every cell is brute force)."""
    from pg_logical_replication_spark.plans import QUERIES

    rows = QUERIES["q_ann_recall_curve"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    recalls = [r.recall_ppm for r in rows]
    assert recalls == sorted(recalls)
    assert rows[-1].n_probe == 16 and rows[-1].recall_ppm == 1000000


def test_key_skew_census_empty_input(spark):
    df = spark.createDataFrame([], "k string")
    out = key_skew_census(df, ["k"])
    assert out.count() == 0
    assert "max_over_mean_milli" in out.columns


def test_pr_sweep_empty_corpus_all_zero_rows(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    out = quality_pr_sweep(
        df, weak_label=F.lit(True), thresholds_milli=(-100, 0, 100)
    ).collect()
    assert [r.tau_milli for r in out] == [-100, 0, 100]
    assert all(
        (r.tp, r.fp, r.fn, r.tn, r.f1_ppm) == (0, 0, 0, 0, 0) for r in out
    )


def test_lsh_band_curve_invariants(spark):
    """Stricter bands (larger band_size) can only shrink the candidate
    set (provable superset chain), recall vs the permissive banding is
    <= 1 and pins at exactly 1.0 for band_size=1."""
    from pg_logical_replication_spark.plans import QUERIES

    rows = QUERIES["q_dedup_lsh_band_curve"].builder(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert [r.band_size for r in rows] == [1, 2, 4]
    cands = [r.n_candidates for r in rows]
    assert cands == sorted(cands, reverse=True)
    assert rows[0].recall_vs_b1_ppm == 1000000
    assert all(r.recall_vs_b1_ppm <= 1000000 for r in rows)
    assert all(r.n_good <= r.n_candidates for r in rows)


def test_pr_sweep_rejects_duplicate_thresholds(spark):
    import pytest

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="duplicates"):
        quality_pr_sweep(
            df, weak_label=F.lit(True), thresholds_milli=(0, 100, 0)
        )


def test_remove_duplicated_spans_planted(spark):
    """A planted 25-token span shared by two docs is spliced from BOTH
    (aggressive variant); the unique doc is untouched and keeps case."""
    from pg_logical_replication_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    span = " ".join(f"s{j}" for j in range(25))
    rows = [
        (1, "alpha " + span + " omega"),
        (2, "Beta " + span + " gamma extra words here"),
        (3, "totally unique text " + " ".join(f"u{j}" for j in range(25))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_duplicated_spans(df, gram=20).collect()}
    assert out[1].out_text == "alpha omega" and out[1].spliced
    assert out[2].out_text == "Beta gamma extra words here"
    assert not out[3].spliced
    assert out[3].n_tokens_after == out[3].n_tokens_before


def test_remove_duplicated_spans_degenerate_docs(spark):
    """ADVICE r8: empty/whitespace-only docs — split('') yields [''],
    which must NOT count as a kept token. Oracle semantics: empty
    out_text → n_tokens_after 0, spliced ⇔ na < nb; a doc whose whole
    text is a duplicated span splices down to na=0 the same way."""
    from pg_logical_replication_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    span = " ".join(f"e{j}" for j in range(20))
    rows = [(1, ""), (2, "   "), (3, span), (4, span), (5, "plain text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_duplicated_spans(df, gram=20).collect()}
    for d in (1, 2):
        assert out[d].out_text == ""
        assert out[d].n_tokens_after == 0
        assert out[d].n_tokens_before == 1  # ['' ] — the oracle's nb too
        assert out[d].spliced  # na < nb, the oracle's docs_spliced rule
    for d in (3, 4):  # whole doc = hot span → everything cut
        assert out[d].out_text == "" and out[d].n_tokens_after == 0
        assert out[d].spliced and out[d].n_tokens_before == 20
    assert out[5].n_tokens_after == 2 and not out[5].spliced


def test_remove_duplicated_spans_case_insensitive_match(spark):
    """Windows hash lowercased: a case-variant copy still matches, and
    each doc's OWN casing survives in the kept tokens."""
    from pg_logical_replication_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    span = " ".join(f"w{j}" for j in range(20))
    rows = [(1, "x " + span), (2, "y " + span.upper())]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in remove_duplicated_spans(df, gram=20).collect()}
    assert out[1].out_text == "x" and out[2].out_text == "y"


def test_pr_sweep_matches_pure_python_reference(spark):
    """Third-implementation pin (the r7 char_entropy/fim pattern): the
    whole sweep — hashed-linear scorer, integer cross-multiply
    decision, div-based ppm metrics — recomputed in pure Python
    (hashlib + ints) on a deterministic corpus; a formula bug mirrored
    into both the Spark plan and its SQL oracle cannot hide from this."""
    import hashlib

    def weight(tok):
        h = int(hashlib.md5(tok.lower().encode()).hexdigest()[:15], 16) % 1024
        return (h * 31 + 7) % 1001 - 500

    rows = []
    for i in range(80):
        toks = [f"w{(i * 7 + j * 13) % 40}" for j in range(5 + i % 9)]
        rows.append((i, " ".join(toks)))
    labels = {i for i, _ in rows if i % 4 != 0}
    taus = (-60000, -15000, 0, 15000, 60000)

    expected = {}
    for tau in taus:
        tp = fp = fn = tn = 0
        for i, text in rows:
            toks = text.split()
            score = sum(weight(t) for t in toks)
            pred = score * 1000 >= tau * len(toks)
            pos = i in labels
            if pred and pos:
                tp += 1
            elif pred:
                fp += 1
            elif pos:
                fn += 1
            else:
                tn += 1
        prec = tp * 1000000 // (tp + fp) if tp + fp else 0
        rec = tp * 1000000 // (tp + fn) if tp + fn else 0
        f1 = (
            2 * prec * rec // (prec + rec) if prec + rec else 0
        )
        expected[tau] = (tp, fp, fn, tn, prec, rec, f1)

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = quality_pr_sweep(
        df,
        weak_label=F.col("doc_id").isin(labels),
        thresholds_milli=taus,
    ).collect()
    for r in got:
        assert (
            r.tp, r.fp, r.fn, r.tn,
            r.precision_ppm, r.recall_ppm, r.f1_ppm,
        ) == expected[r.tau_milli], f"tau={r.tau_milli}"


def test_burstiness_matches_pure_python_reference(spark):
    """Closed-form VMR over ALL docs (zeros folded) recomputed naively
    in Python WITH explicit zero counts — pins the algebra
    (N·Σx² − total²)·1000 div (total·(N−1)) against the definition."""
    from pg_logical_replication_spark.plans import QUERIES  # noqa: F401

    rows = [
        (1, "a a a b"),
        (2, "b c"),
        (3, "a d d d d"),
        (4, "e"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # naive reference: explicit per-doc counts including zeros
    import collections

    percnt = collections.defaultdict(dict)
    for did, text in rows:
        for tok in text.split():
            percnt[tok][did] = percnt[tok].get(did, 0) + 1
    n_docs = len(rows)
    expected = {}
    for term, bydoc in percnt.items():
        xs = [bydoc.get(d, 0) for d, _ in rows]  # zeros included
        total = sum(xs)
        mean = total / n_docs
        var = sum((x - mean) ** 2 for x in xs) / (n_docs - 1)
        expected[term] = (
            total,
            len(bydoc),
            int(var / mean * 1000),  # floor, matches integer div
        )

    # same pipeline as q_text_burstiness, applied to this tiny frame
    toks = df.select(
        "doc_id",
        F.transform(
            F.split(F.trim("text"), r"\s+"), lambda x: F.lower(x)
        ).alias("tk"),
    )
    n = toks.agg(F.count("*").cast("long").alias("n_docs"))
    percnt_df = (
        toks.select("doc_id", F.explode("tk").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("long").alias("c"))
    )
    got = {
        r.term: (r.total_count, r.doc_freq, r.vmr_milli)
        for r in percnt_df.groupBy("term")
        .agg(
            F.sum("c").cast("long").alias("total_count"),
            F.sum(F.col("c") * F.col("c")).cast("long").alias("sum_sq"),
            F.count("*").cast("long").alias("doc_freq"),
        )
        .crossJoin(F.broadcast(n))
        .select(
            "term",
            "total_count",
            "doc_freq",
            F.expr(
                "(n_docs * sum_sq - total_count * total_count) * 1000 "
                "div (total_count * (n_docs - 1))"
            ).cast("long").alias("vmr_milli"),
        )
        .collect()
    }
    assert got == expected
    # sanity: 'd' (4 hits in one doc) is bursty, far above VMR 1.0
    assert got["d"][2] > 2000


def test_join_advisor_decision_branches(spark):
    """All three strategy branches of q_diag_join_advisor's rule on
    planted censuses (the fixture tables are all broadcast-sized, so
    the salted/smj branches need synthetic inputs)."""
    rows = [
        # (dim_rows, n_rows, n_keys, max_group) -> expected
        (1000, 10_000_000, 1000, 20_000),      # small dim -> broadcast
        (500_000, 10_000_000, 1000, 100_000),  # skew 10x mean -> salted
        (500_000, 10_000_000, 1000, 11_000),   # mild skew -> smj
    ]
    df = spark.createDataFrame(
        rows, "dim_rows long, n_rows long, n_keys long, max_group long"
    )
    got = [
        r.s
        for r in df.selectExpr(
            "CASE WHEN dim_rows <= 100000 THEN 'broadcast' "
            "WHEN max_group * n_keys * 1000 div n_rows > 4000 "
            "THEN 'salted_smj' ELSE 'smj' END AS s"
        ).collect()
    ]
    assert got == ["broadcast", "salted_smj", "smj"]


def test_mmr_null_query_vector_falls_through_to_distributed(spark):
    """ADVICE r10 low: a NULL query vector is an ungoverned case — the
    local fast path must return None and fall through, so the public
    API's result (k picks with NULL rel, the distributed nulls-last
    semantics) never depends on the candidate-count gate."""
    from pg_logical_replication_spark.operators.similarity import (
        _mmr_select_local,
        mmr_select,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    query = spark.createDataFrame(
        [(0, None)], "vec_id long, embedding array<float>"
    )
    assert _mmr_select_local(
        corpus, query, k=2, lam_milli=700,
        id_col="vec_id", vec_col="embedding",
    ) is None
    # the public API goes distributed and still selects rows (NULL rel)
    out = mmr_select(corpus, query, k=2).collect()
    assert len(out) == 2 and all(r["rel"] is None for r in out)
