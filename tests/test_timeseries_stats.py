"""Invariants of the round-2 late operator batch (plans/timeseries_stats,
analytics_extra additions), beyond the value-level oracle gate:
structural properties that must hold for ANY input, checked on the
sf0.001 results and (for pure formulas) by direct enumeration."""

import math

from hypothesis import given, strategies as st

from pg_logical_replication_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def _n_chunks(n: int, win: int = 32, stride: int = 16) -> int:
    return 1 if n <= win else math.ceil((n - win) / stride) + 1


@given(st.integers(min_value=1, max_value=5000))
def test_chunk_grid_covers_every_token_once_per_window(n):
    """The chunk grid must (a) cover every token index, (b) start its
    last chunk before the end, (c) overlap consecutive chunks by
    win - stride."""
    win, stride = 32, 16
    k = _n_chunks(n)
    starts = [i * stride for i in range(k)]
    assert starts[-1] < n                       # last chunk is non-empty
    covered = set()
    for s in starts:
        covered.update(range(s, min(s + win, n)))
    assert covered == set(range(n))             # full coverage
    if k > 1:
        # every consecutive pair overlaps by exactly win - stride tokens
        assert starts[1] - starts[0] == stride
        # and a further chunk would be redundant: the previous one
        # already reaches the end
        assert starts[-1] + win >= n


def test_doc_chunks_reassemble_documents(spark):
    """Concatenating each doc's chunk lengths minus overlaps must give
    back the doc's token count — the structural round-trip."""
    rows = QUERIES["q_doc_chunks"].builder(spark, SF).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["chunk_len"]))
    from pyspark.sql import functions as F

    n_tokens = {
        r["doc_id"]: r["n"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    for doc, chunks in by_doc.items():
        chunks.sort()
        idxs = [c[0] for c in chunks]
        assert idxs == list(range(len(chunks)))     # dense chunk ids
        total = sum(c[1] for c in chunks)
        overlap = 16 * (len(chunks) - 1)
        assert total - overlap == n_tokens[doc], doc


def test_bloom_has_no_false_negatives_and_prunes(spark):
    row = QUERIES["q_join_bloom_prune"].builder(spark, SF).collect()[0]
    assert row["n_missed"] == 0                    # Bloom law
    assert row["n_candidates"] >= row["n_true"]
    # the filter must actually prune (candidates < probe keys) whenever
    # the build side is a strict subset of the probe domain
    if row["n_build_keys"] < row["n_probe_keys"]:
        assert row["n_candidates"] < row["n_probe_keys"]


def test_ewma_weight_normalization(spark):
    """With all 16 weights present, sum(w) = 2 - 2^-15 exactly; the
    n_terms column exposes how many the query actually used — verify
    the emitted ewma lies within [min, max] of the window's inputs
    (a convexity property of normalized weights)."""
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'"
    )
    daily = dict(
        con.execute(
            "SELECT CAST(date_trunc('day', ts) AS DATE), "
            "CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) "
            "FROM events WHERE value IS NOT NULL GROUP BY 1"
        ).fetchall()
    )
    rows = QUERIES["q_events_ewma"].builder(spark, SF).collect()
    assert rows
    for r in rows:
        window = [
            v
            for d, v in daily.items()
            if 0 <= (r["day"] - d).days <= 15
        ]
        assert len(window) == r["n_terms"]
        assert min(window) - 1e-9 <= r["ewma"] <= max(window) + 1e-9


def test_mad_outliers_are_extreme_within_type(spark):
    """Every flagged day must be strictly more extreme than every
    unflagged day of the same event type (|n - med| ordering)."""
    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    daily = con.execute(
        "SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, "
        "COUNT(*) AS n FROM events GROUP BY 1, 2"
    ).fetchall()
    rows = QUERIES["q_events_mad_outliers"].builder(spark, SF).collect()
    flagged = {(r["event_type"], r["day"]) for r in rows}
    by_type = {r["event_type"]: (r["med"], r["mad"]) for r in rows}
    for et, (med, mad) in by_type.items():
        out_devs = [
            abs(r["n"] - med) for r in rows if r["event_type"] == et
        ]
        in_devs = [
            abs(n - med)
            for (ty, d, n) in daily
            if ty == et and (ty, d) not in flagged
        ]
        # outliers exceed the 3-MAD bar; inliers (by definition of the
        # filter) do not — so the two dev populations are separated
        assert min(out_devs) > 3 * mad
        if in_devs:
            assert max(in_devs) <= 3 * mad
