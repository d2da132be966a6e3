"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` expose the engine's query inventory
(SURVEY.md §2) from ``pg_logical_replication_spark.plans``; the driver
runs each Spark query against its DuckDB oracle at sf0.01 (row count +
schema + order-insensitive value hash). ``entry`` runs the flagship
TPC-H-style pricing summary at sf0.001.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Python workers deserialize mapInPandas closures that reference the
# package — make it importable even when the driver runs from another
# cwd (workers inherit PYTHONPATH when it is set before the JVM forks).
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
if _REPO not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else _REPO
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pg_logical_replication_spark.plans import QUERIES

    return QUERIES["q1_pricing_summary"].builder(spark, "/root/testdata/sf0.001")


def _category(name: str) -> str:
    """Coarse family tag used to interleave the inventory ordering."""
    for prefix in ("q_cdc", "q_dedup", "q_ann", "q_embed", "q_text", "q_mm"):
        if name.startswith(prefix):
            return "q_ann" if prefix == "q_embed" else prefix
    if name.startswith(("q_pipeline", "q_corpus")):
        return "q_text"
    return "relational"


def _round_number() -> int:
    """Current build round, observed from the driver's own artifacts:
    CORRECTNESS_r{N}.json files accumulate one per completed round."""
    import glob
    import re

    best = 0
    for p in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            best = max(best, int(m.group(1)))
    return best + 1


def _row_failed(row: object) -> bool:
    """True if a driver correctness row records a failure: a non-null
    ``err`` or any present ``*_match`` flag that is False. Two shapes
    that are NOT failures: absent flags (null), and ``err:
    'no_oracle'`` — the driver's marker for a rows-only check on a
    query that deliberately registers no oracle SQL."""
    if not isinstance(row, dict):
        return False
    if row.get("err") and row.get("err") != "no_oracle":
        return True
    return any(
        row.get(k) is False
        for k in ("rows_match", "schema_match", "hash_match")
    )


def _checked_history() -> dict[str, tuple[int, bool]]:
    """query name → (latest round whose driver correctness artifact
    contains it, whether that latest check FAILED). Absent = never
    driver-checked."""
    import glob
    import json
    import re

    latest: dict[str, tuple[int, bool]] = {}
    for p in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if isinstance(data, dict):
            for name, row in data.items():
                if name not in latest or rnd > latest[name][0]:
                    latest[name] = (rnd, _row_failed(row))
    return latest


def _interleaved() -> list[str]:
    """Registry order, round-robined across operator families, with the
    WITHIN-family order rotated by the round number.

    Round-robin rationale: if the correctness driver samples a prefix of
    ``queries()`` (round 1 checked the first 50 of 101, all relational —
    every CDC / dedup / ANN / text / multimodal oracle went unchecked),
    interleaving makes ANY prefix a representative cross-section of
    SURVEY §2.

    Rotation rationale (review r3 #5): the driver verified the SAME
    ~50-query prefix three rounds in a row; rotating each family bucket
    left by ~(prefix share) × (round-1) keeps the prefix representative
    while successive rounds cumulatively cover the whole inventory.

    Never-checked-first rationale (review r4 #6, tightened per VERDICT
    r5 #7): rotation alone still re-sampled already-green queries per
    round, and per-FAMILY never-first still diluted the prefix when
    families exhausted unevenly (a simulated r6 prefix was only 32/50
    new). The committed CORRECTNESS_r*.json artifacts record exactly
    which queries every past driver run checked, so the ordering now
    drains ALL never-checked queries first — round-robined across
    families so any prefix stays a cross-section of SURVEY §2 — then
    the checked ones oldest-check-first. A 50-query prefix is 100% new
    coverage until the never-checked set is exhausted, self-adapting
    as artifacts accumulate.

    Failed-first rationale (VERDICT r7 #1): a query whose LATEST driver
    check failed must re-sample before anything merely stale — q12's
    r01 hash-mismatch sat unre-checked for six rounds because the seen
    phase sorted by check age alone. The seen phase now sorts by
    (latest-check-FAILED first, then oldest check round), so any future
    driver fail self-schedules into the very next round's prefix.

    Strict-tier rationale (VERDICT r8 #5): per-family round-robin over
    the WHOLE seen phase capped each family at ~1/6 of the prefix, so a
    stale cohort concentrated in one family (the 22+9 relational
    queries last checked r1/r3) could never fully drain — family caps
    kept re-sampling fresher queries from other families instead. The
    seen phase now drains strictly by (failed?, check-round) tier —
    every r1-checked query before any r3-checked one — and round-robins
    across families only WITHIN a tier, so prefix diversity survives
    where it matters (ties) without starving the stalest cohort.
    """
    from collections import defaultdict

    from pg_logical_replication_spark.plans import QUERIES

    buckets: dict[str, list[str]] = defaultdict(list)
    for name in QUERIES:
        buckets[_category(name)].append(name)
    # stride chosen to maximize prefix turnover vs the r03 coverage
    # (co-prime-ish with the family bucket sizes)
    shift = (_round_number() - 1) * 6
    latest = _checked_history()
    never: dict[str, list[str]] = {}
    # seen phase: tier key = (latest check did NOT fail, check round);
    # tiers drain in sorted order, families round-robin within a tier
    tiers: dict[tuple[bool, int], dict[str, list[str]]] = defaultdict(
        lambda: defaultdict(list)
    )
    for cat, names in buckets.items():
        k = shift % len(names)
        rotated = names[k:] + names[:k]
        never[cat] = [n for n in rotated if n not in latest]
        for n in rotated:
            if n in latest:
                rnd, failed = latest[n]
                tiers[(not failed, rnd)][cat].append(n)
    order = ["q_cdc", "relational", "q_dedup", "q_text", "q_ann", "q_mm"]
    phases = [never] + [tiers[key] for key in sorted(tiers)]
    out: list[str] = []
    for phase in phases:
        idx = 0
        while any(phase.get(c) for c in order):
            cat = order[idx % len(order)]
            if phase.get(cat):
                out.append(phase[cat].pop(0))
            idx += 1
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pg_logical_replication_spark.plans import QUERIES

    return {name: QUERIES[name].builder for name in _interleaved()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins; queries without an oracle (engine-
    specific sketches/LSH recall) are omitted → rows-only check."""
    from pg_logical_replication_spark.plans import QUERIES

    return {
        name: QUERIES[name].oracle
        for name in _interleaved()
        if QUERIES[name].oracle is not None
    }
