#!/usr/bin/env python
"""Freeze-ritual gate (VERDICT r9 #1): the newest committed PARITY
artifact must cover the WHOLE oracle-gated registry.

Round 9 shipped `q_embed_shortlist_mmr` registered AFTER the sf0.1
sweep ran — 266 PASS against a 267-oracle registry, an evidence gap the
ritual allowed silently. This check fails when:

* no `docs/PARITY_*.txt` artifact exists;
* the newest artifact's TOTAL pass count != the LIVE registry's
  oracle-gated query count (a post-sweep registration or a sweep FAIL);
* the artifact records a HEAD (informational: mismatching HEAD prints a
  warning, since the tree may legitimately change in ways that don't
  touch the registry — the COUNT is the gate).

Usage: python scripts/freeze_check.py      (exit 0 = freeze-clean)
"""

from __future__ import annotations

import glob
import os
import re
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> int:
    arts = sorted(
        glob.glob(os.path.join(_REPO, "docs", "PARITY_*.txt")),
        key=os.path.getmtime,
    )
    if not arts:
        print("FREEZE GATE: no docs/PARITY_*.txt artifact — run "
              "scripts/parity_sweep.py --out docs/PARITY_sf01_rNN.txt")
        return 1
    art = arts[-1]
    text = open(art).read()
    m = re.search(r"^TOTAL (\d+)/(\d+) pass$", text, re.M)
    if not m:
        print(f"FREEZE GATE: {art} has no TOTAL line")
        return 1
    n_pass, n_swept = int(m.group(1)), int(m.group(2))

    from pg_logical_replication_spark.plans.registry import QUERIES

    n_oracle = sum(1 for s in QUERIES.values() if s.oracle)
    ok = True
    if n_pass != n_swept:
        print(f"FREEZE GATE: {os.path.basename(art)} records "
              f"{n_swept - n_pass} FAILs ({n_pass}/{n_swept})")
        ok = False
    if n_pass != n_oracle:
        print(
            f"FREEZE GATE: newest sweep ({os.path.basename(art)}) passed "
            f"{n_pass} queries but the live registry has {n_oracle} "
            "oracle-gated queries — a query was registered after the "
            "sweep (or dropped); re-run scripts/parity_sweep.py at this "
            "HEAD."
        )
        ok = False
    mh = re.search(r"^# HEAD: (\S+)", text, re.M)
    if mh:
        try:
            head = subprocess.check_output(
                ["git", "rev-parse", "--short", "HEAD"], cwd=_REPO,
                text=True).strip()
            if head != mh.group(1):
                print(f"note: sweep artifact HEAD {mh.group(1)} != current "
                      f"HEAD {head} (count gate still decides)")
        except Exception:
            pass
    # stdout-line budget (VERDICT r10 #8): the driver's capture has
    # truncated bench.py's one-line JSON in three prior rounds; gate a
    # worst-case line built from the LIVE headline list so growth past
    # the budget fails the freeze instead of silently losing a record.
    import bench

    line_len, budget = bench.stdout_line_budget()
    if line_len > budget:
        print(
            f"FREEZE GATE: worst-case bench stdout line is {line_len} "
            f"chars > {budget} budget — slim bench.stdout_result (the "
            "driver capture truncates long lines)"
        )
        ok = False
    if ok:
        print(f"freeze-clean: {os.path.basename(art)} — {n_pass}/{n_swept} "
              f"pass == {n_oracle} oracle-gated registry queries; "
              f"stdout line {line_len}/{budget} chars")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
