# Convenience entry points; every target is a thin shell around the
# committed scripts so CI and humans run the identical path.

LIVEPG_LABEL ?= $(shell date -u +%Y%m%dT%H%M%S)

.PHONY: test livepg bench ledger parity freeze

# ledger first (VERDICT r8 #3): the freshness tripwire regenerates
# whenever the suite runs, so a driver artifact landing beside a stale
# docs/COVERAGE_LEDGER.md is caught the next time anyone runs make test
test: ledger
	python -m pytest tests/ -q -m "not slow and not livepg"

# scripted PostgreSQL 15 up -> 18-leg live conformance suite ->
# teardown; transcript lands in docs/LIVEPG_transcript_<label>.txt
livepg:
	bash scripts/livepg_run.sh $(LIVEPG_LABEL)

bench:
	python bench.py

ledger:
	python scripts/coverage_ledger.py --write

# full-registry sf0.1 oracle parity sweep -> committed artifact
PARITY_OUT ?= docs/PARITY_sf01_$(shell date -u +%Y%m%dT%H%M%S).txt
parity:
	python scripts/parity_sweep.py --out $(PARITY_OUT)

# end-of-round freeze gate (VERDICT r9 #1): the newest PARITY artifact
# must cover the live registry's full oracle-gated count — a query
# registered after the sweep fails here instead of shipping unchecked
freeze: ledger
	python scripts/freeze_check.py
