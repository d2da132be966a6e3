# Convenience entry points; every target is a thin shell around the
# committed scripts so CI and humans run the identical path.

LIVEPG_LABEL ?= $(shell date -u +%Y%m%dT%H%M%S)

.PHONY: test livepg bench ledger

test:
	python -m pytest tests/ -q -m "not slow and not livepg"

# scripted PostgreSQL 15 up -> 18-leg live conformance suite ->
# teardown; transcript lands in docs/LIVEPG_transcript_<label>.txt
livepg:
	bash scripts/livepg_run.sh $(LIVEPG_LABEL)

bench:
	python bench.py

ledger:
	python scripts/coverage_ledger.py --write
