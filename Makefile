# Developer entry points (the reference repo drives everything through
# make; same idea here). All targets run on the local[32] test session.

.PHONY: test bench compare plans import smoke

# full suite (the CI gate)
test:
	python -m pytest tests/ -q

# headline queries at $${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1};
# one JSON line + BENCH_LOCAL.json
bench:
	python bench.py

# the engine's own oracle SQL through single-node DuckDB — the
# baseline bench numbers are graded against
compare:
	python tools/duckdb_compare.py

# regenerate PLANS.md (formatted physical plans of headline queries)
plans:
	python tools/dump_plans.py

# full import pipeline parity driver (reference `make import`):
#   make import LAKE=/tmp/lake SOURCE=/path/to/csvs
import:
	python -m fxa_activity_metrics_spark.run --lake $(LAKE) --source $(SOURCE)

# fast correctness probe: oracle parity only
smoke:
	python -m pytest tests/test_oracle_parity.py -q
