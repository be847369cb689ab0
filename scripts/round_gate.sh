#!/usr/bin/env bash
# Standing pre-snapshot round gate (VERDICT r04 #5).
#
# The external driver only re-verifies the FIRST 50 catalog entries
# each round (the committed _PERMANENT_CORE + _ROUND_COHORT lists in
# entry_queries.py); every entry OUTSIDE that front-50 must be
# re-verified locally each round or a regression there ships silently.
#
# This script:
#   1. computes the set of entries NOT in the current front-50,
#   2. runs the strict local oracle sweep over them
#      (scripts/check_correctness.py --strict — the driver's exact
#      value comparison, no float tolerance),
#   3. replays the driver's pandas-level hash comparison over the
#      SAME set (scripts/driver_hash_repro.py), once in the default
#      session TZ and once TZ-shifted, catching session-TZ-dependent
#      rendering the fetchall harness can't see.
#
# Run it before every round snapshot and log the result in
# PROGRESS.jsonl:
#   bash scripts/round_gate.sh [sf_dir]        # default sf0.01
#   bash scripts/round_gate.sh --all [sf_dir]  # front-50 included
#
# --all additionally sweeps the front-50 (the entries the driver WILL
# sample) — the belt-and-braces pass before a final snapshot.
#
# Exit code 0 = every swept entry green on all three passes.
set -euo pipefail
cd "$(dirname "$0")/.."

SCOPE="back"
if [ "${1:-}" = "--all" ]; then SCOPE="all"; shift; fi
SF_DIR="${1:-/root/testdata/sf0.01}"
SHIFT_TZ="${ROUND_GATE_TZ:-Pacific/Kiritimati}"

BACK=$(SCOPE="$SCOPE" python - <<'EOF'
import os
import sys
sys.path.insert(0, ".")
import __spark_entry__ as m

names = list(m.queries())
start = 0 if os.environ.get("SCOPE") == "all" else 50
print(" ".join(names[start:]))
EOF
)

echo "== round gate ($SCOPE): $(echo $BACK | wc -w) entries at $SF_DIR =="
echo "-- pass 1/3: strict local oracle sweep --"
python scripts/check_correctness.py --strict "$SF_DIR" $BACK
echo "-- pass 2/3: driver-path pandas hash repro --"
python scripts/driver_hash_repro.py "$SF_DIR" $BACK
echo "-- pass 3/3: driver-path repro, session TZ=$SHIFT_TZ --"
python scripts/driver_hash_repro.py --tz "$SHIFT_TZ" "$SF_DIR" $BACK
echo "== round gate: all passes green =="
