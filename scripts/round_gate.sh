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
#
# Exit code 0 = every back-catalog entry green on all three passes.
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.01}"
SHIFT_TZ="${ROUND_GATE_TZ:-Pacific/Kiritimati}"

BACK=$(python - <<'EOF'
import sys
sys.path.insert(0, ".")
import __spark_entry__ as m

names = list(m.queries())
print(" ".join(names[50:]))
EOF
)

echo "== round gate: $(echo $BACK | wc -w) back-catalog entries at $SF_DIR =="
echo "-- pass 1/3: strict local oracle sweep --"
python scripts/check_correctness.py --strict "$SF_DIR" $BACK
echo "-- pass 2/3: driver-path pandas hash repro --"
python scripts/driver_hash_repro.py "$SF_DIR" $BACK
echo "-- pass 3/3: driver-path repro, session TZ=$SHIFT_TZ --"
python scripts/driver_hash_repro.py --tz "$SHIFT_TZ" "$SF_DIR" $BACK
echo "== round gate: all passes green =="
