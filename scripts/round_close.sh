#!/bin/bash
# Round-close gate (VERDICT r8 "What's wrong" #2): run the FULL driver
# correctness surface locally and commit hard evidence with the round —
# a round must never ship without a non-empty correctness record again.
#
#   scripts/round_close.sh [sfDir] [outDir]
#
# Runs: sbt compile -> graft.Verify (full dump) -> check_oracle.py with
# the JSON summary arg. The checker REFUSES to write an empty summary
# (exit 2), and this script fails if the match count is not total.
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/verify_roundclose}
SUMMARY=${3:-CORRECTNESS_SELF.json}
sbt -batch compile | tail -1
rm -rf "$OUT"
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16} scripts/run.sh graft.Verify "$SF" "$OUT" \
  > /tmp/round_close_verify.log 2>&1
python3 scripts/check_oracle.py "$SF" "$OUT" "$SUMMARY" | tail -5
n_match=$(python3 -c "import json;d=json.load(open('$SUMMARY'));print(d['n_match'])")
n_total=$(python3 -c "import json;d=json.load(open('$SUMMARY'));print(d['n_total'])")
if [ "$n_match" != "$n_total" ] || [ "$n_total" = "0" ]; then
  echo "ROUND-CLOSE GATE FAILED: $n_match/$n_total" >&2
  exit 1
fi
echo "round-close gate green: $n_match/$n_total -> $SUMMARY"
# regenerate SURVEY.md's query-surface counts from this run's artifacts
# (VERDICT r11 #7: generated, not hand-maintained)
python3 scripts/update_survey_counts.py "$OUT" || true
# informational: flag plan drift (shuffle-byte movement) vs the committed
# bench artifact — drift can be intentional, but it must be SEEN
python3 scripts/bench_drift.py 2>/dev/null || true
