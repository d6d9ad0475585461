#!/bin/bash
# Track every round artifact the judge reads BEFORE the snapshot commit —
# rounds 7, 8 and 9 all ended with BENCH_r*.json / CORRECTNESS_r*.json
# sitting untracked at judging time. Run this whenever artifacts are
# (re)generated; it is idempotent and safe to run with nothing new.
# Usage: scripts/snapshot_round.sh [extra files...]
set -euo pipefail
cd "$(dirname "$0")/.."
git add -f BENCH_r*.json CORRECTNESS_r*.json BENCH_FULL.json \
  LEAKCHECK.json COPYCHECK.json BENCH_NOTES.md 2>/dev/null || true
for f in BENCH_local_r*.json SCALECHECK_r*.jsonl scratch/BENCH_perq_*.json; do
  [ -e "$f" ] && git add -f "$f"
done
[ $# -gt 0 ] && git add -f "$@"
git status --short | sed -n '1,40p'
