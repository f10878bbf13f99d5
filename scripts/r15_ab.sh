#!/bin/bash
# Round-15 commit-level A/B (VERDICT r14 #3): q49/q50 (+q52, q43) at
# r15 HEAD vs the round-14 close (d671168), same box, min-of-reps.
# Usage: scripts/r15_ab.sh <iters>
set -u
ITERS=${1:-5}
OUT=/tmp/r15_ab
mkdir -p $OUT
QS="q49_partitioned_delete q50_sql_update q52_sql_optimize q43_scbf_delete"

run_side () {
  local tag=$1
  for q in $QS; do
    echo "[ab] $tag $q"
    sbt -batch "Test/runMain graft.tools.TimeQuery $q /root/testdata/sf0.1 $ITERS clear" \
      > $OUT/${tag}_${q}.log 2>&1
    grep -E "\[time\]" $OUT/${tag}_${q}.log
  done
}

echo "=== side A: HEAD ==="
run_side head

echo "=== side B: r14 (d671168) ==="
git stash -u
git checkout -q d671168
run_side r14
git checkout -q main
git stash pop

echo "=== summary (grep '\[time\]' $OUT/*.log) ==="
for q in $QS; do
  for t in head r14; do
    m=$(grep -oE ": [0-9.]+ s" $OUT/${t}_${q}.log | grep -oE "[0-9.]+" | sort -g | head -1)
    echo "$q $t min=$m"
  done
done
