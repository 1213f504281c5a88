#!/bin/bash
# Interleaved A/B bench: two trees alternating in ONE window, so host
# contention hits both; per-slot /proc/stat steal ticks + loadavg are
# recorded so any contaminated slot can be discarded.  This is the
# standard tree-vs-tree wall protocol on this host (VERDICT r14 #2):
# raw walls across epochs are environmental, same-window alternation
# plus controls is what adjudicates.
#
# Usage: tools/ab_interleave.sh TREE_A TREE_B [ROUNDS] [OUT_DIR]
#   TREE_A/TREE_B  repo roots to bench (e.g. a git worktree of the
#                  previous round's close vs /root/repo)
#   ROUNDS         alternating rounds (default 3)
#   OUT_DIR        artifact dir (default /tmp/ab_$(date +%s) -- commit
#                  the per-run JSON lines under plans/r{N}/ab/)
# Env: BENCH_RUNS (default 2), SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
# Analyze with: python tools/ab_analyze.py OUT_DIR
set -u
A=${1:?tree A}; B=${2:?tree B}; ROUNDS=${3:-3}
OUT=${4:-/tmp/ab_$(date +%s)}
mkdir -p "$OUT"
export SPARK_GRAFT_SF_DIR=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
export BENCH_RUNS=${BENCH_RUNS:-2}
steal() { awk '/^cpu /{print $9}' /proc/stat; }
for i in $(seq 1 "$ROUNDS"); do
  for tree in "$A" "$B"; do
    name=$(basename "$tree")
    s0=$(steal); t0=$(date +%s)
    echo "=== round $i tree $name start $(date +%H:%M:%S) steal0 $s0 loadavg $(cut -d' ' -f1-3 /proc/loadavg)" >> "$OUT/ab_meta.log"
    (cd "$tree" && python3 bench.py 2>"$OUT/ab_${name}_r${i}.err" | tail -1 > "$OUT/ab_${name}_r${i}.json")
    s1=$(steal); t1=$(date +%s)
    echo "=== round $i tree $name end $(date +%H:%M:%S) steal1 $s1 wall $((t1-t0))s steal_ticks $((s1-s0))" >> "$OUT/ab_meta.log"
  done
done
echo AB_DONE >> "$OUT/ab_meta.log"
echo "$OUT"
