#!/bin/bash
# Interleaved A/B: r13-close tree vs r14 tree, same window.
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1
export SPARK_GRAFT_CPUS=32
export BENCH_RUNS=2
for i in 1 2 3; do
  for tree in /tmp/r13tree /root/repo; do
    name=$(basename $tree)
    echo "=== round $i tree $name $(date +%H:%M:%S) loadavg $(cut -d' ' -f1-3 /proc/loadavg)" >> /tmp/ab_meta.log
    (cd $tree && python3 bench.py 2>/tmp/ab_${name}_r${i}.err | tail -1 > /tmp/ab_${name}_r${i}.json)
  done
done
echo AB_DONE >> /tmp/ab_meta.log
