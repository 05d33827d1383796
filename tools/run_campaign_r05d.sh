#!/bin/bash
# Round-5 campaign, part D: FORA+ design-regime bench (forced join path)
# at the sized 800k-page input, matching the main table's input so the
# printed efficiencies measure the engine (the 100k probe lines showed
# the index win but carried small-size fixed costs in the ratios).
# Waits for campaign C (sequential-box discipline), then runs.
set -u
cd /root/repo
while [ ! -f /tmp/campaign_r05c.done ]; do sleep 20; done
R() { echo "=== $(date +%H:%M:%S) $*"; "$@"; }

for c in 8 2; do
  R env SPARK_GRAFT_CPUS=$c SPARK_GRAFT_WORKLOADS=forajoin \
    SPARK_GRAFT_PAGES=800000 SPARK_GRAFT_REPEATS=2 \
    SPARK_GRAFT_JOIN_DELTA=6e-5 \
    SPARK_GRAFT_BENCH_OUT=BENCH/scaling_forajoin.jsonl \
    sbt -batch "runMain graft.ScalingBench" > /tmp/fj800_r05_c$c.log 2>&1
done

echo "=== campaign D done $(date +%H:%M:%S)"
touch /tmp/campaign_r05d.done
