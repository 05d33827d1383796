#!/bin/bash
# Round-5 campaign, part C: full workload sessions at 800k pages.
# Rationale: the round-5 engine is 2-5x faster than r4 (chained rounds,
# CSR-first ingest, data-derived walk widths), so at 100k pages the
# high-level wall for pagerank20/fora64 drops to ~10-16 s and per-run
# fixed cost is ~60% of it — the two-level ratio measures the scheduler,
# not the engine (T=W/P+F fits in BENCH/BASELINE.md). Same resize
# rationale as r3 walk-heavy and the r5 ingest: grow W 8x, F constant.
# The 100k sessions stay published as the small-size evidence.
# Waits for campaign B (sequential-box discipline), then runs.
set -u
cd /root/repo
while [ ! -f /tmp/campaign_r05b.done ]; do sleep 20; done
R() { echo "=== $(date +%H:%M:%S) $*"; "$@"; }

for s in 1 2; do
  for c in 8 2; do
    R env SPARK_GRAFT_CPUS=$c SPARK_GRAFT_REPEATS=2 \
      SPARK_GRAFT_PAGES=800000 \
      SPARK_GRAFT_BENCH_OUT=BENCH/scaling_sessions800_r05_s$s.jsonl \
      sbt -batch "runMain graft.ScalingBench" > /tmp/all800_r05_s${s}_c$c.log 2>&1
  done
done

echo "=== campaign C done $(date +%H:%M:%S)"
touch /tmp/campaign_r05c.done
