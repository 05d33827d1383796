#!/bin/bash
# Round-5 campaign, part B (continuation after part A delivered probes,
# forajoin, ingest@100k and full-session s1@8c). Strictly sequential —
# two-level ratios are only comparable on a quiet box (BASELINE.md §3).
set -u
cd /root/repo
R() { echo "=== $(date +%H:%M:%S) $*"; "$@"; }

# 1. full workload sessions: finish s1 (c2), then s2 (c8, c2)
R env SPARK_GRAFT_CPUS=2 SPARK_GRAFT_REPEATS=3 \
  SPARK_GRAFT_BENCH_OUT=BENCH/scaling_sessions_r05_s1.jsonl \
  sbt -batch "runMain graft.ScalingBench" > /tmp/all_r05_s1_c2.log 2>&1
for c in 8 2; do
  R env SPARK_GRAFT_CPUS=$c SPARK_GRAFT_REPEATS=3 \
    SPARK_GRAFT_BENCH_OUT=BENCH/scaling_sessions_r05_s2.jsonl \
    sbt -batch "runMain graft.ScalingBench" > /tmp/all_r05_s2_c$c.log 2>&1
done

# 2. hub workload: 2 sessions x both levels
for s in 1 2; do
  for c in 8 2; do
    R env SPARK_GRAFT_CPUS=$c SPARK_GRAFT_WORKLOADS=hub \
      SPARK_GRAFT_REPEATS=3 \
      SPARK_GRAFT_HUB_OUT=BENCH/hub_sessions_r05_s$s.jsonl \
      sbt -batch "runMain graft.ScalingBench" > /tmp/hub_r05_s${s}_c$c.log 2>&1
  done
done

# 3. ingest sized 8x up (800k pages, ~13M edges): the 100k-page ingest
#    finishes in 3.8s at 8 cores across ~40 stages, so per-stage fixed
#    scheduling costs are ~58% of the high-level wall (two-point fit:
#    W=12.5s parallel work, F=2.2s fixed) and the ratio measures the
#    scheduler, not the engine — the same reason walk-heavy was resized
#    in r3 (VERDICT r3 #7). 2 sessions x both levels, min-of-3.
for s in 1 2; do
  for c in 8 2; do
    R env SPARK_GRAFT_CPUS=$c SPARK_GRAFT_WORKLOADS=ingest \
      SPARK_GRAFT_PAGES=800000 SPARK_GRAFT_INGEST_REPEATS=3 \
      SPARK_GRAFT_BENCH_OUT=BENCH/scaling_ingest800_r05_s$s.jsonl \
      sbt -batch "runMain graft.ScalingBench" > /tmp/ing800_r05_s${s}_c$c.log 2>&1
  done
done

echo "=== campaign B done $(date +%H:%M:%S)"
touch /tmp/campaign_r05b.done
