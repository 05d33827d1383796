#!/bin/bash
# Round-5 scaling measurement campaign. Strictly sequential — the
# two-level protocol's numbers are only comparable when nothing else
# competes for the box (BASELINE.md §3 host-noise discipline).
set -u
cd /root/repo
R() { echo "=== $(date +%H:%M:%S) $*"; "$@"; }

# 0. probes first (cheap, pins the box ceiling for this campaign window)
R sbt -batch "runMain graft.JvmProbe 2 8" 2>&1 | grep JVMPROBE >> BENCH/probes_r05.jsonl
R sbt -batch "runMain graft.JvmProbe 2 8 html" 2>&1 | grep JVMPROBE >> BENCH/probes_r05.jsonl

# 1. forajoin final: delta=6e-5 (walk-dominated — the index's design
#    point), min-of-3, both levels; fresh file (the delta=3e-4 probe
#    lines would otherwise win last-per-level)
rm -f BENCH/scaling_forajoin.jsonl
for c in 8 2; do
  R env SPARK_GRAFT_CPUS=$c SPARK_GRAFT_WORKLOADS=forajoin \
    SPARK_GRAFT_REPEATS=3 SPARK_GRAFT_JOIN_DELTA=6e-5 \
    SPARK_GRAFT_BENCH_OUT=BENCH/scaling_forajoin.jsonl \
    sbt -batch "runMain graft.ScalingBench" > /tmp/fj_r05_c$c.log 2>&1
done

# 2. ingest: 2 sessions x both levels, min-of-3 each
for s in 1 2; do
  for c in 8 2; do
    R env SPARK_GRAFT_CPUS=$c SPARK_GRAFT_WORKLOADS=ingest \
      SPARK_GRAFT_INGEST_REPEATS=3 \
      SPARK_GRAFT_BENCH_OUT=BENCH/scaling_ingest_r05_s$s.jsonl \
      sbt -batch "runMain graft.ScalingBench" > /tmp/ing_r05_s${s}_c$c.log 2>&1
  done
done

# 3. ingestprof: stage-level wall/run/gc table at both levels (1 rep)
for c in 8 2; do
  R env SPARK_GRAFT_CPUS=$c SPARK_GRAFT_WORKLOADS=ingestprof \
    SPARK_GRAFT_BENCH_OUT=/tmp/ingprof_r05.jsonl \
    sbt -batch "runMain graft.ScalingBench" > /tmp/ingprof_r05_c$c.log 2>&1
  grep STAGE /tmp/ingprof_r05_c$c.log > BENCH/ingestprof_r05_cpu$c.txt
done

# 4. full workload sessions (ingest inline 1x + pagerank20 + fora64 +
#    index + walk-heavy), 2 sessions x both levels
for s in 1 2; do
  for c in 8 2; do
    R env SPARK_GRAFT_CPUS=$c SPARK_GRAFT_REPEATS=3 \
      SPARK_GRAFT_BENCH_OUT=BENCH/scaling_sessions_r05_s$s.jsonl \
      sbt -batch "runMain graft.ScalingBench" > /tmp/all_r05_s${s}_c$c.log 2>&1
  done
done

# 5. hub workload: 2 sessions x both levels
for s in 1 2; do
  for c in 8 2; do
    R env SPARK_GRAFT_CPUS=$c SPARK_GRAFT_WORKLOADS=hub \
      SPARK_GRAFT_REPEATS=3 \
      SPARK_GRAFT_HUB_OUT=BENCH/hub_sessions_r05_s$s.jsonl \
      sbt -batch "runMain graft.ScalingBench" > /tmp/hub_r05_s${s}_c$c.log 2>&1
  done
done

echo "=== campaign done $(date +%H:%M:%S)"
