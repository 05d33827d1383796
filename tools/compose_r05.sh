#!/bin/bash
# One-shot round-5 composition: merge sessions → compose BENCH/BASELINE.md.
# Run AFTER campaigns B and C finish (/tmp/campaign_r05{b,c}.done).
set -eu
cd /root/repo

# gate input (800k pages): full sessions + dedicated min-of-3 ingest
# sessions; merge picks each workload group same-session by best
# high-level time and records every session's own efficiency
python3 tools/merge_sessions.py BENCH/scaling_runs.jsonl \
  BENCH/scaling_sessions800_r05_s1.jsonl BENCH/scaling_sessions800_r05_s2.jsonl \
  BENCH/scaling_ingest800_r05_s1.jsonl BENCH/scaling_ingest800_r05_s2.jsonl

# small-size (100k pages) reference sessions — feed the T=W/P+F sizing
# section; separate merge (different input table)
python3 tools/merge_sessions.py BENCH/scaling_runs_small_r05.jsonl \
  BENCH/scaling_sessions_r05_s1.jsonl BENCH/scaling_sessions_r05_s2.jsonl \
  BENCH/scaling_ingest_r05_s1.jsonl BENCH/scaling_ingest_r05_s2.jsonl

# hub-skew sessions — separate merge (different, skewed graph)
python3 tools/merge_sessions.py BENCH/scaling_hub.jsonl \
  BENCH/hub_sessions_r05_s1.jsonl BENCH/hub_sessions_r05_s2.jsonl

python3 tools/compose_scaling.py BENCH/scaling_runs.jsonl BENCH/BASELINE.md
