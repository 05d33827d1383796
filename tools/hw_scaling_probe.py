#!/usr/bin/env python3
"""Hardware parallel-capacity probe (BASELINE.md §3).

Runs N independent CPU-bound processes, each with identical fixed work,
at several N. On linear hardware the wall time is flat in N; the ratio
t[N_low]/t[N_high] bounds ANY parallel speedup measurable on this box
(Spark included). Prints one JSON line.
"""
import json
import multiprocessing as mp
import sys
import time

WORK = 40_000_000

def burn(n):
    s = 0
    for i in range(n):
        s += i * i
    return s

def t_at(workers):
    t0 = time.time()
    with mp.Pool(workers) as p:
        p.map(burn, [WORK] * workers)
    return time.time() - t0

if __name__ == "__main__":
    levels = [int(x) for x in sys.argv[1:]] or [2, 8, 32]
    res = {f"t_{n}": round(t_at(n), 3) for n in levels}
    for lo in levels:
        for hi in levels:
            if hi > lo:
                # same per-worker work: flat wall time == linear hardware
                res[f"hw_eff_{lo}_to_{hi}"] = round(
                    res[f"t_{lo}"] / res[f"t_{hi}"], 3)
    print(json.dumps(res))
