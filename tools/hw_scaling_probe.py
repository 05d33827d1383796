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

# Memory-bandwidth variant (--mem): each worker strides a buffer far
# larger than LLC. The engine's live push/walk kernels are random-access
# over a multi-hundred-MB CSR, so THIS probe (not the pure-CPU one)
# bounds their scaling when the host's memory system is contended —
# round 4 observed identical jobs 50% slower at local[8] an hour apart
# while checksums stayed bitwise equal.
def burn_mem(n):
    try:
        import numpy as np
        buf = np.arange(32_000_000, dtype=np.int64)  # 256 MB
        s = 0
        for _ in range(6):
            s += int(buf[::17].sum())
        return s
    except ImportError:
        data = list(range(8_000_000))
        s = 0
        for _ in range(4):
            s += sum(data[::17])
        return s

def t_at(workers, fn=burn):
    t0 = time.time()
    with mp.Pool(workers) as p:
        p.map(fn, [WORK] * workers)
    return time.time() - t0

if __name__ == "__main__":
    args = sys.argv[1:]
    mem = "--mem" in args
    levels = [int(x) for x in args if x != "--mem"] or [2, 8, 32]
    fn = burn_mem if mem else burn
    res = {f"t_{n}": round(t_at(n, fn), 3) for n in levels}
    if mem:
        res["mode"] = "mem"
    for lo in levels:
        for hi in levels:
            if hi > lo:
                # same per-worker work: flat wall time == linear hardware
                res[f"hw_eff_{lo}_to_{hi}"] = round(
                    res[f"t_{lo}"] / res[f"t_{hi}"], 3)
    print(json.dumps(res))
