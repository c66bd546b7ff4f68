"""Hardware ceiling controls for single-box scaling normalization
(BENCH/BASELINE.md): how much 8->32-way speedup this VM can give
(a) pure-CPU work and (b) memory-bandwidth-bound work. Spark-free.

Usage: python tools/hw_controls.py
"""
import json
import multiprocessing as mp
import time

import numpy as np


def cpu_task(n):
    # integer hashing loop, no memory traffic to speak of
    acc = 0
    for i in range(n):
        acc = (acc * 6364136223846793005 + i) & ((1 << 64) - 1)
    return acc


def mem_task(n_copies):
    a = np.arange(25_000_000 // 8, dtype=np.float64)  # 25 MB working set
    b = np.empty_like(a)
    for _ in range(n_copies):
        np.copyto(b, a)
        np.copyto(a, b)
    return float(b[-1])


def run(pool_sizes, task, arg, total_tasks=64):
    # STRONG scaling: the same fixed batch of tasks at every pool size
    out = {}
    for p in pool_sizes:
        with mp.Pool(p) as pool:
            t0 = time.time()
            pool.map(task, [arg] * total_tasks)
            out[p] = time.time() - t0
    return out


def main():
    cpu = run([1, 8, 32], cpu_task, 3_000_000)
    mem = run([1, 8, 32], mem_task, 40)
    res = {
        "cpu_wall": {k: round(v, 2) for k, v in cpu.items()},
        "cpu_eff_8": round(cpu[1] / (8 * cpu[8]), 3),
        "cpu_eff_32": round(cpu[1] / (32 * cpu[32]), 3),
        "cpu_eff_8to32": round(cpu[8] / (4 * cpu[32]), 3),
        "mem_wall": {k: round(v, 2) for k, v in mem.items()},
        "mem_eff_8to32": round(mem[8] / (4 * mem[32]), 3),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
