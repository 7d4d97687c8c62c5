"""Measure the sandbox host's concurrency penalty, independent of this engine.

Runs a cache-resident pure-compute kernel (64x64 float32 matmul+tanh loop —
~32 KB working set, zero DRAM traffic, zero shared data, BLAS pinned) in N
independent processes and reports per-task time vs N. On ideal hardware the
per-task time is flat in N up to the physical core count; any rise is the
host (all-core frequency budget / hypervisor CPU accounting), not the
workload. The N→4N ratio of per-task times is the efficiency CEILING any
embarrassingly-parallel job can reach on this box, and is what BASELINE.md
normalizes the engine's measured scaling efficiency against.

Usage: python tools/host_contention_probe.py [n_procs ...]
"""

from __future__ import annotations

import json
import os
import sys

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import numpy as np  # noqa: E402


def _work(seed: int) -> float:
    import time

    rng = np.random.default_rng(seed)
    a = rng.random((64, 64), dtype=np.float32)
    b = rng.random((64, 64), dtype=np.float32)
    t0 = time.time()
    for _ in range(20000):
        a = np.tanh(a @ b)
    return time.time() - t0


def measure(nproc: int) -> float:
    from multiprocessing import Pool

    with Pool(nproc) as p:
        p.map(_work, range(nproc))           # warm the workers
        times = p.map(_work, range(nproc * 4))
    return float(np.mean(times))


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [2, 4, 8, 16, 32]
    per_task = {n: round(measure(n), 4) for n in ns}
    out = {"per_task_s": per_task}
    pairs = [(a, b) for a in ns for b in ns if b == 4 * a]
    out["ceiling_n_to_4n"] = {
        f"{a}_to_{b}": round(per_task[a] / per_task[b], 3) for a, b in pairs
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
