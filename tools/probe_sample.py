"""Append one timestamped host-ceiling sample to SCALING_PROBES.jsonl.

Runs the cache-resident pure-CPU probe (tools/host_contention_probe.py
kernel) at the requested core counts and appends
  {"ts": <unix>, "per_task_s": {...}, "ceiling_n_to_4n": {...}}
so tools/scaling_windows.py can normalize each paired same-window engine
efficiency by the host ceiling measured in (almost) the same window —
the per-window version of BASELINE.md's host normalization.

Usage: python tools/probe_sample.py [n_procs ...]   (default 4 8 16 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from host_contention_probe import measure  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "SCALING_PROBES.jsonl")


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [4, 8, 16, 32]
    per_task = {n: round(measure(n), 4) for n in ns}
    pairs = [(a, b) for a in ns for b in ns if b == 4 * a]
    rec = {
        "ts": round(time.time()),
        "per_task_s": per_task,
        "ceiling_n_to_4n": {
            f"{a}_to_{b}": round(per_task[a] / per_task[b], 3) for a, b in pairs
        },
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
