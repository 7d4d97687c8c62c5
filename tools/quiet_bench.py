"""Probe-gated benchmark: run bench.py only inside a certified-quiet window.

The shared sandbox host's capacity swings 2-3x within minutes from external
co-tenants, so a bench column recorded in a loaded window understates the
engine uniformly (round 5's column read ~1.5x the round-4 quiet minima with
zero engine change). This wrapper makes the venue explicit: it measures the
host's pure-CPU concurrency ceiling (tools/host_contention_probe.py — the
efficiency ANY embarrassingly-parallel job could reach right now), and only
when the 8->32 ceiling is at or above --min-ceiling (default 0.9) does it
run the bench; otherwise it retries after --wait seconds until --deadline-s
elapses. The emitted JSON is bench.py's line plus the certification fields:
the gating ceiling, the probe's per-task times, and whether the gate was
met or the run fell back to the quietest observed window (--fallback).

Usage:
    python tools/quiet_bench.py [--min-ceiling 0.9] [--wait 300]
        [--deadline-s 3600] [--fallback] [--out BENCH_quiet.json]

With --fallback, if no window certifies before the deadline, the bench runs
anyway and the JSON carries certified=false plus the best ceiling seen —
an honest record of the venue instead of silence.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "host_contention_probe.py"),
         "8", "32"],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout)


def run_bench() -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    # bench.py prints ONE JSON line last
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--min-ceiling", type=float, default=0.9)
    ap.add_argument("--wait", type=float, default=300.0)
    ap.add_argument("--deadline-s", type=float, default=3600.0)
    ap.add_argument("--fallback", action="store_true",
                    help="run anyway at the deadline, marked certified=false")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    t0 = time.time()
    best = None
    while True:
        p = probe()
        ceiling = p["ceiling_n_to_4n"]["8_to_32"]
        if best is None or ceiling > best["ceiling_n_to_4n"]["8_to_32"]:
            best = p
        print(f"probe: 8->32 ceiling {ceiling} "
              f"(gate {args.min_ceiling}, elapsed {time.time()-t0:.0f}s)",
              file=sys.stderr)
        if ceiling >= args.min_ceiling:
            bench = run_bench()
            bench["certified"] = True
            bench["probe_ceiling_8_to_32"] = ceiling
            bench["probe_per_task_s"] = p["per_task_s"]
            break
        if time.time() - t0 + args.wait > args.deadline_s:
            if not args.fallback:
                print("no certified-quiet window before deadline; "
                      "rerun with --fallback to record the loaded venue",
                      file=sys.stderr)
                return 1
            bench = run_bench()
            bench["certified"] = False
            bench["probe_ceiling_8_to_32"] = best["ceiling_n_to_4n"]["8_to_32"]
            bench["probe_per_task_s"] = best["per_task_s"]
            break
        time.sleep(args.wait)

    line = json.dumps(bench)
    print(line)
    if args.out:
        with open(os.path.join(REPO, args.out), "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
