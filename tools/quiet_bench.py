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

Certification requires BOTH gates (r7 verdict finding #3: the ratio gate
alone is blind to SYMMETRIC load — a co-tenant loading all cores equally
slides both probe legs together while the 8->32 ratio still reads ~1.0;
BENCH_quiet_r7b recorded a false `certified: true` at a 1.013 ceiling with
5 s probe tasks vs the 0.44-0.62 s nominal):
  1. relative: the 8->32 pure-CPU ceiling >= --min-ceiling, and
  2. absolute: every probed per-task time <= --abs-factor x its nominal
     (BASELINE.md's probe table, the box's unloaded per-task seconds).
Both gate readings are recorded in the output either way.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Unloaded per-task seconds for the pure-CPU probe kernel at each
# concurrency (BASELINE.md "Host-normalized scaling": 0.442/0.518/0.516/
# 0.583/0.620 at 2/4/8/16/32 processes). The absolute gate certifies only
# when the measured per-task time stays within --abs-factor of these — a
# symmetric co-tenant load inflates these while leaving the 8->32 ratio
# untouched, which is exactly the false-certification mode being closed.
NOMINAL_PER_TASK_S = {"2": 0.442, "4": 0.518, "8": 0.516, "16": 0.583,
                      "32": 0.620}


def abs_gate(per_task_s: dict, factor: float) -> tuple[bool, dict]:
    """(ok, detail): every probed concurrency's per-task seconds must be
    <= factor x its nominal; unknown concurrencies are ignored."""
    detail = {}
    ok = True
    for n, t in per_task_s.items():
        nominal = NOMINAL_PER_TASK_S.get(str(n))
        if nominal is None:
            continue
        limit = round(factor * nominal, 4)
        detail[str(n)] = {"measured": t, "limit": limit}
        if t > limit:
            ok = False
    return ok, detail


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
    ap.add_argument("--abs-factor", type=float, default=1.5,
                    help="absolute gate: probe per-task seconds must stay "
                         "within this factor of the unloaded nominals")
    ap.add_argument("--wait", type=float, default=300.0)
    ap.add_argument("--deadline-s", type=float, default=3600.0)
    ap.add_argument("--fallback", action="store_true",
                    help="run anyway at the deadline, marked certified=false")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    t0 = time.time()
    best = None

    def attach(bench: dict, p: dict, certified: bool) -> None:
        ceiling = p["ceiling_n_to_4n"]["8_to_32"]
        ok_abs, detail = abs_gate(p["per_task_s"], args.abs_factor)
        bench["certified"] = certified
        bench["probe_ceiling_8_to_32"] = ceiling
        bench["probe_per_task_s"] = p["per_task_s"]
        bench["probe_ceiling_ok"] = ceiling >= args.min_ceiling
        bench["probe_abs_ok"] = ok_abs
        bench["probe_abs_gate"] = detail

    while True:
        p = probe()
        ceiling = p["ceiling_n_to_4n"]["8_to_32"]
        ok_abs, _ = abs_gate(p["per_task_s"], args.abs_factor)
        if best is None or ceiling > best["ceiling_n_to_4n"]["8_to_32"]:
            best = p
        print(f"probe: 8->32 ceiling {ceiling}, abs gate "
              f"{'ok' if ok_abs else 'LOADED'} "
              f"(gates {args.min_ceiling} / {args.abs_factor}x nominal, "
              f"elapsed {time.time()-t0:.0f}s)",
              file=sys.stderr)
        if ceiling >= args.min_ceiling and ok_abs:
            bench = run_bench()
            attach(bench, p, certified=True)
            break
        if time.time() - t0 + args.wait > args.deadline_s:
            if not args.fallback:
                print("no certified-quiet window before deadline; "
                      "rerun with --fallback to record the loaded venue",
                      file=sys.stderr)
                return 1
            bench = run_bench()
            attach(bench, best, certified=False)
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
