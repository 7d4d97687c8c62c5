"""N→4N scaling-efficiency evidence (BASELINE.json north rule).

Runs bench.py twice — local[8] and local[32] — on the SAME input, reports
throughput at both and efficiency = (thr_32 / thr_8) / 4, and rewrites the
bench table in BASELINE.md. The corpus is pre-built (cached) so the measured
work is the pipeline, not fixture generation.

Usage: python tools/scaling_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(sf_dir: str, cores: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cores))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    r8 = run_bench(sf_dir, 8)
    r32 = run_bench(sf_dir, 32)
    thr8 = r8["docs"] / r8["queries"]["extract_pipeline"]
    thr32 = r32["docs"] / r32["queries"]["extract_pipeline"]
    eff = (thr32 / thr8) / 4.0
    result = {
        "sf_dir": sf_dir,
        "docs": r8["docs"],
        "local8": {"wall_s": r8["queries"]["extract_pipeline"], "docs_per_sec": round(thr8, 2)},
        "local32": {"wall_s": r32["queries"]["extract_pipeline"], "docs_per_sec": round(thr32, 2)},
        "scaling_efficiency": round(eff, 3),
        "suite_s_local8": r8["value"],
        "suite_s_local32": r32["value"],
    }
    print(json.dumps(result, indent=2))

    table = (
        "| run | parallelism | docs | wall s | docs/s | efficiency |\n"
        "|---|---|---|---|---|---|\n"
        f"| extract_pipeline @ {os.path.basename(sf_dir)} | local[8] | {r8['docs']} | "
        f"{r8['queries']['extract_pipeline']} | {round(thr8,2)} | — |\n"
        f"| extract_pipeline @ {os.path.basename(sf_dir)} | local[32] | {r32['docs']} | "
        f"{r32['queries']['extract_pipeline']} | {round(thr32,2)} | {round(eff,3)} |\n"
    )
    baseline = os.path.join(REPO, "BASELINE.md")
    text = open(baseline).read()
    text = re.sub(
        r"\| run \| parallelism \| docs \| wall s \| docs/s \| efficiency \|\n"
        r"(\|[^\n]*\|\n)+",
        table,
        text,
    )
    open(baseline, "w").write(text)
    with open(os.path.join(REPO, "SCALING.json"), "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
