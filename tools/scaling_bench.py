"""N→4N scaling-efficiency evidence (BASELINE.json north rule).

Runs bench.py at two parallelism pairs on the SAME input and reports
throughput + efficiency = (thr_4N / thr_N) / 4 for each:

  - local[2] vs local[8]   (primary): measures the engine's scaling — at
    these widths the single-socket sandbox's DRAM bandwidth is not saturated,
    which is the regime a real N→4N *executor* scale-up lives in (4N executors
    bring 4N memory buses; this box has one).
  - local[8] vs local[32]  (reported too): the full-box pair; its efficiency
    is capped by the measured ~1.25× memory-bandwidth CPU inflation at 32
    concurrent numpy workers on one socket (see SCALE.md).

Throughput uses the WARM extraction wall (bench.py's extract_pipeline key);
BLAS is pinned to 1 thread so Spark task parallelism is the only parallelism
(multi-threaded BLAS escapes the local[N] core budget and falsifies N).

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
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cores),
        OMP_NUM_THREADS="1",
        OPENBLAS_NUM_THREADS="1",
        MKL_NUM_THREADS="1",
    )
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
    runs = {n: run_bench(sf_dir, n) for n in (2, 8, 32)}
    docs = runs[8]["docs"]

    def thr(n):
        return docs / runs[n]["queries"]["extract_pipeline"]

    result = {
        "sf_dir": sf_dir,
        "docs": docs,
        "runs": {
            f"local[{n}]": {
                "warm_wall_s": runs[n]["queries"]["extract_pipeline"],
                "cold_wall_s": runs[n]["queries"]["extract_pipeline_cold"],
                "docs_per_sec": round(thr(n), 2),
                "suite_s": runs[n]["value"],
            }
            for n in (2, 8, 32)
        },
        "efficiency_2_to_8": round((thr(8) / thr(2)) / 4.0, 3),
        "efficiency_8_to_32": round((thr(32) / thr(8)) / 4.0, 3),
    }
    print(json.dumps(result, indent=2))

    rows = []
    for n in (2, 8, 32):
        eff = (
            "—"
            if n == 2
            else str(result["efficiency_2_to_8"])
            if n == 8
            else str(result["efficiency_8_to_32"])
        )
        rows.append(
            f"| extract_pipeline @ {os.path.basename(sf_dir)} (warm) | local[{n}] | {docs} | "
            f"{runs[n]['queries']['extract_pipeline']} | {round(thr(n), 2)} | {eff} |"
        )
    table = (
        "| run | parallelism | docs | wall s | docs/s | efficiency |\n"
        "|---|---|---|---|---|---|\n" + "\n".join(rows) + "\n"
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
