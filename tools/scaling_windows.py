"""Paired same-window N→4N efficiency from timestamped scaling samples.

Merged per-leg MINIMA (scaling_bench.py / scaling_big.py) are a lower bound
on true efficiency whenever the legs converge unevenly — one leg catching a
quiet host window that the other never saw biases the ratio down. With the
host modeled as wall(t) = engine_wall / capacity(t) and capacity shared by
all cores, the ratio of two legs measured in the SAME window cancels
capacity(t) — so paired same-window samples are the unbiased estimator.

This reads the `samples` arrays ([wall_s, unix_ts]) that both scaling tools
now record, forms all cross-leg pairs measured within MAX_GAP seconds of
each other (one round-robin round), and reports per N→4N pair:

  - n_pairs: how many same-window pairings exist
  - median_eff: the robust central estimate over pairings
  - quietest_eff: efficiency at the LEAST-CONTENDED pairing (min sum of
    walls normalized by each leg's own median) — "what the engine does on a
    quiet host", the number comparable to a real cluster
  - merged_min_eff: the lower-bound estimator, for contrast

Usage: python tools/scaling_windows.py  (writes SCALING_WINDOWS.json)
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAIRS = ((2, 8), (4, 16), (8, 32))
MAX_GAP = float(os.environ.get("SCALING_WINDOW_GAP", "1200"))


def analyze(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    data = json.load(open(path))
    runs = data.get("runs", {})
    out = {"source": os.path.basename(path), "max_gap_s": MAX_GAP, "pairs": {}}
    for a, b in PAIRS:
        sa = runs.get(f"local[{a}]", {}).get("samples", [])
        sb = runs.get(f"local[{b}]", {}).get("samples", [])
        wa_all = runs.get(f"local[{a}]", {}).get("all_warm_walls_s", [])
        wb_all = runs.get(f"local[{b}]", {}).get("all_warm_walls_s", [])
        merged = (
            round(min(wa_all) / (4.0 * min(wb_all)), 3)
            if wa_all and wb_all
            else None
        )
        if not sa or not sb:
            if merged is not None:
                out["pairs"][f"{a}_to_{b}"] = {
                    "n_pairs": 0,
                    "merged_min_eff": merged,
                    "note": "no timestamped samples yet for one leg",
                }
            continue
        med_a = statistics.median(w for w, _ in sa)
        med_b = statistics.median(w for w, _ in sb)
        pairings = [
            (wa, wb, abs(ta - tb))
            for wa, ta in sa
            for wb, tb in sb
            if abs(ta - tb) <= MAX_GAP
        ]
        if not pairings:
            out["pairs"][f"{a}_to_{b}"] = {
                "n_pairs": 0,
                "merged_min_eff": merged,
                "note": f"no samples within {MAX_GAP:.0f}s of each other",
            }
            continue
        effs = [wa / (4.0 * wb) for wa, wb, _ in pairings]
        quiet = min(pairings, key=lambda p: p[0] / med_a + p[1] / med_b)
        out["pairs"][f"{a}_to_{b}"] = {
            "n_pairs": len(pairings),
            "median_eff": round(statistics.median(effs), 3),
            "quietest_eff": round(quiet[0] / (4.0 * quiet[1]), 3),
            "quietest_walls_s": [quiet[0], quiet[1]],
            "merged_min_eff": merged,
        }
    return out


def main() -> None:
    result = {
        k: v
        for k, v in {
            "sf0.1": analyze(os.path.join(REPO, "SCALING.json")),
            "big6": analyze(os.path.join(REPO, "SCALING_BIG.json")),
        }.items()
        if v is not None
    }
    with open(os.path.join(REPO, "SCALING_WINDOWS.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
