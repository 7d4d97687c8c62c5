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

If SCALING_PROBES.jsonl exists (tools/probe_sample.py — timestamped runs of
the pure-CPU host-ceiling kernel), each pairing additionally gets the
ceiling measured by the probe nearest in time to the pairing's midpoint
(within PROBE_GAP seconds), and the report adds:

  - median_norm_eff / quietest_norm_eff: engine efficiency divided by that
    same-window ceiling — "fraction of what ANY embarrassingly-parallel job
    could have achieved on this box in that window".  This is the
    per-window version of BASELINE.md's host normalization; values ~1.0
    mean the residual is the host, not the engine.
  - quiet-subset rows (n_quiet_pairs / quiet_median_eff /
    quiet_median_norm_eff): the same statistics restricted to pairings
    whose same-window probe ceiling is >= QUIET_CEILING (default 0.8 —
    the host was near-nominal in that window).  Raw efficiency measured in
    quiet windows is the number comparable to a dedicated cluster; it is
    also what makes the campaign robust to foreground work on this box,
    which lowers the ceiling in exactly the windows it pollutes.

Usage: python tools/scaling_windows.py  (writes SCALING_WINDOWS.json)
"""

from __future__ import annotations

import json
import os
import statistics

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PAIRS = ((2, 8), (4, 16), (8, 32))
MAX_GAP = float(os.environ.get("SCALING_WINDOW_GAP", "1200"))
PROBE_GAP = float(os.environ.get("SCALING_PROBE_GAP", "1800"))
QUIET_CEILING = float(os.environ.get("SCALING_QUIET_CEILING", "0.8"))


def load_probes() -> list[tuple[float, dict]]:
    """[(ts, {"8_to_32": ceiling, ...}), ...] from SCALING_PROBES.jsonl."""
    path = os.path.join(REPO, "SCALING_PROBES.jsonl")
    if not os.path.exists(path):
        return []
    probes = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            probes.append((float(rec["ts"]), rec.get("ceiling_n_to_4n", {})))
    return probes


def nearest_ceiling(
    probes: list[tuple[float, dict]], key: str, ts: float
) -> float | None:
    best = None
    for pts, ceil in probes:
        if key not in ceil or abs(pts - ts) > PROBE_GAP:
            continue
        if best is None or abs(pts - ts) < abs(best[0] - ts):
            best = (pts, ceil[key])
    return best[1] if best else None


def analyze(path: str, probes: list[tuple[float, dict]]) -> dict | None:
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
        row = {
            "n_pairs": len(pairings),
            "median_eff": round(statistics.median(effs), 3),
            "quietest_eff": round(quiet[0] / (4.0 * quiet[1]), 3),
            "quietest_walls_s": [quiet[0], quiet[1]],
            "merged_min_eff": merged,
        }
        # Same-window host-ceiling normalization (see module docstring).
        # Each pairing needs its own timestamp to find the nearest probe;
        # recompute pairings keeping the midpoint ts.
        key = f"{a}_to_{b}"
        norm = []
        for wa, ta in sa:
            for wb, tb in sb:
                if abs(ta - tb) > MAX_GAP:
                    continue
                ceil = nearest_ceiling(probes, key, (ta + tb) / 2.0)
                if ceil and ceil > 0:
                    norm.append((wa / (4.0 * wb) / ceil, wa, wb, ceil))
        if norm:
            nquiet = min(norm, key=lambda p: p[1] / med_a + p[2] / med_b)
            row["n_pairs_with_probe"] = len(norm)
            row["median_norm_eff"] = round(
                statistics.median(e for e, _, _, _ in norm), 3
            )
            row["quietest_norm_eff"] = round(nquiet[0], 3)
            quiet_sub = [p for p in norm if p[3] >= QUIET_CEILING]
            row["quiet_ceiling_threshold"] = QUIET_CEILING
            row["n_quiet_pairs"] = len(quiet_sub)
            if quiet_sub:
                row["quiet_median_eff"] = round(
                    statistics.median(e * c for e, _, _, c in quiet_sub), 3
                )
                row["quiet_median_norm_eff"] = round(
                    statistics.median(e for e, _, _, _ in quiet_sub), 3
                )
        out["pairs"][key] = row
    return out


def main() -> None:
    probes = load_probes()
    result = {
        k: v
        for k, v in {
            "sf0.1": analyze(os.path.join(REPO, "SCALING.json"), probes),
            "big6": analyze(os.path.join(REPO, "SCALING_BIG.json"), probes),
            "big24": analyze(os.path.join(REPO, "SCALING_BIG24.json"), probes),
        }.items()
        if v is not None
    }
    if probes:
        result["n_probes"] = len(probes)
    with open(os.path.join(REPO, "SCALING_WINDOWS.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
