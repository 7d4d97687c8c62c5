"""Unit tests for the scaling-evidence estimators (pure python, no Spark).

The shared-host capacity model is wall(t) = engine_wall / capacity(t) with
capacity common to every core count. The paired same-window estimator must
cancel capacity(t) exactly; merged per-leg minima must show their known
bias when one leg samples a quiet window the other never saw; and the
probe normalization must divide by the ceiling measured nearest in time.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "scaling_windows", os.path.join(REPO, "tools", "scaling_windows.py")
)
SW = importlib.util.module_from_spec(spec)
spec.loader.exec_module(SW)

ENGINE_EFF = 0.9  # ground truth: local[32] is 4 * 0.9 faster than local[8]


def _samples(wall_8: float, caps: list[tuple[float, float]]):
    """[(capacity, ts)] -> per-leg [wall, ts] under the capacity model."""
    a = [[round(wall_8 / c, 3), t] for c, t in caps]
    b = [[round(wall_8 / (4 * ENGINE_EFF) / c, 3), t + 30] for c, t in caps]
    return a, b


def _write(tmp_path, a, b):
    runs = {
        "local[8]": {"samples": a, "all_warm_walls_s": [w for w, _ in a]},
        "local[32]": {"samples": b, "all_warm_walls_s": [w for w, _ in b]},
    }
    p = tmp_path / "SCALING_test.json"
    p.write_text(json.dumps({"runs": runs}))
    return str(p)


def test_paired_estimator_cancels_host_capacity(tmp_path):
    # capacity swings 2.5x across windows — walls swing with it, but every
    # same-window pair recovers the true engine efficiency exactly
    caps = [(1.0, 0.0), (0.4, 5000.0), (0.7, 10000.0)]
    a, b = _samples(20.0, caps)
    out = SW.analyze(_write(tmp_path, a, b), probes=[])
    pair = out["pairs"]["8_to_32"]
    assert pair["n_pairs"] == 3  # only same-window pairs are within MAX_GAP
    assert abs(pair["median_eff"] - ENGINE_EFF) < 0.01
    assert abs(pair["quietest_eff"] - ENGINE_EFF) < 0.01


def test_merged_min_underestimates_when_small_leg_gets_quiet_window(tmp_path):
    # the local[8] leg alone catches a quiet (capacity 1.0) window; the
    # local[32] leg only ever ran loaded (capacity 0.5): merged minima pair
    # a quiet numerator with a loaded denominator and read ~half the truth,
    # while the loaded-window PAIR still reads it exactly
    a_quiet = [[20.0, 0.0]]  # capacity 1.0, never seen by the 32 leg
    a_loaded, b_loaded = _samples(20.0, [(0.5, 50000.0)])
    out = SW.analyze(
        _write(tmp_path, a_quiet + a_loaded, b_loaded), probes=[]
    )
    pair = out["pairs"]["8_to_32"]
    assert pair["merged_min_eff"] < 0.55 * ENGINE_EFF  # biased low
    assert abs(pair["median_eff"] - ENGINE_EFF) < 0.01  # pairing immune


def test_probe_normalization_uses_nearest_in_window_ceiling(tmp_path):
    # raw paired efficiency 0.9 * ceiling; dividing by the probe's ceiling
    # measured in the same window must recover the engine's 0.9
    ceiling = 0.8
    a = [[20.0, 1000.0]]
    b = [[round(20.0 / (4 * ENGINE_EFF * ceiling), 4), 1030.0]]
    probes = [
        (1015.0, {"8_to_32": ceiling}),
        (990000.0, {"8_to_32": 0.1}),  # far outside PROBE_GAP — ignored
    ]
    out = SW.analyze(_write(tmp_path, a, b), probes=probes)
    pair = out["pairs"]["8_to_32"]
    assert pair["n_pairs_with_probe"] == 1
    assert abs(pair["quietest_norm_eff"] - ENGINE_EFF) < 0.01
    assert abs(pair["median_eff"] - ENGINE_EFF * ceiling) < 0.01


def test_quiet_subset_excludes_low_ceiling_windows(tmp_path):
    # two windows: one quiet (ceiling 0.9) where the engine reads its true
    # raw efficiency against that ceiling, one polluted (ceiling 0.5, e.g.
    # foreground work on the box).  The quiet-subset stats must keep ONLY
    # the quiet window, so quiet_median_eff reads the quiet window's raw
    # value and is immune to pollution that drags the all-pairs median down
    quiet_ceil, loud_ceil = 0.9, 0.5
    a = [[20.0, 1000.0], [20.0, 50000.0]]
    b = [
        [round(20.0 / (4 * ENGINE_EFF * quiet_ceil), 4), 1030.0],
        [round(20.0 / (4 * ENGINE_EFF * loud_ceil), 4), 50030.0],
    ]
    probes = [
        (1015.0, {"8_to_32": quiet_ceil}),
        (50015.0, {"8_to_32": loud_ceil}),
    ]
    out = SW.analyze(_write(tmp_path, a, b), probes=probes)
    pair = out["pairs"]["8_to_32"]
    assert pair["n_pairs_with_probe"] == 2
    assert pair["n_quiet_pairs"] == 1  # only the ceiling>=0.8 window
    assert abs(pair["quiet_median_eff"] - ENGINE_EFF * quiet_ceil) < 0.01
    assert abs(pair["quiet_median_norm_eff"] - ENGINE_EFF) < 0.01
    # all-pairs median straddles both windows — strictly below the quiet raw
    assert pair["median_eff"] < pair["quiet_median_eff"]


def test_far_apart_samples_never_pair(tmp_path):
    a = [[20.0, 0.0]]
    b = [[6.0, SW.MAX_GAP + 1.0]]
    out = SW.analyze(_write(tmp_path, a, b), probes=[])
    assert out["pairs"]["8_to_32"]["n_pairs"] == 0
