"""Registry-rotation properties (pure Python — no Spark session).

The external driver hash-checks only the first DRIVER_CAP entries of
``queries()`` per round. The registry holds more than that, so ``queries()``
orders itself least-recently-driver-checked-first from the committed
CORRECTNESS_r{N}.json artifacts. These tests pin the guarantees the rotation
exists for:

1. every registry row is covered by (this round's first DRIVER_CAP entries)
   ∪ (the latest committed artifact) — i.e. the union of two consecutive
   driver artifacts always covers the whole registry;
2. never-driver-checked rows sort first (new work is always checked the
   round it lands);
3. the ordering is a permutation of the base registry (nothing dropped or
   duplicated) and every name has both a query and, where claimed, an oracle.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as E  # noqa: E402

DRIVER_CAP = 50


def _latest_artifact() -> tuple[int, set[str]]:
    best_round, best_names = -1, set()
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        if rnd > best_round:
            with open(path) as f:
                best_round, best_names = rnd, set(json.load(f))
    return best_round, best_names


def test_rotation_is_permutation_of_base():
    base = E._base_queries()
    rotated = E.queries()
    assert list(sorted(rotated)) == list(sorted(base))
    assert len(rotated) == len(base)


def test_two_round_union_covers_registry():
    rnd, prev_checked = _latest_artifact()
    assert rnd > 0, "no committed CORRECTNESS artifact found"
    names = list(E.queries())
    this_round_window = set(names[:DRIVER_CAP])
    uncovered = set(names) - this_round_window - prev_checked
    assert not uncovered, (
        f"rows outside both the round-{rnd} artifact and the next driver "
        f"window: {sorted(uncovered)}"
    )


def test_never_checked_rows_lead():
    last = E._driver_checked_rounds()
    names = list(E.queries())
    seen_checked = False
    for n in names:
        if n in last:
            seen_checked = True
        else:
            assert not seen_checked, (
                f"never-driver-checked row {n!r} sorts after a checked row"
            )


def test_checked_rows_ordered_by_recency():
    last = E._driver_checked_rounds()
    rounds = [last[n] for n in E.queries() if n in last]
    assert rounds == sorted(rounds)
