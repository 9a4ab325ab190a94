"""Mechanize the driver-window rotation invariant (r7 verdict item #2).

The driver's correctness gate checks the first 50 ``queries()`` entries
each round; ``__spark_entry__._VALIDATE_FIRST`` hand-orders the catalog so
that window lands on the right entries. Before this test, the invariant
("never-driver-checked entries occupy the window front; no entry's last
driver row falls outside the rotation horizon") lived in a comment — one
mis-ordered edit would silently waste driver slots. These tests parse the
committed ``CORRECTNESS_r*.json`` history and fail the suite instead.
"""

from __future__ import annotations

import json
import math
import re
from pathlib import Path

import pytest

import __spark_entry__ as entry_mod

REPO = Path(__file__).resolve().parent.parent
WINDOW = 50  # driver checks the first 50 queries() entries


def _history() -> dict[int, dict]:
    """round number -> parsed CORRECTNESS_r{N}.json."""
    out = {}
    for p in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if not m:
            continue
        out[int(m.group(1))] = json.loads(p.read_text())
    return out


def _is_green(row: dict) -> bool:
    """A driver row counts as green if the full compare passed, or if the
    entry is rows-only by design (no oracle) and the Spark side produced
    a row count. A red row is 'checked' but does not reset the horizon."""
    if row.get("rows_match") is True:
        return bool(row.get("schema_match")) and bool(row.get("hash_match"))
    return row.get("err") == "no_oracle" and row.get("spark_rows") is not None


@pytest.fixture(scope="module")
def state():
    hist = _history()
    assert hist, "no CORRECTNESS_r*.json committed — cannot audit rotation"
    order = list(entry_mod.queries())
    checked: set[str] = set()
    last_green: dict[str, int] = {}
    for rnd in sorted(hist):
        for name, row in hist[rnd].items():
            checked.add(name)
            if _is_green(row):
                last_green[name] = max(last_green.get(name, 0), rnd)
    return {
        "order": order,
        "checked": checked,
        "last_green": last_green,
        "upcoming": max(hist) + 1,
    }


def test_validate_first_is_complete_and_unique(state):
    vf = entry_mod._VALIDATE_FIRST
    assert len(vf) == len(set(vf)), "duplicate entry in _VALIDATE_FIRST"
    assert set(vf) == set(state["order"]), (
        "_VALIDATE_FIRST must list every catalog entry exactly once"
    )


def test_never_checked_entries_sort_before_checked(state):
    """Rotation priority rule 2: an entry with no driver row in any
    committed CORRECTNESS file must sort before every entry that has one
    — otherwise a driver slot re-verifies a known row while an unknown
    one stays unknown."""
    order, checked = state["order"], state["checked"]
    first_checked = next(
        (i for i, name in enumerate(order) if name in checked), len(order)
    )
    misordered = [n for n in order[first_checked:] if n not in checked]
    assert not misordered, (
        f"never-driver-checked entries sorted after checked ones: {misordered}"
    )


def test_horizon_holds(state):
    """Every entry's effective driver round (its scheduled upcoming round
    if it sits in the next window, else its last green row) must fall
    within the rotation horizon ceil(catalog/window) of the upcoming
    round. A never-checked entry outside the upcoming window always
    fails: it has no effective round at all."""
    order, last_green = state["order"], state["last_green"]
    upcoming = state["upcoming"]
    horizon = math.ceil(len(order) / WINDOW)
    window = set(order[:WINDOW])
    floor_round = upcoming - horizon + 1
    stale = []
    for name in order:
        eff = upcoming if name in window else last_green.get(name)
        if eff is None or eff < floor_round:
            stale.append((name, eff))
    assert not stale, (
        f"entries outside the {horizon}-round horizon (need round >= "
        f"{floor_round}, or a slot in the upcoming window): {stale}"
    )
