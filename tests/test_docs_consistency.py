"""docs/OPERATORS.md must list every queries() entry with the right check
mark: ✓O iff the entry has a DuckDB oracle. Catches the stale-docs drift
the round-4 review flagged."""

import re
from pathlib import Path

from steampipe_plugin_terraform_spark.catalog import ORACLES, QUERIES

DOC = Path(__file__).resolve().parents[1] / "docs" / "OPERATORS.md"


def test_operators_md_lists_every_entry_with_correct_mark():
    rows = dict(
        re.findall(r"^\| `([a-z0-9_]+)` \| (✓O|✓R) \|", DOC.read_text(), re.M)
    )
    missing = sorted(set(QUERIES) - set(rows))
    stale = sorted(set(rows) - set(QUERIES))
    assert not missing, f"entries missing from docs/OPERATORS.md: {missing}"
    assert not stale, f"docs/OPERATORS.md rows for removed entries: {stale}"
    wrong = sorted(
        n for n, mark in rows.items() if (mark == "✓O") != (n in ORACLES)
    )
    assert not wrong, f"check mark disagrees with oracle presence: {wrong}"
