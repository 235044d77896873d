"""Machine-enforced registry-rotation contract (VERDICT r8 item 10).

The external driver's correctness harness checks only the FIRST 50
entries of ``queries()`` each round.  The repo's staleness contract
says: *no registry entry's newest driver-green row may age past two
rounds*.  Rounds 6-8 each left a manual-rotation backlog; this test
makes the contract red BEFORE the driver runs, by simulating the
upcoming round's 50-entry window against the committed
``CORRECTNESS_r*.json`` history.

No Spark session needed — pure file parsing.
"""
from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
DRIVER_WINDOW = 50
MAX_AGE_ROUNDS = 2


def _registry_order() -> list[str]:
    # Parse statically: importing __spark_entry__ needs no Spark, but
    # parsing keeps this test runnable even in a broken-import tree.
    src = (REPO / "__spark_entry__.py").read_text()
    m = re.search(r"def queries\(\).*?return \{(.*?)\n    \}\n", src, re.S)
    assert m, "queries() registry dict not found"
    keys = re.findall(r'"([a-z0-9_]+)":\s*q_', m.group(1))
    assert len(keys) == len(set(keys)), "duplicate registry keys"
    return keys


def _driver_check_history() -> dict[str, int]:
    """entry -> newest round in which the driver recorded ANY row for
    it (green or rows-only sketch row; an `err` row other than
    no_oracle does not count as checked)."""
    newest: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path.name).group(1))
        data = json.loads(path.read_text())
        for key, row in data.items():
            checked = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
            ) or row.get("err") == "no_oracle"
            if checked:
                newest[key] = max(newest.get(key, 0), rnd)
    return newest


def test_no_entry_ages_past_two_rounds():
    keys = _registry_order()
    newest = _driver_check_history()
    rounds = [
        int(re.search(r"r(\d+)", p.name).group(1))
        for p in REPO.glob("CORRECTNESS_r*.json")
    ]
    assert rounds, "no CORRECTNESS_r*.json committed"
    upcoming = max(rounds) + 1  # the round whose driver run we gate

    window = set(keys[:DRIVER_WINDOW])
    violations = []
    for key in keys:
        # Simulate this round's driver run: in-window entries get a
        # fresh row at `upcoming`; the rest keep their newest row.
        after = upcoming if key in window else newest.get(key)
        if after is None:
            violations.append(f"{key}: never driver-checked and not in "
                              f"the first {DRIVER_WINDOW} entries")
        elif upcoming - after > MAX_AGE_ROUNDS:
            violations.append(
                f"{key}: newest driver row r{after} would be "
                f"{upcoming - after} rounds old after r{upcoming} "
                f"and it is not in the window")
    assert not violations, (
        f"{len(violations)} staleness-contract violations — reorder "
        f"queries() so these rotate into the first {DRIVER_WINDOW}:\n"
        + "\n".join(violations)
    )


def test_registry_capacity_headroom():
    """Structural ceiling (VERDICT r10 item 4): with a 50-entry driver
    window and a ≤2-round staleness limit, every entry must be driver-
    checked at least once every 3 rounds, so the rotation capacity is
    3 × 50 = 150 entries.  At 150 the contract becomes mathematically
    infeasible the moment any cohort bunches up; pin the registry at
    ≤144 so there are always ≥6 slack slots for new operators without
    an immediate same-round rotation squeeze.  Before adding entries
    past the cap, retire or merge redundant formulation variants."""
    keys = _registry_order()
    cap = 3 * DRIVER_WINDOW - 6
    assert len(keys) <= cap, (
        f"registry has {len(keys)} entries; capacity cap is {cap} "
        f"(3×{DRIVER_WINDOW} window minus 6 slack slots) — retire or "
        f"merge formulation variants before adding more")


def test_window_is_at_capacity_or_all_fresh():
    """The window should never waste slots: if any entry is at the
    two-round limit (or never checked), the first 50 must be filled
    with the stalest entries first.  Weaker sanity form: every entry
    OUTSIDE the window is at most at the limit (checked within the
    last MAX_AGE_ROUNDS rounds as of the upcoming round)."""
    keys = _registry_order()
    newest = _driver_check_history()
    upcoming = max(
        int(re.search(r"r(\d+)", p.name).group(1))
        for p in REPO.glob("CORRECTNESS_r*.json")
    ) + 1
    outside = keys[DRIVER_WINDOW:]
    stale_outside = [
        k for k in outside
        if newest.get(k) is None or upcoming - newest[k] > MAX_AGE_ROUNDS
    ]
    assert not stale_outside, stale_outside
