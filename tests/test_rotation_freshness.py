"""ROTATION.md staleness guard (r11 verdict ask #7).

The ledger is GENERATED from the committed CORRECTNESS artifacts, and
the driver commits round N's artifact only after round N closes — so
at judge time the committed ROTATION.md can lag the newest artifact by
at most ONE round (the regeneration ritual in
scripts/rotation_ledger.py closes the gap first thing next round).
Lagging by more than one round means a whole round forgot the ritual —
exactly the drift class the r11 verdict flagged (`ROTATION.md is one
round stale ... header says r10` while r11 rows existed)."""

from __future__ import annotations

import glob
import os
import re

REPO = os.path.join(os.path.dirname(__file__), "..")


def _max_artifact_round() -> int:
    rounds = [
        int(re.search(r"r(\d+)\.json$", p).group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    ]
    assert rounds, "no CORRECTNESS artifacts committed"
    return max(rounds)


def test_rotation_md_is_at_most_one_round_stale():
    with open(os.path.join(REPO, "ROTATION.md")) as f:
        head = f.read(600)
    m = re.search(r"latest driver round seen: r(\d+)", head)
    assert m, "ROTATION.md lost its generated header"
    ledger_round = int(m.group(1))
    newest = _max_artifact_round()
    assert ledger_round >= newest - 1, (
        f"ROTATION.md was generated from r{ledger_round} artifacts but "
        f"r{newest} is committed — run "
        f"`python scripts/rotation_ledger.py --write` (the round-start "
        f"ritual) and commit the result"
    )


def test_rotation_md_registry_size_matches_live_registry():
    """The committed ledger must describe the registry shape it claims
    to — a registry that grew without regenerating the ledger is the
    same drift class."""
    import __spark_entry__ as entrymod

    with open(os.path.join(REPO, "ROTATION.md")) as f:
        head = f.read(600)
    m = re.search(r"registry size:\s*(\d+)", head)
    assert m, "ROTATION.md lost its registry-size header"
    assert int(m.group(1)) == len(entrymod.queries()), (
        "registry changed since ROTATION.md was generated — run "
        "`python scripts/rotation_ledger.py --write`"
    )
