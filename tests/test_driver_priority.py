"""Staleness self-check for ``_DRIVER_PRIORITY`` (VERDICT r8 item 2).

Two consecutive rounds started with the list still fronting the PREVIOUS
round's now-official block, because the regen can only happen after the
driver drops CORRECTNESS_r{N}.json — which lands after the builder's
last commit. This test recomputes the expected ordering contract from
the artifacts actually on disk and fails loudly the moment a new one
lands, so the round CANNOT proceed without `scripts/regen_priority.py`.

No Spark session needed — pure registry + JSON.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _officially_checked() -> set[str]:
    names: set[str] = set()
    for f in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        names |= set(json.load(open(f)))
    return names


def _priority_and_registry():
    from hoops_edge_database_etl_spark.queries import (
        _DRIVER_PRIORITY,
        _load_modules,
        _QUERIES,
    )

    _load_modules()
    return list(_DRIVER_PRIORITY), set(_QUERIES)


def test_priority_covers_registry_exactly():
    prio, registry = _priority_and_registry()
    assert set(prio) == registry, (
        "every registered query must appear in _DRIVER_PRIORITY exactly "
        "once (run scripts/regen_priority.py after registering queries)"
    )
    assert len(prio) == len(set(prio)), "_DRIVER_PRIORITY has duplicates"


def test_priority_fronts_never_checked_block():
    """The driver walks ~50 entries per round: every query WITHOUT an
    official CORRECTNESS row must come before every query WITH one,
    else the round re-checks green queries and drains nothing."""
    prio, _ = _priority_and_registry()
    checked = _officially_checked()
    never = [q for q in prio if q not in checked]
    stale_in_front = [q for q in prio[: len(never)] if q in checked]
    assert not stale_in_front, (
        f"_DRIVER_PRIORITY is STALE: {len(stale_in_front)} already-official "
        f"queries (e.g. {stale_in_front[:3]}) sit ahead of "
        f"{len(never)} never-checked ones - run scripts/regen_priority.py "
        "before anything else this round"
    )


def test_priority_never_block_is_ascending():
    """Within the never-checked block the regen contract is ascending
    query number (oldest registrations wait longest)."""
    prio, _ = _priority_and_registry()
    checked = _officially_checked()
    nums = [
        int(re.match(r"q(\d+)", q).group(1)) for q in prio if q not in checked
    ]
    assert nums == sorted(nums), (
        "never-checked block is not in ascending query-number order - "
        "run scripts/regen_priority.py"
    )
