"""Regenerate ``_DRIVER_PRIORITY`` in queries/__init__.py from the
CORRECTNESS_r*.json history (the round-6 mechanical form of what was
previously hand-curated each round).

Ordering contract (r10 adds the failed tier — VERDICT r9 item 2):
  1. queries whose LATEST official row is FAILED (any of rows/schema/
     hash_match explicitly false, or a non-contract err) — ascending
     query number. A red row is a broken promise; its re-check must not
     wait behind the never-checked drain (q314/q338 would otherwise
     have waited ~3 rounds for their post-fix re-rows).
  2. queries the driver has NEVER checked — ascending query number
     (oldest registrations wait longest; the driver's ~50-per-round cap
     walks this list in order).
  3. checked-green queries, stalest round first.
The q53 rows-only contract (err == 'no_oracle', all match flags None)
counts as green, not failed.

Run after adding queries or when a new CORRECTNESS_r{N}.json lands; the
script rewrites the list block in place and prints the next cap block so
the round log can name it.

Usage: python scripts/regen_priority.py [--dry-run]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
INIT = os.path.join(REPO, "hoops_edge_database_etl_spark", "queries", "__init__.py")


def row_failed(v: dict) -> bool:
    """A driver row is failed iff a match flag is explicitly false or it
    carries a non-contract error (the rows-only 'no_oracle' contract is
    green-by-design)."""
    if any(v.get(k) is False for k in ("rows_match", "schema_match", "hash_match")):
        return True
    err = v.get("err")
    return bool(err) and err != "no_oracle"


def latest_rows() -> dict[str, tuple[int, bool]]:
    """{query: (latest_round, latest_row_failed)} over every artifact."""
    latest: dict[str, tuple[int, bool]] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(f)).group(1))
        for k, v in json.load(open(f)).items():
            if k not in latest or rnd >= latest[k][0]:
                latest[k] = (rnd, row_failed(v) if isinstance(v, dict) else False)
    return latest


def main() -> None:
    latest = latest_rows()

    # Source names from the live registry (registration order), not the
    # file: a freshly registered query must enter the rotation even
    # before anyone lists it by hand.
    sys.path.insert(0, REPO)
    from hoops_edge_database_etl_spark.queries import _load_modules, _QUERIES

    _load_modules()
    allq = list(_QUERIES)
    src = open(INIT).read()

    def num(s: str) -> int:
        return int(re.match(r"q(\d+)", s).group(1))

    failed = sorted((q for q in allq if q in latest and latest[q][1]), key=num)
    never = sorted((q for q in allq if q not in latest), key=num)
    stale = sorted(
        (q for q in allq if q in latest and not latest[q][1]),
        key=lambda q: (latest[q][0], num(q)),
    )

    lines = ["_DRIVER_PRIORITY = ["]
    if failed:
        lines.append("    # latest official row FAILED - re-check before the drain")
        for q in failed:
            lines.append(f'    "{q}",  # red in r{latest[q][0]}')
    lines.append("    # never driver-checked (oldest numbers first); the driver's")
    lines.append("    # ~50/round cap walks this list in order")
    for q in never:
        lines.append(f'    "{q}",')
    prev = None
    for q in stale:
        if latest[q][0] != prev:
            lines.append(f"    # latest driver row is r{latest[q][0]}")
            prev = latest[q][0]
        lines.append(f'    "{q}",')
    lines.append("]")
    block = "\n".join(lines)

    start = src.index("_DRIVER_PRIORITY = [")
    end = src.index("]", start)
    # the list holds only string literals and comments, so the first ']'
    # after the header closes it
    new = src[:start] + block + src[end + 1 :]

    front = failed + never
    print(
        f"{len(allq)} queries; {len(failed)} failed-latest, {len(never)} never-checked"
    )
    print("next cap block (first 50):", front[:3], "...", front[min(49, len(front) - 1)])
    if "--dry-run" in sys.argv:
        return
    with open(INIT, "w") as f:
        f.write(new)
    print("rewrote", INIT)


if __name__ == "__main__":
    main()
