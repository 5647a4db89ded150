"""Regenerate ``_DRIVER_PRIORITY`` in queries/__init__.py from the
CORRECTNESS_r*.json history (the round-6 mechanical form of what was
previously hand-curated each round).

Ordering contract: every query the driver has NEVER checked comes first
(ascending query number — oldest registrations wait longest, and the
driver's ~50-per-round cap walks this list in order), then checked
queries stalest-round-first. Run after adding queries or when a new
CORRECTNESS_r{N}.json lands; the script rewrites the list block in place
and prints the next cap block so the round log can name it.

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


def main() -> None:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(f)).group(1))
        for k in json.load(open(f)):
            latest[k] = max(rnd, latest.get(k, 0))

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

    never = sorted((q for q in allq if q not in latest), key=num)
    stale = sorted(
        (q for q in allq if q in latest), key=lambda q: (latest[q], num(q))
    )

    lines = ["_DRIVER_PRIORITY = ["]
    lines.append("    # never driver-checked (oldest numbers first); the driver's")
    lines.append("    # ~50/round cap walks this list in order")
    for q in never:
        lines.append(f'    "{q}",')
    prev = None
    for q in stale:
        if latest[q] != prev:
            lines.append(f"    # latest driver row is r{latest[q]}")
            prev = latest[q]
        lines.append(f'    "{q}",')
    lines.append("]")
    block = "\n".join(lines)

    start = src.index("_DRIVER_PRIORITY = [")
    end = src.index("]", start)
    # the list holds only string literals and comments, so the first ']'
    # after the header closes it
    new = src[:start] + block + src[end + 1 :]

    print(f"{len(allq)} queries; {len(never)} never-checked")
    print("next cap block (first 50):", never[:50][:3], "...", never[49 if len(never) > 49 else -1])
    if "--dry-run" in sys.argv:
        return
    with open(INIT, "w") as f:
        f.write(new)
    print("rewrote", INIT)


if __name__ == "__main__":
    main()
