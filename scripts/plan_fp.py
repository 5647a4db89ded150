"""Stable fingerprint of a DataFrame's physical plan (VERDICT r8 item 3).

Why: a soak row is a measurement OF A PLAN — q287's SOAK_r07 row (1.9 s)
silently predated the band-join rewrite and hid a 46-second regression
because nothing tied the row to the plan it timed. Each soak row now
records ``plan_fp`` at the soak's small scale factor, and
tests/test_soak_artifact.py recomputes the current fingerprint: a row
whose plan has since changed fails mechanically and must be re-timed
(or moved to the artifact's ``plan_change_recheck`` section with fresh
timings).

The fingerprint hashes the PRE-EXECUTION physical plan string (planning
only — cheap, no job runs; with AQE this is the initial plan, which is
exactly the part code changes move) with session-varying tokens
scrubbed: expression ids, codegen stage numbers, plan ids, file paths,
partition/byte counts inside scan metadata.
"""

from __future__ import annotations

import hashlib
import re

_SCRUB = [
    (re.compile(r"#\d+[L]?"), "#"),          # expression ids
    (re.compile(r"plan_id=\d+"), "plan_id="),
    (re.compile(r"\[id=#?\d*\]"), ""),
    (re.compile(r"\*\(\d+\)"), "*"),         # whole-stage codegen stage no.
    (re.compile(r"isFinalPlan=\w+"), ""),
    (re.compile(r"file:[^\s,\]\)]*"), "file:"),
    (re.compile(r"\d+ paths?"), "paths"),
    (re.compile(r"subquery\d*", re.IGNORECASE), "subquery"),
    (re.compile(r"cte\d*", re.IGNORECASE), "cte"),
    (re.compile(r"exchange\d+", re.IGNORECASE), "exchange"),
    (re.compile(r"Statistics\([^)]*\)"), ""),
    (re.compile(r"size=\d+[^,\]\)]*"), "size="),
    (re.compile(r"rowCount=\d+"), "rowCount="),
    (re.compile(r"\s+"), " "),
]


def normalize_plan(plan: str) -> str:
    for pat, repl in _SCRUB:
        plan = pat.sub(repl, plan)
    return plan.strip()


def plan_fingerprint(df) -> str:
    """12-hex-char fingerprint of the normalized pre-execution physical
    plan. Planning only — does not run a job."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return hashlib.md5(normalize_plan(plan).encode()).hexdigest()[:12]
