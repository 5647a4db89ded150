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
partition/byte counts inside scan metadata, and the partition COUNT on
exchanges that inherit ``spark.sql.shuffle.partitions`` (tagged
ENSURE_REQUIREMENTS, or REPARTITION_BY_COL from a number-less
``repartition(col)``) — the pytest session right-sizes that conf to its
cpu count, so leaving it in made every fingerprint session-dependent.
Counts on REPARTITION_BY_NUM exchanges are deliberately KEPT: those are
explicit code choices (q287's 512-way salt grid), and changing one IS a
plan change a soak row must be re-timed for.
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
    # session-default partition counts (shuffle.partitions follows the
    # session's cpu sizing); explicit REPARTITION_BY_NUM counts are kept
    (re.compile(r", \d+\), ENSURE_REQUIREMENTS"), ", N), ENSURE_REQUIREMENTS"),
    (re.compile(r", \d+\), REPARTITION_BY_COL"), ", N), REPARTITION_BY_COL"),
    (re.compile(r"splits=\d+"), "splits="),  # spark.range default parallelism
    # HOF lambda variables number from a session-global counter
    # (lambda x_1# vs x_2# for the same plan built twice)
    (re.compile(r"lambda ([a-z]+)_\d+"), r"lambda \1_"),
    # common-subexpression aliases (the With/CommonExpressionDef pass,
    # e.g. a null-guarded divisor used twice) also number from a
    # session-global counter: _common_expr_0 in a fresh session,
    # _common_expr_37 mid-suite (q455 flagged only inside the full
    # pytest run)
    (re.compile(r"_common_expr_\d+"), "_common_expr_"),
    # scan DataFilters: Spark truncates the field at
    # maxMetadataStringLength BYTES of the RAW string, and raw length
    # shifts with expression-id digit widths (a session-global counter)
    # - the same plan truncates at different points in different
    # sessions. The predicate semantics survive in Filter nodes and
    # PushedFilters, so drop the field from the fingerprint entirely.
    (re.compile(r"DataFilters: \[.*?(?=, Format:)"), "DataFilters: ["),
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
