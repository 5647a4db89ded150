"""Expression-compiled text classification (SURVEY.md §2.8 F1/F2).

The reference classifies play-by-play rows with Python ``re.search`` loops
over YAML pattern lists (pbp_stats.py:10-15, 76-110;
docs/pbp_playtype_patterns.yaml). Here the same data-driven config compiles
ONCE, at plan-build time, into a single chained ``when(rlike(...))`` Column —
so classification runs inside whole-stage codegen on the JVM, never
per-row Python (§2.9's policy: "compile to a generated when-chain
expression").
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

#: default classification config — (label, case-insensitive regex), first
#: match wins. Mirrors the reference's pattern YAML semantically; edit or
#: replace per deployment, the compiler is generic.
DEFAULT_PLAY_PATTERNS: list[tuple[str, str]] = [
    ("period_end", r"end of (period|half|game)"),
    ("made_last_ft", r"free throw.*(\d) of \1|made last free throw"),
    ("made_ft", r"made free throw|free throw.*made"),
    ("missed_ft", r"missed free throw|free throw.*missed"),
    ("turnover", r"turnover|steal|bad pass|traveling|offensive foul"),
    ("defensive_rebound", r"defensive rebound"),
    ("offensive_rebound", r"offensive rebound"),
    ("made_shot", r"made (jumper|layup|dunk|three|two|shot)|good!"),
    ("missed_shot", r"missed (jumper|layup|dunk|three|two|shot)|miss(ed)?!"),
]


def compile_classifier(
    text: Column | str,
    patterns: list[tuple[str, str]] | None = None,
    default: str = "other",
) -> Column:
    """Compile (label, regex) pairs into one first-match-wins when-chain.

    Equivalent to the reference's ``_matches_any`` loop
    (pbp_stats.py:76-110) but evaluated vectorized JVM-side.
    """
    col = F.col(text) if isinstance(text, str) else text
    lowered = F.lower(col)
    expr: Column | None = None
    for label, pattern in patterns or DEFAULT_PLAY_PATTERNS:
        cond = lowered.rlike(pattern)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    assert expr is not None, "at least one pattern required"
    return expr.otherwise(default)


def contains_any(text: Column | str, needles: list[str]) -> Column:
    """Substring any-match (F2: '"steal" in play_type.lower()',
    build_pbp_game_teams_flat.py:212-243) as a single boolean expression."""
    col = F.col(text) if isinstance(text, str) else text
    lowered = F.lower(col)
    out = F.lit(False)
    for needle in needles:
        out = out | lowered.contains(needle.lower())
    return out
