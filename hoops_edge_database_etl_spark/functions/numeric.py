"""Numeric helpers: safe division, clamps, weighted stats (F8/F9/F10/P8).

All pure Column expressions — zero UDFs, so they inline into codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def safe_div(
    numer: Column, denom: Column, scale: float | None = None, zero_on_null: bool = False
) -> Column:
    """Division guarded against zero/null denominators.

    The reference has two conventions (SURVEY.md §7 hard-point 5):
    gold helpers return NULL (src/cbbd_etl/gold/_io_helpers.py:70-91), PBP scripts
    return 0.0 (scripts/build_pbp_game_team_stats.py:106-109). ``zero_on_null``
    selects the PBP convention.
    """
    out = F.when(denom > 0, numer / denom)
    if scale is not None:
        out = F.when(denom > 0, numer / denom * F.lit(scale))
    if zero_on_null:
        out = F.coalesce(out, F.lit(0.0))
    return out


def clamp(col: Column, lo: float, hi: float) -> Column:
    """Value-sanity clamp (P8: reference gold/iterative_ratings.py:25-28)."""
    return F.least(F.lit(hi), F.greatest(F.lit(lo), col))


def decay_weight(days: Column, half_life: float) -> Column:
    """Exponential recency decay 0.5**(days/half_life)
    (F10: reference gold/iterative_ratings.py:48-55)."""
    return F.pow(F.lit(0.5), days / F.lit(half_life))


def barthag(oe: Column, de: Column, exp: float = 11.5) -> Column:
    """Pythagorean win probability oe^x / (oe^x + de^x) with the reference's
    overflow guards (F10: gold/iterative_ratings.py:58-77)."""
    ratio = F.when(de > 0, oe / de).otherwise(F.lit(None))
    powed = F.pow(ratio, F.lit(exp))
    return F.when(powed.isNotNull(), powed / (powed + 1))
