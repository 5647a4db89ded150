"""PBP pipeline end-to-end: classify → sessionize → game-team stats →
daily rollup, on a hand-scored synthetic game (the reference's conftest
fixture strategy, SURVEY.md §5)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest

SCHEMA = (
    "game_id long, play_id long, period int, seconds_remaining double, "
    "team_id long, play_text string, score_value double, "
    "home_score double, away_score double, game_date date, is_home boolean"
)

D = dt.date(2024, 1, 6)


def _plays():
    """One game, two teams (1=home, 2=away), hand-scored."""
    rows = [
        # (play_id, period, clock, team, text, score, h, a)
        (1, 1, 1200.0, 1, "Smith made Jumper", 2.0, 2, 0),
        (2, 1, 1150.0, 2, "Lee missed Layup", 0.0, 2, 0),
        (3, 1, 1148.0, 1, "Park Defensive Rebound", 0.0, 2, 0),
        (4, 1, 1100.0, 1, "Turnover by Jones", 0.0, 2, 0),
        (5, 1, 1050.0, 2, "Kim made Three Pointer Jumper", 3.0, 2, 3),
        (6, 1, 0.0, None, "End of Period", 0.0, 2, 3),
        (7, 2, 1190.0, 2, "Cho missed Jumper", 0.0, 2, 3),
        (8, 2, 1188.0, 2, "Lee Offensive Rebound", 0.0, 2, 3),
        (9, 2, 1180.0, 2, "Lee made Dunk", 2.0, 2, 5),
        (10, 2, 900.0, 1, "Smith made Free Throw", 1.0, 3, 5),
        (11, 2, 0.0, None, "End of Period", 0.0, 3, 5),
    ]
    return [
        (1, pid, per, clk, team, txt, sc, float(h), float(a), D, team == 1)
        for pid, per, clk, team, txt, sc, h, a in rows
    ]


@pytest.fixture()
def enriched(spark):
    from hoops_edge_database_etl_spark.operators.pbp import enrich_plays

    return enrich_plays(spark.createDataFrame(_plays(), SCHEMA)).cache()


def test_enrich_classifies_and_sessionizes(enriched):
    rows = {r["play_id"]: r for r in enriched.collect()}
    assert rows[1]["play_kind"] == "made_shot"
    assert rows[3]["play_kind"] == "defensive_rebound"
    assert rows[6]["play_kind"] == "period_end"
    # possession 1: made shot by 1 ends it
    assert rows[1]["possession_id"] == 1 and rows[1]["possession_end"]
    # possession 2 (team 2 missed; def rebound by 1 closes it)
    assert rows[2]["possession_id"] == 2 and rows[2]["offense_team_id"] == 2
    assert rows[3]["possession_end"]
    # rebound transfer: possession 3 belongs to team 1, killed by turnover
    assert rows[4]["possession_id"] == 3 and rows[4]["offense_team_id"] == 1
    # new period forces a new possession
    assert rows[7]["possession_id"] > rows[5]["possession_id"]


def test_game_team_stats_counts_and_formulas(spark, enriched):
    from hoops_edge_database_etl_spark.operators.pbp import game_team_stats

    gts = {r["team_id"]: r for r in game_team_stats(enriched).collect()}
    t1, t2 = gts[1], gts[2]
    assert t1["pts"] == 3.0 and t2["pts"] == 5.0
    assert t1["fga"] == 1 and t2["fga"] == 4
    assert t2["fgm"] == 2 and t1["fgm"] == 1
    assert t1["fta"] == 1 and t1["ftm"] == 1
    assert t1["tov"] == 1 and t1["dreb"] == 1 and t2["oreb"] == 1
    # formula possessions: FGA − OREB + TOV + 0.44·FTA
    assert t1["poss_formula"] == pytest.approx(1 - 0 + 1 + 0.44 * 1)
    assert t2["poss_formula"] == pytest.approx(4 - 1 + 0 + 0)
    # opponent wiring (J6)
    assert t1["opp_pts"] == 5.0 and t2["opp_pts"] == 3.0
    # efficiency: 100·pts/poss
    assert t1["off_eff"] == pytest.approx(100 * 3.0 / t1["poss_formula"])
    assert t1["def_eff"] == pytest.approx(t2["off_eff"])
    # regulation game: 2 periods → 40 minutes
    assert t1["game_minutes"] == 40


def test_no_garbage_variant_filters_plays(spark):
    from hoops_edge_database_etl_spark.operators.pbp import enrich_plays, game_team_stats

    plays = _plays() + [
        # blowout play late in period 2 (margin 20, 9 min left) → garbage
        (1, 12, 2, 540.0, 1, "Smith made Jumper", 2.0, 25.0, 5.0, D, True),
    ]
    enr = enrich_plays(spark.createDataFrame(plays, SCHEMA))
    flags = {r["play_id"]: r["garbage_time"] for r in enr.collect()}
    assert flags[12] is True and flags[1] is False
    all_pts = {r["team_id"]: r["pts"] for r in game_team_stats(enr).collect()}
    ng_pts = {
        r["team_id"]: r["pts"]
        for r in game_team_stats(enr, include_garbage=False).collect()
    }
    assert all_pts[1] == ng_pts[1] + 2.0


def test_daily_rollup_densifies_and_accumulates(spark, enriched):
    from hoops_edge_database_etl_spark.operators.pbp import (
        game_team_stats,
        team_daily_rollup,
    )

    gts = game_team_stats(enriched)
    # add a second game 3 days later for team 1 only
    g2 = gts.filter(F.col("team_id") == 1).withColumn(
        "game_date", F.lit(D + dt.timedelta(days=3))
    ).withColumn("game_id", F.lit(2))
    roll = team_daily_rollup(gts.unionByName(g2))
    t1 = {
        str(r["day"]): (r["cum_games"], r["cum_pts"])
        for r in roll.filter(F.col("team_id") == 1).collect()
    }
    # 4 calendar days densified (Jan 6..9), bye days carry totals forward
    assert len(t1) == 4
    assert t1[str(D)] == (1, 3.0)
    assert t1[str(D + dt.timedelta(days=1))] == (1, 3.0)  # bye day carries
    assert t1[str(D + dt.timedelta(days=3))] == (2, 6.0)
    # team 2 has no second game: spine still extends to the league max date
    t2_days = roll.filter(F.col("team_id") == 2).count()
    assert t2_days == 4
