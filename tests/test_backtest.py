"""Backtest plan tests: point-in-time rating attachment (no leakage),
margin prediction sign/shape, and metric arithmetic on hand-scored games."""

from __future__ import annotations

import datetime as dt

import pytest

from hoops_edge_database_etl_spark.plans.backtest import (
    attach_ratings,
    backtest_metrics,
    roi_by_threshold,
)

D = dt.date

GAMES_SCHEMA = (
    "game_id long, game_date date, home_team_id long, away_team_id long, "
    "home_points double, away_points double"
)
RATINGS_SCHEMA = "team_id long, rating_date date, adj_oe double, adj_de double"


@pytest.fixture()
def preds(spark):
    games = spark.createDataFrame(
        [
            (1, D(2024, 1, 10), 1, 2, 80.0, 70.0),
            (2, D(2024, 1, 20), 2, 1, 75.0, 71.0),
            # game before any rating exists → must drop (strictly-before)
            (3, D(2024, 1, 1), 1, 2, 60.0, 60.0),
        ],
        GAMES_SCHEMA,
    )
    ratings = spark.createDataFrame(
        [
            (1, D(2024, 1, 5), 110.0, 95.0),
            (2, D(2024, 1, 5), 100.0, 100.0),
            # later snapshot only for team 1; game 2 must use it, game 1 must NOT
            (1, D(2024, 1, 15), 120.0, 90.0),
        ],
        RATINGS_SCHEMA,
    )
    return attach_ratings(games, ratings, league_avg=100.0, hca=4.0, pace=68.0)


def test_attach_ratings_no_leakage(preds):
    rows = {r["game_id"]: r for r in preds.collect()}
    assert set(rows) == {1, 2}  # game 3 has no prior rating → dropped
    # game 1 (Jan 10) must see the Jan 5 snapshot, not Jan 15
    assert rows[1]["h_oe"] == 110.0 and rows[1]["h_de"] == 95.0
    # game 2 (Jan 20, team 1 away) picks up the Jan 15 refresh
    assert rows[2]["a_oe"] == 120.0 and rows[2]["a_de"] == 90.0


def test_predicted_margin_favors_stronger_team(preds):
    rows = {r["game_id"]: r for r in preds.collect()}
    # team 1 (better on both ends) at home with hca: solidly positive
    expected = (110.0 * 100.0 - 100.0 * 95.0) / 100.0 * 0.68 + 4.0
    assert rows[1]["predicted_margin"] == pytest.approx(expected)
    assert rows[1]["actual_margin"] == 10.0


def test_backtest_metrics_arithmetic(spark):
    import pyspark.sql.functions as F

    preds = spark.createDataFrame(
        [
            (1, 7.0, 10.0, -5.0),   # model err −3; book line +5, book err −5
            (2, -2.0, -4.0, 1.0),   # model err 2; book line −1, book err −3
        ],
        "game_id long, predicted_margin double, actual_margin double, book_spread double",
    )
    m = backtest_metrics(preds).collect()[0]
    assert m["n_games"] == 2
    assert m["model_mae"] == pytest.approx(2.5)
    assert m["mean_error"] == pytest.approx(-0.5)
    assert m["book_mae"] == pytest.approx(4.0)
    # disagreement: |7−5|=2 (no), |−2−(−(−1)=... model −2 vs line −1| = 1 (no)
    assert m["clv_rate"] == pytest.approx(0.0)


def test_roi_by_threshold(spark):
    preds = spark.createDataFrame(
        [
            # line = −spread = +3; model says +10 (edge 7, bet home), home
            # wins by 12 → covers → win
            (1, 10.0, 12.0, -3.0),
            # line +3; model −5 (edge −8, bet away); home wins by 1 → away
            # covers → win
            (2, -5.0, 1.0, -3.0),
            # line +3; model +4 (edge 1) → only threshold 1 bets it; home
            # wins by 2 → home doesn't cover → loss
            (3, 4.0, 2.0, -3.0),
        ],
        "game_id long, predicted_margin double, actual_margin double, book_spread double",
    )
    rows = {r["threshold"]: r for r in roi_by_threshold(preds, [1.0, 5.0]).collect()}
    assert rows[1.0]["n_bets"] == 3 and rows[1.0]["win_rate"] == pytest.approx(2 / 3)
    assert rows[5.0]["n_bets"] == 2 and rows[5.0]["win_rate"] == pytest.approx(1.0)
    # at −110, winning pays 90.909...; ROI at t=5 = +0.909
    assert rows[5.0]["roi"] == pytest.approx(100 / 110, rel=1e-6)
