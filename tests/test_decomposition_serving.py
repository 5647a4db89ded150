"""Median seasonal decomposition, LOCF gap fill, MMR re-ranking
(q431-q433): oracle parity plus additivity / replay / diversity
properties."""

from __future__ import annotations

import numpy as np

from tests.conftest import SF_DIR, compare_query


def test_q431_matches_oracle(spark, duck):
    compare_query(spark, duck, "q431_median_decomposition")


def test_q432_matches_oracle(spark, duck):
    compare_query(spark, duck, "q432_locf_gapfill")


def test_q433_matches_oracle(spark, duck):
    compare_query(spark, duck, "q433_mmr_rerank")


def test_q431_components_readd_exactly(spark):
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q431_median_decomposition"](spark, SF_DIR).collect()
    assert len(rows) == 150
    for r in rows:
        assert r["y"] == r["seasonal"] + r["trend"] + r["remainder"]


def test_q431_median_trend_resists_planted_spike(spark):
    """Replay the decomposition on a clean series and the same series
    with one +500 spike, with MEDIAN vs MEAN statistics: the median
    trend moves by at most a few counts anywhere (the spike can shift
    which element is a 4-sample dow-median, nothing more), while the
    mean trend absorbs ~spike/7 across every window touching it — the
    quantitative robustness claim the query's design rests on."""

    def decompose(y, stat):
        d = np.arange(len(y))
        seasonal = np.zeros_like(y)
        for dow in range(7):
            vals = y[d % 7 == dow]
            if stat == "median":
                sv = np.sort(vals)
                seasonal[d % 7 == dow] = sv[(len(sv) + 1) // 2 - 1]
            else:
                seasonal[d % 7 == dow] = int(vals.mean())
        deseason = y - seasonal
        trend = np.zeros_like(y)
        for i in range(len(y)):
            wnd = deseason[max(0, i - 3) : i + 4]
            if stat == "median":
                ws = np.sort(wnd)
                trend[i] = ws[(len(ws) + 1) // 2 - 1]
            else:
                trend[i] = int(wnd.mean())
        return trend

    rng = np.random.RandomState(7)
    clean = rng.randint(50, 80, size=30).astype(np.int64)
    spiked = clean.copy()
    spiked[15] += 500
    med_dev = np.abs(decompose(spiked, "median") - decompose(clean, "median"))
    mean_dev = np.abs(decompose(spiked, "mean") - decompose(clean, "mean"))
    assert med_dev.max() <= 10
    assert mean_dev.max() >= 50  # ~spike/7 leaks into the mean trend


def test_q432_locf_replay(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    obs = duck.execute(
        """
        SELECT event_type,
               CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT),
               MAX(CAST(floor(value * 100 + 0.5) AS BIGINT))
        FROM events WHERE value > 300 GROUP BY 1, 2
        """
    ).fetchall()
    table = {}
    for et, d, v in obs:
        table[(et, d)] = v
    rows = all_queries()["q432_locf_gapfill"](spark, SF_DIR).collect()
    assert len(rows) == 150
    for r in sorted(rows, key=lambda r: (r["event_type"], r["d"])):
        et, d = r["event_type"], r["d"]
        last, last_d = None, None
        for dd in range(d + 1):
            if (et, dd) in table:
                last, last_d = table[(et, dd)], dd
        assert r["filled_c"] == last
        assert r["staleness_days"] == (None if last_d is None else d - last_d)
        assert r["is_observed"] == ((et, d) in table)
        if r["is_observed"]:
            assert r["staleness_days"] == 0


def test_q433_numpy_replay_and_diversity(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    raw = duck.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in raw])
    mat = np.floor(
        np.array([r[1] for r in raw], dtype=np.float64) * (1 << 24) + 0.5
    ).astype(np.int64)
    qv = mat[ids == 0][0]
    cand_ids = ids[ids != 0]
    cmat = mat[ids != 0]
    rel = cmat @ qv
    sims = cmat @ cmat.T
    n = len(cand_ids)
    msim = np.full(n, -(2**60), dtype=np.int64)
    alive = np.ones(n, dtype=bool)
    picks = []
    for rank in range(1, 11):
        best = min(
            (i for i in range(n) if alive[i]),
            key=lambda i: (-int(rel[i] - msim[i]), int(cand_ids[i])),
        )
        picks.append(
            (rank, int(cand_ids[best]), int(rel[best]),
             None if msim[best] == -(2**60) else int(msim[best]))
        )
        alive[best] = False
        msim = np.maximum(msim, sims[:, best])
    got = sorted(
        (
            (r["rank"], r["vec_id"], r["rel"], r["max_sim_prev"])
            for r in all_queries()["q433_mmr_rerank"](spark, SF_DIR).collect()
        )
    )
    assert got == picks
    # rank 1 is the pure top-1 by relevance
    assert got[0][1] == int(cand_ids[int(np.argmax(rel))])
    # diversity: MMR's selection differs from pure top-10 by relevance
    topk = {int(cand_ids[i]) for i in np.argsort(-rel)[:10]}
    assert {v for _, v, _, _ in got} != topk
