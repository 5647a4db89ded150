"""Markov next-event backtest and personalized PageRank (q452-q453):
oracle parity plus the leakage split, baseline-beating, and
teleport-semantics properties."""

from __future__ import annotations

from tests.conftest import SF_DIR, compare_query


def test_q452_matches_oracle(spark, duck):
    compare_query(spark, duck, "q452_markov_next_event_accuracy")


def test_q453_matches_oracle(spark, duck):
    compare_query(spark, duck, "q453_personalized_pagerank")


def test_q452_python_replay_and_model_beats_baseline(spark, duck):
    from collections import Counter

    from hoops_edge_database_etl_spark.queries import all_queries

    pairs = duck.execute(
        """
        WITH s AS (
          SELECT user_id, event_type, ts,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS nxt
          FROM events
        )
        SELECT event_type, nxt, CAST(ts AS DATE) < DATE '2024-01-22'
        FROM s WHERE nxt IS NOT NULL
        """
    ).fetchall()
    trans = Counter()
    test = []
    for src, nxt, is_train in pairs:
        if is_train:
            trans[(src, nxt)] += 1
        else:
            test.append((src, nxt))
    pred = {}
    for (src, dst), n in trans.items():
        cur = pred.get(src)
        if cur is None or (n, ) > (cur[1], ) or (n == cur[1] and dst < cur[0]):
            if cur is None or n > cur[1] or (n == cur[1] and dst < cur[0]):
                pred[src] = (dst, n)
    dst_tot = Counter()
    for (src, dst), n in trans.items():
        dst_tot[dst] += n
    majority = min(dst_tot, key=lambda d: (-dst_tot[d], d))
    rows = {
        r["src"]: r
        for r in all_queries()["q452_markov_next_event_accuracy"](
            spark, SF_DIR
        ).collect()
    }
    tot_correct = tot_base = tot_n = 0
    for src, r in rows.items():
        n = sum(1 for s, _ in test if s == src)
        correct = sum(1 for s, a in test if s == src and a == pred[s][0])
        basec = sum(1 for s, a in test if s == src and a == majority)
        assert r["predicted"] == pred[src][0]
        assert (r["n_test"], r["n_correct"]) == (n, correct)
        assert r["accuracy_ppm"] == correct * 1000000 // n
        assert r["baseline_ppm"] == basec * 1000000 // n
        tot_correct += correct
        tot_base += basec
        tot_n += n
    # in aggregate the conditional model must beat or tie majority-class
    assert tot_correct >= tot_base


def test_q453_teleport_semantics(spark):
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q453_personalized_pagerank"](spark, SF_DIR).collect()
    assert sum(1 for r in rows if r["is_seed"]) == 2
    scores = sorted(r["ppr"] for r in rows)
    median = scores[len(scores) // 2]
    # total mass is bounded by what the 2 seeds inject
    assert sum(scores) < 2.5
    # seeds' scores are nonzero and the top score is seed-adjacent mass
    seed_scores = [r["ppr"] for r in rows if r["is_seed"]]
    assert all(s > 0 for s in seed_scores)
    assert max(scores) >= median
    # personalization: at least one node scores 0 (unreachable teleport
    # mass never spreads uniformly) or strictly below the uniform share
    assert min(scores) < sum(scores) / len(scores)
