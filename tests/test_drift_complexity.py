"""q466–q467: oracle parity plus Python replays — the Page-Hinkley
recurrence recomputed step-by-step (and shown to FIRE on a planted
shift), LZ78 reparsed with a dict-based reference parser."""

from __future__ import annotations

from tests.conftest import SF_DIR, compare_query


def test_oracle_parity(spark, duck):
    for q in ("q466_page_hinkley", "q467_lz78_complexity"):
        compare_query(spark, duck, q)


def _page_hinkley(xs, delta=1.0):
    s = c = m = mmin = phmax = 0.0
    for x in xs:
        s += x
        c += 1
        m += x - s / c - delta
        mmin = min(mmin, m)
        phmax = max(phmax, m - mmin)
    return m - mmin, phmax


def test_q466_replay_and_planted_shift(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    maxd = duck.execute(
        "SELECT MAX(CAST(ts AS DATE) - DATE '2024-01-01') FROM events"
    ).fetchone()[0]
    rows = all_queries()["q466_page_hinkley"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        cnt = dict(
            duck.execute(
                "SELECT CAST(ts AS DATE) - DATE '2024-01-01', COUNT(*) "
                "FROM events WHERE event_type = ? GROUP BY 1",
                [r["event_type"]],
            ).fetchall()
        )
        xs = [float(cnt.get(d, 0)) for d in range(maxd + 1)]
        ph, phmax = _page_hinkley(xs)
        assert r["n_days"] == len(xs)
        assert abs(r["ph_final"] - ph) < 1e-9
        assert abs(r["ph_max"] - phmax) < 1e-9
        # stationary fixture: the detector must stay quiet
        assert r["drift_alarm"] is False
        # calibration in the other direction: shift the second half of
        # THIS series up by 30% and the identical recurrence must fire
        shifted = xs[: len(xs) // 2] + [x * 1.3 for x in xs[len(xs) // 2 :]]
        assert _page_hinkley(shifted)[1] > 50.0


def _lz78(seq):
    d, cur, ph = set(), "", 0
    for ch in seq:
        cur += ch
        if cur not in d:
            d.add(cur)
            ph += 1
            cur = ""
    return ph + (1 if cur else 0)


def test_q467_lz78_recompute(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    seqs = dict(
        duck.execute(
            "SELECT user_id, string_agg(substr(event_type,1,1), ''"
            " ORDER BY ts, event_id) FROM events GROUP BY user_id"
        ).fetchall()
    )
    rows = all_queries()["q467_lz78_complexity"](spark, SF_DIR).collect()
    assert len(rows) == len(seqs)
    for r in rows:
        seq = seqs[r["user_id"]]
        assert r["n_events"] == len(seq)
        assert r["lz78_phrases"] == _lz78(seq)
        assert abs(r["phrase_ratio"] - r["lz78_phrases"] / len(seq)) < 1e-12


def test_q467_parser_extremes():
    # constant string: phrases grow ~ sqrt(2n) — k full phrases cover
    # k(k+1)/2 chars
    assert _lz78("a" * 1) == 1
    assert _lz78("a" * 3) == 2  # 'a', 'aa'
    assert _lz78("a" * 6) == 3  # 'a', 'aa', 'aaa'
    assert _lz78("a" * 7) == 4  # ... plus the unfinished tail 'a'
    # all-distinct symbols: every char is a fresh phrase
    assert _lz78("abcde") == 5
    # textbook LZ78 example
    assert _lz78("ababab") == 4  # 'a', 'b', 'ab', 'ab'(tail)
