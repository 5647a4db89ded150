"""q484–q485: oracle parity plus Python recomputes — effect sizes from
raw cents (with the g < d shrinkage identity), weighted Jaccard from
per-user count dicts (with the binary-Jaccard dominance check)."""

from __future__ import annotations

from collections import Counter

from tests.conftest import SF_DIR, compare_query


def test_oracle_parity(spark, duck):
    for q in ("q484_effect_sizes", "q485_weighted_jaccard"):
        compare_query(spark, duck, q)


def test_q484_recompute(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    def arm(p):
        return [
            c
            for (c,) in duck.execute(
                "SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) "
                "FROM orders WHERE o_orderpriority = ?",
                [p],
            ).fetchall()
        ]

    x, y = arm("1-URGENT"), arm("5-LOW")
    n1, n2 = len(x), len(y)
    m1, m2 = sum(x) / n1, sum(y) / n2
    css1 = sum(v * v for v in x) - sum(x) ** 2 / n1
    css2 = sum(v * v for v in y) - sum(y) ** 2 / n2
    sp = ((css1 + css2) / (n1 + n2 - 2)) ** 0.5
    d = (m1 - m2) / sp
    g = d * (1 - 3 / (4 * (n1 + n2) - 9))
    r = all_queries()["q484_effect_sizes"](spark, SF_DIR).collect()[0]
    assert (r["n1"], r["n2"]) == (n1, n2)
    assert abs(r["mean_diff_dollars"] - (m1 - m2) / 100) < 1e-6
    assert abs(r["cohen_d"] - d) < 1e-9
    assert abs(r["hedges_g"] - g) < 1e-9
    assert abs(r["hedges_g"]) < abs(r["cohen_d"])  # correction shrinks
    # priorities independent of totals in this generator
    assert r["negligible_effect"] is True


def test_q485_recompute_and_dominance(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = duck.execute("SELECT event_type, user_id FROM events").fetchall()
    prof: dict[str, Counter] = {}
    for t, u in rows:
        prof.setdefault(t, Counter())[u] += 1
    got = {
        (r["type_a"], r["type_b"]): r
        for r in all_queries()["q485_weighted_jaccard"](spark, SF_DIR).collect()
    }
    types = sorted(prof)
    assert len(got) == len(types) * (len(types) - 1) // 2
    for (ta, tb), r in got.items():
        users = set(prof[ta]) | set(prof[tb])
        smin = sum(min(prof[ta][u], prof[tb][u]) for u in users)
        smax = sum(max(prof[ta][u], prof[tb][u]) for u in users)
        assert (r["sum_min"], r["sum_max"]) == (smin, smax)
        assert r["wjaccard_ppm"] == smin * 1000000 // smax
        # weighted Jaccard never exceeds the binary (set) Jaccard here:
        # counts differ per user, so min/max < 1 even on identical support
        inter = len(set(prof[ta]) & set(prof[tb]))
        union = len(users)
        assert smin / smax <= inter / union + 1e-12
