"""q470–q472: oracle parity plus Python replays — Gonzalez greedy from
quantized embeddings, the shuffle-audit expectation on synthetic extreme
orders, and the risk-coverage curve rebuilt from a from-scratch Markov
train/test replay."""

from __future__ import annotations

from tests.conftest import SF_DIR, compare_query


def test_oracle_parity(spark, duck):
    for q in (
        "q470_kcenter_coreset",
        "q471_shuffle_audit",
        "q472_risk_coverage",
    ):
        compare_query(spark, duck, q)


def test_q470_gonzalez_replay(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    import math

    Q = 16777216
    vecs = {
        v: [int(math.floor(float(x) * Q + 0.5)) for x in e]
        for v, e in duck.execute(
            "SELECT vec_id, embedding FROM embeddings"
        ).fetchall()
    }

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    mind = {v: d2(q, vecs[0]) for v, q in vecs.items() if v != 0}
    expect = []
    for rank in range(1, 9):
        # tiebreak: max dist, then smallest vec_id
        best = max(mind.values())
        w = min(v for v, dd in mind.items() if dd == best)
        expect.append((rank, w, mind[w]))
        wq = vecs[w]
        del mind[w]
        for v in mind:
            mind[v] = min(mind[v], d2(vecs[v], wq))
    rows = sorted(
        all_queries()["q470_kcenter_coreset"](spark, SF_DIR).collect(),
        key=lambda r: r["rank"],
    )
    assert [(r["rank"], r["vec_id"], r["dist2"]) for r in rows] == expect
    # covering radius is non-increasing along the selection order
    radii = [r["dist2"] for r in rows]
    assert all(a >= b for a, b in zip(radii, radii[1:]))


def _clustering_ratio(sources):
    n = len(sources)
    a = sum(x == y for x, y in zip(sources, sources[1:]))
    from collections import Counter

    exp_num = sum(c * (c - 1) for c in Counter(sources).values())
    return a * n / exp_num


def test_q471_replay_and_extremes(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    srcs = [
        s
        for (s,) in duck.execute(
            "SELECT source FROM documents ORDER BY doc_id"
        ).fetchall()
    ]
    r = all_queries()["q471_shuffle_audit"](spark, SF_DIR).collect()[0]
    assert r["n"] == len(srcs)
    assert r["n_adjacent_same"] == sum(
        x == y for x, y in zip(srcs, srcs[1:])
    )
    assert abs(r["clustering_ratio"] - _clustering_ratio(srcs)) < 1e-12
    # the fixture interleaves sources -> must read as shuffled
    assert r["well_shuffled"] is True
    # calibration on constructed extremes, same formula (20 sources —
    # with few sources even perfect sorting caps the ratio near k/(k-1)·...
    # ≈ 2, which is itself the statistic working, not failing):
    sorted_order = [f"s{i}" for i in range(20) for _ in range(20)]
    assert _clustering_ratio(sorted_order) > 10
    round_robin = [f"s{i % 20}" for i in range(400)]
    assert _clustering_ratio(round_robin) < 0.1


def test_q472_curve_replay(spark, duck):
    from collections import Counter, defaultdict

    from hoops_edge_database_etl_spark.queries import all_queries

    pairs = duck.execute(
        """
        SELECT event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id),
               CAST(ts AS DATE) < DATE '2024-01-22'
        FROM events QUALIFY lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) IS NOT NULL
        """
    ).fetchall()
    trans = Counter((s, d) for s, d, tr in pairs if tr)
    tot = defaultdict(int)
    for (s, _), n in trans.items():
        tot[s] += n
    pred = {}
    for s in tot:
        best_n = max(n for (ss, _), n in trans.items() if ss == s)
        cands = sorted(d for (ss, d), n in trans.items() if ss == s and n == best_n)
        pred[s] = (cands[0], best_n, tot[s])
    test = [(s, d) for s, d, tr in pairs if not tr]
    per_src = defaultdict(lambda: [0, 0])
    for s, actual in test:
        per_src[s][0] += 1
        per_src[s][1] += actual != pred[s][0]
    levels = sorted(
        per_src, key=lambda s: (-pred[s][1] / pred[s][2], s)
    )
    rows = {r["src"]: r for r in all_queries()["q472_risk_coverage"](
        spark, SF_DIR
    ).collect()}
    total = sum(v[0] for v in per_src.values())
    cn = ce = 0
    for s in levels:
        cn += per_src[s][0]
        ce += per_src[s][1]
        r = rows[s]
        assert (r["n_test"], r["n_err"]) == tuple(per_src[s])
        assert (r["cum_n"], r["cum_err"]) == (cn, ce)
        assert r["coverage_ppm"] == cn * 1000000 // total
        assert r["risk_ppm"] == ce * 1000000 // cn
        assert r["predicted"] == pred[s][0]
        assert abs(r["conf"] - pred[s][1] / pred[s][2]) < 1e-12
    # the final point answers everything
    assert max(r["coverage_ppm"] for r in rows.values()) == 1000000
    # coverage strictly increases along falling confidence
    covs = [rows[s]["coverage_ppm"] for s in levels]
    assert covs == sorted(covs)
