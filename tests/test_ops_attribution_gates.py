"""q473–q475: oracle parity plus independent replays — newsvendor
brute-forced to GLOBAL optimality, Markov removal effects re-swept in
pure-Python fixed point, the quantile-sketch gate checked against the
SHARP per-bin bound."""

from __future__ import annotations

from collections import Counter, defaultdict

from tests.conftest import SF_DIR, compare_query


def test_oracle_parity(spark, duck):
    for q in (
        "q473_newsvendor",
        "q474_markov_attribution",
        "q475_sketch_quantile_gate",
    ):
        compare_query(spark, duck, q)


def test_q473_brute_force_global_optimum(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    demand = [
        y
        for (y,) in duck.execute(
            "SELECT COUNT(*) FROM events WHERE event_type = 'purchase' "
            "GROUP BY CAST(ts AS DATE)"
        ).fetchall()
    ]
    r = all_queries()["q473_newsvendor"](spark, SF_DIR).collect()[0]
    n = len(demand)
    assert r["n_days"] == n
    # critical-ratio quantile: smallest Q with 4*F(Q) >= 3*n
    support = sorted(set(demand))
    cum = 0
    qstar = None
    cnt = Counter(demand)
    for v in support:
        cum += cnt[v]
        if 4 * cum >= 3 * n:
            qstar = v
            break
    assert r["q_star"] == qstar

    def cost(q):
        return sum(3 * max(d - q, 0) + max(q - d, 0) for d in demand)

    assert (r["cost_below"], r["cost_at"], r["cost_above"]) == (
        cost(qstar - 1),
        cost(qstar),
        cost(qstar + 1),
    )
    assert r["is_optimal"] is True
    # global optimality by brute force over the whole support range
    best = min(cost(q) for q in range(min(demand) - 1, max(demand) + 2))
    assert cost(qstar) == best


def _journeys(duck):
    rows = duck.execute(
        "SELECT user_id, event_type FROM events ORDER BY user_id, ts, event_id"
    ).fetchall()
    by_user = defaultdict(list)
    for u, t in rows:
        by_user[u].append(t)
    return by_user


def test_q474_fixed_point_replay(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    SCALE, T = 1 << 20, 12
    hops = Counter()
    converted = total_users = 0
    for seq in _journeys(duck).values():
        total_users += 1
        first = seq[0]
        hops[("__start__", "C" if first == "purchase" else first)] += 1
        if "purchase" in seq:
            converted += 1
            seq = seq[: seq.index("purchase") + 1]
        for a, b in zip(seq, seq[1:]):
            if a == "purchase":
                break
            hops[(a, "C" if b == "purchase" else b)] += 1
        if seq[-1] != "purchase":
            hops[(seq[-1], "N")] += 1

    rowsum = defaultdict(int)
    for (s, _), c in hops.items():
        rowsum[s] += c

    def conv(removed):
        p = {
            (s, d): c * SCALE // rowsum[s]
            for (s, d), c in hops.items()
            if removed is None or (s != removed and d != removed)
        }
        states = {s for s, _ in p}
        v = {s: 0 for s in states}
        for _ in range(T):
            v = {
                s: (
                    sum(
                        fx * v[d]
                        for (ss, d), fx in p.items()
                        if ss == s and d in v
                    )
                    + p.get((s, "C"), 0) * SCALE
                )
                // SCALE
                for s in states
            }
        return v["__start__"]

    base = conv(None)
    rows = {
        r["channel"]: r
        for r in all_queries()["q474_markov_attribution"](spark, SF_DIR).collect()
    }
    effs = {}
    for c in ("click", "error", "signup", "view"):
        r = rows[c]
        assert r["base_conv_fx"] == base
        assert r["removed_conv_fx"] == conv(c)
        effs[c] = base - conv(c)
        assert r["removal_effect_fx"] == effs[c]
        # every channel carries converting traffic in this fixture
        assert r["removal_effect_fx"] > 0
    tot = sum(effs.values())
    for c, r in rows.items():
        assert r["share_ppm"] == effs[c] * 1000000 // tot
    # horizon-12 model conversion approaches the empirical rate from below
    assert base <= converted * SCALE // total_users + SCALE // 100


def test_q475_sharp_per_bin_bound(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    import math

    BIN = 500.0
    vals = [
        float(v)
        for (v,) in duck.execute("SELECT o_totalprice FROM orders").fetchall()
    ]
    bins = Counter(math.floor(v / BIN) for v in vals)
    rows = all_queries()["q475_sketch_quantile_gate"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["rank_lt"] == sum(v < r["est"] for v in vals)
        assert r["rank_err"] == abs(r["rank_lt"] - r["k"])
        assert r["max_bin_cnt"] == max(bins.values())
        assert r["within_sketch_bound"] is True
        # the SHARP bound: the estimate's own bin population (the bin the
        # interpolation ran in — floor of a point strictly inside it)
        own = bins[math.floor((r["est"] - 1e-9) / BIN)]
        assert r["rank_err"] <= own
