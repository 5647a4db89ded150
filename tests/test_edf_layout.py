"""q478–q479: oracle parity plus replays — Cramér–von Mises from raw
ranks with both-direction anchors, the Hilbert transform replayed in
Python and its adjacency theorem proved exhaustively at small order."""

from __future__ import annotations

from tests.conftest import SF_DIR, compare_query


def test_oracle_parity(spark, duck):
    for q in ("q478_cramer_von_mises", "q479_hilbert_locality"):
        compare_query(spark, duck, q)


def _cvm(xs, ys):
    pooled = sorted(
        [(v, 0, k) for k, v in xs] + [(v, 1, k) for k, v in ys],
        key=lambda t: (t[0], t[2]),
    )
    n, m = len(xs), len(ys)
    sx = sy = 0
    ix = iy = 0
    for r, (_, grp, _) in enumerate(pooled, 1):
        if grp == 0:
            ix += 1
            sx += (r - ix) ** 2
        else:
            iy += 1
            sy += (r - iy) ** 2
    u = n * sx + m * sy
    big_n = n + m
    t = u / (n * m * big_n) - (4 * n * m - 1) / (6 * big_n)
    return u, t


def test_q478_replay_and_anchors(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    xs = duck.execute(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderpriority = '1-URGENT'"
    ).fetchall()
    ys = duck.execute(
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_orderpriority = '5-LOW'"
    ).fetchall()
    u, t = _cvm(xs, ys)
    r = all_queries()["q478_cramer_von_mises"](spark, SF_DIR).collect()[0]
    assert (r["n"], r["m"]) == (len(xs), len(ys))
    assert int(r["u"]) == u
    assert abs(r["t_cvm"] - t) < 1e-9
    # priorities are assigned independently of totals in this generator
    assert r["same_distribution_5pct"] is True
    # anchors, same statistic: interleaved identical-ish samples score
    # near the minimum; a disjoint shift blows past the critical value
    a = [(i, float(i)) for i in range(0, 400, 2)]
    b = [(i, float(i)) for i in range(1, 400, 2)]
    _, t_same = _cvm(a, b)
    assert t_same < 0.461
    lo = [(i, float(i)) for i in range(200)]
    hi = [(i + 1000, float(i + 10000)) for i in range(200)]
    _, t_shift = _cvm(lo, hi)
    assert t_shift > 0.461


def _hilbert(x, y, order):
    d = 0
    s = order // 2
    while s > 0:
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_q479_hilbert_theorem_and_consistency(spark):
    from hoops_edge_database_etl_spark.queries import all_queries

    # THE Hilbert property, exhaustively at order 16: consecutive curve
    # positions are Manhattan-adjacent grid cells (false for Morton)
    for order in (4, 16):
        byd = {}
        for x in range(order):
            for y in range(order):
                byd[_hilbert(x, y, order)] = (x, y)
        assert sorted(byd) == list(range(order * order))  # a bijection
        for d in range(order * order - 1):
            (x1, y1), (x2, y2) = byd[d], byd[d + 1]
            assert abs(x1 - x2) + abs(y1 - y2) == 1
    rows = {
        r["layout"]: r
        for r in all_queries()["q479_hilbert_locality"](spark, SF_DIR).collect()
    }
    assert set(rows) == {"hilbert", "zorder"}
    h, z = rows["hilbert"], rows["zorder"]
    # the predicate's answer cannot depend on layout
    assert h["rows_matched"] == z["rows_matched"]
    # both layouts cut the 2^16 cell grid into ≤256 256-cell blocks; the
    # OCCUPIED block count differs because the data doesn't fill the grid
    assert 0 < h["n_blocks"] <= 256 and 0 < z["n_blocks"] <= 256
    # the bake-off conclusion on this data: the box shatters across no
    # more Hilbert ranges than Morton ranges
    assert h["n_blocks_scanned"] <= z["n_blocks_scanned"]
