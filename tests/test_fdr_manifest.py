"""Exact BH-FDR sign tests and the corpus release manifest (q449-q450):
oracle parity plus binomial replay, step-up invariants, and cross-query
reconciliation."""

from __future__ import annotations

from math import comb

from tests.conftest import SF_DIR, compare_query


def test_q449_matches_oracle(spark, duck):
    compare_query(spark, duck, "q449_bh_fdr_sign_tests")


def test_q450_matches_oracle(spark, duck):
    compare_query(spark, duck, "q450_corpus_release_manifest")


def test_q449_binomial_replay_and_stepup_invariants(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = sorted(
        all_queries()["q449_bh_fdr_sign_tests"](spark, SF_DIR).collect(),
        key=lambda r: r["p_rank"],
    )
    assert len(rows) == 5
    deltas = duck.execute(
        """
        WITH daily AS (
          SELECT event_type,
                 CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
                 COUNT(*) AS y
          FROM events GROUP BY 1, 2
        )
        SELECT event_type,
               y - lag(y) OVER (PARTITION BY event_type ORDER BY d) AS dy
        FROM daily
        """
    ).fetchall()
    per = {}
    for et, dy in deltas:
        if dy is not None and dy != 0:
            per.setdefault(et, []).append(dy)
    for r in rows:
        ds = per[r["event_type"]]
        m, k = len(ds), sum(1 for x in ds if x > 0)
        assert (r["k"], r["m"]) == (k, m)
        tail = sum(comb(m, j) for j in range(min(k, m - k) + 1))
        assert r["p_num"] == min(2 * tail, 2**m)
        assert r["p_den"] == 2**m
    # step-up: the rejected set is a prefix of the p-ranking
    flags = [r["rejected"] for r in rows]
    assert flags == sorted(flags, reverse=True)
    # BH dominates Bonferroni (alpha/M single threshold)
    bonf = [r["p_num"] * 50 <= r["p_den"] for r in rows]  # p <= 0.1/5
    assert all(not b or r for b, r in zip(bonf, flags))


def test_q450_reconciles_with_q440_and_rates(spark):
    from hoops_edge_database_etl_spark.queries import all_queries

    qs = all_queries()
    manifest = qs["q450_corpus_release_manifest"](spark, SF_DIR).collect()
    split_docs = {}
    for r in manifest:
        split_docs[r["split"]] = split_docs.get(r["split"], 0) + r["n_docs"]
        if r["n_docs"] == 0:
            # r9 densified zero cell: every stat zero by declared contract
            assert (r["n_tokens"], r["n_dups"], r["dup_rate_ppm"],
                    r["fingerprint"]) == (0, 0, 0, 0)
            continue
        assert r["dup_rate_ppm"] == r["n_dups"] * 1000000 // r["n_docs"]
        assert 0 < r["n_tokens"]
    q440 = qs["q440_cluster_safe_split"](spark, SF_DIR).collect()
    safe = {r["split"]: r["n_docs"] for r in q440 if r["scheme"] == "cluster_safe"}
    assert split_docs == safe
    # fingerprints are cell-specific, not an accidental constant
    # (zero cells share the declared 0 — uniqueness holds on occupied cells)
    fps = [r["fingerprint"] for r in manifest if r["n_docs"] > 0]
    assert len(set(fps)) == len(fps)
