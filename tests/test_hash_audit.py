"""Hash-uniformity self-audit (q456): oracle parity plus the χ² replay
and the catches-vs-misses demonstration."""

from __future__ import annotations

from tests.conftest import SF_DIR, compare_query


def test_q456_matches_oracle(spark, duck):
    compare_query(spark, duck, "q456_hash_uniformity_audit")


def _chi2(counts, k=64):
    n = sum(counts)
    return sum((k * c - n) ** 2 for c in counts) / (k * n)


def test_q456_python_replay_and_verdict(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    r = all_queries()["q456_hash_uniformity_audit"](spark, SF_DIR).collect()[0]
    counts = dict(
        duck.execute(
            """
            SELECT CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)
                        || ':unif'), 1, 8) AS BIGINT) % 64, COUNT(*)
            FROM customer GROUP BY 1
            """
        ).fetchall()
    )
    full = [counts.get(b, 0) for b in range(64)]
    assert r["total"] == sum(full)
    assert (r["min_bucket"], r["max_bucket"]) == (min(full), max(full))
    assert abs(r["chi2_stat"] - _chi2(full)) < 1e-9
    # md5 on this fixture should actually pass the audit
    assert r["uniform_at_5pct"] is True
    assert r["chi2_stat"] < 82.53


def test_q456_chi2_catches_and_misses():
    """Document the statistic's power: a constant bucket fails
    catastrophically; a mildly-biased mod-residue split (24 vs 23 per
    bucket) passes chi-square even though min/max exposes it."""
    # keys 0..1499 mod 64: residues 0..27 get 24 keys, 28..63 get 23
    mod_counts = [24 if b < 1500 % 64 else 23 for b in range(64)]
    assert _chi2(mod_counts) < 82.53  # χ² cannot see this bias...
    assert max(mod_counts) - min(mod_counts) == 1  # ...but the range can
    const = [1500 if b == 0 else 0 for b in range(64)]
    assert _chi2(const) > 10000  # degenerate hashing fails loudly
