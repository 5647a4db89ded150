"""Cluster-safe split, greedy MV selection, embedding drift (q440-q442):
oracle parity plus the zero-leakage theorem, the (1-1/e) submodular
bound, and numpy drift replays."""

from __future__ import annotations

from itertools import combinations

import numpy as np

from tests.conftest import SF_DIR, compare_query


def test_q440_matches_oracle(spark, duck):
    compare_query(spark, duck, "q440_cluster_safe_split")


def test_q441_matches_oracle(spark, duck):
    compare_query(spark, duck, "q441_mv_selection")


def test_q442_matches_oracle(spark, duck):
    compare_query(spark, duck, "q442_embedding_drift")


def test_q440_zero_leakage_theorem_and_conservation(spark):
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q440_cluster_safe_split"](spark, SF_DIR).collect()
    safe = [r for r in rows if r["scheme"] == "cluster_safe"]
    naive = [r for r in rows if r["scheme"] == "naive"]
    # same doc universe on both schemes
    assert sum(r["n_docs"] for r in safe) == sum(r["n_docs"] for r in naive)
    # the theorem: cluster-keyed hashing cannot split a near-dup pair
    assert all(r["cross_pairs"] == 0 for r in safe)
    # and the naive scheme demonstrably leaks on this corpus
    assert all(r["cross_pairs"] > 0 for r in naive)


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


# doc_ids whose md5(id || ':split') bucket lands in 'train' (>= 5), so a
# corpus of only these leaves val and test EMPTY under both schemes
# (distinct texts -> no LSH candidates -> every cluster_id == doc_id)
_TRAIN_IDS = [1, 2, 3, 4, 5, 6, 7, 8]
_WORDS = ("alpha beta gamma delta", "epsilon zeta eta theta",
          "iota kappa lam mu", "nu xi omicron pi",
          "rho sigma tau upsilon", "phi chi psi omega",
          "one two three four", "five six seven eight")


def test_q440_empty_split_is_a_zero_row(spark, tmp_path):
    """The densify class (q215/q158/q214/q219), release-gate edition:
    'the test split has ZERO documents' is the loudest gate failure and
    must be an explicit zero row on the declared 2x3 spine — pre-r9 the
    cell silently vanished."""
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = [(i, w, "en", "s", len(w)) for i, w in zip(_TRAIN_IDS, _WORDS)]
    sf = _write_docs(spark, tmp_path, rows)
    out = {(r["scheme"], r["split"]): r
           for r in all_queries()["q440_cluster_safe_split"](spark, sf).collect()}
    assert set(out) == {(sch, sp) for sch in ("naive", "cluster_safe")
                        for sp in ("train", "val", "test")}
    for sch in ("naive", "cluster_safe"):
        assert out[(sch, "train")]["n_docs"] == len(_TRAIN_IDS)
        assert out[(sch, "val")]["n_docs"] == 0
        assert out[(sch, "test")]["n_docs"] == 0


def test_q450_lang_with_no_split_coverage_is_a_zero_cell(spark, tmp_path):
    """Same class, manifest edition: a language absent from a split is
    the 'no test coverage for lang X' signal — an explicit zero cell
    (fingerprint 0 by declared contract), never a missing row."""
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = [(i, w, "en", "s", len(w)) for i, w in zip(_TRAIN_IDS[:4], _WORDS)]
    rows += [(i, w, "fr", "s", len(w))
             for i, w in zip(_TRAIN_IDS[4:], _WORDS[4:])]
    sf = _write_docs(spark, tmp_path, rows)
    out = {(r["split"], r["lang"]): r
           for r in all_queries()["q450_corpus_release_manifest"](spark, sf).collect()}
    assert set(out) == {(sp, lg) for sp in ("train", "val", "test")
                        for lg in ("en", "fr")}
    for lg in ("en", "fr"):
        assert out[("train", lg)]["n_docs"] == 4
        for sp in ("val", "test"):
            cell = out[(sp, lg)]
            assert cell["n_docs"] == 0
            assert cell["n_tokens"] == 0
            assert cell["n_dups"] == 0
            assert cell["dup_rate_ppm"] == 0
            assert cell["fingerprint"] == 0


def test_q441_greedy_meets_submodular_bound(spark, duck):
    """Brute-force all C(7,3) view sets with the same benefit model and
    check greedy >= (1 - 1/e) * OPT (and report equality when greedy
    is exactly optimal, as it is on this lattice)."""
    from hoops_edge_database_etl_spark.queries import all_queries

    picks = all_queries()["q441_mv_selection"](spark, SF_DIR).collect()
    greedy_total = sum(r["marginal_gain"] for r in picks)
    assert len({r["mv_mask"] for r in picks}) == 3

    cols = {1: "o_orderpriority", 2: "year(o_orderdate)", 4: "o_orderstatus"}
    sizes = {}
    for mask in range(1, 8):
        sel = ", ".join(e for b, e in cols.items() if mask & b)
        sizes[mask] = duck.execute(
            f"SELECT COUNT(*) FROM (SELECT DISTINCT {sel} FROM orders) t"
        ).fetchone()[0]
    base = duck.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    workload = [(1, 20), (2, 12), (3, 8), (4, 10), (5, 4), (6, 6), (7, 2)]

    def total_benefit(ms):
        out = 0
        for q, f in workload:
            best = min(
                [sizes[m] for m in ms if (q & m) == q] or [base]
            )
            out += f * max(0, base - best)
        return out

    opt = max(total_benefit(ms) for ms in combinations(range(1, 8), 3))
    assert greedy_total >= (1 - 1 / np.e) * opt
    # sanity: the greedy picks' cumulative benefit equals the model's
    assert total_benefit([r["mv_mask"] for r in picks]) == greedy_total


def test_q442_numpy_replay_and_self_identity(spark, duck):
    from hoops_edge_database_etl_spark.queries import all_queries

    raw = duck.execute(
        "SELECT vec_id, label, embedding FROM embeddings"
    ).fetchall()
    got = {
        r["label"]: r
        for r in all_queries()["q442_embedding_drift"](spark, SF_DIR).collect()
    }
    by_label = {}
    for vid, lab, emb in raw:
        q = np.floor(np.array(emb, dtype=np.float64) * 4096 + 0.5).astype(np.int64)
        by_label.setdefault(lab, {"old": [], "new": []})[
            "old" if vid < 250 else "new"
        ].append(q)
    for lab, d in by_label.items():
        sa = np.sum(d["old"], axis=0)
        sb = np.sum(d["new"], axis=0)
        n1, n2 = len(d["old"]), len(d["new"])
        cos = float(sa @ sb) / (np.sqrt(float(sa @ sa)) * np.sqrt(float(sb @ sb)))
        shift_num = int(((sa * n2 - sb * n1) ** 2).sum())
        r = got[lab]
        assert (r["n_old"], r["n_new"]) == (n1, n2)
        assert abs(r["cos_centroid"] - cos) < 1e-12
        assert r["shift_num"] == shift_num
        # self-identity: a cohort against itself has cos ~1 and shift 0
        self_cos = float(sa @ sa) / (
            np.sqrt(float(sa @ sa)) * np.sqrt(float(sa @ sa))
        )
        assert abs(self_cos - 1.0) < 1e-12
        assert int(((sa * n1 - sa * n1) ** 2).sum()) == 0


def test_q451_matches_oracle(spark, duck):
    compare_query(spark, duck, "q451_mv_selection_fused")


def test_q451_fused_equals_textbook_q441(spark):
    """The one-scan GROUPING SETS lattice produces bit-identical picks to
    q441's seven-scan form — the shared-oracle crossover, asserted
    directly as well."""
    from hoops_edge_database_etl_spark.queries import all_queries

    qs = all_queries()
    a = sorted(tuple(r) for r in qs["q441_mv_selection"](spark, SF_DIR).collect())
    b = sorted(
        tuple(r) for r in qs["q451_mv_selection_fused"](spark, SF_DIR).collect()
    )
    assert a == b
