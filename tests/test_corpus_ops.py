"""Invariants for chunking (q131) and domain-mixture planning (q132)."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from tests.conftest import SF_DIR


def _q(name):
    from hoops_edge_database_etl_spark.queries import all_queries

    return all_queries()[name]


def test_chunks_cover_every_token_with_stride(spark):
    from hoops_edge_database_etl_spark.queries.textstats import CHUNK_S, CHUNK_W
    from hoops_edge_database_etl_spark.tables import load

    n_tok = {
        r["doc_id"]: r["n"]
        for r in load(spark, SF_DIR, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in _q("q131_doc_chunks")(spark, SF_DIR).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(n_tok)
    for doc_id, chunks in by_doc.items():
        n = n_tok[doc_id]
        chunks.sort(key=lambda r: r["chunk_idx"])
        assert [c["chunk_idx"] for c in chunks] == list(range(math.ceil(n / CHUNK_S)))
        # every chunk is full-width except possibly trailing ones; the
        # final token of the doc is inside the last chunk
        for c in chunks[:-1]:
            assert c["n_tokens_chunk"] <= CHUNK_W
        last = chunks[-1]
        assert last["chunk_idx"] * CHUNK_S + last["n_tokens_chunk"] == n
        assert chunks[0]["n_tokens_chunk"] == min(CHUNK_W, n)


def test_domain_mix_flattens_and_respects_budget(spark):
    from hoops_edge_database_etl_spark.queries.textstats import MIX_BUDGET

    rows = _q("q132_domain_mix")(spark, SF_DIR).collect()
    assert rows
    assert sum(r["target_tokens"] for r in rows) <= MIX_BUDGET
    tot_in = sum(r["n_tokens"] for r in rows)
    tot_target = sum(r["target_tokens"] for r in rows)
    for r in rows:
        # hash-residual multiplicities realize the target to within the
        # statistical envelope of the per-doc Bernoulli draws (generous
        # 3σ-ish bound — tiny strata at sf0.001 are the worst case)
        assert abs(r["tokens_out"] - r["target_tokens"]) <= max(
            250, 0.25 * r["target_tokens"]
        )
        # temperature < 1 flattens: small sources gain share, large lose
        in_share = r["n_tokens"] / tot_in
        out_share = r["target_tokens"] / tot_target
        if in_share < 1 / len(rows):
            assert out_share >= in_share * 0.99


def test_zorder_skips_more_than_linear(spark):
    rows = {r["layout"]: r for r in _q("q133_zorder_skipping")(spark, SF_DIR).collect()}
    z, lin = rows["zorder"], rows["linear_x"]
    # both layouts find the same matches; stats-based pruning never loses rows
    assert z["rows_matched"] == lin["rows_matched"] > 0
    assert z["rows_scanned"] >= z["rows_matched"]
    assert lin["rows_scanned"] >= lin["rows_matched"]
    # the point of z-order: fewer blocks and rows touched for a 2-D box
    assert z["n_blocks_scanned"] < lin["n_blocks_scanned"]
    assert z["rows_scanned"] < lin["rows_scanned"]


def test_incremental_merge_equals_full_recompute(spark):
    import pyspark.sql.functions as F2

    from hoops_edge_database_etl_spark.queries.cdc import merge_partial_aggs
    from hoops_edge_database_etl_spark.tables import load

    li = load(spark, SF_DIR, "lineitem")

    def partial(batch):
        return batch.groupBy("l_returnflag").agg(
            F2.count(F2.lit(1)).alias("n"),
            F2.sum(F2.col("l_quantity").cast("decimal(18,2)")).alias("sq"),
        )

    # three arbitrary batch splits must merge to the one-shot answer
    b1 = partial(li.filter(F2.col("l_orderkey") % 3 == 0))
    b2 = partial(li.filter(F2.col("l_orderkey") % 3 == 1))
    b3 = partial(li.filter(F2.col("l_orderkey") % 3 == 2))
    merged = merge_partial_aggs(b1.unionByName(b2).unionByName(b3), ["l_returnflag"])
    want = partial(li)
    got = {r["l_returnflag"]: (r["n"], r["sq"]) for r in merged.collect()}
    exp = {r["l_returnflag"]: (r["n"], r["sq"]) for r in want.collect()}
    assert got == exp


def test_substring_decontaminate_agrees_with_contains(spark):
    """The position-explode hash-join plan equals a naive per-doc
    contains() scan over the same pattern set."""
    import pyspark.sql.functions as F2

    from hoops_edge_database_etl_spark.queries.textstats import (
        SUBSTR_PAT_LEN,
        SUBSTR_PAT_OFF,
    )
    from hoops_edge_database_etl_spark.tables import load

    d = load(spark, SF_DIR, "documents")
    pats = [
        r["pat"]
        for r in d.filter(
            (F2.col("doc_id") % 97 == 0)
            & (F2.col("n_chars") >= SUBSTR_PAT_OFF + SUBSTR_PAT_LEN)
        )
        .select(F2.substring("text", SUBSTR_PAT_OFF, SUBSTR_PAT_LEN).alias("pat"))
        .distinct()
        .collect()
    ]
    assert pats
    naive = {
        r["doc_id"]: r["n"]
        for r in d.select(
            "doc_id",
            sum(
                F2.when(F2.col("text").contains(p), 1).otherwise(0) for p in pats
            ).alias("n"),
        )
        .filter(F2.col("n") > 0)
        .collect()
    }
    got = {
        r["doc_id"]: r["n_patterns_hit"]
        for r in _q("q138_substring_decontaminate")(spark, SF_DIR).collect()
    }
    assert got == naive


def test_session_conversion_bounds(spark):
    rows = _q("q139_session_conversion")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_sessions"]
        assert r["n_converted_sessions"] <= r["n_sessions_with_view"] <= r["n_sessions"]
        assert r["max_session_events"] >= 1


def test_vocab_ids_dense_and_frequency_ordered(spark):
    rows = _q("q148_vocab_ids")(spark, SF_DIR).collect()
    assert rows
    rows.sort(key=lambda r: r["vocab_id"])
    assert [r["vocab_id"] for r in rows] == list(range(len(rows)))
    for a, b in zip(rows, rows[1:]):
        assert (a["cnt"], b["token"]) >= (b["cnt"], a["token"]) or a["cnt"] > b["cnt"]
        assert a["cnt"] >= b["cnt"]


def test_bloom_skipping_never_misses(spark):
    """Bloom pruning is conservative: candidate blocks ⊇ actual blocks,
    and a probe that exists somewhere always scans >= its actual rows."""
    rows = _q("q149_bloom_block_skipping")(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_blocks_actual"] <= r["n_blocks_maybe"] <= r["n_blocks"]


def test_bigram_surprise_floor_bounds(spark, duck):
    """Score ≥ 1000 per bigram (c1 ≥ c12 always), so avg ≥ 1000; docs
    with repeated runs score near the floor."""
    from tests.conftest import compare_query
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q170_bigram_surprise")
    rows = all_queries()["q170_bigram_surprise"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["surprise_avg"] >= 1000.0
        assert r["surprise_total"] >= 1000 * r["n_bigrams"]


def test_normalized_dedup_clusters_planted_variants(spark, duck):
    from tests.conftest import compare_query
    from hoops_edge_database_etl_spark.queries.dedup_text import (
        normalized_dedup_clusters,
    )

    compare_query(spark, duck, "q175_normalized_dedup")
    d = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello world"),
            (3, "HELLO   world"),
            (4, "a different document"),
            (5, "A different document?"),
            (6, "unique text here"),
        ],
        "doc_id long, text string",
    )
    rows = {r["canonical_id"]: r["n_members"] for r in normalized_dedup_clusters(d).collect()}
    assert rows == {1: 3, 4: 2}


def test_oov_rate_bounds_and_head_coverage(spark, duck):
    from tests.conftest import compare_query
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q177_oov_rate")
    rows = all_queries()["q177_oov_rate"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert abs(r["oov_rate"] - r["n_oov"] / r["n_tokens"]) < 1e-15


def test_sparse_cosine_full_pair_matrix(spark, duck):
    from tests.conftest import compare_query
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q181_sparse_cosine_sources")
    rows = all_queries()["q181_sparse_cosine_sources"](spark, SF_DIR).collect()
    assert len(rows) == 190  # C(20, 2) source pairs
    for r in rows:
        assert 0.0 < r["cosine"] <= 1.0 + 1e-12


def test_explode_outer_preserves_docs(spark, duck):
    from tests.conftest import compare_query
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q192_explode_outer")
    rows = all_queries()["q192_explode_outer"](spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in rows) == 500
    for r in rows:
        assert r["n_exploded_rows"] == r["n_long_tokens"] + r["n_docs_without"]


def test_q266_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q266_safety_blocklist")


def test_q266_verdict_logic(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q266_safety_blocklist"](spark, SF_DIR).collect()
    assert len(rows) == 500
    seen = set()
    for r in rows:
        seen.add(r["verdict"])
        if r["n_high"] > 0:
            assert r["verdict"] == "block"
        elif r["n_low"] >= 3:
            assert r["verdict"] == "review"
        else:
            assert r["verdict"] == "pass"
    assert "block" in seen and "pass" in seen


def test_q277_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q277_masking_policy")


def test_q277_mask_properties(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.tables import load

    names = {
        r["c_custkey"]: r["c_name"]
        for r in load(spark, SF_DIR, "customer").select("c_custkey", "c_name").collect()
    }
    rows = all_queries()["q277_masking_policy"](spark, SF_DIR).collect()
    assert len(rows) == 1500
    for r in rows[:100]:
        orig = names[r["c_custkey"]]
        assert len(r["name_masked"]) == len(orig)  # length-preserving
        assert r["name_masked"][:9] == orig[:9]
        assert set(r["name_masked"][9:]) <= {"*"}
        assert r["acctbal_band_dollars"] % 1000 == 0


def test_q286_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q286_dataset_fingerprint")


def test_q286_fingerprint_detects_change(spark, duck):
    """Removing one document must change the fingerprint pair."""
    base = {
        r[0]: (r[2], r[3])
        for r in duck.execute("""
          WITH hashed AS (
            SELECT CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'),
                             1, 8) AS BIGINT) % 100 < 2 THEN 'test'
                        WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'),
                             1, 8) AS BIGINT) % 100 < 5 THEN 'val'
                        ELSE 'train' END AS split,
                   CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % 2147483647 AS h
            FROM documents WHERE doc_id <> 0
          )
          SELECT split, CAST(COUNT(*) AS BIGINT),
                 CAST(CAST(SUM(CAST(h AS DECIMAL(38,0))) AS DECIMAL(38,0))
                      % 9223372036854775807 AS BIGINT),
                 CAST(CAST(SUM(CAST(h AS DECIMAL(38,0)) * CAST(h AS DECIMAL(38,0)))
                      AS DECIMAL(38,0)) % 9223372036854775807 AS BIGINT)
          FROM hashed GROUP BY split
        """).fetchall()
    }
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    full = {
        r["split"]: (r["fingerprint"], r["fingerprint2"])
        for r in all_queries()["q286_dataset_fingerprint"](spark, SF_DIR).collect()
    }
    changed = [s for s in full if s in base and full[s] != base[s]]
    assert changed  # doc 0's split must show a different fingerprint


def test_q303_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q303_grouped_kfold")


def test_q303_folds_partition_groups(spark):
    """Every customer's rows land in exactly one fold; folds are
    near-balanced (each within 3x of uniform at this sf)."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.textstats import KFOLD_K
    from hoops_edge_database_etl_spark.tables import load

    rows = all_queries()["q303_grouped_kfold"](spark, SF_DIR).collect()
    assert {r["fold"] for r in rows} == set(range(KFOLD_K))
    total_groups = sum(r["n_groups"] for r in rows)
    distinct_custs = (
        load(spark, SF_DIR, "orders").select("o_custkey").distinct().count()
    )
    # equality <=> no customer appears in two folds
    assert total_groups == distinct_custs
    uniform = total_groups / KFOLD_K
    for r in rows:
        assert uniform / 3 <= r["n_groups"] <= uniform * 3


def test_q304_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q304_encoding_audit")


def test_q304_flags_exactly_injected_docs(spark, duck):
    """Replacement-char and markup flags must both equal the injection
    subset size per source — computed independently in DuckDB."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.textstats import ENC_CORRUPT_MOD

    got = {
        r["source"]: r
        for r in all_queries()["q304_encoding_audit"](spark, SF_DIR).collect()
    }
    expected = dict(
        duck.execute(
            f"""
            SELECT source, SUM(CASE WHEN CAST('0x' ||
                substr(md5(CAST(doc_id AS VARCHAR) || ':enc'), 1, 8) AS BIGINT)
                % {ENC_CORRUPT_MOD} = 0 THEN 1 ELSE 0 END)
            FROM documents GROUP BY source
            """
        ).fetchall()
    )
    assert set(got) == set(expected)
    for src, r in got.items():
        assert r["docs_with_replacement"] == expected[src]
        assert r["docs_with_markup"] == expected[src]
        # 3 extra bytes per injected doc, zero elsewhere (corpus is ASCII)
        assert r["multibyte_extra_bytes"] == 3 * expected[src]


def test_q305_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q305_utf8_accounting")


def test_q305_ascii_corpus_ratios(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    for r in all_queries()["q305_utf8_accounting"](spark, SF_DIR).collect():
        assert r["bytes"] >= r["chars"]
        assert r["bytes_per_char"] >= 1.0
        assert 0 <= r["ascii_only_docs"] <= r["n_docs"]


def test_q322_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q322_truncation_loss")


def test_q322_loss_accounting(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.textstats import (
        TRUNC_CONTEXT_TOKENS,
    )

    rows = all_queries()["q322_truncation_loss"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["tokens_lost"] <= r["total_tokens"]
        assert 0 <= r["docs_truncated"] <= r["n_docs"]
        if r["docs_truncated"]:
            # each truncated doc lost at least one token
            assert r["tokens_lost"] >= r["docs_truncated"]
            # and kept its full budget
            assert (
                r["tokens_lost"]
                <= r["total_tokens"] - r["docs_truncated"] * TRUNC_CONTEXT_TOKENS
            )


def test_q326_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q326_mix_schedule")


def test_q326_prefixes_track_target_mix(spark):
    """The WFQ guarantee: in every prefix of the schedule, each
    language's count stays within one stride of its target share."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.textstats import MIX_WEIGHTS_PPM

    rows = sorted(
        all_queries()["q326_mix_schedule"](spark, SF_DIR).collect(),
        key=lambda r: r["schedule_idx"],
    )
    assert [r["schedule_idx"] for r in rows] == list(range(1, len(rows) + 1))
    counts = dict.fromkeys(MIX_WEIGHTS_PPM, 0)
    for i, r in enumerate(rows, start=1):
        counts[r["lang"]] += 1
        for lang, w in MIX_WEIGHTS_PPM.items():
            expected = i * w / 1_000_000
            assert abs(counts[lang] - expected) <= 2.0, (i, lang)


def test_q354_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q354_randomized_response")


def test_q354_debiasing_and_deniability(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    [r] = all_queries()["q354_randomized_response"](spark, SF_DIR).collect()
    # debiasing identity
    assert abs(r["estimated_rate"] - (r["n_yes"] / r["n"] - 0.25) / 0.5) < 1e-12
    # the estimate should land near the hidden truth (hash coins are fair)
    assert abs(r["estimated_rate"] - r["true_rate"]) < 0.1
    # deniability: a meaningful share of answers disagree with the truth
    [(n_flips,)] = duck.execute(
        """SELECT COUNT(*) FROM (
             SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS sens,
                    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':rr'),
                         1, 8) AS BIGINT) % 4 AS coin
             FROM documents)
           WHERE (CASE WHEN coin <= 1 THEN sens
                       WHEN coin = 2 THEN 1 ELSE 0 END) <> sens"""
    ).fetchall()
    assert 0.1 * r["n"] < n_flips < 0.45 * r["n"]


def test_q368_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q368_chao1_richness")


def test_q368_chao1_bounds_and_saturation(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q368_chao1_richness"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["chao1_estimate"] >= r["s_obs"]
        assert r["f1"] + r["f2"] <= r["s_obs"]
        if r["f1"] == 0:
            assert r["chao1_estimate"] == r["s_obs"]  # saturated corpus


def test_q371_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q371_adversarial_validation")


def test_q371_hash_split_passes_biased_split_fails(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    [r] = all_queries()["q371_adversarial_validation"](spark, SF_DIR).collect()
    assert r["split_unbiased"] == (abs(r["auc"] - 0.5) < 0.1)
    assert r["split_unbiased"]
    assert 0.4 < r["auc"] < 0.6

    # a split BY LENGTH must be trivially distinguishable by length
    rows = duck.execute(
        """WITH l AS (
             SELECT n_chars,
                    CASE WHEN n_chars >= (SELECT quantile_disc(n_chars, 0.8)
                                          FROM documents)
                         THEN 1 ELSE 0 END AS is_test
             FROM documents)
           SELECT is_test, n_chars FROM l"""
    ).fetchall()
    test_vals = sorted(v for t, v in rows if t)
    train_vals = sorted(v for t, v in rows if not t)
    import bisect

    wins = ties = 0
    for v in test_vals:
        lo = bisect.bisect_left(train_vals, v)
        hi = bisect.bisect_right(train_vals, v)
        wins += lo
        ties += hi - lo
    auc = (wins + ties / 2) / (len(test_vals) * len(train_vals))
    assert auc > 0.95


def test_q375_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q375_fractional_knapsack")


def test_q375_budget_exact_and_greedy_dominance(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.textstats import (
        KNAPSACK_TOKEN_BUDGET,
    )
    from hoops_edge_database_etl_spark.tables import load
    import pyspark.sql.functions as FF

    rows = all_queries()["q375_fractional_knapsack"](spark, SF_DIR).collect()
    assert rows
    spent = sum(r["tokens"] * r["take_ppm"] / 1_000_000 for r in rows)
    assert abs(spent - KNAPSACK_TOKEN_BUDGET) < 1.0  # fractional boundary
    assert sum(1 for r in rows if r["take_ppm"] < 1_000_000) <= 1
    min_density = min(r["density_ppm"] for r in rows)
    excluded = (
        load(spark, SF_DIR, "documents")
        .select(
            "doc_id",
            FF.expr(
                "size(array_distinct(split(text, ' '))) * 1000000"
                " DIV size(split(text, ' '))"
            ).alias("density_ppm"),
        )
        .filter(~FF.col("doc_id").isin([r["doc_id"] for r in rows]))
        .agg(FF.max("density_ppm"))
        .collect()[0][0]
    )
    # no excluded doc strictly denser than every included doc
    assert excluded <= min_density or excluded is None


def test_q383_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q383_langid_eval")


def test_q383_matrix_reconciles_with_q49(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q383_langid_eval"](spark, SF_DIR).collect()
    [(n_docs,)] = duck.execute("SELECT COUNT(*) FROM documents").fetchall()
    assert sum(r["n_docs"] for r in rows) == n_docs
    # the matrix must agree with q49's per-doc predictions exactly
    preds = all_queries()["q49_lang_id"](spark, SF_DIR).collect()
    from collections import Counter

    want = Counter((p["labeled_lang"], p["predicted_lang"]) for p in preds)
    got = {(r["labeled_lang"], r["predicted_lang"]): r["n_docs"] for r in rows}
    assert got == dict(want)
    # the stopword classifier on synthetic word-soup text is noisy but
    # must clearly beat the 20% chance line
    diag = sum(v for (l, p), v in got.items() if l == p)
    assert diag > int(1.5 * n_docs / 5)


def test_q384_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q384_tokenizer_fertility")


def test_q384_fertility_floor_and_byte_chain(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q384_tokenizer_fertility"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["fertility"] >= 1.0  # every word yields >= 1 subtoken
        assert r["bytes_per_subtoken"] > 0
        assert r["subtokens"] >= r["words"]


def test_q404_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q404_preference_pairs")


def test_q404_pair_semantics(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.textstats import (
        PREF_MARGIN,
        PREF_PAIRS_PER_GROUP,
    )

    rows = all_queries()["q404_preference_pairs"](spark, SF_DIR).collect()
    assert rows
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], []).append(r)
        assert r["gap"] >= PREF_MARGIN
        assert r["chosen"] != r["rejected"]
    for lang, pairs in per_lang.items():
        assert len(pairs) <= PREF_PAIRS_PER_GROUP
        ranks = sorted(p["rnk"] for p in pairs)
        assert ranks == list(range(1, len(pairs) + 1))
        gaps = [p["gap"] for p in sorted(pairs, key=lambda p: p["rnk"])]
        assert gaps == sorted(gaps, reverse=True)
