"""Tokenizer-training / corpus-mix queries (q228-q231) vs the oracle,
plus unit checks on the BPE greedy-application arithmetic."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_DIR, compare_query

from hoops_edge_database_etl_spark.queries import all_queries


@pytest.mark.parametrize(
    "name",
    [
        "q228_segment_dedup",
        "q229_bpe_merge_step",
        "q230_sql_lateral_topk",
        "q231_temperature_mix",
    ],
)
def test_tokenization_matches_oracle(spark, duck, name):
    compare_query(spark, duck, name)


def test_q228_conservation(spark):
    """kept <= total segments, and at least one doc keeps everything
    (the globally-first doc can lose nothing)."""
    rows = all_queries()["q228_segment_dedup"](spark, SF_DIR).collect()
    assert all(r["n_kept"] <= r["n_segments"] for r in rows)
    assert any(r["n_kept"] == r["n_segments"] for r in rows)
    total = sum(r["n_segments"] for r in rows)
    kept = sum(r["n_kept"] for r in rows)
    assert 0 < kept <= total


def test_q229_run_fold_handles_self_pair(spark):
    """Greedy x==y merges are floor(run/2) per maximal run — 'x x x'
    yields 1 merge, not the naive adjacency count of 2. Replays the
    fold expression from q229 on synthetic token arrays."""
    df = spark.createDataFrame(
        [
            (["x", "x", "x"], 1),          # one run of 3 -> 1
            (["x", "x", "x", "x"], 2),     # run of 4 -> 2
            (["x", "a", "x", "x"], 1),     # runs 1,2 -> 0+1
            (["a", "b"], 0),               # no x at all
            (["x"], 0),                    # run of 1 -> 0
        ],
        "l array<string>, expect int",
    )
    run_calc = F.aggregate(
        F.concat("l", F.array(F.lit(""))),
        F.struct(
            F.lit(0).cast("bigint").alias("m"), F.lit(0).cast("bigint").alias("r")
        ),
        lambda acc, tok: F.when(
            tok == F.lit("x"),
            F.struct(acc.m.alias("m"), (acc.r + 1).alias("r")),
        ).otherwise(
            F.struct(
                (acc.m + F.floor(acc.r / 2)).cast("bigint").alias("m"),
                F.lit(0).cast("bigint").alias("r"),
            )
        ),
        lambda acc: acc.m,
    )
    for row in df.select(run_calc.alias("got"), "expect").collect():
        assert row["got"] == row["expect"]


def test_q229_token_accounting(spark):
    rows = all_queries()["q229_bpe_merge_step"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["tokens_after"] == r["tokens_before"] - r["n_merges"]
        assert r["n_merges"] >= 0
    # the chosen pair is global: identical across sources
    assert len({(r["pair_left"], r["pair_right"]) for r in rows}) == 1


def test_q231_shares_sum_below_unity(spark):
    rows = all_queries()["q231_temperature_mix"](spark, SF_DIR).collect()
    s = sum(r["share_ppm"] for r in rows)
    assert 0 < s <= 1_000_000  # floor-division shares can undershoot only


@pytest.mark.parametrize(
    "name", ["q233_regex_pretokenize", "q234_kn_continuation_counts"]
)
def test_lm_counts_match_oracle(spark, duck, name):
    compare_query(spark, duck, name)


def test_q233_kinds_partition_vocab(spark):
    rows = all_queries()["q233_regex_pretokenize"](spark, SF_DIR).collect()
    kinds = {r["kind"] for r in rows}
    assert kinds == {"word", "number", "punct"}
    # a pre-token never mixes classes
    for r in rows:
        assert (r["kind"] == "word") == r["tok"].isalpha()
        assert (r["kind"] == "number") == r["tok"].isdigit()


def test_q234_type_counts_consistent(spark):
    rows = all_queries()["q234_kn_continuation_counts"](spark, SF_DIR).collect()
    # N1+(w1.) equals the number of distinct (w1, w2) rows sharing w1
    from collections import Counter
    by_w1 = Counter(r["w1"] for r in rows)
    by_w2 = Counter(r["w2"] for r in rows)
    for r in rows:
        assert r["n1plus_prefix"] == by_w1[r["w1"]]
        assert r["n1plus_cont"] == by_w2[r["w2"]]
        assert r["c"] >= 1


def test_q242_matches_oracle(spark, duck):
    compare_query(spark, duck, "q242_feature_hashing")


def test_q242_weight_conservation(spark):
    """Σ|weight| ≤ total tokens; bucket ids live in [0, 64)."""
    rows = all_queries()["q242_feature_hashing"](spark, SF_DIR).collect()
    assert rows
    assert all(0 <= r["bucket"] < 64 for r in rows)
    assert any(r["weight"] < 0 for r in rows) and any(r["weight"] > 0 for r in rows)


def test_q245_matches_oracle(spark, duck):
    compare_query(spark, duck, "q245_length_bucketed_batching")


def test_q245_waste_bounded_by_band_width(spark):
    rows = all_queries()["q245_length_bucketed_batching"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_docs"] <= 8
        # within a 16-token band, per-doc padding < band width
        assert r["padding_waste"] < 16 * r["n_docs"]
        assert r["max_len"] * r["n_docs"] - r["tokens"] == r["padding_waste"]


def test_q260_matches_oracle(spark, duck):
    compare_query(spark, duck, "q260_prefix_cache_analysis")


def test_q260_depth_structure(spark):
    rows = {
        r["depth"]: r
        for r in all_queries()["q260_prefix_cache_analysis"](spark, SF_DIR).collect()
    }
    assert set(rows) == {5, 10}
    for depth, r in rows.items():
        assert r["n_shared_groups"] <= r["n_prefix_groups"]
        assert r["cacheable_tokens"] == depth * (
            r["n_docs_covered"] - r["n_prefix_groups"]
        )
    # deeper prefixes can only fragment groups further
    assert rows[10]["n_prefix_groups"] >= rows[5]["n_prefix_groups"]


def test_q267_matches_oracle(spark, duck):
    compare_query(spark, duck, "q267_repeat_factor_manifest")


def test_q267_budget_exact(spark):
    """Largest-remainder apportionment: total copies == 1000 exactly,
    and per-source totals match their integer quotas."""
    from collections import defaultdict

    rows = all_queries()["q267_repeat_factor_manifest"](spark, SF_DIR).collect()
    per_src = defaultdict(int)
    for r in rows:
        per_src[r["source"]] += r["n_copies"]
    assert sum(per_src.values()) == 1000
    # within each source, doc repeat counts differ by at most 1
    per_src_counts = defaultdict(list)
    for r in rows:
        per_src_counts[r["source"]].append(r["n_copies"])
    for src, counts in per_src_counts.items():
        assert max(counts) - min(counts) <= 1
