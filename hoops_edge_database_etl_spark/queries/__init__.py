"""Query registry: every operator from SURVEY.md §2 exposed as a named query.

Each query is a callable ``(spark, sf_dir) -> DataFrame`` registered together
with (when SQL-expressible) a DuckDB oracle SQL string computing the identical
result on the same parquet tables. The driver runs both sides at sf0.01 and
hash-compares — so Spark column aliases and oracle ``AS`` names must match,
floats are rounded identically on both sides, and dates are emitted as
formatted strings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is DuckDB SQL or None (rows-only)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# Names the per-round driver has never verdict-ed (it caps each round at ~50
# queries, walked in dict order).  Emit these FIRST so CORRECTNESS_r03 finally
# covers them; everything else follows in registration order.  Remove names
# from this list once a CORRECTNESS_r{N}.json row exists for them.
_DRIVER_PRIORITY = [
    "q61_jacobi_exact",
    "q62_dedup_clusters",
    "q63_ann_ivf",
    "q66_binary_metadata",
    "q68_dataset_split",
    "q69_dedup_corpus",
    "q70_training_corpus",
    "q71_streaming_rollup",
    "q72_kmv_distinct_sketch",
    "q73_stratified_sample",
    "q74_sequence_packing",
    "q77_sql_cube",
    "q78_sql_exists",
    "q79_hll_distinct",
    "q80_histogram_quantiles",
    "q81_bloom_semi_join",
    "q82_decontamination",
    "q83_sql_grouping_sets",
    "q84_boilerplate_ngrams",
    "q85_topk_per_group",
    "q86_rating_spine",
    "q89_funnel",
    "q90_cohort_retention",
    "q91_gapfill_interpolate",
    "q92_keyword_extraction",
    "q93_exact_quantile_select",
    "q94_pagerank_exact",
    "q95_streaming_dedup",
    "q96_sql_rank_suite",
    "q97_sql_set_ops",
    "q98_pii_scrub",
    "q99_repetition_filter",
    "q100_row_ids",
    "q101_scd2_merge",
    "q102_snapshot_diff",
    "q103_label_centroids",
    "q104_skew_profile",
    "q105_region_revenue",
    "q106_shipping_priority",
    "q107_grouped_median",
    "q108_vector_norms",
    "q109_source_mix",
    "q110_vocab_head",
    "q111_weighted_sample",
    "q112_ordered_group_concat",
    "q87_skew_join_salted",
    "q88_skew_join_unsalted",
    "q53_iterative_ratings",
]


def _prioritized(d: dict) -> dict:
    head = {k: d[k] for k in _DRIVER_PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def all_queries() -> dict[str, QueryFn]:
    _load_modules()
    return _prioritized(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_modules()
    return _prioritized(_ORACLES)


_LOADED = False


def _load_modules() -> None:
    """Import every query module exactly once (registration side effects)."""
    global _LOADED
    if _LOADED:
        return
    # windows first: the r1 verify run was killed before reaching the last
    # module, leaving q31-q40 with no oracle verdict; registration order is
    # the driver's execution order, so front-load the family that has never
    # been checked and keep the cheapest families early overall.
    from hoops_edge_database_etl_spark.queries import (  # noqa: F401
        windows,  # isort: skip
        core,
        joins,
        aggregates,
        sql_corpus,
        textstats,
        dedup_text,
        similarity,
        solver,
        sketches,
        streamq,
        events_analytics,
        cdc,
    )

    _LOADED = True
