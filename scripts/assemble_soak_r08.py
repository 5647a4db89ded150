"""Assemble SOAK_r08.json from the round-8 scratch soak runs:
.scratch/soak_r8_sample.json (SOAK_SET=sample:20, seed 8 — the
never-soaked tail, VERDICT r7 item 3) and the jittered-fixture recheck
runs (.scratch/soak_r8_jitter3.json + .scratch/soak_r8_q287.json,
VERDICT r7 item 7). Adjudication notes are curated here."""

from __future__ import annotations

import json

NOTES = {
    # sampled never-soaked tier (slopes are t(sf1)/t(sf0.1), data ratio 10;
    # slope < 10 = sub-linear wall growth)
    "q112_ordered_group_concat": "per-user sort+concat windows; user count 10x, slope 1.2 - fixed stage cost dominates the sub-second wall",
    "q122_cooccurrence_lift": "per-doc token-pair explode (pair width set by doc length, unchanged at sf1) + pair rollup; linear in docs, slope 1.7",
    "q151_expectations": "columnar expectation suite = a handful of single-scan aggregates; slope 1.65, scan-bound",
    "q177_oov_rate": "token explode + broadcast top-256 vocab + per-source rollup; token volume 10x, wall 3.2x - combiner-bound, sub-linear",
    "q183_sql_set_ops_all": "fixed set-op battery over orders/lineitem; slope 1.23, scan-bound",
    "q210_golden_record": "per-entity survivorship windows; slope 1.41 on a sub-second wall",
    "q21_weighted_avg": "single grouped aggregate; slope 1.07 - pure fixed cost",
    "q233_regex_pretokenize": "map-only JVM regex split over documents; token volume 10x, wall 3.1x - codegen scan, sub-linear",
    "q242_feature_hashing": "token explode + (doc,bucket) combiner agg; token volume 10x, wall 6.2x - the closest-to-linear row in the sample, as expected for the highest per-row work share; no super-linear stage",
    "q30_duplicate_stats": "PK dup-count rollup; slope 0.9 - fixed cost, big side even benefits from better partition fill",
    "q312_bitemporal_audit": "two-clock as-of windows over a fixed restatement table; slope 1.05",
    "q321_seasonal_naive_backtest": "lag-7 window + error rollup over the daily spine (calendar-bounded, days unchanged at sf1); slope 1.21",
    "q327_diff_in_diff": "2x2 group means + interaction; slope 1.18, fixed",
    "q352_binary_segmentation": "recursive split over the 30-day daily series (calendar-bounded state); slope 1.07",
    "q355_eb_shrinkage": "per-user rates + grand-prior shrink; user count 10x, slope 1.54",
    "q368_chao1_richness": "token histogram -> f1/f2 singleton/doubleton counts; token volume 10x, wall 2.7x, combiner-bound",
    "q371_adversarial_validation": "hash-split + per-feature AUC ranks; slope 1.18",
    "q377_state_size_advisor": "TTL-grid x day windowed distinct-user join (days fixed at 30, users 10x -> join output 10x); wall 3.3x, sub-linear per output row",
    "q458_vocab_growth": "prefix-sampled Heaps curve: first-seen rank + cumulative distinct counts; token volume 10x, wall 2.2x",
    "q68_dataset_split": "stable-hash split + per-split counts; slope 1.72 on a 0.2 s wall - pure overhead",
    # sampled tier 2 (seed 9, drawn after tier 1 landed in the artifact)
    "q92_keyword_extraction": "tf-idf top-k: token explode + df rollup + per-doc rank; token volume 10x, wall 4.2x, combiner-bound",
    "q457_bm25_topk": "BM25 scoring over the inverted postings; postings 10x, wall 3.5x - one scan + rank, sub-linear",
    "q299_watermark_advisor": "per-type lateness histogram over the fixed calendar; slope 1.87 on a sub-second wall",
    "q76_pivot": "fixed-width pivot; slope 1.77, fixed cost",
    "q90_cohort_retention": "cohort x week matrix bounded by the 30-day calendar; slope 1.7",
    "q467_lz78_complexity": "per-user phrase-dictionary fold (sequence lengths unchanged at sf1 - users grow instead); slope 1.65",
    "q301_key_gap_audit": "orderkey gap scan, one sort-free window; slope 1.51",
    "q152_ols_scoring": "closed-form OLS moments + scoring, two scans; slope 1.46",
    "q189_confusion_matrix": "fixed 2x2 rollup; slope 1.24",
    "q329_density_grid": "fixed lat/lon grid histogram; slope 1.21",
    "q213_bitmap_presence": "day-bitmap OR-fold per user; slope 1.13",
    "q421_neyman_allocation": "per-stratum variance + allocation over 5 strata; slope 1.1",
    "q465_ljung_box": "calendar-spine day-count ACF per type (state is days, not events); slope 1.1",
    "q262_churn_labels": "per-user last-activity labels; slope 1.06",
    "q372_event_study": "fixed event-window means around planted dates; slope 1.03",
    "q204_sql_grouping_id": "GROUPING SETS rollup; slope 0.98 - fixed cost dominates",
    "q325_partition_advisor": "file/row-group stats advisory, metadata-bound; slope 0.92",
    "q392_dominant_period": "fixed-grid Goertzel over the daily series (calendar-bounded); slope 0.9",
    "q121_interval_concurrency": "sweep-line over session intervals; slope 0.87 - big side benefits from fuller partitions",
    "q06_safe_division": "single projection scan; slope 0.83, pure fixed cost",
    # sampled tier 3 (seed 10)
    "q403_effective_size": "n_eff from the lag-1 ACF over the daily series (calendar-bounded); slope 1.9 on a 0.3 s wall",
    "q310_price_volume_mix": "PVM bridge over two period aggregates; slope 1.84",
    "q471_shuffle_audit": "plan-introspection advisory, metadata-bound; slope 1.53",
    "q155_audience_overlap": "per-pair KMV-style overlap over 5 event types (fixed pair grid); slope 1.47",
    "q464_levenshtein_blocking": "blocked candidate pairs, bounded DP; slope 1.45",
    "q207_map_column_ops": "map-column HOF projection scan; slope 1.42",
    "q119_pareto_frontier": "local-skyline mapInPandas + bounded merge; slope 1.41",
    "q36_interval_integration": "garbage-minute integration windows; slope 1.34",
    "q261_uplift_deciles": "hash-arm deciles, two rollups; slope 1.25",
    "q39_moving_average": "bounded-frame window; slope 1.23",
    "q91_gapfill_interpolate": "day-spine gapfill + interpolation windows (calendar-bounded); slope 1.17",
    "q27_anomaly_detection": "per-day z-scores over the daily rollup; slope 1.16",
    "q127_mad_outliers": "per-type MAD via double median; slope 1.14",
    "q333_median_ci": "order-stat CI from the value histogram; slope 1.11",
    "q389_apdex": "threshold-bucket rollup; slope 1.07",
    "q238_exact_auc": "rank-identity AUC over the value histogram; slope 1.02",
    "q11_dim_enrich_join": "broadcast dim enrich; slope 0.96 - fixed cost",
    "q424_kde_epanechnikov": "fixed-grid KDE vs broadcast grid; slope 0.87",
    "q104_skew_profile": "per-key skew stats; slope 0.62 - big side fills partitions better",
    "q402_elbow_wcss": (
        "CAUGHT LIVE #2 this round: int64 ARITHMETIC_OVERFLOW at sf1 - "
        "each per-vector quantized distance fits int64 (<= 64 dims x "
        "(2Q)^2 ~ 7e16) but the CORPUS-level WCSS sum is n of those and "
        "20k vectors cleared 9.2e18. Fixed: DECIMAL(38,0) accumulator in "
        "BOTH engines (the house DECIMAL-money rule applied to distance "
        "mass), schema-pinned by test_elbow_wcss_accumulates_in_decimal; "
        "re-soaked clean, slope 1.65"
    ),
    # sampled tier 4 (seed 11)
    "q236_phrase_search": "positional-postings phrase join; postings 10x, wall 2.3x, sub-linear",
    "q415_littles_law": "interval concurrency + arrival/latency rollups; slope 1.79",
    "q305_utf8_accounting": "byte/char-length projection scan; slope 1.69, fixed cost",
    "q72_kmv_distinct_sketch": "KMV bottom-k per type; slope 1.67 on a 0.3 s wall",
    "q394_negative_binomial_fit": "method-of-moments NB fit over per-user counts; slope 1.65",
    "q485_weighted_jaccard": "per-user type-weight vectors, bounded pair join (5 types); slope 1.64",
    "q231_temperature_mix": "source-mix reweighting rollup; slope 1.57",
    "q171_decile_lift": "NTILE deciles + lift; slope 1.56",
    "q234_kn_continuation_counts": "Kneser-Ney continuation counts, two rollups; slope 1.46",
    "q78_sql_exists": "EXISTS semi-join battery; slope 1.38, scan-bound",
    "q169_unpivot_long": "stack() unpivot scan; slope 1.37",
    "q446_sampled_join_estimate": "hash-sampled join cardinality estimate; slope 1.32",
    "q134_incremental_agg": "mergeable-state MV maintenance; slope 1.21",
    "q94_pagerank_exact": "fixed-iteration pagerank on the supplier graph (graph size data-independent enough here); slope 1.14",
    "q397_profit_threshold": "threshold sweep over grouped sums; slope 1.13",
    "q444_sql_group_by_all": "GROUP BY ALL rollup; slope 1.11",
    "q363_mann_kendall": "pairwise-sign trend over the 30-day daily series (calendar-bounded n^2=435 pairs); slope 1.1",
    "q406_durbin_watson": "daily-series lag windows (calendar-bounded); slope 1.1",
    "q469_friedman_test": "complete-week block ranks (calendar-bounded); slope 1.05",
    "q201_trending_rank_delta": "two-window rank delta; slope 1.0",
    # sampled tier 6 (seed 13)
    "q273_codec_advisor": "per-column NDV + adjacent-repeat LAG over the (orderkey, linenumber) total order - a full-width sort per audited column, so wall tracks data (7.84x at 10x); sub-linear, and production amortizes all columns into one pass as the docstring states",
    "q311_popularity_bias": "rank-weighted exposure rollup; slope 3.02, scan-bound",
    "q296_daily_streaks": "gaps-and-islands per user; slope 2.06",
    "q277_masking_policy": "policy-driven projection scan; slope 1.82",
    "q447_quota_topk": "per-group quota rank; slope 1.82",
    "q322_truncation_loss": "clip-loss rollup; slope 1.71",
    "q265_rank_biased_overlap": "RBO prefix-overlap fold over two bounded rankings; slope 1.66",
    "q16_self_join_opponent": "game self-join on game_id; slope 1.53",
    "q161_gini_diversity": "per-user type-mix Gini; slope 1.49",
    "q19_referential_integrity": "FK anti-join battery; slope 1.44",
    "q324_double_charge_detector": "consecutive same-amount pair windows; slope 1.44",
    "q109_source_mix": "per-source composition rollup; slope 1.26",
    "q248_half_life_decay": "decay-weighted sums (fixed half-life grid); slope 1.21",
    "q124_touch_attribution": "per-user touch-sequence credit windows; slope 1.13",
    "q298_tiered_pricing": "tier CASE rollup; slope 1.12",
    "q427_good_turing": "frequency-of-frequencies smoothing; slope 1.12",
    "q198_iqr_outliers": "exact p25/p75 fences; slope 1.03",
    "q215_emd_drift": "10-bin densified CDF walk (fixed grid); slope 0.94",
    "q85_topk_per_group": "WindowGroupLimit top-k; slope 0.94",
    "q423_wilcoxon_signed_rank": "signed-rank over the paired-diff histogram; slope 0.42 - fixed cost dominates, big side fills partitions better",
    # sampled tier 5 (seed 12)
    "q266_safety_blocklist": "token explode vs broadcast blocklist; token volume 10x, wall 6.8x - data-proportional like q242, no super-linear stage",
    "q50_quality_score": "per-doc composite quality exprs; doc volume 10x, wall 3.4x, scan-bound",
    "q291_orphan_entity_sweep": "FK orphan anti-joins across the star; slope 3.2, join-bound, sub-linear",
    "q221_important_parts": "grouped part rollup + rank; slope 1.92",
    "q209_lorenz_concentration": "NTILE Lorenz curve; slope 1.59",
    "q365_covariate_balance": "per-arm SMD balance table; slope 1.55",
    "q445_hash_chain_ledger": "per-account md5 chain fold; slope 1.49",
    "q358_active_learning_batch": "uncertainty + diversity batch pick; slope 1.44",
    "q102_snapshot_diff": "full-outer snapshot diff; slope 1.4",
    "q295_coverage_gaps": "per-user day-gap windows; slope 1.19",
    "q347_simpson_guard": "stratified vs pooled rates; slope 1.11",
    "q360_link_prediction": "common-neighbor scores over the bounded co-purchase graph; slope 1.1",
    "q256_maxmin_fair_share": "water-filling allocation over grouped demands; slope 1.07",
    "q03_topk_orders": "ORDER BY LIMIT top-k; slope 1.05",
    "q420_sql_range_frames": "RANGE frame windows; slope 1.02",
    "q77_sql_cube": "CUBE rollup; slope 1.02",
    "q208_value_percentiles": "histogram percentiles; slope 0.96",
    "q340_var_cvar": "tail-mean over the value histogram; slope 0.85",
    "q432_locf_gapfill": "LOCF last-value windows; slope 0.78",
    "q404_preference_pairs": (
        "CAUGHT LIVE #3 this round: the brute-force within-lang pair "
        "join is docs-per-lang^2 - measured slope 63.29 (54.6 s at sf1). "
        "Rewritten as the EXTREME-PRUNED form the docstring had only "
        "stated: a top-K pair by (gap DESC, chosen, rejected) can only "
        "pair a top-K-quality chosen with a bottom-K rejected (proof in "
        "the docstring), so two WindowGroupLimit rank windows reduce "
        "each lang to K+K docs and the join is KxK. Hash-identical to "
        "the brute-force oracle on every gate run; re-soaked slope 1.11 "
        "(1.08 s), plan-pinned by test_preference_pairs_extreme_pruned"
    ),
    "q442_embedding_drift": (
        "overflow-sweep probe (the q402 class): shift_num squares "
        "cohort-sums of 12-bit-quantized components - worst case clears "
        "int64 near 1k vectors/cell, so it was soaked deliberately; "
        "measured clean at sf1 (real component sums are far below worst "
        "case, and ANSI mode makes any future overflow THROW, not wrap); "
        "slope 1.4"
    ),
    # stream-side audit triage (scripts/audit_stream_side.py)
    "q125_countmin_heavy_hitters": "AUDIT TRIAGE: flagged (grouped agg feeds the (j,col) sketch join); fan-out is the fixed sketch grid, not a data dimension - slope 1.13, benign",
    "q129_ts_interpolate": "AUDIT TRIAGE: flagged (day-spine left join under a grouped agg); fan-out bounded by the 30-day calendar - slope 1.27, benign",
    "q272_bloom_fpr_audit": "AUDIT TRIAGE: flagged (bit-position join); fan-out bounded by the fixed filter width - slope 2.09, benign",
    "q290_adstock_carryover": "AUDIT TRIAGE: flagged ((user,week) left join); fan-out bounded by user x 5 weeks - slope 1.06, benign",
    "q353_rolling_origin": "AUDIT TRIAGE: flagged (non-equi day-range BNLJ); fan-out bounded by folds x 30 days - slope 1.12, benign",
    "q466_page_hinkley": "AUDIT TRIAGE: flagged (day-spine left join); calendar-bounded - slope 1.13, benign",
    # jittered-fixture recheck
    "q412_dedup_clusters_star": "JITTERED fixture (riffle kills inter-copy shingle overlap): slope 3.51 (r7 plain replication) -> 3.13 - the LSH candidate-pair inflation was fixture, not plan; remaining growth is the honest near-dup graph",
    "q440_cluster_safe_split": "JITTERED: slope 3.92 -> 4.96. Plain replication had UNDERSTATED this query: collapsing 10 copies into one dup cluster shrank the split's grouped state; with copies distinct (the real 10x-crawl shape) the state is ~10x and wall growth is honestly ~5x, still sub-linear",
    "q450_corpus_release_manifest": "JITTERED: slope 4.52 -> 6.2, same understatement mechanism as q440 (manifest dedup/fingerprint tables now see ~10x distinct docs). Sub-linear vs the 10x data ratio; no plan change",
    "q287_behavior_edit_distance": None,  # filled from the measured run
}

Q287_NOTE = (
    "quadratic BY CONTRACT, and this soak's first pass caught a live "
    "plan bug: the band key is 2-3 distinct values, so the band "
    "equi-join streamed every pair onto 1-2 cores at sf0.1 (measured "
    "45.8 s; the r7 row's 1.9 s predates the band-plan swap and was "
    "never re-timed). Fix = salt the join to (band, salt), re-spread "
    "the STREAM side, pin the build side: 5.4 s stable at sf0.1. "
    "Counted pairs grow 1.12M -> 112.3M (100.08x) at 10x users; wall "
    "5.4 -> 566 s tracks pair growth at constant per-pair cost - the "
    "honest quadratic, now guaranteed wide at every scale (the unsalted "
    "sf1 run's 447 s only looked competitive because AQE happened to "
    "leave the bigger agg output multi-partition; sf0.1 had no such "
    "luck). small_s below is the soak's own 1-warm/1-timed reading"
)


def main() -> None:
    sample = json.load(open(".scratch/soak_r8_sample.json"))
    sample.update(json.load(open(".scratch/soak_r8_sample2.json")))
    sample.update(json.load(open(".scratch/soak_r8_flagged.json")))
    sample.update(json.load(open(".scratch/soak_r8_sample3.json")))
    sample.update(json.load(open(".scratch/soak_r8_q402.json")))  # post-fix row
    sample.update(json.load(open(".scratch/soak_r8_q442.json")))  # overflow probe
    sample.update(json.load(open(".scratch/soak_r8_sample4.json")))
    sample.update(json.load(open(".scratch/soak_r8_sample5.json")))
    sample.update(json.load(open(".scratch/soak_r8_q404.json")))  # post-fix row
    sample.update(json.load(open(".scratch/soak_r8_sample6.json")))
    jitter = json.load(open(".scratch/soak_r8_jitter3.json"))
    jitter.update(json.load(open(".scratch/soak_r8_q287.json")))

    for name, row in sample.items():
        row["note"] = NOTES[name]
    for name, row in jitter.items():
        note = NOTES[name]
        if name.startswith("q287"):
            note = Q287_NOTE.format(slope=row["slope"])
            row["quadratic_by_contract"] = True
            row["unsalted_first_pass"] = {"small_s": 45.817, "big_s": 447.497}
        row["note"] = note

    out = {
        "sf_small": 0.1,
        "sf_big": 1.0,
        "data_ratio": 10,
        "method": (
            "scripts/scale_soak.py - 1 warm + 1 timed run per query per sf, "
            "one session, nothing else running (a first attempt overlapped "
            "with bench reps and was discarded as contaminated). queries = "
            "SOAK_SET=sample:20 seed 8 (pool 386 of 485 after excluding "
            "SOAK_r06/r07 coverage, headline, gate-heavy, and streaming "
            "memory-sink queries) per VERDICT r7 item 3, PLUS seed-9 and "
            "seed-10 samples of 20 each drawn from the shrinking pool, PLUS the "
            "6 never-soaked queries flagged by the new "
            "scripts/audit_stream_side.py plan audit (grouped stream-side "
            "agg + fan-out under a broadcast join with no re-spread - the "
            "q482/q287 hazard signature; all 6 measured benign, notes "
            "per-row). fixture_change_recheck = the four "
            "replication-artifact queries re-soaked against .scratch/sf1j "
            "(make_scale --jitter: rotation+riffle token permutation, "
            "event row-drop, embedding offset - copy 0 pristine, join keys "
            "preserved) per item 7; their small_s side is the pristine "
            "/root/testdata/sf0.1"
        ),
        "sample_seeds": [8, 9, 10, 11, 12, 13],
        "never_soaked_pool": 386,
        "queries": sample,
        "fixture_change_recheck": {
            "method": (
                "re-timed on the JITTERED sf1 (.scratch/sf1j) after the "
                "make_scale --jitter change; r7 slopes on plain "
                "replication quoted in each note"
            ),
            "queries": jitter,
        },
    }
    with open("SOAK_r08.json", "w") as f:
        json.dump(out, f, indent=1)
    print("SOAK_r08.json:", len(sample), "sampled +", len(jitter), "rechecked")


if __name__ == "__main__":
    main()
