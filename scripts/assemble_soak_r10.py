"""Assemble SOAK_r10.json from the round-10 scratch soak runs:
.scratch/soak_r10_sample.json (SOAK_SET=sample:129, seed 10 — the ENTIRE
remaining never-soaked pool, closing the VERDICT r8 item 4 drain at 0)
and .scratch/soak_r10_recheck.json (plain sf1 re-timings of q279/q283,
whose grid-join plans changed this round: the shuffle_hash hint moved to
the un-replicated build side per ADVICE, flipping BuildLeft→BuildRight).
Adjudication notes are curated here.

Round-10 ADVICE fix vs assemble_soak_r09: `_default_note` no longer
auto-writes a benign "sub-linear" note for slopes >= 2.5 — every such
row must have a curated NOTES entry or assembly FAILS loudly, matching
the stated contract that everything >= 2.5 is adjudicated by a human
reading the row, never by a fallback string.
"""

from __future__ import annotations

import json
import sys

# Curated adjudications: REQUIRED for every slope >= 2.5 (assembly fails
# otherwise), optional below that (the mechanical default is complete
# for "input grew 10x, wall grew <2.5x against a fixed stage floor").
NOTES: dict[str, str] = {
    "q408_kendall_tau": (
        "REWRITE ROW (round 10): this soak run surfaced the heaviest "
        "wall on the board - 185.7 s at sf1, slope 18.0 - from the "
        "O(n^2) pair join the docstring had declared by-contract (20B "
        "pairs for ONE scalar row). Replaced with the O(n log n) Knight "
        "form: tie counts from plain groupBy aggregates, discordant "
        "pairs from a weighted dominance count (range-partition on "
        "(rev, qty), numpy weighted-mergesort per partition, grp-window "
        "prefix sums for cross-partition pairs), and the per-part "
        "rollup localCheckpointed so the five scalar branches scan the "
        "fact table ONCE, not five times (same-session A/B at sf1: "
        "checkpoint [4.3, 6.6] vs recompute [6.8, 8.7] warm reps). "
        "Oracle unchanged -> the hash gate certifies the rewrite; plan "
        "pinned by test_q408_is_knight_not_pair_join. Re-timed: sf1 "
        "3.70 s (50x), slope 1.28."
    ),
    "q259_semantic_decontamination": (
        "eval-set x corpus semantic screen: BOTH sides grow 10x under "
        "the fixture (eval membership is doc_id-modulo), so the "
        "exact-dot candidate workload grows ~x100; slope 67 < that "
        "ratio. The production path is the q47 sign-LSH prefilter; "
        "this exact form is the decontamination AUDIT, quadratic by "
        "contract."
    ),
    "q425_fellegi_sunter": (
        "record-linkage candidate generation: blocking buckets hold 10 "
        "verbatim copies of every entity under plain replication, so "
        "candidate pairs grow x100 (the same fixture inflation "
        "adjudicated on q455's r9 row, whose wall IS this query "
        "upstream); slope 45 < the pair ratio. A real 10x corpus adds "
        "entities, not copies per block - blocking keeps buckets "
        "bounded."
    ),
    "q308_lsh_recall_eval": (
        "LSH precision/recall gate: re-invokes the registered q42/q43 "
        "lineages, where verbatim copies collide in every band and "
        "shared-shingle pairs grow ~x100 under replication; slope 39 < "
        "the pair ratio. Inherits the r9 shuffle-hash pins "
        "(plan-audited); banding caps each bucket's blast radius at "
        "real corpus growth."
    ),
    "q344_lsh_s_curve": (
        "S-curve calibration over the banded bucket join: candidate "
        "pairs grow ~x100 under replication (copies collide in every "
        "band); slope 19, well under the pair ratio, and the bucketed "
        "plan inherits the r9 jaccard_pairs shuffle-hash pin."
    ),
    "q196_small_qty_revenue": (
        "TPC-H Q17 shape: fact joined to its own per-part aggregate, "
        "both sides shuffle on partkey - pure linear growth (lineitem "
        "x10 through two shuffles); slope 8.5 < the data ratio on a "
        "0.5 s base."
    ),
    "q99_repetition_filter": (
        "per-doc duplicate-ngram ratios: docs x10 and the ngram explode "
        "grows with them - linear token fan-out, slope 7.9 < the data "
        "ratio; per-doc cost is bounded by doc length, unchanged by sf."
    ),
    "q98_pii_scrub": (
        "JVM regex scrub scan: docs x10, slope 7.6 - map-only linear; "
        "approaching the data ratio because the 0.4 s small-sf wall is "
        "mostly fixed stage cost that stops amortizing."
    ),
    "q461_gopher_quality_rules": (
        "Gopher rule battery = one pass of per-doc token/char exprs; "
        "docs x10, slope 6.8 < the data ratio - scan-bound linear with "
        "a 1 s base."
    ),
    "q383_langid_eval": (
        "lang-ID confusion matrix: per-doc n-gram classification "
        "(expression-compiled, map-side) + one (label, predicted) "
        "rollup; docs x10, slope 6.0 - linear."
    ),
    "q84_boilerplate_ngrams": (
        "boilerplate n-gram mining: the line-shingle explode grows "
        "linearly with docs (x10), one hash shuffle on the shingle; "
        "slope 5.7 < the data ratio."
    ),
    "q384_tokenizer_fertility": (
        "tokenizer fertility stats: per-doc token counts at two "
        "granularities, docs x10, slope 4.8 on a 0.3 s base - linear "
        "against a fixed two-stage floor."
    ),
    "q280_nearest_facility": (
        "nearest-facility labeling: the facility set is FIXED "
        "(s_suppkey <= 10, sf-independent) and broadcasts; per-point "
        "work is constant k=10, so the job is a map-only linear scan - "
        "slope 4.7 < the data ratio on a 0.6 s base."
    ),
    "q235_inverted_index": (
        "inverted-index build: postings explode grows linearly with "
        "docs (x10), one token-key shuffle; slope 4.5 < the data ratio."
    ),
    "q388_totals_reconciliation": (
        "header-vs-detail reconciliation: orders x10 joined to their "
        "own line rollup (x10) on orderkey - linear both sides, slope "
        "4.4 on a 1 s base."
    ),
    "q244_copurchase_topk": (
        "co-purchase pair generation is basket-bounded by contract "
        "(b-line basket -> b(b-1) pairs, basket size is sf-independent "
        "in this fixture), so pairs grow LINEARLY with orders (x10); "
        "slope 4.1 < the data ratio on a 2.4 s base."
    ),
    "q52_fingerprint_clusters": (
        "sorted-token md5 fingerprints: linear doc scan + one window "
        "over the 16-byte fingerprint; slope 3.8 on a 0.3 s base - "
        "stage floor dominated."
    ),
    "q335_ngram_novelty": (
        "cross-period n-gram novelty: shingle explode x10 against the "
        "prior-period index, one shingle-key join; slope 3.8 < the "
        "data ratio."
    ),
    "q268_graph_neighbor_agg": (
        "one GraphSAGE-mean layer: q244's basket-bounded edge list "
        "(linear in orders) joined to part features, one "
        "destination-key shuffle; slope 3.1 on a 1.8 s base."
    ),
    "q478_cramer_von_mises": (
        "CvM two-sample statistic: global rank sort (linear shuffle) + "
        "exact-integer moment sums; slope 2.9 on a 0.5 s base - the "
        "rank exchange is the linear cost."
    ),
    "q387_storage_tiering": (
        "storage-tier advisor: one scan + per-table rollups; inputs "
        "x10, slope 2.7 on a 0.3 s base - stage floor."
    ),
    "q123_array_hof_suite": (
        "array higher-order-function suite: per-row codegen HOFs, rows "
        "x10, slope 2.6 on a 0.6 s base - map-side linear."
    ),
    "q206_fifo_allocation": (
        "FIFO-as-interval-overlap: per-part running-sum windows map "
        "lots and demands onto the cumulative number line, then one "
        "overlap join - both sides x10, per-part widths unchanged; "
        "slope 2.6 on a 1.6 s base - the window shuffles grow linearly."
    ),
}

# rows whose workload is quadratic by contract/fixture (flag set during
# assembly so the artifact's quadratic_by_contract matches the note)
QUADRATIC_ROWS: set[str] = {
    "q259_semantic_decontamination",
    "q425_fellegi_sunter",
    "q308_lsh_recall_eval",
    "q344_lsh_s_curve",
}

RECHECK_NOTES = {
    "q279_spatial_radius_join": (
        "PLAN CHANGED (r10 ADVICE): the r9 shuffle-hash pin had the hint "
        "on the 9x-replicated probe side, and Spark prefers the HINTED "
        "side as the per-partition hash-map BUILD side - 9x the "
        "necessary build memory. Hint moved to the un-replicated 1x "
        "side (BuildLeft -> BuildRight, plan test asserts it). "
        "Workload-quadratic fixture (both join sides scale with sf, "
        "result rows grow ~100x at 10x data - the r6 row measured "
        "139k -> 13.9M): slope {q279} under the corrected build side "
        "(r6 row: 46.2 under the pre-pin broadcast plan)."
    ),
    "q283_dbscan_core_points": (
        "PLAN CHANGED (r10 ADVICE, same build-side flip as q279). "
        "Fixed-domain density still grows in-cell pairs x100 at 10x "
        "data; the grid join runs wide across ~2.7k cells. Re-timed "
        "plain sf1: slope {q283} vs 2.09 on the r9 row (same fixture, "
        "same shuffle plan, build side now the 1x points)."
    ),
    "q166_rfm_segments": (
        "PLAN CHANGED (r10 global-window audit, entity-rank class): the "
        "three NTILE(5) quintile cuts were single-partition windows over "
        "the per-user table (user-proportional - the audit's growth-10 "
        "class). Converted to operators.rowids.distributed_ntile (range "
        "partition + per-range numbering + broadcast prefix-offset "
        "spine; NTILE is exact arithmetic over the global row number, "
        "property-tested against Spark's own NTILE). Oracle unchanged, "
        "hash-certified. The sampled-tier row (0.475/0.585 s under the "
        "global-window plan) moves here: {q166s}/{q166} s - the flat "
        "multi-stage floor costs ~3 s at these SFs and amortizes to "
        "zero at scale (slope {q166sl}), while the single-reducer sort "
        "of |users| rows is gone - the q138 trade."
    ),
    "q171_decile_lift": (
        "PLAN CHANGED (same conversion as q166, one NTILE(10) over "
        "customers): distributed_ntile replaces the global window; "
        "oracle unchanged, hash-certified. Re-timed {q171s}/{q171} s, "
        "slope {q171sl} (r8 row: slope 1.56 under the global-window "
        "plan); only the 10-row decile walk remains a (bounded) global "
        "window."
    ),
    "q209_lorenz_concentration": (
        "PLAN CHANGED (same conversion as q171): distributed_ntile "
        "decile cut, oracle unchanged, hash-certified. Re-timed "
        "{q209s}/{q209} s, slope {q209sl} (r8 row: slope 1.59); the "
        "10-row Lorenz walk remains bounded-global."
    ),
    "q285_topk_plus_other": (
        "PLAN CHANGED (entity-rank batch 2): the part-proportional "
        "global row_number window became stable_row_ids; oracle "
        "unchanged, hash-certified. Its sampled-tier row (0.291/0.795 "
        "s, slope 2.73 under the window plan) moves here: slope "
        "{q285sl}, flat multi-stage floor, no single-reducer rank."
    ),
    "q311_popularity_bias": (
        "PLAN CHANGED (entity-rank batch 2): catalog-decile rank via "
        "stable_row_ids (the q306 rank-block form the docstring used "
        "to defer to); oracle unchanged, hash-certified. Slope "
        "{q311sl} - the wall is the re-invoked q244 recommender "
        "upstream (9.9 s alone in this round's sample), the rank adds "
        "~2 s of flat stage floor."
    ),
    "q401_rank_aggregation": (
        "PLAN CHANGED (entity-rank batch 2): Borda's three criterion "
        "ranks run as chained stable_row_ids and final_rank now ranks "
        "only the bounded top-N slice AFTER the TakeOrdered; oracle "
        "unchanged, hash-certified. Its sampled-tier row (2.08/4.36 s "
        "under three global windows) moves here: {q401} s at sf1, "
        "slope {q401sl} - the three chained row-id passes cost a flat "
        "~3 s stage floor at these SFs (SF-independent, hence the "
        "sub-1 slope) in exchange for removing three catalog-"
        "proportional single-reducer sorts."
    ),
    "q261_uplift_deciles": (
        "PLAN CHANGED (entity-rank batch 2): distributed_ntile decile "
        "cut over users; oracle unchanged, hash-certified. Slope "
        "{q261sl} vs 1.25 on the r8 row - flat."
    ),
    "q347_simpson_guard": (
        "PLAN CHANGED (entity-rank batch 2): tercile rank via "
        "stable_row_ids; oracle unchanged, hash-certified. Slope "
        "{q347sl} vs 1.11 on the r8 row."
    ),
    "q386_stratified_ate": (
        "PLAN CHANGED (entity-rank batch 2): quintile rank via "
        "stable_row_ids; oracle unchanged, hash-certified. Slope "
        "{q386sl} vs 1.45 on the r9 row."
    ),
    "q35_percentile_composite": (
        "PLAN CHANGED (entity-rank batch 2): both percent_rank windows "
        "decomposed to (rank_with_ties - 1)/(n - 1) over stable_row_ids "
        "global row numbers with a value-keyed tie-min window "
        "(hash-wide) - no customer-proportional single-reducer sort "
        "remains. Oracle unchanged, hash-certified. Slope {q35sl} vs "
        "2.39 on the r9 row."
    ),
    "q273_codec_advisor": (
        "PLAN CHANGED (r10 global-window audit): the advisor's three "
        "per-column adjacent-repeat LAGs each funneled EVERY corpus row "
        "through one reducer (Exchange SinglePartition under the "
        "no-PARTITION-BY window) - measured 60k rows x3 at sf0.01, the "
        "largest corpus-proportional global window on the board and a "
        "guaranteed 100TB stall. Distributed form: range-partition on "
        "the storage key, per-partition numpy repeat kernel, P-row "
        "boundary stitch (bounded by the partition count). Oracle "
        "unchanged, hash-certified. Re-timed plain sf1: {q273} s, slope "
        "{q273s} (the r8 row recorded 25.4 s / slope 7.84 under the "
        "global-window plan)."
    ),
}


def _default_note(name: str, row: dict) -> str:
    s, w = row["slope"], row["big_s"]
    if s <= 1.0:
        return (
            f"slope {s} at 10x data ({w} s) - fixed stage cost dominates; "
            "the larger input even fills partitions better. No "
            "super-linear stage; plan_fp recorded."
        )
    if s < 2.5:
        return (
            f"slope {s} at 10x data ({w} s wall) - at/below a quarter of "
            "the data ratio: scan/shuffle volume grows 10x against a "
            "fixed stage floor. No super-linear stage; plan_fp recorded."
        )
    # r10 (ADVICE): slopes >= 2.5 MUST be curated - a benign fallback
    # here would bake a false adjudication into the artifact.
    raise SystemExit(
        f"UNADJUDICATED slope {s} for {name} ({w} s at sf1): add a "
        "curated NOTES entry explaining the mechanism before assembling"
    )


def main() -> None:
    sample = json.load(open(".scratch/soak_r10_sample.json"))
    recheck_plain = json.load(open(".scratch/soak_r10_recheck.json"))

    fmt = {
        "q279": recheck_plain["q279_spatial_radius_join"]["slope"],
        "q283": recheck_plain["q283_dbscan_core_points"]["slope"],
        "q273": recheck_plain["q273_codec_advisor"]["big_s"],
        "q273s": recheck_plain["q273_codec_advisor"]["slope"],
        "q166s": recheck_plain["q166_rfm_segments"]["small_s"],
        "q166": recheck_plain["q166_rfm_segments"]["big_s"],
        "q166sl": recheck_plain["q166_rfm_segments"]["slope"],
        "q171s": recheck_plain["q171_decile_lift"]["small_s"],
        "q171": recheck_plain["q171_decile_lift"]["big_s"],
        "q171sl": recheck_plain["q171_decile_lift"]["slope"],
        "q209s": recheck_plain["q209_lorenz_concentration"]["small_s"],
        "q209": recheck_plain["q209_lorenz_concentration"]["big_s"],
        "q209sl": recheck_plain["q209_lorenz_concentration"]["slope"],
        "q285sl": recheck_plain["q285_topk_plus_other"]["slope"],
        "q311sl": recheck_plain["q311_popularity_bias"]["slope"],
        "q401": recheck_plain["q401_rank_aggregation"]["big_s"],
        "q401sl": recheck_plain["q401_rank_aggregation"]["slope"],
        "q261sl": recheck_plain["q261_uplift_deciles"]["slope"],
        "q347sl": recheck_plain["q347_simpson_guard"]["slope"],
        "q386sl": recheck_plain["q386_stratified_ate"]["slope"],
        "q35sl": recheck_plain["q35_percentile_composite"]["slope"],
    }
    errors = [n for n, r in sample.items() if "error" in r]
    if errors:
        raise SystemExit(f"soak rows with errors, fix first: {errors}")
    for name, row in sample.items():
        row["note"] = NOTES.get(name) or _default_note(name, row)
        if name in QUADRATIC_ROWS:
            row["quadratic_by_contract"] = True
    recheck = {}
    quad_recheck = {"q279_spatial_radius_join", "q283_dbscan_core_points"}
    for name, row in recheck_plain.items():
        row = dict(row)
        row["note"] = RECHECK_NOTES[name].format(**fmt)
        # only the two grid joins are pairs-x100 by fixture
        row["quadratic_by_contract"] = name in quad_recheck
        recheck[name] = row

    out = {
        "sf_small": 0.1,
        "sf_big": 1.0,
        "data_ratio": 10,
        "method": (
            "scripts/scale_soak.py - 1 warm + 1 timed run per query per "
            "sf, one session, nothing else running. queries = "
            "SOAK_SET=sample:129 seed 10 = the ENTIRE remaining "
            "never-soaked pool (headline, gate-heavy, streaming "
            "memory-sink and all SOAK_r06-r09 coverage excluded) against "
            "plain-replicated .scratch/sf1 - the drain the r8 verdict "
            "started is CLOSED at pool 0. plan_change_recheck = "
            "q279/q283, whose grid-join build side flipped this round "
            "(ADVICE: hint moved to the un-replicated side), plus the "
            "global-window-audit conversions (q273's corpus-wide LAGs "
            "distributed; the entity-rank class converted wholesale: "
            "q166/q171/q209/q261 NTILEs -> distributed_ntile, "
            "q285/q311/q347/q386/q401 row_number ranks -> "
            "stable_row_ids, q35 percent_rank -> rank-with-ties over "
            "stable_row_ids; q166/q285/q401's sampled rows moved here "
            "since their plans changed mid-round) - re-timed on plain "
            "sf1 for apples-to-apples with their r8/r9 rows. Every "
            "row carries plan_fp (scripts/plan_fp.py) so a future plan "
            "change flags the row mechanically (tests/test_soak_artifact"
            ".py). Slopes >= 2.5 without a curated note FAIL assembly "
            "(no benign-fallback notes - r9 ADVICE). q408's row is the "
            "post-rewrite re-timing: the drain surfaced its 185.7 s "
            "O(n^2) pair join and it was rewritten to the O(n log n) "
            "Knight form mid-round (oracle unchanged, hash-certified; "
            "3.70 s, slope 18.0 -> 1.28)."
        ),
        "sample_seeds": [10],
        # printed by the sampled run (seed 10); the sampled tier holds
        # 126 of the 129 because q166/q285/q401's plans changed
        # mid-round (global-window conversions) and their rows moved to
        # the recheck tier with post-conversion re-timings
        "never_soaked_pool": 129,
        "queries": sample,
        "plan_change_recheck": {
            "method": (
                "re-timed after this round's build-side flip; plain-sf1 "
                "numbers, comparable with q283's r9 plain-sf1 row"
            ),
            "queries": recheck,
        },
    }
    with open("SOAK_r10.json", "w") as f:
        json.dump(out, f, indent=1)
    print("SOAK_r10.json:", len(sample), "sampled +", len(recheck), "rechecked")


if __name__ == "__main__":
    main()
