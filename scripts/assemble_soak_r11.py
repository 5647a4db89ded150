"""Assemble SOAK_r11.json from the round-11 scratch soaks:
.scratch/soak_r11_recheck.json (plain sf1 re-timings of the ten queries
whose plans changed this round — the DECIMAL→BIGINT output casts, the
q338 stable_row_ids conversion, the q273 streaming kernel, the q166 /
q422 localCheckpoints, the q408 integer-DIV pair counts) and
.scratch/soak_r11_q478.json (q478 re-run AFTER its output moved from
the overflowing BIGINT cast to the exact decimal string — the first
scratch run is the CAST_OVERFLOW that forced the change).

Every slope >= 2.5 must carry a curated NOTES entry or assembly FAILS
(the r10 contract); notes below that threshold are still supplied here
because every row in a recheck round IS an adjudication.
"""

from __future__ import annotations

import json
import sys

NOTES: dict[str, str] = {
    "q166_rfm_segments": (
        "localCheckpoint on the per-user RFM rollup (r10 ADVICE): the "
        "three distributed_ntile passes each read their input twice, so "
        "the rollup - and the purchase scan under it - re-executed ~6x. "
        "Re-timed: sf1 4.99 s vs the r10 row's 3.9 s band at slope 0.59 "
        "(the sf0.1 leg pays the checkpoint materialization, the sf1 leg "
        "amortizes it - the flat multi-stage floor shrinking as designed)."
    ),
    "q273_codec_advisor": (
        "STREAMING KERNEL TRADE (r10 ADVICE): the per-partition repeat "
        "count now streams Arrow batches carrying one boundary value "
        "instead of concatenating the whole range partition into numpy "
        "(corpus/P per task - a per-executor OOM at 100 TB). The "
        "engine-side sortWithinPartitions that enables streaming costs "
        "wall at test SF: sf1 7.2 -> 12.7 s, slope 2.75. Accepted "
        "deliberately: batch-bounded memory at any scale for a stated "
        "1.8x local cost - the same trade as the r10 window "
        "conversions, with Tungsten sort spilling gracefully where "
        "np.concatenate aborts."
    ),
    "q297_mann_whitney_u": (
        "output cast DECIMAL->BIGINT only (r11 hasher contract); "
        "histogram-bounded cumulative pass unchanged, slope 0.99."
    ),
    "q338_tier_migration": (
        "converted off the boolean-partition global rank windows onto "
        "stable_row_ids + broadcast counts (the last entity-proportional "
        "global window on the audit board); oracle unchanged, hash-"
        "certified; slope 1.06 - rank cost now scales out with "
        "partitions instead of one reducer."
    ),
    "q371_adversarial_validation": (
        "output cast DECIMAL->BIGINT only (r11 hasher contract); "
        "value-domain-saturated histogram walk unchanged, slope 1.06."
    ),
    "q408_kendall_tau": (
        "pair counts moved to integer DIV (r10 ADVICE exactness fix); "
        "plan shape unchanged (Knight form, test-pinned). sf1 3.79 s "
        "matches the r10 rewrite row's 3.70 s; the slope printing 2.26 "
        "vs r10's 1.28 is the sf0.1 leg landing faster this session "
        "(1.68 vs ~2.9 s), not the sf1 leg regressing."
    ),
    "q417_brier_decomposition": (
        "output cast DECIMAL->BIGINT only (r11 hasher contract; the "
        "inner arithmetic was always int64 on both engines - the "
        "DECIMAL wrapper was presentational). 10 fixed bins, slope 1.21."
    ),
    "q422_hodges_lehmann": (
        "first fingerprinted soak row for this query (recorded while "
        "adjudicating the r10 bench mover - closed in the README as an "
        "r9-side anomaly). localCheckpoint on the distinct-value "
        "histogram halves the fact scans; slope 1.11 over the "
        "value-compressed Walsh join."
    ),
    "q442_embedding_drift": (
        "output cast DECIMAL->BIGINT only; plan fingerprint UNCHANGED "
        "from the r9 row (the cast folds into the existing projection), "
        "re-timed for completeness: slope 2.28 - the 64-dim explode's "
        "fixed fan cost saturating, same mechanism as the r9 row."
    ),
    "q478_cramer_von_mises": (
        "OVERFLOW CAUGHT BY THE SOAK: the r11 BIGINT output cast threw "
        "CAST_OVERFLOW live at sf1 (U ~ n^4 = 5.4e21 > int64) - exactly "
        "the ANSI-throws-not-wraps contract doing its job one SF above "
        "the driver's. Output moved to U's exact decimal STRING "
        "(VARCHAR is in the hasher-safe scalar set, both engines render "
        "DECIMAL(38,0) as bare digits); re-timed green, slope 0.94 over "
        "the pooled-rank pass."
    ),
}


#: shared note for the fact-rescan checkpoint conversions (r11 batch 2):
#: every row here changed plan by gaining localCheckpoint(eager=False)
#: on a shared BOUNDED rollup, hash-certified against an unchanged
#: oracle. Same-session A/B (localCheckpoint monkeypatched to identity,
#: alternating reps, sf0.1 AND sf1) measured the conversions
#: wall-NEUTRAL — AQE exchange reuse was already deduping identical
#: subtrees at runtime, so the checkpoint's value is turning
#: reuse-dependent single execution into a structural guarantee, not a
#: speedup. Deltas vs older soak rows are session drift (the A/B is the
#: controlled comparison).
RESCAN_NOTE = (
    "fact-rescan checkpoint conversion (r11): shared bounded rollup "
    "localCheckpointed, oracle unchanged, hash-certified; same-session "
    "A/B measured the change wall-neutral (AQE exchange reuse already "
    "deduped identical subtrees) - the checkpoint makes single "
    "execution structural rather than reuse-dependent."
)

RESCAN_NOTES: dict[str, str] = {
    "q308_lsh_recall_eval": (
        "slope 16.97 (old row 38.66): BOTH lineages (exact Jaccard "
        "truth x MinHash candidates) grow their pair workload ~x100 "
        "under the replicated fixture - the q42-family verbatim-copy "
        "ratio adjudicated on the r10 rows; slope well under that "
        "ratio. The checkpoint conversion halves lineage re-execution; "
        "sf1 wall 47.3 s vs the old row's 67.1 s (different sessions - "
        "the same-session A/B says neutral, so read the gap as drift "
        "plus the conversion, not a claimed 30% win)."
    ),
    "q311_popularity_bias": (
        "slope 3.25 (old row 2.64): re-invokes the q244 co-purchase "
        "recommender whose candidate fan grows with basket pairs - "
        "workload-super-linear under the replicated fixture, same "
        "mechanism as the old row; rep variance at sf1 is high "
        "(A/B reps spanned 19-50 s), so the slope delta is within "
        "session noise. " + RESCAN_NOTE
    ),
    "q401_rank_aggregation": (
        "slope 2.32 prints higher than the old row's 0.80 because the "
        "sf0.1 leg got FASTER (8.9 -> 3.5 s, the checkpoint removing "
        "re-executed rank passes at the small SF), not because sf1 "
        "regressed (7.2 -> 8.1 s, within cross-session drift; "
        "same-session A/B: 6.3 vs 6.0 s, neutral). " + RESCAN_NOTE
    ),
    "q391_candidate_transitivity": (
        "slope 1.49 (old row 4.28): the candidate-pair checkpoint "
        "stops the q43 MinHash lineage re-executing four times; sf1 "
        "A/B favors the checkpoint (10.7 vs 12.9 s). "
    ),
    "q122_cooccurrence_lift": (
        "FIRST fingerprinted row (pre-r9 soak rows carry no fp): "
        "slope 2.47 - the head-vocabulary guard caps the pair space "
        "at |head|^2 = 1600 cells, but each doc's <= 40-token head "
        "fan grows with doc count, so the pair AGGREGATION input "
        "grows ~x10 while the output stays fixed; sub-linear by "
        "design, not a hazard. " + RESCAN_NOTE
    ),
    "q458_vocab_growth": (
        "FIRST fingerprinted row: slope 1.96 over the two-pass "
        "range-partitioned cumsum - the corpus doubles the explode "
        "volume and the prefix machinery is linear; under the data "
        "ratio. " + RESCAN_NOTE
    ),
    "q127_mad_outliers": (
        "FIRST fingerprinted row: slope 1.63 across the five "
        "structural passes (two composed median selects + the flag "
        "count); the _grouped_kth histograms are checkpointed since "
        "r11. " + RESCAN_NOTE
    ),
    "q451_mv_selection_fused": (
        "FIRST fingerprinted row: slope 0.77 - the r11 fix "
        "(checkpointed GROUPING SETS lattice + base count; the "
        "executed plan previously re-scanned orders 26x through "
        "temp-view re-expansion, contradicting the one-scan "
        "docstring claim). Fixed stage floor dominates at these SFs."
    ),
    "q107_grouped_median": (
        "FIRST fingerprinted row: slope 1.07, histogram-select plan "
        "with the r11 checkpointed histogram. " + RESCAN_NOTE
    ),
    "q198_iqr_outliers": (
        "FIRST fingerprinted row: slope 1.06, same _grouped_kth core "
        "as q127/q140. " + RESCAN_NOTE
    ),
    "q360_link_prediction": (
        "FIRST fingerprinted row: slope 1.21, wedge join over the "
        "checkpointed edge list. " + RESCAN_NOTE
    ),
}


def main() -> None:
    rows: dict[str, dict] = {}
    for path in (".scratch/soak_r11_recheck.json", ".scratch/soak_r11_q478.json"):
        with open(path) as f:
            rows.update(json.load(f))
    with open(".scratch/soak_r11_rescan.json") as f:
        rescan = json.load(f)
    # the q478 BIGINT-cast error row is superseded by the string-output
    # re-run loaded after it; nothing else may carry an error
    out_rows: dict[str, dict] = {}
    for name, row in sorted(rows.items()):
        if "error" in row:
            raise SystemExit(f"{name}: error row survived assembly: {row}")
        slope = row["slope"]
        note = NOTES.get(name)
        if slope is not None and slope >= 2.5 and not note:
            raise SystemExit(
                f"{name}: slope {slope} >= 2.5 requires a curated note"
            )
        if not note:
            raise SystemExit(
                f"{name}: recheck rounds curate every row; add a NOTES entry"
            )
        out_rows[name] = {**row, "note": note}
    rescan_rows: dict[str, dict] = {}
    for name, row in sorted(rescan.items()):
        if "error" in row:
            raise SystemExit(f"{name}: error row in rescan soak: {row}")
        slope = row["slope"]
        note = RESCAN_NOTES.get(name)
        if slope is not None and slope >= 2.5 and not note:
            raise SystemExit(
                f"{name}: slope {slope} >= 2.5 requires a curated note"
            )
        rescan_rows[name] = {**row, "note": note or RESCAN_NOTE}
    doc = {
        "sf_small": 0.1,
        "sf_big": 1.0,
        "data_ratio": 10,
        "method": (
            "round-11 plan-change recheck: every query whose plan changed "
            "this round (DECIMAL->BIGINT/STRING output casts, q338 "
            "stable_row_ids conversion, q273 streaming kernel, q166/q422 "
            "localCheckpoints, q408 integer-DIV pair counts) re-timed at "
            "sf0.1 vs plain sf1 (make_scale 10x), warm rep timed, fresh "
            "plan fingerprints; q478's first scratch run is the "
            "CAST_OVERFLOW that moved its output to the exact decimal "
            "string"
        ),
        "queries": out_rows,
        "plan_change_recheck": {
            "method": (
                "r11 batch 2 — the fact-rescan audit's checkpoint "
                "conversions: the 26 changed queries with fingerprinted "
                "soak rows re-timed sf0.1 vs plain sf1 with fresh plan "
                "fingerprints, plus FIRST fingerprinted rows for the 7 "
                "changed queries whose only soak rows predate the r9 fp "
                "requirement (q107/q122/q127/q198/q360/q451/q458) so "
                "the drift tripwire now covers them; wall-neutrality "
                "established by a same-session A/B with localCheckpoint "
                "patched to identity (see scripts/audit_fact_rescan.py "
                "caveat)"
            ),
            "queries": rescan_rows,
        },
    }
    with open("SOAK_r11.json", "w") as f:
        json.dump(doc, f, indent=1)
    print(f"SOAK_r11.json: {len(out_rows)} + {len(rescan_rows)} rows")


if __name__ == "__main__":
    main()
