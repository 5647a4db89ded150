"""Assemble SOAK_r09.json from the round-9 scratch soak runs:
.scratch/soak_r9_sample.json (SOAK_SET=sample:130, seed 14 — the
never-soaked tail, continuing the VERDICT r8 item 4 drain) and the
plan-change recheck runs (.scratch/soak_r9_recheck.json on plain sf1 +
.scratch/soak_r9_recheck_j.json on the jittered sf1j — the five queries
whose PLANS changed this round, re-timed per the q287 stale-row lesson;
r9 rows carry plan_fp so staleness is now mechanical). Adjudication
notes are curated here."""

from __future__ import annotations

import json

# Curated adjudications for the rows that need one (fix rows, quadratic
# workloads, and every slope >= 2.5). The long tail at/below ~2.5x on 10x
# data gets the mechanical default from _default_note() - for those rows
# "input grew 10x, wall grew <=2.5x against a fixed stage floor" IS the
# complete adjudication (plan_fp recorded per row for staleness).
NOTES: dict[str, str] = {
    "q165_containment_dedup": (
        "LIVE BUG #9 fix row: pre-fix this query pinned a (0+1)/1 stage "
        ">12 min at sf1 - the size estimator counts FILE bytes, the "
        "explode's ~150x fan-out is invisible, so Catalyst broadcast an "
        "entire exploded shingle side and streamed the k^2 pair "
        "production over the single-file scan's ONE partition (8 GB "
        "broadcast hard-failure at corpus scale). Fixed: shuffle-hash "
        "pin on the shingle key + pre-explode repartition (plan-audited, "
        "oracle unchanged -> hash-verified). Post-fix the honest "
        "workload remains: replication multiplies every posting list "
        "x10 -> shared-shingle pairs x100; slope 69 < the pair ratio. "
        "Exact form is pairs-quadratic by contract; q43 LSH banding / "
        "stop-shingle caps are the corpus-scale path."
    ),
    "q42_ngram_jaccard": (
        "LIVE BUG #9 fix row (same broadcast-the-explode plan via the "
        "shared jaccard_pairs; same shuffle-hash + respread fix, "
        "plan-audited, oracle unchanged). Exact inverted-index Jaccard "
        "is pairs-quadratic by contract: dup inflation grows pairs "
        "x100, slope 25 - wide and well under the pair ratio."
    ),
    "q138_substring_decontaminate": (
        "LIVE BUG #9 family fix row: the Rabin-Karp window explode "
        "inherited the single-file scan's 1 partition, so the whole "
        "probe stream ran on one core (28.7 s at sf1, slope 9.1). "
        "Doc-side respread before the explode: sf1 4.6 s, slope 1.09; "
        "sf0.1 pays ~1 s for the extra exchange - the right trade. "
        "Pattern side stays a genuine broadcast (bounded eval set)."
    ),
    "q405_degree_assortativity": (
        "LIVE BUG #10 fix row: at sf1 the mod-100 node fold SATURATES "
        "to the complete graph - zero degree variance, Pearson "
        "denominator exactly 0 - and ANSI Spark threw DIVIDE_BY_ZERO "
        "while the DuckDB oracle silently emitted NULL. Contract now "
        "explicit in BOTH engines (exact-integer m2*sxx=s^2 check -> "
        "NULL assortativity, n_edges still reported); calibration test "
        "pins K4 -> NULL and 4-leaf star -> exactly -1. Mod-bounded "
        "graph, scan-dominated wall (slope 0.69)."
    ),
    "q345_matryoshka_eval": (
        "quadratic by contract: the truncation gate certifies recall "
        "with EXACT int64 dots at both widths over query-set x corpus, "
        "and both grow 10x (queries are vec_id%50) -> dot workload "
        "x100; slope 50 < that. The certified production path "
        "(truncated sweep, full-dim rerank of survivors only) is what "
        "runs at corpus scale - this gate is the audit, not the "
        "serving plan."
    ),
    "q283_dbscan_core_points": (
        "LIVE BUG #9 family fix row (found by the static "
        "explode-broadcast sweep the q165 catch spawned): the "
        "9x-replicated probe side is corpus-proportional but invisible "
        "to the file-bytes size estimate, so Catalyst BROADCAST it and "
        "the in-cell pair production ran narrow - 31.2 s at sf1 under "
        "the broadcast plan. Shuffle-hash pin on the cell key: 2.4 s "
        "at sf1 (13x), slope 2.09 even though fixed-domain density "
        "still grows in-cell pairs x100 - the grid join now runs wide "
        "across ~2.7k cells. Density is the documented salting knob at "
        "real scale."
    ),
    "q455_linkage_threshold_curve": (
        "the threshold sweep itself is the bounded 8x8 pattern table; "
        "the wall is upstream q425 Fellegi-Sunter candidate generation, "
        "whose blocking buckets hold 10 verbatim copies of every entity "
        "under replication -> candidate pairs x100; slope 32 < the pair "
        "ratio. Fixture inflation: a real 10x corpus adds entities, not "
        "copies per block."
    ),
    "q391_candidate_transitivity": (
        "wedge audit over the q43 LSH candidate graph: verbatim copies "
        "collide in every band, so candidate degree - and wedges, "
        "~degree^2 per apex - inflate super-linearly under replication; "
        "banding caps each bucket's blast radius. Re-timed after q43's "
        "live-bug-#9 shuffle-hash pin (the docs x bands signature side "
        "had been broadcast): 15.1 -> 9.3 s at sf1, slope 4.3."
    ),
    "q82_decontamination": (
        "eval shingle set (doc_id%97) x10 AND corpus x10 -> matched "
        "(doc, shingle) join rows grow up to x100 under replication; "
        "one shingle-key equi-join, 6.9 s absolute, slope 8.5 well "
        "under the match-row ratio."
    ),
    "q44_simhash": (
        "simhash band join: verbatim copies share all 4 bands, so "
        "candidate pairs grow ~x100 under replication; slope 5 - the "
        "64-bit sketch keeps per-candidate cost flat and the band join "
        "stays bucket-bounded."
    ),
    "q175_normalized_dedup": (
        "canonicalize->md5 + per-nh window counts; rows x10 with dup "
        "groups 10x deeper, wall 4.5x on a half-second base - "
        "hash-shuffle floor dominated, sub-linear."
    ),
    "q398_carrying_cost": (
        "open-order semi join + one weighted cent-day sum; orders/"
        "lineitem x10, slope 4.5 on a 2 s wall - join shuffle grows "
        "linearly, stage floor covers the rest."
    ),
    "q382_aging_buckets": (
        "same open-order semi join as q398 + CASE-ladder bucket rollup; "
        "inputs x10, slope 4.1 on a 2 s wall - linear."
    ),
    "q187_rolling_slope": (
        "per-key rolling OLS window; events x10 spread over 10x users "
        "(window widths unchanged), slope 3.9 - window shuffle grows "
        "linearly."
    ),
    "q239_hierarchy_rollup": (
        "region->nation->customer rollup; fact side x10, slope 3.9 on "
        "a 1 s wall - broadcast dims, linear fact scan."
    ),
    "q153_equidepth_histogram": (
        "global equi-depth quantile build; rows x10, slope 3.5 - the "
        "rank shuffle is the linear cost, bucket count fixed."
    ),
    "q186_pseudonymize": (
        "keyed-hash pseudonymization scan + lookup-table join; rows "
        "x10, slope 3.5 - map-side JVM hashing, linear."
    ),
    "q400_health_scorecard": (
        "multi-metric scorecard = a battery of single-scan aggregates "
        "unioned; inputs x10, slope 3.5 - scan-bound."
    ),
    "q282_zone_containment_join": (
        "broadcast zone rectangles x point scan; points x10, zones "
        "fixed (supplier-derived, dim-bounded), slope 3.1 - probe-side "
        "linear."
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
    if s <= 2.5:
        return (
            f"slope {s} at 10x data ({w} s wall) - at/below a quarter of "
            "the data ratio: scan/shuffle volume grows 10x against a "
            "fixed stage floor. No super-linear stage; plan_fp recorded."
        )
    return (
        f"slope {s} at 10x data ({w} s wall) - sub-linear vs the data "
        "ratio; linear input growth against a sub-second stage floor. "
        "No super-linear stage; plan_fp recorded."
    )


# rows whose workload is quadratic by contract/fixture (flag set during
# assembly so the artifact's quadratic_by_contract matches the note)
QUADRATIC_ROWS = {
    "q165_containment_dedup",
    "q42_ngram_jaccard",
    "q345_matryoshka_eval",
    "q283_dbscan_core_points",
    "q455_linkage_threshold_curve",
}

RECHECK_NOTES = {
    "q287_behavior_edit_distance": (
        "PLAN CHANGED twice (round-9). (1) ADVICE: the r8 broadcast pin "
        "is honored past autoBroadcastJoinThreshold, so beyond the 8 GB "
        "broadcast limit it was a hard job failure, not a fallback - "
        "replaced with a SHUFFLE_HASH hint that co-partitions both sides "
        "on the salted (band, salt) key. (2) LIVE scale bug #8, found by "
        "THIS re-timing: the first shuffle-hash run clocked 549 s at "
        "jittered sf1 with one task running >5 min after the other 63 "
        "finished. Cell-cost census: the 32-salt grid over the 2 "
        "occupied bands makes only 64 near-uniform cells (~2.5% each), "
        "and Murmur3 hashpartitioning packed them onto 37 of 64 "
        "partitions - worst partition 5 cells = 10.2% of the total DP "
        "(balls-into-bins, not data skew). Widened to salts=64 over 512 "
        "partitions: 128 cells, worst partition 2.6% < 1/32, simulated "
        "wall factor 1.00x vs 3.27x. Re-timed: jittered sf1 {q287j} s "
        "(vs 549 s at salts=32, vs 566 s under the r8 broadcast plan; "
        "plain sf1 488 -> 269 s); sf0.1 unchanged ~4-5 s. Quadratic by "
        "contract (pairs grow ~100x at 10x users; slope {q287js} is now "
        "BELOW the pair ratio - the grid no longer adds a packing tail)."
    ),
    "q440_cluster_safe_split": (
        "PLAN CHANGED (densify): output left-joins the declared 2x3 "
        "scheme x split spine so an empty split reports n_docs=0. The "
        "spine join is a 6-row broadcast - re-timed jittered sf1 slope "
        "{q440j} vs 4.96 in r8 (same fixture), spine cost invisible."
    ),
    "q450_corpus_release_manifest": (
        "PLAN CHANGED (densify): output left-joins splits x corpus "
        "languages so a zero-coverage (split, lang) cell surfaces. "
        "Re-timed jittered sf1 slope {q450j} vs 6.2 in r8 (same "
        "fixture), spine cost invisible."
    ),
    "q371_adversarial_validation": (
        "PLAN CHANGED (overflow pin): doubled rank sums accumulate in "
        "DECIMAL(38,0) (the ~n^2 q402 class). The decimal sum runs over "
        "the bounded n_chars histogram, so the pin is free - slope "
        "{q371} vs 1.18 in r8."
    ),
    "q442_embedding_drift": (
        "PLAN CHANGED twice (densify FULL join for one-sided labels + "
        "DECIMAL(38,0) shift/cos accumulators - the n^4 class, past "
        "int64 between sf1 and sf10). Accumulation is over 64 x labels "
        "rows, so the pin is free - slope {q442} vs the r8 probe's 1.4."
    ),
}


def main() -> None:
    sample = json.load(open(".scratch/soak_r9_sample.json"))
    recheck_plain = json.load(open(".scratch/soak_r9_recheck.json"))
    recheck_j = json.load(open(".scratch/soak_r9_recheck_j.json"))

    fmt = {
        "q287j": recheck_j["q287_behavior_edit_distance"]["big_s"],
        "q287js": recheck_j["q287_behavior_edit_distance"]["slope"],
        "q440j": recheck_j["q440_cluster_safe_split"]["slope"],
        "q450j": recheck_j["q450_corpus_release_manifest"]["slope"],
        "q371": recheck_plain["q371_adversarial_validation"]["slope"],
        "q442": recheck_plain["q442_embedding_drift"]["slope"],
    }
    for name, row in sample.items():
        row["note"] = NOTES.get(name) or _default_note(name, row)
        if name in QUADRATIC_ROWS:
            row["quadratic_by_contract"] = True
    recheck = {}
    for name, row in recheck_j.items():
        row = dict(row)
        row["plain_sf1"] = recheck_plain[name]
        row["note"] = RECHECK_NOTES[name].format(**fmt)
        if name.startswith("q287"):
            row["quadratic_by_contract"] = True
        recheck[name] = row
    for name, row in recheck_plain.items():
        if name not in recheck:
            row = dict(row)
            row["note"] = RECHECK_NOTES[name].format(**fmt)
            recheck[name] = row

    out = {
        "sf_small": 0.1,
        "sf_big": 1.0,
        "data_ratio": 10,
        "method": (
            "scripts/scale_soak.py - 1 warm + 1 timed run per query per "
            "sf, one session, nothing else running. queries = "
            "SOAK_SET=sample:130 seed 14 from the never-soaked pool "
            "(headline, gate-heavy, streaming memory-sink and all "
            "SOAK_r06-r08 coverage excluded) against plain-replicated "
            ".scratch/sf1, the r8 sampled-tier convention. "
            "plan_change_recheck = the five queries whose plans changed "
            "this round (q287 shuffle-hash pin, q440/q450/q442 densify, "
            "q371/q442 DECIMAL38 overflow pins), re-timed on the "
            "JITTERED .scratch/sf1j for apples-to-apples with their r8 "
            "rows, with the plain-sf1 reading attached. Every r9 row "
            "carries plan_fp (scripts/plan_fp.py) so a future plan "
            "change flags the row mechanically "
            "(tests/test_soak_artifact.py)."
        ),
        "sample_seeds": [14],
        "never_soaked_pool": 259,  # printed by the sampled run (seed 14)
        "queries": sample,
        "plan_change_recheck": {
            "method": (
                "re-timed after this round's plan changes; jittered-sf1 "
                "numbers are the comparable ones (r8 rows used sf1j), "
                "plain_sf1 attached per row"
            ),
            "queries": recheck,
        },
    }
    with open("SOAK_r09.json", "w") as f:
        json.dump(out, f, indent=1)
    print("SOAK_r09.json:", len(sample), "sampled +", len(recheck), "rechecked")


if __name__ == "__main__":
    main()
