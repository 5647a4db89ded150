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

# filled after the sampled run lands
NOTES: dict[str, str] = {}

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
        row["note"] = NOTES[name]
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
        "never_soaked_pool": None,  # filled from the sample log
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
