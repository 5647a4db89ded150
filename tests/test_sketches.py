"""Sketch-operator invariants: estimator accuracy and sample stability."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_DIR


def test_kmv_estimate_within_theoretical_error(spark):
    """KMV with k=64 has relative standard error ~1/sqrt(k-2) ≈ 12.7%;
    assert every group lands within 3σ of exact."""
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q72_kmv_distinct_sketch"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        rel = abs(r["kmv_estimate"] - r["n_exact"]) / r["n_exact"]
        assert rel < 0.38, f"{r['event_type']}: rel error {rel:.2f}"


def test_kmv_exact_below_k(spark):
    """Groups with fewer than k distinct keys must report exactly."""
    from hoops_edge_database_etl_spark.tables import load

    # restrict events to a handful of users → distinct count < k=64
    ev = load(spark, SF_DIR, "events").filter(F.col("user_id") < 10)
    small = ev.select("event_type", "user_id").distinct()
    n = {r["event_type"]: r["n"] for r in small.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    # run the sketch pipeline inline on the filtered frame
    from pyspark.sql import Window

    h = F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10).cast("long")
    w = Window.partitionBy("event_type").orderBy("hv")
    ranked = small.select("event_type", h.alias("hv")).withColumn("rn", F.row_number().over(w))
    sk = ranked.filter(F.col("rn") <= 64).groupBy("event_type").agg(F.count(F.lit(1)).alias("kk"))
    for r in sk.collect():
        assert r["kk"] == n[r["event_type"]]


def test_stratified_sample_is_repartition_proof(spark):
    """Sample membership must be identical under different physical
    layouts — the property df.sample() does NOT have."""
    from hoops_edge_database_etl_spark.queries import all_queries

    fn = all_queries()["q73_stratified_sample"]
    base = {(r["doc_id"], r["lang"]) for r in fn(spark, SF_DIR).collect()}

    from hoops_edge_database_etl_spark.tables import load
    from pyspark.sql import Window

    d = load(spark, SF_DIR, "documents").repartition(7, "doc_id")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":sample")))
    w = Window.partitionBy("lang").orderBy(key, "doc_id")
    re = {
        (r["doc_id"], r["lang"])
        for r in d.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 25)
        .collect()
    }
    assert re == base


def test_top_k_per_group_matches_window(spark):
    """Two-phase top-k equals the single-window form on a multi-partition
    input, including rank values."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from hoops_edge_database_etl_spark.operators.topk import top_k_per_group

    df = spark.range(0, 1000, 1, 8).select(
        (F.col("id") % 7).alias("g"), (F.col("id") * 37 % 101).alias("v"), "id"
    )
    got = {
        (r["g"], r["id"], r["rank"])
        for r in top_k_per_group(df, ["g"], [F.col("v"), F.col("id")], 5).collect()
    }
    w = Window.partitionBy("g").orderBy("v", "id")
    want = {
        (r["g"], r["id"], r["rank"])
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .collect()
    }
    assert got == want


def test_top_k_per_group_rejects_bad_input(spark):
    import pyspark.sql.functions as F
    import pytest

    from hoops_edge_database_etl_spark.operators.topk import top_k_per_group

    df = spark.range(5).select(F.col("id").alias("g"), F.col("id").alias("rank"))
    with pytest.raises(ValueError, match="clash"):
        top_k_per_group(df, ["g"], [F.col("g")], 2)
    with pytest.raises(ValueError, match="k must be"):
        top_k_per_group(df.withColumnRenamed("rank", "v"), ["g"], [F.col("v")], 0)


def test_countmin_never_underestimates(spark):
    """CM sketch point estimates are ≥ exact counts by construction."""
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q125_countmin_heavy_hitters"](spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["cm_estimate"] >= r["exact_cnt"]
        assert r["overestimate"] == r["cm_estimate"] - r["exact_cnt"]


def test_kmv_set_ops_bounds(spark):
    """Union/intersection estimates within KMV 3σ of exact; Jaccard in [0,1]."""
    from hoops_edge_database_etl_spark.queries import all_queries

    r = all_queries()["q126_kmv_set_ops"](spark, SF_DIR).collect()[0]
    assert 0.0 <= r["est_jaccard"] <= 1.0
    assert abs(r["est_union"] - r["exact_union"]) / r["exact_union"] < 0.38
    # intersection inherits union + jaccard error; generous 3σ-ish bound
    assert abs(r["est_intersection"] - r["exact_intersection"]) <= max(
        10.0, 0.5 * r["exact_intersection"]
    )


def test_mad_outliers_matches_driver_side(spark):
    """MAD per group equals a pandas recomputation (lower-median rank)."""
    import math

    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.tables import load

    got = {
        r["event_type"]: r
        for r in all_queries()["q127_mad_outliers"](spark, SF_DIR).collect()
    }
    pdf = load(spark, SF_DIR, "events").select("event_type", "value").toPandas()
    for et, grp in pdf.groupby("event_type"):
        vs = sorted(grp["value"].astype(float))
        k = math.ceil(0.5 * len(vs))
        med = vs[k - 1]
        devs = sorted(abs(v - med) for v in vs)
        mad = devs[k - 1]
        assert got[et]["median"] == med
        assert got[et]["mad"] == mad
        assert got[et]["n_outliers"] == sum(1 for d in devs if d > 3 * mad)


def test_winsorize_clamps_ten_percent(spark):
    """Roughly 10% of each group is clamped ([p05, p95] caps) and the
    winsorized sum never exceeds the raw sum of caps."""
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q140_winsorize"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["p05"] < r["p95"]
        assert r["n_clamped"] >= 1


def test_pca_matches_numpy_replication(spark):
    """The distributed fixed-point power iteration equals a driver-side
    numpy replay of the identical integer arithmetic."""
    import math

    import numpy as np

    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.similarity import (
        PCA_Q,
        PCA_S,
        PCA_SWEEPS,
    )
    from hoops_edge_database_etl_spark.tables import load

    got = {
        r["dim"]: r["v"]
        for r in all_queries()["q141_pca_power_iteration"](spark, SF_DIR).collect()
    }
    emb = load(spark, SF_DIR, "embeddings").select("embedding").collect()
    mat = np.array([np.asarray(r["embedding"], dtype=np.float64) for r in emb])
    q = np.floor(mat * PCA_Q + 0.5).astype(np.int64)
    nr = float(len(q))
    gram = np.floor((q.T.astype(object) @ q.astype(object)).astype(np.float64) / nr)
    v = np.full(q.shape[1], PCA_S, dtype=object)
    for _ in range(PCA_SWEEPS):
        w = gram.astype(object) @ v
        m = max(abs(int(x)) for x in w)
        v = np.array(
            [int(math.floor(float(int(x)) * float(PCA_S) / float(m))) for x in w],
            dtype=object,
        )
    if sum(int(x) for x in v) < 0:
        v = -v
    want = {i: int(v[i]) for i in range(len(v))}
    assert got == want
    assert max(abs(x) for x in got.values()) == PCA_S


def test_equidepth_buckets_are_balanced(spark):
    """Equi-depth means every bucket holds n/B rows up to boundary ties,
    and bucket ranges tile the value domain in order."""
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = sorted(
        all_queries()["q153_equidepth_histogram"](spark, SF_DIR).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in rows] == list(range(8))
    n = sum(r["n_rows"] for r in rows)
    for r in rows:
        assert abs(r["n_rows"] - n / 8) <= max(2.0, 0.02 * n)
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"]


def test_ols_scoring_residuals_bound_rmse(spark):
    """max |residual| >= rmse, and the fit is exact on its own power sums
    (slope finite, rmse >= 0)."""
    import math

    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q152_ols_scoring"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert math.isfinite(r["slope"])
        assert 0.0 <= r["rmse_cents"] <= r["max_abs_residual_cents"]


def test_weighted_median_splits_token_mass(spark):
    """At the weighted median, at least half the token mass lies at or
    below it and at least half at or above (the defining property)."""
    import pyspark.sql.functions as F2

    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.tables import load

    med = {
        r["source"]: (r["weighted_median"], r["total_weight"])
        for r in all_queries()["q162_weighted_median"](spark, SF_DIR).collect()
    }
    rows = (
        load(spark, SF_DIR, "documents")
        .select(
            "source",
            F2.size(F2.split("text", " ")).alias("w"),
            F2.col("n_chars").cast("double").alias("v"),
        )
        .collect()
    )
    per_src: dict[str, list] = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append((r["v"], r["w"]))
    for src, (m, tw) in med.items():
        below = sum(w for v, w in per_src[src] if v <= m)
        above = sum(w for v, w in per_src[src] if v >= m)
        assert 2 * below >= tw and 2 * above >= tw
        assert tw == sum(w for _, w in per_src[src])


def test_bootstrap_variance_estimates_the_total(spark, duck):
    from tests.conftest import SF_DIR, compare_query
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q172_bootstrap_variance")
    r = all_queries()["q172_bootstrap_variance"](spark, SF_DIR).collect()[0]
    assert r["n_replicates"] == 32
    assert r["boot_se"] > 0
    # Poisson(1) multiplicities are unbiased: the replicate mean sits
    # within a few SEs of the point estimate.
    assert abs(r["boot_mean"] - r["point_total_cents"]) < 6 * r["boot_se"]


def test_iqr_fences_match_numpy_style_selection(spark, duck):
    from tests.conftest import SF_DIR, compare_query
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q198_iqr_outliers")
    rows = all_queries()["q198_iqr_outliers"](spark, SF_DIR).collect()
    for r in rows:
        assert r["p25_cents"] <= r["p75_cents"]
        assert 0 <= r["n_outliers"] < r["n_events"]


def test_bitmap_presence_conserves_users(spark, duck):
    from tests.conftest import SF_DIR, compare_query
    from hoops_edge_database_etl_spark.queries import all_queries

    compare_query(spark, duck, "q213_bitmap_presence")
    rows = all_queries()["q213_bitmap_presence"](spark, SF_DIR).collect()
    assert sum(r["n_users"] for r in rows) == 150
    for r in rows:
        assert 1 <= r["n_active_days"] <= 31
        assert r["n_active_first3_streak"] <= r["n_users"]


def test_q232_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q232_sketch_rollup_merge")


def test_q232_merge_identity(spark):
    """Merging daily KMV sketches must EXACTLY reproduce the direct
    weekly sketch — the provable property that makes the rollup safe."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q232_sketch_rollup_merge"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["est_from_merge"] == r["est_direct"]


def test_q269_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q269_compaction_planner")


def test_q269_groups_near_target(spark):
    """Greedy cumsum cutting: every merge group except possibly a
    partition's last lands within one small-file of the 16 KB target."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q269_compaction_planner"](spark, SF_DIR).collect()
    assert rows
    by_month = {}
    for r in rows:
        by_month.setdefault(r["part_month"], []).append(r)
    for month, groups in by_month.items():
        groups.sort(key=lambda g: g["merge_group"])
        for g in groups[:-1]:
            # a non-final group spans the target (within one file's bytes)
            assert g["group_bytes"] >= 16384 - 8192
        for g in groups:
            assert g["group_bytes"] < 16384 + 8192


def test_q272_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q272_bloom_fpr_audit")


def test_q272_no_false_negatives(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    r = all_queries()["q272_bloom_fpr_audit"](spark, SF_DIR).collect()[0]
    assert r["members_passed"] == r["n_members"]  # blooms never miss members
    assert 0 <= r["observed_fpr_ppm"] <= 1_000_000
    assert r["n_members"] + r["n_non_members"] == 1500


def test_q273_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q273_codec_advisor")


def test_q273_verdicts_reasonable(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = {
        r["col_name"]: r
        for r in all_queries()["q273_codec_advisor"](spark, SF_DIR).collect()
    }
    # 3-value flag must dictionary-encode; ~unique price must stay plain
    assert rows["l_returnflag"]["advised_codec"].startswith("DICT")
    assert rows["l_extendedprice"]["advised_codec"] == "PLAIN"


def test_q275_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q275_index_advisor")


def test_q275_advice_thresholds(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q275_index_advisor"](spark, SF_DIR).collect()
    assert len(rows) == 4
    for r in rows:
        sel = r["matched"] / r["n"]
        if sel <= 0.01:
            assert r["advice"] == "cluster-or-index"
        elif sel <= 0.10:
            assert r["advice"] == "zone-map-benefit"
        else:
            assert r["advice"] == "full-scan"
    assert {r["advice"] for r in rows} >= {"cluster-or-index", "full-scan"}


def test_q288_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q288_consistent_hash_rebalance")


def test_q288_rendezvous_beats_modn(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = {
        r["scheme"]: r
        for r in all_queries()["q288_consistent_hash_rebalance"](spark, SF_DIR).collect()
    }
    # mod-N reshuffles ~8/9 of keys; rendezvous moves ~1/9
    assert rows["mod-N"]["moved_ppm"] > 700_000
    assert rows["rendezvous"]["moved_ppm"] < 250_000
    assert rows["rendezvous"]["n_moved"] < rows["mod-N"]["n_moved"]


def test_q306_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q306_quantile_normalize")


def test_q306_preserves_group_order_and_hits_pooled_max(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q306_quantile_normalize"](spark, SF_DIR).collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    pooled_max = max(r["cents"] for r in rows)
    for grp in by_type.values():
        grp.sort(key=lambda r: (r["cents"], r["event_id"]))
        norms = [r["norm_cents"] for r in grp]
        assert norms == sorted(norms)  # order-preserving
        assert norms[-1] == pooled_max  # top rank maps to pooled max


def test_q329_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q329_density_grid")


def test_q329_grid_bounded_and_complete(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q329_density_grid"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r["hour_of_day"] <= 23
        assert r["n"] >= 1
    [(n_events,)] = duck.execute("SELECT COUNT(*) FROM events").fetchall()
    assert sum(r["n"] for r in rows) == n_events  # every point lands somewhere
    # bounded output regardless of input size
    assert len(rows) <= 5 * 24 * 14


def test_q333_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q333_median_ci")


def test_q333_ci_brackets_median(spark, duck):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q333_median_ci"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["ci_lo"] <= r["median_cents"] <= r["ci_hi"]
    # median agrees with an independent exact computation
    truth = dict(
        duck.execute(
            """SELECT event_type,
               CAST(quantile_disc(CAST(floor(value*100+0.5) AS BIGINT), 0.5)
                    AS BIGINT)
               FROM events GROUP BY 1"""
        ).fetchall()
    )
    for r in rows:
        # ceil-rank median can sit one support point off quantile_disc's
        # convention; it must still be inside the CI and near the truth
        assert r["ci_lo"] <= truth[r["event_type"]] <= r["ci_hi"]


def test_q340_matches_oracle(spark, duck):
    from tests.conftest import compare_query

    compare_query(spark, duck, "q340_var_cvar")


def test_q340_cvar_dominates_var(spark):
    """Expected shortfall is at least as bad as VaR (coherence), and the
    tail actually holds ~5% of days."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries

    rows = all_queries()["q340_var_cvar"](spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["cvar95_cents"] <= r["var95_cents"]
        assert 1 <= r["tail_n"]
        assert r["tail_n"] <= max(2, r["n_days"] // 10)
        assert abs(r["cvar95_cents"] - r["tail_sum_cents"] / r["tail_n"]) < 1e-9


def test_q273_seam_null_contract():
    """r11 ADVICE: the streaming repeats kernel's seam predicate must
    mirror the old whole-partition object-dtype semantics — None==None
    counts as a repeat; a null on exactly one side never does."""
    import math

    from hoops_edge_database_etl_spark.queries.layout import _seam_repeat

    assert _seam_repeat(None, None) is True
    assert _seam_repeat(math.nan, math.nan) is True  # pd.isna treats NaN as null
    assert _seam_repeat(None, 5) is False
    assert _seam_repeat(5, None) is False
    assert _seam_repeat(5, 5) is True
    assert _seam_repeat(5, 6) is False
    assert _seam_repeat("A", "A") is True
