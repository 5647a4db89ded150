"""Property-based operator invariants (hypothesis): each custom operator
is checked against an independent, obviously-correct reference on
randomized inputs — the strategy the reference repo's own test suite
models (SURVEY §5), extended with generated edge cases.

Spark-bound properties batch each hypothesis example into ONE DataFrame
round-trip and keep ``max_examples`` small; the per-example reference is
pure Python."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SPARK_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    derandomize=True,  # CI-stable: failures reproduce run-to-run
)


# --- range join ----------------------------------------------------------

intervals_st = st.lists(
    st.tuples(st.integers(-50, 150), st.integers(0, 40)), min_size=1, max_size=12
)
points_st = st.lists(st.integers(-60, 200), min_size=1, max_size=30)


@given(points=points_st, ivals=intervals_st, w=st.integers(1, 25))
@settings(**SPARK_SETTINGS)
def test_range_join_matches_naive(spark, points, ivals, w):
    from hoops_edge_database_etl_spark.operators.rangejoin import range_join

    pdf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(points)], "pid long, p long"
    )
    idf = spark.createDataFrame(
        [(i, lo, lo + ln) for i, (lo, ln) in enumerate(ivals)],
        "iid long, lo long, hi long",
    )
    got = {
        (r["pid"], r["iid"])
        for r in range_join(pdf, idf, "p", "lo", "hi", w).collect()
    }
    want = {
        (pi, ii)
        for pi, p in enumerate(points)
        for ii, (lo, ln) in enumerate(ivals)
        if lo <= p <= lo + ln
    }
    assert got == want


# --- as-of join ----------------------------------------------------------

asof_st = st.tuples(
    # right rows: (key, ts, value)
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50), st.integers(-5, 5)),
        min_size=1,
        max_size=20,
    ),
    # left rows: (key, ts)
    st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 50)), min_size=1, max_size=20
    ),
    st.booleans(),
)


@given(data=asof_st)
@settings(**SPARK_SETTINGS)
def test_asof_join_matches_pure_python(spark, data):
    from hoops_edge_database_etl_spark.operators.asof import asof_join

    rights, lefts, strict = data
    # de-dup (key, ts) on the right: with duplicates the "latest preceding
    # row" is ambiguous — the operator documents last-wins-by-window-order,
    # which a set-based oracle can't pin down. Keep max value per (key, ts).
    best: dict[tuple[int, int], int] = {}
    for k, ts, v in rights:
        best[(k, ts)] = max(v, best.get((k, ts), v))
    rights = [(k, ts, v) for (k, ts), v in best.items()]

    ldf = spark.createDataFrame(
        [(i, k, ts) for i, (k, ts) in enumerate(lefts)], "lid long, k long, lts long"
    )
    rdf = spark.createDataFrame(rights, "k long, rts long, val long")
    got = {
        (r["lid"], r["val"])
        for r in asof_join(
            ldf, rdf, on="k", left_ts="lts", right_ts="rts",
            value_cols=["val"], strict=strict,
        ).collect()
    }
    want = set()
    for i, (k, lts) in enumerate(lefts):
        cands = [
            (rts, v)
            for (rk, rts, v) in rights
            if rk == k and (rts < lts if strict else rts <= lts)
        ]
        want.add((i, max(cands)[1] if cands else None))
    assert got == want


# --- salted operators ----------------------------------------------------

rows_st = st.lists(
    st.tuples(st.sampled_from(["hot", "hot", "hot", "a", "b"]), st.integers(-100, 100)),
    min_size=1,
    max_size=40,
)


@given(rows=rows_st, n_salts=st.integers(1, 8))
@settings(**SPARK_SETTINGS)
def test_salted_agg_matches_pure_python(spark, rows, n_salts):
    from hoops_edge_database_etl_spark.operators.skew import salted_agg

    df = spark.createDataFrame(rows, "k string, v long")
    got = {
        (r["k"], r["s"], r["n"], r["mn"])
        for r in salted_agg(
            df,
            ["k"],
            {"s": ("sum", F.col("v")), "n": ("count", F.lit(1)), "mn": ("min", F.col("v"))},
            n_salts=n_salts,
        ).collect()
    }
    agg: dict[str, list[int]] = {}
    for k, v in rows:
        agg.setdefault(k, []).append(v)
    want = {(k, sum(vs), len(vs), min(vs)) for k, vs in agg.items()}
    assert got == want


@given(
    rows=rows_st,
    right=st.lists(
        st.tuples(st.sampled_from(["hot", "a", "zz"]), st.integers(0, 9)),
        max_size=8,
    ),
    n_salts=st.integers(1, 6),
    how=st.sampled_from(["inner", "left"]),
)
@settings(**SPARK_SETTINGS)
def test_salted_join_matches_plain_join(spark, rows, right, n_salts, how):
    from hoops_edge_database_etl_spark.operators.skew import salted_join

    ldf = spark.createDataFrame(rows, "k string, v long")
    rdf = spark.createDataFrame(right, "k string, w long") if right else (
        spark.createDataFrame([], "k string, w long")
    )
    got = sorted(
        (r["k"], r["v"], r["w"])
        for r in salted_join(ldf, rdf, ["k"], n_salts=n_salts, how=how).collect()
    )
    want = sorted(
        (r["k"], r["v"], r["w"]) for r in ldf.join(rdf, ["k"], how).collect()
    )
    assert got == want


# --- MinHash -------------------------------------------------------------

words = st.text(alphabet="abcdef", min_size=1, max_size=4)
word_sets = st.sets(words, min_size=1, max_size=15)


@given(sets=st.lists(st.tuples(word_sets, word_sets), min_size=1, max_size=6))
@settings(**SPARK_SETTINGS)
def test_minhash_union_is_elementwise_min(spark, sets):
    """sig(A ∪ B)[i] == min(sig(A)[i], sig(B)[i]) — the defining property
    of min-wise hashing; catches any per-element hashing drift."""
    from hoops_edge_database_etl_spark.functions.text import (
        base_hash60,
        minhash_from_hashes,
    )

    rows = [
        (i, sorted(a), sorted(b), sorted(a | b)) for i, (a, b) in enumerate(sets)
    ]
    df = spark.createDataFrame(
        rows, "i long, a array<string>, b array<string>, u array<string>"
    )
    def sig(col):
        return minhash_from_hashes(F.transform(col, base_hash60))

    out = df.select(
        sig(F.col("a")).alias("sa"), sig(F.col("b")).alias("sb"), sig(F.col("u")).alias("su")
    ).collect()
    for r in out:
        assert r["su"] == [min(x, y) for x, y in zip(r["sa"], r["sb"])]


# --- lenient casts -------------------------------------------------------

int64s = st.integers(-(2**63) + 1, 2**63 - 1)


@given(vals=st.lists(int64s, min_size=1, max_size=50))
@settings(**SPARK_SETTINGS)
def test_lenient_cast_preserves_full_int64(spark, vals):
    """String round-trip through lenient_cast must be exact for EVERY
    int64 — including magnitudes above 2^53 where the via-double fallback
    would round (the ADVICE r1 precision bug, kept fixed)."""
    from pyspark.sql.types import LongType

    from hoops_edge_database_etl_spark.normalize import lenient_cast

    df = spark.createDataFrame([(str(v),) for v in vals], "s string")
    out = [r["x"] for r in df.select(lenient_cast(F.col("s"), LongType()).alias("x")).collect()]
    assert out == vals


def test_lenient_cast_quirks(spark):
    from pyspark.sql.types import LongType

    from hoops_edge_database_etl_spark.normalize import lenient_cast

    df = spark.createDataFrame(
        [("12.0",), ("abc",), ("true",), ("-3",), (None,)], "s string"
    )
    out = [r["x"] for r in df.select(lenient_cast(F.col("s"), LongType()).alias("x")).collect()]
    assert out == [12, None, None, -3, None]


# --- stable split --------------------------------------------------------

def test_stable_split_matches_md5_reference_and_ratios(spark):
    """Spark assignment must equal the pure-Python md5 reference for every
    id, and the realized ratios must be near 80/10/10."""
    from hoops_edge_database_etl_spark.functions.text import stable_split

    n = 5000
    df = spark.range(n).select(F.col("id"))
    out = {r["id"]: r["s"] for r in df.select("id", stable_split(F.col("id")).alias("s")).collect()}

    def ref(i: int) -> str:
        b = int(hashlib.md5(f"{i}:split".encode()).hexdigest()[:8], 16) % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")

    assert out == {i: ref(i) for i in range(n)}
    counts = {s: sum(1 for v in out.values() if v == s) for s in ("train", "val", "test")}
    assert abs(counts["train"] / n - 0.80) < 0.03
    assert abs(counts["val"] / n - 0.10) < 0.02
    assert abs(counts["test"] / n - 0.10) < 0.02


# --- top-k per group ------------------------------------------------------

rows_tk_st = st.lists(
    st.tuples(st.integers(0, 4), st.integers(-100, 100)), min_size=1, max_size=60
)


@given(rows=rows_tk_st, k=st.integers(1, 6), nparts=st.integers(1, 6))
@settings(**SPARK_SETTINGS)
def test_top_k_per_group_matches_sorted_python(spark, rows, k, nparts):
    """Two-phase top-k equals pure-Python per-group sort for any k and any
    input partitioning (the associativity claim under test)."""
    from hoops_edge_database_etl_spark.operators.topk import top_k_per_group

    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)], "g long, v long, rid long"
    ).repartition(nparts)
    got = {
        (r["g"], r["rid"], r["rank"])
        for r in top_k_per_group(df, ["g"], [F.col("v"), F.col("rid")], k).collect()
    }
    want = set()
    by_g: dict[int, list] = {}
    for i, (g, v) in enumerate(rows):
        by_g.setdefault(g, []).append((v, i))
    for g, vs in by_g.items():
        for rank, (v, i) in enumerate(sorted(vs)[:k], start=1):
            want.add((g, i, rank))
    assert got == want


# --- exact k-th selection (the q93 plan shape, checked as pure logic) ----

vals_st = st.lists(
    st.floats(0, 1e6, allow_nan=False, allow_infinity=False, width=32),
    min_size=1,
    max_size=80,
)


@given(vals=vals_st, q=st.sampled_from([0.25, 0.5, 0.9, 0.99]))
@settings(**SPARK_SETTINGS)
def test_histogram_select_matches_sorted(spark, vals, q):
    """Histogram-locate + within-bin rank (q93's algorithm, rebuilt over a
    generated frame) returns exactly sorted(vals)[ceil(q*n)-1]."""
    import math

    from pyspark.sql import Window

    W = 500.0
    s = spark.createDataFrame([(float(v),) for v in vals], "v double")
    b = s.select("v", F.floor(F.col("v") / W).cast("long").alias("bin"))
    hist = b.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    wb = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist_cum = hist.withColumn("cum", F.sum("cnt").over(wb))
    n = len(vals)
    kk = math.ceil(q * n)
    located = hist_cum.filter(
        (F.col("cum") >= kk) & ((F.col("cum") - F.col("cnt")) < kk)
    ).select("bin", (F.col("cum") - F.col("cnt")).alias("cb"))
    wq = Window.orderBy("v")
    got = (
        b.join(F.broadcast(located), "bin")
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") == kk - F.col("cb"))
        .collect()
    )
    assert len(got) == 1
    assert got[0]["v"] == sorted(vals)[kk - 1]


# --- HLL sanity -----------------------------------------------------------

def test_hll_register_state_supports_accurate_estimation(spark):
    """Accuracy contract of q79's register state: at the test cardinality
    (n ≈ 150 « 2.5m) the standard estimator is LINEAR COUNTING from the
    zero-register count — m·ln(m/V) must land within ~10% of exact for
    every group. The ln stays Python-side: the oracle emits the raw
    harmonic estimate precisely because libm log is not cross-engine
    bit-stable (see q79 docstring); this test proves the state those
    corrections read (n_filled) is right."""
    import math

    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.sketches import HLL_M
    from tests.conftest import SF_DIR

    rows = all_queries()["q79_hll_distinct"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        v = HLL_M - r["n_filled"]
        assert v > 0  # small-range regime at sf0.01
        lc = HLL_M * math.log(HLL_M / v)
        rel = abs(lc - r["n_exact"]) / r["n_exact"]
        assert rel < 0.1, (r["event_type"], lc, r["n_exact"], rel)
        # the raw harmonic estimate must still be finite and positive
        assert r["hll_raw_estimate"] > 0


def test_bfs_levels_are_consistent(spark):
    """Every hop-h node (h>0) has an in-edge from some hop-(h-1) node,
    and no edge jumps levels by more than 1 (the BFS frontier
    invariant)."""
    import pyspark.sql.functions as F

    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.solver import BFS_SEEDS
    from hoops_edge_database_etl_spark.tables import load
    from tests.conftest import SF_DIR

    hops = {
        r["node"]: r["hops"]
        for r in all_queries()["q135_bfs_hops"](spark, SF_DIR).collect()
    }
    for s in BFS_SEEDS:
        assert hops[s] == 0
    o = load(spark, SF_DIR, "orders")
    edges = (
        o.select(
            (F.col("o_custkey") % 100).alias("src"),
            (F.col("o_orderkey") % 100).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .collect()
    )
    preds: dict[int, set] = {}
    for e in edges:
        preds.setdefault(e["dst"], set()).add(e["src"])
    for node, h in hops.items():
        if h == 0:
            continue
        assert any(
            hops.get(p) == h - 1 for p in preds.get(node, ())
        ), f"node {node} at hop {h} has no hop-{h-1} predecessor"
    for e in edges:
        if e["src"] in hops and e["dst"] in hops:
            assert hops[e["dst"]] <= hops[e["src"]] + 1


# --- weighted SSSP (q300) ------------------------------------------------


def test_sssp_fixpoint_no_relaxable_edge(spark):
    """Bellman-Ford's certificate: at the fixed point no edge can still
    relax — dist[v] <= dist[u] + w for every edge with dist[u]+w within
    the cap. Rebuilds the same deterministic edge list independently."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.solver import (
        SSSP_DIST_CAP,
        SSSP_SOURCE,
    )
    from hoops_edge_database_etl_spark.tables import load

    dist = {
        r["node"]: r["dist"]
        for r in all_queries()["q300_weighted_sssp"](spark, SF_DIR).collect()
    }
    assert dist[SSSP_SOURCE] == 0
    assert all(d > 0 for n, d in dist.items() if n != SSSP_SOURCE)
    edges = (
        load(spark, SF_DIR, "orders")
        .selectExpr(
            "o_custkey % 100 AS src", "o_orderkey % 100 AS dst"
        )
        .filter("src <> dst")
        .distinct()
        .collect()
    )
    for r in edges:
        u, v = r["src"], r["dst"]
        w = 1 + (u * 31 + v) % 9
        if u in dist and dist[u] + w <= SSSP_DIST_CAP:
            assert v in dist and dist[v] <= dist[u] + w


# --- key-gap audit (q301) ------------------------------------------------


def test_gap_audit_recovers_exact_punchout(spark, duck):
    """The audit's union of [gap_start, gap_end] ranges must equal the
    hash-dropped key set inside the observed span — computed here by an
    independent DuckDB pass over the raw keys."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.cdc import GAP_AUDIT_DROP_MOD

    gaps = all_queries()["q301_key_gap_audit"](spark, SF_DIR).collect()
    recovered = set()
    for g in gaps:
        assert g["missing_n"] == g["gap_end"] - g["gap_start"] + 1
        recovered |= set(range(g["gap_start"], g["gap_end"] + 1))
    dropped = {
        k
        for (k,) in duck.execute(
            f"""
            SELECT o_orderkey FROM orders
            WHERE CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':feed'),
                       1, 8) AS BIGINT) % {GAP_AUDIT_DROP_MOD} = 0
            """
        ).fetchall()
    }
    present_span = duck.execute(
        f"""
        SELECT MIN(o_orderkey), MAX(o_orderkey) FROM orders
        WHERE CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':feed'),
                   1, 8) AS BIGINT) % {GAP_AUDIT_DROP_MOD} <> 0
        """
    ).fetchone()
    expected = {k for k in dropped if present_span[0] < k < present_span[1]}
    assert recovered == expected


# --- negative sampling (q302) --------------------------------------------


def test_negative_samples_never_positive(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.queries.similarity import NEG_KEEP
    from hoops_edge_database_etl_spark.tables import load

    neg = all_queries()["q302_negative_sampling"](spark, SF_DIR)
    rows = neg.collect()
    assert rows
    per_cust = {}
    for r in rows:
        per_cust.setdefault(r["custkey"], []).append(r["rnk"])
    for ranks in per_cust.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= NEG_KEEP
    o = load(spark, SF_DIR, "orders").selectExpr("o_orderkey", "o_custkey AS custkey")
    li = load(spark, SF_DIR, "lineitem").selectExpr(
        "l_orderkey AS o_orderkey", "l_partkey AS neg_partkey"
    )
    pos = o.join(li, "o_orderkey").select("custkey", "neg_partkey").distinct()
    assert neg.join(pos, ["custkey", "neg_partkey"], "semi").isEmpty()


# --- DAG critical path (q318) --------------------------------------------


def test_dag_waves_respect_every_edge(spark):
    """Wave numbering certificate: wave(dst) >= wave(src) + 1 for every
    DAG edge, and some node sits at wave 0 (a root)."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.tables import load

    waves = {
        r["node"]: r["wave"]
        for r in all_queries()["q318_dag_critical_path"](spark, SF_DIR).collect()
    }
    assert min(waves.values()) == 0
    edges = (
        load(spark, SF_DIR, "orders")
        .selectExpr("o_custkey % 100 AS src", "o_orderkey % 100 AS dst")
        .filter("dst - src >= 7")
        .distinct()
        .collect()
    )
    assert edges
    for e in edges:
        assert waves[e["dst"]] >= waves[e["src"]] + 1


# --- modularity (q332) ---------------------------------------------------


def test_modularity_identities(spark):
    """Σ contributions / (2m)² == reported Q; Σ K_c == 2m; Σ E_within <= m;
    and Q is within the theoretical (-0.5, 1) range."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.tables import load

    rows = all_queries()["q332_graph_modularity"](spark, SF_DIR).collect()
    m = (
        load(spark, SF_DIR, "orders")
        .selectExpr(
            "LEAST(o_custkey % 100, o_orderkey % 100) AS u",
            "GREATEST(o_custkey % 100, o_orderkey % 100) AS v",
        )
        .filter("u <> v")
        .distinct()
        .count()
    )
    assert sum(r["k_total"] for r in rows) == 2 * m
    assert sum(r["e_within"] for r in rows) <= m
    q = rows[0]["modularity"]
    assert all(abs(r["modularity"] - q) < 1e-15 for r in rows)
    assert -0.5 < q < 1.0
    assert abs(sum(r["contribution_scaled"] for r in rows) / (4 * m * m) - q) < 1e-12


# --- DAG slack (q346) ----------------------------------------------------


def test_dag_slack_certificates(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.tables import load

    rows = {
        r["node"]: r
        for r in all_queries()["q346_dag_slack"](spark, SF_DIR).collect()
    }
    cp = next(iter(rows.values()))["critical_path_len"]
    assert all(r["critical_path_len"] == cp for r in rows.values())
    assert all(r["slack"] >= 0 for r in rows.values())
    on_cp = [r for r in rows.values() if r["slack"] == 0]
    # the critical path itself: cp+1 zero-slack nodes at distinct waves
    assert len({r["earliest_wave"] for r in on_cp}) == cp + 1
    edges = (
        load(spark, SF_DIR, "orders")
        .selectExpr("o_custkey % 100 AS src", "o_orderkey % 100 AS dst")
        .filter("dst - src >= 7")
        .distinct()
        .collect()
    )
    for e in edges:
        s, d = rows[e["src"]], rows[e["dst"]]
        # forward consistency and tail consistency per edge
        assert d["earliest_wave"] >= s["earliest_wave"] + 1
        assert s["tail_len"] >= d["tail_len"] + 1


# --- link prediction (q360) ----------------------------------------------


def test_link_prediction_excludes_existing_edges(spark):
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.tables import load

    rows = all_queries()["q360_link_prediction"](spark, SF_DIR).collect()
    assert len(rows) == 25
    edges = {
        (r["u"], r["v"])
        for r in load(spark, SF_DIR, "orders")
        .selectExpr(
            "LEAST(o_custkey % 100, o_orderkey % 100) AS u",
            "GREATEST(o_custkey % 100, o_orderkey % 100) AS v",
        )
        .filter("u <> v")
        .distinct()
        .collect()
    }
    for r in rows:
        assert (r["node_a"], r["node_b"]) not in edges  # predictions only
        assert r["common_neighbors"] >= 1
        assert 0 < r["jaccard_ppm"] <= 1_000_000
    cns = [r["common_neighbors"] for r in rows]
    assert cns == sorted(cns, reverse=True)


# --- assortativity (q405) ------------------------------------------------


def test_assortativity_symmetry_and_bounds(spark):
    """The symmetric edge list makes both endpoint margins identical —
    the collapse the three-sum formula relies on — and r is a valid
    correlation."""
    from tests.conftest import SF_DIR
    from hoops_edge_database_etl_spark.queries import all_queries
    from hoops_edge_database_etl_spark.tables import load
    import pyspark.sql.functions as FF

    [r] = all_queries()["q405_degree_assortativity"](spark, SF_DIR).collect()
    assert -1.0 <= r["assortativity"] <= 1.0
    raw = (
        load(spark, SF_DIR, "orders")
        .selectExpr(
            "LEAST(o_custkey % 100, o_orderkey % 100) AS u",
            "GREATEST(o_custkey % 100, o_orderkey % 100) AS v",
        )
        .filter("u <> v")
        .distinct()
    )
    assert r["n_edges"] == raw.count()
    adj = raw.selectExpr("u AS a", "v AS b").unionAll(
        raw.selectExpr("v AS a", "u AS b")
    )
    deg = adj.groupBy("a").agg(FF.count(FF.lit(1)).alias("k"))
    ends = (
        adj.join(deg.withColumnRenamed("k", "ku"), "a")
        .join(deg.withColumnRenamed("a", "b").withColumnRenamed("k", "kv"), "b")
    )
    [m] = ends.agg(
        FF.sum("ku").alias("sku"), FF.sum("kv").alias("skv"),
        FF.sum(FF.col("ku") * FF.col("ku")).alias("skuu"),
        FF.sum(FF.col("kv") * FF.col("kv")).alias("skvv"),
    ).collect()
    assert m["sku"] == m["skv"] and m["skuu"] == m["skvv"]  # the symmetry
