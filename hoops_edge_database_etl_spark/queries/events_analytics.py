"""Event-stream analytics: funnel conversion, cohort retention, and
document keyword extraction — the OLAP trio every events warehouse runs
daily (the reference's user-journey audit SQL,
bronze_silver_validation_queries.sql:63-118, generalized). All exactly
SQL-expressible, so every query here is hash-checked against DuckDB;
timestamps stay in microseconds on both engines (tables.load truncates
the parquet nanos identically to DuckDB's read).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hoops_edge_database_etl_spark.queries import query
from hoops_edge_database_etl_spark.tables import load


@query(
    "q89_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t0 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t1
      FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t0
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t1
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT * FROM (
      SELECT 1 AS step, 'view' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
      UNION ALL
      SELECT 2, 'click', CAST(COUNT(*) AS BIGINT) FROM c
      UNION ALL
      SELECT 3, 'purchase', CAST(COUNT(*) AS BIGINT) FROM p
    ) s
    """,
)
def q89_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view → click → purchase): a user counts
    at step N only with an event strictly after their step-N−1 time.
    Each stage is one groupBy-min plus an equi join on user_id — three
    shuffles on the same key, so at scale the exchanges reuse one
    partitioning (and the per-stage frames shrink monotonically). No
    window over the raw stream, no per-user sort."""
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )

    def stage(df: DataFrame, step: int, name: str) -> DataFrame:
        return df.agg(
            F.lit(step).cast("int").alias("step"),
            F.lit(name).alias("stage"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        )

    return stage(v, 1, "view").unionByName(stage(c, 2, "click")).unionByName(
        stage(p, 3, "purchase")
    )


@query(
    "q90_cohort_retention",
    oracle="""
    WITH f AS (
      SELECT user_id,
             MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ),
    a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    j AS (
      SELECT date_diff('day', DATE '2024-01-01', f.first_day) // 7 AS cohort_week,
             date_diff('day', f.first_day, a.day) // 7 AS week_offset,
             a.user_id
      FROM a JOIN f USING (user_id)
    )
    SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM j GROUP BY cohort_week, week_offset
    """,
)
def q90_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by the week of their first
    event (week index from a fixed epoch — cross-engine exact integer
    date math, no locale-dependent week functions), counted in every
    week-offset they return. Two shuffles on user_id (first-day agg +
    the distinct-day self-join reuse the partitioning) then one on the
    (cohort, offset) cell — the matrix itself is weeks², driver-tiny at
    any data scale."""
    ev = load(spark, sf_dir, "events")
    day = F.col("ts").cast("date")
    f = ev.groupBy("user_id").agg(F.min(day).alias("first_day"))
    a = ev.select("user_id", day.alias("day")).distinct()
    j = a.join(f, "user_id").select(
        F.floor(
            F.datediff(F.col("first_day"), F.lit("2024-01-01").cast("date")) / 7
        ).alias("cohort_week"),
        F.floor(F.datediff(F.col("day"), F.col("first_day")) / 7).alias("week_offset"),
        "user_id",
    )
    return j.groupBy("cohort_week", "week_offset").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users")
    ).select(
        F.col("cohort_week").cast("bigint").alias("cohort_week"),
        F.col("week_offset").cast("bigint").alias("week_offset"),
        "n_users",
    )


@query(
    "q92_keyword_extraction",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    tf AS (
      SELECT doc_id, t.tok AS token, COUNT(*) AS tf
      FROM toks, UNNEST(w) AS t(tok)
      WHERE t.tok <> ''
      GROUP BY doc_id, t.tok
    ),
    df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    ranked AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY tf.tf DESC, df.df ASC, tf.token
             ) AS kw_rank
      FROM tf JOIN df USING (token) CROSS JOIN n
      WHERE CAST(df.df AS DOUBLE) / CAST(n.n_docs AS DOUBLE) <= 0.2
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, token,
           CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(kw_rank AS BIGINT) AS kw_rank
    FROM ranked WHERE kw_rank <= 3
    """,
)
def q92_keyword_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-style keyword extraction, integer-exact: top-3 tokens per
    document ranked by term frequency with document frequency as the
    inverse-salience tiebreak, after dropping corpus-stopwords (df >
    20% of docs) — the ln-free form of tf·idf ranking that both engines
    reproduce bit-for-bit (a float idf would hang cross-engine parity on
    libm's log). Two map-side-combining shuffles (tf, df) plus the
    associative two-phase top-k — no per-doc sort owns a reducer."""
    from hoops_edge_database_etl_spark.operators.topk import top_k_per_group

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    )
    tf = (
        d.select("doc_id", F.explode("w").alias("token"))
        .filter(F.col("token") != "")
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    cand = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .filter(F.col("df").cast("double") / F.col("n_docs").cast("double") <= 0.2)
    )
    out = top_k_per_group(
        cand,
        ["doc_id"],
        [F.col("tf").desc(), F.col("df").asc(), F.col("token")],
        3,
        rank_col="kw_rank",
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "token",
        F.col("tf").cast("bigint").alias("tf"),
        F.col("df").cast("bigint").alias("df"),
        F.col("kw_rank").cast("bigint").alias("kw_rank"),
    )


def _skyline_kernel(pdf):
    """Exact 2-D skyline of (maximize price_c, minimize size): sort by
    (price desc, size asc); a price-group survives only when its min size
    strictly undercuts every higher-priced point's best size, and within
    a group only min-size points survive (same price + smaller size
    dominates). O(n log n), duplicate points all kept (mutual
    non-dominance needs strictness in one dimension)."""
    import numpy as np

    p = pdf.sort_values(["price_c", "size"], ascending=[False, True], kind="mergesort")
    keep = np.zeros(len(p), dtype=bool)
    best = None  # smallest size seen among strictly-higher prices
    prices = p["price_c"].to_numpy()
    sizes = p["size"].to_numpy()
    i = 0
    while i < len(p):
        j = i
        while j < len(p) and prices[j] == prices[i]:
            j += 1
        gmin = sizes[i:j].min()
        if best is None or gmin < best:
            keep[i:j] = sizes[i:j] == gmin
            best = gmin if best is None else min(best, gmin)
        i = j
    return p[keep]


@query(
    "q119_pareto_frontier",
    oracle="""
    WITH pts AS (
      SELECT CAST(p_partkey AS BIGINT) AS p_partkey,
             CAST(p_retailprice * 100 AS BIGINT) AS price_c,
             CAST(p_size AS BIGINT) AS size
      FROM part
    )
    SELECT p.p_partkey, p.price_c, p.size
    FROM pts p
    WHERE NOT EXISTS (
      SELECT 1 FROM pts q
      WHERE q.price_c >= p.price_c AND q.size <= p.size
        AND (q.price_c > p.price_c OR q.size < p.size)
    )
    """,
)
def q119_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Pareto frontier (skyline): parts maximizing retail
    price while minimizing size, with integer-cents dimensions so the
    dominance test is exact. Two-phase plan — the distributed-skyline
    identity ``skyline(X ∪ Y) = skyline(skyline(X) ∪ skyline(Y))``:

      1. local skyline per input partition (mapInPandas — each partition
         reduced to its own frontier, typically a tiny fraction);
      2. global skyline over the unioned candidates in one bounded
         group (survivor count is frontier-sized by construction).

    No dominance self-join anywhere (the naive NOT EXISTS the ORACLE
    runs would be a nested-loop quadratic — fine for DuckDB at sf0.01,
    wrong at 100 TB). At extreme candidate counts, insert a grid-cell
    pre-dominance pass (coarse quantile buckets, drop cells dominated by
    a whole cell) before phase 2 — same kernel either way."""
    p = load(spark, sf_dir, "part")
    pts = p.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        (F.col("p_retailprice") * 100).cast("long").alias("price_c"),
        F.col("p_size").cast("long").alias("size"),
    )
    schema = "p_partkey long, price_c long, size long"
    local = pts.mapInPandas(
        lambda it: (_skyline_kernel(pdf) for pdf in it), schema=schema
    )
    merged = (
        local.withColumn("__g", F.lit(0))
        .groupBy("__g")
        .applyInPandas(
            lambda pdf: _skyline_kernel(pdf.drop(columns="__g")), schema=schema
        )
    )
    return merged


@query(
    "q121_interval_concurrency",
    oracle="""
    WITH iv AS (
      SELECT o_orderpriority AS prio,
             CAST(o_orderdate AS DATE) AS s,
             CAST(o_orderdate AS DATE) + CAST(o_orderkey % 30 + 1 AS INTEGER) AS e
      FROM orders
    ),
    delta AS (
      SELECT prio, d, SUM(x) AS net FROM (
        SELECT prio, s AS d, 1 AS x FROM iv
        UNION ALL
        SELECT prio, e AS d, -1 AS x FROM iv
      ) GROUP BY prio, d
    ),
    run AS (
      SELECT prio, d,
             SUM(net) OVER (PARTITION BY prio ORDER BY d
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS active
      FROM delta
    )
    SELECT prio,
           CAST(active AS BIGINT) AS max_concurrent,
           strftime(d, '%Y-%m-%d') AS peak_day
    FROM (
      SELECT prio, d, active,
             ROW_NUMBER() OVER (PARTITION BY prio
                                ORDER BY active DESC, d ASC) AS rn
      FROM run
    ) WHERE rn = 1
    """,
)
def q121_interval_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency per order priority — the classic
    boundary-sweep (+1 at start, −1 past end, half-open [s, e)): how many
    orders are simultaneously open at the busiest instant. The sweep
    collapses boundaries to NET-PER-DAY before any ordering, so the
    running sum's window is bounded by the DATE RANGE per priority (a
    few thousand rows), never the order count — the q91 calendar-bound
    rule; the only full-data pass is the map-side-combining delta
    aggregate. Peak day ties break to the earliest day (deterministic
    rank in both engines)."""
    o = load(spark, sf_dir, "orders")
    iv = o.select(
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderdate").alias("s"),
        F.date_add(F.col("o_orderdate"), (F.col("o_orderkey") % 30 + 1).cast("int")).alias("e"),
    )
    delta = (
        iv.select("prio", F.col("s").alias("d"), F.lit(1).alias("x"))
        .unionAll(iv.select("prio", F.col("e").alias("d"), F.lit(-1).alias("x")))
        .groupBy("prio", "d")
        .agg(F.sum("x").alias("net"))
    )
    w = Window.partitionBy("prio").orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = delta.withColumn("active", F.sum("net").over(w))
    rk = Window.partitionBy("prio").orderBy(F.col("active").desc(), F.col("d").asc())
    return (
        run.withColumn("rn", F.row_number().over(rk))
        .filter(F.col("rn") == 1)
        .select(
            "prio",
            F.col("active").cast("bigint").alias("max_concurrent"),
            F.date_format("d", "yyyy-MM-dd").alias("peak_day"),
        )
    )


@query(
    "q124_touch_attribution",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN event_type <> 'purchase' THEN event_type END AS touch,
             LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_touch,
             FIRST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
                         IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS first_touch
      FROM events
    )
    SELECT last_touch, first_touch,
           CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM seq
    WHERE event_type = 'purchase' AND last_touch IS NOT NULL
    GROUP BY last_touch, first_touch
    """,
)
def q124_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last-touch conversion attribution — the marketing-analytics
    classic: every purchase is credited to the nearest preceding
    non-purchase touch (last-touch) AND the user's earliest touch
    (first-touch), in one pass with two ignore-nulls window scans over
    the per-user event sequence ((ts, event_id) total order — the unique
    tiebreak rule every window in this repo follows). Purchases with no
    prior touch are excluded (no attribution target). One shuffle on
    user_id; per-user sequences are session-bounded at any corpus size."""
    ev = load(spark, sf_dir, "events")
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.withColumn("last_touch", F.last(touch, ignorenulls=True).over(w)).withColumn(
        "first_touch", F.first(touch, ignorenulls=True).over(w)
    )
    return (
        seq.filter((F.col("event_type") == "purchase") & F.col("last_touch").isNotNull())
        .groupBy("last_touch", "first_touch")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )
