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
from pyspark.sql import DataFrame, SparkSession

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
