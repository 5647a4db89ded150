"""Core scan/filter/projection/sort queries (SURVEY.md §2.1–§2.2, §2.6).

Each query is declarative DataFrame code — Catalyst pushes the filters and the
projection into the parquet scan (verify with ``.explain``: PushedFilters /
ReadSchema), which replaces the reference's hand-rolled ``columns=`` lists and
S3 prefix pruning (reference: src/cbbd_etl/gold/_io_helpers.py:20-67, 109-114).

Determinism rules for the DuckDB oracle hash-match:
- money/ratio aggregates run in DECIMAL (exact, order-independent) and are
  cast to DOUBLE only in the final projection;
- counts/sums of integers are cast to BIGINT on both sides;
- timestamps leave as ``unix_micros`` BIGINT or 'yyyy-MM-dd' strings;
- every top-k has a total deterministic ordering (unique key tiebreak).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hoops_edge_database_etl_spark.queries import query
from hoops_edge_database_etl_spark.tables import load

DEC = "decimal(18,2)"


def _dec(c: str):
    return F.col(c).cast(DEC)


@query(
    "q01_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) * (1 + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '2000-01-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style hash aggregation — the flagship query.

    Mirrors the reference's per-(gameId,teamId) counter aggregation pyramid
    (A1/A2: scripts/build_pbp_game_team_stats.py:63-266) as a single
    map-side-combinable groupBy; at 100 TB this is one shuffle of the
    already-reduced partial aggregates.
    """
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") < "2000-01-01")
    disc_price = _dec("l_extendedprice") * (1 - _dec("l_discount"))
    charge = disc_price * (1 + _dec("l_tax"))
    out = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).alias("_sq"),
        F.sum(_dec("l_extendedprice")).alias("_sp"),
        F.sum(disc_price).alias("_sdp"),
        F.sum(charge).alias("_sc"),
        F.sum(_dec("l_discount")).alias("_sd"),
        F.count(F.lit(1)).alias("count_order"),
    )
    n = F.col("count_order")
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("_sq").cast("double").alias("sum_qty"),
        F.col("_sp").cast("double").alias("sum_base_price"),
        F.col("_sdp").cast("double").alias("sum_disc_price"),
        F.col("_sc").cast("double").alias("sum_charge"),
        (F.col("_sq").cast("double") / n).alias("avg_qty"),
        (F.col("_sp").cast("double") / n).alias("avg_price"),
        (F.col("_sd").cast("double") / n).alias("avg_disc"),
        n.cast("bigint").alias("count_order"),
    )


@query(
    "q02_filter_pushdown",
    oracle="""
    SELECT
      CAST(l_orderkey AS BIGINT) AS l_orderkey,
      CAST(l_linenumber AS BIGINT) AS l_linenumber,
      strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
      CAST(l_quantity AS DOUBLE) AS l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-03-01'
      AND l_quantity > 45
    """,
)
def q02_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection pushdown (P1/P3/S7/S8).

    The reference filtered in Python after a full read
    (src/cbbd_etl/gold/_io_helpers.py:109-114); here both predicates and the
    4-column projection reach the parquet row groups.
    """
    return (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-03-01")
            & (F.col("l_quantity") > 45)
        )
        .select(
            F.col("l_orderkey").cast("bigint").alias("l_orderkey"),
            F.col("l_linenumber").cast("bigint").alias("l_linenumber"),
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date"),
            F.col("l_quantity").cast("double").alias("l_quantity"),
        )
    )


@query(
    "q03_topk_orders",
    oracle="""
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(o_custkey AS BIGINT) AS o_custkey,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def q03_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (O2: ORDER BY ... LIMIT with unique-key tiebreak).

    Spark executes this as per-partition TakeOrdered + merge on the driver —
    no global sort shuffle, which is exactly what you want at 100 TB.
    """
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select(
            F.col("o_orderkey").cast("bigint"),
            F.col("o_custkey").cast("bigint"),
            F.col("o_totalprice").cast("double"),
            "o_orderpriority",
        )
    )


@query(
    "q04_conditional_record",
    oracle="""
    SELECT
      o_orderpriority,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
      CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
      CAST(SUM(CASE WHEN o_orderstatus = 'F' AND o_totalprice > 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big_finished
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q04_conditional_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation — the W/L-record pattern (A3:
    reference gold/team_season_summary.py:244-299) expressed as
    sum(when(...)) so it stays one map-side-combinable aggregate."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("n_finished"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
        .cast("bigint")
        .alias("n_open"),
        F.sum(
            F.when((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 1000), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_big_finished"),
    )


@query(
    "q05_value_clamp",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
           CAST(LEAST(9000.0, GREATEST(0.0, c_acctbal)) AS DOUBLE) AS acctbal_clamped,
           CASE WHEN c_acctbal < 0 OR c_acctbal > 9000 THEN 1 ELSE 0 END AS was_clamped
    FROM customer
    """,
)
def q05_value_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-sanity clamp (P8: reference gold/iterative_ratings.py:25-28,
    efficiency clamped to [40,200]) as least/greatest column exprs."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").cast("bigint"),
        F.least(F.lit(9000.0), F.greatest(F.lit(0.0), F.col("c_acctbal")))
        .cast("double")
        .alias("acctbal_clamped"),
        F.when((F.col("c_acctbal") < 0) | (F.col("c_acctbal") > 9000), 1)
        .otherwise(0)
        .alias("was_clamped"),
    )


@query(
    "q06_safe_division",
    oracle="""
    SELECT
      l_returnflag,
      CAST(CASE WHEN SUM(CAST(l_quantity AS DECIMAL(18,2))) > 0
                THEN CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                     / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                ELSE NULL END AS DOUBLE) AS price_per_unit,
      CAST(COALESCE(CASE WHEN SUM(CASE WHEN l_discount > 0 THEN 1 ELSE 0 END) > 0
                THEN CAST(SUM(CASE WHEN l_discount > 0 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
                ELSE NULL END, 0.0) AS DOUBLE) AS discounted_rate
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q06_safe_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe division, both conventions (F8): NULL-on-zero-denominator (gold
    helpers, reference _io_helpers.py:70-91) and 0.0-on-zero (PBP scripts,
    build_pbp_game_team_stats.py:106-109)."""
    from hoops_edge_database_etl_spark.functions.numeric import safe_div

    li = load(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.sum(_dec("l_quantity")).alias("_qty"),
        F.sum(_dec("l_extendedprice")).alias("_price"),
        F.sum(F.when(F.col("l_discount") > 0, 1).otherwise(0)).alias("_ndisc"),
        F.count(F.lit(1)).alias("_n"),
    )
    return agg.select(
        "l_returnflag",
        safe_div(F.col("_price").cast("double"), F.col("_qty").cast("double"))
        .cast("double")
        .alias("price_per_unit"),
        safe_div(
            F.col("_ndisc").cast("double"), F.col("_n").cast("double"), zero_on_null=True
        )
        .cast("double")
        .alias("discounted_rate"),
    )


@query(
    "q07_union_stack",
    oracle="""
    SELECT 'orders' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_keys
    FROM orders
    UNION ALL
    SELECT 'lineitem' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_keys
    FROM lineitem
    UNION ALL
    SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_keys
    FROM customer
    """,
)
def q07_union_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL row-count matrix (D6/A14: the reference's validation-SQL
    row-count stacks, scripts/sql/bronze_silver_validation_queries.sql:44-61)."""

    def counted(name: str, key: str) -> DataFrame:
        return (
            load(spark, sf_dir, name)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.count_distinct(F.col(key)).cast("bigint").alias("n_keys"),
            )
            .select(F.lit(name).alias("table_name"), "n_rows", "n_keys")
        )

    return (
        counted("orders", "o_custkey")
        .unionByName(counted("lineitem", "l_orderkey"))
        .unionByName(counted("customer", "c_custkey"))
    )


@query(
    "q08_percent_ratio",
    oracle="""
    SELECT
      n.n_name,
      CAST(COUNT(c.c_custkey) AS BIGINT) AS n_customers,
      ROUND(100.0 * COUNT(c.c_custkey) / NULLIF((SELECT COUNT(*) FROM customer), 0), 1) AS pct_of_customers
    FROM nation n
    LEFT JOIN customer c ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q08_percent_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent/ratio formatting with NULLIF guard (F13: reference
    bronze_silver_validation_queries.sql:165). The customer side is
    size-gated, NOT hinted (r12 broadcast-growth audit: customers grow
    with the corpus — 150→1500 at 10× data — so a forced broadcast is a
    100 TB OOM; unhinted, AQE broadcasts while it fits and demotes to a
    shuffle join when it doesn't)."""
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    total = c.count()  # scalar subquery equivalent; tiny driver-side value
    joined = n.join(
        c.select("c_custkey", "c_nationkey"),
        n.n_nationkey == c.c_nationkey,
        "left",
    )
    return joined.groupBy("n_name").agg(
        F.count("c_custkey").cast("bigint").alias("n_customers"),
        F.when(
            F.lit(total) != 0,
            F.round(100.0 * F.count("c_custkey") / F.lit(total), 1),
        ).alias("pct_of_customers"),
    )


@query(
    "q09_date_arithmetic",
    oracle="""
    SELECT
      CAST(o_orderkey AS BIGINT) AS o_orderkey,
      strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
      CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch_start,
      CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '2001-01-01'
    """,
)
def q09_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date truncation/arithmetic family (F3/F5: the reference's str(v)[:10]
    idiom and timedelta windows, orchestrate.py:716, 1303-1318) done with
    native date functions so it stays in codegen."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2001-01-01")
    return o.select(
        F.col("o_orderkey").cast("bigint"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        F.date_format(F.date_add(F.to_date("o_orderdate"), 30), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
        F.year("o_orderdate").cast("bigint").alias("order_year"),
    )


@query(
    "q10_lenient_cast",
    oracle="""
    SELECT
      event_type,
      CAST(SUM(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
               THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) ELSE 0 END) AS BIGINT) AS k_total,
      CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def q10_lenient_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction + lenient (null-on-failure) cast (F6/F7: the
    reference's _cast_value / _normalize_jsonish, normalize.py:816-840,
    orchestrate.py:1188-1227) via get_json_object + try_cast — no UDF."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    return e.groupBy("event_type").agg(
        F.sum(F.coalesce(k, F.lit(0))).cast("bigint").alias("k_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )


@query(
    "q75_json_extraction",
    oracle="""
    SELECT event_type,
           CAST(COUNT(json_extract_string(props, '$.k')) AS BIGINT) AS n_with_k,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(MAX(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q75_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column processing: the events table's ``props``
    JSON string is parsed in-plan (``get_json_object`` — JVM-side, no
    UDF) and aggregated. At 100 TB the right move is parse-once-persist
    (from_json with an explicit schema into a struct column at the silver
    layer); per-query path extraction here demonstrates the hot-path
    form. Null-safe: COUNT/SUM/MAX ignore rows whose props lack the key."""
    ev = load(spark, sf_dir, "events")
    raw = F.get_json_object("props", "$.k")
    # lenient numeric handling, consistent with q10's contract for this
    # column: presence counted PRE-cast, non-numeric values null out of
    # the aggregates (try_cast) instead of erroring under ANSI mode
    k = raw.try_cast("long")
    return ev.groupBy("event_type").agg(
        F.count(raw).cast("bigint").alias("n_with_k"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.max(k).cast("bigint").alias("max_k"),
    )


@query(
    "q76_pivot",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup
    FROM events
    GROUP BY user_id
    """,
)
def q76_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long → wide): per-user event counts, one column per event
    type. The pivot VALUES are declared explicitly — with them, Spark
    plans a single hash aggregate (no extra values-discovery job and no
    surprise column sets when new types appear); the oracle is the
    dialect-neutral CASE-WHEN formulation of the same contingency table."""
    ev = load(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "error", "signup"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
          for c in ("click", "view", "purchase", "error", "signup")],
    )


@query(
    "q169_unpivot_long",
    oracle="""
    WITH w AS (
      SELECT n.n_name,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents,
             CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_custs
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name
    )
    SELECT n_name, 'n_orders' AS metric, n_orders AS value FROM w
    UNION ALL
    SELECT n_name, 'total_cents', total_cents FROM w
    UNION ALL
    SELECT n_name, 'n_custs', n_custs FROM w
    """,
)
def q169_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long), q76's inverse: the per-nation metric matrix
    melts into (nation, metric, value) rows via ``stack`` — one generator
    expression, no union re-scan (the oracle's UNION ALL form re-reads the
    CTE; Spark's stack emits all arms in a single projection pass, the
    shape that matters when the wide table is itself expensive). The
    tall form is what metric stores and plotting layers ingest.

    The wide aggregate underneath is one star join — nation broadcast
    by hint (25 fixed rows), customer size-gated with no hint (r12
    broadcast-growth audit: customers scale with the corpus) — plus
    one map-side-combining shuffle; stack adds zero exchanges."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    w = (
        o.join(c.select("c_custkey", "c_nationkey"),
               o.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .cast("bigint").alias("total_cents"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_custs"),
        )
    )
    return w.select(
        "n_name",
        F.expr(
            "stack(3, 'n_orders', n_orders, 'total_cents', total_cents,"
            " 'n_custs', n_custs) AS (metric, value)"
        ),
    )


@query(
    "q186_pseudonymize",
    oracle="""
    WITH ct AS (
      SELECT substr(md5('pepper:' || CAST(c_custkey AS VARCHAR)), 1, 16) AS token,
             c_mktsegment
      FROM customer
    ),
    ot AS (
      SELECT substr(md5('pepper:' || CAST(o_custkey AS VARCHAR)), 1, 16) AS token,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    SELECT ct.c_mktsegment AS segment,
           CAST(COUNT(DISTINCT ct.token) AS BIGINT) AS n_tokens,
           CAST(COUNT(ot.token) AS BIGINT) AS n_orders,
           CAST(SUM(COALESCE(ot.cents, 0)) AS BIGINT) AS total_cents
    FROM ct LEFT JOIN ot ON ot.token = ct.token
    GROUP BY ct.c_mktsegment
    """,
)
def q186_pseudonymize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent key pseudonymization: every natural key is replaced by
    a peppered-hash token (md5('pepper:' || key), 16 hex chars) BEFORE
    any downstream processing — and because the same key always maps to
    the same token, referential integrity survives: the customer↔orders
    join runs ON THE TOKENS and reproduces exactly the per-segment order
    counts and revenue the raw keys would give. That join-preserving
    property is the entire point of tokenization over redaction (q98
    destroys the value; this relinks it), and the hash check proves it
    end-to-end.

    At scale: tokenization is a pure map (no shuffle); the pepper is a
    deploy-time secret making dictionary inversion infeasible; 64-bit
    token space needs the birthday check at ~10⁹ keys (n_tokens =
    #distinct keys in-result is that audit)."""
    tok = lambda c: F.substring(  # noqa: E731
        F.md5(F.concat(F.lit("pepper:"), F.col(c).cast("string"))), 1, 16
    )
    c = load(spark, sf_dir, "customer").select(
        tok("c_custkey").alias("token"), "c_mktsegment"
    )
    o = load(spark, sf_dir, "orders").select(
        tok("o_custkey").alias("o_token"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    return (
        c.join(o, c.token == o.o_token, "left")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.countDistinct("token").cast("bigint").alias("n_tokens"),
            F.count("o_token").cast("bigint").alias("n_orders"),
            F.sum(F.coalesce("cents", F.lit(0))).cast("bigint").alias("total_cents"),
        )
    )


@query(
    "q207_map_column_ops",
    oracle="""
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
             AS clicks,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT)
             AS views,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_keys
    FROM events GROUP BY user_id
    """,
)
def q207_map_column_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-typed column round trip: per user, counts aggregate into a
    genuine ``map<string,bigint>`` (``map_from_entries`` over collected
    (type, count) structs), and the report reads through MAP operators —
    ``element_at`` lookups (NULL-safe for absent keys → coalesce 0) and
    ``map_keys`` cardinality. The oracle states the same numbers
    relationally, so the hash check certifies the map construction,
    lookup, and key-set semantics — the column type every
    feature-store/profile table uses for sparse per-entity attributes.

    The map stays JVM-side throughout (no UDF); at scale the per-user
    map is bounded by |event_types|, and building it AFTER the count
    reduction keeps the collect_list on k rows per user, never raw
    events."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    mapped = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "c")))
        ).alias("m")
    )
    return mapped.select(
        "user_id",
        F.coalesce(F.element_at("m", F.lit("click")), F.lit(0))
        .cast("bigint")
        .alias("clicks"),
        F.coalesce(F.element_at("m", F.lit("view")), F.lit(0))
        .cast("bigint")
        .alias("views"),
        F.size(F.map_keys("m")).cast("bigint").alias("n_keys"),
    )


@query(
    "q208_value_percentiles",
    oracle="""
    WITH probes AS (
      SELECT CAST(p AS DOUBLE) AS probe
      FROM (VALUES (50000.0), (100000.0), (200000.0), (400000.0)) AS t(p)
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM orders)
    SELECT probe,
           CAST(SUM(CASE WHEN o.o_totalprice <= p.probe THEN 1 ELSE 0 END)
                AS BIGINT) AS n_below,
           n.total AS n_total,
           CAST(SUM(CASE WHEN o.o_totalprice <= p.probe THEN 1 ELSE 0 END)
                AS DOUBLE) / n.total AS pct_below
    FROM probes p CROSS JOIN orders o CROSS JOIN n
    GROUP BY probe, n.total
    """,
)
def q208_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INVERSE percentile lookup — "where does $X sit in the
    distribution?" — the empirical CDF evaluated at a fixed probe list:
    one scan with |probes| conditional counters (each probe is a CASE
    arm, the q143/q193 one-pass rule — never |probes| scans and never a
    sort), exact integer counts, one division per probe. The forward
    problem ("what value is p50?") is q93/q107's histogram-select; this
    is its adjoint, and the pair brackets everything a percentile API
    serves.

    The tiny probe table broadcasts; at 100 TB the cost is exactly one
    corpus scan regardless of probe count."""
    o = load(spark, sf_dir, "orders")
    probes = spark.createDataFrame(
        [(50000.0,), (100000.0,), (200000.0,), (400000.0,)], "probe double"
    )
    hit = F.when(F.col("o_totalprice") <= F.col("probe"), 1).otherwise(0)
    per = (
        o.crossJoin(F.broadcast(probes))
        .groupBy("probe")
        .agg(
            F.sum(hit).cast("bigint").alias("n_below"),
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
        )
    )
    return per.select(
        "probe",
        "n_below",
        "n_total",
        (F.col("n_below").cast("double") / F.col("n_total")).alias("pct_below"),
    )


@query(
    "q216_fiscal_calendar",
    oracle="""
    WITH f AS (
      SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(date_diff('day', DATE '1995-01-02', CAST(o_orderdate AS DATE))
                  AS BIGINT) AS d
      FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-02'
    ),
    w AS (
      SELECT cents, d // 7 AS wk,
             (d // 7) // 52 AS fy,
             (d // 7) % 52 AS wiy
      FROM f
    ),
    p AS (
      SELECT cents, fy,
             (wiy // 13) * 3 + CASE WHEN wiy % 13 < 4 THEN 0
                                    WHEN wiy % 13 < 8 THEN 1 ELSE 2 END + 1
               AS period
      FROM w
    )
    SELECT CAST(1995 + fy AS BIGINT) AS fiscal_year,
           CAST(period AS BIGINT) AS fiscal_period,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents
    FROM p GROUP BY fy, period
    """,
)
def q216_fiscal_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-4-5 fiscal-calendar rollup: dates map to a week-aligned retail
    calendar (52-week fiscal years anchored on Monday 1995-01-02;
    quarters split 4+4+5 weeks — the comparability trick every retailer
    uses so periods contain whole weeks) with PURE integer arithmetic —
    day ordinal // 7 → week, // 52 → fiscal year, the 4-4-5 split as a
    mod-13 CASE. No calendar library, no timezone surface, identical
    digits in both engines, and at scale the mapping is a zero-shuffle
    projection the rollup aggregates over (a broadcast dim table of
    (date → period) rows is the alternative when the rules get
    irregular — 53rd weeks, restated years).

    Gregorian rollups (q09, q26) answer "March"; this answers "P3" —
    and the two never reconcile exactly, which is why the mapping must
    live IN the engine."""
    o = load(spark, sf_dir, "orders")
    f = o.filter(
        F.col("o_orderdate") >= F.lit("1995-01-02").cast("timestamp")
    ).select(
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1995-01-02").cast("date"))
        .cast("long")
        .alias("d"),
    )
    wk = (F.col("d") / 7).cast("long")
    # integer division semantics: d >= 0 by the filter, so floor == trunc
    w = f.select(
        "cents",
        (wk / 52).cast("long").alias("fy"),
        (wk % 52).alias("wiy"),
    )
    period = (
        (F.col("wiy") / 13).cast("long") * 3
        + F.when(F.col("wiy") % 13 < 4, 0).when(F.col("wiy") % 13 < 8, 1).otherwise(2)
        + 1
    )
    return (
        w.select("cents", "fy", period.alias("period"))
        .groupBy(
            (F.lit(1995) + F.col("fy")).cast("bigint").alias("fiscal_year"),
            F.col("period").cast("bigint").alias("fiscal_period"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
    )


# Progressive tier schedule (cents thresholds, ppm rates): the classic
# tax-bracket / volume-discount shape. Literals so both engines fold them.
PRICING_TIERS = [
    (0, 10_000_000, 20_000),        # first $100k of an order: 2% fee
    (10_000_000, 20_000_000, 15_000),  # next $100k: 1.5%
    (20_000_000, None, 10_000),     # everything above $200k: 1%
]


def tier_fee_expr(cents):
    """Progressive-bracket fee in cents x ppm as a pure column expression
    (shared by q298 and its boundary-continuity property test)."""
    fee = F.lit(0)
    for lo, hi, ppm in PRICING_TIERS:
        over = F.greatest(cents - F.lit(lo), F.lit(0))
        span = over if hi is None else F.least(over, F.lit(hi - lo))
        fee = fee + span * F.lit(ppm)
    return fee


def _tier_fee_sql() -> str:
    parts = []
    for lo, hi, ppm in PRICING_TIERS:
        span = (
            f"LEAST(GREATEST(cents - {lo}, 0), {hi - lo})"
            if hi is not None
            else f"GREATEST(cents - {lo}, 0)"
        )
        parts.append(f"{span} * {ppm}")
    return " + ".join(parts)


@query(
    "q298_tiered_pricing",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    fee AS (
      SELECT o_orderkey, o_orderpriority, cents,
             CAST({_tier_fee_sql()} AS BIGINT) AS fee_ppm_cents
      FROM o
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS revenue_cents,
           CAST(SUM(fee_ppm_cents) AS BIGINT) AS fee_ppm_cents,
           CAST(MAX(fee_ppm_cents) AS BIGINT) AS max_order_fee_ppm_cents
    FROM fee GROUP BY o_orderpriority
    """,
)
def q298_tiered_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE TIERED PRICING — the tax-bracket computation every
    billing system ships (volume discounts, cloud egress tiers,
    marketplace take rates): an order's fee is the sum over brackets of
    rate x the slice of its value falling inside that bracket,
    expressed as LEAST/GREATEST clamps over literal thresholds — a
    when-free closed form that stays monotone and continuous in the
    order value (both property-tested, since bracket-boundary
    off-by-ones are THE classic billing bug; q289's proration handles
    the time axis, this handles the value axis). Fees carry as
    cents x ppm integers — exact, no rounding until the edge.
    Plan: the fee is a zero-shuffle scan projection (Catalyst folds the
    literal brackets into one codegen stage); the only exchange is the
    final 5-group rollup. A 100 TB billing run is therefore
    scan-bound — the right answer for an embarrassingly parallel
    per-row computation."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    return (
        o.withColumn("fee_ppm_cents", tier_fee_expr(F.col("cents")).cast("bigint"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
            F.sum("fee_ppm_cents").cast("bigint").alias("fee_ppm_cents"),
            F.max("fee_ppm_cents").cast("bigint").alias("max_order_fee_ppm_cents"),
        )
    )


@query(
    "q436_variant_json",
    oracle="""
    WITH parsed AS (
      SELECT event_type,
             TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(k) AS BIGINT) AS n_with_k,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(SUM(CASE WHEN k >= 50 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_high
    FROM parsed GROUP BY event_type
    """,
)
def q436_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT semi-structured extraction — Spark 4's columnar JSON
    path (§2.6's get_json_object, q75, upgraded): `try_parse_json`
    parses each props payload ONCE into the binary VARIANT encoding
    and `try_variant_get` extracts the typed field — at 100 TB the
    difference is material because VARIANT decodes lazily per path
    access (and shreds into columns under Parquet variant shredding)
    where repeated get_json_object calls re-parse the string per
    expression. The try_ variants make malformed payloads NULL
    instead of failing the job (the q10 lenient-cast posture;
    count(k) vs count(*) surfaces the miss rate). The oracle runs
    DuckDB's native JSON path extraction — two engines, two JSON
    machineries, one hash. Grouped rollup is a plain map-side
    combinable aggregate over the extracted BIGINT."""
    ev = load(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.expr(
            "try_variant_get(try_parse_json(props), '$.k', 'bigint')"
        ).alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.count("k").cast("long").alias("n_with_k"),
        F.min("k").cast("long").alias("min_k"),
        F.max("k").cast("long").alias("max_k"),
        F.sum("k").cast("long").alias("sum_k"),
        F.sum(F.when(F.col("k") >= 50, 1).otherwise(0)).cast("long").alias("n_high"),
    )


@query(
    "q447_quota_topk",
    oracle="""
    WITH ranked AS (
      SELECT o_orderkey, o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY floor(o_totalprice * 100 + 0.5) DESC,
                                         o_orderkey) AS class_rank
      FROM orders
    ),
    pool AS (SELECT * FROM ranked WHERE class_rank <= 5),
    final AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY cents DESC, o_orderkey)
               AS global_rank
      FROM pool
    )
    SELECT CAST(global_rank AS BIGINT) AS global_rank,
           o_orderkey, o_orderpriority, cents,
           CAST(class_rank AS BIGINT) AS class_rank
    FROM final WHERE global_rank <= 20
    """,
)
def q447_quota_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUOTA-CONSTRAINED LEADERBOARD — global top-20 orders by value
    subject to a fairness cap of 5 per priority class: the exposure-
    constrained ranking every marketplace / feed / search page applies
    so one dominant class cannot monopolize the board. Two-phase and
    fully declarative: a per-class window keeps each class's top 5
    (the quota pool — associative, the q85 top-k-per-group shape),
    then one global rank over the ≤ 25 pool rows takes 20. The
    correctness subtlety the property test pins: this two-phase plan
    is EXACT for the constrained problem — any order outside its
    class's top 5 can never appear in a feasible optimal board
    (exchange argument), so pruning to the pool loses nothing — the
    same argument that makes q119's distributed skyline and q85's
    two-phase top-k safe. Exact cents; both ranks carry orderkey
    tiebreaks. At 100 TB phase 1 is the only full-data pass and
    combines map-side."""
    o = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    wc = Window.partitionBy("o_orderpriority").orderBy(
        cents.desc(), F.col("o_orderkey")
    )
    pool = (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            cents.alias("cents"),
            F.row_number().over(wc).alias("class_rank"),
        )
        .filter(F.col("class_rank") <= 5)
    )
    wg = Window.orderBy(F.col("cents").desc(), F.col("o_orderkey"))
    return (
        pool.withColumn("global_rank", F.row_number().over(wg))
        .filter(F.col("global_rank") <= 20)
        .select(
            F.col("global_rank").cast("long").alias("global_rank"),
            "o_orderkey",
            "o_orderpriority",
            "cents",
            F.col("class_rank").cast("long").alias("class_rank"),
        )
    )
