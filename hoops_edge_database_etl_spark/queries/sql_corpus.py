"""SQL-surface queries (SURVEY.md §3.3, §2.4 A14, §2.3 J11): the
reference's Athena/Presto validation corpus re-expressed as dialect-neutral
ANSI SQL that runs VERBATIM on both Spark (``spark.sql`` over registered
views) and DuckDB (the oracle) — one string, two engines, hash-equal
results. This is the strongest form of the correctness gate: there is no
translation layer to hide a semantic difference in.

Dialect-neutrality rules used here: explicit CAST everywhere mixed types
appear (Spark parses `100.0` as DECIMAL, DuckDB follows suit, but division
scale rules differ — route through DOUBLE), no date formatting functions
(CAST(date AS VARCHAR) is ISO in both), deterministic ORDER BY tiebreaks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hoops_edge_database_etl_spark.queries import query
from hoops_edge_database_etl_spark.tables import load, register_views


def _sql_query(name: str, sql: str, doc: str) -> None:
    """Register a shared-text SQL query: Spark runs it over temp views, the
    oracle IS the same string."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    fn.__name__ = name
    fn.__doc__ = doc
    query(name, oracle=sql)(fn)


_sql_query(
    "q55_sql_rowcount_matrix",
    """
    SELECT 'orders' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders
    UNION ALL
    SELECT 'lineitem' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem
    UNION ALL
    SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows FROM customer
    UNION ALL
    SELECT 'events' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows FROM events
    """,
    "UNION ALL row-count matrix (bronze_silver_validation_queries.sql:44-61).",
)

_sql_query(
    "q56_sql_join_coverage",
    """
    SELECT
      CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS customers_with_orders,
      CAST((SELECT COUNT(*) FROM customer) AS BIGINT) AS total_customers,
      CAST(ROUND(
        100.0 * CAST(COUNT(DISTINCT o.o_custkey) AS DOUBLE)
              / CAST((SELECT COUNT(*) FROM customer) AS DOUBLE), 1
      ) AS DOUBLE) AS coverage_pct
    FROM orders o
    """,
    "COUNT DISTINCT coverage percentage (data_completeness_audit.sql:27-49).",
)

_sql_query(
    "q57_sql_case_rates",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_discounted,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(NULLIF(COUNT(*), 0) AS DOUBLE) AS discount_rate
    FROM lineitem
    GROUP BY l_returnflag
    HAVING COUNT(*) > 0
    """,
    "CASE-WHEN rate with NULLIF guard (gold_validation_queries.sql:94-117).",
)

_sql_query(
    "q58_sql_top_n",
    """
    SELECT c.c_name, CAST(c.c_custkey AS BIGINT) AS c_custkey,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_name, c.c_custkey
    ORDER BY total_spend DESC, c_custkey ASC
    LIMIT 25
    """,
    "Top-N with deterministic tiebreak (gold_validation_queries.sql:18-22, O2).",
)

_sql_query(
    "q59_sql_referential_gaps",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orphan_orders
    FROM orders o
    LEFT JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE c.c_custkey IS NULL
    """,
    "Referential-integrity anti-join audit (bronze_silver_validation_queries.sql:206-224).",
)

_sql_query(
    "q67_sql_window_suite",
    """
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           CAST(o_custkey AS BIGINT) AS o_custkey,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(LAG(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS prev_price,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend,
           CAST(FIRST_VALUE(o_orderkey) OVER w AS BIGINT) AS first_order
    FROM orders
    WHERE o_custkey % 50 = 0
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    "Shared-text window-function suite: ROW_NUMBER / LAG / running SUM / "
    "FIRST_VALUE with total-order tiebreaks; running sums in DECIMAL so "
    "cross-engine accumulation is exact (W-family on the SQL surface).",
)

_sql_query(
    "q77_sql_cube",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "CUBE grouping (all 2^2 aggregation levels in one pass — the OLAP "
    "companion to q26's ROLLUP), shared text on both engines; NULL "
    "subtotal markers hash-compare directly.",
)

_sql_query(
    "q78_sql_exists",
    """
    SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, c.c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND CAST(o.o_totalprice AS DECIMAL(18,2)) > CAST(200000.0 AS DECIMAL(18,2))
    )
    AND NOT EXISTS (
      SELECT 1 FROM orders o2
      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
    )
    """,
    "Correlated EXISTS / NOT EXISTS (decorrelated by both planners into "
    "semi/anti joins — the SQL surface of q14/q15).",
)


_sql_query(
    "q83_sql_grouping_sets",
    """
    SELECT
      COALESCE(o_orderstatus, 'ALL') AS status,
      COALESCE(o_orderpriority, 'ALL') AS priority,
      CAST(COUNT(*) AS BIGINT) AS n_orders,
      CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR(64)) AS DOUBLE)
        AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                            (o_orderstatus, o_orderpriority))
    ORDER BY status, priority
    """,
    "Explicit GROUPING SETS (beyond q26 ROLLUP / q77 CUBE): the three "
    "named aggregation levels in one pass — Catalyst's Expand, one "
    "shuffle. COALESCE labels the grand-total slots identically in both "
    "engines; decimal totals bridge to double via string (q23 rule).",
)


_sql_query(
    "q96_sql_rank_suite",
    """
    SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           o_orderpriority,
           CAST(RANK() OVER w AS BIGINT) AS price_rank,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS price_dense_rank,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
           CAST(PERCENT_RANK() OVER w AS DOUBLE) AS price_pct_rank
    FROM orders
    WHERE o_custkey % 100 = 0
    WINDOW w AS (
      PARTITION BY o_orderpriority
      ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC, o_orderkey
    )
    """,
    "Shared-text ranking suite: RANK / DENSE_RANK / NTILE / PERCENT_RANK "
    "under a total-order tiebreak (price in DECIMAL so the sort key is "
    "cross-engine exact; PERCENT_RANK's (rank-1)/(n-1) is one identical "
    "IEEE division in both engines). Completes the window-function "
    "surface beyond q67's ROW_NUMBER/LAG/SUM/FIRST_VALUE.",
)

_sql_query(
    "q97_sql_set_ops",
    """
    SELECT 'intersect' AS op, CAST(k AS BIGINT) AS custkey
    FROM (
      SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey FROM orders
    ) a
    UNION ALL
    SELECT 'except', CAST(k AS BIGINT)
    FROM (
      SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT
      SELECT o_custkey FROM orders
    ) b
    """,
    "Shared-text INTERSECT / EXCEPT (distinct set semantics in both "
    "engines — Spark plans left-semi/anti over distinct, the declarative "
    "form of the reference's Python set differences, gap_fill.py:79-171).",
)


_sql_query(
    "q136_sql_correlated_scalar",
    """
    WITH c AS (
      SELECT o_orderkey, o_custkey,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN cents * (SELECT COUNT(*) FROM c i
                                       WHERE i.o_custkey = o.o_custkey)
                           > (SELECT SUM(cents) FROM c i
                              WHERE i.o_custkey = o.o_custkey)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_above_own_avg
    FROM c o
    GROUP BY o_custkey
    """,
    """Correlated SCALAR subqueries — each order compared against its own
    customer's average price (stated integer-exactly as cents·n > Σcents,
    so the cross-engine float-average trap never opens). Catalyst
    decorrelates both subqueries into aggregate-then-join plans rather
    than per-row re-execution (RewriteCorrelatedScalarSubquery) — the
    SQL-surface feature the reference's Athena corpus leans on
    (bronze_silver_validation_queries.sql per-entity audits). Completes
    the subquery matrix next to q78's EXISTS/IN forms.""",
)


_sql_query(
    "q183_sql_set_ops_all",
    """
    SELECT 'intersect_all' AS op, CAST(k AS BIGINT) AS priority_ord,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM (
      SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
      INTERSECT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ) a
    GROUP BY k
    UNION ALL
    SELECT 'except_all', CAST(k AS BIGINT), CAST(COUNT(*) AS BIGINT)
    FROM (
      SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
      EXCEPT ALL
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    ) b
    GROUP BY k
    """,
    """INTERSECT ALL / EXCEPT ALL — the BAG-semantics siblings of q97's
    set forms, the difference that matters on tables with legitimate
    duplicates: each key survives min(m, n) times (intersect) or
    max(m − n, 0) times (except). Both engines implement the SQL-standard
    multiset algebra (Spark rewrites to a counted full-outer generate —
    the declarative form of a count-and-replicate); the shared text plus
    a per-key multiplicity rollup hash-checks the surviving COUNTS, the
    strongest observable of bag semantics.""",
)


_sql_query(
    "q191_sql_filtered_aggs",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_finished,
           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS finished_cents,
           CAST(COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'O')
                AS BIGINT) AS open_customers
    FROM orders
    GROUP BY o_orderpriority
    """,
    """SQL:2003 FILTER clause — per-aggregate predicates in ONE grouped
    scan (the standard form of the CASE-WHEN pivot idiom, q76/q189's
    underlying pattern). Both engines parse the identical text and plan
    a single hash aggregate with conditional accumulators — adding a
    filtered metric never adds a scan, the same one-pass rule the q143
    profiler and q168 drift monitor are built on.""",
)


_sql_query(
    "q204_sql_grouping_id",
    """
    SELECT COALESCE(o_orderstatus, '<total>') AS status,
           COALESCE(o_orderpriority, '<total>') AS priority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
    """GROUPING() disambiguation on ROLLUP levels — the only correct way
    to tell a subtotal row's NULL from a genuine NULL data value (the
    COALESCE to '<total>' is safe ONLY because GROUPING() gates which
    rows are aggregates; q26's plain rollup leaves that ambiguity open).
    Shared text: both engines implement the SQL-standard GROUPING()
    bitmap over the identical rollup lattice.""",
)


_sql_query(
    "q230_sql_lateral_topk",
    """
    SELECT n.n_name AS nation_name, t.c_name, t.bal_cents
    FROM nation n,
    LATERAL (
      SELECT c.c_name,
             CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
      FROM customer c
      WHERE c.c_nationkey = n.n_nationkey
      ORDER BY c.c_acctbal DESC, c.c_name
      LIMIT 3
    ) t
    """,
    """Correlated LATERAL subquery with ORDER BY ... LIMIT — the SQL-
    standard per-row top-k shape. Spark's DecorrelateInnerQuery rewrites
    the correlated limit into the same rank-filter plan q85's explicit
    window builds (one shuffle on the correlation key, per-key top-3
    heaps — never a per-nation re-scan); DuckDB executes the lateral
    natively. Identical text, identical deterministic tiebreak
    (acctbal DESC, name), hash-equal output — proof the registry's
    window-based top-k operators and the SQL surface agree.""",
)


@query(
    "q376_null_semantics",
    oracle="""
    WITH holy AS (
      -- seeded NULLs: clerk-era orders lose their custkey 1 time in 11
      SELECT o_orderkey,
             CASE WHEN CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                       || ':null'), 1, 8) AS BIGINT) % 11 = 0
                  THEN NULL ELSE o_custkey END AS custkey
      FROM orders
    ),
    probe AS (SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0)
    SELECT 'not_in' AS method,
           CAST((SELECT COUNT(*) FROM holy
                 WHERE custkey NOT IN (SELECT c_custkey FROM probe))
             AS BIGINT) AS n_rows
    UNION ALL
    SELECT 'not_exists',
           CAST((SELECT COUNT(*) FROM holy h
                 WHERE NOT EXISTS (SELECT 1 FROM probe p
                                   WHERE p.c_custkey = h.custkey))
             AS BIGINT)
    UNION ALL
    SELECT 'null_rows',
           CAST((SELECT COUNT(*) FROM holy WHERE custkey IS NULL) AS BIGINT)
    UNION ALL
    SELECT 'not_in_null_safe',
           CAST((SELECT COUNT(*) FROM holy
                 WHERE custkey IS NOT NULL
                   AND custkey NOT IN (SELECT c_custkey FROM probe))
             AS BIGINT)
    """,
)
def q376_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE-VALUED-LOGIC AUDIT — the NOT IN trap, measured instead of
    footnoted: against a probe list, `NOT IN` over a NULL-bearing
    column returns rows where the predicate is TRUE — and x NOT IN
    (...) is UNKNOWN for NULL x, so every NULL row silently vanishes
    (and if the LIST held a NULL, the count would collapse to zero);
    `NOT EXISTS` keeps them, because the correlated equality simply
    never matches. This query emits all four counts — the two
    semantics, the NULL population, and the guarded NOT IN — so the
    invariant not_exists = not_in + null_rows (and not_in =
    not_in_null_safe) is hash-checked across BOTH engines: the
    strongest proof the repo's own anti-joins (q14, q291 — always
    LEFT ANTI, never NOT IN) are built on the right rule. Seeded
    NULLs use the house punch-out; at scale every branch is an
    anti-join or a conditional count — this is a semantics fixture,
    not a new plan shape."""
    o = load(spark, sf_dir, "orders")
    punched = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(":null"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 11
        == 0
    )
    holy = o.select(
        F.when(punched, F.lit(None)).otherwise(F.col("o_custkey")).alias("custkey")
    )
    probe = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 3 == 0)
        .select("c_custkey")
    )
    holy.createOrReplaceTempView("q376_holy")
    probe.createOrReplaceTempView("q376_probe")
    return spark.sql(
        """
        SELECT 'not_in' AS method,
               CAST((SELECT COUNT(*) FROM q376_holy
                     WHERE custkey NOT IN (SELECT c_custkey FROM q376_probe))
                 AS BIGINT) AS n_rows
        UNION ALL
        SELECT 'not_exists',
               CAST((SELECT COUNT(*) FROM q376_holy h
                     WHERE NOT EXISTS (SELECT 1 FROM q376_probe p
                                       WHERE p.c_custkey = h.custkey))
                 AS BIGINT)
        UNION ALL
        SELECT 'null_rows',
               CAST((SELECT COUNT(*) FROM q376_holy WHERE custkey IS NULL)
                 AS BIGINT)
        UNION ALL
        SELECT 'not_in_null_safe',
               CAST((SELECT COUNT(*) FROM q376_holy
                     WHERE custkey IS NOT NULL
                       AND custkey NOT IN (SELECT c_custkey FROM q376_probe))
                 AS BIGINT)
        """
    )


_sql_query(
    "q420_sql_range_frames",
    """
    WITH b AS (
      SELECT o_orderpriority AS prio,
             CAST(FLOOR(o_totalprice / 5000) AS BIGINT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders
      WHERE o_orderkey % 61 = 0
      GROUP BY o_orderpriority, CAST(FLOOR(o_totalprice / 5000) AS BIGINT)
    )
    SELECT prio, bucket, n,
           CAST(SUM(n) OVER (PARTITION BY prio ORDER BY bucket
                RANGE BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_trail3,
           CAST(SUM(n) OVER (PARTITION BY prio ORDER BY bucket
                RANGE BETWEEN CURRENT ROW AND 3 FOLLOWING) AS BIGINT)
             AS n_lead3,
           CAST(SUM(n) OVER (PARTITION BY prio ORDER BY bucket
                RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT)
             AS n_band2,
           CAST(SUM(n) OVER (PARTITION BY prio ORDER BY bucket
                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_rows3
    FROM b
    """,
    """RANGE-frame window suite — the VALUE-distance frames (§2.5) the
    ROWS-frame queries (q39, q67) do not cover: per priority class, the
    order count within a trailing / leading / centered band of $5000
    price buckets. RANGE frames aggregate over the ORDER-KEY DISTANCE,
    not row offsets, so at the sparse tail of the price distribution
    (buckets with gaps) n_trail3 and n_rows3 genuinely diverge — the
    property test asserts they differ somewhere AND that a dict-based
    Python recompute of every band matches exactly. Dialect notes: the
    frame bound syntax is identical ANSI in both engines over a BIGINT
    key; FLOOR before CAST (DuckDB CAST rounds, Spark truncates — the
    q340 rule); the full GROUP BY expression is repeated because Spark
    resolves output aliases in GROUP BY but DuckDB positional rules
    differ across versions.""",
)


_sql_query(
    "q430_sql_recursive_cte",
    """
    WITH RECURSIVE edges AS (
      SELECT DISTINCT CAST(c_custkey % 127 AS BIGINT) AS child,
             CAST(FLOOR((c_custkey % 127) / 2.0) AS BIGINT) AS parent
      FROM customer WHERE c_custkey % 127 > 0
    ),
    chain (node, depth, root_path_len) AS (
      SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(1 AS BIGINT)
      UNION ALL
      SELECT e.child, c.depth + 1, c.root_path_len + e.child
      FROM chain c JOIN edges e ON e.parent = c.node
    )
    SELECT depth,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(node) AS BIGINT) AS min_node,
           CAST(MAX(node) AS BIGINT) AS max_node,
           CAST(SUM(root_path_len) AS BIGINT) AS sum_path_weights
    FROM chain GROUP BY depth
    """,
    """RECURSIVE CTE — the SQL-surface capability Spark gained in 4.x
    (dialect-neutral ANSI `WITH RECURSIVE`), exercised as SHARED TEXT:
    the identical string elaborates a 127-node binary management
    hierarchy (node i reports to ⌊i/2⌋, derived from customer keys)
    level-by-level on BOTH engines — per-depth node counts and
    accumulated root-path weights. This is the one §3.3 surface the
    corpus could not cover before (q94/q135/q410's iterative graph
    queries run their recursions as DuckDB-side oracles with Spark
    driver loops; HERE the recursion itself is a single declarative
    query Catalyst plans as a loop of UnionExec steps). The hierarchy
    is a tree, so UNION ALL terminates without cycle detection; depth
    is bounded at ⌈log₂ 127⌉ = 7 levels; FLOOR-before-CAST sidesteps
    the DuckDB-rounds/Spark-truncates CAST divergence (q340). The
    pytest property checks the complete-binary-tree shape: level k
    holds 2^k nodes (truncated at 127) and every node's depth is
    ⌊log₂ node⌋.""",
)


def _selinger_sql() -> str:
    """Generate the shared-text Selinger DP: textbook independence-model
    size estimates (Π sizes × Π 1/max(ndv) for every predicate whose
    sides are both present) for every prefix of every left-deep order
    of {customer, orders, lineitem, supplier}."""
    from itertools import permutations

    sizes = {"C": "n_c", "O": "n_o", "L": "n_l", "S": "n_s"}
    preds = {
        frozenset("OC"): "GREATEST(d_c, d_oc)",
        frozenset("LO"): "GREATEST(d_oo, d_lo)",
        frozenset("LS"): "GREATEST(d_ls, d_s)",
    }

    def est(subset: str) -> str:
        num = " * ".join(f"CAST({sizes[t]} AS DOUBLE)" for t in sorted(subset))
        dens = [
            expr
            for pair, expr in sorted(preds.items(), key=lambda kv: sorted(kv[0]))
            if pair <= frozenset(subset)
        ]
        if not dens:
            return f"({num})"
        return f"(({num}) / ({' * '.join(dens)}))"

    rows = []
    for perm in permutations("COLS"):
        order = ",".join(perm)
        p2, p3 = "".join(perm[:2]), "".join(perm[:3])
        cost = f"{est(p2)} + {est(p3)}"
        rows.append(
            f"SELECT '{order}' AS join_order, CAST({cost} AS DOUBLE)"
            " AS est_cost FROM stats"
        )
    unions = "\n      UNION ALL\n      ".join(rows)
    return f"""
    WITH stats AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_c,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_o,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_l,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM supplier) AS n_s,
             (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT)
              FROM customer) AS d_c,
             (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
              FROM orders) AS d_oc,
             (SELECT CAST(COUNT(DISTINCT o_orderkey) AS BIGINT)
              FROM orders) AS d_oo,
             (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)
              FROM lineitem) AS d_lo,
             (SELECT CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)
              FROM lineitem) AS d_ls,
             (SELECT CAST(COUNT(DISTINCT s_suppkey) AS BIGINT)
              FROM supplier) AS d_s
    ),
    plans AS (
      {unions}
    )
    SELECT join_order, est_cost,
           est_cost = MIN(est_cost) OVER () AS is_best,
           CAST(ROW_NUMBER() OVER (ORDER BY est_cost, join_order) AS BIGINT)
             AS cost_rank
    FROM plans
    """


_sql_query(
    "q438_selinger_join_order",
    _selinger_sql(),
    """SELINGER JOIN-ORDER SEARCH, declaratively — what a cost-based
    optimizer does before any of these queries run, surfaced AS a
    query: enumerate all 24 left-deep orders of the 4-table star
    (customer, orders, lineitem, supplier), estimate every prefix's
    cardinality with the textbook independence model (Π base sizes ×
    Π 1/max(ndv) for each equi-join predicate contained in the
    prefix; a prefix with no connecting predicate keeps the raw
    product — the cross-join penalty that the search exists to
    avoid), and rank plans by the sum of intermediate sizes. The
    statistics are LIVE (one COUNT/NDV scan per base table — exactly
    the stats ANALYZE collects); the lattice is generated literally
    (q313's subset-lattice precedent), so the whole search is one
    shared-text SQL string both engines execute identically. The
    pytest property checks the invariants a real planner relies on:
    FK-chain orders (L before its parents, no cross products) beat
    every cross-product plan, and the best plan's cost matches a
    python replay of the same estimator.""",
)


_sql_query(
    "q439_large_volume_customers",
    """
    WITH big AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(CAST(FLOOR(l_quantity) AS BIGINT)) > 150
    )
    SELECT c.c_name, CAST(c.c_custkey AS BIGINT) AS c_custkey,
           CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
           CAST(CAST(o.o_orderdate AS DATE) AS STRING) AS o_orderdate,
           b.sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY b.sum_qty DESC, o.o_orderkey ASC
    LIMIT 20
    """,
    """TPC-H Q18 SHAPE — large-volume customers: orders whose total
    lineitem quantity exceeds 150, enriched through the
    orders→customer chain, top-20 by volume with a deterministic
    orderkey tiebreak. The classic point of Q18 is WHERE the HAVING
    runs: the quantity rollup reduces lineitem BEFORE any join (a
    join-then-aggregate formulation would shuffle the full lineitem
    against orders first), and the surviving handful of hot orders
    make both subsequent joins effectively broadcast-sized — the
    aggregate-pushdown pattern q196 (Q17) applies to averages,
    applied here to a HAVING filter. FLOOR-before-CAST on the DOUBLE
    quantity is the q340 rounds-vs-truncates rule; CAST(date AS
    STRING) prints ISO on both engines (the shared-text date rule).
    Shared text, one string, two engines.""",
)


def _mv_selection_sql(
    sizes_body: str | None = None, total_cost_sql: str | None = None
) -> str:
    """Generate the 3-round greedy MV-selection DP over the (priority,
    year, status) rollup lattice: exact lattice sizes (by default seven
    per-subset distinct-count scans — engine-neutral shared text; pass
    ``sizes_body`` to substitute a fused GROUPING-SETS source, q451),
    literal workload frequencies, unrolled greedy rounds.
    ``total_cost_sql`` substitutes st0's base-table-cost scalar
    subquery (q451 points it at a checkpointed 1-row count so the CTE
    re-expansion never re-scans the fact table)."""
    cols = {1: "o_orderpriority", 2: "year(o_orderdate)", 4: "o_orderstatus"}

    def size_sq(mask: int) -> str:
        sel = ", ".join(expr for bit, expr in cols.items() if mask & bit)
        return (
            f"SELECT {mask} AS mv_mask, CAST(COUNT(*) AS BIGINT) AS mv_size"
            f" FROM (SELECT DISTINCT {sel} FROM orders) t{mask}"
        )

    sizes = sizes_body or "\n      UNION ALL\n      ".join(
        size_sq(m) for m in range(1, 8)
    )
    workload = ", ".join(
        f"({m}, {f})" for m, f in [(1, 20), (2, 12), (3, 8), (4, 10), (5, 4), (6, 6), (7, 2)]
    )
    rounds = []
    prev_state, prev_picked = "st0", None
    for r in (1, 2, 3):
        picked_filter = (
            ""
            if prev_picked is None
            else f" WHERE mv.mv_mask NOT IN (SELECT mv_mask FROM picked{r - 1})"
        )
        rounds.append(
            f""",
    g{r} AS (
      SELECT mv.mv_mask, mv.mv_size,
             CAST(COALESCE(SUM(CASE
               WHEN (w.q_mask & mv.mv_mask) = w.q_mask
                 AND s.cost > mv.mv_size
               THEN w.freq * (s.cost - mv.mv_size) ELSE 0 END), 0) AS BIGINT)
               AS gain
      FROM (SELECT mv_mask, mv_size FROM sizes{picked_filter.replace('mv.', '')}) mv
      CROSS JOIN workload w
      JOIN {prev_state} s ON s.q_mask = w.q_mask
      GROUP BY mv.mv_mask, mv.mv_size
    ),
    p{r} AS (
      SELECT mv_mask, mv_size, gain, CAST({r} AS BIGINT) AS round
      FROM g{r} ORDER BY gain DESC, mv_mask ASC LIMIT 1
    ),
    picked{r} AS (
      SELECT mv_mask FROM p{r}
      {"" if prev_picked is None else f"UNION ALL SELECT mv_mask FROM picked{r - 1}"}
    ),
    st{r} AS (
      SELECT s.q_mask,
             CASE WHEN (s.q_mask & p.mv_mask) = s.q_mask
                  THEN LEAST(s.cost, p.mv_size) ELSE s.cost END AS cost
      FROM {prev_state} s CROSS JOIN p{r} p
    )"""
        )
        prev_state, prev_picked = f"st{r}", f"picked{r}"
    picks = "\n      UNION ALL\n      ".join(
        f"SELECT round, mv_mask, mv_size, gain FROM p{r}" for r in (1, 2, 3)
    )
    return f"""
    WITH sizes AS (
      {sizes}
    ),
    workload(q_mask, freq) AS (VALUES {workload}),
    st0 AS (
      SELECT q_mask,
             {total_cost_sql
              or "(SELECT CAST(COUNT(*) AS BIGINT) FROM orders)"} AS cost
      FROM workload
    ){"".join(rounds)}
    SELECT round, mv_mask, mv_size, gain AS marginal_gain,
           CASE mv_mask WHEN 1 THEN 'P' WHEN 2 THEN 'Y' WHEN 3 THEN 'PY'
                WHEN 4 THEN 'S' WHEN 5 THEN 'PS' WHEN 6 THEN 'YS'
                ELSE 'PYS' END AS mv_dims
    FROM ({picks}) all_picks
    """


_sql_query(
    "q441_mv_selection",
    _mv_selection_sql(),
    """GREEDY MATERIALIZED-VIEW SELECTION — the Harinarayan/Rajaraman/
    Ullman data-cube problem as one shared-text query: given the 7
    non-empty rollup views over (priority, year, status), their EXACT
    cardinalities (one distinct-count per lattice node — the stats a
    warehouse's ANALYZE collects; a production pass fuses them into
    one GROUPING SETS scan), and a literal query workload with
    frequencies, pick 3 views greedily maximizing the workload's
    scan-row savings (a query is answerable from a view iff its
    group-by set is a SUBSET — bitmask containment (q & m) = q, both
    engines' integer &). The three greedy rounds are unrolled CTEs,
    each recomputing marginal gain against the current best-cost
    state and excluding prior picks — the same unrolled-sequential-
    choice shape as q433's MMR, here over the view lattice. Greedy is
    the right algorithm, not a shortcut: benefit is submodular, so
    the (1 − 1/e)·OPT bound holds — and the pytest property verifies
    it against a brute force over all C(7,3) = 35 subsets.""",
)


_sql_query(
    "q444_sql_group_by_all",
    """
    SELECT o_orderpriority,
           year(o_orderdate) AS order_year,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_c
    FROM orders
    WHERE o_orderdate >= CAST('1996-01-01' AS DATE)
    GROUP BY ALL
    ORDER BY ALL
    """,
    """GROUP BY ALL / ORDER BY ALL — the modern analyst sugar both
    engines now parse identically (Spark gained it in 3.4, DuckDB
    popularized it): every non-aggregate select item becomes a
    grouping key, and the full select list becomes the sort — so
    adding a dimension to the SELECT automatically extends both,
    killing the classic copy-paste bug where a new column silently
    aggregates under the old keys. Notable in the SHARED corpus
    because inference runs in each engine's OWN analyzer — the hash
    proves both resolve the same key set AND the same sort order
    (which exercises ORDER BY ALL's left-to-right tiebreak
    semantics, including the mixed types: string, int year, string,
    then two counts). Of the adjacent sugar, only this pair made the
    corpus: SELECT * EXCEPT vs EXCLUDE and QUALIFY are syntactically
    disjoint across the two engines (noted the way q432 notes
    IGNORE NULLS).""",
)


from hoops_edge_database_etl_spark.queries import _ORACLES  # noqa: E402


@query("q451_mv_selection_fused", oracle=_ORACLES["q441_mv_selection"])
def q451_mv_selection_fused(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q441's MV selection with the lattice statistics collected the way
    a production pass would: ONE `GROUPING SETS` scan instead of seven
    per-subset distinct-count scans — grouping_id() tags each output
    row with which dimensions were aggregated away (Spark sets a bit
    for every column NOT in the grouping, most-significant-first in
    declaration order, so the subset mask is the bitwise complement
    re-mapped to q441's P=1/Y=2/S=4 convention — worked out explicitly
    in the CASE below because off-by-one bit conventions are exactly
    where grouping_id code goes wrong), and counting rows per tag
    yields every lattice node's cardinality from a single shuffle.
    The greedy rounds then run the IDENTICAL generated SQL with the
    fused statistics swapped in, and the ORACLE IS q441's VERBATIM —
    the hash proves the one-scan plan computes the same lattice, the
    same gains, and the same picks as the textbook seven-scan form
    (the q434/q412 shared-oracle crossover pattern). At 100 TB this
    is the difference between one pass over the fact table and
    seven.

    r11 (fact-rescan audit): "one scan" must hold in the EXECUTED
    plan, not just the SQL text — a plain temp view re-expands per
    CTE reference, and the unrolled greedy rounds referenced the
    GROUPING SETS subtree 18x and st0's base-cost COUNT(*) subquery
    8x (26 fact scans total, audited). Both now materialize once via
    localCheckpoint (the q408 pattern) before the view registration,
    and the generated SQL's base-cost subquery points at the 1-row
    checkpointed count."""
    from hoops_edge_database_etl_spark.tables import register_views

    register_views(spark, sf_dir)
    sizes = spark.sql(
        """
        SELECT CASE gid WHEN 3 THEN 1 WHEN 5 THEN 2 WHEN 6 THEN 4
                        WHEN 1 THEN 3 WHEN 2 THEN 5 WHEN 4 THEN 6
                        ELSE 7 END AS mv_mask,
               CAST(COUNT(*) AS BIGINT) AS mv_size
        FROM (
          SELECT grouping_id() AS gid
          FROM orders
          GROUP BY GROUPING SETS (
            (o_orderpriority), (year(o_orderdate)), (o_orderstatus),
            (o_orderpriority, year(o_orderdate)),
            (o_orderpriority, o_orderstatus),
            (year(o_orderdate), o_orderstatus),
            (o_orderpriority, year(o_orderdate), o_orderstatus))
        ) g
        GROUP BY gid
        """
    ).localCheckpoint(eager=False)
    sizes.createOrReplaceTempView("q451_sizes")
    rowcount = spark.sql(
        "SELECT CAST(COUNT(*) AS BIGINT) AS n FROM orders"
    ).localCheckpoint(eager=False)
    rowcount.createOrReplaceTempView("q451_rowcount")
    return spark.sql(
        _mv_selection_sql(
            "SELECT mv_mask, mv_size FROM q451_sizes",
            "(SELECT n FROM q451_rowcount)",
        )
    )
