"""Spatial operators on a planar integer grid — the join family every
geo-enabled warehouse ships (radius self-join, nearest-facility
assignment), expressed with the same bucketing discipline as the 1-D
range join (queries/joins.py q65) lifted to 2-D.

Coordinates are DERIVED deterministically (md5 of the entity key →
x, y on a 1,000,000² integer grid) because the testdata has no geo
columns; swap in real projected coordinates (integer centimeters in a
local CRS) and nothing changes. Distances are EXACT integer squared
Euclidean — no sqrt needed for comparisons (d² < r² ⟺ d < r), no
haversine (trig is transcendental and can never hash-match; production
projects to a local plane first, which is also what makes distances
cheap — the standard pattern for city/region-scale joins).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hoops_edge_database_etl_spark.queries import query
from hoops_edge_database_etl_spark.tables import load

GRID = 1_000_000          # coordinate domain per axis
RADIUS = 20_000           # q279 radius (2% of the domain)
CELL = RADIUS             # cell size = radius → 3x3 neighborhood suffices

_XY_SQL = """
      SELECT c_custkey AS id,
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':x'), 1, 8)
                  AS BIGINT) % 1000000 AS x,
             CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':y'), 1, 8)
                  AS BIGINT) % 1000000 AS y
      FROM customer
"""


def _cell_probe(pts: DataFrame) -> DataFrame:
    """Each point replicated to its 3×3 neighbor cells — the probe side
    of the grid equi-join (one row per (point, neighbor cell), built
    array-side with zero shuffle)."""
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    return (
        pts.select(
            "id",
            "x",
            "y",
            F.expr(f"x DIV {CELL}").alias("cx"),
            F.expr(f"y DIV {CELL}").alias("cy"),
            F.explode(offsets).alias("o"),
        )
        .select(
            "id",
            "x",
            "y",
            (F.col("cx") + F.col("o.dx")).alias("kx"),
            (F.col("cy") + F.col("o.dy")).alias("ky"),
        )
    )


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")

    def coord(salt):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("c_custkey").cast("string"), F.lit(salt))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % GRID
        )

    return c.select(
        F.col("c_custkey").alias("id"),
        coord(":x").alias("x"),
        coord(":y").alias("y"),
    )


@query(
    "q279_spatial_radius_join",
    oracle=f"""
    WITH pts AS ({_XY_SQL}),
    cells AS (
      SELECT id, x, y, x // {CELL} AS cx, y // {CELL} AS cy FROM pts
    ),
    cand AS (
      SELECT a.id AS id_a, b.id AS id_b,
             (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
      FROM cells a JOIN cells b
        ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
       AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
       AND a.id < b.id
    )
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           CAST(d2 AS BIGINT) AS dist_sq
    FROM cand WHERE d2 < {RADIUS} * {RADIUS}
    """,
)
def q279_spatial_radius_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPATIAL RADIUS SELF-JOIN — all point pairs within distance r,
    the proximity query behind store-cannibalization, contact-tracing,
    and spatial dedup. The plan is the 2-D lift of q65's bin-bucketed
    range join: points hash into r-sized grid cells, candidates come
    from a PURE EQUI-join on the cell key — the probe side replicates
    each point to its 3×3 neighbor cells array-side, the build side
    keeps one row per point, and one hash shuffle meets them (cell
    size = radius guarantees no within-r pair escapes the
    neighborhood); the exact integer d² < r² residual prunes the
    candidates. Never the naive O(n²) cross join: work is per-cell
    quadratic, and cell occupancy is the q104-profiled skew knob
    (dense cities → smaller cells + the salting recipe). i<j dedups
    the unordered pair once, at the join — not with a post-distinct."""
    pts = _points(spark, sf_dir)
    # Probe side: each point visits its 9 neighbor cells (array-side
    # explode); build side: each point sits in its own cell. The join is
    # then a PURE EQUI-join on the cell key — one hash shuffle — where
    # the naive `b.cx BETWEEN a.cx±1` form plans a broadcast
    # nested-loop (O(n²) comparisons; measured 3x slower at sf0.1).
    # Round 9 (live-bug-#9 static sweep): the hash shuffle must be
    # PINNED — both sides are corpus-proportional (points, and points
    # x9 on the probe), but the 9x explode is invisible to the
    # file-bytes size estimate, so Catalyst was BROADCASTING the
    # replicated probe side; the shuffle-hash hint co-partitions both
    # sides on the cell key (~2.7k cells against 32 partitions — wide
    # by construction, density skew is the documented salting knob).
    # Round 10 (ADVICE): the hint sits on the UN-replicated build side —
    # Spark prefers the hinted side as the per-partition hash-map BUILD
    # side, so hinting the 9x probe would build the map over 9x the rows
    # (9x the build memory per partition) while the 1x side streamed.
    probe = _cell_probe(pts)
    build = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.expr(f"x DIV {CELL}").alias("kx"),
        F.expr(f"y DIV {CELL}").alias("ky"),
    )
    d2 = (F.col("x") - F.col("xb")) * (F.col("x") - F.col("xb")) + (
        F.col("y") - F.col("yb")
    ) * (F.col("y") - F.col("yb"))
    return (
        probe.join(build.hint("shuffle_hash"), ["kx", "ky"])
        .filter((F.col("id") < F.col("id_b")) & (d2 < RADIUS * RADIUS))
        .select(
            F.col("id").cast("bigint").alias("id_a"),
            F.col("id_b").cast("bigint").alias("id_b"),
            d2.cast("bigint").alias("dist_sq"),
        )
    )


@query(
    "q280_nearest_facility",
    oracle=f"""
    WITH pts AS ({_XY_SQL}),
    fac AS (
      SELECT s_suppkey AS fid,
             CAST('0x' || substr(md5(CAST(s_suppkey AS VARCHAR) || ':fx'), 1, 8)
                  AS BIGINT) % 1000000 AS fx,
             CAST('0x' || substr(md5(CAST(s_suppkey AS VARCHAR) || ':fy'), 1, 8)
                  AS BIGINT) % 1000000 AS fy
      FROM supplier WHERE s_suppkey <= 10
    ),
    scored AS (
      SELECT p.id, f.fid,
             (p.x - f.fx) * (p.x - f.fx) + (p.y - f.fy) * (p.y - f.fy) AS d2,
             ROW_NUMBER() OVER (
               PARTITION BY p.id
               ORDER BY (p.x - f.fx) * (p.x - f.fx) + (p.y - f.fy) * (p.y - f.fy),
                        f.fid
             ) AS rn
      FROM pts p CROSS JOIN fac f
    )
    SELECT CAST(id AS BIGINT) AS id, CAST(fid AS BIGINT) AS nearest_facility,
           CAST(d2 AS BIGINT) AS dist_sq
    FROM scored WHERE rn = 1
    """,
)
def q280_nearest_facility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-FACILITY ASSIGNMENT — every point to its closest of k
    facilities (service-territory carving, warehouse assignment, the
    geo Voronoi labeling). The facility set is small by definition and
    BROADCASTS; each point scores all k with exact integer d² (ties
    broken by facility id — deterministic territories) and keeps the
    argmin via an associative min-of-struct — NO per-point window and
    no shuffle at all beyond the broadcast: at 100 TB this is a
    map-only job. The k-means assignment step (q164) is this exact
    query with centroids for facilities; when k grows past broadcast
    range, the q279 grid prunes candidates first (facility cells ± the
    current-best radius)."""
    pts = _points(spark, sf_dir)
    s = load(spark, sf_dir, "supplier").filter(F.col("s_suppkey") <= 10)

    def fcoord(salt):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("s_suppkey").cast("string"), F.lit(salt))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % GRID
        )

    fac = s.select(
        F.col("s_suppkey").alias("fid"),
        fcoord(":fx").alias("fx"),
        fcoord(":fy").alias("fy"),
    )
    d2 = (F.col("x") - F.col("fx")) * (F.col("x") - F.col("fx")) + (
        F.col("y") - F.col("fy")
    ) * (F.col("y") - F.col("fy"))
    scored = pts.crossJoin(F.broadcast(fac)).select(
        "id", F.struct(d2.alias("d2"), F.col("fid").alias("fid")).alias("sc")
    )
    best = scored.groupBy("id").agg(F.min("sc").alias("best"))
    return best.select(
        F.col("id").cast("bigint").alias("id"),
        F.col("best.fid").cast("bigint").alias("nearest_facility"),
        F.col("best.d2").cast("bigint").alias("dist_sq"),
    )


@query(
    "q281_spatial_multires_rollup",
    oracle=f"""
    WITH pts AS ({_XY_SQL}),
    levels AS (
      SELECT l.res AS res,
             x // (1000000 // CAST(pow(4, l.res) AS BIGINT)) AS cx,
             y // (1000000 // CAST(pow(4, l.res) AS BIGINT)) AS cy
      FROM pts, unnest([1, 2, 3]) AS l(res)
    )
    SELECT CAST(res AS BIGINT) AS res,
           CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy,
           CAST(COUNT(*) AS BIGINT) AS n_points
    FROM levels GROUP BY res, cx, cy
    """,
)
def q281_spatial_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-RESOLUTION SPATIAL ROLLUP — point density at three nested
    grid levels (4/16/64 cells per axis — the H3/quadkey serving-tile
    pyramid): each point emits its cell id at every level array-side
    (the q239 ancestor-path recipe on a grid — a coarse cell IS the
    prefix of its fine cells, so parents are integer divisions of
    children) and one grouped aggregate builds all levels. A tile
    server reads the level matching the zoom; the nesting invariant
    (every level-k cell's count equals the sum of its level-k+1
    children, test-pinned) is what makes drill-down exact rather than
    re-queried. pow(4, res) is an exact small-integer power in both
    engines (integer-valued double, floor'd by the // — no float
    drift possible below 2^53)."""
    pts = _points(spark, sf_dir)
    levels = pts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(res).cast("bigint").alias("res"),
                        F.expr(f"x DIV {GRID // 4 ** res}").alias("cx"),
                        F.expr(f"y DIV {GRID // 4 ** res}").alias("cy"),
                    )
                    for res in (1, 2, 3)
                ]
            )
        ).alias("c")
    ).select("c.res", "c.cx", "c.cy")
    return levels.groupBy("res", "cx", "cy").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points")
    )


@query(
    "q282_zone_containment_join",
    oracle=f"""
    WITH pts AS ({_XY_SQL}),
    zones AS (
      SELECT s_suppkey AS zid,
             CAST('0x' || substr(md5(CAST(s_suppkey AS VARCHAR) || ':zx'), 1, 8)
                  AS BIGINT) % 800000 AS zx,
             CAST('0x' || substr(md5(CAST(s_suppkey AS VARCHAR) || ':zy'), 1, 8)
                  AS BIGINT) % 800000 AS zy
      FROM supplier WHERE s_suppkey < 20
    )
    SELECT CAST(z.zid AS BIGINT) AS zid,
           CAST(COUNT(p.id) AS BIGINT) AS n_points_inside
    FROM zones z LEFT JOIN pts p
      ON p.x BETWEEN z.zx AND z.zx + 200000
     AND p.y BETWEEN z.zy AND z.zy + 200000
    GROUP BY z.zid
    """,
)
def q282_zone_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-ZONE CONTAINMENT JOIN — count points inside each
    rectangular service zone (the axis-aligned core of point-in-polygon:
    real polygon joins run exactly this bounding-box join first and
    refine survivors with the ray-cast test). Zones are few and
    BROADCAST, so the containment predicate — two BETWEENs — evaluates
    map-side against the streaming point scan: no shuffle, no explosion
    beyond genuine (point, zone) hits, LEFT join so empty zones report
    zero (the q222 zero-bucket rule). When zones number millions, flip
    to the q279 grid: index zone bounding boxes by the cells they
    overlap and equi-join on cell — same answers, bounded fan-out."""
    pts = _points(spark, sf_dir)
    s = load(spark, sf_dir, "supplier").filter(F.col("s_suppkey") < 20)

    def zc(salt):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("s_suppkey").cast("string"), F.lit(salt))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % 800000
        )

    zones = s.select(
        F.col("s_suppkey").alias("zid"), zc(":zx").alias("zx"), zc(":zy").alias("zy")
    )
    joined = F.broadcast(zones).join(
        pts,
        F.col("x").between(F.col("zx"), F.col("zx") + 200000)
        & F.col("y").between(F.col("zy"), F.col("zy") + 200000),
        "left",
    )
    return joined.groupBy(F.col("zid").cast("bigint").alias("zid")).agg(
        F.count("id").cast("bigint").alias("n_points_inside")
    )


@query(
    "q283_dbscan_core_points",
    oracle=f"""
    WITH pts AS ({_XY_SQL}),
    cells AS (
      SELECT id, x, y, x // {CELL} AS cx, y // {CELL} AS cy FROM pts
    ),
    neigh AS (
      SELECT a.id,
             CAST(SUM(CASE WHEN (a.x - b.x) * (a.x - b.x)
                              + (a.y - b.y) * (a.y - b.y) < {RADIUS} * {RADIUS}
                            AND a.id <> b.id
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_neighbors
      FROM cells a JOIN cells b
        ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
       AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
      GROUP BY a.id
    )
    SELECT CAST(id AS BIGINT) AS id, n_neighbors,
           CASE WHEN n_neighbors >= 3 THEN 'core'
                WHEN n_neighbors >= 1 THEN 'border-or-noise'
                ELSE 'noise' END AS label
    FROM neigh
    """,
)
def q283_dbscan_core_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DBSCAN CORE-POINT CLASSIFICATION — the density pass of spatial
    clustering: a point is CORE if ≥ minPts (3) neighbors sit within ε
    (q279's radius), isolated points are NOISE, the rest are border
    candidates. Same grid-cell equi-join as q279 (probe side
    replicated to 9 neighbor cells, one hash shuffle), but
    aggregated per point instead of emitting pairs — the neighbor
    COUNT needs no pair materialization beyond the join itself, and
    every point reports (the self-pair is excluded in the count, not
    the join, so zero-neighbor points survive to be labeled noise).
    Full DBSCAN then unions core points within ε and runs the q62
    connected-components sweep over THAT graph — core classification
    is the one-pass 90% that decides how big the iterative 10% even
    is. Exact integer d² throughout. The grid join carries q279's
    round-9 shuffle-hash pin (the 9x-replicated probe side is
    corpus-proportional and was being broadcast — the live-bug-#9
    estimator blindness) with the round-10 correction: the hint lives
    on the UN-replicated side so the hash map builds over 1x points,
    not the 9x probe."""
    pts = _points(spark, sf_dir)
    probe = _cell_probe(pts)
    build = pts.select(
        F.col("id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.expr(f"x DIV {CELL}").alias("kx"),
        F.expr(f"y DIV {CELL}").alias("ky"),
    )
    d2 = (F.col("x") - F.col("xb")) * (F.col("x") - F.col("xb")) + (
        F.col("y") - F.col("yb")
    ) * (F.col("y") - F.col("yb"))
    neigh = (
        probe.join(build.hint("shuffle_hash"), ["kx", "ky"])
        .groupBy("id")
        .agg(
            F.sum(
                F.when(
                    (d2 < RADIUS * RADIUS) & (F.col("id") != F.col("id_b")), 1
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_neighbors")
        )
    )
    return neigh.select(
        F.col("id").cast("bigint").alias("id"),
        "n_neighbors",
        F.when(F.col("n_neighbors") >= 3, "core")
        .when(F.col("n_neighbors") >= 1, "border-or-noise")
        .otherwise("noise")
        .alias("label"),
    )
