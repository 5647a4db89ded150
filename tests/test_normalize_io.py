"""Normalize layer + storage layer unit tests (SURVEY.md §7 steps 2-3)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from hoops_edge_database_etl_spark.normalize import (
    TableSpec,
    conform,
    dedupe_first,
    lenient_cast,
    normalize_records,
    parse_stat_dict,
    permissive_union,
    resolve_aliases,
)

SPEC = TableSpec(
    name="t_games",
    primary_keys=("game_id",),
    schema=StructType(
        [
            StructField("game_id", LongType()),
            StructField("home_points", DoubleType()),
            StructField("is_final", BooleanType()),
            StructField("venue", StringType()),
        ]
    ),
    aliases={"game_id": ("gameId", "id"), "home_points": ("homePoints", "homeScore")},
)


def test_lenient_casts(spark):
    df = spark.createDataFrame(
        [("12.0", "yes", "1.5"), ("x", "0", "nope"), ("7", "true", "2")],
        "i string, b string, d string",
    )
    out = df.select(
        lenient_cast(F.col("i"), LongType()).alias("i"),
        lenient_cast(F.col("b"), BooleanType()).alias("b"),
        lenient_cast(F.col("d"), DoubleType()).alias("d"),
    ).collect()
    assert [(r["i"], r["b"], r["d"]) for r in out] == [
        (12, True, 1.5),
        (None, False, None),
        (7, True, 2.0),
    ]


def test_bool_never_casts_to_int(spark):
    df = spark.createDataFrame([(True,), (False,)], "v boolean")
    out = [r["v"] for r in df.select(lenient_cast(F.col("v"), LongType()).alias("v")).collect()]
    assert out == [None, None]


def test_alias_resolution_first_present_wins(spark):
    df = spark.createDataFrame(
        [(None, 5, 101.0, None)], "gameId long, id long, homePoints double, homeScore double"
    )
    out = resolve_aliases(df, SPEC).collect()[0]
    assert out["game_id"] == 5  # gameId null → falls through to id
    assert out["home_points"] == 101.0


def test_conform_fills_missing_and_casts(spark):
    df = spark.createDataFrame([("3", "99.5")], "gameId string, homePoints string")
    out = conform(df, SPEC).collect()[0]
    assert out["game_id"] == 3
    assert out["home_points"] == 99.5
    assert out["is_final"] is None and out["venue"] is None


def test_dedupe_first_is_deterministic_and_null_pk_passes(spark):
    df = spark.createDataFrame(
        [(1, "first", 10), (1, "second", 20), (None, "nullkey", 5), (2, "only", 1)],
        "k int, v string, ord int",
    )
    out = {r["v"] for r in dedupe_first(df, ["k"], "ord").collect()}
    assert out == {"first", "nullkey", "only"}


def test_normalize_records_end_to_end(spark):
    df = spark.createDataFrame(
        [
            ("7", "100.0", "true", None),
            ("7", "90.0", "false", None),  # dup PK — first wins
            ("8", "bad", "yes", "Arena"),
        ],
        "gameId string, homeScore string, is_final string, venue string",
    )
    rows = {r["game_id"]: r for r in normalize_records(df, SPEC).collect()}
    assert set(rows) == {7, 8}
    assert rows[7]["home_points"] == 100.0 and rows[7]["is_final"] is True
    assert rows[8]["home_points"] is None and rows[8]["venue"] == "Arena"


def test_permissive_union_promotion(spark):
    a = spark.createDataFrame([(1, 1.5)], "k int, v double")
    b = spark.createDataFrame([(2, "x")], "k int, v string")
    c = spark.createDataFrame([(3,)], "k int")
    out = permissive_union([a, b, c])
    assert dict(out.dtypes)["v"] == "string"  # double/string conflict → string
    assert out.count() == 3
    d = spark.createDataFrame([(4,)], "v bigint")
    out2 = permissive_union([a.select("v"), d])
    assert dict(out2.dtypes)["v"] == "double"  # numeric conflict → double


def test_parse_stat_dict_pyrepr_and_json(spark):
    df = spark.createDataFrame(
        [("{'made': 3, 'attempted': 7}",), ('{"made": 1, "attempted": 2}',), ("junk",)],
        "s string",
    )
    out = df.select(
        parse_stat_dict(F.col("s"), "made int, attempted int").alias("st")
    ).collect()
    assert (out[0]["st"]["made"], out[0]["st"]["attempted"]) == (3, 7)
    assert (out[1]["st"]["made"], out[1]["st"]["attempted"]) == (1, 2)
    assert out[2]["st"] is None


def test_write_partitioned_dynamic_overwrite(spark, tmp_path):
    from hoops_edge_database_etl_spark.sources.io import read_table, write_partitioned

    path = str(tmp_path / "t")
    df1 = spark.createDataFrame(
        [(1, "2024", 10.0), (2, "2025", 20.0)], "id int, season string, v double"
    )
    write_partitioned(df1, path, ["season"])
    # overwrite ONLY season=2025; season=2024 must survive
    df2 = spark.createDataFrame([(3, "2025", 30.0)], "id int, season string, v double")
    write_partitioned(df2, path, ["season"])
    # partition values read back type-inferred (int here)
    out = {(r["id"], str(r["season"])) for r in read_table(spark, path).collect()}
    assert out == {(1, "2024"), (3, "2025")}


def test_latest_asof_scan(spark):
    from hoops_edge_database_etl_spark.sources.io import latest_asof

    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-02-01"), (3, "2024-02-01")], "id int, asof string"
    )
    out = {r["id"] for r in latest_asof(df).collect()}
    assert out == {2, 3}


def test_checkpoint_store_roundtrip(spark, tmp_path):
    from hoops_edge_database_etl_spark.sources.io import CheckpointStore

    cp = CheckpointStore(spark, str(tmp_path / "cp"))
    assert cp.get("games", "h1") is None
    cp.put("games", "h1", "2024-01-31")
    cp.put("lines", "h2", "2024-02-15")
    cp.put("games", "h1", "2024-02-28")  # upsert
    assert cp.get("games", "h1") == "2024-02-28"
    assert cp.get("lines", "h2") == "2024-02-15"


def test_register_table_and_sql(spark, tmp_path):
    from hoops_edge_database_etl_spark.sources.io import register_table, write_partitioned

    path = str(tmp_path / "cat")
    df = spark.createDataFrame(
        [(1, "2024"), (2, "2025")], "id int, season string"
    )
    write_partitioned(df, path, ["season"])
    register_table(spark, "t_cat", path, ["season"])
    try:
        n = spark.sql("SELECT COUNT(*) AS n FROM t_cat WHERE season = '2025'").collect()[0]["n"]
        assert n == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS t_cat")


def test_lenient_cast_preserves_int64_precision(spark):
    """ADVICE r1: ints above 2^53 must not round through the double path."""
    big = 9007199254740993  # 2^53 + 1 — unrepresentable as a double
    df = spark.createDataFrame([(str(big),), ("12.0",), ("x",)], "v string")
    out = [r["v"] for r in df.select(lenient_cast(F.col("v"), LongType()).alias("v")).collect()]
    assert out == [big, 12, None]


def test_atomic_overwrite_never_leaves_dest_missing(spark, tmp_path):
    """overwrite_parquet_atomic swaps via rename-aside (ADVICE r2): after
    a successful overwrite the destination exists with the new data and
    no .__old_swap residue; recover_swap restores a crash survivor."""
    from hoops_edge_database_etl_spark.sources.io import (
        overwrite_parquet_atomic,
        recover_swap,
    )

    dest = str(tmp_path / "t.parquet")
    spark.createDataFrame([(1,)], "a long").write.parquet(dest)
    overwrite_parquet_atomic(spark.createDataFrame([(2,)], "a long"), dest)
    assert [r["a"] for r in spark.read.parquet(dest).collect()] == [2]
    assert not (tmp_path / "t.parquet.__old_swap").exists()
    assert not (tmp_path / "t.parquet.__tmp_swap").exists()

    # simulate a crash between the two renames: dest gone, __old_swap left
    import shutil

    shutil.move(dest, dest + ".__old_swap")
    recover_swap(spark, dest)
    assert [r["a"] for r in spark.read.parquet(dest).collect()] == [2]


def test_load_restores_nanos_conf(spark):
    """tables.load must not leak nanosAsLong into the caller's session
    (ADVICE r2): whatever the conf was before the call survives it."""
    from hoops_edge_database_etl_spark.tables import load
    from tests.conftest import SF_DIR

    key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(key)
    df = load(spark, SF_DIR, "events")
    assert spark.conf.get(key) == before
    assert df.count() > 0  # analysis-scoped conf is enough for execution
