"""Scale-strategy joins: salted skew join correctness, bucketed
co-located join (no shuffle in the plan), as-of forward direction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_project_jan_2026_tick_data__spark.operators import joins
from big_data_project_jan_2026_tick_data__spark.sources.catalog import save_bucketed


def test_salted_join_matches_plain_join(spark):
    # heavily skewed left: 90% of rows share key 1
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, 1).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(200).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    )
    plain = left.join(right, "k").select("k", "lv", "rv")
    salted = joins.salted_join(left, right, on="k", salt_buckets=8).select(
        "k", "lv", "rv"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")
    orders = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("pri")
    )
    items = spark.range(3000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("item")
    )
    save_bucketed(orders, "b_orders", "k", num_buckets=8)
    save_bucketed(items, "b_items", "k", num_buckets=8)
    # disable broadcast so the join would otherwise need an exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(spark.table("b_items"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 3000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")


def test_asof_forward_direction(spark):
    left = spark.createDataFrame(
        [("A", 10), ("A", 25)], "symbol string, ts long"
    )
    right = spark.createDataFrame(
        [("A", 5, 1.0), ("A", 20, 2.0), ("A", 30, 3.0)],
        "symbol string, ts long, v double",
    )
    fwd = joins.asof_join(
        left, right, on="ts", by=("symbol",), right_cols=("v",), direction="forward"
    )
    got = {r["ts"]: r["v"] for r in fwd.collect()}
    assert got == {10: 2.0, 25: 3.0}


def test_asof_tie_is_inclusive(spark):
    left = spark.createDataFrame([("A", 20)], "symbol string, ts long")
    right = spark.createDataFrame(
        [("A", 20, 7.0)], "symbol string, ts long, v double"
    )
    back = joins.asof_join(left, right, on="ts", by=("symbol",), right_cols=("v",))
    assert back.collect()[0]["v"] == 7.0


def test_catalog_external_table_and_symbol_listing(spark, tmp_path, sf_dir):
    """S10 external-table registration over existing parquet + S9
    catalog-driven symbol discovery."""
    from big_data_project_jan_2026_tick_data__spark.sources.catalog import (
        create_external_parquet,
        list_symbols,
    )

    src = spark.read.parquet(f"{sf_dir}/orders.parquet")
    loc = str(tmp_path / "ext_orders")
    src.write.mode("overwrite").parquet(loc)

    create_external_parquet(spark, "ext_orders_t", loc)
    try:
        back = spark.table("ext_orders_t")
        assert back.count() == src.count()
        syms = list_symbols(spark, "ext_orders_t", symbol_col="o_orderpriority")
        assert syms == sorted(syms) and len(syms) == 5
    finally:
        spark.sql("DROP TABLE IF EXISTS ext_orders_t")
