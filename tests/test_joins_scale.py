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


def test_zorder_write_clusters_all_dimensions(spark, tmp_path, sf_dir):
    """Z-order layout: with files covering compact Morton ranges, the
    per-file min/max span of EVERY z-order column is a fraction of the
    global span (a single-column sort leaves the other column's span at
    ~100% per file) — the property that makes multi-dimension range
    predicates prune files."""
    import glob

    import pyarrow.parquet as pq

    from big_data_project_jan_2026_tick_data__spark.sources.io import write_zordered

    ev = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("user_id"), F.col("o_totalprice").alias("value")
    )
    out = str(tmp_path / "z")
    write_zordered(ev, out, zorder_by=("user_id", "value"), num_files=16)

    glo = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    gspan_u = glo[1] - glo[0]
    gspan_v = glo[3] - glo[2]
    spans_u, spans_v = [], []
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.read_metadata(f)
        lo_u = min(md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups))
        hi_u = max(md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups))
        lo_v = min(md.row_group(i).column(1).statistics.min for i in range(md.num_row_groups))
        hi_v = max(md.row_group(i).column(1).statistics.max for i in range(md.num_row_groups))
        spans_u.append((hi_u - lo_u) / gspan_u)
        spans_v.append((hi_v - lo_v) / gspan_v)
    assert len(spans_u) >= 8
    # both dimensions clustered at once — the z-order property
    assert sum(spans_u) / len(spans_u) < 0.6, spans_u
    assert sum(spans_v) / len(spans_v) < 0.6, spans_v
    # and the data round-trips
    assert spark.read.parquet(out).count() == ev.count()


def test_asof_tolerance_matches_pandas(spark):
    """asof_join(tolerance_ms=...) nulls matches staler than the bound —
    parity with pandas merge_asof(tolerance=...)."""
    import pandas as pd

    from big_data_project_jan_2026_tick_data__spark.operators.joins import asof_join

    base = pd.Timestamp(2026, 1, 5, 8, 0, 0)
    left = pd.DataFrame(
        {
            "symbol": ["A"] * 4,
            "ts": [base + pd.Timedelta(seconds=s) for s in (0, 10, 60, 300)],
            "px": [1.0, 2.0, 3.0, 4.0],
        }
    )
    right = pd.DataFrame(
        {
            "symbol": ["A"] * 2,
            "ts": [base - pd.Timedelta(seconds=5), base + pd.Timedelta(seconds=55)],
            "quote": [100.0, 200.0],
        }
    )
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on="ts", by=("symbol",), tolerance_ms=30_000,
        )
        .orderBy("ts")
        .collect()
    )
    exp = pd.merge_asof(
        left.sort_values("ts"), right.sort_values("ts"),
        on="ts", by="symbol", tolerance=pd.Timedelta(seconds=30),
    )
    for g, (_, e) in zip(got, exp.iterrows()):
        ge = None if g.quote is None else g.quote
        ee = None if pd.isna(e.quote) else e.quote
        assert ge == ee, (g.ts, ge, ee)


def test_fuzzy_string_link_recovers_typos(spark):
    from big_data_project_jan_2026_tick_data__spark.operators import joins

    clean = spark.createDataFrame(
        [(1, "alpha widget"), (2, "beta gadget"), (3, "gamma sprocket")],
        "rid long, name string",
    )
    dirty = spark.createDataFrame(
        [(10, "alpha wdget"), (20, "beta gadgt"), (30, "gamm sprocket"),
         (40, "zzzzqqqq")],
        "lid long, dname string",
    )
    out = {
        r["lid"]: r["rid"]
        for r in joins.fuzzy_string_link(
            dirty, clean, left_id="lid", left_str="dname",
            right_id="rid", right_str="name", threshold=0.4,
        ).collect()
    }
    assert out == {10: 1, 20: 2, 30: 3}  # typos recovered, junk unmatched


def test_fuzzy_link_ignores_empty_keys(spark):
    from big_data_project_jan_2026_tick_data__spark.operators import joins

    clean = spark.createDataFrame(
        [(1, "alpha widget"), (2, "")], "rid long, name string"
    )
    dirty = spark.createDataFrame(
        [(10, ""), (20, "alpha wdget")], "lid long, dname string"
    )
    out = {
        r["lid"]: r["rid"]
        for r in joins.fuzzy_string_link(
            dirty, clean, left_id="lid", left_str="dname",
            right_id="rid", right_str="name", threshold=0.4,
        ).collect()
    }
    # empty dirty key links to nothing; the typo still resolves
    assert out == {20: 1}


def test_interval_overlap_join_exactly_once_and_half_open(spark):
    """Brute-force parity for interval_overlap_join: every overlapping
    pair appears EXACTLY once regardless of how many buckets the two
    intervals span (positional dedup, no DISTINCT), touching (s, e]
    intervals that merely share an endpoint do NOT match, and a tiny
    bucket width (forcing heavy bucket replication) changes nothing."""
    from itertools import product

    from big_data_project_jan_2026_tick_data__spark.operators.joins import (
        interval_overlap_join,
    )

    # axis in "micros" with intervals spanning 1..40 buckets at width 10
    left_rows = [(i, s, e) for i, (s, e) in enumerate(
        [(0, 5), (5, 100), (100, 101), (90, 400), (395, 405)]
    )]
    right_rows = [(j, s, e) for j, (s, e) in enumerate(
        [(3, 5), (5, 90), (99, 100), (100, 390), (404, 500)]
    )]
    left = spark.createDataFrame(left_rows, "lid long, ls long, le long")
    right = spark.createDataFrame(right_rows, "rid long, rs long, re long")

    expect = sorted(
        (li, rj)
        for (li, ls, le), (rj, rs, re) in product(left_rows, right_rows)
        if ls < re and rs < le
    )
    for width in (10, 1000):
        got = interval_overlap_join(
            left, right, "ls", "le", "rs", "re", bucket_width=width
        ).select("lid", "rid").collect()
        assert sorted((r.lid, r.rid) for r in got) == expect, width
    # half-open: (0,5] vs (5,90] share only the endpoint 5 -> no match
    assert (0, 1) not in expect
