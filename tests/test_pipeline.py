"""End-to-end batch ETL chain on a reference-shaped CSV tree: one folder
per symbol, out-of-order files, duplicate seconds, nulls, unparseable
timestamps (SURVEY §3.1)."""

from __future__ import annotations

import csv

import pytest
from pyspark.sql import functions as F

from big_data_project_jan_2026_tick_data__spark.pipeline import run_pipeline


@pytest.fixture(scope="module")
def csv_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("csv_root")
    # two symbols; file 2 written first (out of time order, exercises the
    # global-sort replacement of the reference's file chaining)
    data = {
        "US30": {
            "b.csv": [  # later ticks
                ("20260106 07:50:00.100", 38010.0, 38011.0, 1.0),
                ("20260106 07:50:00.300", 38010.5, 38011.5, 1.0),  # dup second
                ("20260106 13:55:00.000", 38020.0, 38021.0, 1.0),
            ],
            "a.csv": [  # earlier ticks
                ("20260105 07:51:00.000", 38000.0, 38001.0, 1.0),
                ("20260105 09:30:00.000", 38005.0, 38006.0, 1.0),  # out of window
                ("bad-timestamp", 1.0, 2.0, 1.0),
                ("20260105 13:52:00.000", None, 38003.0, 1.0),  # null bid
            ],
        },
        "BTCUSD": {
            "x.csv": [
                ("20260105 07:55:30.500", 42000.0, 42001.0, 2.0),
                ("20260105 07:55:30.900", 42000.5, 42001.5, 2.0),  # dup second
            ]
        },
    }
    for sym, files in data.items():
        d = root / sym
        d.mkdir()
        for fname, rows in files.items():
            with open(d / fname, "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(["DateTime", "Bid", "Ask", "Volume"])
                for r in rows:
                    w.writerow(["" if v is None else v for v in r])
    return str(root)


def test_pipeline_end_to_end(spark, csv_tree, tmp_path):
    out = run_pipeline(spark, csv_tree, str(tmp_path / "work"))

    # bronze: Volume dropped, symbol derived from folder, all rows kept
    assert set(out["bronze"].columns) == {"DateTime", "Bid", "Ask", "symbol"}
    assert out["bronze"].count() == 9

    # quality: per-(bronze-)file audit, one row per written file, null counts
    q = out["quality"].agg(
        F.sum("total_rows").alias("n"), F.sum("null_Bid").alias("nb")
    ).collect()[0]
    assert q["n"] == 9
    assert q["nb"] == 1

    # gold: unparseable dropped, out-of-window dropped, 1-per-second dedup,
    # deterministic first-in-second kept
    gold = out["gold"]
    assert gold.count() == 5  # 9 - 1 bad-ts - 1 out-of-window - 2 dup-second
    us30_0750 = gold.filter(
        (F.col("symbol") == "US30") & (F.to_date("ts") == "2026-01-06")
        & (F.hour("ts") == 7)
    ).collect()
    assert len(us30_0750) == 1
    assert us30_0750[0]["bid"] == 38010.0  # first tick of the second
    # partitioned layout: (symbol, year) directories exist
    assert (tmp_path / "work" / "gold" / "symbol=US30" / "year=2026").exists()

    # stats: daily per-window counts with empty windows as 0
    rows = {
        (r["symbol"], str(r["date"])): (r["ticks_window1"], r["ticks_window2"])
        for r in out["stats"].collect()
    }
    assert rows[("US30", "2026-01-05")] == (1, 1)
    assert rows[("US30", "2026-01-06")] == (1, 1)
    assert rows[("BTCUSD", "2026-01-05")] == (1, 0)


def test_write_clustered_prunes_and_roundtrips(spark, tmp_path, sf_dir):
    """Clustered write: partition dirs appear, data round-trips, and
    row-group time ranges are tight (sorted within files)."""
    import os

    import pyarrow.parquet as pq

    from big_data_project_jan_2026_tick_data__spark.sources.io import write_clustered

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    out = str(tmp_path / "clustered")
    write_clustered(
        orders,
        out,
        partition_by=("o_orderpriority",),
        cluster_by=("o_orderdate", "o_orderkey"),
    )
    dirs = [d for d in os.listdir(out) if d.startswith("o_orderpriority=")]
    assert len(dirs) == 5
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    # within every file the cluster column is sorted -> tight row groups
    for root, _, files in os.walk(out):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            tbl = pq.read_table(os.path.join(root, f), columns=["o_orderdate"])
            vals = tbl["o_orderdate"].to_pylist()
            assert vals == sorted(vals)


def test_daily_stats_report_artifacts(spark, tmp_path, sf_dir):
    """Reference-parity report artifacts (symbol_statistics_generate.py:
    90-104): one <symbol>_daily_window_counts.csv per symbol; plots only
    when matplotlib is importable (absent here -> skipped, not failed)."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    from big_data_project_jan_2026_tick_data__spark.operators import stats
    from big_data_project_jan_2026_tick_data__spark.reports import (
        write_daily_stats_report,
    )

    from big_data_project_jan_2026_tick_data__spark.sources.io import read_events

    ev = read_events(spark, f"{sf_dir}/events.parquet").withColumn(
        "symbol", F.concat(F.lit("SYM"), F.col("user_id") % 2)
    )
    daily = stats.daily_window_counts(
        ev, ts_col="ts", partition_cols=("symbol",),
        windows=((7, 0, 12, 0), (13, 0, 18, 0)),
    )
    out = write_daily_stats_report(daily, str(tmp_path / "report"))
    assert sorted(os.path.basename(p) for p in out["csv"]) == [
        "SYM0_daily_window_counts.csv",
        "SYM1_daily_window_counts.csv",
    ]
    back = pd.read_csv(out["csv"][0])
    assert list(back.columns) == ["date", "ticks_window1", "ticks_window2"]
    assert len(back) > 0 and (back["ticks_window1"] >= 0).all()
    try:
        import matplotlib  # noqa: F401
        assert len(out["plots"]) == 2
    except ImportError:
        assert out["plots"] == []


def test_k_anonymity_report_hand_computed(spark):
    """3-row class is risky at k=5 but safe at k=3; suppressing the
    risky class makes the slice k-anonymous."""
    from big_data_project_jan_2026_tick_data__spark.plans.expectations import (
        k_anonymity_report,
    )
    from pyspark.sql import functions as F

    rows = (
        [("a", 1, "d1")] * 6      # class of 6: safe
        + [("a", 2, "d1")] * 3    # class of 3: risky at k=5
        + [("b", 1, "d1")] * 5    # exactly k: safe
    )
    df = spark.createDataFrame(rows, "grp string, qa int, qb string")
    rep = {
        r.grp: r
        for r in k_anonymity_report(
            df, quasi_cols=("qa", "qb"), k=5, by=("grp",)
        ).collect()
    }
    a, b = rep["a"], rep["b"]
    assert (a.n_rows, a.n_classes, a.n_risky_classes, a.n_risky_rows) == (
        9, 2, 1, 3,
    )
    assert a.risky_row_frac_q6 == 0.333333 and not a.k_anonymous
    assert b.k_anonymous and b.n_risky_rows == 0
    # k=3: the 3-row class is no longer risky
    rep3 = {
        r.grp: r
        for r in k_anonymity_report(
            df, quasi_cols=("qa", "qb"), k=3, by=("grp",)
        ).collect()
    }
    assert rep3["a"].k_anonymous


def test_l_diversity_report_hand_computed(spark):
    """A 6-row class with ONE sensitive value is l-risky even though it
    is k-safe; a 2-value class passes at l=2 and fails at l=3."""
    from big_data_project_jan_2026_tick_data__spark.plans.expectations import (
        l_diversity_report,
    )

    rows = (
        [(1, "d1", "s1")] * 6                      # homogeneous: risky
        + [(2, "d1", "s1"), (2, "d1", "s2")] * 3   # 2 values: ok at l=2
    )
    df = spark.createDataFrame(rows, "qa int, qb string, sens string")
    r = l_diversity_report(
        df, quasi_cols=("qa", "qb"), sensitive_col="sens", l=2
    ).collect()[0]
    assert (r.n_rows, r.n_classes, r.n_risky_classes, r.n_risky_rows) == (
        12, 2, 1, 6,
    )
    assert r.risky_row_frac_q6 == 0.5 and not r.l_diverse
    r3 = l_diversity_report(
        df, quasi_cols=("qa", "qb"), sensitive_col="sens", l=3
    ).collect()[0]
    assert r3.n_risky_classes == 2 and not r3.l_diverse


def test_t_closeness_report_hand_computed(spark):
    """Two classes skewed 3:1 in opposite directions around a uniform
    global distribution: TVD = 0.25 each — t=0.3 passes, t=0.2 flags
    both; a missing value contributes its full global mass."""
    from big_data_project_jan_2026_tick_data__spark.plans.expectations import (
        t_closeness_report,
    )

    rows = (
        [(1, "x")] * 3 + [(1, "y")] * 1   # class 1: p = (.75, .25)
        + [(2, "x")] * 1 + [(2, "y")] * 3  # class 2: p = (.25, .75)
    )
    df = spark.createDataFrame(rows, "qa int, s string")
    rep = t_closeness_report(df, quasi_cols=("qa",), sensitive_col="s", t=0.3)
    r = rep.first()
    # global p = (.5, .5); TVD = 0.5*(|.75-.5| + |.25-.5|) = 0.25
    assert (r.n_rows, r.n_classes, r.max_tvd_q6) == (8, 2, 0.25)
    assert r.t_close and r.n_risky_classes == 0
    r2 = t_closeness_report(
        df, quasi_cols=("qa",), sensitive_col="s", t=0.2
    ).first()
    assert not r2.t_close
    assert (r2.n_risky_classes, r2.n_risky_rows, r2.risky_row_frac_q6) == (
        2, 8, 1.0,
    )
    # a class missing a value entirely: TVD counts the absent mass
    rows3 = [(1, "x")] * 4 + [(2, "x")] * 2 + [(2, "y")] * 2
    df3 = spark.createDataFrame(rows3, "qa int, s string")
    r3 = t_closeness_report(
        df3, quasi_cols=("qa",), sensitive_col="s", t=0.5
    ).first()
    # global p = (.75, .25); class 1 = (1, 0) -> TVD .25; class 2 =
    # (.5, .5) -> TVD .25
    assert r3.max_tvd_q6 == 0.25 and r3.t_close
