"""Scale smoke: push ~10M synthetic ticks through the core operators.

Catches memory cliffs / quadratic blowups that sf0.1 (60k rows) can't.
Gated behind SPARK_GRAFT_SCALE_SMOKE=1 so the normal suite stays fast —
run manually or from a perf CI lane:

    SPARK_GRAFT_SCALE_SMOKE=1 python -m pytest tests/test_scale_smoke.py -q
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SCALE_SMOKE") != "1",
    reason="scale smoke only runs with SPARK_GRAFT_SCALE_SMOKE=1",
)

N = 10_000_000
SYMBOLS = 8


@pytest.fixture(scope="module")
def big_ticks(spark):
    """~10M ticks across 8 symbols, ~1 tick/second per symbol, generated
    distributively (spark.range — no driver materialization)."""
    return (
        spark.range(N)
        .select(
            F.concat(F.lit("SYM"), (F.col("id") % SYMBOLS).cast("string")).alias(
                "symbol"
            ),
            F.timestamp_millis(
                F.lit(1767225600000) + (F.col("id") / SYMBOLS).cast("long") * 1000
                + F.col("id") % 997  # sub-second jitter
            ).alias("ts"),
            (
                100.0
                + F.sin(F.col("id") / 10000.0) * 5.0
                + (F.xxhash64("id") % 100) / 1000.0
            ).alias("bid"),
            F.col("id").alias("tid"),
        )
    )


def test_downsample_10m(spark, big_ticks):
    from big_data_project_jan_2026_tick_data__spark.operators.ticks import (
        downsample_interval,
    )

    out = downsample_interval(
        big_ticks,
        ts_col="ts",
        interval="1 minute",
        partition_cols=("symbol",),
        tiebreak_cols=("tid",),
    )
    n = out.count()
    # ~1 row per (symbol, minute): N/8 seconds of data -> N/480 minutes
    assert 0 < n <= SYMBOLS * (N // SYMBOLS // 60 + 2)


def test_ohlc_10m(spark, big_ticks):
    from big_data_project_jan_2026_tick_data__spark.operators.ticks import ohlc_bars

    out = ohlc_bars(
        big_ticks,
        ts_col="ts",
        value_col="bid",
        interval="5 minutes",
        partition_cols=("symbol",),
        tiebreak_cols=("tid",),
    )
    row = out.agg(
        F.count(F.lit(1)).alias("bars"), F.sum("n_ticks").alias("ticks")
    ).collect()[0]
    assert row.ticks == N
    assert row.bars > 0


def test_asof_10m_vs_100k(spark, big_ticks):
    from big_data_project_jan_2026_tick_data__spark.operators.joins import asof_join

    left = big_ticks.filter(F.col("tid") % 100 == 0).select(
        "symbol", "ts", "tid"
    )  # 100k probes
    right = big_ticks.select("symbol", "ts", F.col("bid").alias("quote"))
    out = asof_join(left, right, on="ts", by=("symbol",), right_cols=("quote",))
    assert out.count() == left.count()
