"""Ungated order-independence SENTINEL (judge r11 #8): a plain
`pytest tests/` must exercise at least a slice of the engine's
strongest determinism guarantee — partial-aggregation-order
independence — instead of reporting 115 skips. One representative per
hardening wave runs against its DuckDB oracle at shuffle-partitions=3
using the SHARED session fixture (runtime-mutable conf, zero extra JVM
startups). The full 115-query lane stays in
test_order_independence.py behind SPARK_GRAFT_ORDER_SMOKE=1.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from big_data_project_jan_2026_tick_data__spark.registry import ORACLE, QUERIES
from big_data_project_jan_2026_tick_data__spark.sources.io import TESTDATA_TABLES


def _canon(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    return str(v)


def _multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in idx) for r in rows)


SENTINEL = [
    # one representative per hardening wave, cheapest carriers first
    "tpch_q1",                 # r7: exactagg whole/frac split
    "doc_token_entropy",       # r4 original hash-FAIL class
    "events_moment_stats",     # r4: exact decimal moments
    "ticks_vwap_twap",         # r5: integer cent sums
    "events_histogram_percentiles",  # r5: integer histogram
    "orders_concentration_hhi",      # r6: grid-snap shares
    "ticks_garman_klass",      # r9: exact OHLC grids
    "events_gini_engagement",  # r9: integer rank sums
    "events_runs_test",        # r9: integer runs counts
    "events_mann_whitney",     # r10: global_cumsum CDF sweep
    "orders_theil_index",      # r11: decimal-grid decomposition
    "orders_skyline",          # r11: global_cummax dominance scan
    "events_lorenz_curve",     # r11: chained global_cumsum deciles
    "events_cramers_v",        # r11: full-grid exact contingency
    "doc_conformal_coverage",  # r11: integer order statistics
]


@pytest.fixture(scope="module")
def sentinel_spark3(request):
    """The SHARED session fixture with shuffle partitions flipped to 3
    for the sentinel module, restored afterwards."""
    s = request.getfixturevalue("spark")
    prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "3")
    yield s
    s.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.fixture(scope="module")
def sentinel_sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def sentinel_duck(sentinel_sf_dir):
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sentinel_sf_dir}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", SENTINEL)
def test_order_sentinel_matches_oracle_at_3_partitions(
    sentinel_spark3, sentinel_sf_dir, sentinel_duck, name
):
    __tracebackhide__ = False
    sdf = QUERIES[name](sentinel_spark3, sentinel_sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    res = sentinel_duck.execute(ORACLE[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert _multiset(sdf.columns, srows) == _multiset(ocols, orows), name
