"""Query registry: every implemented operator exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus (where SQL-expressible) a
DuckDB oracle SQL string over the same parquet tables.

This is the engine's correctness contract (driver contract in
``__spark_entry__.py``): the driver runs both sides at sf=0.01 and
hash-compares values order-insensitively with columns sorted by name —
so every computed column is aliased identically on both sides, floats are
rounded identically, and every row_number has a total order (unique
tiebreaker) so both engines agree exactly.

Operator keys map to SURVEY.md §2 inventory lines (noted per query).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, joins, mlfeat, multimodal, similarity, stats, text, ticks

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}

# Names registered only under an env flag (e.g. the retired
# probe_hugeint_render instrument under SPARK_GRAFT_PROBES=1).  The
# documented registry counts (BASELINE/README/COVERAGE) and the test
# that pins them exclude these, so the counts are invariant to the
# environment the suite happens to run in (advisor r8).
ENV_GATED: set[str] = set()


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        # a silent dict overwrite would leave the earlier query
        # registered-looking but untested (and the later one shadowed) —
        # fail loudly at import instead
        if name in QUERIES:
            raise ValueError(f"duplicate registry query name: {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# Resolved-table cache: spark.read.parquet does a footer/schema
# resolution job on every call (~50-100 ms), and registry queries read
# the same handful of tables over and over. DataFrames are immutable
# plans, so reusing them across queries is free; keyed per session so
# multiple driver sessions stay isolated.
_TD_CACHE: dict = {}


def _pin_session(spark: SparkSession) -> None:
    """Pin the two session confs every registry query depends on.

    TZ: wall-clock extraction (hour/minute) must match the TZ-naive
    DuckDB oracle regardless of the host session's default.  ANSI:
    registry queries must behave identically under any caller session;
    ANSI mode (Spark 4 default) turns intentional wraparound hash math
    into ARITHMETIC_OVERFLOW.  Lives here (not per-query) so table-free
    probes pin through the same code path as ``_td`` (advisor r7)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")


def _td(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    _pin_session(spark)
    key = (spark, sf_dir, table)
    if key in _TD_CACHE:
        return _TD_CACHE[key]
    if table == "events":
        # schema-adaptive: the testdata generator has shipped ts as both
        # int64-nanos and native timestamp[us]; io.read_events branches on
        # the resolved schema instead of pinning one physical type.
        from ..sources.io import read_events

        df = read_events(spark, f"{sf_dir}/{table}.parquet")
    else:
        df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    _TD_CACHE[key] = df
    return df
