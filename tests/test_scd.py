"""SCD type-2 history build / incremental apply / as-of reconstruction
(`plans/scd.py`). The registry pair `orders_scd2_priority` /
`orders_scd2_apply` carries the driver-adjudicated oracle parity; these
tests pin the semantics on a hand-built change log where every expected
interval is known, plus the incremental ≡ one-shot invariant under a
per-key-uneven split.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from big_data_project_jan_2026_tick_data__spark.plans.scd import (
    scd2_apply,
    scd2_as_of,
    scd2_history,
)


def _ts(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


@pytest.fixture(scope="module")
def changes(spark):
    # key 1: A,A,B,A  (run-collapse in the middle, reversion counts anew)
    # key 2: X only   (single current row)
    # key 3: NULL,Y   (NULL attr is a real value; NULL->Y is a change)
    rows = [
        (1, "A", _ts(1), 10),
        (1, "A", _ts(2), 11),
        (1, "B", _ts(3), 12),
        (1, "A", _ts(5), 13),
        (2, "X", _ts(2), 20),
        (3, None, _ts(1), 30),
        (3, "Y", _ts(4), 31),
    ]
    return spark.createDataFrame(rows, "k int, attr string, ts timestamp, id int")


def _hist(changes):
    return scd2_history(
        changes, key_cols=("k",), attr_cols=("attr",), ts_col="ts", tiebreak_cols=("id",)
    )


def test_history_intervals(changes):
    got = {
        (r.k, r.version): (r.attr, r.effective_from, r.effective_to, r.is_current)
        for r in _hist(changes).collect()
    }
    assert got == {
        (1, 1): ("A", _ts(1), _ts(3), False),
        (1, 2): ("B", _ts(3), _ts(5), False),
        (1, 3): ("A", _ts(5), None, True),
        (2, 1): ("X", _ts(2), None, True),
        (3, 1): (None, _ts(1), _ts(4), False),
        (3, 2): ("Y", _ts(4), None, True),
    }


def test_as_of_reconstruction(changes):
    state = {
        r.k: r.attr for r in scd2_as_of(_hist(changes), _ts(3)).collect()
    }
    # day 3: key1 just flipped to B, key2 is X, key3 still NULL
    assert state == {1: "B", 2: "X", 3: None}
    # before any change for key 2
    early = {r.k: r.attr for r in scd2_as_of(_hist(changes), _ts(1)).collect()}
    assert early == {1: "A", 3: None}


@pytest.mark.parametrize("cut_day", [2, 3, 4, 6])
def test_apply_equals_one_shot(changes, cut_day):
    """Incremental apply ≡ one-shot rebuild for any time split — the
    same invariant the driver adjudicates via `orders_scd2_apply`,
    here swept over splits that leave some keys batch-only, some
    seed-only, and some with a no-op first update."""
    cut = _ts(cut_day)
    hist0 = _hist(changes.filter(F.col("ts") < cut))
    merged = scd2_apply(
        hist0,
        changes.filter(F.col("ts") >= cut),
        key_cols=("k",),
        attr_cols=("attr",),
        ts_col="ts",
        tiebreak_cols=("id",),
    )
    key = lambda t: tuple(map(repr, t))  # None-safe total order
    want = sorted(map(tuple, _hist(changes).collect()), key=key)
    got = sorted(
        map(tuple, merged.select(*_hist(changes).columns).collect()), key=key
    )
    assert got == want


def test_apply_noop_batch_keeps_current_rows(changes):
    """A batch whose updates all equal the current attributes must leave
    the history unchanged (same rows, same versions, still current)."""
    hist0 = _hist(changes)
    noop = changes.groupBy("k").agg(
        F.max_by("attr", F.struct("ts", "id")).alias("attr"),
        F.max("ts").alias("ts"),
    ).select("k", "attr", (F.col("ts") + F.expr("INTERVAL 10 DAYS")).alias("ts"),
             F.lit(99).alias("id"))
    merged = scd2_apply(
        hist0, noop, key_cols=("k",), attr_cols=("attr",), ts_col="ts",
        tiebreak_cols=("id",),
    )
    key = lambda t: tuple(map(repr, t))
    assert sorted(map(tuple, merged.select(*hist0.columns).collect()), key=key) == (
        sorted(map(tuple, hist0.collect()), key=key)
    )


def test_apply_ts_tie_with_seed_keeps_seed_first(spark):
    """A batch update whose ts EQUALS the seed's effective_from (a
    violation of the 'strictly later' contract) must degrade to a
    same-instant change — the seed stays the key's first run — not
    corrupt effective_from/version numbering by ordering the batch
    value before the seed (the trailing-boolean-tiebreak bug: booleans
    sort False<True, so batch rows ordered BEFORE the seed)."""
    base = spark.createDataFrame(
        [(1, "A", _ts(1), 10)], "k int, attr string, ts timestamp, id int"
    )
    hist0 = _hist(base)
    batch = spark.createDataFrame(
        [(1, "B", _ts(1), 11)], "k int, attr string, ts timestamp, id int"
    )
    merged = scd2_apply(
        hist0, batch, key_cols=("k",), attr_cols=("attr",), ts_col="ts",
        tiebreak_cols=("id",),
    )
    rows = {r["version"]: r for r in merged.collect()}
    assert rows[1]["attr"] == "A" and rows[1]["effective_from"] == _ts(1)
    assert rows[2]["attr"] == "B" and rows[2]["is_current"]
    # same assertion with NO user tiebreaks — the exact advisor case,
    # where __seed was the only (and inverted) tiebreak
    hist0_nt = scd2_history(base, key_cols=("k",), attr_cols=("attr",), ts_col="ts")
    merged_nt = scd2_apply(
        hist0_nt, batch.drop("id"), key_cols=("k",), attr_cols=("attr",), ts_col="ts",
    )
    rows_nt = {r["version"]: r for r in merged_nt.collect()}
    assert rows_nt[1]["attr"] == "A" and rows_nt[2]["attr"] == "B"
