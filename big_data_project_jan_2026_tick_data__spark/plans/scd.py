"""Slowly-changing-dimension (type 2) history: turn a change log into
versioned validity intervals, apply incoming updates to an existing
dimension, and reconstruct the dimension state as of a point in time.

Reference parity: the reference keeps only current-state tables (the
lakehouse bulk loads in ``Apache Iceberg/iceberg_migration.py`` and the
tick snapshots) — history is implicit in its snapshot log. This module
makes attribute history a first-class, queryable table, the standard
warehouse pattern a user of the reference's lakehouse layer would
expect next to MERGE/time-travel (``plans/snapshots.py``).

100 TB design notes:

- ``scd2_history`` is two window passes partitioned by the dimension
  key — per-key history is bounded (orders per customer, not corpus
  size), so no window ever sees unbounded rows, and both passes reuse
  ONE shuffle (identical partitioning + ordering ⇒ Spark plans a
  single Exchange/Sort; pinned in ``tests/test_plans.py``).
- ``scd2_apply`` dedups the update batch map-side, then joins updates
  to ONLY the current rows of the dimension on the key — closed
  history is never rewritten (append-friendly for a snapshot table).
- ``scd2_as_of`` is a partition-prunable filter (``effective_from <=
  ts < effective_to``), no join, no shuffle.

Determinism: interval endpoints come from the change log's own
timestamps ordered by (ts, tiebreak) — rank logic only, no float
accumulation, so results are partition-layout-independent by
construction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EFFECTIVE_FROM = "effective_from"
EFFECTIVE_TO = "effective_to"
IS_CURRENT = "is_current"
VERSION = "version"


def _attrs_changed(attr_cols: Sequence[str]) -> Column:
    """True when any tracked attribute differs from its lag (null-safe:
    NULL -> value and value -> NULL both count as changes)."""
    cond = F.lit(False)
    for a in attr_cols:
        cond = cond | ~F.col(a).eqNullSafe(F.col(f"__prev_{a}"))
    return cond


def scd2_history(
    changes: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Collapse a change log into type-2 validity intervals.

    One output row per (key, run of identical attribute values):
    ``effective_from`` = first observation of the run, ``effective_to``
    = start of the next run (NULL for the open current row),
    ``is_current`` flag, and a 1-based ``version`` per key.

    ``tiebreak_cols`` must make (ts, *tiebreak) a total order per key —
    the same contract every row_number in the registry carries.
    """
    order = [F.col(ts_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    lagged = changes.select(
        *key_cols,
        *attr_cols,
        ts_col,
        *tiebreak_cols,
        *[F.lag(a).over(w).alias(f"__prev_{a}") for a in attr_cols],
        F.row_number().over(w).alias("__rn"),
    )
    # run starts: first row per key, or any tracked attribute changed
    starts = lagged.filter((F.col("__rn") == 1) | _attrs_changed(attr_cols))
    # both windows share partitioning AND ordering with `w`, so the
    # whole operator is one shuffle + one sort end to end
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return starts.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col).alias(EFFECTIVE_FROM),
        F.lead(ts_col).over(w2).alias(EFFECTIVE_TO),
        F.lead(ts_col).over(w2).isNull().alias(IS_CURRENT),
        F.row_number().over(w2).alias(VERSION),
    )


def scd2_as_of(history: DataFrame, ts) -> DataFrame:
    """Dimension state as of ``ts``: the one interval per key covering
    it. Pure filter — prunable, shuffle-free. The literal is cast to
    whatever type the history's interval columns carry (timestamp,
    date, epoch long, ...), matching scd2_history's ts genericity."""
    t = F.lit(ts).cast(history.schema[EFFECTIVE_FROM].dataType)
    return history.filter(
        (F.col(EFFECTIVE_FROM) <= t)
        & (F.col(EFFECTIVE_TO).isNull() | (t < F.col(EFFECTIVE_TO)))
    )


def scd2_apply(
    history: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Apply an update batch to an existing type-2 dimension.

    Semantics (the standard warehouse merge): within the batch keep the
    run structure (a batch may carry several changes per key); close a
    key's current row at the batch's first differing update; version
    numbers continue from the key's existing max. Updates whose
    attributes equal the key's current row are no-ops. Keys new to the
    dimension start at version 1.

    Returns the full new history (closed rows untouched, current rows
    possibly closed, new rows appended) — caller persists it, e.g. as a
    snapshot-table commit. Only the CURRENT slice of the dimension is
    joined against (broadcast-or-shuffle on the key); closed history
    passes through untouched, which is what makes this append-cheap on
    a 100 TB dimension.
    """
    cur = history.filter(F.col(IS_CURRENT))
    closed = history.filter(~F.col(IS_CURRENT))

    # current attribute values seeded as a virtual "version-0 change"
    # so run-collapsing inside the batch sees them as the predecessor
    seed = cur.select(
        *key_cols,
        *attr_cols,
        F.col(EFFECTIVE_FROM).alias(ts_col),
        *[F.lit(None).cast(updates.schema[c].dataType).alias(c) for c in tiebreak_cols],
        F.lit(0).alias("__seed"),
        F.col(VERSION).alias("__base_version"),
    )
    batch = updates.select(
        *key_cols,
        *attr_cols,
        ts_col,
        *tiebreak_cols,
        F.lit(1).alias("__seed"),
        F.lit(None).cast("int").alias("__base_version"),
    )
    merged = seed.unionByName(batch)
    # __seed (0 = seed, 1 = batch) is the FIRST tiebreak: a batch update
    # whose ts equals the seed's effective_from must order AFTER the
    # seed, or the batch value would become the key's first run and
    # corrupt effective_from/version numbering. (A trailing boolean
    # tiebreak had this exactly backwards — False(batch) < True(seed) —
    # whenever a batch violated the "strictly later timestamps"
    # contract; ties now degrade to "same-instant change", not
    # corruption.)
    hist = scd2_history(
        merged, key_cols, attr_cols, ts_col, tiebreak_cols=("__seed", *tiebreak_cols)
    )
    # The seed re-emerges as the key's first run (it carries the
    # ORIGINAL effective_from; batch timestamps are strictly later by
    # contract): still current if no differing update arrived, closed
    # at the first change otherwise — exactly the merge semantics. Only
    # versions need re-anchoring to continue from the key's prior max.
    base = seed.groupBy(*key_cols).agg(F.max("__base_version").alias("__base"))
    fresh = (
        hist.join(base, list(key_cols), "left")
        .withColumn(
            VERSION,
            (F.col(VERSION) + F.coalesce(F.col("__base"), F.lit(1)) - F.lit(1)).cast(
                "int"
            ),
        )
        .drop("__base")
    )
    return closed.unionByName(fresh.select(*closed.columns))
