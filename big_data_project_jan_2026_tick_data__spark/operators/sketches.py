"""Mergeable distinct-count sketches (Apache DataSketches HLL via the
Spark 3.5+ ``hll_sketch_agg`` / ``hll_union_agg`` builtins).

The 100 TB pattern this enables: materialize ONE fine-grain rollup
table carrying a binary sketch column (e.g. per event_type × day), then
answer distinct-count questions at ANY coarser grain — weekly, monthly,
per-type, global — by unioning the stored sketches, never rescanning
the raw corpus. ``approx_count_distinct`` (the reference-parity approx
path, `registry/q_ml_streaming.py::approx_aggregates`) cannot do this:
its output is a final number, not a re-aggregable state.

Scale/determinism notes:

- Sketch construction is register-wise max → order- and
  partition-layout-independent state; union is the same max, so a
  union of per-day sketches is BYTE-equivalent in registers to the
  single-pass sketch of the union'd data.
- The HIP estimator on a directly-built sketch and the composite
  estimator a union falls back to can differ slightly, so exact
  cross-engine value matching is impossible BY DESIGN — the registry
  query therefore emits within-relative-error booleans next to the
  exact counts (the `approx_aggregates` self-check pattern), keeping
  the quality contract driver-verdictable.
- lgK=12 → 4 KiB sketches, ~1.6 % standard error; fine-grain rollup
  rows are group-count-sized, never corpus-sized.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 12


def sketch_col_name(value_col: str) -> str:
    return f"hll_{value_col}"


def hll_rollup(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """Fine-grain sketch table: one row per group, one mergeable binary
    HLL sketch of ``value_col``'s distinct values. This is the table a
    pipeline persists (partitioned by the rollup grain); one shuffle on
    the group key with map-side partial sketches."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias(sketch_col_name(value_col))
    )


def hll_reaggregate(
    partials: DataFrame,
    group_cols: Sequence[str],
    sketch_col: str,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Coarser-grain distinct estimates from STORED sketches — unions
    the binary sketch column per output group and estimates; raw data is
    never touched. Input is rollup-sized, so this aggregation is
    metadata-scale at any corpus size."""
    return partials.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col, F.lit(False)))
        .cast("bigint")
        .alias(out_col)
    )
