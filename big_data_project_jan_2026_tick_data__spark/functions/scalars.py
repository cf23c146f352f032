"""Scalar function helpers (SURVEY §2.8 F1-F11) — thin, composable Column
builders; everything stays a Catalyst expression."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..schemas import TICKS_TS_FORMAT


def parse_tick_ts(col: Column, fmt: str = TICKS_TS_FORMAT) -> Column:
    """F1: null-on-failure timestamp parse (reference
    spark_session_window_tick_cleaner.py:136 / pandas errors='coerce')."""
    return F.to_timestamp(col, fmt)


def clamped_spread(ask: Column, bid: Column) -> Column:
    """F4: max(ask-bid, 0) (model.py:207-215)."""
    return F.greatest(ask - bid, F.lit(0.0))


def sanitize_table_name(col: Column) -> Column:
    """F9: symbol → identifier-safe table name (iceberg_migration.py:113-120
    chains str.replace; one regexp here)."""
    return F.lower(F.regexp_replace(col, r"[^A-Za-z0-9_]", "_"))


def symbol_prefix(col: Column, delim: str = "-") -> Column:
    """F10: folder → symbol prefix (iceberg_migration.py:102's
    split('-')[0].lower())."""
    return F.lower(F.substring_index(col, delim, 1))


def window_id_str(ts: Column) -> Column:
    """F11: `{date}_{morning|afternoon}` key (model.py:260-272)."""
    session = F.when(F.hour(ts) < 12, "morning").otherwise("afternoon")
    return F.concat_ws("_", F.to_date(ts).cast("string"), session)
