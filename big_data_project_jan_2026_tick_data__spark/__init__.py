"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference tick-data platform
(``AlgoDeveloper400/Big-Data-Project-Jan-2026-Tick-Data-``), re-expressed
Spark-first (DataFrame/SQL/Catalyst/Structured Streaming).

Layout:

- ``engine``      — SparkSession factory with the reference's tuning profile
- ``schemas``     — explicit schemas (raw/clean ticks, stats outputs)
- ``sources``     — CSV/parquet scan+sink helpers (schema-on-read, snappy)
- ``operators``   — tick ops, stats, joins, dedup, similarity, text, ML feat
- ``plans``       — snapshot-log lakehouse (time travel, rollback)
- ``streaming``   — Structured Streaming session-window pipeline
"""

from .engine import get_spark, stop_spark

__all__ = ["get_spark", "stop_spark"]
__version__ = "0.1.0"
