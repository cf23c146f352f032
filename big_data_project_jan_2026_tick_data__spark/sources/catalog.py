"""Catalog helpers: managed tables, bucketing for shuffle-free joins.

The reference's catalog surface is Trino/Iceberg DDL + a MinIO listing
(S9-S11, ``iceberg_migration.py``, ``metadata_layer.py``); here it's the
Spark catalog. Bucketing is the engine's co-location strategy: two tables
bucketed by the same key into the same bucket count join WITHOUT a
shuffle — at 100 TB that's the difference between a network-wide
exchange of the fact table and a local merge per bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def list_symbols(spark: SparkSession, table: str, symbol_col: str = "symbol") -> list[str]:
    """S9: symbol discovery — catalog-driven (replaces the reference's
    MinIO bucket listing, iceberg_migration.py:62-108)."""
    return [
        r[0]
        for r in spark.table(table).select(symbol_col).distinct().orderBy(symbol_col).collect()
    ]


def create_external_parquet(spark: SparkSession, table: str, location: str) -> None:
    """S10: external-table registration over existing parquet files."""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {table} USING parquet LOCATION '{location}'"
    )


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view so users run plain
    ``spark.sql`` over them — the engine's answer to the reference's
    Trino SQL surface (``metadata_layer.py`` external tables). Handles
    the events table's nanosecond timestamps the same way the registry
    does (schema-adaptive ts normalization via ``io.read_events``)."""
    from .io import read_testdata, TESTDATA_TABLES

    for t in TESTDATA_TABLES:
        read_testdata(spark, sf_dir, t).createOrReplaceTempView(t)
