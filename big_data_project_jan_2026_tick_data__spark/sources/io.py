"""Sources & sinks (SURVEY §2.1 S1-S12).

Schema-on-read everywhere (no inferSchema in production paths), snappy
parquet sinks, and NO driver-side per-file loops — a directory is one
scan, with ``input_file_name()`` when per-file provenance matters
(replaces the reference's per-file driver iteration,
``spark_data_cleaner_script.py:48-63`` and per-file union fold,
``spark_session_window_tick_cleaner.py:112-126``).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TICKS_RAW_DDL

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_csv_ticks(
    spark: SparkSession, path: str, schema: str = TICKS_RAW_DDL, header: bool = True
) -> DataFrame:
    """S1: schema-on-read CSV scan over a file or directory tree.

    Reference reads one folder per driver-loop iteration
    (spark_csv_parquet_converter_ver_1.py:61-70,85-87); one
    recursive scan replaces the loop — Spark parallelizes across files.
    """
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("recursiveFileLookup", "true")
        .csv(path)
    )


def read_parquet(spark: SparkSession, path: str, with_file: bool = False) -> DataFrame:
    """S3: parquet scan (vectorized, footer-stats pruning for free)."""
    df = spark.read.parquet(path)
    if with_file:
        df = df.withColumn("file", F.input_file_name())
    return df


def read_testdata(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    if table not in TESTDATA_TABLES:
        raise ValueError(f"unknown table {table!r}")
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: tuple[str, ...] = (),
    max_records_per_file: int | None = None,
) -> None:
    """S5/S6: snappy parquet sink. The reference's coalesce(1)+rename
    single-file trick (spark_session_window_tick_cleaner.py:173-182) is an
    anti-pattern at scale — partitioned table output with
    maxRecordsPerFile is the replacement."""
    writer = df.write.mode(mode).option("compression", "snappy")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv_report(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7: CSV sink for small reports (quality scan, daily stats)."""
    df.write.mode(mode).option("header", True).csv(path)


def write_clustered(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] = (),
    cluster_by: Sequence[str] = ("ts",),
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet write with within-file clustering: rows are
    sorted on ``cluster_by`` inside each task before writing, so parquet
    row-group min/max statistics become tight and range predicates
    (time filters on tick data) prune row groups at scan time — the
    poor-man's Z-order, free at write time. Combine with
    ``partition_by`` for directory-level pruning."""
    out = df
    if cluster_by:
        # partition cols must prefix the sort: the parquet writer re-sorts
        # each task by partition columns for dynamic partitioning, which
        # would destroy a cluster-only ordering; with the prefix in place
        # the writer's required ordering is already satisfied.
        out = df.sortWithinPartitions(*partition_by, *cluster_by)
    writer = out.write.mode(mode).option("compression", "snappy")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
