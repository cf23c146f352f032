"""The reference's 4-stage batch ETL chain (SURVEY §3.1) as one
Spark-native pipeline — convert → quality scan → clean/downsample →
daily statistics.

Reference: ``Data Preprocessing and Cleaning/`` scripts, which loop on the
driver (per folder / per file / per symbol) and run 1-4 Spark actions per
iteration. Here each stage is ONE distributed plan over the whole corpus
with ``symbol`` as a column:

- convert: recursive CSV scan (schema-on-read) → partitioned parquet
  (``spark_csv_parquet_converter_ver_1.py`` minus the os.walk loop);
- quality: one-pass per-file row/null audit (``spark_data_cleaner_script.py``
  ran 4 actions per file);
- clean: parse → session filter → deterministic 1s downsample → gold
  table partitioned by (symbol, year) (``spark_session_window_tick_cleaner.py``
  minus footer pre-reads, file-order chaining, unionByName fold and
  coalesce(1)+rename — a global event-time order subsumes file ordering);
- stats: daily per-window counts in one conditional aggregation
  (``symbol_statistics_generate.py``).

At 100 TB: every stage scales by partition count; the gold write is
partitioned by (symbol, year(ts)) so later per-symbol/per-year queries
prune; no stage collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import stats, ticks
from .schemas import TICKS_RAW_DDL
from .sources.io import read_csv_ticks


def convert_csv_tree(
    spark: SparkSession,
    csv_root: str,
    out_path: str,
    symbol_from_dir: bool = True,
) -> DataFrame:
    """Stage 1 — CSV tree → bronze parquet. The immediate parent directory
    name becomes the ``symbol`` column (the reference's one-folder-per-
    symbol layout, spark_csv_parquet_converter_ver_1.py:85-87)."""
    df = read_csv_ticks(spark, csv_root, schema=TICKS_RAW_DDL)
    df = df.select("DateTime", "Bid", "Ask")  # drop Volume at scan (P1)
    if symbol_from_dir:
        df = df.withColumn(
            "symbol",
            F.element_at(F.split(F.input_file_name(), "/"), -2),
        )
    df.write.mode("overwrite").option("compression", "snappy").partitionBy(
        "symbol"
    ).parquet(out_path)
    return spark.read.parquet(out_path)


def quality_report(spark: SparkSession, bronze_path: str) -> DataFrame:
    """Stage 2 — per-file quality audit, one scan."""
    df = spark.read.parquet(bronze_path)
    return stats.quality_scan_per_file(df, cols=["DateTime", "Bid", "Ask"])


def clean_to_gold(
    spark: SparkSession,
    bronze_path: str,
    gold_path: str,
    closed: str = "hour_tail",
) -> DataFrame:
    """Stage 3 — parse, session-filter, deterministic 1-second downsample,
    write the gold table partitioned by (symbol, year)."""
    bronze = spark.read.parquet(bronze_path)
    parsed = ticks.parse_ticks(bronze)
    filtered = ticks.session_filter(parsed, closed=closed)
    ds = ticks.downsample_1s(filtered, partition_cols=("symbol",))
    gold = ds.withColumn("year", F.year("ts"))
    gold.write.mode("overwrite").option("compression", "snappy").partitionBy(
        "symbol", "year"
    ).parquet(gold_path)
    return spark.read.parquet(gold_path)


def daily_stats(spark: SparkSession, gold_path: str) -> DataFrame:
    """Stage 4 — daily per-session-window tick counts per symbol."""
    gold = spark.read.parquet(gold_path)
    return stats.daily_window_counts(
        gold, ts_col="ts", partition_cols=("symbol",), closed="left"
    )


def run_pipeline(
    spark: SparkSession, csv_root: str, work_dir: str
) -> dict[str, DataFrame]:
    """The full chain; returns each stage's output DataFrame."""
    bronze = f"{work_dir}/bronze"
    gold = f"{work_dir}/gold"
    converted = convert_csv_tree(spark, csv_root, bronze)
    quality = quality_report(spark, bronze)
    cleaned = clean_to_gold(spark, bronze, gold)
    statistics = daily_stats(spark, gold)
    return {
        "bronze": converted,
        "quality": quality,
        "gold": cleaned,
        "stats": statistics,
    }
