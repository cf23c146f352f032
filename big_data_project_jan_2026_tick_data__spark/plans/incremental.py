"""Incremental dedup ingestion: continuously append document batches to
a snapshot table, keeping only content never seen before — the arriving-
data twin of the one-shot ``dedup.exact_dedup`` (reference capability:
the lakehouse bulk-load path, ``Apache Iceberg/iceberg_migration.py``,
generalized to dedup-on-ingest).

Invariant (the correctness contract, driver-checked): if batches
partition the corpus into contiguous ``id_col`` ranges ingested in
order, the final table state equals ``exact_dedup`` over the whole
corpus in one shot — earliest-batch-wins composed with
lowest-id-within-batch is exactly lowest-id-overall.

100 TB design: each batch is deduped against the EXISTING table via a
left-anti join on the 8-byte content hash. The hash is persisted as a
``content_hash`` column at write time, so the anti-join's scan of the
(huge) existing table reads exactly one int64 column (parquet column
pruning) — never the text. The join shuffles only (hash) pairs; with a
bucketed table layout the existing side wouldn't shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import exact_dedup
from ..operators.text import normalize_text
from .snapshots import SnapshotTable

HASH_COL = "content_hash"


def with_content_hash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The persisted dedup key: xxhash64 of the normalized content."""
    return df.withColumn(HASH_COL, F.xxhash64(normalize_text(F.col(text_col))))


def dedup_append(
    table: SnapshotTable,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Ingest one batch: dedup within the batch (keep lowest ``id_col``
    per content), drop rows whose content hash already exists in the
    table, append the survivors as a new snapshot (possibly empty — an
    empty append is a valid, cheap snapshot)."""
    b = with_content_hash(exact_dedup(batch, text_col=text_col, id_col=id_col), text_col)
    try:
        existing = table.read().select(HASH_COL).distinct()
    except ValueError:
        existing = None  # first batch: table has no snapshots yet
    if existing is not None:
        b = b.join(existing, HASH_COL, "left_anti")
    table.write(b, mode="append")


# ---------------------------------------------------------------------------
# Incremental materialized aggregate view (OHLC rollup)
# ---------------------------------------------------------------------------
# The batch/streaming-unification piece next to dedup_append: a daily
# per-symbol OHLC view maintained from append batches WITHOUT ever
# re-reading history. The stored state is MERGEABLE PARTIALS — first/
# last picks as (ts, tiebreak, price) structs (min/max over structs is
# associative), extreme prices, exact integer volume/count sums — so
# refresh(batch) = merge(stored, partials(batch)), and any batch
# slicing yields the identical view (the mergeable-rollup discipline
# sketches.py uses for HLL/histograms, applied to an OHLC aggregate).

OHLC_STATE_COLS = ("o_s", "c_s", "l6", "h6", "vol", "n_ticks")


def ohlc_partials(
    ticks: DataFrame,
    ts_col: str = "es",
    price6_col: str = "p6",
    size_col: str = "sz",
    symbol_col: str = "symbol",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """One batch reduced to per-(symbol, day) mergeable OHLC state.
    Prices arrive on the 1e-6 integer grid; open/close ride
    min/max-over-struct (associative, exact), volume and tick count are
    exact integer sums — every column re-merges without error, which is
    what makes the view incrementally maintainable."""
    day = (F.col(ts_col) / 86400).cast("long")
    pick = F.struct(
        F.col(ts_col).alias("ts"),
        F.col(tiebreak_col).alias("tb"),
        F.col(price6_col).alias("p6"),
    )
    return ticks.groupBy(
        F.col(symbol_col).alias("symbol"), day.alias("day")
    ).agg(
        F.min(pick).alias("o_s"),
        F.max(pick).alias("c_s"),
        F.min(price6_col).alias("l6"),
        F.max(price6_col).alias("h6"),
        F.sum(size_col).alias("vol"),
        F.count(F.lit(1)).alias("n_ticks"),
    )


def merge_ohlc_state(stored: DataFrame, batch_partials: DataFrame) -> DataFrame:
    """Merge two partial-state tables: union + the SAME associative
    aggregates — the algebra that makes refresh order-independent."""
    return (
        stored.unionByName(batch_partials)
        .groupBy("symbol", "day")
        .agg(
            F.min("o_s").alias("o_s"),
            F.max("c_s").alias("c_s"),
            F.min("l6").alias("l6"),
            F.max("h6").alias("h6"),
            F.sum("vol").alias("vol"),
            F.sum("n_ticks").alias("n_ticks"),
        )
    )


def refresh_ohlc_view(table, batch: DataFrame, **partial_kwargs) -> None:
    """Ingest one tick batch into the materialized view: reduce the
    batch to partials (the only corpus-sized work — history is never
    re-read), merge with the stored state of the TOUCHED (symbol, day)
    keys only, and MERGE the refreshed rows back (one copy-on-write
    snapshot per refresh — the view's history is time-travelable like
    any other table)."""
    parts = ohlc_partials(batch, **partial_kwargs)
    try:
        stored = table.read()
    except ValueError:
        table.write(parts, mode="append")  # first batch seeds the view
        return
    keys = parts.select("symbol", "day").distinct()
    touched = stored.join(F.broadcast(keys), ["symbol", "day"], "left_semi")
    refreshed = merge_ohlc_state(touched, parts)
    table.merge(refreshed, key_cols=["symbol", "day"])


def finalize_ohlc_view(state: DataFrame) -> DataFrame:
    """Render the partial state as the user-facing OHLC view — a pure
    projection (the stored form IS the aggregate; finalize costs no
    shuffle)."""
    return state.select(
        "symbol",
        "day",
        (F.col("o_s.p6") / F.lit(1e6)).alias("open"),
        (F.col("h6") / F.lit(1e6)).alias("high"),
        (F.col("l6") / F.lit(1e6)).alias("low"),
        (F.col("c_s.p6") / F.lit(1e6)).alias("close"),
        F.col("vol").alias("volume"),
        "n_ticks",
    )
