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
