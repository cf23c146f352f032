"""Optional Apache Iceberg backend behind the SnapshotTable API shape.

The reference's lakehouse is real Iceberg on a JDBC catalog served
through Trino (``Apache Iceberg/init-iceberg.sql:5-92``,
``etc/catalog/iceberg.properties:1-9``, ``iceberg_migration.py:236``
partitioning by ``year(datetime)``). This engine's default lakehouse is
the self-contained snapshot log (``plans/snapshots.py`` — runs anywhere
Spark runs, no extra jars); this module is the migration path for
deployments that already operate an Iceberg catalog: the same
write/merge/read(time-travel)/snapshots/rollback/compact/expire surface,
mapped 1:1 onto the public Iceberg-Spark runtime API (DataFrameWriterV2,
``MERGE INTO``, ``VERSION AS OF``, the ``.snapshots`` metadata table and
the ``system.*`` maintenance procedures).

Requires ``iceberg-spark-runtime`` on the Spark classpath and a
configured catalog — both deployment concerns, not code concerns:

    conf = iceberg_conf(catalog="lake", warehouse="s3a://bucket/wh")
    spark = (SparkSession.builder.master(...)
             .config(map=conf)          # or .config(k, v) per entry
             .getOrCreate())
    t = IcebergSnapshotTable(spark, "lake.db.ticks")

Every entry point probes availability first and raises a single clear
``IcebergUnavailableError`` when the runtime jar is missing, instead of
leaking a ClassNotFoundException from the JVM. The environment this
engine is developed in has no Iceberg jar, so integration tests are
env-gated (``SPARK_GRAFT_ICEBERG=1``); conf shape, SQL generation and
the unavailable-path error are covered unconditionally in
``tests/test_plans.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_RUNTIME_CLASS = "org.apache.iceberg.spark.SparkCatalog"
_EXTENSION = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"


class IcebergUnavailableError(RuntimeError):
    pass


def iceberg_conf(
    catalog: str = "lake",
    warehouse: str = "spark-warehouse/iceberg",
    catalog_impl: str = "hadoop",
    jdbc_uri: str | None = None,
) -> dict[str, str]:
    """Spark conf entries for an Iceberg catalog — the Spark-native
    equivalent of the reference's Trino ``iceberg.properties`` (JDBC
    catalog + warehouse dir). ``catalog_impl='hadoop'`` needs no
    external service; pass ``jdbc_uri`` to mirror the reference's JDBC
    catalog exactly."""
    conf = {
        "spark.sql.extensions": _EXTENSION,
        f"spark.sql.catalog.{catalog}": _RUNTIME_CLASS,
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }
    if jdbc_uri is not None:
        conf[f"spark.sql.catalog.{catalog}.catalog-impl"] = (
            "org.apache.iceberg.jdbc.JdbcCatalog"
        )
        conf[f"spark.sql.catalog.{catalog}.uri"] = jdbc_uri
    else:
        conf[f"spark.sql.catalog.{catalog}.type"] = catalog_impl
    return conf


def iceberg_available(spark: SparkSession) -> bool:
    """True when the iceberg-spark-runtime jar is on the JVM classpath."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(_RUNTIME_CLASS)
        return True
    except Exception:
        return False


def _require(spark: SparkSession) -> None:
    if not iceberg_available(spark):
        raise IcebergUnavailableError(
            "iceberg-spark-runtime is not on the Spark classpath; add the "
            "jar (spark.jars.packages=org.apache.iceberg:iceberg-spark-"
            "runtime-<spark_ver>_<scala_ver>:<iceberg_ver>) and the "
            "iceberg_conf() catalog entries, or use the self-contained "
            "plans.snapshots.SnapshotTable backend which needs neither"
        )


def _merge_sql(table: str, source_view: str, key_cols: list[str], columns: list[str]) -> str:
    """MERGE INTO text for key-matched upsert — split out so the SQL
    shape is testable without an Iceberg runtime."""
    if not key_cols:
        raise ValueError("key_cols must be non-empty")
    on = " AND ".join(f"t.{k} <=> s.{k}" for k in key_cols)
    sets = ", ".join(f"t.{c} = s.{c}" for c in columns if c not in key_cols)
    cols = ", ".join(columns)
    vals = ", ".join(f"s.{c}" for c in columns)
    return (
        f"MERGE INTO {table} t USING {source_view} s ON {on} "
        f"WHEN MATCHED THEN UPDATE SET {sets} "
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )


class IcebergSnapshotTable:
    """SnapshotTable-shaped facade over a real Iceberg table.

    Method-for-method parity with ``plans.snapshots.SnapshotTable`` so a
    pipeline can switch backends by swapping the constructor: ``write``
    (append/overwrite), ``merge`` (upsert on key columns), ``read`` with
    ``version=`` / ``as_of_ms=`` time travel, ``snapshots()`` metadata,
    ``rollback_to``, ``compact``, ``expire_snapshots``. Iceberg owns the
    commit protocol here (manifest lists, optimistic retries), so unlike
    the private-log backend there is no retries parameter."""

    def __init__(self, spark: SparkSession, table: str):
        _require(spark)
        self.spark = spark
        self.table = table
        self._catalog = table.split(".", 1)[0] if "." in table else None

    # -- write side ----------------------------------------------------

    def write(self, df: DataFrame, mode: str = "append") -> None:
        if mode == "overwrite" or not self.spark.catalog.tableExists(self.table):
            df.writeTo(self.table).createOrReplace()
        elif mode == "append":
            df.writeTo(self.table).append()
        else:
            raise ValueError(f"unsupported mode {mode!r}")

    def merge(self, updates: DataFrame, key_cols: list[str]) -> None:
        view = "__iceberg_merge_src"
        updates.createOrReplaceTempView(view)
        try:
            self.spark.sql(
                _merge_sql(self.table, view, key_cols, updates.columns)
            )
        finally:
            self.spark.catalog.dropTempView(view)

    # -- read side -------------------------------------------------------

    def read(
        self, version: int | None = None, as_of_ms: int | None = None
    ) -> DataFrame:
        r = self.spark.read
        if version is not None:
            r = r.option("snapshot-id", int(version))
        if as_of_ms is not None:
            r = r.option("as-of-timestamp", int(as_of_ms))
        return r.table(self.table)

    def snapshots(self) -> DataFrame:
        return self.spark.sql(f"SELECT * FROM {self.table}.snapshots")

    def current_snapshot_id(self) -> int:
        row = self.spark.sql(
            f"SELECT snapshot_id FROM {self.table}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).first()
        if row is None:
            raise ValueError(f"{self.table} has no snapshots")
        return int(row.snapshot_id)

    # -- maintenance (Iceberg system procedures) -------------------------

    def _call(self, proc: str, args: str) -> DataFrame:
        if self._catalog is None:
            raise ValueError(
                "maintenance procedures need a catalog-qualified table name"
            )
        return self.spark.sql(f"CALL {self._catalog}.system.{proc}({args})")

    def rollback_to(self, snapshot_id: int) -> None:
        self._call(
            "rollback_to_snapshot",
            f"table => '{self.table}', snapshot_id => {int(snapshot_id)}",
        )

    def compact(self) -> None:
        self._call("rewrite_data_files", f"table => '{self.table}'")

    def expire_snapshots(self, keep_last: int = 1) -> None:
        self._call(
            "expire_snapshots",
            f"table => '{self.table}', retain_last => {int(keep_last)}",
        )
