"""Experiment/run tracking as plain Spark parquet tables.

Engine-side replacement for the reference's MLflow wrapper
(``ML Model/Scripts/mlflow_utils.py:48-113``: experiment setup, phase
runs with parent links, ``log_params`` / ``log_metrics(step=...)`` /
``log_artifact``): the same record shapes land in four append-only
parquet tables (runs, params, metrics, artifacts) under one root, so
run history is queryable with the exact DataFrame/SQL surface as any
other engine source — no tracking server.

Scale notes: tracking data is metadata-scale, but naive per-call
appends would write one parquet file per logged metric — a classic
small-file anti-pattern. The tracker therefore BUFFERS rows in memory
and writes one file per table per ``flush()`` (``end_run`` flushes).
Readers get plain DataFrames; ``best_run`` is one window query.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_RUNS_DDL = (
    "run_id string, experiment string, phase string, run_name string, "
    "parent_run_id string, status string, seq int"
)
_PARAMS_DDL = "run_id string, key string, value string"
_METRICS_DDL = "run_id string, key string, value double, step int"
_ARTIFACTS_DDL = "run_id string, path string, kind string"

_PA_TYPES = {"string": "string", "int": "int32", "long": "int64", "double": "float64"}


def _pyarrow_shard_append(path: str, rows: list, ddl: str, seq: int) -> bool:
    """Append one parquet shard driver-side for LOCAL roots; returns
    False for remote (scheme-qualified) roots so the caller falls back
    to the Spark writer. Types mirror Spark's DDL→parquet mapping
    exactly (int→int32, long→int64) so mixed Spark/pyarrow shards in
    one directory read back under a single merged schema."""
    import re
    import uuid

    if re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:", path):
        if not path.startswith("file:"):
            return False  # hdfs:// s3a:// etc → Spark writer (Hadoop FS API)
        # Hadoop accepts file:/p and file:///p for local paths, but
        # file://somehost/p names a REMOTE host: collapsing its slashes
        # would silently write shards to the bogus local dir /somehost/p.
        # Parse properly and hand host-qualified URIs to the Spark
        # writer instead.
        from urllib.parse import urlparse

        parsed = urlparse(path)
        if parsed.netloc and parsed.netloc != "localhost":
            return False
        local = parsed.path or "/"
    else:
        local = path
    import pyarrow as pa
    import pyarrow.parquet as pq

    fields = []
    for col in ddl.split(","):
        name, typ = col.strip().split()
        fields.append(pa.field(name, getattr(pa, _PA_TYPES[typ])()))
    schema = pa.schema(fields)
    cols = list(zip(*rows)) if rows else [[] for _ in fields]
    table = pa.Table.from_arrays(
        [pa.array(list(c), type=f.type) for c, f in zip(cols, schema)], schema=schema
    )
    os.makedirs(local, exist_ok=True)
    # Stage + atomic rename: a crash mid-write must never leave a
    # footerless parquet file visible, or every later read of the table
    # (including RunTracker.__init__'s resume scan) would throw. The
    # dot-prefixed temp name is additionally ignored by Spark's file
    # listing even in the rename window.
    final = f"part-{seq:05d}-{uuid.uuid4().hex}.snappy.parquet"
    tmp = os.path.join(local, f".{final}.tmp")
    pq.write_table(table, tmp, compression="snappy")
    os.rename(tmp, os.path.join(local, final))
    return True


class RunTracker:
    """Parquet-backed experiment tracker.

    Run ids are deterministic (``experiment/phase/seq``) so tests and
    oracle queries can reproduce them; wall-clock stamps are the
    caller's concern (pass one as a param/tag if needed) — determinism
    of the stored tables is what makes run history value-checkable.
    """

    def __init__(self, spark: SparkSession, root: str, experiment: str):
        self.spark = spark
        self.root = root
        self.experiment = experiment
        # Resume-safe: the tables are durable parquet, so a new tracker
        # over an existing root must continue the seq counter — otherwise
        # its run_ids collide with persisted runs and runs()/best_run()
        # silently merge distinct runs.
        existing = self._table("runs", _RUNS_DDL)
        row = existing.agg(F.max("seq")).first()
        self._seq = int(row[0]) if row and row[0] is not None else 0
        # run_id -> (phase, run_name, parent) — survives flushes, unlike
        # the write buffer, so end_run can restate the run row
        self._run_info: dict[str, tuple[str, str, str | None]] = {}
        self._buf: dict[str, list[tuple]] = {
            "runs": [],
            "params": [],
            "metrics": [],
            "artifacts": [],
        }

    # -- write side ---------------------------------------------------

    def start_run(
        self,
        phase: str,
        parent_run_id: str | None = None,
        run_name: str | None = None,
    ) -> str:
        self._seq += 1
        run_id = f"{self.experiment}/{phase}/{self._seq:04d}"
        name = run_name or f"{self.experiment}_{phase}_{self._seq:04d}"
        self._run_info[run_id] = (phase, name, parent_run_id)
        self._buf["runs"].append(
            (run_id, self.experiment, phase, name, parent_run_id, "RUNNING", self._seq)
        )
        return run_id

    def log_params(self, run_id: str, params: dict) -> None:
        for k in sorted(params):
            self._buf["params"].append((run_id, k, str(params[k])))

    def log_metrics(self, run_id: str, metrics: dict, step: int = 0) -> None:
        for k in sorted(metrics):
            self._buf["metrics"].append((run_id, k, float(metrics[k]), step))

    def log_artifact(self, run_id: str, path: str, kind: str = "file") -> None:
        self._buf["artifacts"].append((run_id, path, kind))

    def end_run(self, run_id: str, status: str = "FINISHED") -> None:
        # status transition is recorded as the LAST runs row for the id;
        # readers resolve current status with a max_by over seq (append-
        # only tables never update in place — same discipline as the
        # snapshots subsystem).
        self._seq += 1
        info = self._run_info.get(run_id)
        if info is None:
            # run started by a previous session (e.g. closing a crashed
            # RUNNING run): recover its identity from the persisted log
            row = (
                self._table("runs", _RUNS_DDL)
                .filter(F.col("run_id") == run_id)
                .orderBy("seq")
                .first()
            )
            if row is None:
                raise KeyError(f"unknown run_id {run_id!r}")
            info = (row.phase, row.run_name, row.parent_run_id)
        phase, name, parent = info
        self._buf["runs"].append(
            (run_id, self.experiment, phase, name, parent, status, self._seq)
        )
        self.flush()

    def flush(self) -> None:
        ddl = {
            "runs": _RUNS_DDL,
            "params": _PARAMS_DDL,
            "metrics": _METRICS_DDL,
            "artifacts": _ARTIFACTS_DDL,
        }
        for table, rows in self._buf.items():
            if not rows:
                continue
            path = os.path.join(self.root, table)
            # Tracking rows are metadata-scale BY DEFINITION (per-run,
            # not per-record), so routing a 20-row buffer through a
            # distributed write job pays ~1-2 s of job/committer fixed
            # cost per flush for nothing. Local roots write the shard
            # straight from the driver with pyarrow (~ms; Spark reads
            # it back identically — schema parity pinned in
            # test_tracking); remote roots (hdfs/s3a) keep the Spark
            # writer, which speaks the Hadoop FileSystem API.
            if not _pyarrow_shard_append(path, rows, ddl[table], self._seq):
                (
                    self.spark.createDataFrame(rows, ddl[table])
                    .coalesce(1)
                    .write.mode("append")
                    .parquet(path)
                )
            self._buf[table] = []

    # -- read side ----------------------------------------------------

    def _table(self, name: str, ddl: str) -> DataFrame:
        path = os.path.join(self.root, name)
        try:
            return self.spark.read.parquet(path)
        except Exception as exc:
            # only a never-written table reads as empty; corruption or
            # permission failures must propagate, not report "no runs"
            if "PATH_NOT_FOUND" in str(exc) or "Path does not exist" in str(exc):
                return self.spark.createDataFrame([], ddl)
            raise

    def runs(self) -> DataFrame:
        """Current state per run: the append-only runs log resolved to
        one row per run_id (latest status wins via max_by(seq))."""
        r = self._table("runs", _RUNS_DDL)
        # identity columns resolve via min_by(col, seq) — the values at
        # run creation — NOT unordered first(): a future writer emitting a
        # status-only row (null identity columns) must not be able to
        # corrupt run metadata depending on partition arrival order.
        return r.groupBy("run_id").agg(
            F.expr("min_by(experiment, seq)").alias("experiment"),
            F.expr("min_by(phase, seq)").alias("phase"),
            F.expr("min_by(run_name, seq)").alias("run_name"),
            F.expr("min_by(parent_run_id, seq)").alias("parent_run_id"),
            F.expr("max_by(status, seq)").alias("status"),
            F.min("seq").alias("started_seq"),
        )

    def params(self) -> DataFrame:
        return self._table("params", _PARAMS_DDL)

    def metrics(self) -> DataFrame:
        return self._table("metrics", _METRICS_DDL)

    def artifacts(self) -> DataFrame:
        return self._table("artifacts", _ARTIFACTS_DDL)

    def metric_history(self, key: str) -> DataFrame:
        """(run_id, step, value) trajectory for one metric key."""
        return (
            self.metrics()
            .filter(F.col("key") == key)
            .select("run_id", "step", "value")
        )

    def last_metric(self, key: str) -> DataFrame:
        """Final (max-step) value of ``key`` per run."""
        return (
            self.metrics()
            .filter(F.col("key") == key)
            .groupBy("run_id")
            .agg(F.expr("max_by(value, step)").alias("value"))
        )

    def best_run(self, key: str, mode: str = "min") -> DataFrame:
        """The run whose FINAL value of ``key`` is best — one window
        query over the joined runs/metrics tables; ties break on
        run_id so the answer is total-ordered."""
        asc = mode == "min"
        last = self.last_metric(key)
        joined = self.runs().join(last, "run_id")
        order = [
            F.col("value").asc() if asc else F.col("value").desc(),
            F.col("run_id").asc(),
        ]
        w = Window.orderBy(*order)
        return (
            joined.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("run_id", "phase", "status", "value")
        )
