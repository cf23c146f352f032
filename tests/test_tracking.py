"""RunTracker: parquet-backed experiment tracking (reference
mlflow_utils.py phase runs / params / metrics / artifacts)."""

from __future__ import annotations

from big_data_project_jan_2026_tick_data__spark.plans.tracking import RunTracker


def _fit(tracker: RunTracker) -> tuple[str, list[str]]:
    parent = tracker.start_run("pipeline")
    child_ids = []
    for i, sym in enumerate(["A", "B"]):
        rid = tracker.start_run("train", parent_run_id=parent)
        child_ids.append(rid)
        tracker.log_params(rid, {"symbol": sym, "lr": 5e-4})
        for epoch in range(3):
            tracker.log_metrics(rid, {"loss": 1.0 / (epoch + 1) + i}, step=epoch)
        tracker.log_artifact(rid, f"/m/{sym}.pt", "model")
        tracker.end_run(rid)
    tracker.end_run(parent)
    return parent, child_ids


def test_lifecycle_and_best_run(spark, tmp_path):
    tr = RunTracker(spark, str(tmp_path / "exp"), "e1")
    parent, (rid_a, rid_b) = _fit(tr)

    runs = {r.run_id: r for r in tr.runs().collect()}
    assert len(runs) == 3
    assert runs[parent].status == "FINISHED"
    assert runs[rid_a].parent_run_id == parent
    assert runs[rid_b].phase == "train"

    # deterministic run ids: experiment/phase/seq
    assert rid_a == "e1/train/0002"

    hist = tr.metric_history("loss").filter(f"run_id = '{rid_a}'").collect()
    assert sorted((r.step, r.value) for r in hist) == [
        (0, 1.0),
        (1, 0.5),
        (2, 1.0 / 3),
    ]

    last = {r.run_id: r.value for r in tr.last_metric("loss").collect()}
    assert last[rid_a] == 1.0 / 3 and last[rid_b] == 1.0 / 3 + 1

    best = tr.best_run("loss", mode="min").collect()
    assert len(best) == 1 and best[0].run_id == rid_a

    params = {(r.run_id, r.key): r.value for r in tr.params().collect()}
    assert params[(rid_a, "symbol")] == "A"
    arts = tr.artifacts().filter(f"run_id = '{rid_b}'").collect()
    assert [a.path for a in arts] == ["/m/B.pt"]


def test_buffered_flush_writes_once_per_table(spark, tmp_path):
    """The buffer must collapse many log calls into one file per flush —
    per-call appends would be a small-file storm at any real cadence."""
    import glob

    root = tmp_path / "exp2"
    tr = RunTracker(spark, str(root), "e2")
    rid = tr.start_run("train")
    for epoch in range(50):
        tr.log_metrics(rid, {"loss": float(epoch)}, step=epoch)
    tr.end_run(rid)  # single flush
    files = glob.glob(str(root / "metrics" / "*.parquet"))
    assert len(files) == 1, files
    assert tr.metrics().count() == 50


def test_seq_resumes_across_tracker_instances(spark, tmp_path):
    """A new tracker over an existing root must continue the seq counter
    (durable tables → colliding run_ids would merge distinct runs) and
    must be able to close a run it didn't start (crashed-session
    recovery)."""
    root = str(tmp_path / "exp4")
    tr1 = RunTracker(spark, root, "e4")
    rid1 = tr1.start_run("train")
    tr1.end_run(rid1)

    tr2 = RunTracker(spark, root, "e4")
    rid2 = tr2.start_run("train")
    assert rid2 != rid1
    tr2.end_run(rid2)
    assert tr2.runs().count() == 2

    tr3 = RunTracker(spark, root, "e4")
    tr3.end_run(rid2, status="KILLED")
    statuses = {r.run_id: r.status for r in tr3.runs().collect()}
    assert statuses[rid2] == "KILLED" and statuses[rid1] == "FINISHED"


def test_empty_tables_read_as_empty(spark, tmp_path):
    tr = RunTracker(spark, str(tmp_path / "none"), "e3")
    assert tr.runs().count() == 0
    assert tr.best_run("loss").count() == 0


def test_runs_identity_survives_status_only_row(spark, tmp_path):
    """Identity columns resolve from the run-CREATION row (min_by over
    seq), so a minimal/foreign writer appending a status-only row (null
    identity columns) cannot corrupt run metadata — regression guard for
    the unordered first() it replaced."""
    root = str(tmp_path / "exp5")
    tr = RunTracker(spark, root, "e5")
    rid = tr.start_run("train", run_name="named")
    tr.end_run(rid)
    # simulate a status-only append: nulls everywhere but id/status/seq
    tr._buf["runs"].append((rid, None, None, None, None, "KILLED", 999))
    tr.flush()
    row = tr.runs().filter(f"run_id = '{rid}'").first()
    assert row.experiment == "e5"
    assert row.phase == "train"
    assert row.run_name == "named"
    assert row.status == "KILLED"


def test_pyarrow_and_spark_shards_mix_in_one_table(spark, tmp_path):
    """flush() writes local shards driver-side with pyarrow; the Spark
    writer remains the remote-root fallback. Both must produce the SAME
    parquet schema (int32/int64/utf8) so a directory holding a mix of
    shard provenances reads back as one table."""
    import os

    from big_data_project_jan_2026_tick_data__spark.plans.tracking import (
        _METRICS_DDL,
        _pyarrow_shard_append,
    )

    root = str(tmp_path / "mix")
    path = os.path.join(root, "metrics")
    # pyarrow shard
    assert _pyarrow_shard_append(path, [("r1", "loss", 0.5, 0)], _METRICS_DDL, 1)
    # spark shard into the same dir
    spark.createDataFrame([("r2", "loss", 0.25, 1)], _METRICS_DDL).coalesce(
        1
    ).write.mode("append").parquet(path)
    back = spark.read.parquet(path)
    assert back.schema.simpleString() == (
        "struct<run_id:string,key:string,value:double,step:int>"
    )
    assert {(r.run_id, r.value) for r in back.collect()} == {("r1", 0.5), ("r2", 0.25)}


def test_remote_scheme_falls_back(tmp_path):
    from big_data_project_jan_2026_tick_data__spark.plans.tracking import (
        _METRICS_DDL,
        _pyarrow_shard_append,
    )

    assert not _pyarrow_shard_append(
        "s3a://bucket/exp/metrics", [("r", "k", 1.0, 0)], _METRICS_DDL, 1
    )


def test_single_slash_file_scheme_routes_locally(spark, tmp_path):
    """Hadoop-style 'file:/abs/path' (single slash) must resolve to the
    local filesystem path — not a literal './file:' directory."""
    import os

    from big_data_project_jan_2026_tick_data__spark.plans.tracking import (
        _METRICS_DDL,
        _pyarrow_shard_append,
    )

    real = str(tmp_path / "sched")
    assert _pyarrow_shard_append(
        f"file:{real}/metrics", [("r", "k", 1.0, 0)], _METRICS_DDL, 1
    )
    assert os.path.isdir(f"{real}/metrics")
    assert not os.path.exists("file:")
    files = os.listdir(f"{real}/metrics")
    # atomic publish: no .tmp staging file left behind
    assert files and all(f.endswith(".parquet") for f in files)


def test_host_qualified_file_uri_falls_back(tmp_path):
    """'file://somehost/p' names a remote host: slash-collapsing it
    would silently shard into the bogus local dir /somehost/p. It must
    route to the Spark writer (return False); the 'localhost' and
    empty-authority forms stay local."""
    import os

    from big_data_project_jan_2026_tick_data__spark.plans.tracking import (
        _METRICS_DDL,
        _pyarrow_shard_append,
    )

    assert not _pyarrow_shard_append(
        "file://somehost/exp/metrics", [("r", "k", 1.0, 0)], _METRICS_DDL, 1
    )
    assert not os.path.exists("/somehost")
    local = str(tmp_path / "m1")
    assert _pyarrow_shard_append(
        f"file://localhost{local}", [("r", "k", 1.0, 0)], _METRICS_DDL, 1
    )
    assert os.listdir(local)
    local2 = str(tmp_path / "m2")
    # local2 is absolute, so this is the empty-authority file:///p form
    assert _pyarrow_shard_append(
        f"file://{local2}", [("r", "k", 1.0, 0)], _METRICS_DDL, 1
    )
    assert os.listdir(local2)
