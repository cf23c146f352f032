"""Serving/orchestration driver (plans/serving.py): the FastAPI-shaped
train_val → test → status lifecycle over the real distributed
featurize/train/score operators, with parquet run tracking."""

from __future__ import annotations

from datetime import datetime

import numpy as np
import pytest

from big_data_project_jan_2026_tick_data__spark.plans.serving import (
    DEFAULT_PARAMETERS,
    MLPipelineService,
)


def _ticks(spark, n_days=3, n_min=40, symbols=("AAA", "BBB"), seed=3):
    """Morning-session minute ticks with a low-rank daily curve so the
    bottleneck model has signal; values are deterministic."""
    rng = np.random.default_rng(seed)
    rows = []
    for s_ix, sym in enumerate(symbols):
        curve = rng.normal(loc=100 + 10 * s_ix, scale=2.0, size=n_min)
        for d in range(1, n_days + 1):
            scale = 1.0 + 0.05 * d
            for m in range(n_min):
                bid = float(curve[m] * scale)
                rows.append((sym, datetime(2024, 1, d, 8, m), bid, bid * 1.01))
    return spark.createDataFrame(
        rows, "symbol string, ts timestamp, bid double, ask double"
    )


@pytest.fixture()
def params():
    return {
        "model": {"hidden_dims": (8,), "latent_dim": 2},
        "training": {"n_epochs": 4, "n_batches": 2},
        "window_size": 16,
    }


def test_run_all_lifecycle(spark, tmp_path, params):
    svc = MLPipelineService(spark, str(tmp_path), parameters=params)
    ticks = _ticks(spark)
    out = svc.run_all(ticks)

    assert out["phases"] == {"train_val": "done", "test": "done"}
    assert out["model_trained"] is True
    # deterministic run ids: experiment/phase/seq
    assert out["runs"]["train_val"] == "tick_ae/train_val/0001"
    assert out["runs"]["test"].startswith("tick_ae/test/")

    runs = {r["run_id"]: r for r in svc.tracker.runs().collect()}
    assert runs[out["runs"]["train_val"]]["status"] == "FINISHED"
    assert runs[out["runs"]["test"]]["status"] == "FINISHED"
    # test run is linked to its training parent (MLflow parent-run shape)
    assert runs[out["runs"]["test"]]["parent_run_id"] == out["runs"]["train_val"]

    # loss curve logged per epoch per symbol
    hist = svc.tracker.metric_history("loss_AAA").collect()
    assert len(hist) == params["training"]["n_epochs"]
    steps = [r["step"] for r in hist]
    assert steps == sorted(steps)

    # window_errors table: every (symbol, window) scored, flags present
    we = svc.window_errors()
    assert set(we.columns) == {
        # dots are sanitized out of column names: "anomaly_p99.5" would
        # break dotted-path references in every downstream consumer
        "symbol", "window_id", "err", "anomaly_p92", "anomaly_p99_5",
    }
    n_rows = we.count()
    assert n_rows == 2 * 3  # 2 symbols x 3 morning windows
    assert we.filter(we["err"] < 0).count() == 0
    # thresholds logged per symbol
    m = {r["key"] for r in svc.tracker.metrics().collect()}
    assert {"p92_AAA", "p99_5_AAA", "p92_BBB", "p99_5_BBB"} <= m


def test_test_before_train_raises(spark, tmp_path, params):
    svc = MLPipelineService(spark, str(tmp_path), parameters=params)
    with pytest.raises(RuntimeError, match="train_val must complete"):
        svc.test(_ticks(spark, n_days=1))
    assert svc.status()["phases"] == {"train_val": "idle", "test": "idle"}


def test_pca_model_kind(spark, tmp_path, params):
    svc = MLPipelineService(
        spark, str(tmp_path), parameters=params, model_kind="pca"
    )
    out = svc.run_all(_ticks(spark, n_days=2))
    assert out["phases"]["test"] == "done"
    assert svc.window_errors().count() == 2 * 2


def test_failed_phase_is_recorded(spark, tmp_path, params):
    svc = MLPipelineService(spark, str(tmp_path), parameters=params)
    bad = spark.createDataFrame([("A",)], "symbol string")  # no ts/bid/ask
    with pytest.raises(Exception):
        svc.train_val(bad)
    assert svc.status()["phases"]["train_val"] == "failed"
    runs = {r["run_id"]: r["status"] for r in svc.tracker.runs().collect()}
    assert runs["tick_ae/train_val/0001"] == "FAILED"


def test_parameters_merge_is_deep():
    svc_params = {"training": {"n_epochs": 2}}
    from big_data_project_jan_2026_tick_data__spark.plans.serving import _merged

    m = _merged(DEFAULT_PARAMETERS, svc_params)
    assert m["training"]["n_epochs"] == 2
    # untouched sibling keys survive the deep merge
    assert m["training"]["learning_rate"] == 5e-3
    assert m["model"]["latent_dim"] == 8
    assert DEFAULT_PARAMETERS["training"]["n_epochs"] == 12  # no mutation


def test_checkpoint_blocks_released_after_run_all(spark, tmp_path):
    """A long-lived service must not accumulate localCheckpoint blocks
    across calls: after run_all, every tensor checkpoint created by the
    phases is unpersisted (Dataset.unpersist alone can't do this — the
    service tracks the RDD ids it creates)."""
    from big_data_project_jan_2026_tick_data__spark.plans.serving import (
        MLPipelineService,
    )

    def persistent_ids():
        sc = spark.sparkContext._jsc.sc()
        it = sc.getPersistentRDDs().keysIterator()
        ids = set()
        while it.hasNext():
            ids.add(it.next())
        return ids

    before = persistent_ids()
    svc = MLPipelineService(
        spark, str(tmp_path / "svc_ckpt"), model_kind="pca",
        parameters={"training": {"n_epochs": 2}, "window_size": 16},
    )
    svc.run_all(_ticks(spark))
    leaked = persistent_ids() - before
    assert not leaked, f"leaked persistent RDD ids: {leaked}"
