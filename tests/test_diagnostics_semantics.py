"""SEMANTIC correctness for the round-9 statistical diagnostics.

The oracle-parity gate proves Spark == DuckDB — it cannot catch a
formula both engines share wrong (the r6 VPIN lesson: "sanity-check
output MAGNITUDE too"). These tests run the registry callables against
a CRAFTED events table whose statistical structure is known by
construction, and assert the diagnostics say what a statistician would:
an alternating series is rejected as random with too MANY runs and
VR < 1; equal engagement gives Gini ≈ 0 while a dominant user pushes it
toward 1; a pure random walk's variance ratio sits near 1.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_project_jan_2026_tick_data__spark.registry import QUERIES


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts_str, user_id, event_type, value, props)."""
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    d = str(tmp_path / "sfsynth")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    return d


def _ts(i: int) -> str:
    return f"2024-01-01 00:{i // 60:02d}:{i % 60:02d}"


def _md5_bit(i: int) -> bool:
    """Deterministic unbiased coin: low bit of md5(i) — unlike a
    linear-congruential parity, md5 bits carry no lag structure."""
    import hashlib

    return hashlib.md5(str(i).encode()).digest()[0] % 2 == 0


def test_runs_test_rejects_alternating_series(spark, tmp_path):
    """A strictly alternating up/down price path has the MAXIMUM number
    of runs (one per return): z must be large POSITIVE and the test must
    reject randomness. user_id=0 -> symbol S0 only."""
    rows = []
    price = 100.0
    for i in range(200):
        price += 0.5 if i % 2 == 0 else -0.5
        rows.append((i, _ts(i), 0, "t", round(price, 2), "{}"))
    sf = _write_events(spark, tmp_path, rows)
    out = {r["symbol"]: r for r in QUERIES["events_runs_test"](spark, sf).collect()}
    r = out["S0"]
    # every return flips sign: runs == n_up + n_down (each its own run)
    assert r["n_runs"] == r["n_up"] + r["n_down"]
    assert r["z_q6"] > 3.0
    assert bool(r["reject_random"]) is True


def test_runs_test_accepts_hash_random_signs(spark, tmp_path):
    """Deterministic pseudo-random signs (parity of a hash) should NOT
    be rejected at the 95% level — the negative control."""
    rows = []
    price = 100.0
    for i in range(400):
        price += 0.5 if _md5_bit(i) else -0.5
        rows.append((i, _ts(i), 0, "t", round(price, 2), "{}"))
    sf = _write_events(spark, tmp_path, rows)
    out = {r["symbol"]: r for r in QUERIES["events_runs_test"](spark, sf).collect()}
    assert abs(out["S0"]["z_q6"]) < 3.0


def test_variance_ratio_detects_mean_reversion_and_random_walk(spark, tmp_path):
    """Alternating returns cancel over 2 periods: VR(2) must be near 0
    (strong mean reversion). A deterministic-hash random walk must sit
    near VR = 1 at both horizons."""
    alt = []
    price = 100.0
    for i in range(400):
        price += 0.5 if i % 2 == 0 else -0.5
        alt.append((i, _ts(i), 0, "t", round(price, 2), "{}"))
    sf = _write_events(spark, tmp_path, alt)
    r = {x["symbol"]: x for x in QUERIES["ticks_variance_ratio"](spark, sf).collect()}
    assert r["S0"]["vr2_q6"] < 0.2

    rw = []
    price = 100.0
    for i in range(800):
        price += 0.5 if _md5_bit(i) else -0.5
        rw.append((i, _ts(i), 0, "t", round(price, 2), "{}"))
    sf2 = _write_events(spark, tmp_path / "b", rw)
    r2 = {x["symbol"]: x for x in QUERIES["ticks_variance_ratio"](spark, sf2).collect()}
    assert 0.6 < r2["S0"]["vr2_q6"] < 1.4
    assert 0.5 < r2["S0"]["vr4_q6"] < 1.6


def test_gini_zero_for_equal_and_high_for_dominant(spark, tmp_path):
    """Equal per-user activity -> G ~ 0; one user owning ~99% of events
    -> G near (but below) 1."""
    eq = [
        (u * 10 + i, _ts(u * 10 + i), u, "t", 1.0, "{}")
        for u in range(20)
        for i in range(10)
    ]
    sf = _write_events(spark, tmp_path, eq)
    g = QUERIES["events_gini_engagement"](spark, sf).collect()[0]
    assert g["gini_q6"] < 0.05

    dom = [(i, _ts(i % 3600), 0, "t", 1.0, "{}") for i in range(990)]
    dom += [(1000 + u, _ts(u), 1 + u, "t", 1.0, "{}") for u in range(10)]
    sf2 = _write_events(spark, tmp_path / "d", dom)
    g2 = QUERIES["events_gini_engagement"](spark, sf2).collect()[0]
    assert g2["gini_q6"] > 0.8


def test_bipower_flags_a_jump(spark, tmp_path):
    """Small diffusive moves plus ONE huge jump: RV picks up the jump's
    square, bipower (product of ADJACENT absolute moves) largely does
    not — the relative jump statistic must be decisively positive.
    Without the jump it must hover near the BV/RV bias for the pattern,
    well below the jump case."""
    rows = []
    price = 100.0
    for i in range(300):
        price += 0.01 if i % 2 == 0 else -0.01
        if i == 150:
            price += 25.0  # the jump
        rows.append((i, _ts(i), 0, "t", round(price, 2), "{}"))
    sf = _write_events(spark, tmp_path, rows)
    r = {x["symbol"]: x for x in QUERIES["ticks_bipower_variation"](spark, sf).collect()}
    assert bool(r["S0"]["jump_positive"]) is True
    assert r["S0"]["rel_jump_q6"] > 0.9  # the jump dominates RV


def test_ljung_box_rejects_alternating_accepts_hash_random(spark, tmp_path):
    """Alternating returns have rho1 ~ -1: Q explodes and the test
    rejects; hash-random signs stay under the critical value."""
    alt = []
    price = 100.0
    for i in range(300):
        price += 0.5 if i % 2 == 0 else -0.5
        alt.append((i, _ts(i), 0, "t", round(price, 2), "{}"))
    sf = _write_events(spark, tmp_path, alt)
    q = {x["symbol"]: x for x in QUERIES["events_ljung_box"](spark, sf).collect()}
    assert bool(q["S0"]["reject_white_noise"]) is True

    rnd = []
    price = 100.0
    for i in range(600):
        price += 0.5 if _md5_bit(i) else -0.5
        rnd.append((i, _ts(i), 0, "t", round(price, 2), "{}"))
    sf2 = _write_events(spark, tmp_path / "r", rnd)
    q2 = {x["symbol"]: x for x in QUERIES["events_ljung_box"](spark, sf2).collect()}
    assert bool(q2["S0"]["reject_white_noise"]) is False


def test_ou_half_life_on_ar1_series(spark, tmp_path):
    """A deterministic AR(1) level series x_t = 0.5*x_{t-1} + shock has
    slope ~ 0.5 -> half-life ~ ln2/ln2 = 1 period. The estimator must
    land near that and flag mean reversion."""
    rows = []
    x = 40.0
    for i in range(500):
        shock = (((i * 2654435761) % 97) - 48) / 10.0  # +-4.8, mean ~0
        x = 0.5 * x + shock
        rows.append((i, _ts(i), 0, "t", round(100.0 + x, 2), "{}"))
    sf = _write_events(spark, tmp_path, rows)
    r = {x_["symbol"]: x_ for x_ in QUERIES["ticks_ou_half_life"](spark, sf).collect()}
    row = r["S0"]
    assert bool(row["mean_reverting"]) is True
    assert 0.2 < row["ar1_slope_q6"] < 0.8
    assert 0.3 < row["half_life_q4"] < 3.0


def test_benford_consistent_on_benford_sample(spark, tmp_path):
    """Values drawn as 10^u for a uniform-ish deterministic u follow
    Benford's law by construction: the chi2 screen must NOT reject."""
    rows = []
    for i in range(2000):
        u = (((i * 2654435761) % 9973) / 9973.0) * 3.0  # u in [0, 3)
        v = round(10.0**u, 2)
        if v <= 0:
            continue
        rows.append((i, _ts(i % 3600), i % 7, "t", v, "{}"))
    sf = _write_events(spark, tmp_path, rows)
    b = QUERIES["events_benford_test"](spark, sf).collect()[0]
    assert bool(b["benford_consistent"]) is True
    # and the digit counts decay from d1 to d9 in aggregate
    assert b["d1"] > b["d9"]
