"""Mergeable HLL sketch rollups (`operators/sketches.py`): the stored
fine-grain sketch table must re-aggregate to the same estimates as a
direct pass, and estimates must be exact while sketches are in the
sparse regime (the property that makes the registry query's 5 % bound
trivially safe at test scales)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_project_jan_2026_tick_data__spark.operators import sketches


@pytest.fixture(scope="module")
def df(spark):
    # 3 groups × 2 sub-grains, overlapping member sets across sub-grains
    rows = [
        (g, d, (g * 97 + i) % 50)
        for g in range(3)
        for d in range(2)
        for i in range(d * 30, d * 30 + 40)  # 40 per sub-grain, 10 overlap
    ]
    return spark.createDataFrame(rows, "g int, d int, v int")


def test_reaggregated_equals_exact_in_sparse_regime(df):
    partials = sketches.hll_rollup(df, ("g", "d"), "v")
    est = sketches.hll_reaggregate(partials, ("g",), "hll_v")
    exact = df.groupBy("g").agg(F.count_distinct("v").alias("n"))
    joined = {r.g: (r.approx_distinct, r.n) for r in est.join(exact, "g").collect()}
    assert len(joined) == 3
    for g, (approx, n) in joined.items():
        # n=50 per group — far below lgK=12 promotion, sketch is exact
        assert approx == n, (g, approx, n)


def test_union_of_partials_matches_direct_sketch(df):
    """Mergeability: estimate(union of per-sub-grain sketches) equals
    estimate(single sketch over the raw rows) in the sparse regime."""
    partials = sketches.hll_rollup(df, ("g", "d"), "v")
    merged = sketches.hll_reaggregate(partials, ("g",), "hll_v", "merged")
    direct = df.groupBy("g").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("v", F.lit(sketches.DEFAULT_LGK)))
        .cast("bigint")
        .alias("direct")
    )
    for r in merged.join(direct, "g").collect():
        assert r.merged == r.direct


def test_rollup_row_count_is_grain_sized(df):
    assert sketches.hll_rollup(df, ("g", "d"), "v").count() == 6


def test_histogram_percentiles_near_exact(spark):
    """Histogram p50/p95 must land within one bin width of the exact
    interpolated percentile, and merging per-sub-grain partials must
    equal the single-pass histogram exactly (integer sums)."""
    import random

    rnd = random.Random(7)
    rows = [(i % 4, i % 2, rnd.uniform(0, 100)) for i in range(4000)]
    df = spark.createDataFrame(rows, "g int, d int, v double")
    lo, hi, nbins = 0.0, 100.0, 200
    width = (hi - lo) / nbins

    part_fine = sketches.histogram_rollup(df, ("g", "d"), "v", lo, hi, nbins)
    est_merged = sketches.histogram_percentiles(
        part_fine, ("g",), (0.5, 0.95), lo, hi, nbins
    )
    part_direct = sketches.histogram_rollup(df, ("g",), "v", lo, hi, nbins)
    est_direct = sketches.histogram_percentiles(
        part_direct, ("g",), (0.5, 0.95), lo, hi, nbins
    )
    merged = {(r.g, r.p): r.est for r in est_merged.collect()}
    direct = {(r.g, r.p): r.est for r in est_direct.collect()}
    assert merged == direct  # merge-of-partials ≡ one-shot, bit-for-bit

    exact = {
        (r.g, p): r[f"q{int(p*100)}"]
        for r in df.groupBy("g")
        .agg(
            F.percentile("v", 0.5).alias("q50"),
            F.percentile("v", 0.95).alias("q95"),
        )
        .collect()
        for p in (0.5, 0.95)
    }
    for k, est in merged.items():
        assert abs(est - exact[k]) <= width + 1e-9, (k, est, exact[k])


def test_histogram_clamps_out_of_range(spark):
    df = spark.createDataFrame(
        [(1, -50.0), (1, 10.0), (1, 999.0)], "g int, v double"
    )
    bins = {
        r.bin: r.cnt
        for r in sketches.histogram_rollup(df, ("g",), "v", 0.0, 100.0, 10).collect()
    }
    assert bins == {0: 1, 1: 1, 9: 1}


def test_pps_sample_exact_count_and_certainty(spark):
    """Systematic PPS: exactly n rows drawn when every weight is below
    the stride; rows heavier than the stride are selected with
    certainty (and emitted once); zero/NULL weights never selected."""
    from big_data_project_jan_2026_tick_data__spark.operators.text import (
        pps_systematic_sample,
    )

    light = spark.createDataFrame(
        [(i, 5 + (i % 7)) for i in range(200)], "doc_id long, wt long"
    )
    out = pps_systematic_sample(light, "wt", 20).collect()
    assert len(out) == 20

    mixed = spark.createDataFrame(
        [(i, 1) for i in range(50)] + [(999, 1000), (0, None), (1000, 0)],
        "doc_id long, wt long",
    )
    rows = pps_systematic_sample(mixed, "wt", 5).collect()
    ids = [r.doc_id for r in rows]
    assert 999 in ids  # heavier than stride → certain
    assert 1000 not in ids  # zero weight
    assert ids.count(999) == 1  # covers >1 grid point but emitted once


def test_psi_drift_zero_for_identical_and_large_for_shift(spark):
    from big_data_project_jan_2026_tick_data__spark.operators.sketches import (
        psi_drift,
    )

    a = spark.createDataFrame(
        [(1, float(i % 50)) for i in range(2000)], "g int, v double"
    )
    same = {r.g: r.psi_q6 for r in psi_drift(a, a, ("g",), "v", 0.0, 100.0).collect()}
    assert same[1] == 0.0  # identical histograms → every contribution 0

    shifted = spark.createDataFrame(
        [(1, 50.0 + float(i % 50)) for i in range(2000)], "g int, v double"
    )
    far = {r.g: r.psi_q6 for r in psi_drift(a, shifted, ("g",), "v", 0.0, 100.0).collect()}
    assert far[1] > 1.0  # disjoint supports → strongly shifted


def test_pps_rejects_overflowing_selection_arithmetic(spark):
    """The BIGINT selection terms reach (n+1)*W; non-ANSI Spark would
    wrap silently and mis-select, so the documented 2^63 bound must be
    enforced up front (W is already a driver scalar)."""
    import pytest as _pytest

    from big_data_project_jan_2026_tick_data__spark.operators.text import (
        pps_systematic_sample,
    )

    heavy = spark.createDataFrame(
        [("a", 2**40), ("b", 2**40)], "doc_id string, wt long"
    )
    with _pytest.raises(ValueError, match="overflows"):
        pps_systematic_sample(heavy, "wt", 2**23)
    with _pytest.raises(ValueError, match="positive"):
        pps_systematic_sample(heavy, "wt", 0)


def test_cms_estimate_dominates_exact_and_merges(spark):
    """CMS guarantees est >= exact per key; and because cells add, the
    sketch of a union equals the cell-wise sum of per-part sketches —
    checked by comparing estimates from a split-then-merged build."""
    from pyspark.sql import functions as F

    from big_data_project_jan_2026_tick_data__spark.operators.sketches import (
        cms_heavy_hitters,
    )

    rows = [(f"u{i % 7}",) for i in range(200)] + [("whale",)] * 50
    df = spark.createDataFrame(rows, "user_id string")
    out = cms_heavy_hitters(df, "user_id", depth=4, width=16, top_k=10).collect()
    assert all(r["cms_est"] >= r["exact_count"] for r in out)
    assert all(r["overcount"] == r["cms_est"] - r["exact_count"] for r in out)
    assert out[0]["key"] == "whale" and out[0]["exact_count"] == 50
    # layout independence: same result at 1 vs 9 partitions
    a = sorted(map(tuple, out))
    b = sorted(
        map(
            tuple,
            cms_heavy_hitters(
                df.repartition(9), "user_id", depth=4, width=16, top_k=10
            ).collect(),
        )
    )
    assert a == b
