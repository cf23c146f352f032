"""PageRank properties: conservation of mass, uniform-cycle symmetry,
dangling-node redistribution, and parity with a numpy power iteration
using the identical q9 quantization schedule."""

from __future__ import annotations

import math

import numpy as np

from big_data_project_jan_2026_tick_data__spark.operators import graph


def _q9(v: float) -> float:
    return math.floor(v * 1e9 + 0.5) / 1e9


def _numpy_pagerank(edges, damping=0.85, iters=10):
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0.0) + w
    rank = {m: _q9(1.0 / n) for m in nodes}
    for _ in range(iters):
        contrib = {m: 0.0 for m in nodes}
        for s, d, w in edges:
            contrib[d] += rank[s] * (w / out_w[s])
        dm = sum(rank[m] for m in nodes if m not in out_w)
        base = (1.0 - damping) / n
        rank = {
            m: _q9(base + damping * (contrib[m] + dm / n)) for m in nodes
        }
    return {m: math.floor(r * 1e6 + 0.5) / 1e6 for m, r in rank.items()}


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string, w double")
    return {
        r["node"]: r["rank_q6"]
        for r in graph.pagerank(df, weight="w", **kw).collect()
    }


def test_uniform_cycle_is_uniform(spark):
    edges = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)]
    got = _run(spark, edges, iters=10)
    assert len(set(got.values())) == 1
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_matches_numpy_power_iteration(spark):
    edges = [
        ("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 1.0),
        ("c", "a", 1.0), ("d", "a", 3.0), ("d", "b", 1.0),
    ]
    assert _run(spark, edges, iters=10) == _numpy_pagerank(edges)


def test_dangling_node_mass_redistributes(spark):
    # 'sink' has no out-edges: its mass must spread, total stays ~1
    edges = [("a", "sink", 1.0), ("b", "sink", 1.0), ("a", "b", 1.0)]
    got = _run(spark, edges, iters=10)
    assert got == _numpy_pagerank(edges)
    assert abs(sum(got.values()) - 1.0) < 1e-4
    assert got["sink"] == max(got.values())


def test_triangle_counts_known_graph(spark):
    """K4 plus a pendant node and a duplicate/reversed edge: every K4
    node sits in exactly 3 triangles, the pendant in none; dedupe and
    canonicalization must absorb the noise."""
    from big_data_project_jan_2026_tick_data__spark.operators.graph import (
        triangle_counts,
    )

    edges = [(i, j) for i in range(1, 5) for j in range(i + 1, 5)]
    edges += [(5, 1), (2, 1), (3, 3)]  # pendant, reversed dup, self-loop
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.triangles for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_triangle_free(spark):
    from big_data_project_jan_2026_tick_data__spark.operators.graph import (
        triangle_counts,
    )

    # C4 cycle — no triangles
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    assert triangle_counts(df).count() == 0


def test_label_propagation_matches_python_oracle(spark):
    """Two triangles joined by a bridge plus an isolated pair: the
    Spark supersteps must match an independent python implementation of
    the same min-mode update, iteration for iteration (including the
    classic 2-node synchronous oscillation, which the fixed iteration
    count makes deterministic)."""
    from collections import Counter

    from big_data_project_jan_2026_tick_data__spark.operators.graph import (
        label_propagation,
    )

    edges = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10), (20, 21)]

    def py_lpa(edges, iters):
        und = {}
        for s, d in edges:
            und.setdefault(s, set()).add(d)
            und.setdefault(d, set()).add(s)
        lab = {n: n for n in und}
        for _ in range(iters):
            new = {}
            for n, nbrs in und.items():
                cnt = Counter(lab[m] for m in nbrs)
                top = max(cnt.values())
                new[n] = min(l for l, c in cnt.items() if c == top)
            lab = new
        return lab

    df = spark.createDataFrame(edges, "src long, dst long")
    for iters in (1, 2, 4):
        got = {r.node: r.label for r in label_propagation(df, iters=iters).collect()}
        assert got == py_lpa(edges, iters), iters


def test_iterative_operators_do_not_accumulate_checkpoints(spark):
    """pagerank/label_propagation localCheckpoint every superstep;
    superseded generations must be unpersisted as the loop advances
    (Dataset.unpersist() can't free them), leaving O(1) — not O(iters)
    — persistent RDDs per call in a long-lived driver."""
    from big_data_project_jan_2026_tick_data__spark.engine import (
        persistent_rdd_ids,
        release_rdd_ids,
    )
    from big_data_project_jan_2026_tick_data__spark.operators.graph import (
        label_propagation,
        pagerank,
    )

    edges = spark.createDataFrame(
        [(i, (i + 1) % 12) for i in range(12)] + [(0, 6), (3, 9)],
        "src int, dst int",
    )
    before = persistent_rdd_ids(spark)
    pr = pagerank(edges, iters=6)
    assert pr.count() == 12
    after_pr = persistent_rdd_ids(spark) - before
    # one retained checkpoint = one RDD id (6 iters would leak ≥ 8)
    assert len(after_pr) <= 2, f"pagerank retained {len(after_pr)} RDDs"
    lp = label_propagation(edges, iters=5)
    assert lp.count() == 12
    after_lp = persistent_rdd_ids(spark) - before - after_pr
    assert len(after_lp) <= 2, f"label_propagation retained {len(after_lp)} RDDs"
    # results stay readable after the cleanup (blocks they depend on live)
    assert pr.count() == 12 and lp.count() == 12
    release_rdd_ids(spark, after_pr | after_lp)
    assert not (persistent_rdd_ids(spark) - before)


def test_checkpoint_tracker_rejects_cross_thread_use(spark):
    """The tracker attributes ids by diffing the SparkContext-global
    persistent-RDD registry, which is only sound single-threaded; the
    contract is enforced (advisor r7 carry) — ckpt from a thread other
    than the construction thread must raise, not silently misattribute
    ids it would later unpersist out from under the other job."""
    import threading

    from big_data_project_jan_2026_tick_data__spark.engine import CheckpointTracker

    tr = CheckpointTracker(spark)
    df = spark.range(10)
    errs: list[Exception] = []

    def use_from_other_thread():
        # release methods must be guarded too (advisor r8): a
        # cross-thread release would unpersist live localCheckpoints —
        # the exact unrecoverable corruption the contract prevents.
        for call in (
            lambda: tr.ckpt(df),
            tr.release_superseded,
            tr.release_all_but_last,
            tr.release_all,
        ):
            try:
                call()
            except Exception as e:  # noqa: BLE001 — asserting the type below
                errs.append(e)

    t = threading.Thread(target=use_from_other_thread)
    t.start()
    t.join()
    assert len(errs) == 4 and all(isinstance(e, RuntimeError) for e in errs)
    # same-thread use still works and cleans up
    out = tr.ckpt(df)
    assert out.count() == 10
    tr.release_all()


def test_association_rules_hand_computed(spark):
    """4 baskets: {A,B,C}, {A,B}, {A,C}, {B,D}. min counts 1 so nothing
    prunes; supports A=3 B=3 C=2 D=1; pairs AB=2 AC=2 BC=1 BD=1.
    conf(A->B)=2/3, lift = (2/3)/(3/4) = 8/9; conf(C->A)=1, lift
    (1)/(3/4)=4/3 — the top rule by lift ties C->A with A? no: lift
    symmetric per pair: AC lift = (2/2)/(3/4) only for C->A."""
    rows = [
        (1, "A"), (1, "B"), (1, "C"),
        (2, "A"), (2, "B"),
        (3, "A"), (3, "C"),
        (4, "B"), (4, "D"),
    ]
    items = spark.createDataFrame(rows, "basket_id int, item string")
    out = graph.association_rules(
        items, min_count=1, min_pair_count=1, top_k=100
    )
    got = {(r.antecedent, r.consequent): r for r in out.collect()}
    # pair AC: n_ab=2, n_A=3, n_C=2, n_baskets=4
    ca = got[("C", "A")]
    assert ca.n_ab == 2 and ca.n_a == 2 and ca.n_b == 3
    assert ca.confidence_q6 == 1.0
    assert ca.lift_q6 == math.floor((2 / 2) / (3 / 4) * 1e6 + 0.5) / 1e6
    assert ca.support_q6 == 0.5
    ab = got[("A", "B")]
    assert ab.confidence_q6 == math.floor(2 / 3 * 1e6 + 0.5) / 1e6
    assert ab.lift_q6 == math.floor((2 / 3) / (3 / 4) * 1e6 + 0.5) / 1e6
    # both directions of every surviving pair are present
    assert ("B", "A") in got and ("D", "B") in got
    # lift ranking: C->A (4/3) and A->C tie at 4/3? A->C conf=2/3,
    # lift=(2/3)/(2/4)=4/3 too; D->B conf 1, lift (1)/(3/4)=4/3.
    top = min(got.values(), key=lambda r: r.rank)
    assert top.lift_q6 == math.floor(4 / 3 * 1e6 + 0.5) / 1e6


def test_association_rules_apriori_prune(spark):
    """min_count=2 removes item D (support 1) before the pair join, so
    no rule mentions D even though the pair (B, D) co-occurs."""
    rows = [
        (1, "A"), (1, "B"),
        (2, "A"), (2, "B"),
        (3, "B"), (3, "D"),
    ]
    items = spark.createDataFrame(rows, "basket_id int, item string")
    out = graph.association_rules(
        items, min_count=2, min_pair_count=2, top_k=100
    ).collect()
    names = {r.antecedent for r in out} | {r.consequent for r in out}
    assert "D" not in names
    assert {("A", "B"), ("B", "A")} == {
        (r.antecedent, r.consequent) for r in out
    }
    # duplicate (basket, item) rows collapse before counting
    dup = spark.createDataFrame(rows + rows, "basket_id int, item string")
    out2 = graph.association_rules(
        dup, min_count=2, min_pair_count=2, top_k=100
    ).collect()
    assert sorted((r.antecedent, r.consequent, r.n_ab) for r in out2) == sorted(
        (r.antecedent, r.consequent, r.n_ab) for r in out
    )
