"""ANN operator properties: IVF degrades to exact search at full probe
width, and pruned probing keeps usable recall on the driver's embeddings
table (reference has no ANN surface — north-star extension per
BASELINE.json; see SURVEY.md §7 step 8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_project_jan_2026_tick_data__spark.operators import similarity


def _load(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return emb, queries


def test_ivf_full_probe_equals_brute_force(spark, sf_dir):
    emb, queries = _load(spark, sf_dir)
    exact = similarity.brute_force_topk(emb, queries, k=10)
    ivf = similarity.ivf_topk(emb, queries, k=10, nlist=8, nprobe=8)
    e = {(r.query_id, r.vec_id, r.rank) for r in exact.collect()}
    i = {(r.query_id, r.vec_id, r.rank) for r in ivf.collect()}
    assert e == i


def test_ivf_pruned_probe_recall(spark, sf_dir):
    emb, queries = _load(spark, sf_dir)
    exact = similarity.brute_force_topk(emb, queries, k=10)
    ivf = similarity.ivf_topk(emb, queries, k=10, nlist=8, nprobe=4)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    i = {(r.query_id, r.vec_id) for r in ivf.collect()}
    # every query probes half the cells; on the synthetic clustered
    # embeddings this should retain at least half the true neighbors
    assert len(e & i) / len(e) >= 0.5


def test_ivf_rank_contract(spark, sf_dir):
    emb, queries = _load(spark, sf_dir)
    out = similarity.ivf_topk(emb, queries, k=10, nlist=8, nprobe=2).collect()
    per_q: dict[int, list] = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
    for rows in per_q.values():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)
