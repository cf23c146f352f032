"""Graph analytics over DataFrame edge lists.

Connected components (min-label propagation) lives with the dedup
family (``dedup.dup_clusters``); this module holds the rank/centrality
side. Spark-first: every iteration is ONE edge-partitioned equi-join +
ONE destination-keyed aggregate — the Pregel superstep expressed as
DataFrame ops, no RDDs, no driver-side adjacency.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _q9(c):
    return F.floor(c * 1e9 + F.lit(0.5)) / 1e9


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str | None = None,
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """Weighted PageRank on a directed edge list — the centrality
    primitive behind "which page/state/entity matters" over transition
    graphs (pairs with ``stats.transition_matrix``, whose counts are a
    ready-made weighted edge list).

    Per iteration: contributions = ranks ⋈ edges on ``src`` (edge-
    partitioned equi-join; the rank table is node-sized, the edge table
    never re-shuffles once partitioned by src) → sum per ``dst`` (one
    hash agg) → add the teleport term and the dangling-node mass
    (nodes with no out-edges redistribute uniformly; their total is a
    scalar agg, corpus-size-independent). Ranks are q9-quantized every
    iteration — the kmeans/classifier determinism discipline — so
    float-sum ordering cannot drift between engines or partitionings.

    Each superstep ends in ``localCheckpoint`` (cf. dedup.dup_clusters):
    the rank frame is referenced twice next round (contributions AND the
    dangling-mass scalar), so without lineage truncation the lazy plan
    doubles per iteration. Returns (node, rank_q6).
    """
    w = F.col(weight).cast("double") if weight else F.lit(1.0)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"), w.alias("w"))
    out_tot = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # edge transition fraction: exact same two numbers in any engine
    frac = e.join(out_tot, "src").select(
        "src", "dst", (F.col("w") / F.col("out_w")).alias("p")
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn("rank_q6", F.lit(0.0))
    base = (1.0 - damping) / n_nodes
    init = math.floor(1.0 / n_nodes * 1e9 + 0.5) / 1e9
    ranks = nodes.withColumn("rank", F.lit(init))
    # frac/nodes are re-read every superstep — pin them once
    frac = frac.localCheckpoint()
    nodes = nodes.localCheckpoint()
    has_out = out_tot.select(F.col("src").alias("node"))
    for _ in range(iters):
        contrib = (
            ranks.join(frac, ranks["node"] == frac["src"])
            .select(F.col("dst").alias("node"), (F.col("rank") * F.col("p")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        dangling = (
            ranks.join(has_out, "node", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                _q9(
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("dm") / n_nodes)
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select(
        "node", (F.floor(F.col("rank") * 1e6 + F.lit(0.5)) / 1e6).alias("rank_q6")
    )
