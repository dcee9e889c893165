"""Iterative graph operators.

Parity target: reference apps/unstable/pagerank.py — per-iteration
SpMV expressed there as a custom join+groupby Executor over the old
runtime. Spark-first shape: the edge list (with out-degrees) persists
once; each iteration is one join + one aggregation — contributions
shuffle on dst, the rank vector is O(nodes) rows. Any iteration count
works at 100 TB; the driver loop only ever touches DataFrame handles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             iters: int = 3, damping: float = 0.85,
             checkpoint_every: int = 10) -> DataFrame:
    """PageRank over a directed edge list. Returns (node, rank).

    Dangling nodes (no out-edges) are supported: their rank mass is
    redistributed uniformly each iteration (standard formulation)."""
    from pyspark.storagelevel import StorageLevel
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().persist(StorageLevel.MEMORY_AND_DISK))
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outd")) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    # dangling nodes (no out-edges) are a static property of the graph;
    # only pay the per-iteration mass collect when they exist
    has_dangling = n > deg.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(iters):
        # each iteration stacks a join+agg on the rank lineage; truncate
        # it periodically so long runs don't replan an ever-deeper tree
        if it and it % checkpoint_every == 0:
            ranks = ranks.localCheckpoint()
        contrib = (e.join(deg, "src")
                   .join(ranks.withColumnRenamed("node", "src"), "src")
                   .groupBy(F.col("dst").alias("node"))
                   .agg(F.sum(F.col("rank") / F.col("outd")).alias("c")))
        d = 0.0
        if has_dangling:
            # rank mass held by dangling nodes, redistributed uniformly
            d = (ranks.join(deg.withColumnRenamed("src", "node"),
                            "node", "left_anti")
                 .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d"))
                 .collect()[0]["d"])
        ranks = (nodes.join(contrib, "node", "left")
                 .select("node",
                         (F.lit((1.0 - damping) / n) + F.lit(damping) *
                          (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(d / n))
                          ).alias("rank")))
    return ranks
