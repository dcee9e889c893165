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
             checkpoint_every: int = 1) -> DataFrame:
    """PageRank over a directed edge list. Returns (node, rank).

    Dangling nodes (no out-edges) are supported: their rank mass is
    redistributed uniformly each iteration (standard formulation).
    The dangling mass is folded INTO the iteration's plan — every
    non-dangling node distributes exactly its rank across its
    out-edges, so dangling mass = sum(ranks) − sum(contributions),
    both tiny one-row aggregates cross-joined (broadcast) into the
    rank update. No per-iteration driver collect, no re-execution of
    the rank lineage: ONE job per checkpointed iteration (the r4
    review's finding — the old formulation ran a second anti-join
    job per iteration whose cost grew with lineage depth).

    The rank vector localCheckpoints every ``checkpoint_every``
    iterations (default: every one) — the vector is O(nodes) rows,
    cheap to materialize at any scale — truncating the plan so long
    runs don't replan an ever-deeper tree."""
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
    # only carry the mass terms through the plan when they exist
    has_dangling = n > deg.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for it in range(iters):
        contrib = (e.join(deg, "src")
                   .join(ranks.withColumnRenamed("node", "src"), "src")
                   .groupBy(F.col("dst").alias("node"))
                   .agg(F.sum(F.col("rank") / F.col("outd")).alias("c")))
        base = nodes.join(contrib, "node", "left")
        if has_dangling:
            # scalars stay in-plan: 1-row aggregates broadcast via
            # cross join (Catalyst reuses contrib's shuffle between
            # the agg and the join — one execution inside one job)
            scalars = (ranks.agg(F.sum("rank").alias("__t__"))
                       .crossJoin(contrib.agg(
                           F.coalesce(F.sum("c"), F.lit(0.0))
                           .alias("__sc__"))))
            ranks = (base.crossJoin(F.broadcast(scalars))
                     .select("node",
                             (F.lit((1.0 - damping) / n) + F.lit(damping) *
                              (F.coalesce(F.col("c"), F.lit(0.0))
                               + (F.col("__t__") - F.col("__sc__"))
                               / F.lit(float(n)))).alias("rank")))
        else:
            ranks = base.select(
                "node",
                (F.lit((1.0 - damping) / n) + F.lit(damping) *
                 F.coalesce(F.col("c"), F.lit(0.0))).alias("rank"))
        # truncate lineage; this materialization is the iteration's
        # ONLY job (nothing above collects)
        if (it + 1) % checkpoint_every == 0 and it < iters - 1:
            ranks = ranks.localCheckpoint()
    return ranks


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iters: int = 50,
                         checkpoint_every: int = 5,
                         driver_edge_limit: int = 5_000_000) -> DataFrame:
    """Connected components by iterative min-label propagation (the
    "hash-to-min" family): every node's label starts as itself; each
    round a node adopts the minimum label in its closed neighborhood;
    stop when no label changed. Returns (node, component) with
    component = min node id of the component.

    **Driver fast path**: only docs appearing in a near-dup PAIR enter
    the computation, and that pair set is tiny relative to the corpus
    (per-mille of rows even in dirty crawls). When the edge count fits
    ``driver_edge_limit``, the edges collect to the driver and a
    path-compressed union-find labels them in microseconds — the same
    bounded-driver precedent as IVF training and BPE merges. The
    distributed loop below is the overflow path (test-pinned equal).

    Distributed scale shape: the edge list persists once (symmetrized,
    deduped); each round is one join (labels onto edges, shuffle on
    node) + one min-aggregation (shuffle on neighbor). Per-round state
    is O(nodes) label rows; rounds needed = graph diameter (near-dup
    clusters are shallow — duplicate groups have tiny diameters, so
    3-5 rounds close real corpora). The convergence check is a count
    of changed labels (cheap agg). Lineage is truncated every
    ``checkpoint_every`` rounds like pagerank's loop."""
    from pyspark.storagelevel import StorageLevel
    e = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
         .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
         .distinct().persist(StorageLevel.MEMORY_AND_DISK))
    if driver_edge_limit and e.count() <= driver_edge_limit:
        rows = e.collect()
        parent: dict = {}

        def find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:       # path compression
                parent[x], x = root, parent[x]
            return root

        for r in rows:
            ra, rb = find(r["a"]), find(r["b"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp: dict = {}
        for r in rows:
            n = r["a"]
            comp.setdefault(find(n), []).append(n)
        out = [(n, min(members))
               for root, members in comp.items() for n in set(members)]
        spark = edges.sparkSession
        # id-type-agnostic like the distributed loop: the output schema
        # follows the (symmetrized) edge column type, so string doc ids
        # (e.g. phash_near_pairs' filename default) work on this path too
        from pyspark.sql.types import StructField, StructType
        node_type = e.schema["a"].dataType
        out_schema = StructType([StructField("node", node_type, False),
                                 StructField("component", node_type, False)])
        e.unpersist()
        return spark.createDataFrame(out, out_schema)
    labels = (e.select(F.col("a").alias("node")).distinct()
              .withColumn("component", F.col("node")))
    for it in range(max_iters):
        if it and it % checkpoint_every == 0:
            labels = labels.localCheckpoint()
        # min label over closed neighborhood: own label ∪ neighbors'
        nbr = (e.join(labels.withColumnRenamed("node", "a"), "a")
               .select(F.col("b").alias("node"), "component"))
        new = (labels.unionByName(nbr)
               .groupBy("node").agg(F.min("component").alias("component")))
        changed = (new.join(labels.withColumnRenamed("component", "old"),
                            "node")
                   .filter(F.col("component") != F.col("old")).count())
        labels = new
        if changed == 0:
            break
    return labels


def dedup_components(pairs: DataFrame, id1: str = "id1", id2: str = "id2",
                     max_iters: int = 50) -> DataFrame:
    """The pairs→clusters→canonical step that closes a production
    near-dup pipeline: near-duplicate PAIRS (from minhash/simhash/
    embedding LSH) are edges; transitively connected docs form one
    duplicate group; the canonical survivor is the min id. Returns
    (doc_id, canonical_id, is_canonical) for every doc that appears
    in at least one pair (docs with no near-dup are trivially their
    own canonical and never enter the shuffle)."""
    comp = connected_components(pairs, src=id1, dst=id2,
                                max_iters=max_iters)
    return comp.select(F.col("node").alias("doc_id"),
                       F.col("component").alias("canonical_id"),
                       (F.col("node") == F.col("component"))
                       .alias("is_canonical"))
