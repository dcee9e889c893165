"""Gramian / covariance over numeric columns.

Parity target: reference datastream.py:1033-1147 (gramian, covariance):
NumPy X^T·X per batch + a tree of Add executors. Spark formulation:
``mapInArrow`` computes a k×k partial per partition (NumPy matmul over
the Arrow batch — the identical kernel), each partial is emitted as one
flattened row, and a single global sum reduces them. Only k² floats per
partition cross the wire; the scan parallelizes like any other.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _partial_gramians(df: DataFrame, columns: list):
    """DataFrame of one row per partition: n (rows), s (col sums), g
    (flattened partial X^T·X)."""
    k = len(columns)

    def part(it):
        import pyarrow as pa
        total = np.zeros((k, k), dtype=np.float64)
        sums = np.zeros(k, dtype=np.float64)
        n = 0
        for batch in it:
            x = np.column_stack(
                [batch.column(c).to_numpy(zero_copy_only=False) for c in columns]
            ).astype(np.float64)
            total += x.T @ x
            sums += x.sum(axis=0)
            n += x.shape[0]
        yield pa.RecordBatch.from_pydict({
            "n": pa.array([n], pa.int64()),
            "s": pa.array([sums.tolist()], pa.list_(pa.float64())),
            "g": pa.array([total.ravel().tolist()], pa.list_(pa.float64())),
        })

    from ..util import ensure_parallelism
    return ensure_parallelism(df.select(*columns)).mapInArrow(
        part, schema="n long, s array<double>, g array<double>")


def _reduce_partials(partials: DataFrame, k: int):
    row = partials.select(
        F.sum("n").alias("n"),
        *[F.sum(F.element_at("s", i + 1)).alias(f"s{i}") for i in range(k)],
        *[F.sum(F.element_at("g", i + 1)).alias(f"g{i}") for i in range(k * k)],
    ).collect()[0]
    n = row["n"]
    sums = np.array([row[f"s{i}"] for i in range(k)])
    gram = np.array([row[f"g{i}"] for i in range(k * k)]).reshape(k, k)
    return n, sums, gram


def gramian(df: DataFrame, columns: list, demean: bool = False) -> np.ndarray:
    k = len(columns)
    n, sums, gram = _reduce_partials(_partial_gramians(df, columns), k)
    if demean:
        mu = sums / n
        gram = gram - n * np.outer(mu, mu)
    return gram


def covariance(df: DataFrame, columns: list) -> np.ndarray:
    """Sample covariance (ddof=1), matching DuckDB/numpy covar_samp."""
    k = len(columns)
    n, sums, gram = _reduce_partials(_partial_gramians(df, columns), k)
    mu = sums / n
    return (gram - n * np.outer(mu, mu)) / (n - 1)


def approximate_quantile_wide(df: DataFrame, columns: list, probs: list,
                              accuracy: int = 10000,
                              batch: int = 128) -> DataFrame:
    """Wide approximate quantiles as a DataFrame (one row per column) —
    the shape that completes at 10k columns where a single plan carrying
    every aggregate falls over (BASELINE target 3, reference
    blog/approxquant.md:19-31). Columns are batched into independent
    aggregations (mergeable percentile_approx sketches, map-side
    partials) and stacked long; batches are separate jobs, so plan
    width stays bounded regardless of column count."""
    outs = []
    for i in range(0, len(columns), batch):
        grp = columns[i:i + batch]
        arr = F.array(*[F.lit(p) for p in probs])
        agg = df.agg(*[F.percentile_approx(c, arr, accuracy).alias(c)
                       for c in grp])
        stack_args = ", ".join(f"'{c}', `{c}`" for c in grp)
        outs.append(agg.selectExpr(
            f"stack({len(grp)}, {stack_args}) as (column, qs)"))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.select(
        "column", *[F.col("qs").getItem(j).alias(
            "q" + str(p).replace(".", "_")) for j, p in enumerate(probs)])


def kmeans(df: DataFrame, vec_col: str, id_col: str, k: int = 8,
           iters: int = 5) -> "tuple[np.ndarray, DataFrame]":
    """Distributed Lloyd's k-means over a vector column (reference ships
    this as an app, apps/vectors/kmeans.py — here it is an operator).

    The idiomatic Spark iterative shape: per iteration, centroids
    (k×dim, tiny) broadcast to an Arrow-batched assign+partial-sum
    kernel; only (cluster, count, sum-vector) partials — k rows per
    partition — cross the shuffle; the driver reduces them and loops.
    The vector stream itself never shuffles, any iteration count works
    at 100 TB. Deterministic init: the k lowest-id vectors.

    Returns (centroids, assignment DataFrame(id, cluster))."""
    init = (df.select(id_col, vec_col).orderBy(id_col).limit(k).toPandas())
    cents = np.stack(init[vec_col].to_numpy()).astype(np.float64)
    sc = df.sparkSession.sparkContext

    def make_kernel(b, emit_partials):
        def kernel(it):
            import pyarrow as pa
            cc = b.value
            for batch in it:
                ids = batch.column(id_col).to_numpy(zero_copy_only=False)
                x = np.stack(batch.column(vec_col).to_pylist()).astype(np.float64)
                d = ((x[:, None, :] - cc[None, :, :]) ** 2).sum(axis=2)
                assign = d.argmin(axis=1)
                if emit_partials:
                    clusters, counts = np.unique(assign, return_counts=True)
                    sums = np.stack([x[assign == c].sum(axis=0)
                                     for c in clusters])
                    yield pa.RecordBatch.from_pydict({
                        "cluster": pa.array(clusters.tolist(), pa.int32()),
                        "n": pa.array(counts.tolist(), pa.int64()),
                        "vsum": pa.array(sums.tolist(),
                                         pa.list_(pa.float64())),
                    })
                else:
                    yield pa.RecordBatch.from_pydict({
                        id_col: pa.array(ids.tolist(), pa.int64()),
                        "cluster": pa.array(assign.tolist(), pa.int32()),
                    })
        return kernel

    dim = cents.shape[1]
    for _ in range(iters):
        b = sc.broadcast(cents)
        partials = df.select(id_col, vec_col).mapInArrow(
            make_kernel(b, True),
            schema="cluster int, n long, vsum array<double>")
        rows = (partials.groupBy("cluster")
                .agg(F.sum("n").alias("n"),
                     *[F.sum(F.element_at("vsum", i + 1)).alias(f"s{i}")
                       for i in range(dim)])
                .collect())
        for r in rows:
            c = r["cluster"]
            cents[c] = np.array([r[f"s{i}"] for i in range(dim)]) / r["n"]
    b = sc.broadcast(cents)
    assign = df.select(id_col, vec_col).mapInArrow(
        make_kernel(b, False), schema=f"{id_col} long, cluster int")
    return cents, assign
