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
                              batch: int = 64) -> DataFrame:
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
