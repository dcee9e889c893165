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
                              batch: int = 128,
                              sample_rows: int | None = None,
                              rank_bounds: bool = False) -> DataFrame:
    """Wide approximate quantiles as a DataFrame (one row per column) —
    the shape that completes (and stays fast) at 10k columns where a
    single plan carrying every aggregate falls over (BASELINE target 3,
    reference blog/approxquant.md:19-31, t-digest per channel).

    Formulation: an Arrow-batched NumPy sketch. Each partition buffers
    column-stacked batches up to a bounded row budget, compresses the
    buffer into ``accuracy`` equi-spaced order statistics per column
    (one vectorized ``np.sort`` covers every column), and merges
    summaries by weighted rank at partition end. One summary row per
    (partition, column) crosses the shuffle — ``accuracy`` doubles each
    — and a per-column weighted merge emits the final quantiles. Rank
    error ≈ 1/(2·accuracy); per-partition memory is bounded regardless
    of row count, and the value stream is sorted at NumPy speed instead
    of per-value JVM sketch inserts (~20x at 100 columns).

    ``sample_rows``: at extreme row×column products the JVM→Arrow
    transfer of every value dominates (not the sketch); passing e.g.
    ``10_000_000`` applies a JVM-side Bernoulli row sample before the
    sketch, bounding transfer while adding ~sqrt(q(1-q)/m) rank error —
    the same sampling escape the reference's approximate_quantile
    exposes (reference datastream.py:1001-1031). None = exact pass.

    ``rank_bounds``: additionally emit, per quantile ``q``, columns
    ``ltl_q`` / ``leu_q`` — a lower bound on count(< value) and an
    upper bound on count(<= value) — derived IN THE SAME merge from
    each summary's order-stat positions (candidate j of a summary
    with per-sample weight w sits at rank ``floor((j+0.5)·w)`` of its
    partition, so the candidates bracketing the chosen value bound
    its rank exactly at the first compression level, and to within
    one extra n/accuracy at deeper merge levels). This is what lets a
    verdict gate check the result's rank WITHOUT a second corpus
    pass (the former rank_counts_wide re-scan)."""
    k = len(columns)
    if sample_rows is not None:
        total = df.count()
        if total > sample_rows:
            df = df.sample(fraction=sample_rows / total, seed=42)
    S = max(int(accuracy), 16)
    # buffer budget: enough rows that compression is infrequent, capped
    # so a 10k-wide partition stays ~tens of MB
    limit = max(S * 2, 4_000_000 // max(k, 1))

    def _compress_raw(mat):
        """(n, k) raw values → (S', k) order-stat samples + per-column
        weight vector (valid-count / samples). NaNs (nulls) sort last
        and are excluded via per-column valid counts."""
        n = mat.shape[0]
        sv = np.sort(mat, axis=0)
        nvalid = n - np.isnan(mat).sum(axis=0)
        s_eff = min(S, n)
        pos = (np.arange(s_eff, dtype=np.float64)[:, None] + 0.5) / s_eff
        idx = np.minimum((pos * nvalid[None, :]).astype(np.int64),
                         np.maximum(nvalid - 1, 0)[None, :])
        return np.take_along_axis(sv, idx, axis=0), nvalid / s_eff

    def _merge_summaries(summaries):
        """Weighted-rank merge of [(S_i×k values, (k,) weights)] back to
        ≤S samples per column; one argsort call covers every column."""
        vals = np.vstack([v for v, _ in summaries])
        wts = np.vstack([np.tile(w, (v.shape[0], 1)) for v, w in summaries])
        order = np.argsort(vals, axis=0, kind="stable")
        sv = np.take_along_axis(vals, order, axis=0)
        sw = np.take_along_axis(wts, order, axis=0)
        cw = np.cumsum(sw, axis=0)
        total = cw[-1]
        s_eff = min(S, vals.shape[0])
        pos = (np.arange(s_eff, dtype=np.float64) + 0.5) / s_eff
        out = np.empty((s_eff, k))
        for j in range(k):
            idx = np.searchsorted(cw[:, j], pos * total[j], side="left")
            out[:, j] = sv[np.minimum(idx, vals.shape[0] - 1), j]
        return out, total / s_eff

    def _stack_fortran(batches):
        """Column-major stack so the per-column sorts below run over
        contiguous memory (a C-order column_stack makes axis-0 sorts
        stride k doubles per element — ~5x slower at k=1000)."""
        n = sum(b.shape[0] for b in batches)
        out = np.empty((n, k), order="F")
        r = 0
        for b in batches:
            out[r:r + b.shape[0], :] = b
            r += b.shape[0]
        return out

    def part(it):
        import pyarrow as pa
        summaries, buf, buf_rows = [], [], 0
        for b in it:
            x = np.column_stack(
                [b.column(c).to_numpy(zero_copy_only=False) for c in columns]
            )
            buf.append(x)
            buf_rows += x.shape[0]
            if buf_rows >= limit:
                summaries.append(_compress_raw(_stack_fortran(buf)))
                buf, buf_rows = [], 0
        if buf:
            summaries.append(_compress_raw(_stack_fortran(buf)))
        if not summaries:
            return
        vals, w = (summaries[0] if len(summaries) == 1
                   else _merge_summaries(summaries))
        s_eff = vals.shape[0]
        flat = pa.array(np.ascontiguousarray(vals.T).ravel(), pa.float64())
        offsets = pa.array(np.arange(k + 1, dtype=np.int32) * s_eff)
        yield pa.RecordBatch.from_arrays(
            [pa.array(columns, pa.string()),
             pa.ListArray.from_arrays(offsets, flat),
             pa.array(w, pa.float64())],
            names=["column", "vals", "w"])

    from ..util import ensure_parallelism
    partials = ensure_parallelism(df.select(*columns)).mapInArrow(
        part, schema="column string, vals array<double>, w double")

    qnames = ["q" + str(p).replace(".", "_") for p in probs]

    def merge(pdf):
        import pandas as pd
        vals = np.concatenate([np.asarray(v) for v in pdf["vals"]])
        wts = np.concatenate([np.full(len(v), w)
                              for v, w in zip(pdf["vals"], pdf["w"])])
        order = np.argsort(vals, kind="stable")
        sv, cw = vals[order], np.cumsum(wts[order])
        idx = np.minimum(np.searchsorted(cw, np.asarray(probs) * cw[-1],
                                         side="left"), len(sv) - 1)
        row = [pdf["column"].iloc[0]] + sv[idx].tolist()
        if rank_bounds:
            for v in sv[idx]:
                lo = hi = 0.0
                for vlist, w in zip(pdf["vals"], pdf["w"]):
                    arr = np.asarray(vlist)
                    c_lt = int(np.searchsorted(arr, v, side="left"))
                    c_le = int(np.searchsorted(arr, v, side="right"))
                    if c_lt > 0:
                        # largest candidate < v sits at local rank
                        # floor((c_lt-0.5)·w); at least that many + 1
                        # values are <= it, hence < v... conservatively
                        lo += np.floor((c_lt - 0.5) * w) + 1
                    if c_le < len(arr):
                        # smallest candidate > v bounds count(<= v)
                        hi += np.floor((c_le + 0.5) * w)
                    else:
                        hi += len(arr) * w
                row += [float(lo), float(hi)]
        return pd.DataFrame([row], columns=list(out_cols))

    out_cols = ["column"] + qnames
    out_schema = "column string, " + ", ".join(f"{q} double" for q in qnames)
    if rank_bounds:
        extra = [b for q in qnames for b in (f"ltl_{q}", f"leu_{q}")]
        # quantile-major then bound type? keep (ltl, leu) pairs grouped
        # per quantile IN PROB ORDER appended after the quantiles
        out_cols += extra
        out_schema += ", " + ", ".join(f"{c} double" for c in extra)
    return partials.groupBy("column").applyInPandas(merge, out_schema)


def rank_counts_wide(df: DataFrame, columns: list, thresholds: dict):
    """Exact rank counts for many (column, threshold) pairs in ONE
    vectorized Arrow pass — the verification companion to
    ``approximate_quantile_wide`` (expressing 2·cols·probs conditional
    aggregates as JVM ``sum(when(...))`` explodes codegen at width;
    this kernel is a single NumPy broadcast compare per batch).

    ``thresholds``: {column: [v0, v1, ...]} (same length per column).
    Returns {column: (lt_counts, le_counts)} with counts as int lists
    aligned to the threshold list. Partials are (partitions × cols)
    tiny rows reduced driver-side — bounded regardless of row count.
    NaN/NULL values compare False on both sides (excluded), matching
    the sketch's valid-count semantics."""
    k = len(columns)
    m = len(next(iter(thresholds.values())))
    V = np.asarray([[float(thresholds[c][j]) for j in range(m)]
                    for c in columns])  # (k, m)

    def part(it):
        import pyarrow as pa
        lt = np.zeros((k, m), np.int64)
        le = np.zeros((k, m), np.int64)
        got = False
        for b in it:
            got = True
            x = np.column_stack(
                [b.column(c).to_numpy(zero_copy_only=False)
                 for c in columns])  # (n, k)
            with np.errstate(invalid="ignore"):
                lt += (x[:, :, None] < V[None, :, :]).sum(axis=0)
                le += (x[:, :, None] <= V[None, :, :]).sum(axis=0)
        if not got:
            return
        yield pa.RecordBatch.from_pydict({
            "column": pa.array(columns, pa.string()),
            "lt": pa.array([r.tolist() for r in lt],
                           pa.list_(pa.int64())),
            "le": pa.array([r.tolist() for r in le],
                           pa.list_(pa.int64())),
        })

    rows = (df.select(*columns)
            .mapInArrow(part,
                        schema="column string, lt array<long>, le array<long>")
            .collect())
    out = {c: (np.zeros(m, np.int64), np.zeros(m, np.int64))
           for c in columns}
    for r in rows:
        lt, le = out[r["column"]]
        lt += np.asarray(r["lt"], np.int64)
        le += np.asarray(r["le"], np.int64)
    return {c: (lt.tolist(), le.tolist()) for c, (lt, le) in out.items()}


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


def matmul_coo(a: DataFrame, b: DataFrame,
               i: str = "i", k: str = "k", j: str = "j",
               val: str = "val") -> DataFrame:
    """Distributed sparse matrix multiply over coordinate-form inputs:
    ``A(i, k, val) × B(k, j, val) → C(i, j, val)``.

    The reference implements matmul as a blocked TaskGraph with
    hand-written range partition functions on both inputs
    (apps/unstable/matmul.py:16-46). The Spark-first formulation is
    the classic relational one: join on the contraction index, then
    groupBy the output coordinates — C[i,j] = Σ_k A[i,k]·B[k,j].

    Scale shape: one shuffle of each input on ``k`` for the join
    (AQE picks broadcast when one matrix is small and handles hot-k
    skew), one partial-agged shuffle on (i, j) for the sum. Dense
    blocks stay dense inside partitions via whole-stage codegen — no
    Python in the path. Zero entries should be pre-filtered from the
    COO inputs; they only cost work, never correctness."""
    an = a.select(F.col(i).alias("__i__"), F.col(k).alias("__k__"),
                  F.col(val).alias("__va__"))
    bn = b.select(F.col(k).alias("__k__"), F.col(j).alias("__j__"),
                  F.col(val).alias("__vb__"))
    return (an.join(bn, "__k__")
            .groupBy("__i__", "__j__")
            .agg(F.sum(F.col("__va__") * F.col("__vb__")).alias(val))
            .withColumnRenamed("__i__", i).withColumnRenamed("__j__", j))


def _logreg_z(weights: "list[float]", feature_cols: "list[str]"):
    z = F.lit(float(weights[0]))
    for w, c in zip(weights[1:], feature_cols):
        z = z + F.lit(float(w)) * F.col(c)
    return z


def logreg_train(df: DataFrame, feature_cols: "list[str]", label_col: str,
                 lr: float = 1.0, iters: int = 5) -> "list[float]":
    """Full-batch gradient descent for logistic regression — the
    trainable half of a corpus quality classifier (fastText-style:
    fit weak labels such as "looks like curated text" on cheap
    features, then score and threshold the whole corpus).

    Deterministic: zero-init weights, fixed learning rate and
    iteration count; the gradient is a mean over ALL rows, so the
    result is a pure function of the data (no sampling, no seed).

    The idiomatic Spark iterative shape (same as kmeans): weights are
    O(k) driver-side literals compiled into a JVM expression; each
    iteration is ONE whole-stage-codegen aggregate with map-side
    partial sums — k+1 scalars cross the wire per partition, the
    feature stream itself never shuffles. Any iteration count works
    at 100 TB. Returns [intercept, w_1, …, w_k]."""
    n = len(feature_cols)
    feats = df.select(
        F.col(label_col).cast("double").alias("__y__"),
        *[F.col(c).cast("double").alias(f"__x{i}__")
          for i, c in enumerate(feature_cols)]).persist()
    xcols = [f"__x{i}__" for i in range(n)]
    try:
        w = [0.0] * (n + 1)
        for _ in range(iters):
            resid = (F.lit(1.0) / (F.lit(1.0) + F.exp(-_logreg_z(w, xcols)))
                     - F.col("__y__"))
            row = feats.agg(
                F.avg(resid).alias("g0"),
                *[F.avg(resid * F.col(c)).alias(f"g{i + 1}")
                  for i, c in enumerate(xcols)]).first()
            w = [w[j] - lr * float(row[f"g{j}"]) for j in range(n + 1)]
    finally:
        feats.unpersist()
    return w


def logreg_score(df: DataFrame, feature_cols: "list[str]",
                 weights: "list[float]", out: str = "score") -> DataFrame:
    """Score rows with trained weights: sigmoid(w·[1, x]) as a pure
    map-side JVM expression — zero exchanges, pipelines with the scan
    at any scale (the corpus-filtering pass of the quality
    classifier)."""
    if len(weights) != len(feature_cols) + 1:
        raise ValueError(f"need {len(feature_cols) + 1} weights "
                         f"(intercept first), got {len(weights)}")
    z = _logreg_z(weights, feature_cols)
    return df.withColumn(out, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))
