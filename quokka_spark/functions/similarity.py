"""Similarity search over embedding columns (array<float>).

Parity target: reference vector_nn_join (datastream.py:396-476,
executors/vector_executors.py:3-115) — k-NN of a small probe table
against a big vector stream, two-stage: per-channel top-k then global
reduce. Extension target (BASELINE.json north star): ANN at scale.

Spark formulation:
- ``nn_join`` / ``brute_force_topk``: probe matrix broadcast to every
  task; per-Arrow-batch NumPy matmul emits each probe's LOCAL top-k;
  a window over probe_id reduces to the GLOBAL top-k. Shuffle volume
  is O(num_probes × k × partitions), never the vector stream.
- ``lsh_bucket_topk``: the 100 TB path — random-hyperplane signatures
  bucket both sides; candidates only form within a bucket, so the
  cross product never materializes. Recall < 1 by construction;
  multiple hash tables raise it.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._arrow import list_column_to_matrix, rows_to_matrix


def _collect_probes(probe, vec_column: str, id_column: str):
    if isinstance(probe, DataFrame):
        pdf = probe.select(id_column, vec_column).toPandas()
    else:
        pdf = probe[[id_column, vec_column]]
    ids = pdf[id_column].to_numpy()
    mat, idx = rows_to_matrix(pdf[vec_column].to_numpy())
    return ids[idx], mat


def _train_spherical_centroids(x: np.ndarray, n_cells: int,
                               iters: int = 8) -> np.ndarray:
    """Deterministic spherical k-means on unit vectors: init = first
    ``n_cells`` points, cosine assignment, renormalized mean update.
    Shared by ivf_topk and the ANN fragment index writer so a layout
    written by one is probed identically by the other."""
    cents = x[:n_cells].copy()
    for _ in range(iters):
        assign = (x @ cents.T).argmax(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
    return cents


def brute_force_topk(df: DataFrame, probe, vec_column: str, k: int,
                     id_column: str = "vec_id",
                     probe_id_column: str = "probe_id",
                     probes_collected=None) -> DataFrame:
    """Exact cosine top-k per probe. Deterministic tie-break on id.
    ``probes_collected=(ids, matrix)`` skips the probe-collection job
    when the caller already ran it (ann_index_topk collects probes for
    its fragment-pruning bounds — re-collecting the same rows cost a
    second driver job per call, optimization round 13)."""
    ids, pmat = probes_collected if probes_collected is not None else \
        _collect_probes(probe, vec_column,
                        probe_id_column if probe_id_column in
                        getattr(probe, "columns", []) else id_column)
    pnorm = pmat / np.linalg.norm(pmat, axis=1, keepdims=True)
    sc = df.sparkSession.sparkContext
    b_probes = sc.broadcast((ids, pnorm))
    kk = k

    def local_topk(it):
        import pyarrow as pa
        p_ids, p = b_probes.value
        for batch in it:
            vid = batch.column(id_column).to_numpy(zero_copy_only=False)
            # zero-copy reshape on clean batches; dirty rows dropped
            x, ridx = list_column_to_matrix(batch.column(vec_column),
                                            dim=p.shape[1])
            if x.shape[0] == 0:
                continue
            vid = vid[ridx]
            x = x / np.linalg.norm(x, axis=1, keepdims=True)
            sims = x @ p.T  # (batch, probes)
            take = min(kk, sims.shape[0])
            # per-probe local top-k rows
            idx = np.argpartition(-sims, take - 1, axis=0)[:take]  # (take, probes)
            out_pid, out_vid, out_sim = [], [], []
            for j in range(sims.shape[1]):
                rows = idx[:, j]
                out_pid.extend([p_ids[j]] * len(rows))
                out_vid.extend(vid[rows].tolist())
                out_sim.extend(sims[rows, j].tolist())
            yield pa.RecordBatch.from_pydict({
                probe_id_column: pa.array(out_pid),
                id_column: pa.array(out_vid),
                "cosine_sim": pa.array(out_sim, pa.float64()),
            })

    from ..util import ensure_parallelism
    local = ensure_parallelism(df, id_column).mapInArrow(
        local_topk,
        schema=f"{probe_id_column} long, {id_column} long, cosine_sim double")
    w = Window.partitionBy(probe_id_column).orderBy(
        F.col("cosine_sim").desc(), F.col(id_column).asc())
    return (local.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def nn_join(df: DataFrame, probe, vec_column: str, k: int,
            probe_side: str = "left", id_column: str = "vec_id") -> DataFrame:
    """Reference-parity verb: joins probe rows to their k nearest stream
    rows (cosine). Returns stream id + probe id + similarity + rank."""
    return brute_force_topk(df, probe, vec_column, k, id_column=id_column)


def vector_range_join(left: DataFrame, right: DataFrame,
                      left_vec: str = "embedding", right_vec: str = "embedding",
                      left_id: str = "id1", right_id: str = "id2",
                      threshold: float = 0.8, n_planes: int = 4,
                      n_tables: int = 32, seed: int = 42,
                      dim: int | None = None) -> DataFrame:
    """Similarity range join of two vector STREAMS: all pairs with
    cosine ≥ threshold. The reference declares this verb but left it a
    stub (datastream.py:480-492 `vector_range_join: pass`); this is the
    real thing.

    Plan: hyperplane-LSH signatures on both sides (JVM/Arrow batched),
    shuffle both on (table, signature) — candidates only meet inside a
    bucket — then exact JVM-side cosine filter. Approximate recall
    (more tables → higher), exact precision.

    Pass ``dim`` (vector dimensionality) to keep plan construction
    fully lazy; without it a one-row probe job runs at build time to
    size the hyperplanes."""
    def with_sigs(df, vec, idc, alias):
        dim_probe = dim if dim is not None else \
            df.select(F.size(vec).alias("d")).first()["d"]
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((n_tables, n_planes, dim_probe))
        sc = df.sparkSession.sparkContext
        b = sc.broadcast(planes)

        def sig(it):
            import pyarrow as pa
            pl = b.value
            pow2 = 1 << np.arange(n_planes)
            for batch in it:
                vid = batch.column(idc).to_numpy(zero_copy_only=False)
                x, ridx = list_column_to_matrix(batch.column(vec),
                                                dim=pl.shape[2])
                if x.shape[0] == 0:
                    continue
                vid = vid[ridx]
                xn = x / np.linalg.norm(x, axis=1, keepdims=True)
                s = ((np.einsum("tpd,nd->tnp", pl, xn) > 0) * pow2).sum(axis=2)
                n = len(vid)
                yield pa.RecordBatch.from_pydict({
                    alias: pa.array(np.repeat(vid, n_tables).tolist(), pa.int64()),
                    "table": pa.array(np.tile(np.arange(n_tables), n).tolist(),
                                      pa.int32()),
                    "sig": pa.array(s.T.ravel().tolist(), pa.int64()),
                    f"{alias}_vec": pa.array(xn.repeat(n_tables, axis=0).tolist(),
                                             pa.list_(pa.float64())),
                })

        from ..util import ensure_parallelism
        return ensure_parallelism(df, idc).mapInArrow(
            sig, schema=f"{alias} long, table int, sig long, "
                        f"{alias}_vec array<double>")

    ls = with_sigs(left, left_vec, left_id if left_id in left.columns else
                   left.columns[0], "id1")
    rs = with_sigs(right, right_vec, right_id if right_id in right.columns else
                   right.columns[0], "id2")
    # explicit-width shuffle on the join key: AQE sizes partitions by
    # map-side input bytes and would coalesce this blowup bucket join
    # into one task (same pathology as the embedding-LSH bucket join)
    cores = left.sparkSession.sparkContext.defaultParallelism
    cand = (ls.repartition(cores, "table", "sig")
            .join(rs.repartition(cores, "table", "sig"), ["table", "sig"])
            .dropDuplicates(["id1", "id2"]))
    dot = F.aggregate(F.zip_with("id1_vec", "id2_vec", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    return (cand.withColumn("cosine_sim", F.round(dot, 6))
            .filter(F.col("cosine_sim") >= threshold)
            .select("id1", "id2", "cosine_sim"))


def ivf_topk(df: DataFrame, probe, vec_column: str, k: int,
             id_column: str = "vec_id", n_cells: int = 16, n_probe: int = 4,
             train_size: int = 2048, kmeans_iters: int = 8) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index — the other
    classic ANN scale path next to LSH (``lsh_bucket_topk``).

    Train: k-means centroids on a bounded driver-side sample (the
    ``train_size`` lowest-id vectors — deterministic, and independent
    of total data scale; at 100 TB this is still one TakeOrdered of a
    few thousand rows). Search: centroids broadcast; each stream batch
    assigns its vectors to their nearest cell JVM-side-free in one
    NumPy matmul, and only vectors whose cell is among a probe's
    ``n_probe`` closest cells are scored exactly. Per-partition local
    top-k then one global window — shuffle volume is
    O(probes × k × partitions), the stream itself never shuffles.
    Recall rises with n_probe (n_probe == n_cells ⇒ exact)."""
    probe_ids, pmat = _collect_probes(probe, vec_column, id_column)
    pnorm = pmat / np.linalg.norm(pmat, axis=1, keepdims=True)

    train = (df.select(id_column, vec_column).orderBy(id_column)
             .limit(train_size).toPandas())
    x, _ = rows_to_matrix(train[vec_column].to_numpy(),
                          dim=pmat.shape[1])
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    cents = _train_spherical_centroids(x, n_cells, kmeans_iters)
    # each probe's n_probe nearest cells
    pcells = np.argsort(-(pnorm @ cents.T), axis=1)[:, :n_probe]  # (probes, n_probe)

    sc = df.sparkSession.sparkContext
    b = sc.broadcast((probe_ids, pnorm, cents, pcells))
    kk = k

    def probe_cells(it):
        import pyarrow as pa
        p_ids, p, cc, pc = b.value
        for batch in it:
            vid = batch.column(id_column).to_numpy(zero_copy_only=False)
            v, ridx = list_column_to_matrix(batch.column(vec_column),
                                            dim=cc.shape[1])
            if v.shape[0] == 0:
                continue
            vid = vid[ridx]
            vn = v / np.linalg.norm(v, axis=1, keepdims=True)
            cell = (vn @ cc.T).argmax(axis=1)  # (n,)
            match = (cell[:, None, None] == pc[None, :, :]).any(axis=2)  # (n, probes)
            out_pid, out_vid, out_sim = [], [], []
            for j in range(match.shape[1]):
                rows = np.nonzero(match[:, j])[0]
                if not len(rows):
                    continue
                sims = vn[rows] @ p[j]
                take = min(kk, len(rows))
                best = np.argpartition(-sims, take - 1)[:take]
                out_pid.extend([p_ids[j]] * take)
                out_vid.extend(vid[rows[best]].tolist())
                out_sim.extend(sims[best].tolist())
            yield pa.RecordBatch.from_pydict({
                "probe_id": pa.array(out_pid, pa.int64()),
                id_column: pa.array(out_vid, pa.int64()),
                "cosine_sim": pa.array(out_sim, pa.float64()),
            })

    from ..util import ensure_parallelism
    cand = ensure_parallelism(df, id_column).mapInArrow(
        probe_cells, schema=f"probe_id long, {id_column} long, cosine_sim double")
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_column).asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def lsh_bucket_topk(df: DataFrame, probe, vec_column: str, k: int,
                    id_column: str = "vec_id", n_planes: int = 16,
                    n_tables: int = 4, seed: int = 42) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucketing.

    Each vector gets ``n_tables`` signatures (one per hash table); a
    candidate pair must share a bucket in ≥1 table. Per-bucket
    brute-force then global top-k. At 100 TB the stream is shuffled by
    (table, signature) — bounded buckets, no cross product."""
    probe_ids, pmat = _collect_probes(probe, vec_column, id_column)
    dim = pmat.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    pnorm = pmat / np.linalg.norm(pmat, axis=1, keepdims=True)
    # probe signatures per table
    psig = (np.einsum("tpd,nd->tnp", planes, pnorm) > 0)
    pow2 = 1 << np.arange(n_planes)
    psig_int = (psig * pow2).sum(axis=2)  # (tables, probes)

    sc = df.sparkSession.sparkContext
    b = sc.broadcast((probe_ids, pnorm, planes, psig_int))

    def bucketize(it):
        import pyarrow as pa
        p_ids, p, pl, ps = b.value
        for batch in it:
            vid = batch.column(id_column).to_numpy(zero_copy_only=False)
            x, ridx = list_column_to_matrix(batch.column(vec_column),
                                            dim=pl.shape[2])
            if x.shape[0] == 0:
                continue
            vid = vid[ridx]
            xn = x / np.linalg.norm(x, axis=1, keepdims=True)
            sig = (np.einsum("tpd,nd->tnp", pl, xn) > 0)
            sig_int = (sig * pow2).sum(axis=2)  # (tables, n)
            out_pid, out_vid, out_sim = [], [], []
            for t in range(sig_int.shape[0]):
                # rows whose table-t bucket matches any probe's bucket
                match = sig_int[t][:, None] == ps[t][None, :]  # (n, probes)
                rows, cols = np.nonzero(match)
                if len(rows):
                    sims = np.einsum("ij,ij->i", xn[rows], p[cols])
                    out_pid.extend(p_ids[cols].tolist())
                    out_vid.extend(vid[rows].tolist())
                    out_sim.extend(sims.tolist())
            yield pa.RecordBatch.from_pydict({
                "probe_id": pa.array(out_pid, pa.int64()),
                id_column: pa.array(out_vid, pa.int64()),
                "cosine_sim": pa.array(out_sim, pa.float64()),
            })

    from ..util import ensure_parallelism
    cand = ensure_parallelism(df, id_column).mapInArrow(
        bucketize, schema=f"probe_id long, {id_column} long, cosine_sim double")
    cand = cand.dropDuplicates(["probe_id", id_column])
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_column).asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def quantize_embeddings(df: DataFrame, vec_column: str = "embedding",
                        out: str = "qvec") -> "tuple[DataFrame, float]":
    """Symmetric int8 quantization with one GLOBAL scale: code =
    round(x · 127 / max|x|), stored as ``array<tinyint>`` — the 4×
    (vs float32) storage/shuffle cut that makes a 100 TB embedding
    store tractable, with reconstruction x̂ = code · scale / 127.

    One slim agg finds the scale (max |element| over the corpus);
    the encode itself is a map-side JVM transform, zero Python.
    Every arithmetic step is an exactly-rounded double op (and both
    engines round .5 away from zero), so codes are engine-portable —
    the oracle gate is hash-exact. Returns (df + ``out`` column,
    scale); scale 0 / all-NULL degenerates to zero codes."""
    absmax = F.array_max(F.transform(
        vec_column, lambda x: F.abs(x.cast("double"))))
    scale = df.agg(F.max(absmax)).first()[0] or 0.0
    if scale == 0.0:
        code = F.transform(vec_column,
                           lambda x: F.lit(0).cast("tinyint"))
    else:
        code = F.transform(
            vec_column,
            lambda x: F.round(x.cast("double") * 127.0 / F.lit(scale))
            .cast("tinyint"))
    return df.withColumn(out, code), float(scale)


def dequantize_embeddings(df: DataFrame, qvec_column: str, scale: float,
                          out: str = "embedding") -> DataFrame:
    """Inverse of quantize_embeddings: x̂ = code · scale / 127 as
    ``array<float>`` — map-side, zero exchanges; feeds any of the ANN
    paths (brute force / LSH / IVF) unchanged."""
    return df.withColumn(out, F.transform(
        qvec_column,
        lambda c: (c.cast("double") * F.lit(float(scale)) / F.lit(127.0))
        .cast("float")))
