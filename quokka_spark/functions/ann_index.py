"""ANN probe pushdown into the lancelike vector source.

Parity target: the reference's ``__push_ann__`` optimizer pass
(reference df.py:1264-1352 + logical.py:615-656): when a
``vector_nn_join``'s vector column traces straight back to a lance
scan, the probe vectors and k are pushed INTO the source node so the
scan only reads index-selected fragments instead of the whole dataset.

Spark-first counterpart, two halves:

**Layout** (:func:`write_ann_index`) — one-time, at ingest/compaction
boundaries like ``write_parquet(zorder=)``: vectors are clustered into
fragments by deterministic spherical k-means (the same trainer as
``ivf_topk``), written as one parquet directory per fragment
(``__frag__=N/`` — still a plain lancelike fragment layout, every
other reader keeps working), plus a tiny JSON sidecar holding each
fragment's centroid, its cone angle (max angle of any member to the
centroid), and its row count. The heavy work is one bounded driver
train + one assignment pass + one JVM-side stats aggregation; at
100 TB the sidecar is still O(fragments × dim) — kilobytes.

**Probe-time pruning** (:func:`ann_index_topk`) — EXACT top-k that
decides which fragments to read ENTIRELY AT PLAN TIME, from the
sidecar alone, then runs ONE brute-force job over the survivors:

1. upper bound: for probe p and fragment f with centroid angle θ_pf
   and cone angle θ_f, every member similarity is
   ≤ cos(max(0, θ_pf − θ_f)) (angular triangle inequality);
2. guaranteed floor: the sidecar stores a few REAL member vectors per
   fragment ("pivots"); the k-th best pivot similarity is a true
   lower bound on the final k-th-best answer, because every pivot is
   an actual candidate;
3. a fragment is pruned when its bound is STRICTLY below the floor —
   then every member is strictly worse than k existing candidates
   and cannot enter the top-k even via the id tie-break.

The result is bit-identical to ``brute_force_topk`` over the full
dataset (ties included). On clustered corpora most fragments prune;
on adversarially uniform vectors nothing prunes and the plan
degenerates to the SAME single full scan as the unindexed path (plus
a sidecar read) — never slower asymptotically, never wrong. No
priming scan, no second job, no mid-query driver collect: the only
Spark job is the pruned scan itself.

``DataStream.vector_nn_join`` routes here automatically when its
input is an unmodified ``read_lance`` scan of an indexed layout — the
same "the verb disappears into the source" behavior as the
reference's pass. Any intermediate transform drops the provenance and
the broadcast brute-force path runs instead.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._arrow import list_column_to_matrix, rows_to_matrix

_SIDECAR = "_ann_index.json"


def has_ann_index(path: str) -> bool:
    return os.path.isfile(os.path.join(path, _SIDECAR))


def write_ann_index(df: DataFrame, path: str, vec_column: str = "embedding",
                    id_column: str = "vec_id", n_fragments: int = 16,
                    train_size: int = 2048, kmeans_iters: int = 8,
                    n_pivots: int = 8) -> dict:
    """Write ``df`` as a cluster-partitioned lancelike fragment layout
    with the ANN sidecar. Returns the sidecar dict.

    Invalid vectors (NULL, NULL element, ragged) land in fragment -1:
    still stored (the layout is lossless, full scans see them) but
    excluded from the index — they can never be a nearest neighbor, so
    the probe path never reads them.
    """
    from .similarity import _train_spherical_centroids
    train = (df.select(id_column, vec_column).orderBy(id_column)
             .limit(train_size).toPandas())
    x, _ = rows_to_matrix(train[vec_column].to_numpy())
    if x.shape[0] == 0:
        raise ValueError("write_ann_index: no valid vectors to train on")
    dim = x.shape[1]
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    cents = _train_spherical_centroids(x, min(n_fragments, len(x)),
                                       kmeans_iters)

    sc = df.sparkSession.sparkContext
    b_cents = sc.broadcast(cents)
    cols = df.columns
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["__frag__ int"])

    def assign(it):
        import pyarrow as pa
        cc = b_cents.value
        for batch in it:
            v, ridx = list_column_to_matrix(batch.column(vec_column),
                                            dim=cc.shape[1])
            frag = np.full(batch.num_rows, -1, np.int32)
            if v.shape[0]:
                vn = v / np.linalg.norm(v, axis=1, keepdims=True)
                good = ~np.isnan(vn).any(axis=1)
                cells = (vn @ cc.T).argmax(axis=1).astype(np.int32)
                frag[ridx[good]] = cells[good]
            yield pa.RecordBatch.from_arrays(
                list(batch.columns) + [pa.array(frag, pa.int32())],
                cols + ["__frag__"])

    assigned = df.mapInArrow(assign, schema=out_schema)
    (assigned.write.mode("overwrite").partitionBy("__frag__").parquet(path))

    # cone stats from the WRITTEN layout (one JVM-only aggregation —
    # cos to the fragment's centroid via a literal centroid table,
    # no Python in the pass): min cos == cos of the max member angle
    back = df.sparkSession.read.parquet(path)
    cents_lit = F.array(*[
        F.array(*[F.lit(float(v)) for v in c]) for c in cents])
    cvec = F.element_at(cents_lit, F.col("__frag__") + 1)
    xd = F.transform(vec_column, lambda e: e.cast("double"))
    dot = F.aggregate(F.zip_with(xd, cvec, lambda a, b: a * b),
                      F.lit(0.0), lambda a, v: a + v)
    norm = F.sqrt(F.aggregate(F.transform(xd, lambda e: e * e),
                              F.lit(0.0), lambda a, v: a + v))
    stats = (back.filter(F.col("__frag__") >= 0)
             .select(F.col("__frag__").alias("frag"),
                     (dot / norm).alias("cos"))
             .groupBy("frag")
             .agg(F.count(F.lit(1)).alias("count"),
                  F.min("cos").alias("min_cos"))
             .collect())
    # pivots: the n_pivots lowest-id REAL members per fragment — their
    # probe similarities give a guaranteed plan-time floor (partial
    # WindowGroupLimit keeps this a slim top-n job, not a full sort)
    w = Window.partitionBy("__frag__").orderBy(id_column)
    piv_rows = (back.filter(F.col("__frag__") >= 0)
                .withColumn("__rn__", F.row_number().over(w))
                .filter(F.col("__rn__") <= n_pivots)
                .select(vec_column).collect())
    pivots, _ = rows_to_matrix(
        [list(r[vec_column]) for r in piv_rows], dim=int(dim))
    pivots = pivots / np.linalg.norm(pivots, axis=1, keepdims=True)
    meta = {
        "version": 1,
        "vec_column": vec_column,
        "id_column": id_column,
        "dim": int(dim),
        "centroids": [[float(v) for v in c] for c in cents],
        "pivots": [[float(v) for v in p] for p in pivots],
        "fragments": sorted(
            ({"frag": int(r["frag"]), "dir": f"__frag__={int(r['frag'])}",
              "count": int(r["count"]),
              "min_cos": float(min(max(r["min_cos"], -1.0), 1.0))}
             for r in stats), key=lambda d: d["frag"]),
    }
    with open(os.path.join(path, _SIDECAR), "w") as fh:
        json.dump(meta, fh)
    return meta


def _load_index(path: str) -> dict:
    with open(os.path.join(path, _SIDECAR)) as fh:
        return json.load(fh)


def ann_index_topk(spark, path: str, probe, k: int,
                   vec_column: str | None = None,
                   id_column: str | None = None,
                   probe_id_column: str = "probe_id",
                   scan_info: dict | None = None) -> DataFrame:
    """Exact cosine top-k against an indexed layout, reading only the
    fragments whose similarity upper bound can reach the answer. Pass
    a dict as ``scan_info`` to receive ``fragments_total`` /
    ``fragments_read`` / per-phase fragment lists (the observability
    hook the pruning tests pin)."""
    from .similarity import _collect_probes, brute_force_topk
    meta = _load_index(path)
    vec_column = vec_column or meta["vec_column"]
    id_column = id_column or meta["id_column"]
    frags = meta["fragments"]
    cents = np.asarray(meta["centroids"], np.float64)

    probe_key = probe_id_column if probe_id_column in \
        getattr(probe, "columns", []) else id_column
    p_ids, pmat = _collect_probes(probe, vec_column, probe_key)
    if scan_info is None:
        scan_info = {}
    scan_info["fragments_total"] = len(frags)
    if len(p_ids) == 0 or not frags:
        scan_info.update(fragments_read=0, pruned=[])
        return (spark.read.parquet(path).limit(0)
                .select(F.lit(0).cast("long").alias(probe_id_column),
                        F.col(id_column), F.lit(0.0).alias("cosine_sim"),
                        F.lit(0).alias("rank")))
    pnorm = pmat / np.linalg.norm(pmat, axis=1, keepdims=True)

    # similarity upper bound per (probe, fragment):
    #   cos(max(0, angle(probe, centroid) - cone_angle))
    counts = np.asarray([f["count"] for f in frags], np.int64)
    theta_f = np.arccos(np.clip(
        np.asarray([f["min_cos"] for f in frags], np.float64), -1.0, 1.0))
    fcents = cents[[f["frag"] for f in frags]]  # sidecar order
    theta_pc = np.arccos(np.clip(pnorm @ fcents.T, -1.0, 1.0))  # (P, F)
    ub = np.cos(np.maximum(theta_pc - theta_f[None, :], 0.0))  # (P, F)

    # guaranteed plan-time floor per probe: the k-th best similarity
    # among the sidecar's REAL member pivots (every pivot is a genuine
    # candidate, so the true k-th best can only be >= this); -inf when
    # fewer than k pivots exist -> nothing prunes for that probe
    total = int(counts.sum())
    want = min(k, total)
    pivots = np.asarray(meta.get("pivots", []), np.float64)
    floors = np.full(len(p_ids), -math.inf)
    if len(pivots) >= want > 0:
        psims = pnorm @ pivots.T  # (P, n_pivots_total)
        part = np.partition(psims, psims.shape[1] - want, axis=1)
        floors = part[:, psims.shape[1] - want]

    # a fragment survives when ANY probe's bound ties-or-beats that
    # probe's floor; strictly-below-floor fragments cannot contribute
    # even via the id tie-break (every member strictly loses to k
    # real candidates). The 1e-9 slack covers cross-engine float
    # drift: the cone stats are JVM sums, the bounds NumPy sums, and
    # at an EXACT tie (a probe that IS an indexed vector makes
    # floor = 1.0) a ulp of difference otherwise prunes the fragment
    # holding the true answer (hypothesis-found). 1e-9 in cosine
    # space is orders above the drift and below any real gap.
    needed = (ub >= floors[:, None] - 1e-9).any(axis=0)
    keep = [int(fi) for fi in np.nonzero(needed)[0]]
    pruned = [frags[fi]["frag"] for fi in range(len(frags))
              if fi not in set(keep)]
    scan_info.update(fragments_read=len(keep),
                     pruned=sorted(pruned))
    if not keep:  # degenerate: k == 0 or no probes could match
        keep = [0]
        scan_info["fragments_read"] = 1

    dirs = [os.path.join(path, frags[fi]["dir"]) for fi in sorted(keep)]
    # ONE job: brute-force top-k over the surviving fragments only —
    # reusing the probe rows collected above for the pruning bounds
    return brute_force_topk(spark.read.parquet(*dirs), probe, vec_column,
                            k, id_column=id_column,
                            probe_id_column=probe_id_column,
                            probes_collected=(p_ids, pmat))
