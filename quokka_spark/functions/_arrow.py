"""Zero-copy Arrow→NumPy vector ingestion shared by the ANN kernels.

The hot path of every similarity kernel is "turn this Arrow batch's
array<float> column into a (rows, dim) float64 matrix". The naive
``np.stack(col.to_pylist())`` materializes one Python object per
ELEMENT of every vector — a large constant factor on a 100 TB vector
stream. A clean Arrow list column (no NULL lists, no NULL elements,
rectangular) is already the matrix: its flattened child buffer
reshaped, zero object churn. This module factors that fast path (first
proven in dedup.embedding_cosine_pairs' cos_batches kernel) with a
per-row-validated fallback for dirty batches, so every kernel keeps a
well-defined contract: invalid rows (NULL vector, NULL element, ragged
length) are DROPPED from the candidate stream — a NULL embedding can
never be anyone's neighbor.
"""

from __future__ import annotations

import numpy as np


def list_column_to_matrix(col, dim: int | None = None):
    """Convert an Arrow list-of-numeric column to a dense float64
    matrix of its VALID rows.

    Returns ``(mat, idx)``: ``mat`` is float64 of shape (m, dim);
    ``idx`` (int64, length m) holds the batch row positions the matrix
    rows came from, so callers align ids via ``vid[idx]``.

    Valid row = non-NULL list, no NULL elements, length == ``dim``
    (when ``dim`` is None it is inferred from the first fully-valid
    row). Fast path: a NULL-free rectangular column of the right width
    reshapes the flattened child buffer directly — zero per-element
    Python objects; only genuinely dirty batches pay ``to_pylist``.
    """
    n = len(col)
    if n == 0:
        return (np.empty((0, dim or 0), np.float64),
                np.empty(0, np.int64))
    flat = col.flatten()
    clean = col.null_count == 0 and flat.null_count == 0
    if clean:
        lens = np.diff(np.asarray(col.offsets))
        clean = bool(len(lens)) and bool((lens == lens[0]).all()) \
            and (dim is None or int(lens[0]) == dim)
    if clean:
        mat = flat.to_numpy(zero_copy_only=False) \
            .astype(np.float64, copy=False).reshape(n, -1)
        return mat, np.arange(n, dtype=np.int64)
    rows = col.to_pylist()
    if dim is None:
        dim = next((len(r) for r in rows
                    if r is not None and not any(e is None for e in r)), 0)
    idx, keep = [], []
    for i, r in enumerate(rows):
        if r is None or len(r) != dim or any(e is None for e in r):
            continue
        idx.append(i)
        keep.append(r)
    if not keep:
        return np.empty((0, dim), np.float64), np.empty(0, np.int64)
    return (np.asarray(keep, np.float64),
            np.asarray(idx, np.int64))


def rows_to_matrix(values, dim: int | None = None):
    """Driver-side sibling of :func:`list_column_to_matrix` for a
    pandas/py sequence of vectors (e.g. a collected probe table or a
    bounded train sample): returns ``(mat, idx)`` with NULL vectors,
    NaN/None elements and wrong-length rows dropped."""
    idx, keep = [], []
    for i, r in enumerate(values):
        if r is None:
            continue
        try:
            a = np.asarray(r, dtype=np.float64)
        except (TypeError, ValueError):
            continue
        if a.ndim != 1 or np.isnan(a).any():
            continue
        if dim is not None and len(a) != dim:
            continue
        idx.append(i)
        keep.append(a)
    if dim is None and keep:
        dim = len(keep[0])
        pairs = [(i, a) for i, a in zip(idx, keep) if len(a) == dim]
        idx = [i for i, _ in pairs]
        keep = [a for _, a in pairs]
    if not keep:
        return (np.empty((0, dim or 0), np.float64),
                np.empty(0, np.int64))
    return np.stack(keep), np.asarray(idx, np.int64)


def unit_rows(mat: np.ndarray) -> np.ndarray:
    """L2-normalize each row (cosine prep). Zero vectors become NaN
    rows — they compare below every real similarity and never reach a
    top-k, matching the JVM fold's NULL semantics."""
    with np.errstate(divide="ignore", invalid="ignore"):
        return mat / np.linalg.norm(mat, axis=1, keepdims=True)
