"""Shared predicate machinery for metadata-level file skipping.

Both lakehouse readers (iceberg_local, delta_local) prune data files
from per-file min/max metadata — Iceberg manifests' binary
lower/upper bounds, Delta add-actions' stats JSON. The sound rule is
identical: a file may be skipped ONLY when a supported conjunct is
provably false over its [lower, upper] range; anything unparseable,
untyped, or incomparable keeps the file, and the caller always
applies the predicate row-level too, so skipping is a pure
optimization that can never change results.
"""

from __future__ import annotations

import datetime
import re


def footer_minmax(path: str, names=None) -> tuple[dict, dict, int]:
    """({col: min}, {col: max}, num_rows) aggregated over a parquet
    file's row-group FOOTER statistics — one footer parse, no data
    pages read. Top-level leaf columns only; columns without min/max
    stats are absent (the conservative answer). ``names``: optional
    set of columns to keep. Shared by both lakehouse writers/readers
    (Iceberg manifest bounds, Delta add-action stats) so stat-handling
    fixes land once."""
    import pyarrow.parquet as pq
    md = pq.ParquetFile(path).metadata
    mins: dict = {}
    maxs: dict = {}
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested leaf — top-level stats only
                continue
            if names is not None and name not in names:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            mins[name] = st.min if name not in mins \
                else min(mins[name], st.min)
            maxs[name] = st.max if name not in maxs \
                else max(maxs[name], st.max)
    return mins, maxs, md.num_rows


def parse_literal(s: str):
    """A single SQL literal → Python value, or None when ``s`` is not
    exactly one supported literal (the conservative answer)."""
    s = s.strip()
    m = re.fullmatch(r"(?i:date)\s*'([^']*)'", s)
    if m:
        return datetime.date.fromisoformat(m.group(1))
    m = re.fullmatch(r"(?i:timestamp)\s*'([^']*)'", s)
    if m:
        return datetime.datetime.fromisoformat(m.group(1))
    m = re.fullmatch(r"'([^']*)'", s)
    if m:
        return m.group(1)
    if re.fullmatch(r"[-+]?\d+", s):
        return int(s)
    if re.fullmatch(r"[-+]?(\d*\.\d+|\d+\.?)([eE][-+]?\d+)?", s):
        return float(s)
    return None


def parse_conjuncts(expr: str):
    """``col op literal AND ...`` → [(col, op, value)], or None when
    any part is not that shape (OR, parens, functions, IN, ... —
    pruning then simply doesn't happen; the row filter still runs)."""
    atoms = []
    for part in re.split(r"(?i)\s+and\s+", expr.strip()):
        m = re.fullmatch(
            r"\s*([A-Za-z_]\w*)\s*(<=|>=|==|=|<|>)\s*(.+?)\s*", part)
        if not m:
            return None
        col, op, lit = m.groups()
        v = parse_literal(lit)
        if v is None:
            return None
        atoms.append((col, "=" if op == "==" else op, v))
    return atoms or None


def interval_refutes(op: str, v, lo, hi) -> bool:
    """True when ``col op v`` is provably FALSE for every value in
    [lo, hi] (either bound may be None = unknown). Raises TypeError
    on incomparable operands — callers catch and keep the file."""
    if op == "=":
        return (lo is not None and v < lo) or (hi is not None and v > hi)
    if op == "<":
        return lo is not None and lo >= v
    if op == "<=":
        return lo is not None and lo > v
    if op == ">":
        return hi is not None and hi <= v
    if op == ">=":
        return hi is not None and hi < v
    return False
