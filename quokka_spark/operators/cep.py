"""Complex event processing / pattern recognition (MATCH_RECOGNIZE-style).

Parity target: reference executors/cep_executors.py:13-272 (CEPExecutor
+ nfa_cep) and orderedstream.py:37-53 (pattern_recognize). Spark SQL has
no MATCH_RECOGNIZE, so this is one of the genuinely custom operators
(SURVEY §2.8).

Event spec: ``events = [(name, sql_predicate), ...]`` where a
predicate may reference the current event's columns qualified by its
own name and *prior* events' columns by their names, e.g.::

    [("a", "a.event_type = 'signup'"),
     ("b", "b.event_type = 'click' and b.value > a.value"),
     ("c", "c.event_type = 'purchase' and c.value > b.value")]

Matching semantics (same as the reference, cep_executors.py:131-170):
one match per start row; events strictly ordered by row position;
the last event must occur within ``maxspan`` of the first event's time.

Spark plan: OR of the per-event independent predicates is pushed down
as a plain filter (prefilter pushdown — reference computes the same
OR, cep_executors.py:44-84, and Catalyst pushes ours into the scan);
then ``groupBy(by).applyInPandas`` runs the per-key NFA over
time-sorted rows. Parallelism = number of keys; each key's rows must
fit in a python worker (same contract as the reference's per-channel
executor).
"""

from __future__ import annotations

import re

import pandas as pd

_QUAL = re.compile(r"\b([A-Za-z_]\w*)\.([A-Za-z_]\w*)\b")


def _split_conjuncts(pred: str) -> list:
    """Split on top-level ANDs (case-insensitive), paren-aware."""
    parts, depth, cur = [], 0, []
    tokens = re.split(r"(\(|\)|\band\b|\bAND\b)", pred)
    for tok in tokens:
        if tok == "(":
            depth += 1
            cur.append(tok)
        elif tok == ")":
            depth -= 1
            cur.append(tok)
        elif tok is not None and tok.lower() == "and" and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        elif tok:
            cur.append(tok)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


def _sql_to_pandas_expr(pred: str) -> str:
    """SQL fragment → pandas.query syntax: ``=`` → ``==``, ``<>`` → ``!=``."""
    out = re.sub(r"(?<![<>!=])=(?!=)", "==", pred)
    out = out.replace("<>", "!=")
    return out


class CompiledPattern:
    """Compiles the event spec into prefilters + dependent filters —
    the sqlglot logic of reference cep_executors.py:44-84, regex-based
    (sqlglot unavailable here)."""

    def __init__(self, schema: list, events: list, time_col: str, max_span):
        self.time_col = time_col
        self.max_span = max_span
        self.events = events
        self.names = [name for name, _ in events]
        assert len(set(self.names)) == len(self.names), "repeated event names"
        self.touched_columns = {time_col}
        self.event_prefilters = {}
        self.event_full_filters = {}
        prefilter_terms = []
        seen = set()
        for i, (name, pred) in enumerate(events):
            if i != 0:
                assert pred is not None, "only the first event can lack a filter"
            own_conjs, dep_conjs = [], []
            # pred=None (allowed for the first event only) → no conjuncts:
            # every row is a candidate start and pushdown is disabled
            for conj in (_split_conjuncts(pred) if pred is not None else []):
                quals = set(m.group(1) for m in _QUAL.finditer(conj))
                cols = set(m.group(2) for m in _QUAL.finditer(conj))
                for c in cols:
                    assert c in schema, f"column {c} not in schema {schema}"
                self.touched_columns |= cols
                assert quals.issubset(seen | {name}), \
                    "events can only depend on prior events"
                if quals <= {name}:
                    own_conjs.append(conj)
                else:
                    dep_conjs.append(conj)
            own = " and ".join(own_conjs) if own_conjs else None
            self.event_prefilters[name] = own
            self.event_full_filters[name] = pred
            # pushdown: the scan prefilter is the OR of every event's
            # own-conjuncts — valid only if EVERY event has some. An
            # unfiltered event disables pushdown but must NOT stop the
            # compilation of later events (round-1 bug: early `break`
            # here left event_full_filters incomplete → KeyError in the
            # NFA whenever a non-final event had no own-conjuncts).
            if prefilter_terms is not None:
                if own:
                    prefilter_terms.append(
                        "(" + _QUAL.sub(lambda m: m.group(2), own) + ")")
                else:
                    prefilter_terms = None
            seen.add(name)
        self.prefilter_sql = (" or ".join(prefilter_terms)
                              if prefilter_terms else None)


def match_pattern_pandas(pdf: pd.DataFrame, pattern: CompiledPattern) -> list:
    """NFA over one time-sorted key group. Returns a list of
    (first_ts, last_ts) per match; one match per start row."""
    tc = pattern.time_col
    pdf = pdf.sort_values(tc).reset_index(drop=True)
    events = pattern.events
    first_name, _ = events[0]
    last_name = events[-1][0]

    def rows_matching(section: pd.DataFrame, name: str, bound: dict) -> pd.DataFrame:
        pred = pattern.event_full_filters[name]

        def sub(m):
            q, col = m.group(1), m.group(2)
            if q == name:
                return col
            v = bound[q][col]
            return repr(v.item() if hasattr(v, "item") else v)

        expr = _sql_to_pandas_expr(_QUAL.sub(sub, pred))
        try:
            return section.query(expr)
        except Exception:
            return section.query(expr, engine="python")

    own0 = pattern.event_prefilters[first_name]
    if own0:
        starts = rows_matching(pdf, first_name, {})
    else:
        starts = pdf
    matches = []
    for start_idx in starts.index:
        first_row = pdf.loc[start_idx]
        first_ts = first_row[tc]
        horizon = first_ts + pattern.max_span
        section = pdf.loc[start_idx + 1:]
        section = section[section[tc] <= horizon]
        if len(section) == 0:
            continue
        # DFS, earliest-first; one match per start (reference :146)
        stack = [({first_name: first_row}, 1, start_idx)]
        found = None
        while stack:
            bound, next_i, after_idx = stack.pop()
            name = events[next_i][0]
            cands = rows_matching(section.loc[after_idx + 1:], name, bound)
            if len(cands) == 0:
                continue
            if name == last_name:
                found = (first_ts, cands.iloc[0][tc])
                break
            # push candidates latest-first so earliest is explored first
            for idx in list(cands.index)[::-1]:
                nb = dict(bound)
                nb[name] = cands.loc[idx]
                stack.append((nb, next_i + 1, idx))
        if found:
            matches.append(found)
    return matches


def pattern_recognize(df, time_col: str, events: list, maxspan, by: str,
                      schema: list | None = None):
    """Spark entry: prefilter pushdown + per-key pandas NFA.

    Output schema: (by, event_number, first_event_timestamp,
    last_event_timestamp) — reference orderedstream.py:50-53 plus the
    key column."""
    from pyspark.sql.types import StructType, StructField, LongType

    schema = schema or df.columns
    pattern = CompiledPattern(schema, events, time_col, maxspan)
    if pattern.prefilter_sql:
        from ..sqldialect import duckdb_to_spark_sql
        df = df.filter(duckdb_to_spark_sql(pattern.prefilter_sql))

    need = sorted(pattern.touched_columns | {by})
    ts_field = df.schema[time_col]
    by_field = df.schema[by]
    out_schema = StructType([
        by_field,
        StructField("event_number", LongType(), False),
        StructField("first_event_timestamp", ts_field.dataType, True),
        StructField("last_event_timestamp", ts_field.dataType, True),
    ])

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        found = match_pattern_pandas(pdf, pattern)
        if not found:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        return pd.DataFrame({
            by: [key[0]] * len(found),
            "event_number": range(len(found)),
            "first_event_timestamp": [f for f, _ in found],
            "last_event_timestamp": [l for _, l in found],
        })

    return df.select(*need).groupBy(by).applyInPandas(run, schema=out_schema)
