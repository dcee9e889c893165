"""DuckDB-dialect → Spark SQL string shim.

The reference accepts DuckDB-dialect SQL fragments anywhere a SQL
string is taken (filter_sql / with_columns_sql / agg_sql; see SURVEY
§2.7b, reference pyquokka/datastream.py:322-393, 741-815). Spark SQL
accepts ~all of the surface that the reference's TPC-H/time-series
apps actually use (comparisons, LIKE, CASE WHEN, IN, BETWEEN,
EXTRACT, date literals, interval arithmetic), so this shim only
rewrites the handful of DuckDB-isms with no identical Spark spelling.

Deliberately regex-based and conservative: sqlglot is not available in
this environment, and a full SQL parser is not needed for the accepted
fragment grammar.
"""

from __future__ import annotations

import re

# DuckDB strftime/strptime C-style format → Java SimpleDateFormat-ish
_FMT_MAP = [
    ("%Y", "yyyy"), ("%y", "yy"), ("%m", "MM"), ("%d", "dd"),
    ("%H", "HH"), ("%M", "mm"), ("%S", "ss"), ("%f", "SSSSSS"),
    ("%j", "DDD"), ("%%", "%"),
]


def translate_time_format(fmt: str) -> str:
    for c_spec, j_spec in _FMT_MAP:
        fmt = fmt.replace(c_spec, j_spec)
    return fmt


def _rewrite_strftime(sql: str) -> str:
    # strftime(expr, '%Y-%m-%d') -> date_format(expr, 'yyyy-MM-dd')
    def repl(m):
        return f"date_format({m.group(1)}, '{translate_time_format(m.group(2))}')"
    return re.sub(r"strftime\(\s*([^,]+?)\s*,\s*'([^']*)'\s*\)", repl, sql,
                  flags=re.IGNORECASE)


def _rewrite_strptime(sql: str) -> str:
    def repl(m):
        return f"to_timestamp({m.group(1)}, '{translate_time_format(m.group(2))}')"
    return re.sub(r"strptime\(\s*([^,]+?)\s*,\s*'([^']*)'\s*\)", repl, sql,
                  flags=re.IGNORECASE)


def _rewrite_json_extract(sql: str) -> str:
    # json_extract_string(col, 'field') -> get_json_object(col, '$.field')
    def repl(m):
        path = m.group(2)
        if not path.startswith("$"):
            path = "$." + path
        return f"get_json_object({m.group(1)}, '{path}')"
    return re.sub(
        r"json_extract(?:_string)?\(\s*([^,]+?)\s*,\s*'([^']*)'\s*\)",
        repl, sql, flags=re.IGNORECASE)


_SIMPLE_FN = [
    # (duckdb regex, spark replacement)
    (re.compile(r"\blist_value\(", re.I), "array("),
    (re.compile(r"\blen\(", re.I), "length("),
    (re.compile(r"\blist_contains\(", re.I), "array_contains("),
    (re.compile(r"\blist_unique\(", re.I), "array_distinct("),
    (re.compile(r"\bregexp_matches\(", re.I), "rlike("),
]

# epoch_ms(x) -> unix_millis(cast(x as timestamp)): the cast tolerates
# TIMESTAMP_NTZ inputs (pyspark 4 reads naive parquet timestamps as
# NTZ, which unix_millis rejects; session tz is pinned UTC so the cast
# is an epoch identity). Non-nested args only — nested calls keep the
# raw spelling and fail loudly at analysis rather than mis-transpile.
_EPOCH_MS = re.compile(r"\bepoch_ms\(([^()]*)\)", re.I)


_QUALIFY_RE = re.compile(r"\bqualify\b", re.I)
_TAIL_RE = re.compile(r"\b(order\s+by|limit)\b", re.I)


def _rewrite_qualify(sql: str) -> str:
    """DuckDB/Snowflake ``QUALIFY <pred>`` — filter on window results —
    has no Spark SQL counterpart. Rewrite the query as a subselect:
    ``SELECT ... QUALIFY p [ORDER BY/LIMIT tail]`` becomes
    ``SELECT * FROM (SELECT ...) WHERE p [tail]`` (window aliases are
    visible to the outer WHERE). Only a TOP-LEVEL qualify is
    rewritten: occurrences inside parentheses or string literals are
    left alone."""
    if "qualify" not in sql.lower():
        return sql
    depth = 0
    i, n = 0, len(sql)
    pos = None
    while i < n:
        c = sql[i]
        if c == "'":
            i += 1
            while i < n and sql[i] != "'":
                i += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0 and c in "qQ":
            m = _QUALIFY_RE.match(sql, i)
            if m and (i == 0 or not (sql[i - 1].isalnum()
                                     or sql[i - 1] == "_")):
                pos = i
                break
        i += 1
    if pos is None:
        return sql
    head, rest = sql[:pos], sql[pos + len("qualify"):]
    # split the predicate from a trailing ORDER BY / LIMIT at depth 0
    depth, j, cut = 0, 0, None
    while j < len(rest):
        c = rest[j]
        if c == "'":
            j += 1
            while j < len(rest) and rest[j] != "'":
                j += 1
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif depth == 0:
            m = _TAIL_RE.match(rest, j)
            if m and not (j > 0 and (rest[j - 1].isalnum()
                                     or rest[j - 1] == "_")):
                cut = j
                break
        j += 1
    pred = rest[:cut] if cut is not None else rest
    tail = rest[cut:] if cut is not None else ""
    return (f"SELECT * FROM ({head.strip()}) __qs_qualify__ "
            f"WHERE {pred.strip()} {tail.strip()}").strip()


def duckdb_to_spark_sql(sql: str) -> str:
    """Best-effort transpile of a DuckDB-dialect SQL fragment to Spark SQL."""
    out = _rewrite_qualify(sql)
    out = _rewrite_strftime(out)
    out = _rewrite_strptime(out)
    out = _rewrite_json_extract(out)
    for pat, repl in _SIMPLE_FN:
        out = pat.sub(repl, out)
    out = _EPOCH_MS.sub(r"unix_millis(cast(\1 as timestamp))", out)
    return out
