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


def duckdb_to_spark_sql(sql: str) -> str:
    """Best-effort transpile of a DuckDB-dialect SQL fragment to Spark SQL."""
    out = _rewrite_strftime(sql)
    out = _rewrite_strptime(out)
    out = _rewrite_json_extract(out)
    for pat, repl in _SIMPLE_FN:
        out = pat.sub(repl, out)
    out = _EPOCH_MS.sub(r"unix_millis(cast(\1 as timestamp))", out)
    return out
