"""Expression DSL — thin wrapper over ``pyspark.sql.Column``.

Parity target: reference pyquokka/expression.py (operators at :30-178,
``.str`` namespace at :186-291, ``.dt`` namespace at :293-388). The
reference wraps a sqlglot AST and later compiles to Polars/DuckDB; here
the Column IS the expression IR and Catalyst compiles it, so the whole
class is a naming adapter.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _unwrap(v):
    return v.column if isinstance(v, Expression) else v


class Expression:
    """Wraps a Spark Column, exposing the reference's operator surface."""

    def __init__(self, column: Column):
        assert isinstance(column, Column), type(column)
        self.column = column

    # ---- namespaces ----
    @property
    def str(self) -> "StrNamespace":
        return StrNamespace(self)

    @property
    def dt(self) -> "DtNamespace":
        return DtNamespace(self)

    # ---- comparison ----
    def __eq__(self, other):  # type: ignore[override]
        return Expression(self.column == _unwrap(other))

    def __ne__(self, other):  # type: ignore[override]
        return Expression(self.column != _unwrap(other))

    def __gt__(self, other):
        return Expression(self.column > _unwrap(other))

    def __ge__(self, other):
        return Expression(self.column >= _unwrap(other))

    def __lt__(self, other):
        return Expression(self.column < _unwrap(other))

    def __le__(self, other):
        return Expression(self.column <= _unwrap(other))

    # ---- boolean ----
    def __and__(self, other):
        return Expression(self.column & _unwrap(other))

    def __or__(self, other):
        return Expression(self.column | _unwrap(other))

    def __invert__(self):
        return Expression(~self.column)

    # ---- arithmetic ----
    def __add__(self, other):
        return Expression(self.column + _unwrap(other))

    def __radd__(self, other):
        return Expression(_unwrap(other) + self.column)

    def __sub__(self, other):
        return Expression(self.column - _unwrap(other))

    def __rsub__(self, other):
        return Expression(_unwrap(other) - self.column)

    def __mul__(self, other):
        return Expression(self.column * _unwrap(other))

    def __rmul__(self, other):
        return Expression(_unwrap(other) * self.column)

    def __truediv__(self, other):
        return Expression(self.column / _unwrap(other))

    def __rtruediv__(self, other):
        return Expression(_unwrap(other) / self.column)

    def __mod__(self, other):
        return Expression(self.column % _unwrap(other))

    def __pow__(self, other):
        return Expression(self.column ** _unwrap(other))

    def __neg__(self):
        return Expression(-self.column)

    # ---- misc ----
    def is_in(self, values):
        return Expression(self.column.isin(list(values)))

    def is_null(self):
        return Expression(self.column.isNull())

    def is_not_null(self):
        return Expression(self.column.isNotNull())

    def cast(self, dtype: str):
        return Expression(self.column.cast(dtype))

    def alias(self, name: str):
        return Expression(self.column.alias(name))

    def between(self, lo, hi):
        return Expression(self.column.between(_unwrap(lo), _unwrap(hi)))

    def __repr__(self):
        return f"Expression({self.column})"


class StrNamespace:
    """Reference expression.py:186-291 (.str methods)."""

    def __init__(self, expr: Expression):
        self.c = expr.column

    def to_uppercase(self):
        return Expression(F.upper(self.c))

    def to_lowercase(self):
        return Expression(F.lower(self.c))

    def contains(self, s: str):
        return Expression(self.c.contains(s))

    def starts_with(self, s: str):
        return Expression(self.c.startswith(s))

    def ends_with(self, s: str):
        return Expression(self.c.endswith(s))

    def length(self):
        return Expression(F.length(self.c))

    def json_extract(self, field: str):
        path = field if field.startswith("$") else "$." + field
        return Expression(F.get_json_object(self.c, path))

    def strptime(self, fmt: str | None = None):
        from .sqldialect import translate_time_format
        if fmt is None:
            return Expression(F.to_timestamp(self.c))
        return Expression(F.to_timestamp(self.c, translate_time_format(fmt)))

    def hash(self):
        return Expression(F.xxhash64(self.c))

    def substring(self, start: int, length: int):
        return Expression(F.substring(self.c, start, length))

    def regexp_match(self, pattern: str):
        return Expression(self.c.rlike(pattern))

    def replace(self, pattern: str, replacement: str):
        return Expression(F.regexp_replace(self.c, pattern, replacement))

    def split(self, sep: str):
        return Expression(F.split(self.c, sep))


class DtNamespace:
    """Reference expression.py:293-388 (.dt methods)."""

    def __init__(self, expr: Expression):
        self.c = expr.column

    def hour(self):
        return Expression(F.hour(self.c))

    def minute(self):
        return Expression(F.minute(self.c))

    def second(self):
        return Expression(F.second(self.c))

    def millisecond(self):
        # cast-to-timestamp first: unix_micros rejects TIMESTAMP_NTZ
        # (pyspark 4 reads naive parquet timestamps as NTZ; session tz
        # is pinned UTC so the cast preserves the sub-second fields)
        return Expression(
            (F.unix_micros(self.c.cast("timestamp")) % 1_000_000) / 1000)

    def microsecond(self):
        return Expression(F.unix_micros(self.c.cast("timestamp")) % 1_000_000)

    def weekday(self):
        # ISO weekday, Monday=1..Sunday=7 (matches DuckDB isodow and the
        # reference's polars dt.weekday). NOT F.dayofweek, which is
        # Sunday=1..Saturday=7; F.weekday is Monday=0, so shift by 1.
        return Expression(F.weekday(self.c) + 1)

    def week(self):
        return Expression(F.weekofyear(self.c))

    def day(self):
        return Expression(F.dayofmonth(self.c))

    def month(self):
        return Expression(F.month(self.c))

    def year(self):
        return Expression(F.year(self.c))

    def date(self):
        return Expression(F.to_date(self.c))

    def offset_by(self, n: int, unit: str = "day"):
        unit = unit.rstrip("s")
        return Expression(self.c + F.expr(f"INTERVAL {n} {unit}"))

    def strftime(self, fmt: str = "%Y-%m-%d"):
        from .sqldialect import translate_time_format
        return Expression(F.date_format(self.c, translate_time_format(fmt)))
