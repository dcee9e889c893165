"""OrderedStream — DataStream + a sort contract (reference
pyquokka/orderedstream.py).

Quokka's OrderedStream guarantees cross-channel global order; Spark has
per-partition order after ``repartitionByRange().sortWithinPartitions``
plus range-partitioning, which is equivalent for every per-key operator
(as-of join, windows, shift, CEP all partition by a key and order by
time *within* the key — SURVEY §3.3 mapping).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .datastream import DataStream
from .windowtypes import Trigger


class OrderedStream(DataStream):
    def __str__(self):
        return (f"OrderedStream[{', '.join(self.schema)}] "
                f"order by {self.sorted}")

    __repr__ = __str__

    @property
    def _sort_key(self) -> str:
        assert self.sorted, "OrderedStream without a sort key"
        return next(iter(self.sorted))

    def materialize_sort(self) -> "OrderedStream":
        """Physically range-partition + sort by the contract key (the
        layout the reference's sorted readers produce,
        ordered_readers.py:28-116). Off by default — see
        QuokkaContext._sorted_stream."""
        key = self._sort_key
        df = (self.df.repartitionByRange(F.col(key))
              .sortWithinPartitions(key))
        return OrderedStream(self.qc, df, sorted=self.sorted)

    def shift(self, n: int, by: str | None = None, fill_value=None) -> "OrderedStream":
        """Lag/lead whole rows on the ordered stream (reference
        orderedstream.py:13-35 — declared there but its ShiftOperator is
        missing from the repo; implemented properly here via F.lag/lead).
        Positive n shifts values forward (row i sees row i-n)."""
        ts = self._sort_key
        w = W.partitionBy(*([by] if by else [])).orderBy(F.col(ts).asc())
        shift_fn = (lambda c: F.lag(c, n, fill_value).over(w)) if n >= 0 else \
                   (lambda c: F.lead(c, -n, fill_value).over(w))
        keep = {ts} | ({by} if by else set())
        cols = [F.col(c) if c in keep else shift_fn(F.col(c)).alias(c)
                for c in self.schema]
        return OrderedStream(self.qc, self.df.select(*cols), sorted=self.sorted)

    def join_asof(self, right: "OrderedStream", on=None, left_on=None,
                  right_on=None, by=None, left_by=None, right_by=None,
                  suffix: str = "_2", bucket="auto",
                  direction: str = "backward") -> "OrderedStream":
        """Backward as-of join per key group (reference
        orderedstream.py:114-191). See operators/asof.py for the
        union-tag formulation and its scale analysis. ``bucket``
        selects the time-bucketed two-level plan for low-key-count
        inputs (parallelism keys x buckets instead of keys); the
        default "auto" probes the left stream and buckets only when
        keys < 2 x defaultParallelism (operators/windows.choose_bucket);
        pass ``bucket=None`` to force the single-window plan.
        ``direction``: backward (default) / forward / nearest —
        pandas merge_asof parity (parity-plus vs the reference, which
        is backward-only)."""
        from .operators.asof import join_asof as _asof
        assert isinstance(right, DataStream)
        if on is not None:
            left_on = right_on = on
        assert left_on in self.schema and right_on in right.schema
        if by is not None:
            left_by = right_by = by
        assert left_by is not None, \
            "non-grouped asof join not supported (reference orderedstream.py:127-128)"
        out = _asof(self.df, right.df, left_on, right_on, left_by, right_by,
                    suffix=suffix, bucket=bucket, direction=direction)
        return OrderedStream(self.qc, out, sorted=self.sorted)

    def windowed_transform(self, window, by=None, time_col: str | None = None,
                           trigger: Trigger | None = None,
                           keep: list | None = None) -> DataStream:
        """Windowed aggregation dispatch (reference datastream.py:1650-1700);
        see operators/windows.py. ``keep``: sliding-window passthrough
        columns (the per-event scoring shape)."""
        from .operators.windows import windowed_transform as _wt
        time_col = (time_col or getattr(window, "order_by", None)
                    or self._sort_key)
        if by is None:
            by = getattr(window, "partition_by", None)
        out = _wt(self.df, window, time_col, by, trigger, keep=keep)
        return DataStream(self.qc, out)

    def resample(self, by, value_cols: list, every,
                 method: str = "ffill", time_col: str | None = None,
                 origin: float = 0.0) -> DataStream:
        """Per-key regularization onto a tick grid (gap-fill /
        downsample); see operators/windows.resample. Numeric
        (seconds) time axis — derive one with ``with_columns`` when
        the sort key is a timestamp."""
        from .operators.windows import resample as _rs
        out = _rs(self.df, time_col or self._sort_key, by, value_cols,
                  every, method=method, origin=origin)
        return DataStream(self.qc, out)

    def pattern_recognize(self, time_col: str, events: list, maxspan,
                          by: str, bucket="auto") -> DataStream:
        """CEP sequence matching (reference orderedstream.py:37-53); see
        operators/cep.py. ``bucket``: "auto" (default) probes the key
        count and switches to the (key, time-bucket) halo plan when
        keys alone can't saturate the cluster; a number forces the
        bucket width; None forces the plain per-key plan."""
        from .operators.cep import pattern_recognize as _pr
        assert by is not None, "pattern_recognize requires a by key"
        out = _pr(self.df, time_col, events, maxspan, by, schema=self.schema,
                  bucket=bucket)
        return DataStream(self.qc, out)
