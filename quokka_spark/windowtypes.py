"""Window specs + triggers (reference pyquokka/windowtypes.py:6-97).

``aggregation_dict`` maps output alias → SQL aggregate over window rows,
e.g. ``{"avg_v": "AVG(value)"}`` — compiled to Spark windowed aggs by
operators/windows.py.

Two calling conventions, disambiguated by positional-argument count:
the repo-native compact form (``TumblingWindow("1h", {...})``) and the
reference's drop-in form with leading column names
(``TumblingWindow("ts", "key", "1h", {...})``, windowtypes.py:59-82) —
the latter stores ``order_by``/``partition_by`` on the spec so
``DataStream.windowed_transform(window)`` needs no extra arguments,
exactly like the reference's datastream.py:1650.
"""

from __future__ import annotations


class Trigger:
    pass


class OnCompletionTrigger(Trigger):
    """Emit one row per completed window (reference windowtypes.py:85-88).
    ``delay`` is accepted for signature parity (the reference uses it
    to bound out-of-orderness on its pipelined runtime; the batch plan
    sees the whole input, and the streaming verbs take an explicit
    watermark instead)."""

    def __init__(self, delay=None):
        self.delay = delay


class OnEventTrigger(Trigger):
    """Emit the running aggregate at every event inside its window
    (reference windowtypes.py:90-97)."""


class Window:
    def __init__(self, size_polars: str, aggregation_dict: dict,
                 order_by: str | None = None,
                 partition_by: str | None = None):
        self.size = size_polars
        self.aggregation_dict = dict(aggregation_dict or {})
        self.order_by = order_by
        self.partition_by = partition_by

    def add_aggregation(self, new_col: str, sql_agg: str):
        """Reference windowtypes.py:22-24."""
        assert new_col not in self.aggregation_dict, \
            "new_col already exists in aggregation_dict"
        self.aggregation_dict[new_col] = sql_agg


def _split_ref_form(args: tuple, n_native: int, kwargs: dict):
    """(order_by, partition_by, native_args, aggregation_dict): the
    reference form carries two leading column-name strings, so after
    peeling the trailing aggregation_dict (positional dict or keyword;
    None allowed — the reference builds specs then add_aggregation's)
    it has exactly 2 more positional args than the compact form."""
    aggs = kwargs.pop("aggregation_dict", None)
    assert not kwargs, f"unexpected window kwargs {sorted(kwargs)}"
    args = list(args)
    if aggs is None and args and isinstance(args[-1], dict):
        aggs = args.pop()
    if len(args) == n_native + 2:
        order_by, partition_by = args[0], args[1]
        rest = tuple(args[2:])
        # the reference form's leading args are COLUMN NAMES — a
        # non-string here means a misplaced positional (e.g. a dict
        # where a column belongs); fail loudly, never misparse
        assert isinstance(order_by, str) and isinstance(partition_by, str), \
            f"bad window spec args {tuple(args)!r} — expected " \
            f"(order_by, partition_by, ...) column names"
    else:
        assert len(args) == n_native, \
            f"bad window spec args {tuple(args)!r} " \
            f"(+aggregation_dict={aggs!r})"
        order_by = partition_by = None
        rest = tuple(args)
    assert aggs is None or isinstance(aggs, dict), \
        f"aggregation_dict must be a dict, got {aggs!r}"
    return order_by, partition_by, rest, aggs


class HoppingWindow(Window):
    """Fixed windows of ``size`` starting every ``hop``
    (reference windowtypes.py:59-64). Compact form
    ``HoppingWindow(hop, size, aggs)`` or reference form
    ``HoppingWindow(order_by, partition_by, hop, size, aggs)``."""

    def __init__(self, *args, **kwargs):
        order_by, partition_by, (hop, size), aggs = \
            _split_ref_form(args, 2, kwargs)
        super().__init__(size, aggs, order_by, partition_by)
        self.hop = hop


class TumblingWindow(HoppingWindow):
    """Hopping window with hop == size (reference windowtypes.py:66-69).
    ``TumblingWindow(size, aggs)`` or
    ``TumblingWindow(order_by, partition_by, size, aggs)``."""

    def __init__(self, *args, **kwargs):
        order_by, partition_by, (size,), aggs = \
            _split_ref_form(args, 1, kwargs)
        Window.__init__(self, size, aggs, order_by, partition_by)
        self.hop = size


class SlidingWindow(Window):
    """Trailing window of ``size_before`` ending at each event
    (reference windowtypes.py:71-76). ``bucket`` (must be >=
    size_before) selects the halo-copy bucketed plan for low-key-count
    streams — parallelism keys x buckets instead of one task per key
    (operators/windows.sliding_window_bucketed). The default "auto"
    probes the stream (operators/windows.choose_bucket) and buckets
    only when the key count is small relative to the cluster; pass
    ``bucket=None`` to force the plain per-key plan.
    ``SlidingWindow(size_before, aggs)`` or
    ``SlidingWindow(order_by, partition_by, size_before, aggs)``."""

    def __init__(self, *args, bucket="auto", **kwargs):
        # legacy positional-bucket form, SlidingWindow(size, aggs,
        # bucket): the dict sits in the MIDDLE, which the generic
        # trailing-dict peel would misparse as the reference form
        if len(args) in (2, 3) and isinstance(args[1], dict):
            size_before, aggs = args[0], args[1]
            if len(args) == 3:
                bucket = args[2]
            order_by = partition_by = None
            assert not kwargs, f"unexpected window kwargs {sorted(kwargs)}"
        else:
            order_by, partition_by, (size_before,), aggs = \
                _split_ref_form(args, 1, kwargs)
        super().__init__(size_before, aggs, order_by, partition_by)
        self.size_before = size_before
        self.bucket = bucket


class SessionWindow(Window):
    """Gap-timeout sessions (reference windowtypes.py:78-82).
    ``SessionWindow(timeout, aggs)`` or
    ``SessionWindow(order_by, partition_by, timeout, aggs)``."""

    def __init__(self, *args, **kwargs):
        order_by, partition_by, (timeout,), aggs = \
            _split_ref_form(args, 1, kwargs)
        super().__init__(timeout, aggs, order_by, partition_by)
        self.timeout = timeout
