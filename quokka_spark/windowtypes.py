"""Window specs + triggers (reference pyquokka/windowtypes.py:6-97).

``aggregation_dict`` maps output alias → SQL aggregate over window rows,
e.g. ``{"avg_v": "AVG(value)"}`` — compiled to Spark windowed aggs by
operators/windows.py.
"""

from __future__ import annotations


class Trigger:
    pass


class OnCompletionTrigger(Trigger):
    """Emit one row per completed window (reference windowtypes.py:85-88)."""


class OnEventTrigger(Trigger):
    """Emit the running aggregate at every event inside its window
    (reference windowtypes.py:90-97)."""


class Window:
    def __init__(self, size_polars: str, aggregation_dict: dict):
        self.size = size_polars
        self.aggregation_dict = aggregation_dict


class HoppingWindow(Window):
    """Fixed windows of ``size`` starting every ``hop``
    (reference windowtypes.py:59-64)."""

    def __init__(self, hop, size, aggregation_dict: dict):
        super().__init__(size, aggregation_dict)
        self.hop = hop


class TumblingWindow(HoppingWindow):
    """Hopping window with hop == size (reference windowtypes.py:66-69)."""

    def __init__(self, size, aggregation_dict: dict):
        super().__init__(size, size, aggregation_dict)


class SlidingWindow(Window):
    """Trailing window of ``size_before`` ending at each event
    (reference windowtypes.py:71-76). ``bucket`` (must be >=
    size_before) selects the halo-copy bucketed plan for low-key-count
    streams — parallelism keys x buckets instead of one task per key
    (operators/windows.sliding_window_bucketed). The default "auto"
    probes the stream (operators/windows.choose_bucket) and buckets
    only when the key count is small relative to the cluster; pass
    ``bucket=None`` to force the plain per-key plan."""

    def __init__(self, size_before, aggregation_dict: dict, bucket="auto"):
        super().__init__(size_before, aggregation_dict)
        self.size_before = size_before
        self.bucket = bucket


class SessionWindow(Window):
    """Gap-timeout sessions (reference windowtypes.py:78-82)."""

    def __init__(self, timeout, aggregation_dict: dict):
        super().__init__(timeout, aggregation_dict)
        self.timeout = timeout
