"""Structured Streaming surface.

The reference is a batch engine with pipelined (streaming-style)
execution and no watermark/late-data semantics (SURVEY §2.8). This
module is the parity-plus mapping: the same windowed aggregations that
operators/windows.py runs in batch, expressed over ``readStream`` with
watermarks, plus the ``applyInPandasWithState`` recipe replacing the
reference's stateful Executor for unbounded inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.windows import _aggs, _interval, to_seconds
from ..windowtypes import HoppingWindow, SessionWindow


def read_parquet_stream(spark: SparkSession, path: str, schema) -> DataFrame:
    """File-arrival streaming source over a parquet directory."""
    return spark.readStream.schema(schema).parquet(path)


def streaming_windowed_agg(df: DataFrame, window, time_col: str, by,
                           watermark: str = "10 minutes") -> DataFrame:
    """Hopping/tumbling/session windows with late-data handling — the
    capability the reference lacks (it asserts sortedness instead)."""
    by = [by] if isinstance(by, str) else list(by or [])
    from pyspark.sql.types import TimestampNTZType
    if isinstance(df.schema[time_col].dataType, TimestampNTZType):
        # withWatermark rejects TIMESTAMP_NTZ (pyspark 4 reads naive
        # parquet timestamps as NTZ); session tz is pinned UTC so the
        # cast is an epoch identity
        df = df.withColumn(time_col, F.col(time_col).cast("timestamp"))
    wm = df.withWatermark(time_col, watermark)
    if isinstance(window, HoppingWindow):
        win = F.window(F.col(time_col), _interval(to_seconds(window.size)),
                       _interval(to_seconds(window.hop)))
    elif isinstance(window, SessionWindow):
        win = F.session_window(F.col(time_col),
                               _interval(to_seconds(window.timeout)))
    else:
        raise TypeError("streaming supports hopping/tumbling/session windows")
    return wm.groupBy(*by, win.alias("window")).agg(*_aggs(window.aggregation_dict))


def streaming_dedup_exact(df: DataFrame, key_cols, watermark_col: str,
                          delay: str = "10 minutes") -> DataFrame:
    """Streaming exact dedup with BOUNDED state — the streaming face of
    functions/dedup.exact_duplicates. ``dropDuplicatesWithinWatermark``
    evicts seen-key state once the watermark passes, so state is
    O(keys seen within ``delay``), not O(all keys ever) — the only
    dedup shape that survives an unbounded 100 TB/day stream. Rows with
    the same key more than ``delay`` apart may BOTH survive (that is
    the documented watermark trade; batch dedup_exact is the exact
    oracle)."""
    from pyspark.sql.types import TimestampNTZType
    if isinstance(df.schema[watermark_col].dataType, TimestampNTZType):
        df = df.withColumn(watermark_col,
                           F.col(watermark_col).cast("timestamp"))
    return (df.withWatermark(watermark_col, delay)
            .dropDuplicatesWithinWatermark(
                [key_cols] if isinstance(key_cols, str) else list(key_cols)))


def stateful_stream_transform(df: DataFrame, func, out_schema, state_schema,
                              by, timeout: str = "NoTimeout") -> DataFrame:
    """``applyInPandasWithState`` recipe — the streaming equivalent of
    the reference's Executor.execute/done contract: ``func(key,
    pdf_iter, state)`` accumulates into GroupState and emits batches."""
    return (df.groupBy(*([by] if isinstance(by, str) else by))
            .applyInPandasWithState(func, outputStructType=out_schema,
                                    stateStructType=state_schema,
                                    outputMode="append",
                                    timeoutConf=timeout))
