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


def streaming_minhash_pairs(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id",
                            time_col: str = "event_time",
                            delay: str = "10 minutes", n: int = 3,
                            num_hashes: int = 64, bands: int = 16,
                            seed: int = 42) -> DataFrame:
    """Streaming banded minhash-LSH near-dup candidates with BOUNDED
    state — the streaming face of functions/dedup.minhash_lsh_pairs.

    Per micro-batch: signatures are the SAME stateless Arrow kernel as
    batch (minhash_signatures, carrying the event-time column); bands
    explode JVM-side into (band, bucket) keys; then one
    ``applyInPandasWithState`` per (band, bucket) keeps the ids seen
    within the watermark and emits a candidate pair (id1 < id2) for
    every new member against every remembered one. EventTimeTimeout
    evicts bucket state once the watermark passes ``delay`` beyond its
    last update, so state is O(docs within the horizon), never O(all
    docs) — the only shape that survives an unbounded stream.

    Semantics vs batch: replaying a corpus whose event times all fit
    one watermark horizon yields EXACTLY the batch candidate set
    (test-pinned); docs arriving more than ``delay`` apart may miss
    their pair — the standard watermark trade, identical to
    streaming_dedup_exact's. A pair may emit once per shared band
    (at-least-once): downstream exact-verify dedups, same as the
    batch candidate pipeline."""
    import pandas as pd
    from pyspark.sql.types import TimestampNTZType
    from ..functions.dedup import minhash_signatures
    assert num_hashes % bands == 0
    if isinstance(df.schema[time_col].dataType, TimestampNTZType):
        df = df.withColumn(time_col, F.col(time_col).cast("timestamp"))
    sigs = minhash_signatures(df, text_col, id_col, n, num_hashes, seed,
                              carry=[time_col], parallelize=False)
    r = num_hashes // bands
    banded = sigs.select(
        id_col, time_col,
        F.posexplode(
            F.transform(F.sequence(F.lit(0), F.lit(bands - 1)),
                        lambda i: F.slice("signature", i * r + 1, r))
        ).alias("band", "band_sig"))
    bucketed = banded.withColumn(
        "bucket", F.xxhash64(F.col("band"), F.col("band_sig").cast("string")))
    wm = bucketed.withWatermark(time_col, delay)
    delay_ms = int(to_seconds(delay) * 1000)

    def func(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            yield pd.DataFrame({"id1": pd.Series([], dtype="int64"),
                                "id2": pd.Series([], dtype="int64")})
            return
        (stored,) = state.get if state.exists else ([],)
        seen = list(stored)
        out1, out2 = [], []
        for pdf in pdfs:
            for rid in sorted(int(x) for x in pdf[id_col]):
                for s in seen:
                    if s != rid:
                        out1.append(min(s, rid))
                        out2.append(max(s, rid))
                if rid not in seen:
                    seen.append(rid)
        state.update((seen,))
        try:  # evict once the watermark passes the horizon
            state.setTimeoutTimestamp(
                state.getCurrentWatermarkMs() + delay_ms)
        except Exception:  # noqa: BLE001 — watermark not yet initialized
            pass
        yield pd.DataFrame({"id1": pd.Series(out1, dtype="int64"),
                            "id2": pd.Series(out2, dtype="int64")})

    return (wm.groupBy("band", "bucket")
            .applyInPandasWithState(func,
                                    outputStructType="id1 long, id2 long",
                                    stateStructType="seen array<long>",
                                    outputMode="append",
                                    timeoutConf="EventTimeTimeout"))


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
