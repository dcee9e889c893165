"""Timestamp-type drift pin.

pyspark 4 reads naive parquet timestamps as TIMESTAMP_NTZ while
tz-adjusted files read as TIMESTAMP (LTZ). Round 3 proved the
environment can flip the testdata's type between rounds (the driver's
pyspark upgrade turned `events.ts` into NTZ and broke every
`unix_micros` call site at analysis). These tests write the SAME event
fixture both ways and run every event-time operator over both, so
whichever type the environment serves stays green. Session timezone is
pinned UTC (session.py), making the NTZ→LTZ cast an epoch identity.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F


def _events_pdf(n=3000, seed=11):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 3 * 86400 * 1_000_000, n))  # 3 days, µs
    return pd.DataFrame({
        "event_id": np.arange(n),
        "ts": pd.to_datetime(ts + 1_600_000_000 * 1_000_000, unit="us")
              .astype("datetime64[us]"),
        "user_id": rng.integers(0, 4, n),
        "event_type": rng.choice(
            ["view", "click", "signup", "purchase"], n,
            p=[0.55, 0.25, 0.1, 0.1]),
        "value": np.round(rng.random(n) * 100, 3),
    })


@pytest.fixture(scope="module")
def ts_variants(spark, tmp_path_factory):
    """(naive_df, utc_df): same rows, parquet-written naive (reads as
    NTZ on this pyspark) and UTC-adjusted (reads as LTZ)."""
    root = tmp_path_factory.mktemp("tsvariants")
    pdf = _events_pdf()
    naive_path = str(root / "naive.parquet")
    utc_path = str(root / "utc.parquet")
    pq.write_table(pa.Table.from_pandas(pdf), naive_path)
    utc = pdf.copy()
    utc["ts"] = utc["ts"].dt.tz_localize("UTC")
    pq.write_table(pa.Table.from_pandas(utc), utc_path)
    return spark.read.parquet(naive_path), spark.read.parquet(utc_path)


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            col = pdf[c]
            if getattr(col.dtype, "tz", None) is not None:
                col = col.dt.tz_convert("UTC").dt.tz_localize(None)
            pdf[c] = col.astype("datetime64[us]")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def _assert_same(a, b, float_cols=()):
    a, b = _norm(a.toPandas()), _norm(b.toPandas())
    assert len(a) == len(b)
    assert list(a.columns) == list(b.columns)
    for c in a.columns:
        if c in float_cols:
            assert np.allclose(a[c].fillna(-9e9), b[c].fillna(-9e9)), c
        else:
            assert (a[c].fillna(-1) == b[c].fillna(-1)).all(), c


def test_variant_types_differ_as_expected(ts_variants):
    naive, utc = ts_variants
    kinds = {dict(naive.dtypes)["ts"], dict(utc.dtypes)["ts"]}
    # informational pin of the current environment behavior; operators
    # below must agree regardless
    assert "timestamp" in kinds, kinds


def test_sliding_and_running_windows_both_types(ts_variants):
    from quokka_spark.operators.windows import (sliding_window,
                                                tumbling_window_running)
    naive, utc = ts_variants
    aggs = {"n": "count(*)", "s": "round(sum(value), 4)"}
    _assert_same(sliding_window(naive, "ts", ["user_id"], "30m", aggs),
                 sliding_window(utc, "ts", ["user_id"], "30m", aggs),
                 float_cols=("s",))
    _assert_same(
        tumbling_window_running(naive, "ts", ["user_id"], "1h", aggs),
        tumbling_window_running(utc, "ts", ["user_id"], "1h", aggs),
        float_cols=("s",))


def test_bucketed_sliding_and_session_both_types(ts_variants):
    from quokka_spark.operators.windows import (session_window,
                                                sliding_window_bucketed)
    naive, utc = ts_variants
    aggs = {"n": "count(*)"}
    _assert_same(
        sliding_window_bucketed(naive, "ts", ["user_id"], "30m", aggs, "2h"),
        sliding_window_bucketed(utc, "ts", ["user_id"], "30m", aggs, "2h"))
    _assert_same(session_window(naive, "ts", ["user_id"], "45m", aggs),
                 session_window(utc, "ts", ["user_id"], "45m", aggs))


def test_asof_bucket_both_types(ts_variants):
    from quokka_spark.operators.asof import join_asof
    naive, utc = ts_variants

    def run(df):
        trades = df.filter(F.col("event_type") == "purchase") \
            .select("event_id", "ts", "user_id", "value")
        quotes = df.filter(F.col("event_type") == "view") \
            .select("ts", "user_id", "value")
        return join_asof(trades, quotes, "ts", "ts", "user_id", "user_id",
                         bucket="2h")
    _assert_same(run(naive), run(utc), float_cols=("value", "value_2"))


def test_epoch_seconds_expression_both_types(ts_variants):
    """The ts_cep_funnel entry's seconds conversion — NTZ-safe and
    identical across variants."""
    naive, utc = ts_variants
    expr = "unix_micros(cast(ts as timestamp)) * 1e-6"
    a = naive.selectExpr("event_id", f"{expr} as ts_sec")
    b = utc.selectExpr("event_id", f"{expr} as ts_sec")
    _assert_same(a, b, float_cols=("ts_sec",))


def test_dt_subsecond_fields_both_types(ts_variants):
    """.dt.millisecond/.microsecond over a parquet-read (possibly NTZ)
    column — expression.py:188/191 had a latent NTZ break."""
    from quokka_spark.expression import Expression
    naive, utc = ts_variants

    def run(df):
        ts = Expression(F.col("ts"))
        return df.select(
            "event_id",
            ts.dt.millisecond().column.alias("ms"),
            ts.dt.microsecond().column.alias("us"))
    _assert_same(run(naive), run(utc), float_cols=("ms",))
