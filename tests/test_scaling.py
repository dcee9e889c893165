"""plans/scaling helpers + the BASELINE.md wide-quantile target."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from conftest import SF_SMOKE


def test_salted_aggregate_matches_plain(spark, qc):
    from quokka_spark.plans.scaling import salted_aggregate
    ev = qc.read_parquet(f"{SF_SMOKE}/events.parquet").df
    salted = salted_aggregate(
        ev, ["event_type"],
        {"total": ("sum", "value"), "n": ("count", "value"),
         "mx": ("max", "value")},
        n_salts=8).toPandas().sort_values("event_type").reset_index(drop=True)
    plain = ev.groupBy("event_type").agg(
        F.sum("value").alias("total"), F.count("value").alias("n"),
        F.max("value").alias("mx")).toPandas() \
        .sort_values("event_type").reset_index(drop=True)
    assert np.allclose(salted["total"], plain["total"])
    assert (salted["n"] == plain["n"]).all()
    assert np.allclose(salted["mx"], plain["mx"])


def test_skew_report(spark, qc):
    from quokka_spark.plans.scaling import skew_report
    ev = qc.read_parquet(f"{SF_SMOKE}/events.parquet").df
    topk, ratio = skew_report(ev, "event_type")
    assert len(topk) == 5
    assert ratio >= 1.0


def test_co_partition_one_shuffle(spark, qc):
    """With broadcast off (the 100 TB fact-fact case), a join on
    co-partitioned inputs must reuse the two explicit hash exchanges —
    no third join-induced shuffle."""
    import contextlib, io
    from quokka_spark.plans.scaling import co_partition
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = qc.read_parquet(f"{SF_SMOKE}/orders.parquet").df
        li = qc.read_parquet(f"{SF_SMOKE}/lineitem.parquet").df
        l, r = co_partition(li, orders, "l_orderkey", "o_orderkey", 8)
        joined = l.join(r, l["l_orderkey"] == r["o_orderkey"])
        assert joined.count() == li.count()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain(mode="simple")
        s = buf.getvalue()
        assert s.count("Exchange hashpartitioning") == 2, s
        assert "SortMergeJoin" in s or "ShuffledHashJoin" in s
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_wide_approximate_quantile_completes(spark, qc):
    """BASELINE.md target 3: wide-column approximate quantiles must
    complete (the reference cites Spark approxQuantile 'crashing' at
    10k columns — blog/approxquant.md:19-31; our column-group batching
    is the mitigation). 200 columns here keeps test wall-clock sane
    while exercising the batching path (batch size 256 > 200 > one
    call)."""
    n_cols = 200
    rng = np.random.default_rng(0)
    pdf = pd.DataFrame(rng.standard_normal((2000, n_cols)),
                       columns=[f"c{i}" for i in range(n_cols)])
    ds = qc.from_pandas(pdf)
    res = ds.approximate_quantile([f"c{i}" for i in range(n_cols)],
                                  [0.25, 0.5, 0.75], relative_error=0.01)
    assert len(res) == n_cols
    med = np.array([res[f"c{i}"][1] for i in range(n_cols)])
    assert np.abs(med).max() < 0.2  # standard normal medians ≈ 0
