"""Facade API coverage: the DataStream/QuokkaContext verbs that the
oracle-parity queries don't exercise directly (SURVEY §2.1/2.2/2.9)."""

import os
import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE


def li(qc):
    return qc.read_parquet(f"{SF_SMOKE}/lineitem.parquet")


def test_schema_namelist(qc):
    assert li(qc).schema[:3] == ["l_orderkey", "l_partkey", "l_suppkey"]


def test_with_columns_expression_and_lambda(qc):
    d = li(qc).select(["l_extendedprice", "l_discount"])
    d = d.with_columns({
        "disc_price": d["l_extendedprice"] * (1 - d["l_discount"]),
        "lambda_col": lambda batch: batch["l_extendedprice"] * 2.0,
    })
    pdf = d.limit(50).collect()
    assert np.allclose(pdf["disc_price"],
                       pdf["l_extendedprice"] * (1 - pdf["l_discount"]))
    assert np.allclose(pdf["lambda_col"], pdf["l_extendedprice"] * 2.0)


def test_clip(qc):
    d = li(qc).clip({"l_quantity": (5, 10)})
    pdf = d.select(["l_quantity"]).collect()
    assert pdf["l_quantity"].min() >= 5 and pdf["l_quantity"].max() <= 10


def test_rename_drop_select(qc):
    d = li(qc).rename({"l_quantity": "qty"}).drop(["l_tax"])
    assert "qty" in d.schema and "l_quantity" not in d.schema
    assert "l_tax" not in d.schema


def test_transform_batch_udf(qc):
    d = li(qc).transform(
        lambda pdf: pd.DataFrame({
            "ok": pdf["l_orderkey"],
            "double_qty": pdf["l_quantity"] * 2}),
        new_schema="ok long, double_qty double",
        required_columns=["l_orderkey", "l_quantity"])
    pdf = d.collect()
    assert list(pdf.columns) == ["ok", "double_qty"]
    assert len(pdf) == 6000


def test_stateful_transform_keyed(qc):
    from quokka_spark import Executor

    class SumExecutor(Executor):
        def __init__(self):
            self.state = 0.0

        def execute(self, batches, stream_id, executor_id):
            for b in batches:
                self.state += float(b["l_quantity"].sum())
            return None

        def done(self, executor_id):
            return pd.DataFrame({"total_qty": [self.state]})

    d = li(qc).stateful_transform(
        SumExecutor, new_schema="l_returnflag string, total_qty double",
        required_columns=["l_quantity"], by="l_returnflag")
    # keyed applyInPandas injects the key via grouping; executor returns
    # only its own columns -> schema must include the key? verify output
    pdf = d.collect()
    assert set(pdf.columns) == {"l_returnflag", "total_qty"}


def test_cogroup(qc):
    from quokka_spark import Executor

    class JoinCount(Executor):
        def execute(self, batches, stream_id, executor_id):
            left, right = batches
            return pd.DataFrame({
                "n_left": [len(left)], "n_right": [len(right)]})

        def done(self, executor_id):
            return None

    orders = qc.read_parquet(f"{SF_SMOKE}/orders.parquet") \
        .rename({"o_custkey": "custkey"})
    cust = qc.read_parquet(f"{SF_SMOKE}/customer.parquet") \
        .rename({"c_custkey": "custkey"})
    out = orders.cogroup(cust, JoinCount, on="custkey",
                         new_schema="custkey long, n_left long, n_right long")
    pdf = out.collect()
    assert pdf["n_right"].max() <= 1  # custkey unique in customer


def test_write_read_csv_roundtrip(qc):
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "out_csv")
        files = li(qc).select(["l_orderkey", "l_quantity"]) \
            .write_csv(path, output_line_limit=2000)
        names = files.collect()
        assert len(names) >= 1 and names["filename"].str.contains("csv").any()
        back = qc.read_csv(path, has_header=True)
        assert back.count() == 6000


def test_write_parquet_roundtrip(qc):
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "out_pq")
        li(qc).write_parquet(path)
        back = qc.read_parquet(path)
        assert back.count() == 6000
        assert set(back.schema) == set(li(qc).schema)


def test_read_json(qc):
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "x.json")
        with open(p, "w") as f:
            f.write('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
        d = qc.read_json(p)
        assert d.count() == 2 and set(d.schema) == {"a", "b"}


def test_read_files_binary(qc):
    with tempfile.TemporaryDirectory() as tmp:
        for i in range(3):
            with open(os.path.join(tmp, f"f{i}.bin"), "wb") as f:
                f.write(bytes([i] * 10))
        d = qc.read_files(tmp)
        pdf = d.collect()
        assert len(pdf) == 3
        assert set(d.schema) == {"filename", "object"}
        assert all(len(b) == 10 for b in pdf["object"])


def test_from_pandas_and_broadcast_join(qc):
    small = qc.from_pandas(pd.DataFrame({"l_returnflag": ["A", "N", "R"],
                                         "flag_name": ["acc", "none", "ret"]}))
    assert small.materialized
    d = li(qc).join(small, on="l_returnflag")
    assert "flag_name" in d.schema
    assert d.count() == 6000


def test_compute_caches(qc):
    d = li(qc).filter_sql("l_quantity > 25").compute()
    assert d.materialized
    assert qc.read_dataset(d) is d
    assert d.count() == d.count()
    d.df.unpersist()


def test_count_sum_min_max_mean(qc):
    d = li(qc)
    assert d.count() == 6000
    s = d.sum(["l_quantity"]).collect()
    assert abs(s["l_quantity_sum"][0] - 6000 * s0_mean(d)) < 1e-6


def s0_mean(d):
    return d.mean(["l_quantity"]).collect()["l_quantity_mean"][0]


def test_approximate_quantile(qc):
    res = li(qc).approximate_quantile(
        ["l_quantity", "l_extendedprice"], [0.25, 0.5, 0.75],
        relative_error=1e-4)
    assert set(res) == {"l_quantity", "l_extendedprice"}
    exact = li(qc).df.selectExpr(
        "percentile(l_quantity, 0.5) as m").collect()[0]["m"]
    assert abs(res["l_quantity"][1] - exact) <= 1.0


def test_union_intersect_except(qc):
    # (l_orderkey, l_linenumber, l_quantity) distinct row identity
    cols = ["l_orderkey", "l_linenumber", "l_quantity"]
    a = li(qc).filter_sql("l_quantity <= 25").select(cols).drop_duplicates()
    b = li(qc).filter_sql("l_quantity > 20").select(cols).drop_duplicates()
    n_a, n_b = a.count(), b.count()
    assert a.union(b).count() == n_a + n_b  # bag union
    both = a.intersect(b).count()
    expected = li(qc).filter_sql("l_quantity > 20 and l_quantity <= 25") \
        .select(cols).drop_duplicates().count()
    assert both == expected
    assert a.except_(b).count() == n_a - both


def test_sql_entry(qc):
    out = qc.sql(
        "SELECT l_returnflag, count(*) AS n FROM li GROUP BY l_returnflag",
        tables={"li": li(qc)})
    pdf = out.collect()
    assert pdf["n"].sum() == 6000


def test_vector_nn_join_facade(qc):
    emb = qc.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    probes = emb.df.filter(F.col("vec_id") < 3)
    out = emb.vector_nn_join(probes, "embedding", k=3)
    pdf = out.collect()
    assert set(pdf["probe_id"]) == {0, 1, 2}
    assert (pdf.groupby("probe_id").size() == 3).all()
    # self-similarity must rank first
    top = pdf[pdf["rank"] == 1]
    assert (top["probe_id"] == top["vec_id"]).all()


def test_expression_dt_namespace(qc):
    ev = qc.read_parquet(f"{SF_SMOKE}/events.parquet")
    d = ev.with_columns({
        "y": ev["ts"].dt.year(), "m": ev["ts"].dt.month(),
        "shifted": ev["ts"].dt.offset_by(1, "day"),
    })
    pdf = d.limit(10).collect()
    assert (pdf["y"] == 2024).all()
    assert ((pdf["shifted"] - pdf["ts"]).dt.days == 1).all()


def test_transform_sql(qc):
    d = li(qc).transform_sql(
        "l_returnflag, round(sum(l_extendedprice), 2) as total",
        groupby=["l_returnflag"])
    pdf = d.collect()
    assert set(pdf.columns) == {"l_returnflag", "total"}
    assert len(pdf) == 3


def test_mingle_multi_stream(qc):
    import pandas as pd
    from quokka_spark import Executor

    class SpreadExecutor(Executor):
        """Per-user difference between stream-0 mean and stream-1 mean."""

        def execute(self, batches, stream_id, executor_id):
            pdf = pd.concat(batches)
            m0 = pdf.loc[pdf["__stream_id__"] == 0, "value"].mean()
            m1 = pdf.loc[pdf["__stream_id__"] == 1, "value"].mean()
            return pd.DataFrame({"spread": [round(float(m0 - m1), 4)]})

        def done(self, executor_id):
            return None

    ev = qc.read_parquet(f"{SF_SMOKE}/events.parquet")
    views = ev.filter_sql("event_type = 'view'")
    clicks = ev.filter_sql("event_type = 'click'")
    out = qc.mingle([views, clicks], SpreadExecutor,
                    new_schema="user_id long, spread double",
                    required_columns=["user_id", "value"], by="user_id")
    pdf = out.collect()
    assert set(pdf.columns) == {"user_id", "spread"}
    assert len(pdf) > 0


def test_join_condition_pure_theta(qc):
    """condition= with no equi keys: pure theta join (small broadcast
    side). Verified against a pandas cross-merge filter."""
    left = qc.from_pandas(pd.DataFrame({"a": [1, 5, 10]}))
    right = qc.from_pandas(pd.DataFrame({"lo": [0, 4], "hi": [2, 6]}))
    out = left.join(right, condition="a between lo and hi").collect()
    got = set(map(tuple, out[["a", "lo", "hi"]].values.tolist()))
    assert got == {(1, 0, 2), (5, 4, 6)}


def test_join_condition_callable_and_semi(qc):
    """condition= as (left_df, right_df) -> Column; semi keeps only left
    columns and dedups matches."""
    left = qc.from_pandas(
        pd.DataFrame({"k": [1, 1, 2, 3], "v": [10.0, 20.0, 30.0, 40.0]}))
    right = qc.from_pandas(
        pd.DataFrame({"k": [1, 2, 2], "thresh": [15.0, 25.0, 5.0]}))
    out = left.join(right, on="k",
                    condition=lambda l, r: l["v"] > r["thresh"],
                    how="semi").collect()
    assert list(out.columns) == ["k", "v"]
    assert set(map(tuple, out.values.tolist())) == {(1, 20.0), (2, 30.0)}


def test_join_condition_equi_residual_dedups_key(qc):
    """on= + condition: the same-named equi key appears once in output
    (matching plain on= string-join behavior)."""
    left = qc.from_pandas(pd.DataFrame({"k": [1, 2], "x": [1.0, 2.0]}))
    right = qc.from_pandas(pd.DataFrame({"k": [1, 2], "y": [5.0, 0.5]}))
    out = left.join(right, on="k", condition="y > x").collect()
    assert list(out.columns) == ["k", "x", "y"]
    assert set(map(tuple, out.values.tolist())) == {(1, 1.0, 5.0)}


def test_expression_dt_weekday_iso(qc):
    """ISO weekday Monday=1..Sunday=7 (DuckDB isodow / polars
    dt.weekday parity — NOT Spark dayofweek's Sunday=1)."""
    ev = qc.read_parquet(f"{SF_SMOKE}/events.parquet")
    d = ev.with_columns({"wd": ev["ts"].dt.weekday()})
    pdf = d.select(["ts", "wd"]).limit(200).collect()
    expected = pdf["ts"].dt.dayofweek + 1  # pandas: Monday=0
    assert (pdf["wd"] == expected).all(), \
        pdf[pdf["wd"] != expected].head()


def test_read_iceberg_clean_error_without_runtime(qc):
    """No iceberg-spark runtime jar in this environment: the failure
    mode must be a clean RuntimeError naming the missing jar (not an
    opaque ClassNotFound mid-analysis). With the jar present this test
    would be replaced by a warehouse round-trip."""
    with pytest.raises((RuntimeError, Exception)) as ei:
        qc.read_iceberg("nosuch.catalog.table").df.collect()
    msg = str(ei.value)
    assert "iceberg" in msg.lower()


def test_get_set_config(qc):
    qc.set_config("spark.sql.shuffle.partitions", "16")
    assert qc.get_config("spark.sql.shuffle.partitions") == "16"
    qc.set_config("spark.sql.shuffle.partitions", "32")


def test_read_ray_dataset_clean_error(qc):
    """ray is absent here: non-Dataset input raises TypeError; a
    Dataset whose refs are true ObjectRefs (not local tables) raises
    RuntimeError naming the parquet fallback."""
    with pytest.raises(TypeError):
        qc.read_ray_dataset(object())

    class FakeRayDs:
        def to_arrow_refs(self):
            return [object()]  # ObjectRef-shaped: needs ray to resolve

    with pytest.raises(RuntimeError) as ei:
        qc.read_ray_dataset(FakeRayDs())
    assert "parquet" in str(ei.value)


def test_collect_as_polars_gated(qc):
    d = li(qc).select(["l_orderkey"]).limit(5)
    assert len(d.collect()) == 5  # pandas default
    try:
        import polars  # noqa: F401
        has_polars = True
    except ImportError:
        has_polars = False
    if has_polars:
        out = d.collect(as_polars=True)
        assert out.__class__.__module__.startswith("polars")
    else:
        with pytest.raises(RuntimeError):
            d.collect(as_polars=True)


def test_join_condition_outer_coalesces_key(qc):
    """on= + condition with how=outer/right: right-only rows carry their
    key in the single deduped key column (round-3 advice: the right key
    was dropped without coalescing, so right-only rows came out with a
    NULL key, diverging from the plain on="k" string-join path)."""
    left = qc.from_pandas(pd.DataFrame({"k": [1, 2], "x": [1.0, 2.0]}))
    right = qc.from_pandas(pd.DataFrame({"k": [2, 3], "y": [0.5, 9.0]}))
    out = left.join(right, on="k", condition="y > x", how="outer").collect()
    assert list(out.columns) == ["k", "x", "y"]
    got = {tuple(None if pd.isna(v) else round(float(v), 3) for v in row)
           for row in out[["k", "x", "y"]].itertuples(index=False)}
    # k=1: left-only (no match); k=2: condition fails -> both sides
    # unmatched; k=3: right-only — key must survive as 3, not NULL
    assert got == {(1.0, 1.0, None), (2.0, 2.0, None), (2.0, None, 0.5),
                   (3.0, None, 9.0)}, got


def test_read_ray_dataset_local_arrow_tables(qc):
    """read_ray_dataset consumes to_arrow_refs() results that are
    already local Arrow tables (ray.get is identity on local objects),
    so the ingestion plumbing runs without the ray package; true
    ObjectRefs still require ray (clean RuntimeError)."""
    import pyarrow as pa

    class FakeRayDataset:
        def to_arrow_refs(self):
            return [pa.table({"a": [1, 2], "b": ["x", "y"]}),
                    pa.table({"a": [3], "b": ["z"]})]

    out = qc.read_ray_dataset(FakeRayDataset()).collect()
    assert list(out.columns) == ["a", "b"]
    assert sorted(out["a"].tolist()) == [1, 2, 3]


def test_observe_metrics_free_during_action(spark, qc):
    """observe() records stage metrics via accumulators during the
    same job — no second scan; read back through the context."""
    ds = qc.read_parquet("/root/testdata/sf0.001/documents.parquet")
    observed = ds.observe("prep", {"n_rows": "count(*)",
                                   "total_chars": "sum(n_chars)"})
    filtered = observed.filter_sql("n_chars > 100")
    out = filtered.collect()
    m = qc.observed_metrics("prep")
    n_total = ds.count()
    assert m["n_rows"] == n_total                  # pre-filter count
    assert m["total_chars"] > 0
    assert 0 < len(out) < n_total                  # filter applied after


def test_llm_pipeline_verbs_chain_on_the_stream(spark, qc):
    """The facade vocabulary chains reference-style: cap → quality
    annotate → sample → split, one fluent expression, delegating to
    the oracle-gated functions."""
    ds = qc.read_parquet("/root/testdata/sf0.001/documents.parquet")
    out = (ds.cap_per_key("source", "doc_id", 10, salt="v")
           .with_quality_columns()
           .with_readability()
           .hash_sample("doc_id", 0.5, salt="v2")
           .split_by_hash("doc_id", {"train": 0.8, "test": 0.2}))
    pdf = out.collect()
    assert {"n_words", "gopher_pass", "flesch", "split"} <= set(pdf.columns)
    assert 0 < len(pdf) < 200
    assert set(pdf["split"].unique()) <= {"train", "test"}
    # dedup verbs return streams too
    assert qc.read_parquet("/root/testdata/sf0.001/documents.parquet") \
        .dedup_exact().count() > 0


def test_grouping_sets_facade_matches_sql_plan(spark, qc):
    """DataStream.grouping_sets must produce the same rows AND the
    same physical plan shape (one Expand + partial->final aggregate,
    one exchange) as the SQL front end's GROUP BY GROUPING SETS."""
    import __spark_entry__ as em
    from conftest import SF_SMOKE
    facade = em.op_grouping_sets_facade(spark, SF_SMOKE)
    via_sql = em.op_grouping_sets(spark, SF_SMOKE)
    key = lambda pdf: sorted(
        map(tuple, pdf.fillna("~").values.tolist()))
    assert key(facade.toPandas()) == key(via_sql.toPandas())
    plan = facade._jdf.queryExecution().executedPlan().toString()
    # AQE repeats the tree under "== Initial Plan =="; pin the final one
    plan = plan.split("== Initial Plan ==")[0]
    assert plan.count("Expand") == 1
    assert "HashAggregate" in plan
    assert plan.count("Exchange") == 1          # one shuffle, no extras


def test_c4_filter_and_bpe_encode_verbs_chain(spark, qc):
    """The new facade verbs compose with the rest of the vocabulary:
    C4-clean (with injected line structure), then tokenize with a
    trained merge table — one fluent expression."""
    from quokka_spark.functions.packing import bpe_train
    ds = qc.read_parquet("/root/testdata/sf0.001/documents.parquet")
    # the synthetic corpus is unpunctuated: give c4_filter real lines
    staged = ds.with_columns_sql(
        "replace(text, ' table ', '.' || chr(10)) as text2") \
        .drop(["text"]).rename({"text2": "text"})
    cleaned = staged.c4_filter()
    pdf = cleaned.collect()
    assert 0 < len(pdf) < 500 and "text" in pdf.columns
    assert "clean_text" not in pdf.columns  # replaced in place

    merges, _ = bpe_train(ds.df, "text", num_merges=10)
    enc = cleaned.bpe_encode(merges).collect()
    assert {"doc_id", "tokens", "n_tokens"} <= set(enc.columns)
    assert (enc["n_tokens"] > 0).all()


def test_write_jsonl_roundtrip_and_sharding(spark, qc, tmp_path):
    """write_jsonl: newline-JSON roundtrip through read_json, shard
    size bounded by output_line_limit, gzip variant readable."""
    import glob
    ds = qc.read_parquet("/root/testdata/sf0.001/documents.parquet") \
           .select(["doc_id", "source", "lang"])
    out = str(tmp_path / "jl")
    files = ds.write_jsonl(out, output_line_limit=100)
    assert files.count() >= 1
    back = qc.read_json(out).collect()
    orig = ds.collect()
    assert len(back) == len(orig)
    assert set(back["doc_id"]) == set(orig["doc_id"])
    for f in glob.glob(out + "/*.json"):
        assert sum(1 for _ in open(f)) <= 100
    gz = str(tmp_path / "jlgz")
    ds.write_jsonl(gz, compression="gzip")
    assert len(qc.read_json(gz).collect()) == len(orig)
