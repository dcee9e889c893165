"""Pure-Python local Delta tables (sources/delta_local.py): log
replay, remove semantics, time travel, write/append/overwrite
roundtrips, and the gated unsupported shapes."""

import os

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE


def test_delta_create_read_and_time_travel(spark, qc, tmp_path):
    li = os.path.join(SF_SMOKE, "lineitem.parquet")
    dup = str(tmp_path / "li_dup.parquet")
    os.symlink(li, dup)
    from quokka_spark.sources.delta_local import create_local_delta_table
    tbl = str(tmp_path / "tbl")
    create_local_delta_table(tbl, [[li], [li, dup]])
    n = spark.read.parquet(li).count()
    assert qc.read_delta(tbl, version=0).count() == n
    assert qc.read_delta(tbl).count() == 2 * n          # latest = doubled
    with pytest.raises(ValueError):
        qc.read_delta(tbl, version=7)


def test_delta_remove_action_drops_files(spark, qc, tmp_path):
    li = os.path.join(SF_SMOKE, "lineitem.parquet")
    ord_ = os.path.join(SF_SMOKE, "orders.parquet")
    from quokka_spark.sources.delta_local import create_local_delta_table
    tbl = str(tmp_path / "tbl")
    # v0: both files; v1: orders removed
    create_local_delta_table(tbl, [[li, ord_], [li]])
    n_li = spark.read.parquet(li).count()
    n_ord = spark.read.parquet(ord_).count()
    assert qc.read_delta(tbl, version=0).count() == n_li + n_ord
    assert qc.read_delta(tbl).count() == n_li


def test_delta_write_roundtrip_append_overwrite(spark, qc, tmp_path):
    tbl = str(tmp_path / "w")
    base = qc.read_parquet(os.path.join(SF_SMOKE, "region.parquet"))
    v0 = base.write_delta(tbl)
    assert v0 == 0
    got0 = qc.read_delta(tbl).collect()
    assert len(got0) == base.count()

    v1 = base.write_delta(tbl, mode="append")
    assert v1 == 1
    assert qc.read_delta(tbl).count() == 2 * base.count()
    # time travel back to the single copy
    assert qc.read_delta(tbl, version=0).count() == base.count()

    v2 = base.filter_sql("r_regionkey <= 1").write_delta(tbl,
                                                         mode="overwrite")
    assert v2 == 2
    assert qc.read_delta(tbl).count() == 2
    assert qc.read_delta(tbl, version=1).count() == 2 * base.count()


def test_delta_pushdown_reaches_scan(spark, qc, tmp_path):
    """The replayed file list feeds a NATIVE parquet scan: filters
    must reach the reader exactly as on raw parquet."""
    import contextlib
    import io
    tbl = str(tmp_path / "p")
    qc.read_parquet(os.path.join(SF_SMOKE, "orders.parquet")) \
        .write_delta(tbl)
    ds = qc.read_delta(tbl).filter_sql("o_orderkey < 100") \
        .select(["o_orderkey", "o_custkey"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ds.df.explain(mode="formatted")
    s = buf.getvalue()
    assert "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey" in s
    read_schema = [l for l in s.splitlines() if "ReadSchema" in l][0]
    assert "o_orderdate" not in read_schema


def test_delta_gated_unsupported_shapes(spark, qc, tmp_path):
    import json
    from quokka_spark.sources.delta_local import (create_local_delta_table,
                                                  list_versions)
    li = os.path.join(SF_SMOKE, "lineitem.parquet")
    tbl = str(tmp_path / "g")
    create_local_delta_table(tbl, [[li]])
    # a checkpoint file in the log → clear gate, not wrong answers
    open(os.path.join(tbl, "_delta_log",
                      f"{0:020d}.checkpoint.parquet"), "w").close()
    with pytest.raises(NotImplementedError, match="checkpoint"):
        list_versions(tbl)
    os.remove(os.path.join(tbl, "_delta_log",
                           f"{0:020d}.checkpoint.parquet"))
    # partitioned add action → gate
    with open(os.path.join(tbl, "_delta_log", f"{1:020d}.json"), "w") as fh:
        fh.write(json.dumps({"add": {"path": li, "size": 1,
                                     "modificationTime": 0,
                                     "dataChange": True,
                                     "partitionValues": {"d": "1"}}}) + "\n")
    with pytest.raises(NotImplementedError, match="partitioned"):
        qc.read_delta(tbl)


def test_delta_not_a_table_error(spark, qc, tmp_path):
    with pytest.raises(FileNotFoundError, match="_delta_log"):
        qc.read_delta(str(tmp_path / "nope"))


def test_delta_upsert_merge_semantics(spark, qc, tmp_path):
    """Copy-on-write MERGE: matched keys replaced, unmatched rows
    survive, new keys appended — one atomic version; time travel sees
    the pre-upsert state; untouched files stay referenced as-is."""
    from quokka_spark.sources.delta_local import (list_versions,
                                                  upsert_delta_local)
    tbl = str(tmp_path / "u")
    base = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "k long, v string")
    qc.from_pandas(base.toPandas()).write_delta(tbl)
    upd = spark.createDataFrame(
        [(3, "NEW3"), (7, "NEW7"), (42, "NEW42")], "k long, v string")
    v = upsert_delta_local(spark, tbl, upd, "k")
    assert v == 1 and list_versions(tbl) == [0, 1]
    got = {r["k"]: r["v"] for r in qc.read_delta(tbl).df.collect()}
    assert len(got) == 11
    assert got[3] == "NEW3" and got[7] == "NEW7" and got[42] == "NEW42"
    assert got[0] == "v0" and got[9] == "v9"
    # time travel: pre-upsert state intact
    before = {r["k"]: r["v"] for r in qc.read_delta(tbl, version=0).df.collect()}
    assert before[3] == "v3" and 42 not in before


def test_delta_upsert_append_only_when_no_match(spark, qc, tmp_path):
    from quokka_spark.sources.delta_local import upsert_delta_local
    tbl = str(tmp_path / "u2")
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    qc.from_pandas(base.toPandas()).write_delta(tbl)
    upd = spark.createDataFrame([(2, "b")], "k long, v string")
    upsert_delta_local(spark, tbl, upd, "k")
    got = {r["k"]: r["v"] for r in qc.read_delta(tbl).df.collect()}
    assert got == {1: "a", 2: "b"}


def test_delta_replay_matches_simulation(tmp_path):
    """Property: for random version lists, the replayed live-file set
    equals a straightforward set simulation — no Spark needed, the
    replay is pure Python."""
    import random
    from quokka_spark.sources.delta_local import (_replay,
                                                  create_local_delta_table)
    rng = random.Random(7)
    pool = []
    for i in range(6):
        f = tmp_path / f"f{i}.parquet"
        f.write_bytes(b"x")  # size only; never scanned here
        pool.append(str(f))
    for trial in range(10):
        versions = [sorted(rng.sample(pool, rng.randint(0, len(pool))))
                    for _ in range(rng.randint(1, 5))]
        tbl = str(tmp_path / f"t{trial}")
        create_local_delta_table(tbl, versions)
        for v, expected in enumerate(versions):
            files, _, _ = _replay(tbl, v)
            assert sorted(files) == sorted(
                os.path.abspath(p) for p in expected), (trial, v)
