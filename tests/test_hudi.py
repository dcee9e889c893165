"""Pure-Python local Hudi CoW tables (sources/hudi_local.py): timeline
replay, file-group slice supersession, replacecommit, time travel,
write/overwrite roundtrips, and the gated MERGE_ON_READ shapes."""

import os

import pandas as pd
import pytest

from conftest import SF_SMOKE

from quokka_spark.sources.hudi_local import (commit_hudi_local,
                                             hudi_live_files,
                                             write_hudi_local)


def test_hudi_commit_read_and_group_supersession(spark, qc, tmp_path):
    """The newest base file per (partition, fileId) wins: committing a
    new slice for an existing group supersedes its previous base file;
    other groups are untouched."""
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    a2 = str(tmp_path / "a2.parquet")
    pd.DataFrame({"id": [1, 2]}).to_parquet(a)
    pd.DataFrame({"id": [10, 11, 12]}).to_parquet(b)
    pd.DataFrame({"id": [1, 2, 3]}).to_parquet(a2)  # group g1 updated
    tbl = str(tmp_path / "tbl")
    t1 = commit_hudi_local(tbl, {"": [("g1", a), ("g2", b)]})
    assert sorted(r["id"] for r in qc.read_hudi(tbl).df.collect()) == \
        [1, 2, 10, 11, 12]
    t2 = commit_hudi_local(tbl, {"": [("g1", a2)]})
    assert t2 > t1
    assert sorted(r["id"] for r in qc.read_hudi(tbl).df.collect()) == \
        [1, 2, 3, 10, 11, 12]
    # time travel to the first instant
    assert sorted(r["id"] for r in
                  qc.read_hudi(tbl, as_of=t1).df.collect()) == \
        [1, 2, 10, 11, 12]
    with pytest.raises(ValueError, match="no completed commit"):
        qc.read_hudi(tbl, as_of="0")


def test_hudi_replacecommit_drops_groups(spark, qc, tmp_path):
    """A replacecommit kills the named file groups (insert_overwrite /
    clustering) while its own write stats add the successors."""
    a = str(tmp_path / "a.parquet")
    c = str(tmp_path / "c.parquet")
    pd.DataFrame({"id": [1, 2]}).to_parquet(a)
    pd.DataFrame({"id": [7]}).to_parquet(c)
    tbl = str(tmp_path / "tbl")
    commit_hudi_local(tbl, {"": [("g1", a)]})
    commit_hudi_local(tbl, {"": [("g3", c)]}, replaces={"": ["g1"]})
    assert [r["id"] for r in qc.read_hudi(tbl).df.collect()] == [7]
    assert len(hudi_live_files(tbl)) == 1


def test_hudi_write_roundtrip_and_overwrite(spark, qc, tmp_path):
    tbl = str(tmp_path / "w")
    base = qc.read_parquet(os.path.join(SF_SMOKE, "region.parquet"))
    t1 = base.write_hudi(tbl)
    assert qc.read_hudi(tbl).count() == base.count()
    t2 = base.write_hudi(tbl, mode="append")
    assert t2 > t1
    assert qc.read_hudi(tbl).count() == 2 * base.count()
    base.filter_sql("r_regionkey <= 1").write_hudi(tbl, mode="overwrite")
    assert qc.read_hudi(tbl).count() == 2
    # time travel still sees the doubled state
    assert qc.read_hudi(tbl, as_of=t2).count() == 2 * base.count()


def test_hudi_pushdown_reaches_scan(spark, qc, tmp_path):
    """The resolved file list feeds a NATIVE parquet scan: filters and
    column pruning reach the reader exactly as on raw parquet."""
    import contextlib
    import io
    tbl = str(tmp_path / "p")
    qc.read_parquet(os.path.join(SF_SMOKE, "orders.parquet")) \
        .write_hudi(tbl)
    ds = qc.read_hudi(tbl).filter_sql("o_orderkey < 100") \
        .select(["o_orderkey", "o_custkey"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ds.df.explain(mode="formatted")
    s = buf.getvalue()
    assert "PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey" in s
    read_schema = [line for line in s.splitlines() if "ReadSchema" in line][0]
    assert "o_orderdate" not in read_schema


def test_hudi_merge_on_read_gated(spark, qc, tmp_path):
    """MoR tables must refuse loudly — scanning base files without
    merging the log files would silently serve stale rows."""
    a = str(tmp_path / "a.parquet")
    pd.DataFrame({"id": [1]}).to_parquet(a)
    tbl = str(tmp_path / "mor")
    commit_hudi_local(tbl, {"": [("g1", a)]})
    props = os.path.join(tbl, ".hoodie", "hoodie.properties")
    with open(props, "w") as fh:
        fh.write("hoodie.table.type=MERGE_ON_READ\n")
    with pytest.raises(NotImplementedError, match="MERGE_ON_READ"):
        qc.read_hudi(tbl)
    # a deltacommit in a CoW-marked timeline is also refused
    with open(props, "w") as fh:
        fh.write("hoodie.table.type=COPY_ON_WRITE\n")
    with open(os.path.join(tbl, ".hoodie", "99999999999999999.deltacommit"),
              "w") as fh:
        fh.write("{}")
    with pytest.raises(NotImplementedError, match="deltacommit"):
        qc.read_hudi(tbl)


def test_hudi_not_a_table_is_clear_error(qc, tmp_path):
    with pytest.raises(FileNotFoundError, match="not a Hudi table"):
        qc.read_hudi(str(tmp_path / "nope"))


def test_hudi_instants_order_numerically(spark, qc, tmp_path):
    """Instant '10' replays AFTER instant '2' (numeric order, not
    lexicographic) — regression: sorted() put '10' first, so the
    older slice won the group and latest disagreed with as_of."""
    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pd.DataFrame({"id": [1]}).to_parquet(a)
    pd.DataFrame({"id": [2]}).to_parquet(b)
    tbl = str(tmp_path / "tbl")
    commit_hudi_local(tbl, {"": [("g1", a)]}, instant="2")
    commit_hudi_local(tbl, {"": [("g1", b)]}, instant="10")
    assert [r["id"] for r in qc.read_hudi(tbl).df.collect()] == [2]
    assert [r["id"] for r in
            qc.read_hudi(tbl, as_of="10").df.collect()] == [2]
    assert [r["id"] for r in
            qc.read_hudi(tbl, as_of="2").df.collect()] == [1]


def test_hudi_writer_refuses_mor(spark, qc, tmp_path):
    """The WRITER gates MERGE_ON_READ too — committing CoW instants
    into a MoR timeline would corrupt it for real readers."""
    a = str(tmp_path / "a.parquet")
    pd.DataFrame({"id": [1]}).to_parquet(a)
    tbl = str(tmp_path / "mor2")
    commit_hudi_local(tbl, {"": [("g1", a)]})
    with open(os.path.join(tbl, ".hoodie", "hoodie.properties"), "w") as fh:
        fh.write("hoodie.table.type=MERGE_ON_READ\n")
    with pytest.raises(NotImplementedError, match="MERGE_ON_READ"):
        commit_hudi_local(tbl, {"": [("g2", a)]})
    with pytest.raises(NotImplementedError, match="MERGE_ON_READ"):
        write_hudi_local(spark.range(1), tbl)


def test_hudi_compact_and_clean(spark, qc, tmp_path):
    """Compaction rewrites the live rows into right-sized groups via
    ONE replacecommit (time travel still sees the old layout); clean
    then reclaims table-local files no kept instant references."""
    from quokka_spark.sources.hudi_local import (clean_hudi_local,
                                                 compact_hudi_local,
                                                 hudi_live_files)
    tbl = str(tmp_path / "c")
    base = qc.read_parquet(os.path.join(SF_SMOKE, "region.parquet"))
    write_hudi_local(base.df.repartition(4), tbl)       # 4 small groups
    t2 = write_hudi_local(base.df.repartition(3), tbl)  # + 3 more
    assert len(hudi_live_files(tbl)) == 7
    tc = compact_hudi_local(spark, tbl, target_file_rows=10_000)
    assert int(tc) > int(t2)
    assert len(hudi_live_files(tbl)) == 1
    assert qc.read_hudi(tbl).count() == 2 * base.count()
    # time travel pre-compaction still sees the old layout
    assert len(hudi_live_files(tbl, as_of=t2)) == 7
    n = clean_hudi_local(tbl, keep_last=1)
    assert n == 7
    assert qc.read_hudi(tbl).count() == 2 * base.count()
