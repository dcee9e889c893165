"""Automatic Delta checkpointing on the write path (round 10).

Without it, a long-running streaming sink accumulates one JSON commit
per batch and every ``last_txn_version`` handshake (and every read)
replays O(total batches) JSON — O(n²) over the sink's lifetime. The
jar checkpoints every ``delta.checkpointInterval`` commits (default
10); so do we, at the ``_commit`` chokepoint, which covers append /
overwrite / upsert / DV delete / compaction / the streaming sink.
"""
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _json_versions(tbl):
    from quokka_spark.sources.delta_local import _scan_log
    return _scan_log(tbl)[0]


def _checkpoint_versions(tbl):
    from quokka_spark.sources.delta_local import _scan_log
    return sorted(_scan_log(tbl)[1])


def test_auto_checkpoint_on_interval_boundary(spark, qc, tmp_path):
    """21 plain write_delta_local commits → checkpoints appear at v10
    and v20 without any explicit write_checkpoint_local call;
    _last_checkpoint points at the newest; reads stay exact."""
    import json as _json

    from quokka_spark.sources.delta_local import write_delta_local
    tbl = str(tmp_path / "t")
    for i in range(21):
        write_delta_local(
            spark.createDataFrame([(i, float(i))], "id long, v double")
            .coalesce(1), tbl, mode="append")
    assert _checkpoint_versions(tbl) == [10, 20]
    with open(os.path.join(tbl, "_delta_log", "_last_checkpoint")) as fh:
        assert _json.load(fh)["version"] == 20
    got = sorted(r["id"] for r in qc.read_delta(tbl).df.collect())
    assert got == list(range(21))
    # time travel to a pre-checkpoint version still works (JSON kept)
    assert qc.read_delta(tbl, version=4).df.count() == 5


def test_auto_checkpoint_honors_table_interval_config(spark, tmp_path):
    """delta.checkpointInterval in the table configuration overrides
    the default-10 cadence; ≤0 disables."""
    from quokka_spark.sources.delta_local import (_commit, _meta_actions,
                                                  write_delta_local)
    tbl = str(tmp_path / "t")
    df = spark.createDataFrame([(1,)], "id long").coalesce(1)
    write_delta_local(df, tbl, mode="append")
    # inject the config via a metaData recommit (flows through _commit,
    # which is where the interval cache refreshes)
    meta = _meta_actions(df.schema.json())[1]
    meta["metaData"]["configuration"] = {"delta.checkpointInterval": "3"}
    _commit(tbl, 1, [meta])
    for _ in range(5):
        write_delta_local(df, tbl, mode="append")
    assert _checkpoint_versions(tbl) == [3, 6]

    tbl2 = str(tmp_path / "t2")
    write_delta_local(df, tbl2, mode="append")
    meta2 = _meta_actions(df.schema.json())[1]
    meta2["metaData"]["configuration"] = {"delta.checkpointInterval": "0"}
    _commit(tbl2, 1, [meta2])
    for _ in range(10):
        write_delta_local(df, tbl2, mode="append")
    assert _checkpoint_versions(tbl2) == []


def test_200_batch_sink_bounded_handshake(spark, qc, tmp_path, monkeypatch):
    """200 micro-batches through the streaming sink's exact per-batch
    path (_should_commit_batch guard + write_delta_local txn commit):
    checkpoints accumulate every 10 commits, and the per-batch
    handshake reads at most `interval` trailing JSON commits — the
    O(n²) lifetime term the auto-checkpoint exists to kill. The data
    files are committed referenced-in-place so 200 batches don't cost
    200 distributed writes; the LOG shape (one txn+add commit per
    batch) is byte-identical to the sink's."""
    import quokka_spark.sources.delta_local as dl
    from quokka_spark.streaming.stream import _should_commit_batch

    tbl = str(tmp_path / "sink")
    os.makedirs(tbl)
    data = str(tmp_path / "batch.parquet")
    spark.createDataFrame([(1, 1.0)], "id long, v double") \
        .coalesce(1).write.parquet(str(tmp_path / "d"))
    part = [f for f in os.listdir(str(tmp_path / "d"))
            if f.endswith(".parquet")][0]
    os.rename(os.path.join(str(tmp_path / "d"), part), data)
    schema_json = spark.read.parquet(data).schema.json()

    real_vp = dl._version_path
    counter = {"n": 0}

    def counting_vp(table, v):
        counter["n"] += 1
        return real_vp(table, v)

    max_tail_reads = 0
    for bid in range(200):
        assert _should_commit_batch(tbl, "app", bid) is True
        # distinct file per batch (hardlink — same bytes, new path;
        # adds with a repeated path key would REPLACE, not append)
        bdata = os.path.join(tbl, f"batch-{bid:05d}.parquet")
        os.link(data, bdata)
        actions = dl._meta_actions(schema_json) if bid == 0 else []
        actions.append(dl._add_action(tbl, bdata))
        actions.append({"txn": {"appId": "app", "version": bid,
                                "lastUpdated": 0}})
        dl._commit(tbl, bid, actions)
        # measure the NEXT handshake's JSON reads (what every
        # redelivery / restart / next batch pays)
        monkeypatch.setattr(dl, "_version_path", counting_vp)
        counter["n"] = 0
        assert dl.last_txn_version(tbl, "app") == bid
        max_tail_reads = max(max_tail_reads, counter["n"])
        monkeypatch.setattr(dl, "_version_path", real_vp)

    assert _checkpoint_versions(tbl) == list(range(10, 200, 10))
    # the pin: bounded by the interval, NOT by total batch count
    assert max_tail_reads <= 10, max_tail_reads
    assert _should_commit_batch(tbl, "app", 150) is False
    assert _should_commit_batch(tbl, "app", 200) is True
    # log cleanup below the newest checkpoint: reads + handshake live on
    for v in range(190):
        p = real_vp(tbl, v)
        if os.path.exists(p):
            os.remove(p)
    assert dl.last_txn_version(tbl, "app") == 199
    assert qc.read_delta(tbl).df.count() == 200


def test_real_streaming_run_crosses_checkpoint_boundary(spark, qc,
                                                        tmp_path):
    """A REAL streaming_write_delta run with 12 one-file micro-batches
    leaves an auto-checkpoint at v10 in the sink's log — no manual
    write_checkpoint_local anywhere."""
    from quokka_spark.streaming.stream import streaming_write_delta
    src = str(tmp_path / "src")
    chk = str(tmp_path / "chk")
    tbl = str(tmp_path / "sink")
    sch = "id long, v double"
    os.makedirs(src)
    for i in range(12):
        spark.createDataFrame([(i, float(i))], sch).coalesce(1) \
            .write.mode("append").parquet(src)
    stream = spark.readStream.schema(
        spark.createDataFrame([], sch).schema) \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = streaming_write_delta(stream, tbl, chk, app_id="t") \
        .trigger(availableNow=True).start()
    q.awaitTermination(180)
    assert 10 in _checkpoint_versions(tbl)
    assert sorted(r["id"] for r in qc.read_delta(tbl).df.collect()) == \
        list(range(12))


def test_auto_checkpoint_failure_warns_not_raises(spark, tmp_path,
                                                  monkeypatch):
    """The data commit already succeeded atomically — a checkpoint
    failure must warn and leave the table readable, not fail the
    batch."""
    import quokka_spark.sources.delta_local as dl
    tbl = str(tmp_path / "t")
    df = spark.createDataFrame([(1,)], "id long").coalesce(1)
    for _ in range(10):
        dl.write_delta_local(df, tbl, mode="append")

    def boom(table, version=None):
        raise RuntimeError("disk full")

    monkeypatch.setattr(dl, "write_checkpoint_local", boom)
    with pytest.warns(RuntimeWarning, match="auto-checkpoint"):
        dl.write_delta_local(df, tbl, mode="append")  # v10 boundary
    monkeypatch.undo()
    assert len(_json_versions(tbl)) == 11
    assert _checkpoint_versions(tbl) == []
