"""Commit-count scale probe (tier 3, round 10) — the offline harness
behind SCALE.md's lakehouse-metadata table.

Tiers 1-2 (probe_sf1.py) scaled ROW counts; this tier scales COMMIT
counts, the axis long-running sinks and CDC consumers actually grow
on: a 500-commit Delta table built through the streaming sink's exact
per-batch path (txn handshake + append commit, auto-checkpoint every
10), and a 200-instant Hudi CoW timeline written through the hudi
sink's path (extraMetadata txn marks). Measured vs commit count:

- Delta: per-batch handshake (last_txn_version), per-batch commit
  wall (auto-checkpoint amortized in), snapshot read, CDF replay
  (read_delta_changes 0..N), stream catch-up (availableNow drain).
- Hudi: per-batch handshake, per-batch write, snapshot read,
  incremental read over the full range.

A per-BATCH cost that grows with N is the O(n²)-lifetime smell this
probe exists to catch (the round-9 verdict's missing-checkpoint
finding); whole-history reads (CDF, catch-up) are EXPECTED linear.

Usage: python probe_commits.py   (from /root/repo; prints JSON lines)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _timed(fn, reps=2):
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        t = time.perf_counter() - t0
        best = t if best is None else min(best, t)
    return round(best, 4)


def probe_delta(spark, root: str, bands=(100, 250, 500)) -> None:
    import quokka_spark.sources.delta_local as dl
    from quokka_spark.sources.delta_local import (read_delta_changes,
                                                  read_delta_local)
    tbl = os.path.join(root, "delta500")
    os.makedirs(tbl)
    seed_dir = os.path.join(root, "seed")
    spark.createDataFrame([(1, 1.0)], "id long, v double") \
        .coalesce(1).write.parquet(seed_dir)
    seed = [os.path.join(seed_dir, f) for f in os.listdir(seed_dir)
            if f.endswith(".parquet")][0]
    schema_json = spark.read.parquet(seed).schema.json()
    n_total = max(bands)
    batch_wall: dict = {}
    hand_wall: dict = {}
    for bid in range(n_total):
        data = os.path.join(tbl, f"b-{bid:05d}.parquet")
        os.link(seed, data)
        t0 = time.perf_counter()
        actions = dl._meta_actions(schema_json) if bid == 0 else []
        actions.append(dl._add_action(tbl, data))
        actions.append({"txn": {"appId": "app", "version": bid,
                                "lastUpdated": 0}})
        dl._commit(tbl, bid, actions)
        batch_wall.setdefault(_band(bid, bands), []).append(
            time.perf_counter() - t0)
        t0 = time.perf_counter()
        assert dl.last_txn_version(tbl, "app") == bid
        hand_wall.setdefault(_band(bid, bands), []).append(
            time.perf_counter() - t0)
    for b in bands:
        print(json.dumps({
            "probe": "delta_sink_per_batch", "commits": b,
            "commit_sec_avg": round(
                sum(batch_wall[b]) / len(batch_wall[b]), 4),
            "handshake_sec_avg": round(
                sum(hand_wall[b]) / len(hand_wall[b]), 4)}), flush=True)
    # snapshot read plan+count vs full history (checkpoint-bounded)
    print(json.dumps({
        "probe": "delta_snapshot_read", "commits": n_total,
        "sec": _timed(lambda: read_delta_local(spark, tbl).count())}), flush=True)
    # CDF over the whole history — EXPECTED linear in commits (the
    # plan is a ~N-way union of per-version parts, so the DRIVER
    # analysis cost is the term to watch)
    for b in [x for x in (25, 50, 100) if x <= n_total]:
        print(json.dumps({
            "probe": "delta_cdf_replay", "commits": b,
            "sec": _timed(lambda b=b: read_delta_changes(
                spark, tbl, 0, b - 1).count(), reps=1)}), flush=True)
    # stream catch-up: one availableNow drain over every commit
    def drain():
        from quokka_spark import QuokkaContext
        qc = QuokkaContext(spark=spark)
        s = qc.read_delta_stream(tbl)
        qn = f"catchup{int(time.time()*1000)}"
        q = (s.writeStream.format("memory").queryName(qn)
             .outputMode("append").trigger(availableNow=True).start())
        assert q.awaitTermination(600)
        assert spark.table(qn).count() == n_total
    print(json.dumps({
        "probe": "delta_stream_catchup", "commits": n_total,
        "sec": _timed(drain, reps=1)}), flush=True)


def probe_hudi(spark, root: str, bands=(50, 100, 200)) -> None:
    from quokka_spark.sources.hudi_local import (last_txn_version,
                                                 read_hudi_incremental,
                                                 read_hudi_local,
                                                 write_hudi_local)
    tbl = os.path.join(root, "hudi200")
    df = spark.createDataFrame([(1, 1.0)], "id long, v double").coalesce(1)
    n_total = max(bands)
    batch_wall: dict = {}
    hand_wall: dict = {}
    for bid in range(n_total):
        t0 = time.perf_counter()
        last = last_txn_version(tbl, "app")
        hand_wall.setdefault(_band(bid, bands), []).append(
            time.perf_counter() - t0)
        assert (last is None) if bid == 0 else (last == bid - 1)
        t0 = time.perf_counter()
        write_hudi_local(df, tbl, mode="append",
                         extra_meta={"qs.txn.appId": "app",
                                     "qs.txn.version": str(bid)})
        batch_wall.setdefault(_band(bid, bands), []).append(
            time.perf_counter() - t0)
    for b in bands:
        print(json.dumps({
            "probe": "hudi_sink_per_batch", "instants": b,
            "write_sec_avg": round(
                sum(batch_wall[b]) / len(batch_wall[b]), 4),
            "handshake_sec_avg": round(
                sum(hand_wall[b]) / len(hand_wall[b]), 4)}), flush=True)
    print(json.dumps({
        "probe": "hudi_snapshot_read", "instants": n_total,
        "sec": _timed(lambda: read_hudi_local(spark, tbl).count())}), flush=True)
    instants = None
    from quokka_spark.sources.hudi_local import completed_instants
    instants = [ts for ts, _, _ in completed_instants(tbl)]
    for b in [x for x in (25, 50) if x <= n_total]:
        print(json.dumps({
            "probe": "hudi_incremental_replay", "instants": b,
            "sec": _timed(lambda b=b: read_hudi_incremental(
                spark, tbl, instants[0], instants[b - 1]).count(),
                reps=1)}), flush=True)


def probe_cdc(spark, root: str, bands=(10, 20, 40)) -> None:
    """cdc actions vs log reconstruction (round 10): the SAME
    upsert-heavy history on a CDF-enabled table and a plain twin —
    the change-feed replay over N upsert commits reads small Change
    Data Files on the CDF table but per-version exceptAll joins over
    the full rewritten files on the twin. Whole-history replays are
    expected linear in N on both; the cdc path's constant should be
    visibly smaller."""
    import json as _json

    from quokka_spark.sources.delta_local import (_commit,
                                                  read_delta_changes,
                                                  upsert_delta_local,
                                                  write_delta_local)

    def mk(name, cdf):
        tbl = os.path.join(root, name)
        os.makedirs(tbl)
        conf = {"delta.enableChangeDataFeed": "true"} if cdf else {}
        _commit(tbl, 0, [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
            {"metaData": {"id": name, "format": {
                "provider": "parquet", "options": {}},
                "schemaString": _json.dumps(
                    {"type": "struct", "fields": [
                        {"name": "id", "type": "long",
                         "nullable": True, "metadata": {}},
                        {"name": "v", "type": "double",
                         "nullable": True, "metadata": {}}]}),
                "partitionColumns": [], "configuration": conf,
                "createdTime": 0}}])
        base = spark.range(2000).selectExpr(
            "id", "cast(id as double) AS v")
        write_delta_local(base.coalesce(4), tbl, mode="append")
        return tbl

    n_total = max(bands)
    tables = {"cdc": mk("cdfon", True), "recon": mk("cdfoff", False)}
    for bid in range(n_total):
        upd = spark.range(bid * 7, bid * 7 + 5).selectExpr(
            "id", f"cast(id as double) + {bid + 1}000 AS v")
        for t in tables.values():
            upsert_delta_local(spark, t, upd.coalesce(1), ["id"])
    for b in bands:
        for kind, t in tables.items():
            print(json.dumps({
                "probe": f"delta_cdf_{kind}_replay_upserts",
                "commits": b,
                "sec": _timed(lambda t=t, b=b: read_delta_changes(
                    spark, t, 2, b + 1).count(), reps=1)}), flush=True)


def _band(bid: int, bands) -> int:
    for b in bands:
        if bid < b:
            return b
    return bands[-1]


def main():
    from quokka_spark.session import build_spark
    spark = build_spark(app_name="qs_probe_commits",
                        cpus=int(os.environ.get("SPARK_GRAFT_CPUS",
                                                "16")))
    spark.sparkContext.setLogLevel("ERROR")
    which = set(sys.argv[1:]) or {"delta", "hudi", "cdc"}
    root = tempfile.mkdtemp(prefix="qs_tier3_")
    try:
        if "delta" in which:
            probe_delta(spark, root)
        if "hudi" in which:
            probe_hudi(spark, root)
        if "cdc" in which:
            probe_cdc(spark, root)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
