#!/usr/bin/env python
"""Round-14 optimization probe: time a subset of bench queries with the
bench's own methodology (warmup + min-of-3, noop sink, steal trace
attached) and/or capture .explain("formatted") plans to plans/r14/.

Usage:
  python probe_r14.py time q1 q2 ...     # per-query min-of-N seconds
  python probe_r14.py plan SUFFIX q ...  # write plans/r14/<q>_SUFFIX.txt
  python probe_r14.py lake               # time the lakehouse suite only
  python probe_r14.py mixed SUFFIX       # mixed-history iceberg/hudi
                                         # incremental-read plans (the
                                         # deferred-flush evidence)

Plan capture uses the public DataFrame.explain API (stdout redirect)
instead of reaching through PythonSQLUtils — the round-13 advisor
finding. Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like bench.py.
"""
from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark():
    from quokka_spark.session import build_spark
    spark = build_spark(app_name="quokka_spark_probe_r14", cpus=CPUS)
    spark.range(1000).selectExpr("sum(id)").collect()
    (spark.range(CPUS * 4).repartition(CPUS)
     .mapInPandas(lambda it: it, "id long")
     .write.format("noop").mode("overwrite").save())
    return spark


def plan_text(df) -> str:
    """Formatted physical plan via the PUBLIC explain API."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _mixed_fixtures(spark, root):
    """Mixed lakehouse histories for the deferred-flush plan evidence:
    insert/base runs interrupted by upserts (iceberg) / log-bearing
    deltacommits (hudi). 12 appends + 3 interruptions each."""
    from quokka_spark.sources.hudi_local import (upsert_hudi_mor_local,
                                                 write_hudi_mor_local)
    from quokka_spark.sources.iceberg_local import (
        append_snapshot, create_local_iceberg_table,
        upsert_iceberg_local)

    def pfile(name, lo, hi):
        p = os.path.join(root, f"{name}.parquet")
        spark.createDataFrame([(i, float(i)) for i in range(lo, hi)],
                              "id long, v double") \
            .coalesce(1).toPandas().to_parquet(p)
        return p

    ice = os.path.join(root, "ice")
    (s1,) = create_local_iceberg_table(
        ice, [[pfile("i0", 0, 50)]],
        schema_fields=[(1, "id", "long"), (2, "v", "double")])
    n = 50
    last = s1
    for step in range(15):
        if step % 5 == 4:                      # 3 interrupting upserts
            upd = spark.createDataFrame(
                [(step, 1000.0 + step), (10_000 + step, float(step))],
                "id long, v double")
            last = upsert_iceberg_local(spark, ice, upd, "id")
        else:
            last = append_snapshot(
                ice, [pfile(f"i{step + 1}", n, n + 10)])
            n += 10

    hudi = os.path.join(root, "hudi")
    t0 = write_hudi_mor_local(
        spark.range(0, 50).selectExpr(
            "id", "cast(id as double) as v").coalesce(1),
        hudi, recordkey="id")
    m = 50
    for step in range(15):
        if step % 5 == 4:                      # 3 interrupting logs
            upsert_hudi_mor_local(spark, hudi, spark.createDataFrame(
                [(step, 999.0)], "id long, v double"))
        else:
            write_hudi_mor_local(
                spark.range(m, m + 10).selectExpr(
                    "id", "cast(id as double) as v").coalesce(1),
                hudi, mode="append", recordkey="id")
            m += 10
    return ice, (s1, last), hudi, t0


def main():
    import __spark_entry__ as entry_mod
    from bench import StealMonitor, lakehouse_suite, run_suite

    mode = sys.argv[1]
    spark = _spark()
    if mode == "time":
        names = sys.argv[2:]
        mon = StealMonitor().start()
        t, e = run_suite(spark, entry_mod.queries(), names, SF_DIR)
        print(json.dumps({"timings": t, "errors": e,
                          "steal": mon.stop()}))
    elif mode == "plan":
        suffix = sys.argv[2]
        names = sys.argv[3:]
        os.makedirs("plans/r14", exist_ok=True)
        reg = entry_mod.queries()
        for name in names:
            df = reg[name](spark, SF_DIR)
            with open(f"plans/r14/{name}_{suffix}.txt", "w") as fh:
                fh.write(plan_text(df))
            print(f"wrote plans/r14/{name}_{suffix}.txt")
    elif mode == "lake":
        mon = StealMonitor().start()
        t, e = lakehouse_suite(spark)
        print(json.dumps({"timings": t, "errors": e,
                          "steal": mon.stop()}))
    elif mode == "streamprobe":
        # verdict-13 item #3: decompose stream_* residual cost from
        # the StreamingQueryProgress metrics (batch count, per-phase
        # durationMs, state-operator commit/memory numbers)
        import __spark_entry__ as em

        def _drain_probed(df, mode="append", final_wm_batch=True):
            import uuid
            spk = df.sparkSession
            name = "qs_sink_" + uuid.uuid4().hex[:10]
            old = spk.conf.get("spark.sql.shuffle.partitions")
            nodata_key = "spark.sql.streaming.noDataMicroBatches.enabled"
            old_nodata = spk.conf.get(nodata_key)
            spk.conf.set("spark.sql.shuffle.partitions",
                         str(min(int(old), 8)))
            if not final_wm_batch:
                spk.conf.set(nodata_key, "false")
            try:
                q = (df.writeStream.format("memory").queryName(name)
                     .outputMode(mode).trigger(availableNow=True)
                     .start())
            finally:
                spk.conf.set("spark.sql.shuffle.partitions", old)
                spk.conf.set(nodata_key, old_nodata)
            q.awaitTermination(600)
            for p in q.recentProgress:
                keep = {k: p.get(k) for k in
                        ("batchId", "numInputRows", "durationMs",
                         "stateOperators")}
                print(json.dumps(keep, default=str))
            return spk.table(name)

        em._drain = _drain_probed
        for name in sys.argv[2:]:
            t0 = time.perf_counter()
            em.queries()[name](spark, SF_DIR) \
                .write.format("noop").mode("overwrite").save()
            print(json.dumps({"query": name,
                              "wall": round(time.perf_counter() - t0,
                                            3)}))
    elif mode == "mixed":
        import shutil
        import tempfile
        suffix = sys.argv[2]
        from quokka_spark.sources.hudi_local import (completed_instants,
                                                     read_hudi_incremental)
        from quokka_spark.sources.iceberg_local import read_iceberg_changes
        os.makedirs("plans/r14", exist_ok=True)
        root = tempfile.mkdtemp(prefix="qs_mixed_")
        try:
            ice, (s1, s_last), hudi, t0 = _mixed_fixtures(spark, root)
            t_ice0 = time.perf_counter()
            ice_df = read_iceberg_changes(spark, ice, s1)
            t_ice = time.perf_counter() - t_ice0
            t_h0 = time.perf_counter()
            hudi_df = read_hudi_incremental(spark, hudi, t0)
            t_h = time.perf_counter() - t_h0
            for name, df in (("iceberg_changes_mixed", ice_df),
                             ("hudi_incr_mixed", hudi_df)):
                txt = plan_text(df)
                with open(f"plans/r14/{name}_{suffix}.txt", "w") as fh:
                    fh.write(txt)
                scans = txt.count("Scan parquet")
                print(f"wrote plans/r14/{name}_{suffix}.txt  "
                      f"(Scan parquet nodes: {scans})")
            print(json.dumps({"build_sec":
                              {"iceberg_changes": round(t_ice, 3),
                               "hudi_incremental": round(t_h, 3)},
                              "n_rows": {"iceberg": ice_df.count(),
                                         "hudi": hudi_df.count()}}))
        finally:
            shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
