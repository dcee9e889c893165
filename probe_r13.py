#!/usr/bin/env python
"""Round-13 optimization probe: time a subset of bench queries with the
bench's own methodology (warmup + min-of-3, noop sink) and/or capture
their .explain("formatted") plans to plans/r13/.

Usage:
  python probe_r13.py time q1 q2 ...     # per-query min-of-3 seconds
  python probe_r13.py plan SUFFIX q ...  # write plans/r13/<q>_SUFFIX.txt
  python probe_r13.py lake               # time the lakehouse suite only

Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS exactly like bench.py.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark():
    from quokka_spark.session import build_spark
    spark = build_spark(app_name="quokka_spark_probe_r13", cpus=CPUS)
    spark.range(1000).selectExpr("sum(id)").collect()
    (spark.range(CPUS * 4).repartition(CPUS)
     .mapInPandas(lambda it: it, "id long")
     .write.format("noop").mode("overwrite").save())
    return spark


def main():
    import __spark_entry__ as entry_mod
    from bench import run_suite, lakehouse_suite

    from bench import StealMonitor

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
        os.makedirs("plans/r13", exist_ok=True)
        reg = entry_mod.queries()
        for name in names:
            df = reg[name](spark, SF_DIR)
            # public explain API (round-13 advisor finding: the old
            # PythonSQLUtils reach-through breaks under Spark Connect)
            import contextlib
            import io
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(f"plans/r13/{name}_{suffix}.txt", "w") as fh:
                fh.write(buf.getvalue())
            print(f"wrote plans/r13/{name}_{suffix}.txt")
    elif mode == "lake":
        mon = StealMonitor().start()
        t, e = lakehouse_suite(spark)
        print(json.dumps({"timings": t, "errors": e,
                          "steal": mon.stop()}))
    spark.stop()


if __name__ == "__main__":
    main()
