"""sf0.1 → sf1 scale probe (10× replicas) — the offline harness behind
SCALE.md's probe tables.

Builds a synthetic sf1 directory in tempdir by replicating the sf0.1
tables 10× with per-copy perturbation (doc_id/vec_id/user_id offsets;
per-copy word prefixes on text and vector rolls on embeddings so
near-dup and join-match rates stay bounded instead of exploding 10×),
then times the requested ``queries()`` entries on BOTH directories
(warmup + min-of-2, local[32]) and prints one JSON line per query with
the sec-per-10×-data ratio. A ratio well above 10 means a super-linear
plan term — exactly what the round-8 probe caught in dedup_embedding.

Usage:  python probe_sf1.py [query ...]    (default: the tier-2 set)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

TIER2 = ["stream_join", "text_tfidf", "sim_topk_pushdown",
         "ml_logreg", "dedup_lines"]
COPIES = 10


def build_sf1(src_dir: str) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    out = os.path.join(tempfile.gettempdir(), "qs_sf1_tier2")
    done = os.path.join(out, "_done")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)

    def rep(name, fn):
        t = pq.read_table(os.path.join(src_dir, f"{name}.parquet"))
        parts = [fn(t, i) for i in range(COPIES)]
        pq.write_table(pa.concat_tables(parts),
                       os.path.join(out, f"{name}.parquet"))

    def docs(t, i):
        off = pa.scalar(i * 10_000_000, type=t.column("doc_id").type)
        t = t.set_column(t.schema.get_field_index("doc_id"), "doc_id",
                         pc.add(t.column("doc_id"), off))
        if i:
            pre = pc.binary_join_element_wise(
                pa.array([f"w{i}"] * t.num_rows), t.column("text"), " ")
            t = t.set_column(t.schema.get_field_index("text"), "text",
                             pre)
        return t

    def embs(t, i):
        off = pa.scalar(i * 10_000_000, type=t.column("vec_id").type)
        t2 = t.set_column(t.schema.get_field_index("vec_id"), "vec_id",
                          pc.add(t.column("vec_id"), off)) if i else t
        if i:
            vecs = t2.column("embedding").to_pylist()
            rolled = [None if v is None else
                      list(np.roll(np.asarray(v, dtype=np.float32), i))
                      for v in vecs]
            t2 = t2.set_column(
                t2.schema.get_field_index("embedding"), "embedding",
                pa.array(rolled, type=t2.column("embedding").type))
        return t2

    def evts(t, i):
        off = pa.scalar(i * 10_000_000, type=t.column("user_id").type)
        return t.set_column(
            t.schema.get_field_index("user_id"), "user_id",
            pc.add(t.column("user_id"), off)) if i else t

    rep("documents", docs)
    rep("embeddings", embs)
    rep("events", evts)
    with open(done, "w") as fh:
        fh.write("ok")
    return out


def main():
    names = sys.argv[1:] or TIER2
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from quokka_spark.session import build_spark
    spark = build_spark("sf1_probe")        # bench.py's exact session
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em
    q = em.queries()
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = build_sf1(sf01)

    def timed(name, d):
        best = None
        for _ in range(3):                   # 1 warmup + min-of-2
            t0 = time.time()
            q[name](spark, d).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return best

    for name in names:
        a = timed(name, sf01)
        b = timed(name, sf1)
        print(json.dumps({"query": name, "sf0.1_sec": round(a, 3),
                          "sf1_sec": round(b, 3),
                          "ratio": round(b / a, 2)}), flush=True)


if __name__ == "__main__":
    main()
