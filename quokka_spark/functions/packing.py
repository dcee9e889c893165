"""Sequence packing for training-batch preparation.

Concatenative packing (the GPT-style pretraining layout): documents
in a canonical order are laid end-to-end on a global token tape and
cut into fixed-budget packs. Each document's pack is decided by the
token offset at which it STARTS — a pure function of the corpus, so
the layout is stable across runs and cluster sizes. A document longer
than the budget still gets the pack where it starts (the trainer's
chunker splits it downstream); packs are therefore complete and
gap-free but may overflow by at most one document tail.

The global prefix sum is the classic two-level formulation: range-
partition by the order key, per-partition running sums (a window over
the partition id), plus one slim per-partition-total pass whose
cumulative offsets broadcast back — no global single-task window, the
scan stays fully parallel at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(df: DataFrame, token_col: str, id_col: str,
                   budget: int) -> DataFrame:
    """Add ``pack_id`` / ``pack_offset`` columns: the pack index and
    the token offset within the global tape at which this document
    starts. Deterministic in (id order, token counts) only."""
    assert budget > 0
    sc = df.sparkSession.sparkContext
    n_range = max(sc.defaultParallelism,
                  df.rdd.getNumPartitions())
    # pid must be materialized before any downstream exchange (same
    # hazard as multimodal.repartition_by_payload_size): localCheckpoint
    # snapshots it; blocks reclaimed when the plan is GC'd
    ranged = (df.repartitionByRange(n_range, F.col(id_col).asc())
              .withColumn("__pid__", F.spark_partition_id())
              .localCheckpoint(eager=True))
    sums = (ranged.groupBy("__pid__")
            .agg(F.sum(token_col).alias("s")).collect())
    totals = {r["__pid__"]: int(r["s"] or 0) for r in sums}
    offsets, acc = {}, 0
    # range partition index order == key order for repartitionByRange
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    off = F.element_at(
        F.create_map(*[F.lit(x) for pid in sorted(offsets)
                       for x in (pid, offsets[pid])]),
        F.col("__pid__"))
    w = (Window.partitionBy("__pid__").orderBy(F.col(id_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    start = off + F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return (ranged
            .withColumn("pack_id", F.floor(start / budget))
            .withColumn("pack_offset", start - F.col("pack_id") * budget)
            .drop("__pid__"))
