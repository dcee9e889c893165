"""Mergeable frequency sketches for unbounded key cardinality.

The exact heavy-hitters path (functions/text: explode → partial agg →
TakeOrdered) shuffles one row per distinct key per map task — fine for
token vocabularies, unbounded for keys like URLs or (user, path)
pairs at 100 TB. The Count-Min sketch bounds that: the whole corpus
compresses into a fixed depth × width counter table (the classic
Cormode-Muthukrishnan bound: estimate ≥ true, ≤ true + (e/width)·N
with probability 1 - e^-depth), and the table is mergeable across
partitions/days by plain cell-wise addition.

Hashes are the engine-portable md5 fold (functions/text
._portable_bucket with a per-row salt), so the sketch — and every
estimate read from it — is bit-identical in DuckDB: the oracle gate is
hash-exact, unusual for a sketch."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _portable_bucket


def _cms_entries(key_col, depth: int, width: int):
    return F.array(*[
        F.struct(F.lit(r).alias("row"),
                 _portable_bucket(F.col(key_col), width,
                                  salt=f"cms{r}:").alias("bucket"))
        for r in range(depth)])


def cms_build(df: DataFrame, key_col: str, depth: int = 4,
              width: int = 1024) -> DataFrame:
    """Build the sketch: one map-side explode (×depth) over the scan,
    ONE partial-agged shuffle on (row, bucket) — at most depth × width
    result rows regardless of input size. Merge two sketches by
    unioning and re-aggregating (counter addition)."""
    return (df.select(F.explode(_cms_entries(key_col, depth, width))
                      .alias("__e__"))
            .groupBy(F.col("__e__.row").alias("row"),
                     F.col("__e__.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                 depth: int = 4, width: int = 1024) -> DataFrame:
    """Estimated count per key: min over the key's depth cells. The
    sketch is ≤ depth × width rows, so Spark broadcasts it (AQE) and
    the probe is a map-side joined pass over the keys — estimate any
    number of keys in one job. A key hitting an empty cell estimates
    0 (it was never inserted)."""
    probes = keys.select(
        F.col(key_col),
        F.explode(_cms_entries(key_col, depth, width)).alias("__e__"))
    return (probes
            .join(sketch, (F.col("__e__.row") == sketch["row"])
                  & (F.col("__e__.bucket") == sketch["bucket"]), "left")
            .groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .cast("bigint").alias("est")))
