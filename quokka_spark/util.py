"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the
    input has fewer partitions.

    Small files arrive as a single split, which would serialize every
    downstream Arrow/NumPy kernel onto one core; one cheap shuffle
    unlocks the full cluster. At scale (inputs already ≥ parallelism
    splits) this is a no-op — no shuffle is added.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # probe partition count on the JVM internal RDD: `df.rdd` would
    # additionally build the Python-deserialization pipeline (~0.3 s of
    # per-query setup at bench scale) just to read a number
    try:
        nparts = df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:
        nparts = df.rdd.getNumPartitions()
    if nparts >= target:
        return df
    if key_cols:
        from pyspark.sql import functions as F
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)
