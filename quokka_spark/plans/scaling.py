"""Partitioning / skew / layout tooling for the 100 TB regime.

The reference hand-schedules partitioners per operator
(target_info.py:33-72 Hash/Range/Broadcast/PassThrough); under Spark
the per-operator choice is Catalyst's, and what remains for the user
is LAYOUT strategy: bucketing for shuffle-free repeated joins, salting
for skewed keys, and explicit co-partitioning. These helpers encode
those patterns.

AQE (enabled by session.py) already handles moderate skew at runtime
(`spark.sql.adaptive.skewJoin`); `salt_keys`/`salted_aggregate` are for
the pathological hot-key case AQE splitting can't fix — e.g. one user
with 10% of all events in a groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the one sampling policy every probe shares (choose_bucket /
# choose_hot_keys in operators/windows.py, sampled_skew_share here):
# ~1% Bernoulli with a fixed seed for deterministic cached decisions,
# and a floor below which a sample is noise and the exact pass runs
SAMPLE_FRACTION = 0.01
SAMPLE_FLOOR = 1_000


def salt_keys(df: DataFrame, key: str, n_salts: int = 16,
              salt_col: str = "__salt__") -> DataFrame:
    """Append a deterministic salt in [0, n_salts): groupBy(key, salt)
    spreads one hot key over n_salts reducers. Deterministic (hash of
    the full row's monotonic id is NOT used — salt must distribute rows
    of the SAME key, so it hashes a uniform row fingerprint)."""
    return df.withColumn(
        salt_col,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
        .cast("int"))


def salted_aggregate(df: DataFrame, keys: list, aggs: dict,
                     n_salts: int = 16) -> DataFrame:
    """Two-phase skew-safe aggregation: partial agg on (keys, salt),
    final agg on keys. Only decomposable aggs: sum/count/min/max.

    ``aggs``: {output_name: ("sum"|"count"|"min"|"max", column)}.
    The hot key's rows land on n_salts reducers in phase 1; phase 2
    combines n_salts tiny partials per key.
    """
    _COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    _PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    salted = salt_keys(df, keys[0], n_salts)
    partial = salted.groupBy(*keys, "__salt__").agg(*[
        _PARTIAL[fn](col).alias(f"__p_{name}__")
        for name, (fn, col) in aggs.items()])
    final = partial.groupBy(*keys).agg(*[
        _COMBINE[fn](f"__p_{name}__").alias(name)
        for name, (fn, col) in aggs.items()])
    return final


def skew_report(df: DataFrame, key: str, top: int = 10):
    """Key-frequency profile: the diagnosis step before salting.
    Returns (top-key pandas frame, skew ratio = max/mean count)."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    stats = counts.agg(F.max("n").alias("mx"), F.avg("n").alias("mean")).first()
    topk = counts.orderBy(F.col("n").desc()).limit(top).toPandas()
    return topk, (stats["mx"] / stats["mean"] if stats["mean"] else 0.0)


def sampled_skew_share(df: DataFrame, cols: list,
                       fraction: float = SAMPLE_FRACTION,
                       floor: int = SAMPLE_FLOOR) -> float:
    """Max per-key row share of a prospective shuffle key, estimated
    from a ~1% Bernoulli sample (fixed seed) — the cheap form of
    :func:`skew_report` used by ``DataStream.explain(skew=...)``.
    Falls back to the exact count when the sample is under ``floor``
    rows (unit-test-sized inputs keep exact answers)."""
    key = F.concat_ws("\x00", *[F.col(c).cast("string") for c in cols])
    slim = df.select(key.alias("__k__"))
    row = (slim.sample(fraction=fraction, seed=42)
           .groupBy("__k__").agg(F.count(F.lit(1)).alias("n"))
           .agg(F.sum("n").alias("t"), F.max("n").alias("m")).first())
    if row is None or not row["t"] or row["t"] < floor:
        row = (slim.groupBy("__k__").agg(F.count(F.lit(1)).alias("n"))
               .agg(F.sum("n").alias("t"), F.max("n").alias("m")).first())
    if row is None or not row["t"]:
        return 0.0
    return float(row["m"]) / float(row["t"])


def write_bucketed(df: DataFrame, table_name: str, key: str,
                   n_buckets: int = 64, sort_by: str | None = None,
                   path: str | None = None):
    """Persist bucketed-by-join-key: repeated joins/aggregations on
    ``key`` then skip the shuffle entirely (both sides read
    pre-partitioned). The 100 TB pattern for fact-fact joins that run
    daily."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def co_partition(left: DataFrame, right: DataFrame, left_key: str,
                 right_key: str, n_partitions: int | None = None):
    """Explicitly co-partition two frames on their join keys so a
    subsequent join (and any further same-key aggregation) reuses ONE
    shuffle per side across multiple downstream ops."""
    if n_partitions:
        return (left.repartition(n_partitions, F.col(left_key)),
                right.repartition(n_partitions, F.col(right_key)))
    return (left.repartition(F.col(left_key)),
            right.repartition(F.col(right_key)))


def zorder_key(df: DataFrame, cols: list, bits: int = 16,
               out: str = "zkey") -> DataFrame:
    """Morton (Z-order) interleave key over numeric/date columns — the
    multi-dimensional data-clustering layout (Delta OPTIMIZE ZORDER /
    Iceberg sort-order style): rows close in EVERY dimension get close
    keys, so files carry tight min/max on ALL the z-ordered columns
    and parquet row-group pruning works for predicates on any of them
    (a single-column sort gives pruning on that column only).

    Each column is normalized to ``bits`` bits as
    floor((v - min) · (2^bits - 1) / (max - min)) in IEEE double
    arithmetic (one slim min/max agg job for the bounds), clamped into
    [0, 2^bits - 1] — every step is an exactly-rounded double op, so
    any engine computes the identical key (the DuckDB oracle mirrors
    the expression verbatim). The denominator is float(mx) - float(mn)
    (NOT int-truncated), so fractional-ranged double columns normalize
    correctly instead of dividing by a too-small (or zero) span; the
    clamp guarantees the Morton key never wraps even at ulp
    boundaries. Exact for column ranges up to ~2^53 / 2^bits; beyond
    that the rounding is still deterministic and engine-identical,
    only the bucket boundary shifts by ulps. Dates/timestamps should
    be cast to days/epoch by the caller. NULLs normalize to 0 (sort
    first)."""
    n = len(cols)
    if not 1 <= n * bits <= 63:
        raise ValueError(f"{n} cols x {bits} bits must fit in 63 bits")
    bounds = df.agg(*[f(c).alias(f"{tag}{i}")
                      for i, c in enumerate(cols)
                      for tag, f in (("mn", F.min), ("mx", F.max))]).first()
    top = (1 << bits) - 1
    norms = []
    for i, c in enumerate(cols):
        mn, mx = bounds[f"mn{i}"], bounds[f"mx{i}"]
        if mn is None or mx is None or mx == mn:
            norms.append(F.lit(0).cast("long"))
        else:
            v = F.coalesce(F.col(c).cast("double"), F.lit(float(mn)))
            scaled = F.floor(
                (v - F.lit(float(mn))) * F.lit(float(top))
                / F.lit(float(mx) - float(mn))).cast("long")
            norms.append(F.least(F.greatest(scaled, F.lit(0).cast("long")),
                                 F.lit(top).cast("long")))
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, nc in enumerate(norms):
            z = z + F.shiftright(nc, b).bitwiseAND(F.lit(1)) \
                * F.lit(1 << (b * n + i))
    return df.withColumn(out, z)


def cluster_by_zorder(df: DataFrame, cols: list, n_partitions: int,
                      bits: int = 16) -> DataFrame:
    """Range-partition + sort the stream by its Z-order key: the
    write-side layout pass before ``write_parquet`` that gives every
    output file a tight bounding box on all ``cols``. One slim bounds
    job + one range shuffle — run at ingest/compaction boundaries,
    not per-query."""
    keyed = zorder_key(df, cols, bits, out="__qs_z__")
    return (keyed.repartitionByRange(n_partitions, "__qs_z__")
            .sortWithinPartitions("__qs_z__").drop("__qs_z__"))
