"""As-of join (backward, per-key) — reference orderedstream.py:114-191 +
executors/ts_executors.py:324-383 (SortedAsofExecutor).

Semantics: for each left row, attach the latest right row with
``right_on <= left_on`` within the same ``by`` group (pandas
merge_asof / polars join_asof backward).

Spark-first formulation — the union-tag trick (scalable default):
  1. union left and right with a side tag (right sorts before left on
     ties so equal timestamps match, matching merge_asof
     allow_exact_matches=True);
  2. one window over (by) ordered by (ts, side):
     ``last(right_value, ignorenulls=True)`` forward-fills each right
     value onto subsequent left rows;
  3. keep the left rows.

Cost at scale: ONE shuffle of (|L|+|R|) rows on the by-key — same
lower bound as the reference's hash-partitioned streaming executor.
No per-key pandas materialization; whole-stage codegen applies. Skewed
by-keys inherit AQE skew handling on the shuffle; with ``bucket="auto"``
a per-key skew probe (windows.choose_hot_keys) additionally routes any
DOMINANT key through the bucketed two-level plan and unions it with the
plain plan for the rest, so one hot symbol among thousands no longer
serializes into a single task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def join_asof(left: DataFrame, right: DataFrame, left_on: str, right_on: str,
              left_by: str | list, right_by: str | list,
              suffix: str = "_2", bucket=None,
              direction: str = "backward") -> DataFrame:
    """``bucket`` (optional, seconds or duration string): time-bucketed
    two-level formulation. The default single-window plan gives one
    task per by-key — perfect until the key count is small relative to
    the cluster (the reference's 1.3B-row benchmark has 101 symbols →
    parallelism 101). With ``bucket`` the fill runs per (key,
    time-bucket) — parallelism keys × buckets — and a second pass over
    the SLIM per-bucket summaries (one row per key × bucket: the last
    right row of the bucket) carries state across bucket boundaries,
    classic two-level prefix scan. Same semantics, one extra slim
    shuffle + broadcast-size join back.

    ``direction`` (pandas merge_asof parity): "backward" (default,
    latest right with right_on <= left_on), "forward" (earliest right
    with right_on >= left_on — the mirrored window fill), or "nearest"
    (closer of the two by |time delta|, ties resolved backward; both
    fills run over the SAME single shuffle, and the bucketed plan is
    not offered — pass bucket=None/auto only)."""
    left_by = [left_by] if isinstance(left_by, str) else list(left_by)
    right_by = [right_by] if isinstance(right_by, str) else list(right_by)
    assert len(left_by) == len(right_by)

    assert direction in ("backward", "forward", "nearest"), direction
    if direction == "nearest" and bucket is not None:
        assert bucket == "auto", \
            "nearest-direction as-of supports only the single-window plan"
        bucket = None
    if bucket == "auto":
        # probe the left stream: bucket only when the key count is
        # small relative to the cluster (see windows.choose_bucket)
        from .windows import choose_bucket, choose_hot_keys, skew_key_expr
        bucket = choose_bucket(left, left_on, left_by)
        if bucket is None and direction != "nearest":
            # global key count is fine, but a single HOT key among
            # many still serializes into one task — split: hot keys
            # take the bucketed two-level plan, the rest the plain
            # plan, union (semantically identical, test-pinned)
            hot, hot_bucket = choose_hot_keys(left, left_on, left_by)
            if hot:
                lk = skew_key_expr(left_by)
                rk = skew_key_expr(right_by)
                cold = join_asof(left.filter(~lk.isin(hot)),
                                 right.filter(~rk.isin(hot)),
                                 left_on, right_on, left_by, right_by,
                                 suffix=suffix, bucket=None,
                                 direction=direction)
                hotj = join_asof(left.filter(lk.isin(hot)),
                                 right.filter(rk.isin(hot)),
                                 left_on, right_on, left_by, right_by,
                                 suffix=suffix, bucket=hot_bucket,
                                 direction=direction)
                return cold.unionByName(hotj)

    # right value columns (everything but key/time), suffix-renamed on
    # collision with left — reference orderedstream.py:160-175
    right_vals = [c for c in right.columns if c != right_on and c not in right_by]
    rename = {}
    for c in right_vals:
        if c in left.columns:
            assert c + suffix not in left.columns
            rename[c] = c + suffix
    out_right_vals = [rename.get(c, c) for c in right_vals]

    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    for rb, lb in zip(right_by, left_by):
        if rb != lb:
            r = r.withColumnRenamed(rb, lb)
    if right_on != left_on:
        r = r.withColumnRenamed(right_on, left_on)

    left_cols = list(left.columns)
    if not out_right_vals:
        # no right value columns: nothing to attach
        return left

    # Fill ALL right value columns as ONE struct: last(struct,
    # ignorenulls) attaches the whole latest right row atomically.
    # Filling per-column would interleave values from DIFFERENT right
    # rows whenever the latest row holds a legitimate NULL in one
    # column — diverging from pandas merge_asof / the reference
    # SortedAsofExecutor (ts_executors.py:324-383), which attach the
    # entire row including its NULLs. A struct whose members are all
    # NULL is still non-NULL, so all-null right rows count as matches,
    # exactly like merge_asof.
    #
    # The union shuffles FLAT columns (right values NULL on left rows,
    # left values NULL on right rows); the struct is constructed lazily
    # inside the window stage, AFTER the shuffle — when(side=0,
    # struct(...)) is non-NULL for exactly the right rows. Packing
    # before the union (as r2 did) inflated shuffle bytes with struct
    # headers and cost bench_asof_micro +73%.
    tagged_left = left.select(
        *left_cols,
        *[F.lit(None).cast(r.schema[c].dataType).alias(c)
          for c in out_right_vals],
        F.lit(1).alias("__side__"))
    tagged_right = r.select(
        *[F.col(c) if c in ([left_on] + left_by) else
          F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        *out_right_vals,
        F.lit(0).alias("__side__"))

    unioned = tagged_left.unionByName(tagged_right)
    ts_type = dict(unioned.dtypes)[left_on]
    if "timestamp" in ts_type:
        from .windows import epoch_us
        ts_num = epoch_us(left_on)
    else:
        ts_num = F.col(left_on)

    if direction == "nearest":
        # both fills over ONE shuffle (same partition keys; the two
        # orderings differ only in the tie column, so the exchange is
        # shared and only a sort separates them). The right event time
        # rides inside the struct so the pick is a pure projection.
        rv = F.when(F.col("__side__") == 0,
                    F.struct(ts_num.alias("__rts__"), *out_right_vals))
        wb = (Window.partitionBy(*left_by)
              .orderBy(F.col(left_on).asc(), F.col("__side__").asc())
              .rowsBetween(Window.unboundedPreceding, 0))
        # forward fill as a RUNNING frame over the REVERSED ordering:
        # Spark evaluates [current, unboundedFollowing] by rescanning
        # to the partition end per row — O(n^2); last-non-null over
        # (ts desc, side asc) with [unboundedPreceding, current] is
        # the same fill at O(n), same tie visibility
        wf = (Window.partitionBy(*left_by)
              .orderBy(F.col(left_on).desc(), F.col("__side__").asc())
              .rowsBetween(Window.unboundedPreceding, 0))
        filled = unioned.select(
            *left_cols, F.col("__side__"), ts_num.alias("__tn__"),
            F.last(rv, ignorenulls=True).over(wb).alias("__bv__"),
            F.last(rv, ignorenulls=True).over(wf).alias("__fv__"))
        bd = F.col("__tn__") - F.col("__bv__.__rts__")
        fd = F.col("__fv__.__rts__") - F.col("__tn__")
        pick = (F.when(F.col("__bv__").isNull(), F.col("__fv__"))
                .when(F.col("__fv__").isNull(), F.col("__bv__"))
                .when(fd < bd, F.col("__fv__")).otherwise(F.col("__bv__")))
        return (filled.filter(F.col("__side__") == 1)
                .withColumn("__rv__", pick)
                .select(*left_cols,
                        *[F.col("__rv__")[c].alias(c)
                          for c in out_right_vals]))

    rv = F.when(F.col("__side__") == 0, F.struct(*out_right_vals))
    fwd = direction == "forward"
    # ties: the right row at the same event time must be visible to the
    # left row — right sorts before left when filling backward, after
    # it when filling forward (merge_asof allow_exact_matches)
    side_order = F.col("__side__").desc() if fwd else F.col("__side__").asc()

    def fill(w):
        # forward runs as last-non-null over the REVERSED ordering
        # with a running frame: a [current, unboundedFollowing] frame
        # is O(n^2) in Spark (rescan-to-end per row). Reversing flips
        # the tie column too, so the equal-ts right row stays visible.
        w = (w.orderBy(F.col(left_on).desc(), F.col("__side__").asc())
             .rowsBetween(Window.unboundedPreceding, 0) if fwd else
             w.orderBy(F.col(left_on).asc(), side_order)
             .rowsBetween(Window.unboundedPreceding, 0))
        return F.last(rv, ignorenulls=True).over(w)

    if bucket is None:
        filled = unioned.select(
            *left_cols, F.col("__side__"),
            fill(Window.partitionBy(*left_by)).alias("__rv__"))
        return (filled.filter(F.col("__side__") == 1)
                .select(*left_cols,
                        *[F.col("__rv__")[c].alias(c) for c in out_right_vals]))

    # ---- bucketed two-level formulation ------------------------------
    if "timestamp" in ts_type:
        from .windows import to_seconds
        width = int(to_seconds(bucket) * 1_000_000)
    else:
        # numeric event time: bucket is a width in the column's units
        width = int(bucket)
    bucketed = unioned.withColumn("__b__", F.floor(ts_num / width))

    # level 1: fill within (key, bucket) — parallelism keys x buckets
    filled = bucketed.select(
        *left_cols, "__b__", F.col("__side__"),
        fill(Window.partitionBy(*left_by, "__b__")).alias("__rv__"))

    # level 2: slim per-(key, bucket) summaries — the LAST (backward) /
    # FIRST (forward) right row of each bucket — attached to EVERY
    # bucket seen in the data (buckets holding only left rows still
    # need a carry), then prefix-filled across preceding (backward) or
    # following (forward) buckets per key, excluding the current bucket
    # (in-bucket fill wins there), and joined back. Summary volume is
    # one slim row per key x bucket; the per-key prefix window runs
    # over that slim set, not the event stream.
    edge_agg = F.min_by(rv, ts_num) if fwd else F.max_by(rv, ts_num)
    summaries = (bucketed.filter(F.col("__side__") == 0)
                 .groupBy(*left_by, "__b__")
                 .agg(edge_agg.alias("__edge_rv__")))
    all_buckets = bucketed.select(*left_by, "__b__").distinct()
    # forward carry = last-non-null over DESC bucket order with a
    # running frame (O(buckets), not the O(buckets^2) following-frame
    # form); -1 end excludes the current bucket on both directions
    w2 = Window.partitionBy(*left_by).orderBy(
        F.col("__b__").desc() if fwd else F.col("__b__").asc())
    carry = F.last("__edge_rv__", ignorenulls=True) \
        .over(w2.rowsBetween(Window.unboundedPreceding, -1))
    carried_all = (all_buckets
                   .join(summaries, [*left_by, "__b__"], "left")
                   .select(*left_by, "__b__", carry.alias("__carry__")))

    out = (filled.join(carried_all, [*left_by, "__b__"], "left")
           .withColumn("__rv__", F.coalesce("__rv__", "__carry__")))
    return (out.filter(F.col("__side__") == 1)
            .select(*left_cols,
                    *[F.col("__rv__")[c].alias(c) for c in out_right_vals]))


def join_asof_pandas(left: DataFrame, right: DataFrame, left_on: str,
                     right_on: str, left_by: str, right_by: str,
                     suffix: str = "_2") -> DataFrame:
    """Fallback formulation: ``groupBy(by).cogroup.applyInPandas`` with
    ``pandas.merge_asof`` per key group. Simpler to reason about, but
    materializes whole key groups in Python workers — only preferable
    when per-key data fits memory and key count >> core count."""
    import pandas as pd
    from pyspark.sql.types import StructType

    right_vals = [c for c in right.columns if c != right_on and c != right_by]
    rename = {c: c + suffix for c in right_vals if c in left.columns}

    fields = list(left.schema.fields)
    rschema = {f.name: f for f in right.schema.fields}
    out_names = [rename.get(c, c) for c in right_vals]
    schema = StructType(fields + [
        type(rschema[c])(rename.get(c, c), rschema[c].dataType, True)
        if False else rschema[c].__class__(rename.get(c, c), rschema[c].dataType, True)
        for c in right_vals])

    def merge(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        lpdf = lpdf.sort_values(left_on)
        rpdf = rpdf.rename(columns=rename).sort_values(right_on)
        if len(rpdf) == 0:
            for c in out_names:
                lpdf[c] = None
            return lpdf
        return pd.merge_asof(lpdf, rpdf.drop(columns=[right_by]),
                             left_on=left_on, right_on=right_on,
                             direction="backward").drop(
            columns=[right_on] if right_on != left_on else [])

    # explicit-width pre-partition: in this formulation's own target
    # regime (key count >> cores) the shuffled bytes can still look
    # small to AQE, which would coalesce the Python merge onto one
    # task (see the CEP kernel's pin)
    width = left.sparkSession.sparkContext.defaultParallelism
    return (left.repartition(width, F.col(left_by)).groupBy(left_by)
            .cogroup(right.repartition(width, F.col(right_by))
                     .groupBy(right_by))
            .applyInPandas(merge, schema=schema))
