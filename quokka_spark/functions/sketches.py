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


def _bloom_bits(key_col, n_hashes: int, width: int):
    return F.array(*[
        _portable_bucket(F.col(key_col), width, salt=f"bf{h}:")
        for h in range(n_hashes)])


def bloom_build(df: DataFrame, key_col: str, n_hashes: int = 5,
                width: int = 1 << 20) -> DataFrame:
    """Bloom filter as a DataFrame of SET BIT positions: each key sets
    ``n_hashes`` salted bits in [0, width). One map-side explode + one
    distinct — at most ``width`` slim rows regardless of input size,
    mergeable across partitions/days by plain union+distinct.

    The membership contract: a key inserted is ALWAYS found (no false
    negatives — the guarantee decontamination prefilters need); an
    absent key false-positives with rate ≈ (1 - e^(-kn/m))^k. Same
    engine-portable md5-fold hashes as the CMS, so the bit set and
    every probe verdict replay exactly in DuckDB."""
    return (df.select(F.explode(_bloom_bits(key_col, n_hashes, width))
                      .alias("bit"))
            .distinct())


def bloom_contains(bloom: DataFrame, keys: DataFrame, key_col: str,
                   n_hashes: int = 5, width: int = 1 << 20) -> DataFrame:
    """(key, maybe_present) per probe key: present iff ALL its bits are
    set. The bit table is ≤ width slim rows — broadcast by AQE — and
    the probe is one map-side explode + join + per-key count.
    ``maybe_present = false`` is definitive absence (the prefilter can
    safely skip the expensive exact check).

    A key's hashes may collide among THEMSELVES (k draws into m bits),
    so the check compares distinct-bit hits against the key's own
    distinct-bit count — comparing against n_hashes would flip such
    keys to absent and break the no-false-negative contract."""
    probes = keys.select(
        F.col(key_col),
        F.explode(_bloom_bits(key_col, n_hashes, width)).alias("bit"))         .distinct()
    need = probes.groupBy(key_col).agg(F.count(F.lit(1)).alias("__n__"))
    hits = (probes.join(bloom, "bit", "left_semi")
            .groupBy(key_col).agg(F.count(F.lit(1)).alias("__h__")))
    return (need.join(hits, key_col, "left")
            .select(F.col(key_col),
                    (F.coalesce(F.col("__h__"), F.lit(0)) == F.col("__n__"))
                    .alias("maybe_present")))
