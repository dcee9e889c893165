"""Deterministic content-hash sampling and splits.

Corpus pipelines need subsets that are a pure function of the data —
stable across runs, engines, and cluster sizes — so that (a) a
sampled eval set never leaks into train when the pipeline re-runs,
and (b) the same document always lands in the same split even after
re-partitioning. ``df.sample()`` gives none of that (seeded per
partition). These helpers hash the KEY instead: membership =
md5(salt + key) below a threshold. Map-side only, zero exchanges;
the md5 hex prefix is compared as a string, which both Spark and
DuckDB order identically (the oracle runs the same expression).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_DIGITS = 12  # 48 bits of hash → fraction resolution ~4e-15


def _bucket(key_col: str, salt: str) -> Column:
    """First 12 hex chars of md5(salt + key) — a uniform draw in
    [0, 16^12) encoded as a fixed-width hex string."""
    payload = F.concat(F.lit(salt), F.col(key_col).cast("string"))
    return F.substring(F.md5(payload.cast("binary")), 1, _HEX_DIGITS)


def _threshold(fraction: float) -> str:
    """Hex threshold s.t. bucket < threshold keeps ~fraction of keys.
    fraction >= 1 returns 'g', which every hex-digit bucket sorts
    below — a 13-char '1000000000000' would instead LOSE the string
    comparison against most 12-char buckets ('4…' > '1…')."""
    if fraction >= 1.0:
        return "g"
    return format(int(fraction * 16 ** _HEX_DIGITS), f"0{_HEX_DIGITS}x")


def hash_sample(df: DataFrame, key_col: str, fraction: float,
                salt: str = "") -> DataFrame:
    """Keep ~``fraction`` of rows, chosen deterministically by key.
    Different ``salt`` values give independent samples; the same
    (key, salt) is in or out forever."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    if fraction >= 1.0:
        return df
    return df.filter(_bucket(key_col, salt) < F.lit(_threshold(fraction)))


def split_by_hash(df: DataFrame, key_col: str, fractions: dict,
                  salt: str = "", out: str = "split") -> DataFrame:
    """Add a ``split`` column assigning each row to one named split
    (e.g. {"train": 0.9, "val": 0.05, "test": 0.05}) by consecutive
    hash ranges — deterministic, disjoint, exhaustive (fractions must
    sum to 1 within float tolerance)."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    b = _bucket(key_col, salt)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        branch = F.when(b < F.lit(_threshold(acc)), F.lit(name))
        expr = branch if expr is None else expr.when(
            b < F.lit(_threshold(acc)), F.lit(name))
    expr = (F.lit(names[0]) if expr is None
            else expr.otherwise(F.lit(names[-1])))
    return df.withColumn(out, expr)


def hash_uniform(key_col: str, salt: str = "") -> Column:
    """A deterministic uniform draw in [0, 1) from the key: the first
    12 hex digits of md5(salt + key) folded positionally. Every term
    digit × 16⁻ⁱ and every partial sum is an exact binary double
    (denominators are powers of two, numerators < 2⁵³), so the SAME
    expression in DuckDB produces the bit-identical double — the
    weighted sampler's membership test is engine-portable."""
    h = _bucket(key_col, salt)
    u = F.lit(0.0)
    for i in range(1, _HEX_DIGITS + 1):
        digit = F.instr(F.lit("0123456789abcdef"),
                        F.substring(h, i, 1)).cast("double") - 1.0
        u = u + digit * (16.0 ** -i)
    return u


def stratified_hash_sample(df: DataFrame, key_col: str, stratum_col: str,
                           fractions: dict, default: float = 0.0,
                           salt: str = "") -> DataFrame:
    """Per-stratum deterministic sampling: keep ~``fractions[stratum]``
    of each stratum's rows (``default`` for unlisted strata), membership
    a pure function of (salt, key). The corpus rebalancing move — e.g.
    downsample an over-represented crawl source while keeping books at
    full rate — with hash-sampling's stability guarantees. The rate
    table compiles to a literal CASE expression, so the filter is
    map-side, zero exchanges, and pushes into the scan."""
    for name, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {name!r} must be in [0, 1], "
                             f"got {frac}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default must be in [0, 1], got {default}")
    thr = None
    for name, frac in fractions.items():
        branch = (F.col(stratum_col) == F.lit(name), F.lit(_threshold(frac)))
        thr = F.when(*branch) if thr is None else thr.when(*branch)
    thr = (F.lit(_threshold(default)) if thr is None
           else thr.otherwise(F.lit(_threshold(default))))
    return df.filter(_bucket(key_col, salt) < thr)


def cap_per_key(df: DataFrame, key_col: str, id_col: str, max_per_key: int,
                salt: str = "") -> DataFrame:
    """Keep at most ``max_per_key`` rows per key, chosen
    deterministically by hash order of ``id_col`` (ties broken by id).
    The per-domain capping rule of crawl pipelines (e.g. "at most
    100k pages per registered domain") — which rows survive is a pure
    function of the data, not of partitioning or run order.

    Plan: one shuffle on ``key_col`` + a per-key row_number. Spark's
    WindowGroupLimit rewrite (rank-limit pushdown) inserts a partial
    per-map-task top-k BEFORE the exchange, so a hot domain ships at
    most ``max_per_key`` rows per map task, not its full row count —
    the same partial/final shape as a groupBy, safe for skewed keys
    at 100 TB (plan-tested)."""
    if max_per_key < 1:
        raise ValueError(f"max_per_key must be >= 1, got {max_per_key}")
    from pyspark.sql import Window
    w = (Window.partitionBy(key_col)
         .orderBy(_bucket(id_col, salt), F.col(id_col)))
    rn = "__qs_cap_rn__"
    return (df.withColumn(rn, F.row_number().over(w))
            .filter(F.col(rn) <= max_per_key).drop(rn))


def weighted_hash_sample(df: DataFrame, key_col: str, weight_col: str,
                         salt: str = "") -> DataFrame:
    """Importance sampling with per-row acceptance probability =
    ``weight_col`` (clamped to [0, 1]): keep a row iff its
    deterministic uniform draw (pure function of salt + key) falls
    below its weight. The standard corpus move — keep high-quality
    documents with probability ∝ quality score — with hash-sampling's
    stability guarantees: zero exchanges, membership independent of
    partitioning/cluster size, re-runs keep the identical set. Rows
    with NULL weight are dropped (null-rejecting filter, same as SQL
    WHERE)."""
    w = F.least(F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)),
                F.lit(1.0))
    return df.filter(hash_uniform(key_col, salt) < w)


def split_leakage_safe(df: DataFrame, id_col: str, pairs: DataFrame,
                       fractions: dict, salt: str = "",
                       out: str = "split", id1: str = "id1",
                       id2: str = "id2") -> DataFrame:
    """Train/val/test split that can never leak near-duplicates across
    splits: near-dup PAIRS (minhash/simhash/embedding LSH output) are
    closed into clusters (connected components), and the hash split is
    drawn on the cluster's canonical id — every member of a duplicate
    group lands in the SAME split. Docs in no pair split by their own
    id. The eval-set-contamination fix that plain per-doc splitting
    (split_by_hash) cannot give.

    Scale shape: components touch only docs that appear in a pair
    (SCALE.md: min-label propagation, ~diameter rounds); the mapping
    joins back once on the id (AQE broadcasts it when the duplicate
    set is small); the split itself stays a map-side md5 threshold."""
    from ..operators.graph import dedup_components
    comp = dedup_components(pairs, id1=id1, id2=id2).select(
        F.col("doc_id").alias(id_col),
        F.col("canonical_id").alias("__qs_canon__"))
    grp = "__qs_grp__"
    staged = (df.join(comp, id_col, "left")
              .withColumn(grp, F.coalesce(F.col("__qs_canon__"),
                                          F.col(id_col)))
              .drop("__qs_canon__"))
    return split_by_hash(staged, grp, fractions, salt=salt,
                         out=out).drop(grp)


def weighted_sample_k(df: DataFrame, key_col: str, weight_col: str,
                      k: int, by=None, salt: str = "") -> DataFrame:
    """FIXED-SIZE weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): keep the k rows with the largest u^(1/w), u the
    deterministic hash uniform of the key — inclusion probability
    ∝ weight, exactly k survivors (per group with ``by``), and the
    usual hash-sampling stability: a pure function of the data.
    Complements weighted_hash_sample (per-row acceptance, variable
    size) when the budget is a COUNT — "the best 10k docs per source,
    quality-weighted".

    Ranking uses the monotone-equivalent ln(u)/w (avoids pow
    underflow); rows with weight <= 0 or NULL never qualify. One
    shuffle (on ``by`` or a constant); the rank-limit pushdown caps
    every map task at k rows per group (the cap_per_key plan). Every
    arithmetic step is an exactly-rounded double op over the exact
    md5-fold uniform, so survivors are engine-portable — the oracle
    replays them."""
    from pyspark.sql import Window
    w = F.col(weight_col).cast("double")
    score = F.log(hash_uniform(key_col, salt)) / w
    groups = ([by] if isinstance(by, str) else list(by)) if by else []
    win = (Window.partitionBy(*groups)
           .orderBy(F.desc("__qs_es__"), F.col(key_col)))
    rn = "__qs_es_rn__"
    return (df.filter(w > 0)
            .withColumn("__qs_es__", score)
            .withColumn(rn, F.row_number().over(win))
            .filter(F.col(rn) <= k).drop(rn, "__qs_es__"))


def sample_by_token_budget(df: DataFrame, budgets: dict,
                           text_col: str = "text",
                           source_col: str = "source",
                           id_col: str = "doc_id",
                           salt: str = "") -> DataFrame:
    """Downsample each source to a TOKEN budget — the corpus-mixing
    step of a training-data pipeline ("20M tokens of web, 5M of
    forums, books untouched"): per-source whitespace-token totals set
    the keep rate ``min(1, budget / total_tokens)``, and membership is
    the usual deterministic md5 draw on (salt, id). Sources without a
    budget keep every row.

    Plan: one slim (source → token total) aggregation, rates and hex
    thresholds computed IN-PLAN from it, broadcast-joined back onto
    the stream, map-side filter. No driver collect — the rate table
    never leaves the cluster — and the survivor set is a pure function
    of the data (stable across reruns/partitionings). Every arithmetic
    step (ratio, least, ·16^12, floor) is an exactly-rounded double
    op over engine-identical token counts, so the DuckDB oracle
    replays the survivors hash-exactly."""
    from .text import token_count
    for name, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget for {name!r} must be >= 0, got {b}")
    totals = (df.groupBy(source_col)
              .agg(F.sum(token_count(text_col)).alias("__tok__")))
    budget = None
    for name, b in budgets.items():
        branch = (F.col(source_col) == F.lit(name), F.lit(float(b)))
        budget = F.when(*branch) if budget is None else budget.when(*branch)
    budget = F.lit(None).cast("double") if budget is None else budget
    rate = (F.when(budget.isNull() | (F.col("__tok__") <= 0), F.lit(1.0))
            .otherwise(F.least(F.lit(1.0), budget / F.col("__tok__"))))
    thr = (F.when(rate >= 1.0, F.lit("g"))
           .otherwise(F.lpad(F.lower(F.hex(
               F.floor(rate * F.lit(float(16 ** _HEX_DIGITS)))
               .cast("bigint"))), _HEX_DIGITS, "0")))
    rates = totals.select(source_col, thr.alias("__qs_thr__"))
    return (df.join(F.broadcast(rates), source_col, "left")
            .filter(_bucket(id_col, salt)
                    < F.coalesce(F.col("__qs_thr__"), F.lit("g")))
            .drop("__qs_thr__"))
