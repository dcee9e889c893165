"""DataStream — the engine's lazy relational handle, backed by a Spark DataFrame.

Parity target: reference pyquokka/datastream.py (DataStream,
GroupedDataStream). Quokka's DataStream is a lazy unordered stream of
batches over a push-based runtime; here every verb simply builds a
Spark logical plan and Catalyst/Tungsten handle optimization +
execution (SURVEY §3.1 mapping). The facade keeps Quokka's ergonomics:
name-list ``schema``, suffix-based join dedup, dict-based ``agg``,
``collect/compute/explain`` verbs.

Scale notes are attached per-operator; the general rules:
- everything stays declarative → predicate pushdown / column pruning /
  partial aggregation / join reordering are Catalyst-native;
- broadcast joins happen automatically under AQE when one side is small
  (and explicitly for materialized streams, mirroring the reference's
  materialized→broadcast rule, datastream.py:1489-1603);
- Python only enters via Arrow-vectorized pandas UDFs.
"""

from __future__ import annotations

import uuid
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .expression import Expression
from .sqldialect import duckdb_to_spark_sql


def _to_column(predicate) -> Column:
    if isinstance(predicate, Expression):
        return predicate.column
    if isinstance(predicate, Column):
        return predicate
    if isinstance(predicate, str):
        return F.expr(duckdb_to_spark_sql(predicate))
    raise TypeError(f"cannot interpret {type(predicate)} as a predicate")


class DataStream:
    """Lazy relational stream; wraps a Spark DataFrame.

    ``sorted`` carries the OrderedStream sort contract through verbs
    that preserve it (reference datastream.py:41-43); Spark does not
    track cross-shuffle ordering so the facade does.
    """

    def __init__(self, qc, df: DataFrame, sorted: dict | None = None,
                 materialized: bool = False):
        self.qc = qc
        self.df = df
        self.sorted = sorted or {}
        self.materialized = materialized

    # ------------------------------------------------------------------
    # introspection
    # ------------------------------------------------------------------
    @property
    def schema(self) -> list:
        """Name-list schema, matching the reference's untyped schema
        (datastream.py:25-26). ``typed_schema`` exposes Spark's types."""
        return list(self.df.columns)

    @property
    def typed_schema(self):
        return self.df.schema

    def __getitem__(self, col: str) -> Expression:
        assert col in self.schema, f"column {col} not found in {self.schema}"
        return Expression(F.col(col))

    def __str__(self):
        return f"DataStream[{', '.join(self.schema)}]"

    __repr__ = __str__

    def _with(self, df: DataFrame, sorted: dict | None = None) -> "DataStream":
        # preserve OrderedStream-ness through sort-contract-preserving verbs
        cls = type(self) if sorted else DataStream
        return cls(self.qc, df, sorted=sorted, materialized=self.materialized)

    # ------------------------------------------------------------------
    # materialization verbs (reference datastream.py:75-127)
    # ------------------------------------------------------------------
    def collect(self, as_polars: bool = False):
        """Execute and return a local table (Arrow-backed transfer).

        The reference returns Polars (datastream.py:75-98). polars is
        not in this environment, so pandas is the default local type;
        ``as_polars=True`` returns a polars DataFrame when the package
        is importable (API parity where the dependency exists) and
        raises a clear error otherwise.
        """
        pdf = self.df.toPandas()
        if not as_polars:
            return pdf
        try:
            import polars as pl
        except ImportError as e:
            raise RuntimeError(
                "collect(as_polars=True) needs the polars package, which "
                "is not installed in this environment") from e
        return pl.from_pandas(pdf)

    def compute(self) -> "DataStream":
        """Materialize and cache cluster-side (reference datastream.py:100-116
        DataSet); subsequent streams read the cached result."""
        cached = self.df.persist()
        cached.count()  # force materialization
        return DataStream(self.qc, cached, sorted=self.sorted, materialized=True)

    def explain(self, mode: str = "formatted", skew=False):
        """Print the physical plan. ``skew`` additionally profiles
        shuffle-key distribution (round-5 verdict #10): ``True``
        auto-discovers every ``hashpartitioning`` key set in the plan;
        a list of column names probes those columns directly. Each key
        set is probed with the sampled ~1% share estimate
        (plans/scaling.sampled_skew_share) and a ``SKEW WARNING`` is
        printed when one value holds more than ``1 / (2 x cores)`` of
        THIS stream's rows — the share at which a single task
        serializes the exchange; the remedies are salt_keys /
        salted_aggregate (plans/scaling.py) or the windowed family's
        ``bucket="auto"`` hot-key split. Returns the warning strings.
        Caveats: the probe is an extra (sampled) job, run only on
        demand, and it profiles this stream's OUTPUT rows — to
        diagnose an upstream aggregation's shuffle input, call
        ``explain(skew=[...])`` on the pre-aggregation stream. Keys
        that are expressions rather than plain columns of this stream
        are skipped."""
        out = self.df.explain(mode=mode)
        if skew is False or skew is None:
            return out
        import re as _re

        from .plans.scaling import sampled_skew_share
        if skew is True:
            plan = self.df._jdf.queryExecution().executedPlan().toString()
            key_sets = []
            for m in _re.finditer(r"hashpartitioning\(([^)]*)\)", plan):
                cols = _re.findall(r"([A-Za-z_]\w*)#\d+", m.group(1))
                cols = [c for c in dict.fromkeys(cols)
                        if c in self.df.columns]
                if cols and cols not in key_sets:
                    key_sets.append(cols)
        else:
            key_sets = [[skew]] if isinstance(skew, str) else [list(skew)]
        cores = self.df.sparkSession.sparkContext.defaultParallelism
        tau = 1.0 / (2 * cores)
        warnings = []
        for cols in key_sets:
            share = sampled_skew_share(self.df, cols)
            if share > tau:
                w = (f"SKEW WARNING: shuffle key {cols}: hottest value "
                     f"holds {share:.1%} of rows (> 1/(2*cores) = "
                     f"{tau:.1%}) — one task serializes this exchange; "
                     f"consider plans.scaling.salt_keys / "
                     f"salted_aggregate or the bucket='auto' plans")
                print(w)
                warnings.append(w)
        return warnings

    def observe(self, name: str, aggs: dict) -> "DataStream":
        """Attach pipeline observability metrics (rows kept after a
        filter stage, bytes scanned, null rates …) computed FOR FREE
        during the job that executes this stream — no extra pass, the
        accumulator-backed `Dataset.observe`. ``aggs`` is the usual
        {"alias": "SQL aggregate"} dict; read results after an action
        via ``qc.observed_metrics(name)`` / Spark's QueryExecution
        listener. At 100 TB a second counting pass is a second scan —
        this is the operational alternative."""
        from pyspark.sql import Observation

        from .sqldialect import duckdb_to_spark_sql
        obs = Observation(name)
        cols = [F.expr(duckdb_to_spark_sql(sql)).alias(alias)
                for alias, sql in aggs.items()]
        self.qc._observations[name] = obs
        return self._with(self.df.observe(obs, *cols))

    def count(self, collect: bool = True):
        if collect:
            return self.df.count()
        return self._with(self.df.agg(F.count(F.lit(1)).alias("count")))

    def windowed_transform(self, window, trigger=None,
                           keep: list | None = None) -> "DataStream":
        """Windowed aggregation straight off a DataStream — the
        reference's datastream.py:1650 signature, where the window
        spec itself carries ``order_by``/``partition_by`` (the
        reference form of the windowtypes constructors). The repo's
        operators sort within the plan, so no pre-sorted contract is
        required here; OrderedStream.windowed_transform remains the
        compact-form entry. ``keep``: sliding-window passthrough
        columns."""
        assert getattr(window, "order_by", None) is not None \
            and getattr(window, "partition_by", None) is not None, \
            ("this window spec carries no order_by/partition_by — "
             "build it with the reference form, e.g. "
             "TumblingWindow(order_by, partition_by, size, aggs), or "
             "use OrderedStream.windowed_transform(window, by=...)")
        from .operators.windows import windowed_transform as _wt
        out = _wt(self.df, window, window.order_by, window.partition_by,
                  trigger, keep=keep)
        return DataStream(self.qc, out)

    # ------------------------------------------------------------------
    # row-wise ops (SURVEY §2.2)
    # ------------------------------------------------------------------
    def filter(self, predicate) -> "DataStream":
        return self._with(self.df.filter(_to_column(predicate)), sorted=self.sorted)

    def filter_sql(self, predicate: str) -> "DataStream":
        """SQL WHERE clause, DuckDB dialect accepted (reference
        datastream.py:322-393); Catalyst normalizes/pushes down."""
        return self._with(self.df.filter(duckdb_to_spark_sql(predicate)),
                          sorted=self.sorted)

    def select(self, columns: list) -> "DataStream":
        assert isinstance(columns, list)
        return self._with(self.df.select(*columns),
                          sorted={k: v for k, v in self.sorted.items() if k in columns})

    def drop(self, columns: list) -> "DataStream":
        for col in columns:
            assert col not in self.sorted, "cannot drop a sort key (reference datastream.py:545-582)"
        return self._with(self.df.drop(*columns), sorted=self.sorted)

    def rename(self, rename_dict: dict) -> "DataStream":
        new_sorted = {rename_dict.get(k, k): v for k, v in self.sorted.items()}
        return self._with(self.df.withColumnsRenamed(rename_dict), sorted=new_sorted)

    def with_column(self, name: str, f, required_columns=None,
                    foldable: bool = True) -> "DataStream":
        """Add one column from an Expression/Column or a batch lambda
        (reference datastream.py:1209-1310). ``foldable`` is a no-op:
        Catalyst fuses projections in WholeStageCodegen."""
        return self.with_columns({name: f}, required_columns=required_columns,
                                 foldable=foldable)

    def with_columns(self, new_columns: dict, required_columns=None,
                     foldable: bool = True, schema: dict | None = None
                     ) -> "DataStream":
        """``schema`` (optional): {lambda_col: spark_type_string} for the
        batch-lambda columns. Supplying it keeps plan construction fully
        lazy; without it the output dtypes are inferred by running the
        lambdas on a 100-row sample — a driver-side Spark job at
        plan-build time, and an all-null/unrepresentative prefix can
        mis-infer (prefer passing schema)."""
        df = self.df
        exprs = {}
        lambdas = {}
        for name, v in new_columns.items():
            if isinstance(v, Expression):
                exprs[name] = v.column
            elif isinstance(v, Column):
                exprs[name] = v
            elif isinstance(v, str):
                exprs[name] = F.expr(duckdb_to_spark_sql(v))
            elif callable(v):
                lambdas[name] = v
            else:
                raise TypeError(f"with_columns value for {name}: {type(v)}")
        if exprs:
            df = df.withColumns(exprs)
        if lambdas:
            # batch lambda: pandas.DataFrame -> pandas.Series, Arrow-vectorized.
            # Runs all lambdas for a batch in one python worker round-trip.
            out_cols = list(df.columns) + list(lambdas.keys())

            def add_cols(it):
                for pdf in it:
                    for name, fn in lambdas.items():
                        pdf[name] = fn(pdf)
                    yield pdf

            if schema is not None:
                missing = [n for n in lambdas if n not in schema]
                assert not missing, f"schema missing lambda columns {missing}"
                from pyspark.sql.types import StructField, StructType
                from pyspark.sql.types import _parse_datatype_string
                out_schema = StructType(
                    list(df.schema.fields)
                    + [StructField(n,
                                   _parse_datatype_string(schema[n]), True)
                       for n in lambdas])
            else:
                sample = df.limit(100).toPandas()
                for name, fn in lambdas.items():
                    sample[name] = fn(sample)
                from pyspark.sql.pandas.types import from_arrow_schema
                import pyarrow as pa
                out_schema = from_arrow_schema(
                    pa.Schema.from_pandas(sample[out_cols]))
            df = df.mapInPandas(add_cols, schema=out_schema)
        return self._with(df, sorted=self.sorted)

    def with_columns_sql(self, statement: str) -> "DataStream":
        """Add columns from SQL select-exprs with aliases (reference
        datastream.py:1149-1207); per-batch DuckDB there, plain Catalyst
        projection here."""
        parts = _split_top_level_commas(duckdb_to_spark_sql(statement))
        return self._with(self.df.selectExpr("*", *parts), sorted=self.sorted)

    def clip(self, columns: dict) -> "DataStream":
        """Clamp columns to (min,max) (reference datastream.py:867-903)."""
        exprs = {}
        for col, (lo, hi) in columns.items():
            exprs[col] = F.greatest(F.least(F.col(col), F.lit(hi)), F.lit(lo))
        return self._with(self.df.withColumns(exprs), sorted=self.sorted)

    def explode(self, column: str, alias: str | None = None,
                outer: bool = False) -> "DataStream":
        """One output row per element of an array/map column
        (parity-plus verb — the reference reaches this through SQL
        list functions): ``outer`` keeps rows whose array is
        null/empty with a null element, like SQL's LEFT JOIN UNNEST.
        JVM-side generator — no Python in the row path, and the
        pre-explode filter/pruning still push into the scan."""
        gen = F.explode_outer if outer else F.explode
        out = self.df.withColumn(alias or column, gen(F.col(column)))
        return self._with(out, sorted=None)

    def transform(self, f: Callable, new_schema, required_columns: list | set,
                  foldable: bool = True, by: str | None = None) -> "DataStream":
        """Arbitrary batch→batch UDF replacing the schema (reference
        datastream.py:652-739). ``f``: pandas.DataFrame → pandas.DataFrame.
        Column pruning to ``required_columns`` is explicit, mirroring the
        reference's pushdown block."""
        required_columns = list(required_columns)
        spark_schema = _normalize_schema(new_schema)

        def run(it):
            for pdf in it:
                out = f(pdf)
                if out is not None and len(out):
                    yield out

        df = self.df.select(*required_columns).mapInPandas(run, schema=spark_schema)
        return DataStream(self.qc, df)

    def transform_sql(self, statement: str, groupby: list | None = None) -> "DataStream":
        """SQL select-exprs (with aliases) over the stream, optionally
        grouped (reference datastream.py:741-815). The reference runs
        this per batch via DuckDB as its partial-aggregation stage;
        under Catalyst the same statement runs globally and partial
        aggregation happens automatically — per-batch semantics (which
        depend on nondeterministic batch boundaries) are intentionally
        not replicated."""
        parts = [F.expr(p) for p in
                 _split_top_level_commas(duckdb_to_spark_sql(statement))]
        if groupby:
            df = self.df.groupBy(*groupby).agg(*parts)
        else:
            df = self.df.select(*parts)
        return DataStream(self.qc, df)

    def stateful_transform(self, executor, new_schema, required_columns,
                           by: str | list | None = None) -> "DataStream":
        """Stateful batchwise operator (reference datastream.py:1312-1367,
        executors/base_executor.py:26-32: ``execute(batches..)``+``done()``).

        Keyed state (``by``) maps to ``groupBy(by).applyInPandas``: each
        key group arrives as ONE pandas DataFrame; we run the executor's
        execute() then done() on it — same contract, Spark-shuffled.
        Unkeyed state maps to per-partition mapInPandas (partition-local
        state, like one Quokka channel)."""
        import pandas as pd
        required_columns = list(required_columns)
        spark_schema = _normalize_schema(new_schema)
        by = [by] if isinstance(by, str) else by

        if by:
            sel = list(dict.fromkeys(required_columns + by))

            def run_group(key, pdf):
                ex = executor() if isinstance(executor, type) else _clone_executor(executor)
                outs = []
                r = ex.execute([pdf], 0, 0)
                if r is not None:
                    outs.append(_as_pandas(r))
                r = ex.done(0)
                if r is not None:
                    outs.append(_as_pandas(r))
                if not outs:
                    return pd.DataFrame(columns=[f.name for f in spark_schema.fields])
                out = pd.concat(outs, ignore_index=True)
                # executors produce their own columns; key columns named in
                # new_schema but absent from the output are injected (the
                # reference's hash-partitioned executor sees the key
                # implicitly the same way)
                for b, v in zip(by, key):
                    if b not in out.columns:
                        out[b] = v
                return out

            # explicit-width pre-partition on the key: the groupBy
            # reuses it (one exchange), and REPARTITION_BY_NUM stops
            # AQE from coalescing the small-BYTES shuffle into one
            # task — Python-kernel cost scales with rows, not bytes
            # (same defense as the CEP/dedup kernels)
            width = self.df.sparkSession.sparkContext.defaultParallelism
            df = (self.df.select(*sel)
                  .repartition(width, *[F.col(b) for b in by])
                  .groupBy(*by).applyInPandas(run_group, schema=spark_schema))
        else:
            def run_partition(it):
                ex = executor() if isinstance(executor, type) else _clone_executor(executor)
                for i, pdf in enumerate(it):
                    r = ex.execute([pdf], 0, 0)
                    if r is not None:
                        yield _as_pandas(r)
                r = ex.done(0)
                if r is not None:
                    yield _as_pandas(r)

            df = self.df.select(*required_columns).mapInPandas(
                run_partition, schema=spark_schema)
        return DataStream(self.qc, df)

    # ------------------------------------------------------------------
    # set ops (SURVEY §2.6)
    # ------------------------------------------------------------------
    def union(self, other: "DataStream") -> "DataStream":
        assert self.schema == other.schema, "union requires identical schemas"
        return DataStream(self.qc, self.df.unionByName(other.df))

    def intersect(self, other: "DataStream") -> "DataStream":
        return DataStream(self.qc, self.df.intersect(other.df))

    def except_(self, other: "DataStream") -> "DataStream":
        return DataStream(self.qc, self.df.exceptAll(other.df))

    def distinct(self, keys: list | None = None) -> "DataStream":
        """Dedup on key columns (reference datastream.py:1369-1418 keeps
        only the key columns in the output — preserved here)."""
        if keys is None:
            return DataStream(self.qc, self.df.distinct())
        assert isinstance(keys, list)
        return DataStream(self.qc, self.df.select(*keys).distinct())

    def drop_duplicates(self, keys: list | None = None) -> "DataStream":
        """Parity-plus: dedup keeping whole rows (exact dedup for data
        pipelines); one shuffle on the key columns."""
        return DataStream(self.qc, self.df.dropDuplicates(keys))

    # ------------------------------------------------------------------
    # joins (SURVEY §2.3)
    # ------------------------------------------------------------------
    def join(self, right: "DataStream", on=None, left_on=None, right_on=None,
             suffix: str = "_2", how: str = "inner",
             maintain_sort_order=None, condition=None) -> "DataStream":
        """Equi-join; API parity with reference datastream.py:1420-1603.

        how ∈ {inner,left,semi,anti} (+right/outer/cross beyond parity).
        Physical strategy is Catalyst's: broadcast if a side is small
        (AQE), else sort-merge/shuffled-hash — the same decision the
        reference makes from its cardinality catalog, done at runtime
        with real statistics instead.

        ``condition`` (parity with the reference's non-equi prototype,
        ExpBuildProbeJoinExecutor, executors/sql_executors.py:379-450 —
        hard-coded there, general here) adds an arbitrary predicate to
        the join. Accepts a DuckDB-dialect SQL string over the joined
        schema (right-side collisions already suffix-renamed) or a
        callable ``(left_df, right_df) -> Column/Expression``.

        Scale notes: with equi keys + condition, Catalyst runs the hash
        join on the keys and evaluates the residual inside the join —
        the 100 TB shape. With condition only (pure theta join), Spark
        needs BroadcastNestedLoopJoin: one side must be broadcastable.
        """
        spark_how = {"inner": "inner", "left": "left", "semi": "left_semi",
                     "anti": "left_anti", "right": "right", "outer": "full",
                     "cross": "cross"}[how]
        if on is None and condition is not None and left_on is None:
            # pure theta join: no equi keys at all
            left_on = right_on = None
        elif on is None:
            assert left_on is not None and right_on is not None
            assert left_on in self.schema, f"{left_on} not in left schema"
            assert right_on in right.schema, f"{right_on} not in right schema"
        else:
            assert on in self.schema and on in right.schema
            left_on = right_on = on

        rdf = right.df
        if how in ("semi", "anti") and condition is None:
            rdf = rdf.select(right_on)  # reference projects right to key only
        else:
            # suffix-rename right-side collisions (right_on keeps its name
            # unless it collides and differs from left_on)
            rename = {}
            for col in rdf.columns:
                if col == right_on and on is not None:
                    continue
                if col in self.schema:
                    assert col + suffix not in self.schema, \
                        ("suffix insufficient for unique columns", col + suffix)
                    rename[col] = col + suffix
            if rename:
                rdf = rdf.withColumnsRenamed(rename)
                if right_on is not None and right_on in rename:
                    right_on = rename[right_on]

        if right.materialized:
            rdf = F.broadcast(rdf)

        if condition is None:
            if on is not None:
                joined = self.df.join(rdf, on=on, how=spark_how)
            else:
                joined = self.df.join(
                    rdf, on=self.df[left_on] == rdf[right_on], how=spark_how)
            return DataStream(self.qc, joined)

        # non-equi / mixed join: lower the extra predicate into the
        # Catalyst join condition (residual of a hash join when equi
        # keys exist; BroadcastNestedLoopJoin for pure theta).
        if callable(condition):
            from .expression import Expression
            cond = condition(self.df, rdf)
            # NOTE: can't duck-type via hasattr(cond, "column") — pyspark
            # Column.__getattr__ turns .column into a struct-field extract
            if isinstance(cond, Expression):
                cond = cond.column
        else:
            from .sqldialect import duckdb_to_spark_sql
            cond = F.expr(duckdb_to_spark_sql(str(condition)))
        if left_on is not None:
            cond = (self.df[left_on] == rdf[right_on]) & cond
        joined = self.df.join(rdf, on=cond, how=spark_how)
        if on is not None and how not in ("semi", "anti"):
            if spark_how in ("right", "full"):
                # right/full with a Column condition keeps BOTH key
                # columns; right-only rows have a NULL left key, so
                # dropping the right key would lose it — coalesce the
                # two into one (the same dedup the on="k" string-join
                # path gets from Spark natively)
                key = F.coalesce(self.df[left_on], rdf[right_on]).alias(on)
                joined = joined.select(
                    *[key if c == on else self.df[c] for c in self.df.columns],
                    *[rdf[c] for c in rdf.columns if c != right_on])
            else:
                # same-named equi key appears on both sides: keep the
                # left one (matches the on="k" string-join behavior)
                joined = joined.drop(rdf[right_on])
        return DataStream(self.qc, joined)

    def cogroup(self, right: "DataStream", executor, on: str,
                new_schema) -> "DataStream":
        """Co-partition two streams on a key and feed both groups to a
        custom executor (reference datastream.py:2073-2111)."""
        import pandas as pd
        spark_schema = _normalize_schema(new_schema)

        def run(key, left_pdf, right_pdf):
            ex = executor() if isinstance(executor, type) else _clone_executor(executor)
            outs = []
            r = ex.execute([left_pdf, right_pdf], 0, 0)
            if r is not None:
                outs.append(_as_pandas(r))
            r = ex.done(0)
            if r is not None:
                outs.append(_as_pandas(r))
            if not outs:
                return pd.DataFrame(columns=[f.name for f in spark_schema.fields])
            out = pd.concat(outs, ignore_index=True)
            if on not in out.columns:
                out[on] = key[0]
            return out

        # explicit-width pre-partition on both sides (see
        # stateful_transform): keeps AQE from serializing the Python
        # kernel onto one task when the shuffled BYTES look small
        width = self.df.sparkSession.sparkContext.defaultParallelism
        left_df = self.df.repartition(width, F.col(on))
        right_df = right.df.repartition(width, F.col(on))
        df = (left_df.groupBy(on).cogroup(right_df.groupBy(on))
              .applyInPandas(run, schema=spark_schema))
        return DataStream(self.qc, df)

    # ------------------------------------------------------------------
    # grouping / aggregation (SURVEY §2.4)
    # ------------------------------------------------------------------
    def groupby(self, groupby, orderby=None) -> "GroupedDataStream":
        if isinstance(groupby, str):
            groupby = [groupby]
        return GroupedDataStream(self, groupby, orderby)

    def rollup(self, keys: list, orderby=None) -> "GroupedDataStream":
        """Parity-plus (not in the reference — SURVEY §2.4): hierarchical
        grouping sets."""
        return GroupedDataStream(self, list(keys), orderby, mode="rollup")

    def cube(self, keys: list, orderby=None) -> "GroupedDataStream":
        """Parity-plus: all grouping-set combinations."""
        return GroupedDataStream(self, list(keys), orderby, mode="cube")

    def grouping_sets(self, sets: list, orderby=None) -> "GroupedDataStream":
        """Parity-plus: an ARBITRARY grouping-set list (beyond the
        rollup/cube shapes), e.g. ``[["status"], ["priority"], []]``
        for per-status, per-priority, and grand totals in one pass.
        Lowers to the native groupingSets plan — one Expand + one
        partial→final aggregate, identical to the SQL front end's
        ``GROUP BY GROUPING SETS`` lowering."""
        sets = [list(s) for s in sets]
        return GroupedDataStream(self, sets, orderby, mode="grouping_sets")

    def agg(self, aggregations: dict) -> "DataStream":
        return self.groupby([]).agg(aggregations)

    aggregate = agg

    def pivot(self, index, pivot_col: str, value_col: str,
              agg_func: str = "sum", values: list | None = None) -> "DataStream":
        """Long→wide pivot (the reference's transpose app,
        apps/rottnest/transpose.py, reshapes per-symbol columns with a
        stateful Executor; declaratively this is groupBy(index)
        .pivot(pivot_col).agg — one shuffle on the index key).

        Pass ``values`` (the distinct pivot values) explicitly at
        scale: without it Spark runs an extra distinct-collect job
        over the whole input just to learn the output schema. Output
        columns are named ``{value}_{agg_func}``. ``index`` may be one
        column or a list."""
        index = [index] if isinstance(index, str) else list(index)
        agg_expr = getattr(F, agg_func)(value_col)
        g = (self.df.groupBy(*index).pivot(pivot_col, values)
             if values is not None else self.df.groupBy(*index).pivot(pivot_col))
        out = g.agg(agg_expr)
        for c in out.columns:
            if c not in index:
                out = out.withColumnRenamed(c, f"{c}_{agg_func}")
        return self._with(out)

    def agg_sql(self, aggregations: str) -> "DataStream":
        return self.groupby([]).agg_sql(aggregations)

    def count_distinct(self, col: str):
        return DataStream(
            self.qc,
            self.df.agg(F.countDistinct(col).alias(f"{col}_count_distinct")))

    def approx_count_distinct(self, col: str, rsd: float = 0.05):
        """Parity-plus: HyperLogLog sketch — the scalable path at 100 TB."""
        return DataStream(
            self.qc,
            self.df.agg(F.approx_count_distinct(col, rsd).alias(
                f"{col}_approx_count_distinct")))

    def sum(self, columns):
        cols = [columns] if isinstance(columns, str) else columns
        return self._with(self.df.agg(*[F.sum(c).alias(f"{c}_sum") for c in cols]))

    def max(self, columns):
        cols = [columns] if isinstance(columns, str) else columns
        return self._with(self.df.agg(*[F.max(c).alias(f"{c}_max") for c in cols]))

    def min(self, columns):
        cols = [columns] if isinstance(columns, str) else columns
        return self._with(self.df.agg(*[F.min(c).alias(f"{c}_min") for c in cols]))

    def mean(self, columns):
        cols = [columns] if isinstance(columns, str) else columns
        return self._with(self.df.agg(*[F.avg(c).alias(f"{c}_mean") for c in cols]))

    def approximate_quantile(self, columns, quantiles, relative_error: float = 1e-4):
        """Mergeable-sketch quantiles (Greenwald-Khanna). The reference
        uses per-channel t-digests then averages the per-channel
        quantiles — a documented approximation (datastream.py:926-930);
        Spark's sketch merges correctly, strictly better.

        Wide inputs (the 10k-column case from blog/approxquant.md) are
        handled by batching columns through approxQuantile, which runs
        one pass per call over column groups."""
        cols = [columns] if isinstance(columns, str) else list(columns)
        probs = [quantiles] if isinstance(quantiles, (int, float)) else list(quantiles)
        out = {}
        batch = 256
        for i in range(0, len(cols), batch):
            group = cols[i:i + batch]
            res = self.df.stat.approxQuantile(group, probs, relative_error)
            out.update(dict(zip(group, res)))
        return out

    def approximate_median(self, columns, relative_error: float = 1e-4):
        res = self.approximate_quantile(columns, [0.5], relative_error)
        return {k: v[0] for k, v in res.items()}

    def gramian(self, columns: list, demean: bool = False):
        """X^T·X over selected columns (reference datastream.py:1033-1098).

        Arrow-batched partial products per partition (k×k each), summed
        via a single-row global reduce — the executor-side work is NumPy
        matmul on columnar batches; only k² floats cross the shuffle.
        Returns a k×k numpy array."""
        from .operators.linalg import gramian as _gram
        return _gram(self.df, columns, demean=demean)

    def covariance(self, columns: list):
        """Sample covariance matrix (reference datastream.py:1100-1147)."""
        from .operators.linalg import covariance as _cov
        return _cov(self.df, columns)

    # ------------------------------------------------------------------
    # sort / top-k (SURVEY §2.5)
    # ------------------------------------------------------------------
    def top_k(self, columns, k: int, descending=None) -> "DataStream":
        """ORDER BY ... LIMIT k. Catalyst plans TakeOrderedAndProject —
        per-partition top-k then a single merge, the same two-phase
        algorithm as the reference (datastream.py:1702-1767)."""
        cols = [columns] if isinstance(columns, str) else list(columns)
        if descending is None:
            descending = [False] * len(cols)
        if isinstance(descending, bool):
            descending = [descending] * len(cols)
        order = [F.col(c).desc() if d else F.col(c).asc()
                 for c, d in zip(cols, descending)]
        return DataStream(self.qc, self.df.orderBy(*order).limit(k))

    def sort(self, columns, descending=False) -> "DataStream":
        """Global sort → range-partitioned external sort (Spark native);
        result carries the sort contract like read_sorted_* does."""
        cols = [columns] if isinstance(columns, str) else list(columns)
        if isinstance(descending, bool):
            descending = [descending] * len(cols)
        order = [F.col(c).desc() if d else F.col(c).asc()
                 for c, d in zip(cols, descending)]
        df = self.df.orderBy(*order)
        return DataStream(self.qc, df, sorted={c: "range" for c in cols})

    def limit(self, n: int) -> "DataStream":
        return DataStream(self.qc, self.df.limit(n))

    # ------------------------------------------------------------------
    # vector ops (SURVEY §2.3 vector_nn_join)
    # ------------------------------------------------------------------
    def vector_nn_join(self, probe_df, vec_column: str, k: int = 1,
                       probe_side: str = "left",
                       scan_info: dict | None = None) -> "DataStream":
        """k-NN join of a small probe table against this vector stream
        (reference datastream.py:396-476). Broadcast probe matrix +
        Arrow-batched NumPy dot + global top-k — see operators/similarity.

        PROBE PUSHDOWN (reference ``__push_ann__`` df.py:1264-1352):
        when this stream is an unmodified ``read_lance`` scan of a
        layout written by ``functions.ann_index.write_ann_index``, the
        probes push into the source — only index-selected fragments
        are read (exact answer, see ann_index.ann_index_topk). Any
        intermediate transform drops the provenance and the full-scan
        broadcast path runs. ``scan_info`` (a dict you pass in) is
        filled with fragments_total/fragments_read when pushdown ran."""
        ann_path = getattr(self, "_ann_index_path", None)
        if ann_path is not None:
            from .functions.ann_index import ann_index_topk
            raw = probe_df.df if isinstance(probe_df, DataStream) else probe_df
            return DataStream(self.qc, ann_index_topk(
                self.qc.spark, ann_path, raw, k, vec_column=vec_column,
                scan_info=scan_info))
        from .functions.similarity import nn_join
        raw = probe_df.df if isinstance(probe_df, DataStream) else probe_df
        return DataStream(self.qc, nn_join(self.df, raw, vec_column, k,
                                           probe_side=probe_side))

    def vector_range_join(self, other: "DataStream", vec_column: str,
                          threshold: float = 0.8, other_vec_column: str | None = None,
                          id_column: str = "id1", other_id_column: str = "id2",
                          dim: int | None = None) -> "DataStream":
        """Similarity range join of two vector streams: all pairs with
        cosine ≥ threshold. The reference declares this verb but left
        it a stub (datastream.py:480-492 ``pass``); here it is real —
        LSH-bucketed candidates + exact cosine filter
        (functions/similarity.vector_range_join). Pass ``dim`` to skip
        the plan-time dimensionality probe job."""
        from .functions.similarity import vector_range_join
        right = other.df if isinstance(other, DataStream) else other
        return DataStream(self.qc, vector_range_join(
            self.df, right, left_vec=vec_column,
            right_vec=other_vec_column or vec_column,
            left_id=id_column, right_id=other_id_column,
            threshold=threshold, dim=dim))

    # ------------------------------------------------------------------
    # sinks (SURVEY §2.1)
    # ------------------------------------------------------------------
    def write_csv(self, path: str, output_line_limit: int = 1_000_000,
                  **options) -> "DataStream":
        (self.df.write.mode("overwrite")
         .option("header", "true")
         .option("maxRecordsPerFile", output_line_limit)
         .csv(path, **options))
        return self._filename_stream(path)

    def write_jsonl(self, path: str, output_line_limit: int = 1_000_000,
                    compression: str | None = None,
                    **options) -> "DataStream":
        """Sharded newline-delimited JSON — the LLM-corpus exchange
        format (extension sink next to write_csv/write_parquet): one
        distributed write, ``output_line_limit`` docs per shard,
        optional ``compression`` ("gzip"/"zstd"/...). Returns the
        filename stream like the other sinks; read back with
        ``qc.read_json``."""
        w = (self.df.write.mode("overwrite")
             .option("maxRecordsPerFile", output_line_limit))
        if compression:
            w = w.option("compression", compression)
        w.json(path, **options)
        return self._filename_stream(path)

    def write_parquet(self, path: str, output_line_limit: int = 5_000_000,
                      partition_by: list | None = None,
                      zorder: list | None = None,
                      zorder_files: int | None = None,
                      **options) -> "DataStream":
        """``zorder=[cols]`` clusters the output by the Morton key
        (plans/scaling.cluster_by_zorder) before writing, so every
        file carries tight min/max stats on ALL the listed columns —
        read-side row-group pruning for predicates on any of them.
        ``zorder_files`` sets the output partition count (default:
        current parallelism)."""
        out = self.df
        if zorder:
            from .plans.scaling import cluster_by_zorder
            n = zorder_files or out.rdd.getNumPartitions()
            out = cluster_by_zorder(out, zorder, n)
        w = (out.write.mode("overwrite")
             .option("maxRecordsPerFile", output_line_limit))
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path, **options)
        return self._filename_stream(path)

    def write_orc(self, path: str, output_line_limit: int = 5_000_000,
                  partition_by: list | None = None,
                  **options) -> "DataStream":
        """ORC sink (parity-plus next to write_parquet; same native
        writer contract — one distributed write, hive-layout
        partition_by)."""
        w = (self.df.write.mode("overwrite")
             .option("maxRecordsPerFile", output_line_limit))
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.orc(path, **options)
        return self._filename_stream(path)

    def write_avro(self, path: str,
                   output_line_limit: int = 500_000) -> "DataStream":
        """Avro container sink without the spark-avro jar: executors
        write one container per non-empty partition (splitting at
        ``output_line_limit`` rows) via the pure-Python codec —
        local/shared-filesystem contract like the delta/iceberg local
        writers. Read back with ``qc.read_avro``. Returns the filename
        stream."""
        from .sources.avro_source import spark_write_avro
        spark_write_avro(self.df, path,
                         output_line_limit=output_line_limit)
        return self._filename_stream(path)

    def write_lance(self, path: str, vec_column: str = "vec",
                    id_column: str | None = None, ann_index: bool = True,
                    n_fragments: int = 16,
                    output_line_limit: int = 5_000_000) -> "DataStream":
        """Write this stream as a lancelike fragment layout readable
        back through ``qc.read_lance`` — the materialization the
        reference performs when a vector dataset needs an ANN index
        (reference datastream.py:457-462: lance.write_dataset +
        create_index(IVF_PQ); functions/ann_index.write_ann_index is
        the Spark-first counterpart).

        ``ann_index=True`` (requires ``id_column``) clusters vectors
        into spherical-kmeans fragments and writes the centroid/cone/
        pivot sidecar, so a later ``read_lance(path).vector_nn_join``
        pushes its probes into the source and reads only the
        fragments that can matter. ``ann_index=False`` writes a plain
        parquet fragment directory (scan-only layout)."""
        if ann_index:
            assert id_column, "write_lance(ann_index=True) needs id_column"
            from .functions.ann_index import write_ann_index
            write_ann_index(self.df, path, vec_column=vec_column,
                            id_column=id_column, n_fragments=n_fragments)
        else:
            (self.df.write.mode("overwrite")
             .option("maxRecordsPerFile", output_line_limit).parquet(path))
        return self._filename_stream(path)

    def write_delta(self, path: str, mode: str = "append",
                    key=None) -> int:
        """Commit the stream as a new version of a LOCAL Delta table
        (sources/delta_local.py): one distributed parquet write, one
        atomic JSON commit. ``mode`` append/overwrite/upsert — upsert
        (requires ``key=``) is the copy-on-write MERGE shape: files
        containing matched keys are rewritten without those rows,
        untouched files stay referenced, the stream appends, all in
        ONE version. Readable back (with time travel) through
        ``qc.read_delta``. Returns the committed version.
        Single-writer local tables only."""
        if mode == "upsert":
            if key is None:
                raise ValueError('write_delta(mode="upsert") needs key=')
            from .sources.delta_local import upsert_delta_local
            return upsert_delta_local(self.df.sparkSession, path,
                                      self.df, key)
        from .sources.delta_local import write_delta_local
        return write_delta_local(self.df, path, mode)

    def write_hudi(self, path: str, mode: str = "append") -> str:
        """Commit the stream as a new instant of a LOCAL Hudi
        Copy-on-Write table (sources/hudi_local.py): one distributed
        parquet write, one atomic timeline commit ("overwrite" is a
        replacecommit — the insert_overwrite shape). Readable back
        (with as-of time travel) through ``qc.read_hudi``. Returns the
        instant timestamp. Single-writer local tables only."""
        from .sources.hudi_local import write_hudi_local
        return write_hudi_local(self.df, path, mode)

    def write_iceberg(self, path: str,
                      output_line_limit: int = 5_000_000,
                      mode: str = "append", key=None,
                      catalog: str | None = None) -> int | None:
        """Commit the stream as a new snapshot of a LOCAL Iceberg v2
        table (parity-plus: the reference only reads Iceberg). Data is
        written as parquet by Spark's distributed writer into a
        per-snapshot subdirectory of ``path``/data, then committed via
        the pure-Python metadata layer (sources/iceberg_local.py) —
        readable back (with time travel) through ``read_iceberg``.
        Returns the new snapshot id.

        ``mode="append"`` adds rows; ``mode="upsert"`` (requires
        ``key=``) is the MERGE shape: live rows matching the stream's
        keys are position-deleted and the stream appended in one
        atomic snapshot — the delete set is computed by a distributed
        semi-join and written by Spark, never the driver. Single-writer
        local tables only; concurrent commits need a real catalog.

        CATALOG tables (round 12): pass ``catalog=`` (a pyiceberg
        catalog name) — or a bare ``db.table`` identifier that is not
        a local directory — to commit through pyiceberg transactions
        (sources/iceberg_catalog.write_iceberg_catalog): Spark stages
        the parquet distributed, pyiceberg registers it via add_files
        (append) or an atomic delete-all + add transaction
        (overwrite). Needs the pyiceberg package; returns None (the
        catalog assigns snapshot ids)."""
        import glob
        import os
        import uuid
        from .sources.iceberg_local import (commit_snapshot,
                                            upsert_iceberg_local)
        # implicit catalog routing needs the db.table SHAPE (a dot,
        # no path separators, not an existing directory) — a bare
        # relative name like "mytbl" still creates a local table, as
        # it always did (review finding)
        if catalog is not None or (os.sep not in path
                                   and "/" not in path
                                   and "." in path
                                   and not os.path.isdir(path)):
            from .sources.iceberg_catalog import write_iceberg_catalog
            return write_iceberg_catalog(
                self.qc.spark, self.df, path, mode=mode,
                catalog=catalog, output_line_limit=output_line_limit)
        if mode == "upsert":
            if key is None:
                raise ValueError('write_iceberg(mode="upsert") needs key=')
            return upsert_iceberg_local(self.qc.spark, path, self.df, key,
                                        output_line_limit)
        if mode != "append":
            raise ValueError(f"mode must be append or upsert, got {mode!r}")
        data_dir = os.path.join(path, "data", uuid.uuid4().hex[:12])
        (self.df.write.mode("errorifexists")
         .option("maxRecordsPerFile", output_line_limit)
         .parquet(data_dir))
        files = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
        # evolve_from_df: new columns extend the table schema, so the
        # log-schema scan surfaces them (null for older files)
        return commit_snapshot(path, add_files=files,
                               evolve_from_df=self.df)

    def _filename_stream(self, path: str) -> "DataStream":
        """The reference's sinks return a stream of written filenames
        (datastream.py:129-203)."""
        files = (self.qc.spark.read.format("binaryFile").load(path)
                 .select(F.col("path").alias("filename")))
        return DataStream(self.qc, files)


class GroupedDataStream:
    """Result of groupby(); reference datastream.py:2066-2186."""

    def __init__(self, stream: DataStream, groupby: list, orderby=None,
                 mode: str = "groupby"):
        self.stream = stream
        self.groupby = groupby
        self.orderby = orderby
        self.mode = mode

    def _grouped(self):
        df = self.stream.df
        if self.mode == "rollup":
            return df.rollup(*self.groupby)
        if self.mode == "cube":
            return df.cube(*self.groupby)
        if self.mode == "grouping_sets":
            # self.groupby holds the SET LIST; output grouping columns
            # are the union in first-appearance order
            cols: list = []
            for s in self.groupby:
                for c in s:
                    if c not in cols:
                        cols.append(c)
            return df.groupingSets(self.groupby, *cols)
        return df.groupBy(*self.groupby)

    def _finish(self, df: DataFrame) -> DataStream:
        if self.orderby:
            order = []
            for o in self.orderby:
                if isinstance(o, tuple):
                    col, d = o
                    order.append(F.col(col).desc() if d == "desc" else F.col(col).asc())
                else:
                    order.append(F.col(o).asc())
            df = df.orderBy(*order)
        return DataStream(self.stream.qc, df)

    def agg(self, aggregations: dict) -> DataStream:
        """Dict aggregation; output naming matches the reference
        (_grouped_aggregate, datastream.py:1858-1884): ``col_sum``,
        ``col_mean``...; ``{"*":"count"}`` → ``count``."""
        aggs = []
        for col, spec in aggregations.items():
            specs = [spec] if isinstance(spec, str) else spec
            for a in specs:
                if col == "*":
                    assert a == "count"
                    aggs.append(F.count(F.lit(1)).alias("count"))
                elif a == "min":
                    aggs.append(F.min(col).alias(f"{col}_min"))
                elif a == "max":
                    aggs.append(F.max(col).alias(f"{col}_max"))
                elif a == "mean":
                    aggs.append(F.avg(col).alias(f"{col}_mean"))
                elif a == "avg":
                    aggs.append(F.avg(col).alias(f"{col}_avg"))
                elif a == "sum":
                    aggs.append(F.sum(col).alias(f"{col}_sum"))
                else:
                    raise ValueError(f"unrecognized aggregation {a}")
        df = self._grouped().agg(*aggs)
        return self._finish(df)

    aggregate = agg

    def agg_sql(self, aggregations: str) -> DataStream:
        """Arbitrary SQL aggregate expressions (reference
        datastream.py:1934-1960). Catalyst splits each into partial +
        final automatically (map-side combine) — the decomposition the
        reference implements by hand in sql_utils.py:299-413."""
        parts = _split_top_level_commas(duckdb_to_spark_sql(aggregations))
        exprs = [F.expr(p) for p in parts]
        df = self._grouped().agg(*exprs)
        return self._finish(df)

    def count_distinct(self, col: str) -> DataStream:
        df = (self.stream.df.groupBy(*self.groupby)
              .agg(F.countDistinct(col).alias(f"{col}_count_distinct")))
        return self._finish(df)

    def cogroup(self, right: "GroupedDataStream", executor, new_schema) -> DataStream:
        assert self.groupby == right.groupby
        return self.stream.cogroup(right.stream, executor, self.groupby[0],
                                   new_schema)


# ----------------------------------------------------------------------
# helpers
# ----------------------------------------------------------------------
def _split_top_level_commas(s: str) -> list:
    """Split 'a as x, sum(b) as y' on commas not inside parens/quotes."""
    parts, depth, cur, q = [], 0, [], None
    for ch in s:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
            continue
        if ch in ("'", '"'):
            q = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


def _normalize_schema(schema):
    """Accept StructType, DDL string, or name-list (reference style —
    types unknown, default everything to string is wrong; we require
    types unless given a pyarrow schema)."""
    from pyspark.sql.types import StructType
    if isinstance(schema, StructType):
        return schema
    if isinstance(schema, str):
        from pyspark.sql.types import _parse_datatype_string
        return _parse_datatype_string(schema)
    import pyarrow as pa
    if isinstance(schema, pa.Schema):
        from pyspark.sql.pandas.types import from_arrow_schema
        return from_arrow_schema(schema)
    raise TypeError(
        "new_schema must be a StructType, DDL string like 'a long, b string', "
        "or pyarrow.Schema — a bare name list has no type information")


def _as_pandas(obj):
    import pandas as pd
    if isinstance(obj, pd.DataFrame):
        return obj
    import pyarrow as pa
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    raise TypeError(f"executor returned {type(obj)}")


def _clone_executor(executor):
    """Fresh executor instance per group/partition: deep-copy the
    template the user passed (the reference instantiates one executor
    per channel the same way)."""
    import copy
    return copy.deepcopy(executor)


# ----------------------------------------------------------------------
# LLM-data pipeline verbs (facade over quokka_spark.functions — the
# reference-style ergonomics for the extension vocabulary: chain corpus
# ops directly on the stream instead of importing function modules)
# ----------------------------------------------------------------------
def _llm_verbs():
    """Attach thin delegating verbs. Each wraps the documented function
    (same defaults, same scale shape — see functions/ docstrings and
    SCALE.md); the stream's qc/sort metadata passes through _with."""
    from .functions import dedup as _dedup
    from .functions import sampling as _sampling
    from .functions import text as _text

    def dedup_exact(self, text_col="text", id_col="doc_id"):
        return self._with(_dedup.exact_dedup(self.df, text_col, id_col))

    def dedup_exact_keep_best(self, score_col, text_col="text",
                              id_col="doc_id"):
        return self._with(_dedup.exact_dedup_keep_best(
            self.df, score_col, text_col, id_col))

    def dedup_minhash(self, text_col="text", id_col="doc_id", **kw):
        return self._with(_dedup.minhash_dedup(
            self.df, text_col, id_col, **kw))

    def hash_sample(self, key_col, fraction, salt=""):
        return self._with(_sampling.hash_sample(
            self.df, key_col, fraction, salt))

    def stratified_sample(self, key_col, stratum_col, fractions,
                          default=0.0, salt=""):
        return self._with(_sampling.stratified_hash_sample(
            self.df, key_col, stratum_col, fractions, default, salt))

    def cap_per_key(self, key_col, id_col, max_per_key, salt=""):
        return self._with(_sampling.cap_per_key(
            self.df, key_col, id_col, max_per_key, salt))

    def split_by_hash(self, key_col, fractions, salt="", out="split"):
        return self._with(_sampling.split_by_hash(
            self.df, key_col, fractions, salt, out))

    def sample_by_token_budget(self, budgets, text_col="text",
                               source_col="source", id_col="doc_id",
                               salt=""):
        return self._with(_sampling.sample_by_token_budget(
            self.df, budgets, text_col, source_col, id_col, salt))

    def with_quality_columns(self, text_col="text"):
        return self._with(self.df.select(
            "*", *_text.gopher_quality_columns(text_col)))

    def with_pii_columns(self, text_col="text"):
        return self._with(self.df.select(
            "*", *_text.pii_columns(text_col)))

    def with_readability(self, text_col="text"):
        return self._with(self.df.select(
            "*", *_text.readability_columns(text_col)))

    def c4_filter(self, text_col="text", min_line_words=None):
        """C4 line+page cleaning: rows keep their cleaned text
        (original column replaced) and only c4_keep pages survive."""
        from .functions.text import C4_MIN_LINE_WORDS, c4_filter_columns
        mlw = C4_MIN_LINE_WORDS if min_line_words is None else min_line_words
        cols = c4_filter_columns(text_col, mlw)
        keep = [c for c in self.df.columns if c != text_col]
        staged = self.df.select(*keep, *cols)
        return self._with(
            staged.filter(F.col("c4_keep"))
            .select(*keep, F.col("clean_text").alias(text_col)))

    def bpe_encode(self, merges, text_col="text", id_col="doc_id", **kw):
        from .functions.packing import bpe_encode as _enc
        return self._with(_enc(self.df, merges, text_col, id_col, **kw))

    for f in (dedup_exact, dedup_exact_keep_best, dedup_minhash,
              hash_sample, stratified_sample, cap_per_key, split_by_hash,
              sample_by_token_budget, c4_filter, bpe_encode,
              with_quality_columns, with_pii_columns, with_readability):
        setattr(DataStream, f.__name__, f)


_llm_verbs()
del _llm_verbs
