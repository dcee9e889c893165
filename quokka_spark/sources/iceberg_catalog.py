"""Catalog-backed Iceberg reads via pyiceberg — no runtime jar.

The reference reads catalog (Glue) Iceberg tables through the PUBLIC
``pyiceberg`` package (reference df.py:802-832: pyiceberg catalog →
``scan().plan_files()`` → parquet file list → its own scan); this
module is the same split re-expressed Spark-first: pyiceberg plans
the FILES (driver-side, KB of metadata), Spark's native parquet scan
reads them (pushdown/pruning as on raw parquet).

Import-gated: ``pyiceberg`` is an optional dependency — absent, the
caller (QuokkaContext.read_iceberg) keeps its typed jar/local-dir
error. Tables whose current scan carries row-level DELETE files
refuse typed (the jar — or a local table directory, which the
pure-Python reader handles deletes for — covers those).
"""

from __future__ import annotations


def _snapshot_at_timestamp(tbl, ts_ms: int):
    """Newest snapshot with timestamp_ms <= ts_ms (Iceberg's
    as-of-timestamp contract), from the table metadata pyiceberg
    already holds — no extra catalog round-trip."""
    best = None
    for s in tbl.metadata.snapshots:
        if int(s.timestamp_ms) <= int(ts_ms) and (
                best is None or int(s.timestamp_ms)
                > int(best.timestamp_ms)):
            best = s
    if best is None:
        raise ValueError(
            f"no snapshot at or before timestamp {ts_ms} ms — the "
            "table's earliest snapshot is newer")
    return int(best.snapshot_id)


def read_iceberg_catalog(spark, table: str, snapshot: int | None = None,
                         partition_filter: str | None = None,
                         scan_filter: str | None = None,
                         as_of_timestamp=None,
                         catalog: str | None = None):
    """DataFrame over a CATALOG Iceberg table: pyiceberg resolves the
    table and plans the file set (its planner applies partition and
    metrics pruning when the filter parses); Spark's native parquet
    scan reads the planned files. Both filters additionally apply
    ROW-LEVEL in Spark, so any filter shape stays exact even when
    pyiceberg's string parser cannot push it down."""
    from pyiceberg.catalog import load_catalog

    cat = load_catalog(catalog) if catalog else load_catalog()
    tbl = cat.load_table(table)
    if as_of_timestamp is not None:
        from .delta_local import _to_epoch_ms
        snapshot = _snapshot_at_timestamp(tbl,
                                          _to_epoch_ms(as_of_timestamp))
    scan_kwargs: dict = {}
    if snapshot is not None:
        scan_kwargs["snapshot_id"] = int(snapshot)
    # best-effort pushdown: pyiceberg's row_filter accepts simple SQL
    # strings; an unparseable filter falls back to plan-everything
    # (the Spark row filter below keeps the result exact either way)
    pushdown = " AND ".join(f"({f})" for f in
                            [partition_filter, scan_filter] if f)
    if pushdown:
        try:
            scan = tbl.scan(row_filter=pushdown, **scan_kwargs)
            tasks = list(scan.plan_files())
        except Exception:
            tasks = list(tbl.scan(**scan_kwargs).plan_files())
    else:
        tasks = list(tbl.scan(**scan_kwargs).plan_files())
    with_deletes = [t for t in tasks if getattr(t, "delete_files", None)]
    if with_deletes:
        raise NotImplementedError(
            f"catalog table {table}: the planned scan carries "
            f"row-level delete files on {len(with_deletes)} task(s) — "
            "read it with the iceberg runtime jar, or as a local "
            "table directory (the pure-Python reader applies v2 "
            "position/equality deletes)")
    files = sorted(t.file.file_path for t in tasks)
    if not files:
        # typed empty frame mapped from the pyiceberg schema
        from pyspark.sql.types import (BooleanType, DateType, DoubleType,
                                       FloatType, IntegerType, LongType,
                                       StringType, StructField,
                                       StructType, TimestampType)
        by_name = {"boolean": BooleanType(), "int": IntegerType(),
                   "long": LongType(), "float": FloatType(),
                   "double": DoubleType(), "date": DateType(),
                   "string": StringType(), "timestamptz": TimestampType(),
                   "timestamp": TimestampType()}
        df = spark.createDataFrame([], StructType(
            [StructField(f.name,
                         by_name.get(str(f.field_type), StringType()),
                         True) for f in tbl.schema().fields]))
    else:
        df = spark.read.parquet(*[f.removeprefix("file://")
                                  for f in files])
    if partition_filter:
        df = df.filter(partition_filter)
    if scan_filter:
        df = df.filter(scan_filter)
    return df
