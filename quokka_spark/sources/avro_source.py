"""Distributed Avro container source/sink on the pure-Python codec.

Parity-plus source (the reference reads csv/parquet/iceberg/lance;
this rounds out the lake-exchange formats next to the ORC and Delta
extensions). Spark's own Avro support lives in the external
spark-avro jar, which this container does not ship — so the portable
plan is a ``binaryFile`` scan (one input split per container file;
Avro containers are file-sized units by construction) feeding the
same avro_lite codec the Iceberg manifest reader uses, Arrow-batched
per file inside ``mapInPandas``. Column pruning happens after decode
(the container is row-major, so a narrower projection saves Arrow
transfer, not I/O — the format's own limitation, not the plan's).

Type mapping (both directions):

  boolean/int/long/float/double/string/enum/bytes/fixed → the obvious
  Spark primitive; ``["null", X]`` unions → nullable X;
  ``{"type": "array", "items": prim}`` → ArrayType;
  logicalType ``date`` (int days) ↔ DateType and
  ``timestamp-micros`` (long) ↔ TimestampType — converted at any
  nesting depth (array items, nested-record fields) and null-safe.
  Nested records decode to StructType on READ; richer shapes (maps,
  non-null unions, decimal logical types, struct WRITES) raise
  NotImplementedError with the exact offending field — never a silent
  misread.

At 100 TB: one task per file is the natural Avro parallelism (files
are the format's split unit under a sync-marker scan too); the decode
is the Python-side cost and is why parquet/ORC remain the preferred
lake formats — this source exists so Avro event dumps can enter the
engine without a jar, not to be the hot path.
"""

from __future__ import annotations

import datetime
import glob
import os
import uuid

from .avro_lite import read_container_bytes, read_container_meta, \
    write_container

# bare-string primitives only; enum/fixed are dicts in valid Avro, so a
# bare "enum"/"fixed" string falls through to the loud-gate path below
_PRIM_TO_SPARK = {
    "boolean": "boolean", "int": "int", "long": "bigint",
    "float": "float", "double": "double", "string": "string",
    "bytes": "binary",
}

_EPOCH = datetime.date(1970, 1, 1)


def _strip_null(sch):
    """``["null", X]`` / ``[X, "null"]`` → (X, nullable)."""
    if isinstance(sch, list):
        rest = [s for s in sch if s != "null"]
        if len(rest) != 1:
            raise NotImplementedError(
                f"avro union {sch!r} is not a simple nullable union")
        return rest[0], True
    return sch, False


def _avro_to_spark_type(sch, field: str):
    from pyspark.sql import types as T
    sch, _ = _strip_null(sch)
    if isinstance(sch, str):
        if sch not in _PRIM_TO_SPARK:
            raise NotImplementedError(
                f"avro type {sch!r} of field {field!r} is not supported")
        return getattr(T, {
            "boolean": "BooleanType", "int": "IntegerType",
            "long": "LongType", "float": "FloatType",
            "double": "DoubleType", "string": "StringType",
            "bytes": "BinaryType",
        }[sch])()
    t = sch.get("type")
    lt = sch.get("logicalType")
    if lt == "date" and t == "int":
        return T.DateType()
    if lt in ("timestamp-micros", "timestamp-millis") and t == "long":
        return T.TimestampType()
    if lt == "decimal":
        raise NotImplementedError(
            f"avro decimal logical type (field {field!r}) — read the "
            "column as bytes and decode explicitly")
    if t in ("enum",):
        return T.StringType()
    if t in ("fixed",):
        return T.BinaryType()
    if t == "array":
        return T.ArrayType(_avro_to_spark_type(sch["items"], field))
    if t == "record":
        return T.StructType([
            T.StructField(f["name"],
                          _avro_to_spark_type(f["type"], f["name"]),
                          True)
            for f in sch["fields"]])
    if t in _PRIM_TO_SPARK:
        return _avro_to_spark_type(t, field)
    raise NotImplementedError(
        f"avro type {sch!r} of field {field!r} is not supported")


def avro_spark_schema(record_schema: dict):
    """Top-level Avro record schema → Spark StructType."""
    from pyspark.sql import types as T
    assert record_schema.get("type") == "record", record_schema
    return T.StructType([
        T.StructField(f["name"],
                      _avro_to_spark_type(f["type"], f["name"]), True)
        for f in record_schema["fields"]])


def _is_missing(v) -> bool:
    """None, or the float NaN that ``pd.DataFrame.from_records``
    substitutes for None in numeric columns."""
    if v is None:
        return True
    return isinstance(v, float) and v != v


def _value_converter(sch):
    """Converter from a decoded raw value to what Arrow accepts for
    the mapped Spark type, or None when the raw value is already
    right. Recurses into arrays and nested records so logical types
    convert at any depth, matching the read-schema mapping in
    ``_avro_to_spark_type``."""
    sch, _ = _strip_null(sch)
    if not isinstance(sch, dict):
        return None
    t, lt = sch.get("type"), sch.get("logicalType")
    if lt == "date" and t == "int":
        return (lambda v: None if _is_missing(v)
                else _EPOCH + datetime.timedelta(days=int(v)))
    if lt == "timestamp-micros" and t == "long":
        return (lambda v: None if _is_missing(v)
                else datetime.datetime(1970, 1, 1)
                + datetime.timedelta(microseconds=int(v)))
    if lt == "timestamp-millis" and t == "long":
        return (lambda v: None if _is_missing(v)
                else datetime.datetime(1970, 1, 1)
                + datetime.timedelta(milliseconds=int(v)))
    if t == "array":
        ifn = _value_converter(sch["items"])
        if ifn is not None:
            return (lambda v, _ifn=ifn:
                    None if v is None else [_ifn(x) for x in v])
        return None
    if t == "record":
        fns = {f["name"]: c for f in sch["fields"]
               if (c := _value_converter(f["type"])) is not None}
        if fns:
            return (lambda v, _fns=fns: None if v is None else
                    {**v, **{k: fn(v.get(k)) for k, fn in _fns.items()}})
        return None
    return None


def _logical_converters(record_schema: dict) -> dict:
    """{field: fn} decoding raw logical-type values (at any nesting
    depth) to Python objects Arrow accepts for the mapped Spark
    type."""
    return {f["name"]: c for f in record_schema["fields"]
            if (c := _value_converter(f["type"])) is not None}


def _avro_files(path: str) -> list:
    if os.path.isfile(path):
        return [path]
    files = sorted(glob.glob(os.path.join(path, "*.avro")))
    if not files:
        files = sorted(glob.glob(os.path.join(path, "**", "*.avro"),
                                 recursive=True))
    if not files:
        raise FileNotFoundError(f"no .avro container files under {path!r}")
    return files


def spark_read_avro(spark, path, groups=None, key_fields=None,
                    fallback_schema=None):
    """DataFrame over the container files at ``path`` (file, dir, or
    an explicit list of file paths — the Hudi MoR log scan passes the
    timeline's log-file list directly). Schema comes from the FIRST
    file's writer schema (the avro_lite contract); every file must
    carry a compatible record layout.

    ``groups``: optional list of file-path lists — each group is one
    FILE SLICE's logs in timeline order, decoded together in one task
    so HoodieLogFormat rollback commands can invalidate blocks in an
    earlier rolled-over file of the same slice (hudi_logfmt.
    read_slice_log_records). Parallelism is per slice instead of per
    file — the natural MoR unit (slices stay small under compaction;
    slice COUNT is what grows at 100 TB). ``key_fields``: the table's
    record-key columns, needed to decode delete-block tombstones."""
    import json as _json

    import pandas as pd

    if groups is not None:
        groups = [list(g) for g in groups if g]
        files = [p for g in groups for p in g]
    else:
        files = (list(path) if isinstance(path, (list, tuple))
                 else _avro_files(path))
    if not files:
        raise FileNotFoundError("spark_read_avro: empty file list")
    # header-only sniffs: O(KB) regardless of file size. A file may be
    # a plain Avro container OR a HoodieLogFormat-framed hudi-writer
    # log (sources/hudi_logfmt) — both carry their writer schema up
    # front, and the executor decode dispatches per file, so mixed
    # log directories (this engine's containers next to a real hudi
    # writer's framed logs) read as one scan.
    with open(files[0], "rb") as _fh:
        _head = _fh.read(6)
    if _head == b"#HUDI#":
        from .hudi_logfmt import read_log_schema
        # a file may carry ONLY delete/command blocks (a pure
        # hard-delete deltacommit log) — sniff the next file rather
        # than failing the whole scan; only a table with no data
        # block anywhere refuses
        record_schema = None
        last_exc = None
        for _f in files:
            with open(_f, "rb") as _fh2:
                framed = _fh2.read(6) == b"#HUDI#"
            try:
                record_schema = (read_log_schema(_f) if framed
                                 else _json.loads(read_container_meta(
                                     _f)["avro.schema"]))
                break
            except NotImplementedError as e:
                if "no avro_data block" not in str(e):
                    raise
                last_exc = e
        if record_schema is None:
            if fallback_schema is not None:
                # EVERY log is a pure hard-delete file: the caller
                # (the MoR merge, which knows the base schema)
                # supplies the payload schema the tombstones type
                # under
                record_schema = fallback_schema
            else:
                raise ValueError(
                    "spark_read_avro: no log file carries an "
                    "avro_data block — delete-only logs have no "
                    "payload schema to read under") from last_exc
        # delete-block tombstones surface as _hoodie_is_deleted rows
        # even when the payload schema lacks the soft-delete field —
        # without widening the schema here, the flag would be DROPPED
        # by the projection below and deleted rows would resurrect
        names_now = {f["name"] for f in record_schema["fields"]}
        if "_hoodie_is_deleted" not in names_now:
            record_schema = dict(record_schema)
            record_schema["fields"] = record_schema["fields"] + [
                {"name": "_hoodie_is_deleted",
                 "type": ["null", "boolean"], "default": None}]
    else:
        meta = read_container_meta(files[0])
        record_schema = _json.loads(meta["avro.schema"])
    sstruct = avro_spark_schema(record_schema)
    names = [f.name for f in sstruct.fields]
    convs = _logical_converters(record_schema)

    def _plain_int(t) -> bool:
        # a nullable plain int/long field: from_records would coerce
        # a None-bearing column to float64, silently rounding longs
        # above 2^53 — build those as pandas nullable Int64 instead
        if isinstance(t, list):
            t = [x for x in t if x != "null"]
            t = t[0] if len(t) == 1 else None
        if isinstance(t, dict):
            return t.get("type") in ("int", "long") \
                and "logicalType" not in t
        return t in ("int", "long")

    int_cols = {f["name"] for f in record_schema["fields"]
                if _plain_int(f["type"]) and f["name"] not in convs}

    # one row per file (or per slice-group), decoded in the executors
    # (shared-filesystem contract, same as every local-lakehouse
    # scan). NOT binaryFile: Spark's file index silently drops hidden
    # files, and Hudi MoR log files are dot-named per spec — "all
    # paths were ignored" would serve a stale merge.
    units = (groups if groups is not None else [[f] for f in files])
    paths = spark.createDataFrame(
        [(_json.dumps([os.path.abspath(f) for f in g]),) for g in units],
        "__qs_paths string")
    par = min(len(units), spark.sparkContext.defaultParallelism)
    if par > 1:
        paths = paths.repartition(par)
    kf = list(key_fields) if key_fields else None
    sliced = groups is not None
    # closure-shipped to executors: types tombstone keys on slices
    # with NO data block of their own (pure hard-delete slices)
    hint = record_schema if _head == b"#HUDI#" else None

    def decode(it):
        import json as _j
        for pdf in it:
            for enc in pdf["__qs_paths"]:
                group = _j.loads(enc)
                # framed files of an explicit slice-group decode
                # TOGETHER in order (slice-scoped rollbacks; absent
                # target = no-op, the view is complete); without
                # groups each file keeps the STRICT per-file scope
                # (absent target refuses — it may live one rolled-over
                # file away). Plain containers decode per file.
                framed, records = [], []
                for p in group:
                    with open(p, "rb") as fh:
                        data = fh.read()
                    if data[:6] == b"#HUDI#":
                        if sliced:
                            framed.append((data, p))
                        else:
                            from quokka_spark.sources.hudi_logfmt import \
                                read_log_records_bytes
                            _, recs = read_log_records_bytes(
                                data, name=p, key_fields=kf,
                                schema_hint=hint)
                            records.extend(recs)
                    else:
                        _, recs = read_container_bytes(data, name=p)
                        records.extend(recs)
                if framed:
                    from quokka_spark.sources.hudi_logfmt import \
                        read_slice_log_records
                    _, recs = read_slice_log_records(framed,
                                                     key_fields=kf,
                                                     schema_hint=hint)
                    records.extend(recs)
                cols = {}
                for name in names:
                    vals = [r.get(name) for r in records]
                    cols[name] = (pd.array(vals, dtype="Int64")
                                  if name in int_cols
                                  else pd.Series(vals, dtype="object"))
                out = pd.DataFrame(cols, columns=names)
                for col, fn in convs.items():
                    out[col] = out[col].map(fn)
                yield out

    return paths.mapInPandas(decode, schema=sstruct)


# ---------------------------------------------------------------- write

def record_value(v, fn):
    """Apply a field converter to one Arrow-sourced Python value:
    None passes through, sequences convert elementwise via ``fn``.
    NaN doubles are PRESERVED — NaN and null are distinguishable in
    Spark (isnan vs isNull), and the Arrow ``to_pydict`` path already
    yields real None for nulls, so coercing NaN would destroy
    legitimate data (it did, in an earlier pandas-based writer)."""
    import numpy as np
    if v is None:
        return None
    if isinstance(v, (list, np.ndarray)):
        return fn(list(v))
    return fn(v)


def _spark_to_avro_field(field) -> tuple:
    """StructField → (avro schema, row-value converter)."""
    from pyspark.sql import types as T
    dt = field.dataType
    if isinstance(dt, T.BooleanType):
        sch, fn = "boolean", lambda v: bool(v)
    elif isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType)):
        sch, fn = "int", lambda v: int(v)
    elif isinstance(dt, T.LongType):
        sch, fn = "long", lambda v: int(v)
    elif isinstance(dt, T.FloatType):
        sch, fn = "float", lambda v: float(v)
    elif isinstance(dt, (T.DoubleType,)):
        sch, fn = "double", lambda v: float(v)
    elif isinstance(dt, T.StringType):
        sch, fn = "string", lambda v: str(v)
    elif isinstance(dt, T.BinaryType):
        sch, fn = "bytes", lambda v: bytes(v)
    elif isinstance(dt, T.DateType):
        sch = {"type": "int", "logicalType": "date"}
        fn = (lambda v: (v.date() if hasattr(v, "date") else v)
              .toordinal() - _EPOCH.toordinal())
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        sch = {"type": "long", "logicalType": "timestamp-micros"}

        def fn(v):
            if hasattr(v, "value"):           # pd.Timestamp: exact ns
                return int(v.value // 1000)
            # plain datetime (arrow to_pydict): exact integer µs —
            # timestamp()*1e6 goes through float64 seconds and can
            # round the microsecond. Aware values subtract the UTC
            # epoch (the spec says timestamp-micros is a UTC instant;
            # an epoch built at v.tzinfo's 1970 offset would encode
            # session-local wall time and shift by the DST delta);
            # naive values keep the naive epoch, the NTZ wall-clock
            # convention shared with the reader.
            epoch = (datetime.datetime(1970, 1, 1,
                                       tzinfo=datetime.timezone.utc)
                     if v.tzinfo is not None
                     else datetime.datetime(1970, 1, 1))
            return (v - epoch) // datetime.timedelta(microseconds=1)
    elif isinstance(dt, T.ArrayType):
        inner = T.StructField("item", dt.elementType)
        isch, ifn = _spark_to_avro_field(inner)
        sch = {"type": "array", "items": isch}
        fn = (lambda v, _ifn=ifn: [None if x is None else _ifn(x)
                                   for x in v])
    else:
        raise NotImplementedError(
            f"write_avro: column {field.name!r} of type "
            f"{dt.simpleString()} is not supported — cast it or write "
            "parquet/orc instead")
    return ["null", sch], fn


def spark_write_avro(df, path: str,
                     output_line_limit: int = 500_000):
    """Distributed write: one container file per non-empty partition
    (plus ``output_line_limit`` splits within a partition), on a
    local/shared filesystem — the same contract as the delta/iceberg
    local writers. Commit protocol: tasks write into a sibling staging
    directory and the driver moves EXACTLY the filenames returned by
    successful task attempts into ``path`` — orphans from failed or
    speculative attempts are discarded, and the old ``path`` contents
    are replaced only after the job succeeds. Returns the committed
    filenames. Overwrites ``path`` (directory or regular file)."""
    import shutil

    import pandas as pd

    fields = [(f.name, *_spark_to_avro_field(f)) for f in df.schema.fields]
    avro_schema = {
        "type": "record", "name": "row",
        "fields": [{"name": n, "type": sch} for n, sch, _ in fields]}
    staging = (os.path.abspath(path).rstrip("/")
               + f".staging-{uuid.uuid4().hex}")
    os.makedirs(staging)

    def write_part(it):
        # mapInArrow, NOT mapInPandas: the pandas conversion coerces
        # a None-bearing int/long column to float64, silently rounding
        # longs above 2^53 before this code ever sees them. Arrow
        # batches keep nullable int64 exact; to_pydict() yields plain
        # Python ints and Nones.
        import pyarrow as pa
        buf = []
        written = []

        def flush():
            if buf:
                fn = os.path.join(staging, f"part-{uuid.uuid4().hex}.avro")
                write_container(fn, avro_schema, buf)
                written.append(fn)
                buf.clear()

        for batch in it:
            raw = batch.to_pydict()
            cols = {name: [record_value(v, fn) for v in raw[name]]
                    for name, _sch, fn in fields}
            for rec in (dict(zip(cols, vals))
                        for vals in zip(*cols.values())):
                buf.append(rec)
                if len(buf) >= output_line_limit:
                    flush()
        flush()
        yield pa.RecordBatch.from_pydict(
            {"filename": pa.array(written, type=pa.string())})

    try:
        out = df.mapInArrow(write_part, "filename string")
        staged = [r["filename"] for r in out.collect()]
        if os.path.isdir(path):
            shutil.rmtree(path)
        elif os.path.isfile(path):
            os.unlink(path)
        os.makedirs(path)
        files = []
        for f in staged:
            dst = os.path.join(path, os.path.basename(f))
            os.replace(f, dst)
            files.append(dst)
        return files
    finally:
        shutil.rmtree(staging, ignore_errors=True)
