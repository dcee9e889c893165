"""Pure-Python Apache Iceberg table reader (metadata layer only).

Resolves an on-disk Iceberg table — ``metadata/*.metadata.json`` →
snapshot → manifest list (Avro) → manifests (Avro) → live data files —
and hands the resulting parquet file list to Spark's native parquet
scan. This gives ``QuokkaContext.read_iceberg`` (reference
df.py:802-832, including time travel via ``snapshot``) a working path
in environments without the iceberg-spark runtime jar: the metadata is
KB-scale and driver-side, while the heavy lifting (the actual scan)
stays in Spark's vectorized parquet reader with full predicate
pushdown / column pruning.

Scope (documented, test-enforced):
- format-version 1 and 2 tables, including v2 POSITION deletes
  (applied as a distributed anti-join on ``_metadata`` file/row
  position — see read_iceberg_local); equality deletes raise
  NotImplementedError (they need the schema's equality ids — the
  runtime jar's job).
- metadata must be locally readable (``file://`` or plain paths);
  data files pass through to Spark untouched, so remote data behind a
  mounted path works.
- partition pruning is not re-implemented: Spark still prunes
  row-groups/pages via parquet stats after predicate pushdown. At
  100 TB a jar-based catalog read also prunes entire files via
  manifest partition summaries — that is the one capability this
  fallback trades away, and read_iceberg prefers the jar when present.

Format reference: the public Iceberg table spec
(https://iceberg.apache.org/spec/); Avro decoding via avro_lite.
"""

from __future__ import annotations

import json
import os

from .avro_lite import read_container


def _local(path: str) -> str:
    if path.startswith("file://"):
        return path[len("file://"):]
    return path


def _read_table_metadata(table_path: str) -> dict:
    """Locate and parse the current metadata JSON: version-hint.text
    when present (HadoopTables layout), else the highest-versioned
    ``*.metadata.json``."""
    meta_dir = os.path.join(_local(table_path), "metadata")
    if not os.path.isdir(meta_dir):
        raise FileNotFoundError(
            f"{table_path}: no metadata/ directory — not an Iceberg table")
    hint = os.path.join(meta_dir, "version-hint.text")
    if os.path.exists(hint):
        with open(hint) as f:
            v = f.read().strip()
        cand = [os.path.join(meta_dir, f"v{v}.metadata.json")]
    else:
        files = sorted(f for f in os.listdir(meta_dir)
                       if f.endswith(".metadata.json"))
        if not files:
            raise FileNotFoundError(f"{meta_dir}: no *.metadata.json")
        cand = [os.path.join(meta_dir, files[-1])]
    with open(cand[0]) as f:
        return json.load(f)


def _pick_snapshot(meta: dict, snapshot_id: int | None) -> dict:
    snaps = meta.get("snapshots", [])
    if not snaps:
        raise ValueError("Iceberg table has no snapshots (empty table)")
    if snapshot_id is None:
        cur = meta.get("current-snapshot-id")
        for s in snaps:
            if s.get("snapshot-id") == cur:
                return s
        return snaps[-1]
    for s in snaps:
        if s.get("snapshot-id") == snapshot_id:
            return s
    raise ValueError(f"snapshot {snapshot_id} not found "
                     f"(have {[s.get('snapshot-id') for s in snaps]})")


def snapshot_files(table_path: str,
                   snapshot_id: int | None = None
                   ) -> "tuple[list[str], list[str]]":
    """(data files, position-delete files) of a snapshot (default:
    current).

    Walks manifest-list → manifests, keeping entries whose status is
    EXISTING(0) or ADDED(1) and dropping DELETED(2). Delete manifests
    (v2 ``content=1``) contribute POSITION delete files (entry
    content=1, spec §Position Delete Files: rows of (file_path, pos));
    equality deletes (content=2) abort with NotImplementedError —
    applying them needs the table schema's equality ids, which is the
    jar path's job."""
    meta = _read_table_metadata(table_path)
    snap = _pick_snapshot(meta, snapshot_id)
    paths: list[str] = []
    deletes: list[str] = []
    if "manifest-list" in snap:
        _, manifests = read_container(_local(snap["manifest-list"]))
    else:  # v1 inline manifest list
        manifests = [{"manifest_path": p, "content": 0}
                     for p in snap.get("manifests", [])]
    for mf in manifests:
        is_delete_manifest = mf.get("content", 0) == 1
        _, entries = read_container(_local(mf["manifest_path"]))
        for e in entries:
            if e.get("status", 0) == 2:  # DELETED
                continue
            df = e["data_file"]
            content = df.get("content", 0)
            fmt = str(df.get("file_format", "PARQUET")).upper()
            if fmt != "PARQUET":
                raise NotImplementedError(
                    f"file format {fmt}: only PARQUET is supported")
            if is_delete_manifest:
                if content == 2:
                    raise NotImplementedError(
                        "Iceberg equality deletes are not supported by "
                        "the pure-Python fallback reader; use the "
                        "iceberg-spark runtime jar")
                if content != 1:
                    raise ValueError(
                        f"malformed table: delete manifest "
                        f"{mf['manifest_path']} contains a file with "
                        f"content={content} (expected position deletes)")
                deletes.append(df["file_path"])
            else:
                if content != 0:
                    raise ValueError(
                        f"malformed table: data manifest "
                        f"{mf['manifest_path']} contains a file with "
                        f"content={content}")
                paths.append(df["file_path"])
    return paths, deletes


def snapshot_data_files(table_path: str,
                        snapshot_id: int | None = None) -> list[str]:
    """Live parquet data-file paths of a snapshot — strict form for
    callers that treat the file list as the full row set: refuses
    delete-bearing snapshots (scanning the data files alone would
    resurrect deleted rows). Use snapshot_files / read_iceberg_local
    for delete-aware access."""
    paths, deletes = snapshot_files(table_path, snapshot_id)
    if deletes:
        raise NotImplementedError(
            "snapshot carries row-level delete files; the plain file "
            "list would resurrect deleted rows — use snapshot_files() "
            "or the delete-aware read_iceberg_local()")
    return paths


def _norm_path(c):
    """Manifests may store plain paths where Spark reports file://
    URIs — normalize both to a bare absolute path."""
    from pyspark.sql import functions as F
    return F.regexp_replace(c, "^file:/*", "/")


def _live_df(spark, table_path: str, snapshot_id: int | None,
             keep_position: bool = False):
    """Live rows of a snapshot with position deletes applied; with
    ``keep_position`` the normalized (__qs_fp__, __qs_pos__) columns
    survive — the upsert path needs them to address matched rows."""
    from pyspark.sql import functions as F
    paths, deletes = snapshot_files(table_path, snapshot_id)
    if not paths:
        raise ValueError(f"{table_path}: snapshot has no data files")
    df = (spark.read.parquet(*paths)
          .withColumn("__qs_fp__", _norm_path(F.col("_metadata.file_path")))
          .withColumn("__qs_pos__", F.col("_metadata.row_index")))
    if deletes:
        dd = (spark.read.parquet(*[_local(p) for p in deletes])
              .select(_norm_path(F.col("file_path")).alias("__qs_dfp__"),
                      F.col("pos").cast("long").alias("__qs_dpos__"))
              .distinct())
        df = df.join(dd, (F.col("__qs_fp__") == F.col("__qs_dfp__"))
                     & (F.col("__qs_pos__") == F.col("__qs_dpos__")),
                     "left_anti")
    return df if keep_position else df.drop("__qs_fp__", "__qs_pos__")


def read_iceberg_local(spark, table_path: str, snapshot_id: int | None = None):
    """Spark DataFrame over a local Iceberg table's live data files,
    with v2 POSITION deletes applied as an anti-join on
    (file, row position).

    The delete application is fully distributed: data files feed
    Spark's native parquet scan with ``_metadata.file_path`` /
    ``row_index`` (no Python, no driver materialization), delete files
    are their own parquet scan, and the anti-join broadcasts the
    delete set when small (AQE) or sort-merges on (path, pos) when
    not — delete files never pass through the driver."""
    return _live_df(spark, table_path, snapshot_id)


def upsert_iceberg_local(spark, table_dir: str, df, key_cols,
                         output_line_limit: int = 5_000_000) -> int:
    """MERGE-style upsert, fully distributed: live rows whose key
    matches a row of ``df`` are position-deleted, and ``df`` is
    appended — both in ONE snapshot (readers see the swap atomically,
    time travel sees the pre-upsert state). The matched (file, pos)
    delete set is computed by a Spark semi-join on the _metadata
    columns and written as position-delete parquet by Spark's
    distributed writer — neither the table nor the delete set ever
    passes through the driver; the driver commit is KB of manifests.

    The standard corpus-refresh shape at 100 TB: re-crawled or
    re-scored documents replace their previous versions by key."""
    import glob
    import uuid
    from pyspark.sql import functions as F
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    tdir = _local(table_dir)
    tag = uuid.uuid4().hex[:12]
    live = _live_df(spark, table_dir, None, keep_position=True)
    matched = (live.join(df.select(*keys).distinct(), keys, "left_semi")
               .select(F.col("__qs_fp__").alias("file_path"),
                       F.col("__qs_pos__").cast("long").alias("pos")))
    ddir = os.path.join(tdir, "metadata", f"upsert-del-{tag}")
    matched.write.mode("errorifexists").parquet(ddir)
    delete_files = sorted(glob.glob(os.path.join(ddir, "*.parquet")))
    adir = os.path.join(tdir, "data", f"upsert-{tag}")
    (df.write.mode("errorifexists")
     .option("maxRecordsPerFile", output_line_limit).parquet(adir))
    add_files = sorted(glob.glob(os.path.join(adir, "*.parquet")))
    return commit_snapshot(table_dir, add_files, delete_files)


# ----------------------------------------------------------------------
# table construction (spec-shaped local tables: test fixtures and
# snapshotting existing parquet into a time-travelable layout)
# ----------------------------------------------------------------------

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "field-id": 1},
        {"name": "data_file", "field-id": 2, "type": {
            "type": "record", "name": "r2", "fields": [
                {"name": "content", "type": "int", "field-id": 134},
                {"name": "file_path", "type": "string", "field-id": 100},
                {"name": "file_format", "type": "string", "field-id": 101},
                {"name": "record_count", "type": "long", "field-id": 103},
                {"name": "file_size_in_bytes", "type": "long",
                 "field-id": 104},
            ]}},
    ]}

_MANIFEST_FILE_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
    ]}


def create_local_iceberg_table(table_dir: str,
                               snapshots: list) -> list[int]:
    """Write a spec-shaped unpartitioned Iceberg v2 table whose
    snapshot N contains ``snapshots[N]`` — either a plain list of
    parquet data-file paths, or a dict ``{"data": [...],
    "deletes": [...]}`` where the deletes are position-delete parquet
    files (columns file_path, pos). Files are referenced in place, not
    copied — KB of metadata around existing data. Returns the snapshot
    ids (1-based). Each snapshot gets one data manifest (plus one
    delete manifest when it carries deletes)."""
    from .avro_lite import write_container
    meta_dir = os.path.join(_local(table_dir), "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    snap_entries = []
    for i, spec in enumerate(snapshots, start=1):
        if isinstance(spec, dict):
            files, dels = spec.get("data", []), spec.get("deletes", [])
        else:
            files, dels = spec, []

        def entry(p, content):
            return {"status": 1, "snapshot_id": i, "data_file": {
                "content": content, "file_path": p,
                "file_format": "PARQUET", "record_count": 0,
                "file_size_in_bytes": os.path.getsize(_local(p))}}

        manifest = os.path.join(meta_dir, f"manifest-{i}.avro")
        write_container(manifest, _MANIFEST_ENTRY_SCHEMA,
                        [entry(p, 0) for p in files])
        mlist_rows = [{"manifest_path": manifest,
                       "manifest_length": os.path.getsize(manifest),
                       "partition_spec_id": 0, "content": 0,
                       "added_snapshot_id": i}]
        if dels:
            dmanifest = os.path.join(meta_dir, f"manifest-{i}-deletes.avro")
            write_container(dmanifest, _MANIFEST_ENTRY_SCHEMA,
                            [entry(p, 1) for p in dels])
            mlist_rows.append({"manifest_path": dmanifest,
                               "manifest_length": os.path.getsize(dmanifest),
                               "partition_spec_id": 0, "content": 1,
                               "added_snapshot_id": i})
        mlist = os.path.join(meta_dir, f"snap-{i}.avro")
        write_container(mlist, _MANIFEST_FILE_SCHEMA, mlist_rows)
        snap_entries.append({"snapshot-id": i, "sequence-number": i,
                             "timestamp-ms": 0, "manifest-list": mlist,
                             "summary": {"operation": "append"}})
    n = len(snapshots)
    meta = {"format-version": 2, "table-uuid": "0" * 32,
            "location": table_dir, "last-sequence-number": n,
            "current-snapshot-id": n, "snapshots": snap_entries,
            "schemas": [], "partition-specs": [{"spec-id": 0,
                                                "fields": []}]}
    with open(os.path.join(meta_dir, f"v{n}.metadata.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write(str(n))
    return [s["snapshot-id"] for s in snap_entries]


def append_snapshot(table_dir: str, new_files: list[str]) -> int:
    """Commit ``new_files`` as a new snapshot of a local table
    (creating the table when absent). The new snapshot contains every
    live file of the current snapshot plus ``new_files`` — Iceberg
    append semantics. Returns the new snapshot id.

    Metadata-only: rewrites KB of manifests; data files are referenced
    in place. Driver-side by design — a real catalog commit is also a
    single-writer metadata swap; concurrent writers need a catalog
    (the jar path), not this."""
    return commit_snapshot(table_dir, add_files=list(new_files))


def commit_snapshot(table_dir: str, add_files: list | None = None,
                    add_delete_files: list | None = None) -> int:
    """General single-writer commit: a new snapshot = current live
    files + ``add_files``, current delete files + ``add_delete_files``
    — appends, deletes, or both atomically (the one-snapshot upsert
    shape). Metadata-only; returns the new snapshot id."""
    prior: list[dict] = []
    if os.path.isdir(os.path.join(_local(table_dir), "metadata")):
        meta = _read_table_metadata(table_dir)
        for s in meta.get("snapshots", []):
            d, dels = snapshot_files(table_dir, s.get("snapshot-id"))
            prior.append({"data": d, "deletes": dels})
    current = prior[-1] if prior else {"data": [], "deletes": []}
    new_snap = {"data": current["data"] + list(add_files or []),
                "deletes": current["deletes"] + list(add_delete_files or [])}
    ids = create_local_iceberg_table(table_dir, prior + [new_snap])
    return ids[-1]


def add_position_deletes(table_dir: str,
                         deletes: "dict[str, list[int]]") -> int:
    """Commit a new snapshot that position-deletes the given rows:
    ``deletes`` maps a data-file path to the 0-based row positions to
    remove (Iceberg v2 position-delete semantics). Writes one
    position-delete parquet (file_path, pos — spec-ordered) plus KB of
    manifests; data files untouched. Returns the new snapshot id.

    Same driver-side single-writer caveat as append_snapshot. For
    large delete sets produced by a distributed computation, write the
    (file_path, pos) parquet with Spark and commit via
    commit_snapshot(add_delete_files=...) instead (the upsert path)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    tdir = _local(table_dir)
    meta = _read_table_metadata(table_dir)
    n = len(meta.get("snapshots", [])) + 1
    rows_fp, rows_pos = [], []
    for path, positions in deletes.items():
        for p in sorted(positions):
            rows_fp.append(path)
            rows_pos.append(int(p))
    dpath = os.path.join(tdir, "metadata", f"delete-{n}.parquet")
    pq.write_table(pa.table({"file_path": pa.array(rows_fp, pa.string()),
                             "pos": pa.array(rows_pos, pa.int64())}), dpath)
    return commit_snapshot(table_dir, add_delete_files=[dpath])
