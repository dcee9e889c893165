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
- format-version 1 and 2 append-only tables; row-level deletes
  (v2 delete manifests / delete files) raise NotImplementedError —
  correct results would require applying positional/equality deletes.
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


def snapshot_data_files(table_path: str,
                        snapshot_id: int | None = None) -> list[str]:
    """Live parquet data-file paths of a snapshot (default: current).

    Walks manifest-list → manifests, keeping entries whose status is
    EXISTING(0) or ADDED(1) and dropping DELETED(2). Any delete
    manifest (v2 ``content=1``) or non-data file content aborts with
    NotImplementedError rather than returning rows that should have
    been deleted."""
    meta = _read_table_metadata(table_path)
    snap = _pick_snapshot(meta, snapshot_id)
    paths: list[str] = []
    if "manifest-list" in snap:
        _, manifests = read_container(_local(snap["manifest-list"]))
    else:  # v1 inline manifest list
        manifests = [{"manifest_path": p, "content": 0}
                     for p in snap.get("manifests", [])]
    for mf in manifests:
        if mf.get("content", 0) != 0:
            raise NotImplementedError(
                "Iceberg v2 delete manifests are not supported by the "
                "pure-Python fallback reader; use the iceberg-spark "
                "runtime jar for tables with row-level deletes")
        _, entries = read_container(_local(mf["manifest_path"]))
        for e in entries:
            if e.get("status", 0) == 2:  # DELETED
                continue
            df = e["data_file"]
            if df.get("content", 0) != 0:
                raise NotImplementedError(
                    "delete files in a data manifest are not supported "
                    "by the pure-Python fallback reader")
            fmt = str(df.get("file_format", "PARQUET")).upper()
            if fmt != "PARQUET":
                raise NotImplementedError(
                    f"data file format {fmt}: only PARQUET is supported")
            paths.append(df["file_path"])
    return paths


def read_iceberg_local(spark, table_path: str, snapshot_id: int | None = None):
    """Spark DataFrame over a local Iceberg table's live data files."""
    paths = snapshot_data_files(table_path, snapshot_id)
    if not paths:
        raise ValueError(f"{table_path}: snapshot has no data files")
    return spark.read.parquet(*paths)


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
                               snapshots: list[list[str]]) -> list[int]:
    """Write a spec-shaped unpartitioned Iceberg v2 table whose
    snapshot N contains the parquet files ``snapshots[N]`` (absolute
    paths; referenced in place, not copied — KB of metadata around
    existing data). Returns the snapshot ids (1-based). Each snapshot
    gets one manifest holding its full file list (append-only
    semantics are the caller's concern)."""
    from .avro_lite import write_container
    meta_dir = os.path.join(_local(table_dir), "metadata")
    os.makedirs(meta_dir, exist_ok=True)
    snap_entries = []
    for i, files in enumerate(snapshots, start=1):
        manifest = os.path.join(meta_dir, f"manifest-{i}.avro")
        write_container(manifest, _MANIFEST_ENTRY_SCHEMA, [
            {"status": 1, "snapshot_id": i, "data_file": {
                "content": 0, "file_path": p, "file_format": "PARQUET",
                "record_count": 0,
                "file_size_in_bytes": os.path.getsize(_local(p))}}
            for p in files])
        mlist = os.path.join(meta_dir, f"snap-{i}.avro")
        write_container(mlist, _MANIFEST_FILE_SCHEMA, [
            {"manifest_path": manifest,
             "manifest_length": os.path.getsize(manifest),
             "partition_spec_id": 0, "content": 0,
             "added_snapshot_id": i}])
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
    tdir = _local(table_dir)
    prior: list[list[str]] = []
    if os.path.isdir(os.path.join(tdir, "metadata")):
        meta = _read_table_metadata(table_dir)
        for s in meta.get("snapshots", []):
            prior.append(snapshot_data_files(table_dir,
                                             s.get("snapshot-id")))
    current = prior[-1] if prior else []
    ids = create_local_iceberg_table(table_dir,
                                     prior + [current + list(new_files)])
    return ids[-1]
