"""Pure-Python local Delta Lake tables — no delta-spark jar.

Extension source (the reference reads csv/parquet/iceberg/lance;
Delta rounds out the lakehouse trio). The Delta transaction log is
the simplest of the table formats: ``_delta_log/<20-digit>.json``
files of newline-delimited JSON actions (``protocol`` / ``metaData``
/ ``add`` / ``remove``), replayed in version order — state is simply
the set of added-and-not-removed files. That makes a spec-shaped
local implementation ~150 lines:

- :func:`read_delta_local` replays the log up to ``version`` (time
  travel) and hands the live file list to Spark's native parquet
  scan — pushdown/pruning work exactly as on raw parquet.
- :func:`write_delta_local` commits Spark-written parquet as new
  versions (append / overwrite), and
  :func:`create_local_delta_table` lays versions over EXISTING
  parquet files in place (the oracle-gate pattern shared with
  iceberg_local).

Gated out (clear errors, not wrong answers): checkpoint parquet files
(only needed past thousands of commits; the log replay is exact
without them), partition columns in add actions, and deletion
vectors. ``metaData.schemaString`` is written spec-correctly (it IS
Spark's schema JSON) but reading trusts the parquet footers, which is
what Spark's scan enforces anyway.
"""

from __future__ import annotations

import json
import os
import time
import uuid


def _log_dir(table: str) -> str:
    return os.path.join(table.removeprefix("file://"), "_delta_log")


def _version_path(table: str, v: int) -> str:
    return os.path.join(_log_dir(table), f"{v:020d}.json")


def list_versions(table: str) -> list:
    d = _log_dir(table)
    if not os.path.isdir(d):
        raise FileNotFoundError(f"not a Delta table (no _delta_log): {table}")
    out = []
    for f in os.listdir(d):
        stem, ext = os.path.splitext(f)
        if ext == ".json" and stem.isdigit():
            out.append(int(stem))
        elif ext in (".parquet", ".checkpoint"):
            raise NotImplementedError(
                "this local Delta reader replays JSON commits only; "
                f"checkpoint file {f} found — compact logs are not "
                "supported (they only appear after log cleanup on "
                "long-lived tables)")
    return sorted(out)


def _replay(table: str, version: int | None) -> tuple[list, dict]:
    """Replay the log through ``version`` (inclusive; None = latest).
    Returns (live file paths, metaData dict)."""
    versions = list_versions(table)
    if not versions:
        raise FileNotFoundError(f"empty _delta_log in {table}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(
            f"version {version} not in table {table}; have {versions}")
    live: dict = {}
    meta: dict = {}
    root = table.removeprefix("file://")
    for v in versions:
        if v > version:
            break
        with open(_version_path(table, v)) as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    meta = action["metaData"]
                elif "add" in action:
                    a = action["add"]
                    if a.get("partitionValues"):
                        raise NotImplementedError(
                            "partitioned local Delta tables are not "
                            "supported by this reader")
                    if a.get("deletionVector"):
                        raise NotImplementedError(
                            "deletion vectors are not supported by this "
                            "reader")
                    live[a["path"]] = a
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
    pairs = sorted(
        ((k if os.path.isabs(k) else os.path.join(root, k)), k)
        for k in live)
    # files and keys stay ALIGNED (same sort) — upsert removes by the
    # exact key each file was added under
    return [f for f, _ in pairs], meta, [k for _, k in pairs]


def read_delta_local(spark, table: str, version: int | None = None):
    """DataFrame over the table's live files at ``version`` (time
    travel; None = latest). One native parquet scan — pushdown and
    column pruning behave exactly as on raw parquet."""
    files, _, _ = _replay(table, version)
    if not files:
        raise ValueError(
            f"Delta table {table} has no live files at version {version}")
    return spark.read.parquet(*files)


def _commit(table: str, version: int, actions: list) -> None:
    os.makedirs(_log_dir(table), exist_ok=True)
    path = _version_path(table, version)
    if os.path.exists(path):
        raise FileExistsError(
            f"commit conflict: version {version} already exists in {table}")
    tmp = path + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    os.rename(tmp, path)  # atomic single-writer commit


def _add_action(root: str, path: str) -> dict:
    inside = os.path.commonpath(
        [os.path.abspath(root), os.path.abspath(path)]) \
        == os.path.abspath(root)
    rel = os.path.relpath(path, root) if inside else path
    return {"add": {"path": rel, "partitionValues": {},
                    "size": os.path.getsize(path),
                    "modificationTime": int(time.time() * 1000),
                    "dataChange": True}}


def _meta_actions(schema_json: str | None) -> list:
    return [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": str(uuid.uuid4()), "format":
                      {"provider": "parquet", "options": {}},
                      "schemaString": schema_json or "{}",
                      "partitionColumns": [],
                      "configuration": {},
                      "createdTime": int(time.time() * 1000)}},
    ]


def create_local_delta_table(table: str, versions: list,
                             schema_json: str | None = None) -> None:
    """Lay a Delta log over EXISTING parquet files, referenced in
    place (absolute paths — permitted by the spec): ``versions`` is a
    list of file lists, one per version; each version's state is
    EXACTLY its list (removes are emitted for files that drop out).
    The iceberg_local oracle-gate pattern."""
    root = table.removeprefix("file://")
    os.makedirs(root, exist_ok=True)
    prev: list = []
    for v, files in enumerate(versions):
        actions = _meta_actions(schema_json) if v == 0 else []
        ts = int(time.time() * 1000)
        for p in prev:
            if p not in files:
                actions.append({"remove": {"path": p,
                                           "deletionTimestamp": ts,
                                           "dataChange": True}})
        for p in files:
            if p not in prev:
                actions.append(_add_action(root, os.path.abspath(p)))
        _commit(table, v, actions)
        prev = list(files)


def write_delta_local(df, table: str, mode: str = "append") -> int:
    """Commit a Spark DataFrame as a new Delta version. ``mode``:
    "append" adds the new files; "overwrite" also removes every
    previously live file. Data lands under ``<table>/part-*/`` via
    one native parquet write; the commit is a single atomic rename.
    Returns the committed version."""
    assert mode in ("append", "overwrite"), mode
    root = table.removeprefix("file://")
    data_dir = os.path.join(root, f"data-{uuid.uuid4().hex[:12]}")
    df.write.parquet(data_dir)
    new_files = sorted(
        os.path.join(data_dir, f) for f in os.listdir(data_dir)
        if f.endswith(".parquet"))
    try:
        versions = list_versions(table)
    except FileNotFoundError:
        versions = []
    version = (versions[-1] + 1) if versions else 0
    actions: list = []
    if version == 0:
        actions += _meta_actions(df.schema.json())
    ts = int(time.time() * 1000)
    if mode == "overwrite" and versions:
        # remove by the exact path KEY each add used (absolute for
        # referenced-in-place files, relative for table-local data)
        _, _, keys = _replay(table, None)
        for k in keys:
            actions.append({"remove": {"path": k,
                                       "deletionTimestamp": ts,
                                       "dataChange": True}})
    for p in new_files:
        actions.append(_add_action(root, p))
    _commit(table, version, actions)
    return version


def upsert_delta_local(spark, table: str, df, key_cols) -> int:
    """MERGE-style upsert without deletion vectors: Delta's row-level
    replace is copy-on-write, so the files that CONTAIN a matched key
    are rewritten without those rows, untouched files stay referenced
    as-is, and ``df`` is appended — all in ONE commit (readers see the
    swap atomically; time travel sees the pre-upsert state).

    Distributed end to end: the affected-file set comes from a
    semi-join of the live scan's ``_metadata.file_path`` against the
    incoming keys (only file PATHS reach the driver, KBs); the
    surviving-row rewrite is an anti-join executed by Spark's parquet
    writer. The rewrite cost is proportional to the affected files —
    the standard Delta copy-on-write trade; cluster the table by key
    (write_parquet(zorder=...)) to keep that set small at 100 TB."""
    import uuid
    from pyspark.sql import functions as F
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    root = table.removeprefix("file://")
    files, _, live_keys = _replay(table, None)
    live = spark.read.parquet(*files) \
        .withColumn("__qs_file__", F.col("_metadata.file_path"))
    new_keys = df.select(*keys).distinct()
    affected = [r["__qs_file__"]
                for r in (live.join(new_keys, keys, "left_semi")
                          .select("__qs_file__").distinct().collect())]

    def _plain(u: str) -> str:
        # _metadata.file_path is a URI ("file:/tmp/..." — scheme with
        # a SINGLE slash); compare as filesystem paths
        from urllib.parse import urlparse
        return urlparse(u).path if u.startswith("file:") else u

    affected_set = {_plain(a) for a in affected}
    version = list_versions(table)[-1] + 1
    ts = int(time.time() * 1000)
    actions: list = []
    tag = uuid.uuid4().hex[:12]
    if affected_set:
        survivors = (live.filter(F.col("__qs_file__").isin(list(affected)))
                     .drop("__qs_file__")
                     .join(new_keys, keys, "left_anti"))
        sdir = os.path.join(root, f"data-{tag}-rewrite")
        survivors.write.parquet(sdir)
        for f in sorted(os.listdir(sdir)):
            if f.endswith(".parquet"):
                actions.append(_add_action(root, os.path.join(sdir, f)))
        # remove by the exact key each file was added under
        for k, fpath in zip(live_keys, files):
            if _plain(fpath) in affected_set \
                    or os.path.abspath(fpath) in affected_set:
                actions.append({"remove": {"path": k,
                                           "deletionTimestamp": ts,
                                           "dataChange": True}})
    adir = os.path.join(root, f"data-{tag}-append")
    df.write.parquet(adir)
    for f in sorted(os.listdir(adir)):
        if f.endswith(".parquet"):
            actions.append(_add_action(root, os.path.join(adir, f)))
    _commit(table, version, actions)
    return version
