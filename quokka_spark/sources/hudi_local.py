"""Pure-Python Apache Hudi COPY-ON-WRITE table reader (metadata layer
only) — the third lakehouse format next to delta_local and
iceberg_local, same design: resolve the table's live base files from
the ``.hoodie/`` timeline driver-side (KB-scale JSON), then hand the
file list to Spark's native parquet scan with full predicate pushdown
and column pruning. No hudi-spark bundle jar needed.

Hudi model (public spec, hudi.apache.org/docs — timeline + file
layout): a table is a set of FILE GROUPS (stable ``fileId``), each a
sequence of FILE SLICES written by successive commits; Copy-on-Write
rewrites a group's base parquet on every update, so the live table is
exactly "the newest base file per surviving group as of an instant".
The timeline under ``.hoodie/`` records one ``<instant>.commit`` JSON
per completed write whose ``partitionToWriteStats`` lists the
(partition, fileId, path) of every base file written;
``<instant>.replacecommit`` additionally lists
``partitionToReplaceFileIds`` — groups whose previous slices are
dead (clustering / insert_overwrite). Reading therefore never lists
data directories: the timeline IS the source of truth, exactly like
the Delta log replay in delta_local.

Scope (documented, test-enforced):
- COPY_ON_WRITE tables; MERGE_ON_READ (log files that must be merged
  into the base) raises NotImplementedError — silently scanning base
  files would serve stale rows.
- completed instants only (``*.commit`` / ``*.replacecommit``);
  inflight/requested markers are ignored per the timeline contract.
- time travel: ``as_of`` keeps only instants ≤ the given timestamp.
- the ``_hoodie_*`` meta columns travel with the data files untouched
  (drop them with a select, as on a real Hudi scan).
"""

from __future__ import annotations

import json
import os
import re
import time
import uuid


def _local(path: str) -> str:
    if path.startswith("file://"):
        return path[len("file://"):]
    return path


def _timeline_dir(table: str) -> str:
    return os.path.join(_local(table), ".hoodie")


def _table_type(table: str) -> str:
    props = os.path.join(_timeline_dir(table), "hoodie.properties")
    if not os.path.exists(props):
        raise FileNotFoundError(
            f"{table}: no .hoodie/hoodie.properties — not a Hudi table")
    out = {}
    with open(props) as fh:
        for line in fh:
            line = line.strip()
            if line and not line.startswith("#") and "=" in line:
                k, v = line.split("=", 1)
                out[k.strip()] = v.strip()
    return out.get("hoodie.table.type", "COPY_ON_WRITE")


def completed_instants(table: str) -> list:
    """[(instant_ts, action, path)] of COMPLETED timeline instants in
    NUMERIC instant order (real instants are fixed-width
    yyyyMMddHHmmssSSS where lexicographic == numeric, but the API
    accepts any digit string — '10' must replay after '2'). Write
    actions only — clean/rollback/savepoint don't change the live
    file set this reader computes (cleans delete files only older
    than every live slice)."""
    tdir = _timeline_dir(table)
    if not os.path.isdir(tdir):
        raise FileNotFoundError(
            f"{table}: no .hoodie/ directory — not a Hudi table")
    out = []
    for f in os.listdir(tdir):
        m = re.fullmatch(r"(\d+)\.(commit|replacecommit|deltacommit)", f)
        if m:
            out.append((m.group(1), m.group(2), os.path.join(tdir, f)))
    return sorted(out, key=lambda t: int(t[0]))


def hudi_live_files(table: str, as_of: str | None = None) -> list[str]:
    """Live base-file paths of a CoW table at ``as_of`` (an instant
    timestamp string; None = latest): replay the completed write
    instants in timeline order, keeping the NEWEST base file per
    (partition, fileId) group and dropping groups a replacecommit
    replaced."""
    if _table_type(table) != "COPY_ON_WRITE":
        raise NotImplementedError(
            "MERGE_ON_READ tables need log-file merging (the hudi "
            "runtime bundle's job) — scanning base files alone would "
            "serve stale rows")
    root = _local(table)
    latest: dict = {}          # (partition, fileId) -> path
    seen_any = False
    for ts, action, path in completed_instants(table):
        if as_of is not None and int(ts) > int(as_of):
            continue
        if action == "deltacommit":
            raise NotImplementedError(
                "deltacommit in the timeline: MERGE_ON_READ write — "
                "this reader is CoW-only")
        seen_any = True
        with open(path) as fh:
            commit = json.load(fh)
        if action == "replacecommit":
            for part, fids in (commit.get("partitionToReplaceFileIds")
                               or {}).items():
                for fid in fids:
                    latest.pop((part, fid), None)
        for part, stats in (commit.get("partitionToWriteStats")
                            or {}).items():
            for st in stats:
                p = st["path"]
                latest[(part, st["fileId"])] = (
                    p if os.path.isabs(p) else os.path.join(root, p))
    if not seen_any:
        raise ValueError(
            f"{table}: no completed commit at or before {as_of!r}"
            if as_of is not None else
            f"{table}: timeline has no completed commits (empty table)")
    return sorted(latest.values())


def read_hudi_local(spark, table: str, as_of: str | None = None):
    """DataFrame over the CoW table's live base files at ``as_of``
    (None = latest). One native parquet scan — pushdown and column
    pruning behave exactly as on raw parquet; at 100 TB the timeline
    replay stays a KB-scale driver step while the scan is fully
    distributed."""
    files = hudi_live_files(table, as_of)
    if not files:
        raise ValueError(f"Hudi table {table} has no live files "
                         f"(everything replaced) at {as_of!r}")
    return spark.read.parquet(*files)


# ----------------------------------------------------------------------
# writer — spec-shaped fixtures + a working local CoW write path
# ----------------------------------------------------------------------

def _write_properties(table: str) -> None:
    tdir = _timeline_dir(table)
    os.makedirs(tdir, exist_ok=True)
    props = os.path.join(tdir, "hoodie.properties")
    if not os.path.exists(props):
        with open(props, "w") as fh:
            fh.write("hoodie.table.type=COPY_ON_WRITE\n"
                     "hoodie.table.name=%s\n"
                     % os.path.basename(_local(table).rstrip("/")))


def _next_instant(table: str) -> str:
    """A strictly increasing (NUMERICALLY — the ordering replay uses)
    instant timestamp (Hudi uses yyyyMMddHHmmssSSS)."""
    prev = [int(ts) for ts, _, _ in completed_instants(table)] \
        if os.path.isdir(_timeline_dir(table)) else []
    now = int(time.strftime("%Y%m%d%H%M%S") + "000")
    top = max(prev) if prev else 0
    return str(now if now > top else top + 1)


def commit_hudi_local(table: str, writes: dict, replaces: dict | None = None,
                      instant: str | None = None) -> str:
    """Commit base files to a local CoW table: ``writes`` maps
    partition → [(fileId, path)] (new or updated slices; an existing
    fileId means the group's previous base file is superseded),
    ``replaces`` maps partition → [fileId] whose groups die without a
    successor (insert_overwrite / clustering → ``replacecommit``).
    Files are referenced in place (paths stored ABSOLUTE, so reads
    don't depend on the caller's cwd). Returns the instant
    timestamp."""
    _write_properties(table)
    if _table_type(table) != "COPY_ON_WRITE":
        raise NotImplementedError(
            "writing to a MERGE_ON_READ table — this writer commits "
            "CoW base files only")
    ts = instant or _next_instant(table)
    action = "replacecommit" if replaces else "commit"
    doc = {"partitionToWriteStats": {
        part: [{"fileId": fid, "path": os.path.abspath(_local(p)),
                "numWrites": None, "prevCommit": None}
               for fid, p in items]
        for part, items in (writes or {}).items()}}
    if replaces:
        doc["partitionToReplaceFileIds"] = {
            part: list(fids) for part, fids in replaces.items()}
    tdir = _timeline_dir(table)
    tmp = os.path.join(tdir, f".{ts}.{action}.tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    os.rename(tmp, os.path.join(tdir, f"{ts}.{action}"))
    return ts


def compact_hudi_local(spark, table: str,
                       target_file_rows: int = 5_000_000) -> str:
    """Clustering-style compaction: the live rows rewrite into
    ``ceil(rows / target_file_rows)`` right-sized base files committed
    as ONE replacecommit that retires every previous file group — the
    same small-file fix as compact_delta/compact_iceberg, in Hudi's
    native commit shape. Time travel still sees the old layout.
    Returns the instant timestamp."""
    import math
    df = read_hudi_local(spark, table)
    n = df.count()
    parts = max(1, math.ceil(n / target_file_rows))
    return write_hudi_local(df.repartition(parts), table,
                            mode="overwrite")


def clean_hudi_local(table: str, keep_last: int = 1) -> int:
    """Hudi clean: delete table-local base files referenced ONLY by
    instants older than the last ``keep_last`` — the disk-reclaim
    half of compaction. Files outside the table root (referenced-in-
    place fixtures) are never touched; the timeline is kept, so
    time-travel reads of cleaned instants fail at scan time (the real
    cleaner's retention trade). Returns the number of files
    deleted."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    root = os.path.abspath(_local(table))
    instants = [ts for ts, _, _ in completed_instants(table)]
    if not instants:
        return 0
    referenced: set = set()
    for ts in instants[-keep_last:]:
        referenced |= {os.path.abspath(p)
                       for p in hudi_live_files(table, as_of=ts)}
    deleted = 0
    for dp, _, fs in os.walk(root):
        if ".hoodie" in dp:
            continue
        for f in fs:
            if not f.endswith(".parquet"):
                continue
            p = os.path.abspath(os.path.join(dp, f))
            if p not in referenced:
                os.unlink(p)
                deleted += 1
    return deleted


def write_hudi_local(df, table: str, mode: str = "append") -> str:
    """Commit a Spark DataFrame as a new CoW instant: "append" adds
    the rows as new file groups; "overwrite" replaces every live
    group (a replacecommit, the insert_overwrite shape). One native
    distributed parquet write + a KB-scale driver commit. Returns the
    instant timestamp."""
    assert mode in ("append", "overwrite"), mode
    root = _local(table)
    _write_properties(table)
    if _table_type(table) != "COPY_ON_WRITE":
        raise NotImplementedError(
            "writing to a MERGE_ON_READ table — this writer commits "
            "CoW base files only")
    ts = _next_instant(table)
    data_dir = os.path.join(root, f"data-{ts}")
    df.write.parquet(data_dir)
    items = []
    for f in sorted(os.listdir(data_dir)):
        if f.endswith(".parquet"):
            fid = uuid.uuid4().hex[:12]
            # spec-shaped base-file name: <fileId>_<token>_<instant>
            named = os.path.join(data_dir, f"{fid}_0-0-0_{ts}.parquet")
            os.rename(os.path.join(data_dir, f), named)
            items.append((fid, named))
    replaces = None
    if mode == "overwrite":
        live: dict = {}
        try:
            for ts0, action, path in completed_instants(table):
                if action == "deltacommit":
                    raise NotImplementedError(
                        "deltacommit in the timeline: MERGE_ON_READ "
                        "write — this writer is CoW-only")
                if int(ts0) >= int(ts):
                    continue
                with open(path) as fh:
                    c = json.load(fh)
                for part, fids in (c.get("partitionToReplaceFileIds")
                                   or {}).items():
                    for fid in fids:
                        live.pop((part, fid), None)
                for part, stats in (c.get("partitionToWriteStats")
                                    or {}).items():
                    for st in stats:
                        live[(part, st["fileId"])] = True
        except FileNotFoundError:
            pass
        replaces = {}
        for part, fid in live:
            replaces.setdefault(part, []).append(fid)
        replaces = replaces or None
    return commit_hudi_local(table, {"": items}, replaces=replaces,
                             instant=ts)
