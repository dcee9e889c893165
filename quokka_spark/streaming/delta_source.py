"""Streaming SOURCE over a local Delta table — the reverse of
streaming/stream.streaming_write_delta's exactly-once sink, via the
Spark 4 Python DataSource streaming API (same machinery as
sources/lancelike.py's batch reader, no delta-spark jar).

Offsets are LOG VERSIONS: each micro-batch covers the dataChange add
actions of the commit versions in ``(start, end]`` — one input
partition per data file, read executor-side as Arrow batches (the
file's own deletion vector applied), so a growing table tails
incrementally with the driver touching only KB-scale JSON per trigger.

Delta's streaming-source contract is append-only: a version that
REMOVES data (or rewrites a live file's deletion vector) refuses by
default — silently skipping it would desynchronize the consumer.
``ignore_deletes=true`` / ``ignore_changes=true`` opt into skipping
delete-only / DV-rewrite versions (the rows already streamed stay
streamed; a DV re-add contributes no new rows, so unlike the jar's
``ignoreChanges`` re-transmission there are NO duplicates to
deduplicate downstream). dataChange=false versions (compaction,
clustering) are invisible, exactly why writers mark them false.

``starting_version=N`` begins the stream at version N (default 0 —
the full-history replay that makes a bounded availableNow drain equal
the batch read, which is what the oracle gate checks)."""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)


def _table_of(options: dict) -> str:
    path = options.get("path")
    if not path:
        raise ValueError("delta_local_stream needs .load(<table path>)")
    return path.removeprefix("file://")


class DeltaStreamReader(DataSourceStreamReader):
    def __init__(self, table: str, schema, options: dict):
        from quokka_spark.sources.delta_local import _cm_mode, _replay
        self.table = table
        self.fields = [f.name for f in schema.fields]
        self.ignore_deletes = str(
            options.get("ignore_deletes", "false")).lower() == "true"
        self.ignore_changes = str(
            options.get("ignore_changes", "false")).lower() == "true"
        self.start_version = int(options.get("starting_version", 0))
        _, meta, _, _ = _replay(table, None)
        if meta.get("partitionColumns"):
            raise NotImplementedError(
                "delta_local_stream on a PARTITIONED table — partition "
                "values live in the log and are not rejoined here")
        if _cm_mode(meta) != "none":
            raise NotImplementedError(
                "delta_local_stream on a columnMapping table")

    # ---- offsets: {"version": last PROCESSED version} -----------------
    def initialOffset(self) -> dict:
        return {"version": self.start_version - 1}

    def latestOffset(self) -> dict:
        from quokka_spark.sources.delta_local import list_versions
        return {"version": list_versions(self.table)[-1]}

    def partitions(self, start: dict, end: dict):
        from quokka_spark.sources.delta_local import (_replay, _scan_log,
                                                      _version_path)
        v0, v1 = int(start["version"]), int(end["version"])
        if v1 <= v0:
            return []
        commits = set(_scan_log(self.table)[0])
        missing = [v for v in range(v0 + 1, v1 + 1) if v not in commits]
        if missing:
            raise ValueError(
                f"versions {missing[:5]} have no JSON commit (cleaned "
                "up?) — the stream would lose changes")
        # live set BEFORE the batch, to tell new files from DV re-adds
        if v0 >= 0:
            _, _, live_keys, _ = _replay(self.table, v0)
            live = set(live_keys)
        else:
            live = set()
        root = self.table
        parts = []
        for v in range(v0 + 1, v1 + 1):
            adds, removes = {}, {}
            with open(_version_path(self.table, v)) as fh:
                for line in fh:
                    line = line.strip()
                    if not line:
                        continue
                    action = json.loads(line)
                    if "add" in action:
                        adds[action["add"]["path"]] = action["add"]
                    elif "remove" in action:
                        removes[action["remove"]["path"]] = \
                            action["remove"]
            data_removes = [k for k, r in removes.items()
                            if r.get("dataChange", True) and k not in adds]
            for k, a in adds.items():
                if not a.get("dataChange", True):
                    continue
                if k in live:
                    # DV rewrite of an already-streamed file: no new
                    # rows exist to emit
                    if not self.ignore_changes:
                        raise ValueError(
                            f"version {v} rewrites live file {k!r} "
                            "(deletion-vector update) — a streaming "
                            "source is append-only; pass "
                            "ignore_changes=true to skip such versions")
                    continue
                p = k if os.path.isabs(k) else os.path.join(root, k)
                parts.append(InputPartition(
                    (p, json.dumps(a.get("deletionVector"))
                     if a.get("deletionVector") else None)))
            if data_removes and not (self.ignore_deletes
                                     or self.ignore_changes):
                raise ValueError(
                    f"version {v} removes data files — a streaming "
                    "source is append-only; pass ignore_deletes=true "
                    "to skip delete versions")
            for k in removes:
                live.discard(k)
            for k, a in adds.items():
                live.add(k)
        return parts

    def read(self, partition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        path, dvj = partition.value
        t = pq.read_table(path, columns=self.fields).select(self.fields)
        if dvj:
            from quokka_spark.sources.dv import dv_row_indexes
            dead = set(dv_row_indexes(
                os.path.abspath(self.table), json.loads(dvj)))
            keep = [i for i in range(t.num_rows) if i not in dead]
            t = t.take(pa.array(keep, type=pa.int64()))
        yield from t.to_batches()

    def commit(self, end: dict) -> None:
        pass


class DeltaStreamDataSource(DataSource):
    """``spark.readStream.format("delta_local_stream").load(table)``
    after ``spark.dataSource.register(DeltaStreamDataSource)`` — or
    use the ``QuokkaContext.read_delta_stream`` facade."""

    @classmethod
    def name(cls):
        return "delta_local_stream"

    def schema(self):
        from pyspark.sql.types import StructType

        from quokka_spark.sources.delta_local import _replay
        _, meta, _, _ = _replay(_table_of(self.options), None)
        try:
            full = StructType.fromJson(json.loads(meta["schemaString"]))
        except (KeyError, ValueError, TypeError) as e:
            raise ValueError(
                "delta_local_stream needs a table with a parseable "
                "schemaString in its metaData") from e
        return full

    def streamReader(self, schema):
        return DeltaStreamReader(_table_of(self.options), schema,
                                 self.options)
