"""HoodieLogFormat (version 1) block framing — read real hudi-writer
MoR log files, not just this engine's own Avro-container logs.

Format, per the PUBLIC Apache Hudi tech spec ("Log File Format",
https://hudi.apache.org/tech-specs/ — format documentation only, no
code derived from any implementation). Each log file is a sequence of
log blocks:

    magic              6 bytes   ``#HUDI#``
    block size         int64 BE  bytes from the version field through
                                 the trailing reverse-length field
    format version     int32 BE  1
    block type         int32 BE  ordinal (see _BLOCK_TYPES)
    header             metadata map (see below)
    content length     int64 BE
    content            bytes
    footer             metadata map
    reverse length     int64 BE  total block size incl. magic — lets
                                 readers traverse backwards

The metadata map: ``int32 count``, then per entry ``int32 key
ordinal`` + ``int32 byte length`` + UTF-8 bytes. Key ordinals follow
the spec's HeaderMetadataType order (_HEADER_KEYS).

An AVRO_DATA_BLOCK's content: ``int32 content-format version`` (2 and
3 share this layout), ``int32 record count``, then per record
``int32 length`` + the record's Avro BINARY encoding under the
block header's SCHEMA. COMMAND blocks of type ROLLBACK_PREVIOUS_BLOCK
invalidate earlier blocks of the command's target instant, which this
reader honours — within one file via :func:`read_log_records_bytes`,
and across the rolled-over files of a FILE SLICE via
:func:`read_slice_log_records` (writers roll to ``.log.N+1`` on size,
so crash-recovery rollbacks routinely land one file over; at slice
scope a rollback whose target instant has no block anywhere is a
genuine no-op — the block was never written). DELETE blocks decode
their tombstones (content: ``int32 version`` ≥3, ``int32 length``,
then the Avro BINARY encoding of ``HoodieDeleteRecordList`` — an
array of ``{recordKey, partitionPath, orderingVal}`` records, the
public wire shape real hudi writers emit for hard deletes) into
``_hoodie_is_deleted`` rows that ride the same record-key merge as
soft-delete payloads. PARQUET data blocks (a real hudi writer option,
``hoodie.logfile.data.block.format=parquet``) decode too: the block
content is a complete parquet file, read via Arrow into the SAME
avro-raw record shape as avro_data blocks (logical date/timestamp
values as day/micros ints), so both kinds share one downstream
pipeline. CDC blocks (``hoodie.table.cdc.enabled`` writers emit one
next to each data block) are SKIPPED in snapshot reads — they are
supplemental change info, and decoding them as data would
double-count. Delete-block versions 1/2 (Kryo-serialized Java
objects), HFile data blocks, and unknown versions refuse with typed
errors — never a silent misread.

The reader is deliberately paranoid: it advances by PARSING, checks
the declared block size against the parsed one, and refuses on any
mismatch instead of resynchronising (a correctness engine must not
guess across corrupt bytes; Hudi's own reader marks such ranges
CORRUPT_BLOCK and skips them, which silently drops data).

``write_log_file`` produces the same framing (fixtures + a writer for
interop tests); symmetric codecs keep the byte-level assumptions
honest in both directions.
"""

from __future__ import annotations

import io
import json
import struct

from .avro_lite import _Reader, _decode

MAGIC = b"#HUDI#"

_BLOCK_TYPES = ["command", "delete", "corrupt", "avro_data",
                "hfile_data", "parquet_data", "cdc_data"]
_HEADER_KEYS = ["INSTANT_TIME", "TARGET_INSTANT_TIME", "SCHEMA",
                "COMMAND_BLOCK_TYPE", "COMPACTED_BLOCK_TIMES",
                "RECORD_POSITIONS", "BLOCK_IDENTIFIER"]


def is_hudi_log_bytes(data: bytes) -> bool:
    return data[:6] == MAGIC


class _BytesIn:
    def __init__(self, data: bytes, name: str):
        self.d, self.pos, self.name = data, 0, name

    def take(self, n: int) -> bytes:
        b = self.d[self.pos:self.pos + n]
        if len(b) < n:
            raise ValueError(
                f"{self.name}: truncated HoodieLogFormat block at "
                f"offset {self.pos} (wanted {n} bytes)")
        self.pos += n
        return b

    def i32(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def i64(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def at_end(self) -> bool:
        return self.pos >= len(self.d)


def _read_meta_map(r: _BytesIn) -> dict:
    n = r.i32()
    if n < 0 or n > len(_HEADER_KEYS) + 16:
        raise ValueError(
            f"{r.name}: implausible metadata entry count {n} — "
            "corrupt framing")
    out = {}
    for _ in range(n):
        ordv = r.i32()
        val = r.take(r.i32()).decode("utf-8")
        key = (_HEADER_KEYS[ordv] if 0 <= ordv < len(_HEADER_KEYS)
               else f"UNKNOWN_{ordv}")
        out[key] = val
    return out


def _iter_frames(data: bytes, name: str):
    """Walk the raw framing → yields {type, header, footer, content}
    per block, validating sizes; no rollback semantics applied."""
    r = _BytesIn(data, name)
    while not r.at_end():
        if r.take(6) != MAGIC:
            raise ValueError(
                f"{name}: bad magic at offset {r.pos - 6} — corrupt "
                "HoodieLogFormat framing (refusing to resync)")
        declared = r.i64()
        body_start = r.pos
        version = r.i32()
        if version != 1:
            raise NotImplementedError(
                f"{name}: HoodieLogFormat block version {version} — "
                "only version 1 is supported")
        tord = r.i32()
        btype = (_BLOCK_TYPES[tord] if 0 <= tord < len(_BLOCK_TYPES)
                 else f"unknown_{tord}")
        header = _read_meta_map(r)
        content = r.take(r.i64())
        footer = _read_meta_map(r)
        r.i64()                              # reverse/total length
        if r.pos - body_start != declared:
            raise ValueError(
                f"{name}: block at offset {body_start - 14} declares "
                f"{declared} bytes but parses to "
                f"{r.pos - body_start} — corrupt framing")
        yield {"type": btype, "header": header, "footer": footer,
               "content": content}


def _rollback_target(frame: dict, name: str) -> str:
    """Validate a command frame and return its rollback target."""
    header = frame["header"]
    ctype = header.get("COMMAND_BLOCK_TYPE", "")
    if ctype not in ("0", "ROLLBACK_PREVIOUS_BLOCK", "ROLLBACK_BLOCK"):
        raise NotImplementedError(
            f"{name}: command block type {ctype!r}")
    target = header.get("TARGET_INSTANT_TIME")
    if not target:
        raise ValueError(
            f"{name}: rollback command block carries no "
            "TARGET_INSTANT_TIME — guessing which block to "
            "invalidate would risk serving rolled-back rows")
    return target


def _check_block_supported(btype: str, name: str) -> None:
    if btype in ("hfile_data",
                 "corrupt") or btype.startswith("unknown_"):
        raise NotImplementedError(
            f"{name}: HoodieLogFormat {btype} block — only avro_data, "
            "parquet_data, delete, and rollback command blocks are "
            "supported")


def read_log_blocks(data: bytes, name: str = "<bytes>") -> list[dict]:
    """Parse the framing → [{type, header, footer, content}], with
    ROLLBACK_PREVIOUS_BLOCK commands already applied (rolled-back
    blocks removed). Single-FILE scope: a rollback whose target has
    no block in this file refuses — at file scope the reader cannot
    tell "never written" from "written one rolled-over file earlier",
    and guessing no-op could serve rolled-back rows; callers with the
    slice's full file list use :func:`read_slice_log_records`, which
    resolves exactly that case."""
    blocks: list[dict] = []
    for frame in _iter_frames(data, name):
        btype = frame["type"]
        if btype == "command":
            target = _rollback_target(frame, name)
            survivors = [b for b in blocks
                         if b["header"].get("INSTANT_TIME") != target]
            if len(survivors) == len(blocks):
                raise NotImplementedError(
                    f"{name}: rollback command targets instant "
                    f"{target!r} which has no block in THIS log file "
                    "— pass every log file of the slice to "
                    "read_slice_log_records for cross-file rollback")
            blocks = survivors
            continue
        if btype == "cdc_data":
            # supplemental change info (hoodie.table.cdc.enabled
            # writers emit one next to each data block): a SNAPSHOT
            # read must ignore it — the data blocks carry the actual
            # rows; decoding it as data would double-count
            continue
        _check_block_supported(btype, name)
        blocks.append(frame)
    return blocks


def _decode_avro_block(block: dict, name: str) -> tuple[dict, list]:
    """One avro_data block → (schema dict, records)."""
    sj = block["header"].get("SCHEMA")
    if not sj:
        raise ValueError(
            f"{name}: avro_data block carries no SCHEMA header — "
            "records are undecodable")
    schema = json.loads(sj)
    r = _BytesIn(block["content"], name)
    cver = r.i32()
    if cver not in (2, 3):
        raise NotImplementedError(
            f"{name}: avro_data content-format version {cver}")
    count = r.i32()
    records = []
    for _ in range(count):
        rec = r.take(r.i32())
        records.append(_decode(_Reader(rec), schema))
    return schema, records


def _arrow_to_avro_schema(aschema, name: str) -> dict:
    """Arrow schema → the Avro record-schema dict the shared decode
    pipeline types under — the fallback when a parquet_data block
    carries no SCHEMA header (real hudi writers stamp one; this
    keeps schema-less interop files readable). Scalar types only —
    anything else refuses rather than guessing a mapping."""
    import pyarrow as pa
    fields = []
    for f in aschema:
        t = f.type
        if pa.types.is_boolean(t):
            at = "boolean"
        elif pa.types.is_signed_integer(t) and t.bit_width <= 32:
            at = "int"
        elif pa.types.is_signed_integer(t):
            at = "long"
        elif pa.types.is_unsigned_integer(t) and t.bit_width <= 32:
            # uint8/16/32 fit int64 exactly — widen, never truncate
            at = "long"
        elif pa.types.is_unsigned_integer(t):
            # Avro has no unsigned 64-bit type: values above 2^63-1
            # would wrap negative in "long" — refuse like every
            # other unmappable type (advisor finding, round 11)
            raise NotImplementedError(
                f"{name}: parquet_data column {f.name!r} is "
                f"unsigned 64-bit ({t}) — Avro long cannot hold "
                "values above 2^63-1; cast the column to a signed "
                "or decimal type upstream")
        elif pa.types.is_float32(t):
            at = "float"
        elif pa.types.is_floating(t):
            at = "double"
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            at = "string"
        elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
            at = "bytes"
        elif pa.types.is_date(t):
            at = {"type": "int", "logicalType": "date"}
        elif pa.types.is_timestamp(t):
            at = {"type": "long", "logicalType": "timestamp-micros"}
        else:
            raise NotImplementedError(
                f"{name}: parquet_data column {f.name!r} has arrow "
                f"type {t} — no Avro mapping in this reader")
        fields.append({"name": f.name, "type": ["null", at],
                       "default": None})
    return {"type": "record", "name": "row", "fields": fields}


def records_to_arrow(schema: dict, records: list):
    """Avro-RAW records (the decode pipeline's shape — logical
    date/timestamp values as day/micros ints) → a pyarrow Table laid
    out for :func:`parquet_data_block`: the inverse of
    :func:`_arrow_to_avro_schema`, shared by fixtures and interop
    tests so the avro↔arrow type mapping lives in one place. Loud on
    anything outside the scalar set — a silent coercion here would
    poison the byte-level roundtrip the tests pin."""
    import pyarrow as pa
    amap = {"boolean": pa.bool_(), "int": pa.int32(),
            "long": pa.int64(), "float": pa.float32(),
            "double": pa.float64(), "string": pa.string(),
            "bytes": pa.binary()}
    arrays = {}
    for fld in schema["fields"]:
        ft = fld["type"]
        if isinstance(ft, list):
            nn = [x for x in ft if x != "null"]
            if len(nn) != 1:
                raise NotImplementedError(
                    f"column {fld['name']!r}: multi-branch union {ft}")
            ft = nn[0]
        vals = [r.get(fld["name"]) for r in records]
        if isinstance(ft, dict):
            lt, base = ft.get("logicalType"), ft.get("type")
            if lt == "date" and base == "int":
                arr = pa.array(vals, pa.int32()).cast(pa.date32())
            elif lt == "timestamp-micros" and base == "long":
                arr = pa.array(vals, pa.int64()) \
                    .cast(pa.timestamp("us"))
            else:
                raise NotImplementedError(
                    f"column {fld['name']!r}: avro type {ft} has no "
                    "arrow mapping in this writer")
        elif ft in amap:
            arr = pa.array(vals, amap[ft])
        else:
            raise NotImplementedError(
                f"column {fld['name']!r}: avro type {ft} has no "
                "arrow mapping in this writer")
        arrays[fld["name"]] = arr
    return pa.table(arrays)


def _decode_parquet_block(block: dict, name: str) -> tuple[dict, list]:
    """One parquet_data block → (avro schema dict, avro-RAW records).
    The content is a COMPLETE parquet file (real hudi's parquet log
    blocks serialize records through a parquet writer straight into
    the block content — no version/count prefix, unlike avro_data).
    Records come back in the same RAW shape as avro_data records
    (logical date/timestamp values as day/micros ints), so both
    block kinds flow through one downstream typing pipeline
    (avro_source._logical_converters applies the presentation pass).
    The block header's SCHEMA (the writer's avro schema) is
    authoritative when present; otherwise the arrow schema maps."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    content = block["content"]
    if content[:4] != b"PAR1" or content[-4:] != b"PAR1":
        raise ValueError(
            f"{name}: parquet_data block content lacks the parquet "
            "magic — corrupt framing or an unsupported layout")
    tbl = pq.read_table(pa.BufferReader(content))
    sj = block["header"].get("SCHEMA")
    schema = (json.loads(sj) if sj
              else _arrow_to_avro_schema(tbl.schema, name))
    cols = {}
    for i, f in enumerate(tbl.schema):
        col, t = tbl.column(i), f.type
        if pa.types.is_timestamp(t):
            col = col.cast(pa.timestamp("us", tz=t.tz)) \
                .cast(pa.int64())                 # raw epoch micros
        elif pa.types.is_date(t):
            col = col.cast(pa.date32()).cast(pa.int32())  # raw days
        elif not (pa.types.is_boolean(t) or pa.types.is_integer(t)
                  or pa.types.is_floating(t) or pa.types.is_string(t)
                  or pa.types.is_large_string(t)
                  or pa.types.is_binary(t) or pa.types.is_large_binary(t)
                  or pa.types.is_null(t)):
            raise NotImplementedError(
                f"{name}: parquet_data block column {f.name!r} has "
                f"type {t} — outside this reader's scalar set")
        cols[f.name] = col.to_pylist()
    return schema, [{k: v[i] for k, v in cols.items()}
                    for i in range(tbl.num_rows)]


def _frame_schema(frame: dict) -> dict | None:
    """A data frame's payload schema for the rolled-back-to-zero
    sniff: the SCHEMA header (both data block kinds carry one from
    real writers), else a parquet block's content schema."""
    sj = frame["header"].get("SCHEMA")
    if frame["type"] in ("avro_data", "parquet_data") and sj:
        return json.loads(sj)
    if frame["type"] == "parquet_data":
        import pyarrow as pa
        import pyarrow.parquet as pq
        content = frame["content"]
        if content[:4] != b"PAR1" or content[-4:] != b"PAR1":
            raise ValueError(
                "<frame>: parquet_data block content lacks the "
                "parquet magic — corrupt framing or an unsupported "
                "layout")
        return _arrow_to_avro_schema(
            pq.read_schema(pa.BufferReader(content)), "<frame>")
    return None


# The public wire shape of a DELETE block's tombstone payload (the
# Hudi project's HoodieDeleteRecordList Avro model — interface spec,
# required byte-for-byte for interop with real hudi writers).
_DELETE_RECORD_SCHEMA = {
    "type": "record", "name": "HoodieDeleteRecord",
    "namespace": "org.apache.hudi.avro.model",
    "fields": [
        {"name": "recordKey", "type": ["null", "string"],
         "default": None},
        {"name": "partitionPath", "type": ["null", "string"],
         "default": None},
        {"name": "orderingVal",
         "type": ["null", "string", "int", "long", "float", "double",
                  "bytes"], "default": None}]}
_DELETE_LIST_SCHEMA = {
    "type": "record", "name": "HoodieDeleteRecordList",
    "namespace": "org.apache.hudi.avro.model",
    "fields": [{"name": "deleteRecordList",
                "type": {"type": "array",
                         "items": _DELETE_RECORD_SCHEMA}}]}


def _parse_record_key(rk: str, key_fields: list, name: str) -> dict:
    """A Hudi record key string → {key field: string value}. Simple
    keys are the raw value; composite keys (and simple keys written
    by the complex generator) use the ``f1:v1,f2:v2`` convention."""
    if rk is None:
        raise ValueError(
            f"{name}: delete block carries a null recordKey — cannot "
            "tell which row to tombstone")
    if len(key_fields) == 1 and not rk.startswith(key_fields[0] + ":"):
        return {key_fields[0]: rk}
    out = {}
    for part in rk.split(","):
        k, sep, v = part.partition(":")
        if not sep or k not in key_fields:
            raise ValueError(
                f"{name}: delete-block recordKey {rk!r} does not "
                f"parse as the table's key fields {key_fields} "
                "(expected the f1:v1,f2:v2 convention)")
        out[k] = v
    if set(out) != set(key_fields):
        raise ValueError(
            f"{name}: delete-block recordKey {rk!r} covers "
            f"{sorted(out)} but the table keys on {key_fields}")
    return out


def _decode_delete_block(block: dict, key_fields: list | None,
                         name: str) -> list:
    """One delete block → tombstone records ``{**key fields,
    _hoodie_commit_time, _hoodie_is_deleted: True}`` that merge
    exactly like soft-delete payload rows. ``orderingVal`` is
    intentionally unused: this engine's whole MoR merge orders by
    commit time (base = 0, log records = their instant), so a
    tombstone at instant T beats every write before T and loses to
    every write after — the same convention as the payload path."""
    if key_fields is None:
        raise NotImplementedError(
            f"{name}: delete block present but no key_fields were "
            "supplied — the tombstone recordKey strings cannot be "
            "mapped back to columns (pass the table's "
            "hoodie.table.recordkey.fields)")
    r = _BytesIn(block["content"], name)
    version = r.i32()
    if version < 3:
        raise NotImplementedError(
            f"{name}: delete block content version {version} is "
            "Kryo-serialized Java objects — only the Avro "
            "HoodieDeleteRecordList layout (version 3+) is supported")
    payload = r.take(r.i32())
    rec = _decode(_Reader(payload), _DELETE_LIST_SCHEMA)
    instant = block["header"].get("INSTANT_TIME")
    if not instant:
        raise ValueError(
            f"{name}: delete block carries no INSTANT_TIME header — "
            "tombstones without a commit time cannot be ordered in "
            "the record-key merge")
    out = []
    for dr in rec["deleteRecordList"]:
        row = _parse_record_key(dr.get("recordKey"), key_fields, name)
        row["_hoodie_commit_time"] = instant
        row["_hoodie_is_deleted"] = True
        out.append(row)
    return out


def _coerce_key_types(records: list, schema: dict | None,
                      key_fields: list | None) -> list:
    """Tombstone key values arrive as STRINGS (parsed from the
    recordKey); coerce them to the slice schema's field types so they
    build into the same typed columns as payload rows."""
    if not records or schema is None or not key_fields:
        return records
    casts = {}
    # _hoodie_commit_time coerces too: tombstones stamp the instant
    # as a digit string, but an engine-written payload schema may
    # type the field long
    want = set(key_fields) | {"_hoodie_commit_time"}
    for f in schema.get("fields", []):
        if f["name"] not in want:
            continue
        t = f["type"]
        if isinstance(t, list):
            nn = [x for x in t if x != "null"]
            t = nn[0] if len(nn) == 1 else None
        if isinstance(t, str):
            if t in ("int", "long"):
                casts[f["name"]] = int
            elif t in ("float", "double"):
                casts[f["name"]] = float
    if not casts:
        return records
    for rec in records:
        if rec.get("_hoodie_is_deleted") is True:
            for k, fn in casts.items():
                v = rec.get(k)
                if isinstance(v, str):
                    rec[k] = fn(v)
    return records


def _blocks_to_records(blocks: list, name: str,
                       key_fields: list | None,
                       schema_hint: dict | None = None
                       ) -> tuple[dict | None, list]:
    """Surviving blocks → (first data block's schema | None,
    records). Delete blocks yield tombstone records; the schema may
    evolve across data blocks (later records simply carry their own
    fields — the caller's projection null-fills). ``schema_hint``
    types tombstone keys when the slice itself has NO data block (a
    pure hard-delete slice) — without it, string keys reaching a
    numeric column would crash the typed decode."""
    schema, records = None, []
    for b in blocks:
        if b["type"] == "delete":
            records.extend(_decode_delete_block(b, key_fields, name))
            continue
        s, recs = (_decode_parquet_block(b, name)
                   if b["type"] == "parquet_data"
                   else _decode_avro_block(b, name))
        schema = schema or s
        records.extend(recs)
    return schema, _coerce_key_types(records, schema or schema_hint,
                                     key_fields)


def read_log_records_bytes(data: bytes, name: str = "<bytes>",
                           key_fields: list | None = None,
                           schema_hint: dict | None = None) \
        -> tuple[dict | None, list]:
    """A whole framed log file → (first data block's schema, records
    of every surviving block — avro_data payloads plus delete-block
    tombstones). Single-file rollback scope (see read_log_blocks)."""
    blocks = read_log_blocks(data, name)
    schema, records = _blocks_to_records(blocks, name, key_fields,
                                         schema_hint)
    if schema is None and not records:
        # every data block was rolled back (a crash-recovery shape):
        # the file legitimately contributes ZERO rows — sniff the
        # schema from the raw frames so the empty result stays typed
        for frame in _iter_frames(data, name):
            s = _frame_schema(frame)
            if s is not None:
                return s, []
        raise ValueError(f"{name}: log file contains no data blocks")
    return schema, records


def read_slice_log_records(datas: list, key_fields: list | None = None,
                           schema_hint: dict | None = None) \
        -> tuple[dict | None, list]:
    """All log files of ONE file slice, in timeline order, as
    ``[(bytes, name), ...]`` → (schema | None, surviving records).
    Rollback commands apply SEQUENTIALLY across the whole slice: a
    command invalidates every earlier block of its target instant in
    any of the slice's files (writers roll to .log.N+1 on size, so a
    crash-recovery rollback routinely lands one file after the block
    it voids). A target with no block anywhere in the slice is a
    genuine no-op — at slice scope the view is complete, so the
    block was simply never written (crash before the block flush).
    A block of the SAME instant written AFTER the rollback (a retry)
    survives, matching sequential reader semantics."""
    blocks: list = []
    names: list = []
    for data, name in datas:
        for frame in _iter_frames(data, name):
            btype = frame["type"]
            if btype == "command":
                target = _rollback_target(frame, name)
                blocks = [b for b in blocks
                          if b["header"].get("INSTANT_TIME") != target]
                continue
            if btype == "cdc_data":
                continue          # supplemental — see read_log_blocks
            _check_block_supported(btype, name)
            blocks.append(frame)
        names.append(name)
    label = names[0] if len(names) == 1 else f"slice[{names[0]}…]"
    schema, records = _blocks_to_records(blocks, label, key_fields,
                                         schema_hint)
    if schema is None and not records:
        for data, name in datas:
            for frame in _iter_frames(data, name):
                s = _frame_schema(frame)
                if s is not None:
                    return s, []
        raise ValueError(f"{label}: log slice contains no data blocks")
    return schema, records


def read_log_schema(path: str, chunk: int = 1 << 20) -> dict:
    """Driver-side schema sniff: walk block headers until the first
    avro_data block's SCHEMA (bounded read — headers precede content,
    and non-data blocks' contents are skipped by the declared size,
    so this never decodes a large data payload). Command and delete
    blocks may legitimately lead a file (crash recovery / a
    delete-first deltacommit)."""
    with open(path, "rb") as f:
        data = f.read(chunk)
        while True:
            try:
                r = _BytesIn(data, path)
                while True:
                    if r.at_end():
                        # end of BUFFER, not necessarily of file —
                        # raise the grow-and-retry sentinel; the
                        # handler below re-raises as the typed
                        # no-data error only once the file is
                        # exhausted (a chunk boundary landing exactly
                        # between blocks must not masquerade as EOF)
                        raise ValueError(
                            f"{path}: truncated scan — buffer ended "
                            "without an avro_data block")
                    if r.take(6) != MAGIC:
                        raise ValueError(f"{path}: not a HoodieLogFormat "
                                         "file")
                    declared = r.i64()
                    body_start = r.pos
                    if r.i32() != 1:
                        raise NotImplementedError(
                            f"{path}: unsupported HoodieLogFormat version")
                    tord = r.i32()
                    header = _read_meta_map(r)
                    if _BLOCK_TYPES[tord:tord + 1] == ["avro_data"]:
                        sj = header.get("SCHEMA")
                        if not sj:
                            raise ValueError(
                                f"{path}: first avro_data block carries "
                                "no SCHEMA header")
                        return json.loads(sj)
                    if _BLOCK_TYPES[tord:tord + 1] == ["parquet_data"] \
                            and header.get("SCHEMA"):
                        # parquet data blocks stamp the writer's avro
                        # schema too; a schema-less one is skipped
                        # (its content schema is recoverable, but the
                        # sniff deliberately never reads content)
                        return json.loads(header["SCHEMA"])
                    _check_block_supported(
                        _BLOCK_TYPES[tord] if 0 <= tord < len(_BLOCK_TYPES)
                        else f"unknown_{tord}", path)
                    # skip this block's remaining bytes by declared size
                    r.take(body_start + declared - r.pos)
            except ValueError as e:
                if "truncated" not in str(e):
                    raise
                more = f.read(max(chunk, len(data)))
                if not more:
                    if "without an avro_data block" in str(e):
                        # file genuinely exhausted, cleanly framed,
                        # but carries no data block (e.g. a pure
                        # hard-delete log) — typed so callers can
                        # fall through to the next file
                        raise NotImplementedError(
                            f"{path}: no avro_data block found — the "
                            "schema sniff needs at least one data "
                            "block's SCHEMA header") from None
                    raise
                data += more


# ----------------------------------------------------------------------
# writer (fixtures + interop round-trips)
# ----------------------------------------------------------------------

def _meta_bytes(meta: dict) -> bytes:
    out = io.BytesIO()
    out.write(struct.pack(">i", len(meta)))
    for k, v in meta.items():
        b = v.encode("utf-8")
        out.write(struct.pack(">i", _HEADER_KEYS.index(k)))
        out.write(struct.pack(">i", len(b)))
        out.write(b)
    return out.getvalue()


def _block_bytes(btype: str, header: dict, content: bytes,
                 footer: dict | None = None) -> bytes:
    hb = _meta_bytes(header)
    fb = _meta_bytes(footer or {})
    body = io.BytesIO()
    body.write(struct.pack(">i", 1))                  # format version
    body.write(struct.pack(">i", _BLOCK_TYPES.index(btype)))
    body.write(hb)
    body.write(struct.pack(">q", len(content)))
    body.write(content)
    body.write(fb)
    size = body.tell() + 8            # + the trailing reverse field
    out = io.BytesIO()
    out.write(MAGIC)
    out.write(struct.pack(">q", size))
    out.write(body.getvalue())
    out.write(struct.pack(">q", size + 14))   # total incl. magic+size
    return out.getvalue()


def avro_data_block(schema: dict, records: list,
                    instant_time: str) -> bytes:
    from .avro_lite import _encode
    content = io.BytesIO()
    content.write(struct.pack(">i", 3))       # content-format version
    content.write(struct.pack(">i", len(records)))
    for rec in records:
        buf = io.BytesIO()
        _encode(buf, schema, rec)
        b = buf.getvalue()
        content.write(struct.pack(">i", len(b)))
        content.write(b)
    return _block_bytes(
        "avro_data",
        {"INSTANT_TIME": instant_time, "SCHEMA": json.dumps(schema)},
        content.getvalue())


def parquet_data_block(table, instant_time: str,
                       schema: dict | None = None) -> bytes:
    """A spec-shaped PARQUET data block from a pyarrow Table — the
    fixture/interop twin of :func:`avro_data_block` (real hudi
    writers emit these under hoodie.logfile.data.block.format=
    parquet: the block content IS a complete parquet file). The
    header stamps INSTANT_TIME + SCHEMA like real writers; ``schema``
    overrides the arrow-derived avro schema when a test needs an
    exact writer schema."""
    import pyarrow.parquet as pq
    buf = io.BytesIO()
    pq.write_table(table, buf)
    sch = schema or _arrow_to_avro_schema(table.schema,
                                          "<parquet_data_block>")
    return _block_bytes(
        "parquet_data",
        {"INSTANT_TIME": instant_time, "SCHEMA": json.dumps(sch)},
        buf.getvalue())


def delete_block(record_keys: list, instant_time: str,
                 partition_path: str = "") -> bytes:
    """A spec-shaped DELETE block: version-3 content framing around
    the Avro HoodieDeleteRecordList payload — what real hudi writers
    emit for hard deletes. ``record_keys`` are the already-encoded
    recordKey strings (raw value for simple keys, ``f1:v1,f2:v2``
    for composite)."""
    from .avro_lite import _encode
    buf = io.BytesIO()
    _encode(buf, _DELETE_LIST_SCHEMA,
            {"deleteRecordList": [
                {"recordKey": str(k), "partitionPath": partition_path,
                 "orderingVal": None} for k in record_keys]})
    payload = buf.getvalue()
    content = io.BytesIO()
    content.write(struct.pack(">i", 3))
    content.write(struct.pack(">i", len(payload)))
    content.write(payload)
    return _block_bytes("delete", {"INSTANT_TIME": instant_time},
                        content.getvalue())


def rollback_block(target_instant: str) -> bytes:
    return _block_bytes(
        "command",
        {"INSTANT_TIME": target_instant,
         "TARGET_INSTANT_TIME": target_instant,
         "COMMAND_BLOCK_TYPE": "0"}, b"")


def write_log_file(path: str, schema: dict, records: list,
                   instant_time: str,
                   extra_blocks: list | None = None) -> None:
    """One spec-framed log file: a single avro_data block (plus any
    pre-built ``extra_blocks`` appended verbatim)."""
    with open(path, "wb") as f:
        f.write(avro_data_block(schema, records, instant_time))
        for b in extra_blocks or []:
            f.write(b)
