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
reader honours. DELETE blocks (serialized tombstone key arrays),
HFile/Parquet data blocks, and unknown versions refuse with typed
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


def read_log_blocks(data: bytes, name: str = "<bytes>") -> list[dict]:
    """Parse the framing → [{type, header, footer, content}], with
    ROLLBACK_PREVIOUS_BLOCK commands already applied (rolled-back
    blocks removed)."""
    blocks: list[dict] = []
    for frame in _iter_frames(data, name):
        btype = frame["type"]
        header = frame["header"]
        if btype == "command":
            ctype = header.get("COMMAND_BLOCK_TYPE", "")
            if ctype not in ("0", "ROLLBACK_PREVIOUS_BLOCK",
                             "ROLLBACK_BLOCK"):
                raise NotImplementedError(
                    f"{name}: command block type {ctype!r}")
            target = header.get("TARGET_INSTANT_TIME")
            if not target:
                raise ValueError(
                    f"{name}: rollback command block carries no "
                    "TARGET_INSTANT_TIME — guessing which block to "
                    "invalidate would risk serving rolled-back rows")
            survivors = [b for b in blocks
                         if b["header"].get("INSTANT_TIME") != target]
            if len(survivors) == len(blocks):
                # the target sits in ANOTHER log file of the slice
                # (writers roll to .log.N+1 on size, so crash-recovery
                # rollbacks routinely land one file over). This
                # per-file reader cannot invalidate across files —
                # rolled-back records would WIN the record-key merge
                # with the newest commit time, a silent wrong answer;
                # refuse loudly instead.
                raise NotImplementedError(
                    f"{name}: rollback command targets instant "
                    f"{target!r} which has no block in THIS log file "
                    "— cross-file rollback (rolled-over logs) is not "
                    "supported by the per-file decode")
            blocks = survivors
            continue
        if btype in ("delete", "hfile_data", "parquet_data", "cdc_data",
                     "corrupt") or btype.startswith("unknown_"):
            raise NotImplementedError(
                f"{name}: HoodieLogFormat {btype} block — only "
                "avro_data and rollback command blocks are supported")
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


def read_log_records_bytes(data: bytes, name: str = "<bytes>") \
        -> tuple[dict, list]:
    """A whole framed log file → (first block's schema, records of
    every surviving avro_data block). The schema may evolve across
    blocks; later-block records simply carry their own fields (the
    caller's column projection null-fills, same as file-level
    evolution)."""
    blocks = read_log_blocks(data, name)
    schema, records = None, []
    for b in blocks:
        s, recs = _decode_avro_block(b, name)
        schema = schema or s
        records.extend(recs)
    if schema is None:
        # every data block was rolled back (a crash-recovery shape):
        # the file legitimately contributes ZERO rows — sniff the
        # schema from the raw frames so the empty result stays typed
        for frame in _iter_frames(data, name):
            sj = frame["header"].get("SCHEMA")
            if frame["type"] == "avro_data" and sj:
                return json.loads(sj), []
        raise ValueError(f"{name}: log file contains no data blocks")
    return schema, records


def read_log_schema(path: str, chunk: int = 1 << 20) -> dict:
    """Driver-side schema sniff: parse ONLY up to the first block's
    header (bounded read — the SCHEMA header precedes the content
    bytes, so this never pulls a large data payload)."""
    with open(path, "rb") as f:
        data = f.read(chunk)
        while True:
            try:
                r = _BytesIn(data, path)
                if r.take(6) != MAGIC:
                    raise ValueError(f"{path}: not a HoodieLogFormat "
                                     "file")
                r.i64()
                if r.i32() != 1:
                    raise NotImplementedError(
                        f"{path}: unsupported HoodieLogFormat version")
                tord = r.i32()
                header = _read_meta_map(r)
                if _BLOCK_TYPES[tord:tord + 1] != ["avro_data"]:
                    raise NotImplementedError(
                        f"{path}: first block is not avro_data")
                sj = header.get("SCHEMA")
                if not sj:
                    raise ValueError(f"{path}: first block carries "
                                     "no SCHEMA header")
                return json.loads(sj)
            except ValueError as e:
                if "truncated" not in str(e):
                    raise
                more = f.read(max(chunk, len(data)))
                if not more:
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
