"""Minimal Avro object-container-file codec (pure Python, no deps).

Implements the subset of the public Avro 1.11 spec needed to read and
write Apache Iceberg manifest / manifest-list files (the only Avro the
engine touches): null + deflate codecs, and the binary encoding for
null, boolean, int, long (zigzag varint), float, double, bytes,
string, fixed, enum, array, map, record, and unions. Schema resolution
is writer-schema-only (the reader decodes exactly what the file's
embedded ``avro.schema`` declares), which is all container files need.

Why hand-rolled: this container ships no avro package, and
``read_iceberg`` should not silently require one — Iceberg metadata is
small (KB-scale manifests), so a driver-side pure-Python decode is
negligible next to the parquet scan it unlocks.

Spec reference: https://avro.apache.org/docs/1.11.1/specification/
(public format documentation; no code derived from any implementation).
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

MAGIC = b"Obj\x01"


# ----------------------------------------------------------------------
# binary decoding
# ----------------------------------------------------------------------

class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) < n:
            raise EOFError("truncated avro data")
        self.pos += n
        return b

    def read_long(self) -> int:
        """zigzag varint (spec: int and long share this encoding)."""
        shift, acc = 0, 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


def _decode(r: _Reader, schema):
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):  # union: long index picks the branch
        return _decode(r, schema[r.read_long()])
    else:
        t = schema["type"]

    if t == "null":
        return None
    if t == "boolean":
        return r.read(1) != b"\x00"
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read(r.read_long())
    if t == "string":
        return r.read(r.read_long()).decode("utf-8")
    if t == "fixed":
        return r.read(schema["size"])
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "record":
        return {f["name"]: _decode(r, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:  # negative count: block byte size follows (skip it)
                n = -n
                r.read_long()
            for _ in range(n):
                out.append(_decode(r, schema["items"]))
        return out
    if t == "map":
        out = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read(r.read_long()).decode("utf-8")
                out[k] = _decode(r, schema["values"])
        return out
    raise ValueError(f"unsupported avro type: {t!r}")


def read_container(path: str) -> tuple[dict, list]:
    """Read an Avro object container file → (file metadata, records)."""
    with open(path, "rb") as f:
        data = f.read()
    return read_container_bytes(data, name=path)


def read_container_meta(path: str, chunk: int = 65536) -> dict:
    """Read ONLY the container header (magic + file metadata map) —
    O(KB) regardless of file size. Used for schema inference so the
    driver never pays a full pure-Python decode of the first file
    (avro_source.py reads the header here, then decodes records on
    executors)."""
    with open(path, "rb") as f:
        data = f.read(chunk)
        while True:
            try:
                r = _Reader(data)
                if r.read(4) != MAGIC:
                    raise ValueError(f"{path}: not an avro container file")
                meta = _decode(r, {"type": "map", "values": "bytes"})
                r.read(16)  # sync marker must be present too
                return {(k.decode() if isinstance(k, bytes) else k):
                        (v.decode() if isinstance(v, bytes) else v)
                        for k, v in meta.items()}
            except (EOFError, IndexError):
                more = f.read(max(chunk, len(data)))
                if not more:
                    raise EOFError(f"{path}: truncated avro header")
                data += more


def read_container_bytes(data: bytes, name: str = "<bytes>") \
        -> tuple[dict, list]:
    """Decode an in-memory Avro container (the executor-side entry for
    the distributed binaryFile scan in avro_source.py)."""
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise ValueError(f"{name}: not an avro container file")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode(r, meta_schema)
    sync = r.read(16)
    schema = json.loads(meta[b"avro.schema"] if b"avro.schema" in meta
                        else meta["avro.schema"])
    codec = meta.get(b"avro.codec", meta.get("avro.codec", b"null"))
    codec = codec.decode() if isinstance(codec, bytes) else codec
    records = []
    while not r.at_end():
        count = r.read_long()
        size = r.read_long()
        block = r.read(size)
        if codec == "deflate":  # raw deflate, no zlib header (spec)
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec: {codec}")
        br = _Reader(block)
        for _ in range(count):
            records.append(_decode(br, schema))
        if r.read(16) != sync:
            raise ValueError(f"{name}: sync marker mismatch")
    return {(k.decode() if isinstance(k, bytes) else k): v
            for k, v in meta.items()}, records


# ----------------------------------------------------------------------
# binary encoding (fixtures + write_iceberg support)
# ----------------------------------------------------------------------

def _zigzag(n: int) -> bytes:
    acc = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = acc & 0x7F
        acc >>= 7
        if acc:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode(w: io.BytesIO, schema, val):
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):
        # pick the first branch the value fits (null → "null" branch)
        for i, branch in enumerate(schema):
            bt = branch if isinstance(branch, str) else branch["type"]
            if (val is None) == (bt == "null"):
                w.write(_zigzag(i))
                return _encode(w, branch, val)
        raise ValueError(f"no union branch for {val!r} in {schema}")
    else:
        t = schema["type"]

    if t == "null":
        return None
    if t == "boolean":
        return w.write(b"\x01" if val else b"\x00")
    if t in ("int", "long"):
        return w.write(_zigzag(int(val)))
    if t == "float":
        return w.write(struct.pack("<f", val))
    if t == "double":
        return w.write(struct.pack("<d", val))
    if t == "bytes":
        w.write(_zigzag(len(val)))
        return w.write(val)
    if t == "string":
        b = val.encode("utf-8")
        w.write(_zigzag(len(b)))
        return w.write(b)
    if t == "fixed":
        return w.write(val)
    if t == "enum":
        return w.write(_zigzag(schema["symbols"].index(val)))
    if t == "record":
        for f in schema["fields"]:
            _encode(w, f["type"], val.get(f["name"]))
        return None
    if t == "array":
        if val:
            w.write(_zigzag(len(val)))
            for item in val:
                _encode(w, schema["items"], item)
        return w.write(_zigzag(0))
    if t == "map":
        if val:
            w.write(_zigzag(len(val)))
            for k, v in val.items():
                _encode(w, "string", k)
                _encode(w, schema["values"], v)
        return w.write(_zigzag(0))
    raise ValueError(f"unsupported avro type: {t!r}")


def write_container(path: str, schema: dict, records: list,
                    extra_meta: dict | None = None) -> None:
    """Write an Avro object container file (null codec, one block)."""
    sync = os.urandom(16)
    body = io.BytesIO()
    for rec in records:
        _encode(body, schema, rec)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": b"null"}
    for k, v in (extra_meta or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode()
    out = io.BytesIO()
    out.write(MAGIC)
    _encode(out, {"type": "map", "values": "bytes"}, meta)
    out.write(sync)
    out.write(_zigzag(len(records)))
    payload = body.getvalue()
    out.write(_zigzag(len(payload)))
    out.write(payload)
    out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())
