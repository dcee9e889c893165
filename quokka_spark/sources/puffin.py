"""Puffin file read/write for Iceberg v3 DELETION VECTORS.

Iceberg format-version 3 stores position deletes as deletion vectors:
`deletion-vector-v1` blobs inside Puffin files (Puffin spec +
Iceberg spec §Deletion Vectors; the reference engine predates v3 —
this is parity-plus next to the Delta DV support in sources/dv.py).

Puffin container layout (Puffin spec):

    Magic "PFA1" | blob bytes ... | Magic "PFA1" | FooterPayload
    (UTF-8 JSON) | FooterPayloadSize (4-byte LE int) | Flags
    (4 bytes; bit 0 of byte 0 = footer payload compressed) |
    Magic "PFA1"

`deletion-vector-v1` blob layout (Iceberg spec):

    4-byte BIG-endian length of (magic + vector)
    | magic D1 D3 39 64
    | 64-bit roaring bitmap, "portable" serialization
    | 4-byte BIG-endian CRC-32 of (magic + vector)

The 64-bit "portable" roaring serialization (RoaringFormatSpec, what
`RoaringBitmap`'s `serializePortable` writes and pyiceberg/the jar
read): an 8-byte LITTLE-endian count of 32-bit buckets, then per
bucket a 4-byte LE high-32 key followed by one standard 32-bit
RoaringBitmap — the same per-bucket layout as Delta's
RoaringBitmapArray (sources/dv.py) minus Delta's leading magic, so
the 32-bit container codec is shared.

Readers locate DV blobs via the manifest entry's
``referenced_data_file`` / ``content_offset`` /
``content_size_in_bytes`` fields (required for DV entries per spec)
— no footer parse on the read path; the writer still produces a
complete, spec-valid footer so foreign readers can scan the file.
"""

from __future__ import annotations

import json
import struct
import zlib

from .dv import _decode_rb32, _encode_rb32

MAGIC = b"PFA1"
_DV_MAGIC = b"\xd1\xd39d"          # D1 D3 39 64


def encode_rb64_portable(values) -> bytes:
    """Sorted-or-not 64-bit row positions → portable 64-bit roaring
    bitmap bytes (8-byte LE bucket count, per bucket 4-byte LE key +
    32-bit roaring container)."""
    buckets: dict = {}
    for v in values:
        v = int(v)
        if v < 0:
            raise ValueError(f"negative row position {v}")
        buckets.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = [struct.pack("<q", len(buckets))]
    for key in sorted(buckets):
        out.append(struct.pack("<i", key))
        out.append(_encode_rb32(sorted(set(buckets[key]))))
    return b"".join(out)


def decode_rb64_portable(data: bytes) -> list[int]:
    """Portable 64-bit roaring bitmap bytes → sorted row positions."""
    (n,) = struct.unpack_from("<q", data, 0)
    pos = 8
    out: list[int] = []
    for _ in range(n):
        (key,) = struct.unpack_from("<i", data, pos)
        pos += 4
        vals, pos = _decode_rb32(data, pos)
        base = key << 32
        out.extend(base | v for v in vals)
    if pos != len(data):
        raise ValueError(
            f"portable roaring64: {len(data) - pos} trailing bytes "
            "after the declared buckets — corrupt or misframed blob")
    return out


def _dv_blob(values) -> bytes:
    vec = _DV_MAGIC + encode_rb64_portable(values)
    return (struct.pack(">i", len(vec)) + vec
            + struct.pack(">I", zlib.crc32(vec) & 0xFFFFFFFF))


def write_puffin_dv(path: str, dv_map: dict) -> dict:
    """Write one Puffin file holding a ``deletion-vector-v1`` blob
    per entry of ``dv_map`` ({data file path: row positions}).
    Returns {data file path: {"content_offset", "content_size_in_
    bytes", "cardinality"}} — the manifest fields a DV entry needs."""
    blobs = []
    out = {}
    offset = len(MAGIC)
    for data_file in sorted(dv_map):
        positions = sorted(set(int(p) for p in dv_map[data_file]))
        blob = _dv_blob(positions)
        blobs.append((data_file, blob, len(positions), offset))
        out[data_file] = {"content_offset": offset,
                          "content_size_in_bytes": len(blob),
                          "cardinality": len(positions)}
        offset += len(blob)
    footer_payload = json.dumps({
        "blobs": [{"type": "deletion-vector-v1",
                   "fields": [], "snapshot-id": -1,
                   "sequence-number": -1,
                   "offset": off, "length": len(blob),
                   "properties": {
                       "referenced-data-file": data_file,
                       "cardinality": str(card)}}
                  for data_file, blob, card, off in blobs],
        "properties": {"created-by": "quokka_spark"},
    }).encode("utf-8")
    with open(path, "wb") as fh:
        fh.write(MAGIC)
        for _, blob, _, _ in blobs:
            fh.write(blob)
        fh.write(MAGIC)
        fh.write(footer_payload)
        fh.write(struct.pack("<i", len(footer_payload)))
        fh.write(struct.pack("<i", 0))       # flags: uncompressed
        fh.write(MAGIC)
    return out


def read_puffin_dv_blob(path: str, offset: int, size: int) -> list[int]:
    """Row positions of one ``deletion-vector-v1`` blob, located by
    the manifest entry's content_offset/content_size_in_bytes — a
    single ranged read, the whole file is never loaded. Validates
    the blob magic, declared length, and CRC (a silently corrupt DV
    would resurrect or over-delete rows)."""
    with open(path, "rb") as fh:
        fh.seek(offset)
        raw = fh.read(size)
    if len(raw) != size:
        raise ValueError(
            f"{path}: DV blob at {offset} truncated "
            f"({len(raw)} of {size} bytes)")
    (ln,) = struct.unpack_from(">i", raw, 0)
    if ln != size - 8:
        raise ValueError(
            f"{path}: DV blob length field {ln} != content size "
            f"{size} - 8 — misframed blob")
    vec = raw[4:4 + ln]
    if vec[:4] != _DV_MAGIC:
        raise ValueError(
            f"{path}: DV blob magic {vec[:4]!r} != D1 D3 39 64")
    (crc,) = struct.unpack_from(">I", raw, 4 + ln)
    if crc != (zlib.crc32(vec) & 0xFFFFFFFF):
        raise ValueError(f"{path}: DV blob CRC mismatch")
    return decode_rb64_portable(vec[4:])
