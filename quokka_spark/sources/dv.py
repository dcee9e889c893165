"""Delta Lake deletion vectors: pure-Python decode (and a
test/fixture encoder) of the formats the public Delta protocol
specifies (delta-io PROTOCOL.md §Deletion Vectors):

- descriptor: ``{"storageType": "u"|"i"|"p", "pathOrInlineDv",
  "offset"?, "sizeInBytes", "cardinality"}`` on an add action;
- inline (``i``): pathOrInlineDv is the Z85 encoding of the
  serialized bitmap;
- file (``u``/``p``): a ``.bin`` whose first byte is the format
  version (1); each DV sits at ``offset`` as
  ``[4-byte big-endian length][bitmap bytes][4-byte big-endian
  CRC-32 of the bitmap bytes]``; ``u`` derives the file name from a
  Z85-encoded UUID (optionally behind a random prefix directory),
  ``p`` is an absolute path;
- the bitmap itself is a 64-bit RoaringBitmapArray in the "portable"
  format: 4-byte LE magic 1681511377, 8-byte LE bitmap count, then
  per bitmap a 4-byte LE key (the high 32 bits) followed by a
  standard 32-bit RoaringBitmap in the RoaringFormatSpec portable
  serialization (cookies 12346/12347, array/bitmap/run containers).

The decoder is read-only and total: every deviation raises ValueError
(a DV misread silently resurrects or drops rows — never guess). The
encoder exists so tests can fabricate spec-shaped tables AND so the
decode path is pinned against hand-constructed byte fixtures, not
just its own inverse.
"""

from __future__ import annotations

import os
import struct
import zlib

_Z85_CHARS = ("0123456789abcdefghijklmnopqrstuvwxyz"
              "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}

_RBA_MAGIC = 1681511377
_SERIAL_COOKIE = 12346
_SERIAL_COOKIE_NO_RUN = 12347
_NO_OFFSET_THRESHOLD = 4


def z85_decode(s: str) -> bytes:
    """ZeroMQ Z85: 5 chars → 4 bytes, big-endian base 85."""
    if len(s) % 5:
        raise ValueError(f"Z85 length {len(s)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        acc = 0
        for ch in s[i:i + 5]:
            if ch not in _Z85_INDEX:
                raise ValueError(f"invalid Z85 character {ch!r}")
            acc = acc * 85 + _Z85_INDEX[ch]
        if acc > 0xFFFFFFFF:
            raise ValueError("Z85 group overflows 32 bits")
        out += acc.to_bytes(4, "big")
    return bytes(out)


def z85_encode(b: bytes) -> str:
    if len(b) % 4:
        raise ValueError(f"Z85 input length {len(b)} not a multiple of 4")
    out = []
    for i in range(0, len(b), 4):
        acc = int.from_bytes(b[i:i + 4], "big")
        grp = []
        for _ in range(5):
            grp.append(_Z85_CHARS[acc % 85])
            acc //= 85
        out += reversed(grp)
    return "".join(out)


def _u16(b, p):
    return struct.unpack_from("<H", b, p)[0]


def _u32(b, p):
    return struct.unpack_from("<I", b, p)[0]


def _decode_rb32(buf: bytes, pos: int):
    """One standard 32-bit RoaringBitmap (RoaringFormatSpec portable
    serialization) → (sorted values, next position)."""
    first = _u32(buf, pos)
    cookie = first & 0xFFFF
    if cookie == _SERIAL_COOKIE:
        n = (first >> 16) + 1
        pos += 4
        runbytes = (n + 7) // 8
        runbits = buf[pos:pos + runbytes]
        pos += runbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD

        def is_run(i):
            return (runbits[i // 8] >> (i % 8)) & 1
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        n = _u32(buf, pos + 4)
        pos += 8
        has_offsets = True

        def is_run(i):
            return False
    else:
        raise ValueError(f"unknown roaring cookie {first}")
    keys = []
    cards = []
    for i in range(n):
        keys.append(_u16(buf, pos))
        cards.append(_u16(buf, pos + 2) + 1)
        pos += 4
    if has_offsets:
        pos += 4 * n  # sequential read — offsets are redundant
    values = []
    for i in range(n):
        base = keys[i] << 16
        if is_run(i):
            nruns = _u16(buf, pos)
            pos += 2
            for _ in range(nruns):
                start = _u16(buf, pos)
                length = _u16(buf, pos + 2)  # run holds length+1 values
                pos += 4
                values.extend(range(base + start,
                                    base + start + length + 1))
        elif cards[i] <= 4096:
            for _ in range(cards[i]):
                values.append(base + _u16(buf, pos))
                pos += 2
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base + (wi << 6) + low.bit_length() - 1)
                    w ^= low
    return values, pos


def decode_rbm_array(data: bytes) -> list[int]:
    """Serialized 64-bit RoaringBitmapArray → sorted row indexes."""
    if len(data) < 12:
        raise ValueError("deletion vector bitmap too short")
    if _u32(data, 0) != _RBA_MAGIC:
        raise ValueError(
            f"bad RoaringBitmapArray magic {_u32(data, 0)} "
            f"(expected {_RBA_MAGIC})")
    nmaps = struct.unpack_from("<q", data, 4)[0]
    pos = 12
    out: list[int] = []
    for _ in range(nmaps):
        key = _u32(data, pos)
        pos += 4
        vals, pos = _decode_rb32(data, pos)
        out.extend((key << 32) | v for v in vals)
    if pos != len(data):
        raise ValueError(
            f"deletion vector bitmap has {len(data) - pos} trailing bytes")
    return out


def encode_rbm_array(values) -> bytes:
    """Sorted-or-not row indexes → portable RoaringBitmapArray bytes
    (cookie 12347, array/bitmap containers — the encoder half used by
    tests and the local DV writer)."""
    by_high: dict = {}
    for v in sorted(set(int(x) for x in values)):
        if v < 0:
            raise ValueError("row index must be non-negative")
        by_high.setdefault(v >> 32, []).append(v & 0xFFFFFFFF)
    out = bytearray()
    out += struct.pack("<I", _RBA_MAGIC)
    out += struct.pack("<q", len(by_high))
    for key, vals in sorted(by_high.items()):
        out += struct.pack("<I", key)
        out += _encode_rb32(vals)
    return bytes(out)


def _encode_rb32(vals: list[int]) -> bytes:
    conts: dict = {}
    for v in vals:
        conts.setdefault(v >> 16, []).append(v & 0xFFFF)
    items = sorted(conts.items())
    n = len(items)
    head = bytearray()
    head += struct.pack("<I", _SERIAL_COOKIE_NO_RUN)
    head += struct.pack("<I", n)
    bodies = []
    for key, cv in items:
        if len(cv) <= 4096:
            bodies.append(struct.pack(f"<{len(cv)}H", *sorted(cv)))
        else:
            words = [0] * 1024
            for x in cv:
                words[x >> 6] |= 1 << (x & 63)
            bodies.append(struct.pack("<1024Q", *words))
    for (key, cv), _ in zip(items, bodies):
        head += struct.pack("<HH", key, len(cv) - 1)
    # offset header: positions from the start of this bitmap's cookie
    off = len(head) + 4 * n
    for b in bodies:
        head += struct.pack("<I", off)
        off += len(b)
    return bytes(head) + b"".join(bodies)


def write_dv_file(path: str, values) -> dict:
    """Write a single-DV ``.bin`` file (format version 1, the
    length/CRC framing) and return the descriptor fields for an add
    action (storageType ``p``)."""
    data = encode_rbm_array(values)
    with open(path, "wb") as fh:
        fh.write(b"\x01")
        offset = fh.tell()
        fh.write(struct.pack(">i", len(data)))
        fh.write(data)
        fh.write(struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF))
    return {"storageType": "p", "pathOrInlineDv": os.path.abspath(path),
            "offset": offset, "sizeInBytes": len(data),
            "cardinality": len(set(int(x) for x in values))}


def inline_dv_descriptor(values) -> dict:
    """An inline (storageType ``i``) descriptor for the given row
    indexes. Z85 requires 4-byte alignment, so the bitmap is
    zero-padded before encoding; ``sizeInBytes`` records the TRUE
    length and the decoder truncates back to it."""
    data = encode_rbm_array(values)
    size = len(data)
    if size % 4:
        data += b"\x00" * (4 - size % 4)
    return {"storageType": "i", "pathOrInlineDv": z85_encode(data),
            "sizeInBytes": size,
            "cardinality": len(set(int(x) for x in values))}


def dv_file_path(root: str, dv: dict) -> str:
    """The on-disk ``.bin`` path of a ``u``/``p`` descriptor (``u``:
    name derived from the Z85-encoded UUID, optionally behind a
    random prefix directory)."""
    st = dv.get("storageType")
    if st == "p":
        return dv["pathOrInlineDv"]
    if st == "u":
        enc = dv["pathOrInlineDv"]
        prefix, uid = enc[:-20], enc[-20:]
        u = z85_decode(uid).hex()
        name = (f"deletion_vector_{u[:8]}-{u[8:12]}-{u[12:16]}-"
                f"{u[16:20]}-{u[20:]}.bin")
        return os.path.join(root, *([prefix] if prefix else []), name)
    raise NotImplementedError(f"deletion vector storageType {st!r}")


def dv_row_indexes(root: str, dv: dict) -> list[int]:
    """A descriptor's deleted row indexes. ``root`` = table root for
    relative (``u``) storage."""
    st = dv.get("storageType")
    if st == "i":
        data = z85_decode(dv["pathOrInlineDv"])
        size = dv.get("sizeInBytes")
        if size is not None:
            data = data[:int(size)]
        return decode_rbm_array(data)
    if st in ("u", "p"):
        path = dv_file_path(root, dv)
        with open(path, "rb") as fh:
            if fh.read(1) != b"\x01":
                raise ValueError(f"{path}: unsupported DV format version")
            fh.seek(int(dv["offset"]))
            (size,) = struct.unpack(">i", fh.read(4))
            data = fh.read(size)
            (crc,) = struct.unpack(">I", fh.read(4))
        if len(data) != size:
            raise ValueError(f"{path}: truncated deletion vector")
        if zlib.crc32(data) & 0xFFFFFFFF != crc:
            raise ValueError(f"{path}: deletion vector CRC mismatch")
        if dv.get("sizeInBytes") not in (None, size):
            raise ValueError(
                f"{path}: descriptor sizeInBytes {dv['sizeInBytes']} "
                f"!= stored {size}")
        return decode_rbm_array(data)
    raise NotImplementedError(f"deletion vector storageType {st!r}")
