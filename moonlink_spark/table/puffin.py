"""Puffin container + Iceberg v3 deletion-vector blobs, pure Python.

Parity: the reference persists per-file deletion vectors as
``deletion-vector-v1`` blobs inside Puffin files when syncing snapshots
to Iceberg (``storage/table/iceberg/deletion_vector.rs:80-160`` writes
the blob, ``iceberg_table_syncer.rs:723`` attaches them to the
snapshot), and its DataFusion read side consumes them back into row
skips (``moonlink_datafusion/src/table_provider.rs:119-126``). This
module re-implements the same two public formats:

- the **Puffin file format** (Iceberg puffin-spec): "PFA1" magic, raw
  blobs, then a footer of JSON blob metadata + payload size + flags;
- the **deletion-vector-v1 blob** (Iceberg v3 spec, same layout as
  deletion_vector.rs:83-86): ``u32-BE combined length | magic D1 D3 39
  64 | portable 64-bit Roaring bitmap | u32-BE CRC-32 of magic+bitmap``
  (the reference computes the checksum with crc32fast — IEEE CRC-32,
  i.e. ``zlib.crc32`` — which is what we match).

The Roaring serialization follows the public RoaringFormatSpec: the
64-bit extension is a u64-LE bucket count, then per bucket a u32-LE high
word and a standard 32-bit portable bitmap (no-run cookie 12346, array
containers up to 4096 values, bitset containers above).
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import Any

PUFFIN_MAGIC = b"PFA1"
DV_MAGIC = bytes([0xD1, 0xD3, 0x39, 0x64])
DELETION_VECTOR_V1 = "deletion-vector-v1"

_NO_RUN_COOKIE = 12346  # SERIAL_COOKIE_NO_RUNCONTAINER
_ARRAY_MAX = 4096       # container cardinality above which bitsets win


# --------------------------------------------------------------------------- #
# Roaring bitmaps (portable format)
# --------------------------------------------------------------------------- #


def _serialize_roaring32(values: list[int]) -> bytes:
    """Sorted unique u32 values -> portable 32-bit roaring bytes."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray()
    out += struct.pack("<II", _NO_RUN_COOKIE, len(keys))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    # offset header: byte position of each container from stream start
    pos = len(out) + 4 * len(keys)
    for k in keys:
        out += struct.pack("<I", pos)
        card = len(containers[k])
        pos += 2 * card if card <= _ARRAY_MAX else 8192
    for k in keys:
        vals = containers[k]
        if len(vals) <= _ARRAY_MAX:
            out += struct.pack(f"<{len(vals)}H", *vals)
        else:
            bits = bytearray(8192)
            for v in vals:
                bits[v >> 3] |= 1 << (v & 7)
            out += bits
    return bytes(out)


def _deserialize_roaring32(data: bytes, pos: int) -> tuple[list[int], int]:
    cookie, = struct.unpack_from("<I", data, pos)
    if cookie != _NO_RUN_COOKIE:
        raise ValueError(f"unsupported roaring cookie {cookie}")
    n, = struct.unpack_from("<I", data, pos + 4)
    head = pos + 8
    keys_cards = [
        struct.unpack_from("<HH", data, head + 4 * i) for i in range(n)
    ]
    cur = head + 4 * n + 4 * n  # skip descriptive + offset headers
    values: list[int] = []
    for key, card_m1 in keys_cards:
        card = card_m1 + 1
        base = key << 16
        if card <= _ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", data, cur)
            values.extend(base | v for v in vals)
            cur += 2 * card
        else:
            bits = data[cur:cur + 8192]
            for byte_i, b in enumerate(bits):
                while b:
                    low = b & (-b)
                    values.append(base | (byte_i << 3) | low.bit_length() - 1)
                    b ^= low
            cur += 8192
    return values, cur


def serialize_roaring64(positions: list[int]) -> bytes:
    """Sorted-or-not u64 positions -> portable 64-bit roaring bytes."""
    uniq = sorted(set(positions))
    buckets: dict[int, list[int]] = {}
    for p in uniq:
        if p < 0 or p > 0xFFFFFFFFFFFFFFFF:
            raise ValueError(f"position {p} out of u64 range")
        buckets.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray(struct.pack("<Q", len(buckets)))
    for high in sorted(buckets):
        out += struct.pack("<I", high)
        out += _serialize_roaring32(buckets[high])
    return bytes(out)


def deserialize_roaring64(data: bytes) -> list[int]:
    nbuckets, = struct.unpack_from("<Q", data, 0)
    pos = 8
    values: list[int] = []
    for _ in range(nbuckets):
        high, = struct.unpack_from("<I", data, pos)
        lows, pos = _deserialize_roaring32(data, pos + 4)
        values.extend((high << 32) | v for v in lows)
    return values


# --------------------------------------------------------------------------- #
# deletion-vector-v1 blob
# --------------------------------------------------------------------------- #


def dv_blob_bytes(positions: list[int]) -> bytes:
    """Row positions -> the deletion-vector-v1 blob body
    (deletion_vector.rs:83-86 layout)."""
    bitmap = serialize_roaring64(positions)
    combined = DV_MAGIC + bitmap
    crc = zlib.crc32(combined) & 0xFFFFFFFF
    return struct.pack(">I", len(combined)) + combined + struct.pack(">I", crc)


def parse_dv_blob(data: bytes) -> list[int]:
    """Blob body -> sorted deleted row positions (validates magic, length
    and checksum exactly like deletion_vector.rs:160-210)."""
    if len(data) < 12:
        raise ValueError("deletion vector blob shorter than 12 bytes")
    combined_len, = struct.unpack_from(">I", data, 0)
    if 4 + combined_len + 4 != len(data):
        raise ValueError(
            f"deletion vector blob length mismatch: header says "
            f"{4 + combined_len + 4}, got {len(data)}"
        )
    if data[4:8] != DV_MAGIC:
        raise ValueError("bad deletion vector magic")
    crc, = struct.unpack_from(">I", data, len(data) - 4)
    if zlib.crc32(data[4:len(data) - 4]) & 0xFFFFFFFF != crc:
        raise ValueError("deletion vector CRC mismatch")
    return deserialize_roaring64(data[8:len(data) - 4])


# --------------------------------------------------------------------------- #
# Puffin container
# --------------------------------------------------------------------------- #



# Blob type for the persisted key hash index (parity
# storage/table/iceberg/index.rs:20-22).
MOONCAKE_HASH_INDEX_V1 = "mooncake-hash-index-v1"

# Blob types for the persisted similarity indexes (this engine's
# extension of the reference's FileIndexBlob pattern: same container,
# same copy-blocks-next-to-data layout).
MOONCAKE_IVF_INDEX_V1 = "mooncake-ivf-index-v1"
MOONCAKE_MINHASH_INDEX_V1 = "mooncake-minhash-index-v1"


def write_puffin(
    path: str,
    blobs: list[tuple[bytes, dict[str, Any]]],
    file_properties: dict[str, str] | None = None,
) -> list[dict[str, Any]]:
    """Write a Puffin file; ``blobs`` pairs raw blob bytes with metadata
    extras (type, properties, snapshot-id...). Returns the final footer
    blob-metadata list (offsets/lengths filled in) for manifest wiring."""
    import os

    out = bytearray(PUFFIN_MAGIC)
    metas: list[dict[str, Any]] = []
    for data, extra in blobs:
        meta = {
            "type": extra.get("type", DELETION_VECTOR_V1),
            "fields": extra.get("fields", []),
            # unknown at write time for v1 puffin, mirrored from the
            # reference (deletion_vector.rs:148-151)
            "snapshot-id": extra.get("snapshot-id", -1),
            "sequence-number": extra.get("sequence-number", -1),
            "offset": len(out),
            "length": len(data),
        }
        if extra.get("properties"):
            meta["properties"] = dict(extra["properties"])
        metas.append(meta)
        out += data
    payload = json.dumps(
        {"blobs": metas, "properties": dict(file_properties or {})},
        separators=(",", ":"),
    ).encode("utf-8")
    out += PUFFIN_MAGIC
    out += payload
    out += struct.pack("<I", len(payload))
    out += b"\x00\x00\x00\x00"  # flags: footer payload uncompressed
    out += PUFFIN_MAGIC
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(bytes(out))
    os.replace(tmp, path)
    return metas


def read_puffin(path: str) -> tuple[list[dict[str, Any]], bytes]:
    """-> (footer blob-metadata list, whole file bytes). Blob bytes are
    ``data[meta['offset'] : meta['offset'] + meta['length']]``."""
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:4] != PUFFIN_MAGIC or data[-4:] != PUFFIN_MAGIC:
        raise ValueError(f"{path} is not a puffin file")
    payload_size, flags = struct.unpack_from("<II", data, len(data) - 12)
    if flags & 1:
        raise ValueError("compressed puffin footers not supported")
    payload_start = len(data) - 12 - payload_size
    if data[payload_start - 4:payload_start] != PUFFIN_MAGIC:
        raise ValueError("corrupt puffin footer")
    footer = json.loads(data[payload_start:payload_start + payload_size])
    return footer["blobs"], data


def read_puffin_deletion_vectors(path: str) -> dict[str, list[int]]:
    """-> {referenced data file path: sorted deleted positions} for every
    deletion-vector-v1 blob in the file."""
    metas, data = read_puffin(path)
    out: dict[str, list[int]] = {}
    for meta in metas:
        if meta.get("type") != DELETION_VECTOR_V1:
            continue
        blob = data[meta["offset"]:meta["offset"] + meta["length"]]
        ref = meta.get("properties", {}).get("referenced-data-file")
        if ref is None:
            raise ValueError("deletion-vector blob missing referenced-data-file")
        out[ref] = parse_dv_blob(blob)
    return out
