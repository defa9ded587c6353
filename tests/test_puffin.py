"""Puffin container + deletion-vector-v1 blob format (parity:
storage/table/iceberg/deletion_vector.rs:80-210 blob layout and
puffin_utils.rs; roaring serialization per the public RoaringFormatSpec
64-bit extension)."""

import struct
import zlib

import pytest

from moonlink_spark.table.puffin import (
    DV_MAGIC,
    PUFFIN_MAGIC,
    deserialize_roaring64,
    dv_blob_bytes,
    parse_dv_blob,
    read_puffin,
    read_puffin_deletion_vectors,
    serialize_roaring64,
    write_puffin,
)


@pytest.mark.parametrize(
    "positions",
    [
        [],
        [0],
        [5, 1, 5, 3],                          # dups + unsorted
        list(range(100)),
        list(range(0, 200_000, 3)),            # >4096/container -> bitset
        [2**32 - 1, 2**32, 2**33 + 7, 12],     # multiple 32-bit buckets
        [65535, 65536, 131071],                # container boundaries
    ],
)
def test_roaring64_roundtrip(positions):
    data = serialize_roaring64(positions)
    assert deserialize_roaring64(data) == sorted(set(positions))


def test_roaring64_bitset_container_size():
    # 5000 values in one 16-bit container: must serialize as an 8 KiB
    # bitset (portable spec), not a 10 KB array
    vals = list(range(5000))
    data = serialize_roaring64(vals)
    # u64 bucket count + u32 high + cookie/size + 1 descr + 1 offset + 8192
    assert len(data) == 8 + 4 + 8 + 4 + 4 + 8192
    assert deserialize_roaring64(data) == vals


def test_dv_blob_layout_and_validation():
    blob = dv_blob_bytes([1, 7, 9])
    # | u32-BE len(magic+vector) | magic | vector | u32-BE crc |
    combined_len, = struct.unpack_from(">I", blob, 0)
    assert blob[4:8] == DV_MAGIC
    assert 4 + combined_len + 4 == len(blob)
    crc, = struct.unpack_from(">I", blob, len(blob) - 4)
    assert crc == zlib.crc32(blob[4:-4]) & 0xFFFFFFFF
    assert parse_dv_blob(blob) == [1, 7, 9]

    with pytest.raises(ValueError):
        parse_dv_blob(blob[:8])                       # truncated
    with pytest.raises(ValueError):
        parse_dv_blob(b"\x00\x00\x00\x04XXXX\x00\x00\x00\x00")  # bad magic
    corrupted = bytearray(blob)
    corrupted[10] ^= 0xFF
    with pytest.raises(ValueError):
        parse_dv_blob(bytes(corrupted))               # crc mismatch


def test_puffin_container_roundtrip(tmp_path):
    p = str(tmp_path / "t.puffin")
    b1 = dv_blob_bytes([0, 2, 4])
    b2 = dv_blob_bytes(list(range(10_000)))
    metas = write_puffin(
        p,
        [
            (b1, {"properties": {"referenced-data-file": "/d/a.parquet",
                                 "cardinality": "3"}}),
            (b2, {"properties": {"referenced-data-file": "/d/b.parquet",
                                 "cardinality": "10000"}}),
        ],
        file_properties={"created-by": "moonlink_spark"},
    )
    assert metas[0]["offset"] == 4 and metas[0]["length"] == len(b1)
    assert metas[1]["offset"] == 4 + len(b1)

    with open(p, "rb") as fh:
        raw = fh.read()
    assert raw[:4] == PUFFIN_MAGIC and raw[-4:] == PUFFIN_MAGIC

    metas2, data = read_puffin(p)
    assert metas2 == metas
    assert data[metas2[0]["offset"]:metas2[0]["offset"] + metas2[0]["length"]] == b1

    dvs = read_puffin_deletion_vectors(p)
    assert dvs == {"/d/a.parquet": [0, 2, 4],
                   "/d/b.parquet": list(range(10_000))}


def test_puffin_rejects_garbage(tmp_path):
    p = tmp_path / "bad.puffin"
    p.write_bytes(b"not a puffin at all")
    with pytest.raises(ValueError):
        read_puffin(str(p))
