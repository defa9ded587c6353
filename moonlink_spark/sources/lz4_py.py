"""Pure-Python LZ4 codec with the LZ4 Frame framing Kafka producers
use for ``compression.type=lz4`` (message format v2 RecordBatches wrap
the records section in a standard LZ4 frame).

Both layers follow the public specs at github.com/lz4/lz4/tree/dev/doc:

- **block format** (``lz4_Block_format.md``): sequences of
  ``token | literal-length ext | literals | 2-byte LE offset |
  match-length ext``; match length is ``(token & 0xF) + 4``; copies may
  overlap and replicate (offset < length is the RLE shape); the last
  sequence is literals-only.
- **frame format** (``lz4_Frame_format.md``): LE magic ``0x184D2204``,
  FLG/BD descriptor bytes + xxHash32-derived header checksum, then
  ``4-byte LE size + data`` blocks (high bit set = stored uncompressed,
  size 0 = EndMark), with optional block/content checksums.

The decoder accepts the full frame feature set our inputs can carry:
linked or independent blocks (decoding appends into one continuous
buffer, so cross-block back-references resolve naturally), content
size (verified), dictID (no dictionary support — fails loud), block
and content xxHash32 checksums (verified), and skippable frames.
Kafka's OLD message-format-v0 producers shipped a broken variant that
computed the header checksum over magic+descriptor instead of the
descriptor alone; the decoder accepts either checksum, like
kafka-python / librdkafka do.

The encoder is a greedy LZ77 with a 4-byte-hash match table emitting a
strict subset of valid LZ4 (64 KiB independent blocks; a block that
doesn't shrink is stored uncompressed, which the frame format makes
first-class), so any spec decoder reads it. Pure-Python throughput is
the same order as the snappy sibling (``snappy_py``): decompress tens
of MB/s, compress a few MB/s — the consumer leg (brokers SEND lz4) is
the one that matters out of the box; register a C codec via
``kafka_wire.register_codec`` for hot produce loops.

xxHash32 follows ``xxhash_spec.md`` (same repo); its four known-answer
vectors are pinned in tests.

Reference parity: moonlink's rdkafka decodes lz4 natively
(src/moonlink_connectors — rust-rdkafka's bundled codecs); this closes
the "brokers default to lz4" gap without a non-stdlib dependency.
"""

from __future__ import annotations

import struct

_MAGIC = 0x184D2204
_MAGIC_SKIP_LO = 0x184D2A50  # skippable frames: 0x184D2A50..5F
_MAGIC_SKIP_HI = 0x184D2A5F
_BLOCK = 64 * 1024  # our encoder's block size (BD code 4)

_MASK = 0xFFFFFFFF
_P1, _P2, _P3, _P4, _P5 = (
    2654435761,
    2246822519,
    3266489917,
    668265263,
    374761393,
)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK


def xxh32(data: bytes, seed: int = 0) -> int:
    """xxHash32 per the public spec (xxhash_spec.md). Used for the
    frame header checksum and to verify block/content checksums."""
    n = len(data)
    p = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed
        v4 = (seed - _P1) & _MASK
        limit = n - 16
        while p <= limit:
            lanes = struct.unpack_from("<IIII", data, p)
            v1 = (_rotl((v1 + lanes[0] * _P2) & _MASK, 13) * _P1) & _MASK
            v2 = (_rotl((v2 + lanes[1] * _P2) & _MASK, 13) * _P1) & _MASK
            v3 = (_rotl((v3 + lanes[2] * _P2) & _MASK, 13) * _P1) & _MASK
            v4 = (_rotl((v4 + lanes[3] * _P2) & _MASK, 13) * _P1) & _MASK
            p += 16
        acc = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _MASK
    else:
        acc = (seed + _P5) & _MASK
    acc = (acc + n) & _MASK
    while p + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, p)
        acc = (_rotl((acc + lane * _P3) & _MASK, 17) * _P4) & _MASK
        p += 4
    while p < n:
        acc = (_rotl((acc + data[p] * _P5) & _MASK, 11) * _P1) & _MASK
        p += 1
    acc ^= acc >> 15
    acc = (acc * _P2) & _MASK
    acc ^= acc >> 13
    acc = (acc * _P3) & _MASK
    acc ^= acc >> 16
    return acc


# -- lz4 block --------------------------------------------------------------


def block_decompress(data: bytes, out: bytearray) -> None:
    """Decode one LZ4 block APPENDING into ``out``. Back-references may
    reach into bytes already in ``out`` (the frame's linked-blocks mode);
    for independent blocks they simply never do."""
    p = 0
    n = len(data)
    base = len(out)
    while p < n:
        token = data[p]
        p += 1
        lit = token >> 4
        if lit == 15:
            while True:
                if p >= n:
                    raise ValueError("corrupt lz4 block: truncated litlen")
                b = data[p]
                p += 1
                lit += b
                if b != 255:
                    break
        if p + lit > n:
            raise ValueError("corrupt lz4 block: truncated literals")
        out += data[p : p + lit]
        p += lit
        if p >= n:
            return  # last sequence: literals only
        if p + 2 > n:
            raise ValueError("corrupt lz4 block: truncated offset")
        off = data[p] | (data[p + 1] << 8)
        p += 2
        if off == 0:
            raise ValueError("corrupt lz4 block: zero offset")
        m = token & 0xF
        if m == 15:
            while True:
                if p >= n:
                    raise ValueError("corrupt lz4 block: truncated matchlen")
                b = data[p]
                p += 1
                m += b
                if b != 255:
                    break
        m += 4
        start = len(out) - off
        if start < 0:
            raise ValueError("corrupt lz4 block: offset beyond window")
        if off >= m:
            out += out[start : start + m]
        else:  # overlapping copy replicates byte-by-byte (RLE shape)
            for k in range(m):
                out.append(out[start + k])
    # block ending exactly after literals is handled by the return above;
    # falling out of the loop means the block was empty, which is legal
    # only for zero input
    if len(out) == base and n:
        raise ValueError("corrupt lz4 block: no terminating sequence")


def _emit_seq(
    out: bytearray, data: bytes, lit_start: int, lit_end: int, m: int, off: int
) -> None:
    lit = lit_end - lit_start
    ml = m - 4 if m else 0
    token = (min(lit, 15) << 4) | (min(ml, 15) if m else 0)
    out.append(token)
    if lit >= 15:
        rem = lit - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    out += data[lit_start:lit_end]
    if not m:
        return
    out += off.to_bytes(2, "little")
    if ml >= 15:
        rem = ml - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)


def block_compress(data: bytes) -> bytes:
    """Greedy hash-table LZ77 emitting a strict spec subset. End-of-block
    rules per lz4_Block_format.md: the last sequence is literals-only,
    the last 5 bytes are always literals, and no match starts within the
    last 12 bytes."""
    n = len(data)
    out = bytearray()
    if n == 0:
        return bytes(out)
    i = lit_start = 0
    match_limit = n - 12  # last match must start before here
    end_limit = n - 5  # matches may not extend past here
    table: dict[bytes, int] = {}
    while i < match_limit:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > 0xFFFF:
            i += 1
            continue
        m = 4
        while i + m < end_limit and data[cand + m] == data[i + m]:
            m += 1
        _emit_seq(out, data, lit_start, i, m, i - cand)
        i += m
        lit_start = i
    _emit_seq(out, data, lit_start, n, 0, 0)  # final literals-only seq
    return bytes(out)


# -- lz4 frame (what Kafka lz4 payloads actually are) -----------------------


def compress(data: bytes) -> bytes:
    """Standard LZ4 frame: FLG v01 + independent 64 KiB blocks, no
    checksums beyond the mandatory header checksum. A block the LZ77
    pass fails to shrink is stored uncompressed (high bit of the block
    size), which the frame format defines exactly for this case."""
    flg = 0x60  # version 01, block-independent, no optional fields
    bd = 0x40  # block max size code 4 = 64 KiB
    header = bytes([flg, bd])
    hc = (xxh32(header) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", _MAGIC) + header + bytes([hc]))
    for i in range(0, len(data), _BLOCK):
        chunk = data[i : i + _BLOCK]
        comp = block_compress(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            out += comp
        else:
            out += struct.pack("<I", len(chunk) | 0x80000000)
            out += chunk
    out += struct.pack("<I", 0)  # EndMark
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Decode LZ4 frame(s): concatenated frames and skippable frames are
    legal per spec; Kafka payloads are one frame."""
    out = bytearray()
    p = 0
    n = len(data)
    while p < n:
        if p + 4 > n:
            raise ValueError("corrupt lz4 frame: truncated magic")
        (magic,) = struct.unpack_from("<I", data, p)
        p += 4
        if _MAGIC_SKIP_LO <= magic <= _MAGIC_SKIP_HI:
            if p + 4 > n:
                raise ValueError("corrupt lz4 frame: truncated skip size")
            (skip,) = struct.unpack_from("<I", data, p)
            if p + 4 + skip > n:
                raise ValueError("corrupt lz4 frame: truncated skippable frame")
            p += 4 + skip
            continue
        if magic != _MAGIC:
            raise ValueError(f"not an lz4 frame (magic {magic:#x})")
        p = _decode_frame(data, p, out)
    return bytes(out)


def _decode_frame(data: bytes, p: int, out: bytearray) -> int:
    n = len(data)
    if p + 3 > n:
        raise ValueError("corrupt lz4 frame: truncated descriptor")
    flg = data[p]
    if (flg >> 6) != 0b01:
        raise ValueError(f"unsupported lz4 frame version {flg >> 6}")
    b_checksum = bool(flg & 0x10)
    has_csize = bool(flg & 0x08)
    c_checksum = bool(flg & 0x04)
    has_dict = bool(flg & 0x01)
    desc_len = 2 + (8 if has_csize else 0) + (4 if has_dict else 0)
    if p + desc_len + 1 > n:
        raise ValueError("corrupt lz4 frame: truncated descriptor")
    descriptor = data[p : p + desc_len]
    hc = data[p + desc_len]
    # standard: xxh32 over the descriptor; old Kafka v0 producers hashed
    # magic+descriptor — accept either (kafka-python/librdkafka do too)
    if (xxh32(descriptor) >> 8) & 0xFF != hc and (
        xxh32(data[p - 4 : p + desc_len]) >> 8
    ) & 0xFF != hc:
        raise ValueError("corrupt lz4 frame: header checksum mismatch")
    if has_dict:
        raise ValueError("lz4 frame requires a dictionary (unsupported)")
    content_size = (
        struct.unpack_from("<Q", data, p + 2)[0] if has_csize else None
    )
    p += desc_len + 1
    start = len(out)
    while True:
        if p + 4 > n:
            raise ValueError("corrupt lz4 frame: truncated block size")
        (bsize,) = struct.unpack_from("<I", data, p)
        p += 4
        if bsize == 0:  # EndMark
            break
        stored = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        if p + bsize > n:
            raise ValueError("corrupt lz4 frame: truncated block")
        block = data[p : p + bsize]
        p += bsize
        if b_checksum:
            if p + 4 > n:
                raise ValueError("corrupt lz4 frame: truncated block checksum")
            (want,) = struct.unpack_from("<I", data, p)
            p += 4
            if xxh32(block) != want:
                raise ValueError("corrupt lz4 frame: block checksum mismatch")
        if stored:
            out += block
        else:
            block_decompress(block, out)
    if c_checksum:
        if p + 4 > n:
            raise ValueError("corrupt lz4 frame: truncated content checksum")
        (want,) = struct.unpack_from("<I", data, p)
        p += 4
        if xxh32(bytes(out[start:])) != want:
            raise ValueError("corrupt lz4 frame: content checksum mismatch")
    if content_size is not None and len(out) - start != content_size:
        raise ValueError(
            f"corrupt lz4 frame: content size {content_size}, "
            f"decoded {len(out) - start}"
        )
    return p
