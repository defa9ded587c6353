"""Pure-Python Snappy codec with the xerial (snappy-java) block framing
Kafka producers use for ``compression.type=snappy``.

Raw-snappy follows the public format description
(github.com/google/snappy ``format_description.txt``): a little-endian
uvarint preamble with the uncompressed length, then tagged elements —
literals (tag&3==0) and back-reference copies with 1/2/4-byte offsets
(tag&3 == 1/2/3); copies may overlap and replicate byte-by-byte.

Kafka's snappy messages are NOT bare raw-snappy: snappy-java wraps them
in the xerial block format (public: xerial/snappy-java
``SnappyCodec.java``) — an 8-byte magic ``\\x82SNAPPY\\x00``, two
big-endian int32 version fields, then repeated ``int32-BE length +
raw-snappy block``. The decoder here accepts both framings (bare raw
payloads appear from some librdkafka configurations); the compressor
always emits xerial so real snappy-java consumers can read it.

The encoder is a greedy LZ77 with a 4-byte-hash match table emitting
only 2-byte-offset copies (offsets ≤ 64 KiB — matching the 32 KiB
xerial block size) and literals; that is a strict subset of valid
snappy, so any spec decoder reads it. This is the slow-but-built-in
path — measured on this host: decompress ~60 MB/s on repetitive
JSON-ish payloads (~1.3 GB/s on incompressible = one literal),
compress ~3-8 MB/s. The consumer leg (brokers SEND snappy) is the one
that matters out of the box and decompress feeds the Arrow-batched
decoder; for hot produce loops register a C codec via
``register_codec``.

Reference parity: moonlink's rdkafka decodes snappy natively
(src/moonlink_connectors — rust-rdkafka's bundled codecs); this closes
the "brokers default to snappy" gap without a non-stdlib dependency.
"""

from __future__ import annotations

_XERIAL_MAGIC = b"\x82SNAPPY\x00"
_XERIAL_HEADER = _XERIAL_MAGIC + (1).to_bytes(4, "big") + (1).to_bytes(4, "big")
_BLOCK = 32 * 1024  # snappy-java default block size


# -- raw snappy -----------------------------------------------------------


def _write_uvarint(out: bytearray, v: int) -> None:
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def _read_uvarint(data: bytes, p: int) -> tuple[int, int]:
    v = shift = 0
    while True:
        if p >= len(data):
            raise ValueError("corrupt snappy: truncated length preamble")
        b = data[p]
        p += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, p
        shift += 7
        if shift > 35:
            raise ValueError("corrupt snappy: uvarint overflow")


def _emit_literal(out: bytearray, data: bytes, start: int, end: int) -> None:
    ln = end - start
    if ln <= 0:
        return
    L = ln - 1
    if L < 60:
        out.append(L << 2)
    else:
        nb = (L.bit_length() + 7) // 8
        out.append((59 + nb) << 2)
        out += L.to_bytes(nb, "little")
    out += data[start:end]


def raw_compress(data: bytes) -> bytes:
    out = bytearray()
    _write_uvarint(out, len(data))
    n = len(data)
    i = lit_start = 0
    table: dict[bytes, int] = {}
    while i + 4 <= n:
        key = data[i : i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is None or i - cand > 0xFFFF:
            i += 1
            continue
        m = 4
        while i + m < n and data[cand + m] == data[i + m]:
            m += 1
        _emit_literal(out, data, lit_start, i)
        off = i - cand
        off_le = off.to_bytes(2, "little")
        rem = m
        while rem >= 4:
            # chunk to ≤64 so the 6-bit length field fits, never
            # leaving a 1-3 byte tail (too short for a copy element)
            if rem <= 64:
                take = rem
            elif rem >= 68:
                take = 64
            else:
                take = 60
            out.append(((take - 1) << 2) | 2)
            out += off_le
            rem -= take
        i += m - rem
        lit_start = i
    _emit_literal(out, data, lit_start, n)
    return bytes(out)


def raw_decompress(data: bytes) -> bytes:
    explen, p = _read_uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while p < n:
        tag = data[p]
        p += 1
        t = tag & 3
        if t == 0:  # literal
            L = tag >> 2
            if L >= 60:
                nb = L - 59
                if p + nb > n:
                    raise ValueError("corrupt snappy: truncated literal len")
                L = int.from_bytes(data[p : p + nb], "little")
                p += nb
            L += 1
            if p + L > n:
                raise ValueError("corrupt snappy: truncated literal")
            out += data[p : p + L]
            p += L
            continue
        if t == 1:  # copy, 1-byte offset (3-bit len 4..11)
            if p >= n:
                raise ValueError("corrupt snappy: truncated copy")
            L = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | data[p]
            p += 1
        elif t == 2:  # copy, 2-byte LE offset
            if p + 2 > n:
                raise ValueError("corrupt snappy: truncated copy")
            L = (tag >> 2) + 1
            off = int.from_bytes(data[p : p + 2], "little")
            p += 2
        else:  # copy, 4-byte LE offset
            if p + 4 > n:
                raise ValueError("corrupt snappy: truncated copy")
            L = (tag >> 2) + 1
            off = int.from_bytes(data[p : p + 4], "little")
            p += 4
        if off == 0 or off > len(out):
            raise ValueError("corrupt snappy: copy offset out of range")
        start = len(out) - off
        if off >= L:
            out += out[start : start + L]
        else:  # overlapping copy replicates byte-by-byte (RLE shape)
            for k in range(L):
                out.append(out[start + k])
    if len(out) != explen:
        raise ValueError(
            f"corrupt snappy: expected {explen} bytes, produced {len(out)}"
        )
    return bytes(out)


# -- xerial block framing (what Kafka snappy payloads actually are) --------


def compress(data: bytes) -> bytes:
    """Xerial-framed snappy: what ``compression.type=snappy`` producers
    (snappy-java) emit and consumers expect."""
    out = bytearray(_XERIAL_HEADER)
    for i in range(0, len(data), _BLOCK):
        block = raw_compress(data[i : i + _BLOCK])
        out += len(block).to_bytes(4, "big")
        out += block
    if not data:  # zero blocks is legal, but emit one for parity
        block = raw_compress(b"")
        out += len(block).to_bytes(4, "big")
        out += block
    return bytes(out)


def decompress(data: bytes) -> bytes:
    """Decode either framing: xerial block stream (magic-prefixed) or a
    bare raw-snappy payload (seen from some librdkafka configs)."""
    if not data.startswith(_XERIAL_MAGIC):
        return raw_decompress(data)
    p = 16  # magic 8 + version 4 + compat 4
    out = bytearray()
    n = len(data)
    while p < n:
        if p + 4 > n:
            raise ValueError("corrupt xerial snappy: truncated block length")
        blen = int.from_bytes(data[p : p + 4], "big")
        p += 4
        if p + blen > n:
            raise ValueError("corrupt xerial snappy: truncated block")
        out += raw_decompress(data[p : p + blen])
        p += blen
    return bytes(out)
