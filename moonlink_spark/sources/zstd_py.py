"""Pure-Python Zstandard codec (RFC 8878), dependency-free: a FULL
decoder plus a store-mode encoder.

Built for the Kafka wire source: brokers increasingly default to
``compression.type=zstd`` (codec id 4 in the RecordBatch attributes), and
this sandbox ships no zstd binding — so fetch must decode frames with
stdlib only. The encoder (``compress``) emits spec-legal raw/RLE-block
frames with the XXH64 checksum, so produce with codec 4 interoperates
with every zstd implementation; it does no entropy coding (ratio ~1 —
plug a real compressor in via ``kafka_wire.register_codec`` when
compression matters).

Implements the full decoding pipeline of RFC 8878 §3:
frame header / data blocks (raw, RLE, compressed), literal sections
(raw, RLE, Huffman single- and four-stream, treeless repeat), Huffman
tree descriptions (direct and FSE-compressed weights), sequence sections
(predefined / RLE / FSE-compressed / repeat modes), the backward
bitstream, repeat-offset history, skippable frames, multi-frame
concatenation, and the XXH64 content checksum. Dictionaries are not
supported (Kafka never uses them); a nonzero Dictionary_ID raises.

Like ``lz4_py``/``snappy_py``, correctness beats speed here: Python-level
throughput is fine for control-plane Kafka topics; plug a C codec in via
``register_codec`` for hot paths. Tested against pyarrow's bundled C
zstd as the oracle plus adversarial-input fuzzing (decoder never loops
or crashes on garbage; it raises ZstdError).
"""

from __future__ import annotations

ZSTD_MAGIC = 0xFD2FB528
SKIPPABLE_MAGIC_MIN = 0x184D2A50
SKIPPABLE_MAGIC_MAX = 0x184D2A5F

# hard ceiling on a single frame's decompressed size (Kafka RecordBatches
# are bounded by fetch.max.bytes anyway); prevents a hostile frame header
# from triggering an enormous allocation before any data is validated
MAX_OUTPUT = 1 << 31


class ZstdError(ValueError):
    pass


# --------------------------------------------------------------------------- #
# backward bitstream (RFC 8878 §3.1.1.4): bits are consumed from the LAST
# byte toward the first; the highest set bit of the last byte is a padding
# sentinel, not data
# --------------------------------------------------------------------------- #
class _BackStream:
    """Windowed reader: bits are addressed by absolute position from the
    stream start (LE bit order) and extracted from a small byte slice per
    read — O(bits-read) total, instead of the O(stream²) a whole-stream
    bignum costs on large Huffman literal streams."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        if not data:
            raise ZstdError("empty bitstream")
        last = data[-1]
        if last == 0:
            raise ZstdError("bitstream missing padding sentinel")
        self.data = data
        # bits of real data below the sentinel bit
        self.pos = (len(data) - 1) * 8 + last.bit_length() - 1

    def read(self, n: int) -> int:
        """Read ``n`` bits; reading past the start zero-fills (the FSE
        weight decoder's documented end condition) and drives ``pos``
        negative so callers can detect exhaustion."""
        if n == 0:
            return 0
        self.pos -= n
        pos = self.pos
        if pos >= 0:
            lo_byte = pos >> 3
            hi_byte = (pos + n + 7) >> 3
            chunk = int.from_bytes(self.data[lo_byte:hi_byte], "little")
            return (chunk >> (pos & 7)) & ((1 << n) - 1)
        # partial: take what remains, zero-fill the low side
        avail = n + pos
        if avail <= 0:
            return 0
        chunk = int.from_bytes(self.data[: (avail + 7) >> 3], "little")
        return (chunk & ((1 << avail) - 1)) << (n - avail)

    @property
    def exhausted(self) -> bool:
        return self.pos < 0


# --------------------------------------------------------------------------- #
# FSE (RFC 8878 §4.1)
# --------------------------------------------------------------------------- #
def _fse_read_distribution(data: bytes, off: int, max_acc: int):
    """Parse an FSE table description -> (probs list, accuracy_log, bytes
    consumed). Probabilities may include -1 ('less than one'). Follows
    RFC 8878 §4.1.1's variable-width value coding: values are read with
    ``nbits`` or ``nbits-1`` bits depending on a threshold, and the
    width shrinks as the remaining probability mass drops."""
    if off >= len(data):
        raise ZstdError("truncated FSE description")
    # forward bitstream, LSB first
    bitpos = 0

    def peek(n: int) -> int:
        byte0 = off + (bitpos >> 3)
        end = off + ((bitpos + n + 7) >> 3)
        if end > len(data):
            raise ZstdError("truncated FSE description")
        chunk = int.from_bytes(data[byte0:end], "little")
        return (chunk >> (bitpos & 7)) & ((1 << n) - 1)

    acc = peek(4) + 5
    bitpos += 4
    if acc > max_acc:
        raise ZstdError(f"FSE accuracy log {acc} > max {max_acc}")
    size = 1 << acc
    remaining = size + 1
    threshold = size
    nbits = acc + 1
    probs: list[int] = []
    prev_zero = False
    while remaining > 1 and len(probs) < 256:
        if prev_zero:
            # repeat-zero flags: 2 bits each, value 3 = keep reading
            while True:
                rep = peek(2)
                bitpos += 2
                probs.extend([0] * rep)
                if rep != 3:
                    break
            prev_zero = False
            if len(probs) >= 256:
                break
        mx = (2 * threshold - 1) - remaining
        v = peek(nbits)
        if (v & (threshold - 1)) < mx:
            count = v & (threshold - 1)
            bitpos += nbits - 1
        else:
            count = v
            if count >= threshold:
                count -= mx
            bitpos += nbits
        prob = count - 1
        probs.append(prob)
        remaining -= -prob if prob < 0 else prob
        prev_zero = prob == 0
        while remaining < threshold:
            nbits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ZstdError("FSE probabilities do not sum to table size")
    return probs, acc, (bitpos + 7) >> 3


def _fse_build_table(probs: list[int], acc: int):
    """Normalized probabilities -> decoding table: three parallel lists
    (symbol, nb_bits, baseline) indexed by state."""
    size = 1 << acc
    symbols = [0] * size
    high = size
    # '-1' symbols take one cell each at the top, nb_bits = acc
    for s, p in enumerate(probs):
        if p == -1:
            high -= 1
            symbols[high] = s
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, p in enumerate(probs):
        if p <= 0:
            continue
        for _ in range(p):
            symbols[pos] = s
            pos = (pos + step) & mask
            while pos >= high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ZstdError("FSE table spread did not return to zero")
    nb_bits = [0] * size
    baseline = [0] * size
    counters: dict[int, int] = {}
    for i in range(high):
        s = symbols[i]
        x = counters.get(s, probs[s])
        counters[s] = x + 1
        nb = acc - (x.bit_length() - 1)
        nb_bits[i] = nb
        baseline[i] = (x << nb) - size
    for i in range(high, size):
        nb_bits[i] = acc
        baseline[i] = 0
    return symbols, nb_bits, baseline


class _FseState:
    __slots__ = ("symbols", "nb_bits", "baseline", "state")

    def __init__(self, table, stream: _BackStream, acc: int):
        self.symbols, self.nb_bits, self.baseline = table
        self.state = stream.read(acc)

    @property
    def symbol(self) -> int:
        return self.symbols[self.state]

    def update(self, stream: _BackStream) -> None:
        bits = stream.read(self.nb_bits[self.state])
        self.state = self.baseline[self.state] + bits


def _fse_rle_table(symbol: int):
    return ([symbol], [0], [0])


# --------------------------------------------------------------------------- #
# Huffman (RFC 8878 §4.2)
# --------------------------------------------------------------------------- #
def _huf_read_weights(data: bytes, off: int):
    """Huffman tree description -> (weights list, bytes consumed)."""
    if off >= len(data):
        raise ZstdError("truncated Huffman description")
    hb = data[off]
    if hb >= 128:
        n = hb - 127
        nbytes = (n + 1) // 2
        if off + 1 + nbytes > len(data):
            raise ZstdError("truncated direct Huffman weights")
        weights = []
        for i in range(n):
            b = data[off + 1 + (i >> 1)]
            weights.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return weights, 1 + nbytes
    # FSE-compressed weights (accuracy <= 6), two interleaved states
    if off + 1 + hb > len(data):
        raise ZstdError("truncated FSE Huffman weights")
    comp = data[off + 1 : off + 1 + hb]
    # -1 ("less than one") probabilities are legal here per RFC 8878
    # §4.2.1; _fse_build_table assigns them top cells like any table
    probs, acc, used = _fse_read_distribution(comp, 0, 6)
    table = _fse_build_table(probs, acc)
    stream = _BackStream(comp[used:])
    s1 = _FseState(table, stream, acc)
    s2 = _FseState(table, stream, acc)
    weights: list[int] = []

    def emit(sym: int) -> None:
        # at most 255 explicit weights (the 256th symbol is implicit);
        # the exhaustion-break paths can emit past the loop guard, so
        # the cap is enforced on every append
        if len(weights) >= 255:
            raise ZstdError("more than 255 Huffman weights")
        weights.append(sym)

    while len(weights) < 255:
        emit(s1.symbol)
        s1.update(stream)
        if stream.exhausted:
            emit(s2.symbol)
            break
        emit(s2.symbol)
        s2.update(stream)
        if stream.exhausted:
            emit(s1.symbol)
            break
    else:
        raise ZstdError("more than 255 Huffman weights")
    return weights, 1 + hb


# RFC 8878 §4.2.1: Huffman code lengths never exceed 11 bits, so no
# weight may exceed 11 and the prefix table is at most 2^11 entries.
# Enforcing this BEFORE sizing anything is what keeps a hostile weight
# (e.g. 251 -> a 2^250-entry table) from becoming an unbounded
# allocation or an OverflowError escaping as non-ZstdError.
_HUF_MAX_BITS = 11


def _huf_build_table(weights: list[int]):
    """Weights (last one implicit) -> (prefix table, max_bits). The table
    maps every max_bits-wide bit prefix to (symbol, nb_bits)."""
    if len(weights) > 255:
        raise ZstdError("more than 255 Huffman weights")
    if any(w > _HUF_MAX_BITS for w in weights):
        raise ZstdError("Huffman weight exceeds the 11-bit code limit")
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ZstdError("empty Huffman table")
    max_bits = total.bit_length()  # log2 of next power of two
    if max_bits > _HUF_MAX_BITS:
        raise ZstdError("Huffman table exceeds the 11-bit depth limit")
    rem = (1 << max_bits) - total
    # remainder must itself be a power of two: it is the implicit last
    # symbol's weight
    if rem & (rem - 1):
        raise ZstdError("invalid Huffman weight sum")
    weights = weights + [rem.bit_length()]
    if any(w > max_bits for w in weights):
        raise ZstdError("Huffman weight exceeds table depth")
    table: list[tuple[int, int]] = [(0, 0)] * (1 << max_bits)
    cur = 0
    for w in range(1, max_bits + 1):
        for sym, sw in enumerate(weights):
            if sw != w:
                continue
            nb = max_bits + 1 - w
            count = 1 << (w - 1)
            entry = (sym, nb)
            for i in range(cur, cur + count):
                table[i] = entry
            cur += count
    if cur != 1 << max_bits:
        raise ZstdError("Huffman table not fully populated")
    return table, max_bits


def _huf_decode_stream(data: bytes, table, max_bits: int, n_out: int) -> bytearray:
    stream = _BackStream(data)
    out = bytearray()
    while len(out) < n_out:
        if stream.pos < 0:
            raise ZstdError("Huffman stream exhausted early")
        idx = stream.read(max_bits)
        sym, nb = table[idx]
        # only nb bits were really consumed
        stream.pos += max_bits - nb
        out.append(sym)
    return out


# --------------------------------------------------------------------------- #
# sequence code tables (RFC 8878 §3.1.1.3.2.1.1)
# --------------------------------------------------------------------------- #
_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [0] * 16 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]
_ML_BASE = list(range(3, 35)) + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [0] * 32 + [1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]

# predefined distributions (§3.1.1.3.2.2)
_LL_DEFAULT = (
    [4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1, 2, 2, 2, 2, 2, 2,
     2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1],
    6,
)
_ML_DEFAULT = (
    [1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1, -1, -1],
    6,
)
_OF_DEFAULT = (
    [1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
     1, 1, -1, -1, -1, -1, -1],
    5,
)


# --------------------------------------------------------------------------- #
# frame decoder
# --------------------------------------------------------------------------- #
class _FrameCtx:
    """Per-frame state that persists across blocks: the repeat Huffman
    table and the three repeat FSE tables + repeat offsets."""

    def __init__(self):
        self.huf = None  # (table, max_bits)
        self.ll = None  # (fse_table, acc)
        self.of = None
        self.ml = None
        self.reps = [1, 4, 8]


def _decode_literals(data: bytes, off: int, ctx: _FrameCtx):
    """-> (literals bytes, bytes consumed)."""
    if off >= len(data):
        raise ZstdError("truncated literals header")
    b0 = data[off]
    ltype = b0 & 3
    sf = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if sf in (0, 2):
            regen = b0 >> 3
            used = 1
        elif sf == 1:
            if off + 2 > len(data):
                raise ZstdError("truncated literals header")
            regen = (b0 >> 4) | (data[off + 1] << 4)
            used = 2
        else:
            if off + 3 > len(data):
                raise ZstdError("truncated literals header")
            regen = (b0 >> 4) | (data[off + 1] << 4) | (data[off + 2] << 12)
            used = 3
        if regen > MAX_OUTPUT:
            raise ZstdError("literals size over limit")
        if ltype == 0:
            if off + used + regen > len(data):
                raise ZstdError("truncated raw literals")
            return bytes(data[off + used : off + used + regen]), used + regen
        if off + used + 1 > len(data):
            raise ZstdError("truncated RLE literal")
        return bytes([data[off + used]]) * regen, used + 1
    # Compressed (2) / Treeless (3)
    hdr = int.from_bytes(data[off : off + 5].ljust(5, b"\x00"), "little")
    if sf == 0:
        streams, regen, comp, used = 1, (hdr >> 4) & 0x3FF, (hdr >> 14) & 0x3FF, 3
    elif sf == 1:
        streams, regen, comp, used = 4, (hdr >> 4) & 0x3FF, (hdr >> 14) & 0x3FF, 3
    elif sf == 2:
        streams, regen, comp, used = 4, (hdr >> 4) & 0x3FFF, (hdr >> 18) & 0x3FFF, 4
    else:
        streams, regen, comp, used = 4, (hdr >> 4) & 0x3FFFF, (hdr >> 22) & 0x3FFFF, 5
    if off + used + comp > len(data):
        raise ZstdError("truncated compressed literals")
    if regen > MAX_OUTPUT:
        raise ZstdError("literals size over limit")
    body = data[off + used : off + used + comp]
    bpos = 0
    if ltype == 2:
        weights, wused = _huf_read_weights(body, 0)
        ctx.huf = _huf_build_table(weights)
        bpos = wused
    if ctx.huf is None:
        raise ZstdError("treeless literals with no previous Huffman table")
    table, max_bits = ctx.huf
    if streams == 1:
        out = _huf_decode_stream(body[bpos:], table, max_bits, regen)
    else:
        if bpos + 6 > len(body):
            raise ZstdError("truncated jump table")
        s1 = int.from_bytes(body[bpos : bpos + 2], "little")
        s2 = int.from_bytes(body[bpos + 2 : bpos + 4], "little")
        s3 = int.from_bytes(body[bpos + 4 : bpos + 6], "little")
        bpos += 6
        sizes = [s1, s2, s3, len(body) - bpos - s1 - s2 - s3]
        if sizes[3] < 0:
            raise ZstdError("jump table exceeds literal payload")
        part = (regen + 3) // 4
        outs = [part, part, part, regen - 3 * part]
        if outs[3] < 0:
            raise ZstdError("regenerated size smaller than stream count")
        out = bytearray()
        for sz, n_out in zip(sizes, outs):
            out += _huf_decode_stream(body[bpos : bpos + sz], table, max_bits, n_out)
            bpos += sz
    if len(out) != regen:
        raise ZstdError("literal regeneration size mismatch")
    return bytes(out), used + comp


def _read_seq_table(data, off, mode, default, max_acc, prev, kind):
    """-> ((fse_table, acc), bytes consumed)."""
    if mode == 0:
        probs, acc = default
        return (_fse_build_table(probs, acc), acc), 0
    if mode == 1:
        if off >= len(data):
            raise ZstdError(f"truncated RLE {kind} table")
        return (_fse_rle_table(data[off]), 0), 1
    if mode == 2:
        probs, acc, used = _fse_read_distribution(data, off, max_acc)
        return (_fse_build_table(probs, acc), acc), used
    if prev is None:
        raise ZstdError(f"repeat {kind} table with no previous table")
    return prev, 0


def _decode_block(
    data: bytes, out: bytearray, ctx: _FrameCtx, frame_start: int
) -> None:
    literals, pos = _decode_literals(data, 0, ctx)
    if pos >= len(data):
        raise ZstdError("truncated sequences header")
    b0 = data[pos]
    if b0 < 128:
        nseq, pos = b0, pos + 1
    elif b0 < 255:
        if pos + 2 > len(data):
            raise ZstdError("truncated sequence count")
        nseq, pos = ((b0 - 128) << 8) | data[pos + 1], pos + 2
    else:
        if pos + 3 > len(data):
            raise ZstdError("truncated sequence count")
        nseq = int.from_bytes(data[pos + 1 : pos + 3], "little") + 0x7F00
        pos += 3
    if nseq == 0:
        out += literals
        return
    if pos >= len(data):
        raise ZstdError("truncated compression modes")
    modes = data[pos]
    pos += 1
    if modes & 3:
        raise ZstdError("reserved sequence mode bits set")
    ctx.ll, used = _read_seq_table(
        data, pos, (modes >> 6) & 3, _LL_DEFAULT, 9, ctx.ll, "literal-length"
    )
    pos += used
    ctx.of, used = _read_seq_table(
        data, pos, (modes >> 4) & 3, _OF_DEFAULT, 8, ctx.of, "offset"
    )
    pos += used
    ctx.ml, used = _read_seq_table(
        data, pos, (modes >> 2) & 3, _ML_DEFAULT, 9, ctx.ml, "match-length"
    )
    pos += used

    stream = _BackStream(data[pos:])
    ll_s = _FseState(ctx.ll[0], stream, ctx.ll[1])
    of_s = _FseState(ctx.of[0], stream, ctx.of[1])
    ml_s = _FseState(ctx.ml[0], stream, ctx.ml[1])
    if stream.exhausted:
        raise ZstdError("sequence bitstream shorter than initial states")
    lit_pos = 0
    reps = ctx.reps
    for i in range(nseq):
        of_code = of_s.symbol
        if of_code > 31:
            raise ZstdError("offset code out of range")
        ov = (1 << of_code) + stream.read(of_code)
        ml_code = ml_s.symbol
        if ml_code >= len(_ML_BASE):
            raise ZstdError("match-length code out of range")
        ml = _ML_BASE[ml_code] + stream.read(_ML_BITS[ml_code])
        ll_code = ll_s.symbol
        if ll_code >= len(_LL_BASE):
            raise ZstdError("literal-length code out of range")
        ll = _LL_BASE[ll_code] + stream.read(_LL_BITS[ll_code])
        if stream.pos < 0:
            raise ZstdError("sequence bitstream exhausted mid-sequence")
        # resolve repeat offsets
        if ov > 3:
            offset = ov - 3
            reps[:] = [offset, reps[0], reps[1]]
        else:
            idx = ov - 1 if ll != 0 else ov
            if idx == 0:
                offset = reps[0]
            elif idx == 1:
                offset = reps[1]
                reps[0], reps[1] = offset, reps[0]
            elif idx == 2:
                offset = reps[2]
                reps[:] = [offset, reps[0], reps[1]]
            else:
                offset = reps[0] - 1
                if offset == 0:
                    raise ZstdError("repeat offset underflow")
                reps[:] = [offset, reps[0], reps[1]]
        if lit_pos + ll > len(literals):
            raise ZstdError("sequence literals overrun")
        out += literals[lit_pos : lit_pos + ll]
        lit_pos += ll
        # matches may not reach past the CURRENT frame's start (RFC
        # 8878 §3.1.1.1: frames are independent); checking against the
        # concatenated multi-frame output would silently accept corrupt
        # cross-frame matches instead of raising
        if offset > len(out) - frame_start:
            raise ZstdError("match offset beyond window")
        if len(out) + ml > MAX_OUTPUT:
            raise ZstdError("output over limit")
        if offset >= ml:
            start = len(out) - offset
            out += out[start : start + ml]
        else:
            for _ in range(ml):  # overlapping copy
                out.append(out[-offset])
        if i != nseq - 1:
            ll_s.update(stream)
            ml_s.update(stream)
            of_s.update(stream)
    if stream.pos != 0:
        raise ZstdError("sequence bitstream not fully consumed")
    out += literals[lit_pos:]


def _xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 (public spec) for the optional content checksum."""
    P1, P2, P3, P4, P5 = (
        0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
        0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5,
    )
    M = (1 << 64) - 1

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i + 32 <= n:
            for _ in range(4):
                lane = int.from_bytes(data[i : i + 8], "little")
                if _ == 0:
                    v1 = (rotl((v1 + lane * P2) & M, 31) * P1) & M
                elif _ == 1:
                    v2 = (rotl((v2 + lane * P2) & M, 31) * P1) & M
                elif _ == 2:
                    v3 = (rotl((v3 + lane * P2) & M, 31) * P1) & M
                else:
                    v4 = (rotl((v4 + lane * P2) & M, 31) * P1) & M
                i += 8
        h = (rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h = ((h ^ (rotl((v * P2) & M, 31) * P1) & M) * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i + 8 <= n:
        lane = int.from_bytes(data[i : i + 8], "little")
        h = ((rotl(h ^ (rotl((lane * P2) & M, 31) * P1) & M, 27) * P1) + P4) & M
        i += 8
    if i + 4 <= n:
        lane = int.from_bytes(data[i : i + 4], "little")
        h = ((rotl(h ^ (lane * P1) & M, 23) * P2) + P3) & M
        i += 4
    while i < n:
        h = (rotl(h ^ (data[i] * P5) & M, 11) * P1) & M
        i += 1
    h = ((h ^ (h >> 33)) * P2) & M
    h = ((h ^ (h >> 29)) * P3) & M
    return h ^ (h >> 32)


def decompress(data: bytes) -> bytes:
    """Decode one or more concatenated zstd frames (skippable frames are
    skipped). Raises :class:`ZstdError` on any malformed input."""
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise ZstdError("truncated frame magic")
        magic = int.from_bytes(data[pos : pos + 4], "little")
        pos += 4
        if SKIPPABLE_MAGIC_MIN <= magic <= SKIPPABLE_MAGIC_MAX:
            if pos + 4 > n:
                raise ZstdError("truncated skippable frame")
            sz = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4 + sz
            if pos > n:
                raise ZstdError("skippable frame overruns input")
            continue
        if magic != ZSTD_MAGIC:
            raise ZstdError(f"bad zstd magic 0x{magic:08x}")
        if pos >= n:
            raise ZstdError("truncated frame header")
        fhd = data[pos]
        pos += 1
        if fhd & 0x08:
            raise ZstdError("reserved frame header bit set")
        single_segment = bool(fhd & 0x20)
        checksum = bool(fhd & 0x04)
        did_size = (0, 1, 2, 4)[fhd & 3]
        fcs_flag = fhd >> 6
        fcs_size = (1 if single_segment else 0, 2, 4, 8)[fcs_flag]
        if not single_segment:
            if pos >= n:
                raise ZstdError("truncated window descriptor")
            pos += 1  # window size: informational (whole output is kept)
        if did_size:
            if pos + did_size > n:
                raise ZstdError("truncated dictionary id")
            did = int.from_bytes(data[pos : pos + did_size], "little")
            pos += did_size
            if did != 0:
                raise ZstdError(f"dictionaries unsupported (id {did})")
        fcs = None
        if fcs_size:
            if pos + fcs_size > n:
                raise ZstdError("truncated frame content size")
            fcs = int.from_bytes(data[pos : pos + fcs_size], "little")
            if fcs_size == 2:
                fcs += 256
            pos += fcs_size
            if fcs > MAX_OUTPUT:
                raise ZstdError("declared content size over limit")
        frame_start = len(out)
        ctx = _FrameCtx()
        while True:
            if pos + 3 > n:
                raise ZstdError("truncated block header")
            bh = int.from_bytes(data[pos : pos + 3], "little")
            pos += 3
            last = bh & 1
            btype = (bh >> 1) & 3
            bsize = bh >> 3
            if btype == 0:
                if pos + bsize > n:
                    raise ZstdError("truncated raw block")
                out += data[pos : pos + bsize]
                pos += bsize
            elif btype == 1:
                if pos >= n:
                    raise ZstdError("truncated RLE block")
                if len(out) + bsize > MAX_OUTPUT:
                    raise ZstdError("output over limit")
                out += bytes([data[pos]]) * bsize
                pos += 1
            elif btype == 2:
                if pos + bsize > n:
                    raise ZstdError("truncated compressed block")
                _decode_block(data[pos : pos + bsize], out, ctx, frame_start)
                pos += bsize
            else:
                raise ZstdError("reserved block type")
            if len(out) > MAX_OUTPUT:
                raise ZstdError("output over limit")
            if last:
                break
        if fcs is not None and len(out) - frame_start != fcs:
            raise ZstdError(
                f"content size mismatch: {len(out) - frame_start} != {fcs}"
            )
        if checksum:
            if pos + 4 > n:
                raise ZstdError("truncated content checksum")
            want = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
            got = _xxh64(bytes(out[frame_start:])) & 0xFFFFFFFF
            if got != want:
                raise ZstdError("content checksum mismatch")
    return bytes(out)


# --------------------------------------------------------------------------- #
# store-mode ENCODER (round 11): spec-legal RFC 8878 frames built from raw
# and RLE blocks plus the XXH64 content checksum — no entropy coding, so
# the ratio is ~1 (RLE wins on runs), but every zstd implementation
# decodes the output. This completes the Kafka codec matrix: produce with
# codec 4 emits frames any broker/consumer accepts, instead of silently
# negotiating down (see kafka_wire._zstd_compress). For real compression
# plug a C binding in via kafka_wire.register_codec.
# --------------------------------------------------------------------------- #

_MAX_BLOCK = 128 * 1024  # RFC 8878 §3.1.1.2.3 block size ceiling
_MIN_RLE_RUN = 32  # below this a raw block is cheaper than a block split


def compress(data: bytes) -> bytes:
    """Encode ``data`` as one zstd frame (single-segment, content size
    declared, XXH64 checksum). Chunks ride in raw blocks; single-byte
    runs >= 32 bytes become RLE blocks (1 payload byte regenerates the
    run)."""
    data = bytes(data)
    n = len(data)
    out = bytearray(ZSTD_MAGIC.to_bytes(4, "little"))
    # frame header: single_segment + checksum, FCS width by magnitude.
    # single-segment => no window descriptor; window size = FCS.
    if n <= 255:
        fcs_flag, fcs_bytes = 0, n.to_bytes(1, "little")
    elif n <= 65535 + 256:
        fcs_flag, fcs_bytes = 1, (n - 256).to_bytes(2, "little")
    elif n < (1 << 32):
        fcs_flag, fcs_bytes = 2, n.to_bytes(4, "little")
    else:
        fcs_flag, fcs_bytes = 3, n.to_bytes(8, "little")
    out.append((fcs_flag << 6) | 0x20 | 0x04)
    out += fcs_bytes

    def block_header(last: int, btype: int, bsize: int) -> bytes:
        return (last | (btype << 1) | (bsize << 3)).to_bytes(3, "little")

    if n == 0:
        out += block_header(1, 0, 0)  # one empty raw block closes the frame
    else:
        # split into maximal segments: RLE for long single-byte runs,
        # raw otherwise; every segment capped at the 128 KiB block limit
        segs: list[tuple[int, int, int]] = []  # (btype, start, length)
        i = 0
        while i < n:
            b = data[i]
            j = i + 1
            while j < n and data[j] == b:
                j += 1
            run = j - i
            if run >= _MIN_RLE_RUN:
                while run > 0:
                    take = min(run, _MAX_BLOCK)
                    segs.append((1, i, take))
                    i += take
                    run -= take
            else:
                # extend a pending raw segment instead of fragmenting
                if segs and segs[-1][0] == 0 and segs[-1][2] < _MAX_BLOCK:
                    btype, start, length = segs[-1]
                    take = min(run, _MAX_BLOCK - length)
                    segs[-1] = (0, start, length + take)
                    i += take
                else:
                    take = min(run, _MAX_BLOCK)
                    segs.append((0, i, take))
                    i += take
        for k, (btype, start, length) in enumerate(segs):
            last = 1 if k == len(segs) - 1 else 0
            if btype == 1:
                out += block_header(last, 1, length)
                out.append(data[start])
            else:
                out += block_header(last, 0, length)
                out += data[start : start + length]
    out += (_xxh64(data) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)
