"""Property-based round-trips for the round-4 binary codecs: roaring64,
Z85, deletion-vector blobs, bincode varints, Avro datums, and the
scan-result wire blob. Hypothesis hammers the layouts the unit tests
spot-check."""

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from moonlink_spark.rpc import (
    TableMetadataBlob,
    dec_varint,
    decode_request,
    enc_varint,
    encode_request,
)
from moonlink_spark.sources.avro_binary import decode_record, encode_datum
from moonlink_spark.table.delta_export import _z85_decode, _z85_encode
from moonlink_spark.table.puffin import (
    deserialize_roaring64,
    dv_blob_bytes,
    parse_dv_blob,
    serialize_roaring64,
)

positions = st.lists(
    st.integers(min_value=0, max_value=2**40), min_size=0, max_size=400
)


@settings(max_examples=200, deadline=None)
@given(positions)
def test_roaring64_roundtrip_prop(ps):
    assert deserialize_roaring64(serialize_roaring64(ps)) == sorted(set(ps))


@settings(max_examples=200, deadline=None)
@given(positions)
def test_dv_blob_roundtrip_prop(ps):
    assert parse_dv_blob(dv_blob_bytes(ps)) == sorted(set(ps))


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_z85_roundtrip_prop(raw):
    assert _z85_decode(_z85_encode(raw), len(raw)) == raw


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=2**64 - 1))
def test_varint_roundtrip_prop(v):
    buf = enc_varint(v)
    got, pos = dec_varint(buf, 0)
    assert got == v and pos == len(buf)


@settings(max_examples=100, deadline=None)
@given(
    st.text(max_size=40),
    st.text(max_size=40),
    st.integers(min_value=0, max_value=2**63),
)
def test_rpc_request_roundtrip_prop(db, tbl, lsn):
    name, kw = decode_request(
        encode_request("scan_table_begin", database=db, table=tbl, lsn=lsn)
    )
    assert name == "scan_table_begin"
    assert kw == {"database": db, "table": tbl, "lsn": lsn}


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.text(min_size=1, max_size=30), max_size=10),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=2**31),
        ),
        max_size=50,
    ),
)
def test_table_metadata_blob_roundtrip_prop(files, pds):
    blob = TableMetadataBlob(
        data_files=files, position_deletes=sorted(pds)
    )
    assert TableMetadataBlob.decode(blob.encode()) == blob


AVRO_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "l", "type": "long"},
        {"name": "d", "type": "double"},
        {"name": "s", "type": "string"},
        {"name": "b", "type": "bytes"},
        {"name": "m", "type": ["null", "string"]},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "dec", "type": {"type": "bytes", "logicalType": "decimal",
                                  "precision": 20, "scale": 4}},
    ],
}

avro_rows = st.fixed_dictionaries(
    {
        "l": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "d": st.floats(allow_nan=False, allow_infinity=False, width=64),
        "s": st.text(max_size=60),
        "b": st.binary(max_size=60),
        "m": st.none() | st.text(max_size=20),
        "arr": st.lists(
            st.integers(min_value=-(2**40), max_value=2**40), max_size=20
        ),
        "dec": st.decimals(
            min_value=Decimal("-1e12"),
            max_value=Decimal("1e12"),
            places=4,
            allow_nan=False,
            allow_infinity=False,
        ),
    }
)


@settings(max_examples=200, deadline=None)
@given(avro_rows)
def test_avro_datum_roundtrip_prop(row):
    back = decode_record(AVRO_SCHEMA, encode_datum(AVRO_SCHEMA, row))
    assert back == row


@settings(max_examples=300, deadline=None)
@given(
    st.one_of(
        st.binary(max_size=5000),
        # repetitive shapes exercise the copy-element paths hard
        st.builds(
            lambda unit, reps, tail: unit * reps + tail,
            st.binary(min_size=1, max_size=20),
            st.integers(min_value=0, max_value=2000),
            st.binary(max_size=50),
        ),
    )
)
def test_snappy_roundtrip_prop(payload):
    from moonlink_spark.sources.snappy_py import (
        compress,
        decompress,
        raw_compress,
        raw_decompress,
    )

    assert raw_decompress(raw_compress(payload)) == payload
    assert decompress(compress(payload)) == payload


@settings(max_examples=120, deadline=None)
@given(
    st.one_of(
        st.binary(max_size=5000),
        # repetitive shapes exercise the match/overlap paths hard
        st.builds(
            lambda unit, reps, tail: unit * reps + tail,
            st.binary(min_size=1, max_size=20),
            st.integers(min_value=0, max_value=2000),
            st.binary(max_size=50),
        ),
    )
)
def test_lz4_roundtrip_prop(payload):
    from moonlink_spark.sources.lz4_py import (
        block_compress,
        block_decompress,
        compress,
        decompress,
    )

    out = bytearray()
    block_decompress(block_compress(payload), out)
    assert bytes(out) == payload
    assert decompress(compress(payload)) == payload


@settings(max_examples=80, deadline=None)
@given(
    st.one_of(
        st.binary(max_size=5000),
        # repetitive shapes exercise sequences/repeat-offsets hard
        st.builds(
            lambda unit, reps, tail: unit * reps + tail,
            st.binary(min_size=1, max_size=20),
            st.integers(min_value=0, max_value=2000),
            st.binary(max_size=50),
        ),
        # low-entropy text: Huffman literals + FSE-compressed weights
        st.text(alphabet="abcdefgh \n", max_size=5000).map(str.encode),
    ),
    st.sampled_from([1, 3, 9, 19]),
)
def test_zstd_decode_matches_pyarrow_oracle(payload, level):
    """The pure-Python RFC 8878 decoder must invert the bundled C
    compressor at every level (raw/RLE/compressed blocks, single- and
    four-stream Huffman, all sequence table modes)."""
    import pyarrow as pa

    from moonlink_spark.sources.zstd_py import decompress

    comp = pa.Codec("zstd", compression_level=level).compress(
        payload, asbytes=True
    )
    assert decompress(comp) == payload


def test_zstd_multiframe_skippable_and_checksum():
    import pyarrow as pa

    import pytest

    from moonlink_spark.sources.zstd_py import _xxh64, decompress

    c = pa.Codec("zstd")
    a = c.compress(b"first frame " * 50, asbytes=True)
    b = c.compress(b"second", asbytes=True)
    skip = (0x184D2A50).to_bytes(4, "little") + (7).to_bytes(4, "little") + b"padding"
    assert decompress(a + skip + b) == b"first frame " * 50 + b"second"
    # hand-build a checksummed frame: set FHD bit 2, append xxh64 low32
    raw = bytearray(a)
    assert raw[4] & 0x04 == 0  # pyarrow emits no checksum by default
    raw[4] |= 0x04
    good = bytes(raw) + (
        _xxh64(b"first frame " * 50) & 0xFFFFFFFF
    ).to_bytes(4, "little")
    assert decompress(good) == b"first frame " * 50
    bad = good[:-1] + bytes([good[-1] ^ 1])
    with pytest.raises(ValueError, match="checksum"):
        decompress(bad)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400), st.integers(min_value=0, max_value=3))
def test_zstd_adversarial_bytes_never_hang_or_crash(junk, prefix_kind):
    """Untrusted-bytes contract (same as the snappy/lz4 fuzz suites):
    arbitrary garbage — bare, magic-prefixed, or a mutated valid frame —
    either decodes or raises ZstdError; never an unbounded loop, never
    MemoryError, never a non-ZstdError exception."""
    import pyarrow as pa

    from moonlink_spark.sources.zstd_py import ZstdError, decompress

    if prefix_kind == 1:
        data = (0xFD2FB528).to_bytes(4, "little") + junk
    elif prefix_kind == 2:
        data = (0x184D2A50).to_bytes(4, "little") + junk
    elif prefix_kind == 3 and junk:
        base = bytearray(
            pa.Codec("zstd").compress(b"seed data " * 30, asbytes=True)
        )
        for i, b in enumerate(junk[:16]):
            base[(7 + i * 11) % len(base)] ^= b or 1
        data = bytes(base)
    else:
        data = junk
    try:
        decompress(data)
    except ZstdError:
        pass


def test_zstd_hostile_huffman_weights_bounded():
    """Review r10: RFC 8878 caps Huffman code length at 11 bits; a
    crafted weight table must raise ZstdError BEFORE sizing the prefix
    table — not OverflowError/MemoryError from a 2^250-entry list."""
    import pytest

    from moonlink_spark.sources.zstd_py import ZstdError, _huf_build_table

    with pytest.raises(ZstdError):
        _huf_build_table([251])  # would size a 2^250 table
    with pytest.raises(ZstdError):
        _huf_build_table([35, 35])  # ~256 GB table
    with pytest.raises(ZstdError):
        _huf_build_table([12])  # one past the 11-bit limit
    with pytest.raises(ZstdError):
        _huf_build_table([1] * 256)  # more than 255 explicit weights
    table, max_bits = _huf_build_table([11])  # at the limit: fine
    assert max_bits == 11


def test_zstd_cross_frame_match_rejected():
    """Review r10: matches may not reach past the current frame's start
    (frames are independent per RFC 8878). A corrupt second frame whose
    sequence points back into frame 1's bytes must raise, not silently
    decode garbage from the previous frame."""
    import pyarrow as pa
    import pytest

    from moonlink_spark.sources.zstd_py import ZstdError, decompress

    frame1 = pa.Codec("zstd").compress(b"0123456789", asbytes=True)
    # hand-built frame: raw literals "ab", one sequence via RLE tables
    # (LL code 0 -> ll=0, OF code 3 + 3 extra bits 0b100 -> offset 9,
    # ML code 0 -> ml=3). Offset 9 exceeds this frame's own output (0
    # bytes at match time) but fits inside frame1's 10 bytes.
    block = bytes(
        [0x10, ord("a"), ord("b"), 0x01, 0x54, 0x00, 0x03, 0x00, 0x0C]
    )
    bh = 1 | (2 << 1) | (len(block) << 3)
    frame2 = (
        (0xFD2FB528).to_bytes(4, "little")
        + bytes([0x00, 0x00])  # FHD, window descriptor
        + bh.to_bytes(3, "little")
        + block
    )
    with pytest.raises(ZstdError, match="window"):
        decompress(frame2)  # standalone: offset beyond empty frame
    with pytest.raises(ZstdError, match="window"):
        decompress(frame1 + frame2)  # and cross-frame: still rejected


def test_zstd_cli_oracle_with_checksums():
    """Second oracle: the reference zstd CLI (when present) at several
    levels WITH --content-size and checksums — pyarrow's codec emits
    neither, so this leg covers the frame-content-size and XXH64 paths
    against reference-encoder output."""
    import shutil
    import subprocess

    from moonlink_spark.sources.zstd_py import decompress

    cli = shutil.which("zstd")
    if cli is None:
        pytest.skip("zstd CLI not on PATH")
    payloads = [
        b"",
        b"hello world " * 2000,
        bytes(range(256)) * 500,
        b"ababababab" * 10_000,
    ]
    for lvl in (1, 3, 12, 19, 22):
        for data in payloads:
            proc = subprocess.run(
                [cli, "--ultra", f"-{lvl}", "-c", "--content-size", "-C"],
                input=data, capture_output=True, check=True,
            )
            assert decompress(proc.stdout) == data
    # --no-check / long mode variants
    proc = subprocess.run(
        [cli, "-19", "-c", "--no-check"], input=payloads[1],
        capture_output=True, check=True,
    )
    assert decompress(proc.stdout) == payloads[1]


def test_zstd_differential_fuzz_vs_cli():
    """Differential fuzz: mutated real frames through BOTH decoders.
    When both accept, outputs must be byte-identical; single-sided
    rejects are fine (strictness may differ on corrupt input), but an
    output DISAGREEMENT means one of them mis-decodes. A 5000-case
    campaign at review time found zero crashes/mismatches/asymmetries;
    this keeps a bounded seeded slice of it in CI."""
    import random
    import shutil
    import subprocess

    import pyarrow as pa

    from moonlink_spark.sources.zstd_py import ZstdError, decompress

    cli = shutil.which("zstd")
    if cli is None:
        pytest.skip("zstd CLI not on PATH")
    rng = random.Random(1234)
    seeds = []
    for payload in [b"hello world " * 500, bytes(2000), b"abcabc" * 3000]:
        seeds.append(pa.Codec("zstd").compress(payload, asbytes=True))
        seeds.append(
            subprocess.run(
                [cli, "-9", "-c", "--content-size", "-C"],
                input=payload, capture_output=True, check=True,
            ).stdout
        )
    for i in range(300):
        base = bytearray(rng.choice(seeds))
        kind = rng.randrange(3)
        if kind == 0:
            for _ in range(rng.randrange(1, 4)):
                base[rng.randrange(len(base))] ^= 1 << rng.randrange(8)
        elif kind == 1:
            base = base[: rng.randrange(1, len(base))]
        else:
            other = rng.choice(seeds)
            cut = rng.randrange(1, min(len(base), len(other)))
            base = base[:cut] + other[cut:]
        data = bytes(base)
        p = subprocess.run([cli, "-d", "-c"], input=data, capture_output=True)
        ref = p.stdout if p.returncode == 0 else None
        try:
            mine = decompress(data)
        except ZstdError:
            mine = None
        if ref is not None and mine is not None:
            assert ref == mine, f"case {i}: decoders disagree on output"


# --------------------------------------------------------------------------- #
# store-mode ENCODER (round 11): produce-side zstd
# --------------------------------------------------------------------------- #


@given(payload=st.binary(max_size=400_000))
@settings(max_examples=60, deadline=None)
def test_zstd_encoder_roundtrips_own_decoder(payload):
    from moonlink_spark.sources.zstd_py import compress, decompress

    assert decompress(compress(payload)) == payload


def test_zstd_encoder_decodes_by_reference_cli_and_pyarrow():
    """The store-mode encoder's frames must decode by EVERY zstd: the
    reference CLI and pyarrow's bundled C zstd, across empty/runs/
    incompressible/block-boundary shapes (raw + RLE block paths)."""
    import os
    import shutil
    import subprocess
    import tempfile

    import pyarrow as pa

    from moonlink_spark.sources.zstd_py import _MAX_BLOCK, compress

    payloads = [
        b"",
        b"a",
        b"x" * 31,                      # below the RLE threshold: raw
        b"x" * 32,                      # at the threshold: RLE
        b"\x00" * (_MAX_BLOCK + 17),    # RLE run across the block cap
        os.urandom(_MAX_BLOCK * 2 + 5), # raw blocks across the cap
        b"head" + b"r" * 50_000 + b"tail" + os.urandom(1000),
        b"ab" * 100_000,                # alternating: pure raw
    ]
    cli = shutil.which("zstd")
    for data in payloads:
        enc = compress(data)
        got = pa.Codec("zstd").decompress(enc, len(data)).to_pybytes()
        assert got == data
        if cli is not None:
            with tempfile.NamedTemporaryFile(suffix=".zst", delete=False) as fh:
                fh.write(enc)
                p = fh.name
            try:
                proc = subprocess.run(
                    [cli, "-d", "-c", p], capture_output=True, check=True
                )
                assert proc.stdout == data
            finally:
                os.unlink(p)


@given(payload=st.binary(max_size=100_000))
@settings(max_examples=25, deadline=None)
def test_zstd_encoder_pyarrow_decodes_property(payload):
    import pyarrow as pa

    from moonlink_spark.sources.zstd_py import compress

    enc = compress(payload)
    assert pa.Codec("zstd").decompress(enc, len(payload)).to_pybytes() == payload
