"""Python-UDTF document chunking: window arithmetic + lateral-join shape."""

from moonlink_spark.operators.chunking import (
    CHUNK_OVERLAP,
    CHUNK_TOKENS,
    _chunks,
    chunk_documents_udtf,
)


def test_chunk_windows_cover_and_overlap():
    text = " ".join(f"t{i}" for i in range(200))
    chunks = _chunks(text)
    # full coverage: every token appears in some chunk
    seen = set()
    for _, chunk, n in chunks:
        toks = chunk.split()
        assert len(toks) == n <= CHUNK_TOKENS
        seen.update(toks)
    assert len(seen) == 200
    # consecutive chunks overlap by exactly CHUNK_OVERLAP tokens
    a, b = chunks[0][1].split(), chunks[1][1].split()
    assert a[-CHUNK_OVERLAP:] == b[:CHUNK_OVERLAP]
    # short docs produce one chunk, empty-ish docs still terminate
    assert len(_chunks("one two three")) == 1
    assert _chunks("") == []  # no tokens -> no chunks


def test_chunk_udtf_lateral_join(spark):
    chunk_documents_udtf(spark)
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(100))), (2, "short doc")],
        "doc_id long, text string",
    )
    df.createOrReplaceTempView("__t")
    out = spark.sql(
        "SELECT doc_id, chunk_idx, n_tokens FROM __t, LATERAL doc_chunks(text)"
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["chunk_idx"], r["n_tokens"]))
    assert sorted(by_doc[1]) == [(0, 64), (1, 52)]  # 100 toks, step 48
    assert by_doc[2] == [(0, 2)]
