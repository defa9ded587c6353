"""Property-based round-trips for the COPY text framing added in round
7: rows encoded with ``copy_text_row``, concatenated, and re-chunked at
ARBITRARY byte boundaries (the protocol allows any CopyData framing)
must decode back exactly through the incremental
``parse_copy_text_rows`` path — including rows whose escapes straddle a
frame boundary. Plus the PG-lexer statement splitter: semicolons inside
literals, dollar quotes, and comments never split."""

from hypothesis import given, settings
from hypothesis import strategies as st

from moonlink_spark.pg_protocol import (
    copy_text_row,
    parse_copy_text_row,
    parse_copy_text_rows,
    split_sql_statements,
)

# cells lean into the characters the COPY text format escapes (tab,
# newline, backslash, \N) plus unicode; None exercises the NULL marker
cell = st.one_of(
    st.none(),
    st.text(
        alphabet=st.sampled_from(list("ab\\\t\n\r\v\f\bN\\négλ")),
        max_size=12,
    ),
)
rows_strategy = st.lists(
    st.lists(cell, min_size=1, max_size=5), min_size=0, max_size=40
).filter(lambda rs: len({len(r) for r in rs}) <= 1)


@settings(max_examples=300, deadline=None)
@given(rows_strategy, st.data())
def test_copy_text_reframing_roundtrip(rows, data):
    stream = b"".join(copy_text_row(tuple(r)) for r in rows)
    # re-chunk the byte stream at arbitrary boundaries
    cuts = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=len(stream)),
            max_size=10,
        )
    )
    bounds = sorted(set(cuts) | {0, len(stream)})
    frames = [
        stream[a:b] for a, b in zip(bounds, bounds[1:])
    ] or [b""]
    decoded, rest = [], b""
    for frame in frames:
        got, rest = parse_copy_text_rows(frame, rest)
        decoded.extend(got)
    if rest:
        decoded.append(parse_copy_text_row(rest))
    assert decoded == [list(r) for r in rows]


@settings(max_examples=300, deadline=None)
@given(st.lists(cell, min_size=1, max_size=6))
def test_copy_text_single_row_roundtrip(row):
    assert parse_copy_text_row(copy_text_row(tuple(row))) == list(row)


# statement bodies whose ';' must NEVER split: inside literals (with ''
# escapes), dollar quotes, quoted identifiers, and both comment forms
protected = st.sampled_from(
    [
        "SELECT 'a;b'",
        "SELECT 'it''s; fine'",
        'SELECT ";" AS "c;c"',
        "SELECT $$x;y$$",
        "SELECT $tag$;;$tag$",
        "SELECT 1 -- trailing; comment\n",
        "SELECT 2 /* block; /* nested; */ done */",
        "INSERT INTO t VALUES (1, ';')",
    ]
)


@settings(max_examples=200, deadline=None)
@given(st.lists(protected, min_size=1, max_size=6))
def test_split_statements_respects_lexical_structure(stmts):
    joined = ";".join(stmts) + ";"
    assert [s.strip() for s in split_sql_statements(joined)] == [
        s.strip() for s in stmts
    ]


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=6))
def test_split_statements_drops_empty(n):
    assert split_sql_statements(";" * n) == []
    assert split_sql_statements("  ".join([";"] * n) + " -- tail") == []
