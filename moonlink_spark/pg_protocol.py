"""PostgreSQL frontend/backend protocol v3 — simple query + COPY OUT/IN.

Parity: the reference's control plane speaks to Postgres twice over —
the metadata store (``src/moonlink_metadata_store/src/postgres/
pg_metadata_store.rs`` issues CREATE/INSERT/DELETE/SELECT through
tokio-postgres) and the initial-copy path (``pg_replicate/
initial_copy.rs`` streams ``COPY ... TO STDOUT`` rows). No Postgres
server or driver ships in this environment, so both legs are
implemented against the PUBLIC protocol layout (postgresql.org/docs/
current/protocol-message-formats.html):

- startup: ``[len:4][196608:4][key\\0value\\0...\\0]`` (no type byte);
  SSLRequest (80877103) is answered ``S`` + TLS handshake when the
  server holds a cert (real PG ssl=on), else ``N`` and the client may
  continue cleartext. The client side implements libpq's sslmode
  ladder (disable/prefer/require/verify-ca/verify-full) with a
  pinned-CA context (``tlsutil.py``);
- auth: ``R`` code 0 = AuthenticationOk; code 3 = cleartext password,
  answered with a ``p`` PasswordMessage; codes 10/11/12 = the SASL
  exchange, speaking SCRAM-SHA-256 (RFC 5802/7677 — PG's default since
  10) with mutual server-signature verification, the server holding
  only the verifier (stored/server keys), never the password;
- simple query: ``Q`` -> ``T`` RowDescription / ``D`` DataRow /
  ``C`` CommandComplete / ``E`` ErrorResponse / ``Z`` ReadyForQuery
  (with the real transaction-status byte I/T/E); multi-statement
  strings split at top-level semicolons and run as one implicit
  transaction, empty strings answer ``I`` EmptyQueryResponse;
- COPY OUT: ``H`` CopyOutResponse -> ``d`` CopyData (text format:
  tab-separated, ``\\N`` for NULL, newline-terminated rows, any frame
  chunking) -> ``c`` CopyDone -> ``C`` ``COPY n``;
- COPY IN: ``G`` CopyInResponse -> client streams ``d`` CopyData ->
  ``c`` CopyDone (or ``f`` CopyFail, aborting with nothing inserted)
  -> ``C`` ``COPY n`` — the bulk-load path;
- cancel: ``K`` BackendKeyData hands each session a (pid, secret key);
  a CancelRequest (80877102) on a NEW connection interrupts that
  backend's in-flight statement, which fails with sqlstate 57014.

The in-process :class:`PgMockServer` executes queries against SQLite
(real SQL semantics without reimplementing an engine), translating the
two PG-isms the store actually uses: ``information_schema.tables``
existence probes and the ``JSON`` column type. Everything crossing the
socket is genuine protocol bytes, so the client would talk to a real
Postgres unchanged (modulo SCRAM auth, documented below).

The EXTENDED query protocol (Parse/Bind/Describe/Execute/Sync) is
implemented with text-format parameters and declared type OIDs —
``query_params`` sends values as bound parameters outside the SQL
string (tokio-postgres's shape), the server decodes them by OID and
runs through the same execution core as simple queries, and errors
discard messages until Sync per the spec's recovery rule. Both bind
formats are accepted: text (this client's) and binary (tokio-postgres's
default — big-endian ints/floats, one-byte bools).

Auth methods: trust, cleartext, MD5 (legacy salted double-hash),
SCRAM-SHA-256 and — over TLS — SCRAM-SHA-256-PLUS with
tls-server-end-point channel binding (RFC 5929/7677), including
"y"-header downgrade detection. SCRAM passwords pass through SASLprep
(RFC 4013) on both sides.
"""

from __future__ import annotations

import os
import re
import socket
import socketserver
import sqlite3
import ssl as _ssl
import struct
import threading
import uuid
from dataclasses import dataclass
from typing import Any, Iterable, Iterator

from moonlink_spark.errors import MoonlinkError

_PROTO_V3 = 196608  # 3 << 16
_SSL_REQUEST = 80877103
_CANCEL_REQUEST = 80877102


class PgProtocolError(MoonlinkError):
    """Malformed or unsupported protocol traffic."""


class _ChaosKill(BaseException):
    """Injected server crash (tests): BaseException so it escapes the
    protocol handlers' ``except Exception`` nets and tears the
    connection down abruptly — the client sees a dead socket exactly as
    with a real backend crash. Parity: the reference's chaos_test.rs
    kills its source mid-operation the same way."""


def _sqlite_sqlstate(e: "sqlite3.Error") -> str:
    """SQLite error -> PG sqlstate, one mapping for BOTH protocols so the
    simple and extended paths always report the same code. Codes follow
    PG's appendix A (errcodes) so a client branching on sqlstate — the
    metadata store does, on 23505 — behaves as against real PG."""
    msg = str(e)
    if "UNIQUE constraint" in msg:
        return "23505"  # unique_violation — the row-count/PK contract
    if "NOT NULL constraint" in msg:
        return "23502"  # not_null_violation
    if "FOREIGN KEY constraint" in msg:
        return "23503"  # foreign_key_violation
    if "CHECK constraint" in msg:
        return "23514"  # check_violation
    if "no such table" in msg:
        return "42P01"  # undefined_table
    if "no such column" in msg:
        return "42703"  # undefined_column
    if "no such function" in msg:
        return "42883"  # undefined_function
    if "already exists" in msg:
        return "42P07"  # duplicate_table
    if "datatype mismatch" in msg:
        return "42804"  # datatype_mismatch
    if "database is locked" in msg:
        return "55P03"  # lock_not_available
    if "syntax error" in msg:
        return "42601"  # syntax_error
    if "interrupted" in msg:
        return "57014"  # query_canceled (CancelRequest -> interrupt())
    return "XX000"  # internal_error: anything unclassified


class _PgUserError(Exception):
    """A user-level SQL error with a sqlstate, raised by the execution
    core and rendered as an ErrorResponse by whichever protocol (simple
    or extended) is driving it."""

    def __init__(self, sqlstate: str, message: str):
        self.sqlstate = sqlstate
        super().__init__(message)


class PgServerError(MoonlinkError):
    """ErrorResponse from the server, fields preserved."""

    def __init__(self, fields: dict[str, str]):
        self.fields = fields
        super().__init__(
            f"{fields.get('S', 'ERROR')} {fields.get('C', '')}: "
            f"{fields.get('M', 'unknown error')}"
        )


def _msg(type_byte: bytes, body: bytes) -> bytes:
    return type_byte + struct.pack(">I", len(body) + 4) + body


def _read_msg(f) -> tuple[bytes, bytes]:
    head = f.read(5)
    if len(head) < 5:
        raise ConnectionError("peer closed")
    t = head[:1]
    (n,) = struct.unpack(">I", head[1:])
    # n counts itself: < 4 is a framing violation, and a negative body
    # size would make f.read() block for EOF and return garbage; PG's
    # own ceiling is 1 GB per message
    if n < 4 or n > (1 << 30):
        raise ConnectionError(f"invalid message length {n}")
    body = f.read(n - 4)
    if len(body) < n - 4:
        raise ConnectionError("short message body")
    return t, body


def _cstr(s: str) -> bytes:
    return s.encode("utf-8") + b"\x00"


def _error_fields(body: bytes) -> dict[str, str]:
    out: dict[str, str] = {}
    pos = 0
    while pos < len(body) and body[pos] != 0:
        code = chr(body[pos])
        end = body.index(b"\x00", pos + 1)
        out[code] = body[pos + 1 : end].decode("utf-8", "replace")
        pos = end + 1
    return out


def sql_literal(v: Any) -> str:
    """Inline a value as a SQL literal (the simple-query protocol has no
    bind parameters). Strings use standard-conforming quoting with
    doubled single quotes; backslashes are NOT escapes per SQL standard
    (PG standard_conforming_strings=on, the default since 9.1)."""
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, float):
        # bare 'inf'/'nan' parse as IDENTIFIERS, not literals; SQLite's
        # own conventions: out-of-range numerics evaluate to Inf, and a
        # stored NaN is NULL
        if v != v:  # NaN
            return "NULL"
        if v == float("inf"):
            return "9e999"
        if v == float("-inf"):
            return "-9e999"
        return repr(v)
    if isinstance(v, int):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


# --------------------------------------------------------------------------- #
# SCRAM-SHA-256[-PLUS] (RFC 5802 / RFC 7677), PostgreSQL's default auth
# since 10. Pure stdlib: PBKDF2 is the RFC's Hi(), hmac/sha256 the rest,
# stringprep/unicodedata for SASLprep (RFC 4013).
# --------------------------------------------------------------------------- #

_SCRAM_MECH = "SCRAM-SHA-256"
_SCRAM_MECH_PLUS = "SCRAM-SHA-256-PLUS"
_CB_TYPE = "tls-server-end-point"  # RFC 5929; the binding PG implements


def saslprep(s: str) -> str:
    """RFC 4013 SASLprep (the stringprep profile PG applies to SCRAM
    passwords): map non-ASCII spaces to space and commonly-mapped-to-
    nothing to nothing, NFKC-normalize, reject prohibited output and
    bidi violations. Pure stdlib (``stringprep`` + ``unicodedata``).
    ASCII strings pass through untouched."""
    if s.isascii():
        return s  # fast path: every table below is a no-op on ASCII
    import stringprep
    import unicodedata

    mapped = []
    for ch in s:
        if stringprep.in_table_c12(ch):
            mapped.append(" ")
        elif not stringprep.in_table_b1(ch):
            mapped.append(ch)
    out = unicodedata.normalize("NFKC", "".join(mapped))
    if not out:
        raise PgProtocolError("SASLprep: password maps to empty string")
    prohibited = (
        stringprep.in_table_c21_c22,  # control characters
        stringprep.in_table_c3,  # private use
        stringprep.in_table_c4,  # non-characters
        stringprep.in_table_c5,  # surrogates
        stringprep.in_table_c6,  # inappropriate for plain text
        stringprep.in_table_c7,  # inappropriate for canonical rep
        stringprep.in_table_c8,  # change-display / deprecated
        stringprep.in_table_c9,  # tagging characters
    )
    has_randal = any(stringprep.in_table_d1(ch) for ch in out)
    has_l = any(stringprep.in_table_d2(ch) for ch in out)
    for ch in out:
        if any(table(ch) for table in prohibited):
            raise PgProtocolError(
                f"SASLprep: prohibited character U+{ord(ch):04X}"
            )
        if stringprep.in_table_a1(ch):
            raise PgProtocolError(
                f"SASLprep: unassigned code point U+{ord(ch):04X}"
            )
    if has_randal:
        # RFC 3454 §6: RandALCat and LCat must not mix, and RandALCat
        # strings must start and end with a RandALCat character
        if has_l:
            raise PgProtocolError("SASLprep: bidi categories mixed")
        if not (
            stringprep.in_table_d1(out[0]) and stringprep.in_table_d1(out[-1])
        ):
            raise PgProtocolError("SASLprep: bad RandALCat bracketing")
    return out


def _scram_salted_password(password: str, salt: bytes, iterations: int) -> bytes:
    import hashlib

    return hashlib.pbkdf2_hmac(
        "sha256", saslprep(password).encode("utf-8"), salt, iterations
    )


def _scram_keys(salted: bytes) -> tuple[bytes, bytes, bytes]:
    """(client_key, stored_key, server_key)."""
    import hashlib
    import hmac as _hmac

    client_key = _hmac.new(salted, b"Client Key", hashlib.sha256).digest()
    stored_key = hashlib.sha256(client_key).digest()
    server_key = _hmac.new(salted, b"Server Key", hashlib.sha256).digest()
    return client_key, stored_key, server_key


def _scram_hmac(key: bytes, msg: str) -> bytes:
    import hashlib
    import hmac as _hmac

    return _hmac.new(key, msg.encode("utf-8"), hashlib.sha256).digest()


def _scram_parse(msg: str) -> dict[str, str]:
    return dict(kv.split("=", 1) for kv in msg.split(","))


_DOLLAR_TAG_RE = re.compile(r"\$([A-Za-z_][A-Za-z0-9_]*)?\$")


def _lex_sql(query: str):
    """Yield (kind, text) spans following PostgreSQL's lexer: 'squote'
    (single-quoted literal, '' escapes), 'dquote' (quoted identifier,
    "" escapes), 'line' (-- comment), 'block' (/* */ comment, NESTING),
    'dollar' (dollar-quoted string incl. tags), 'text' (everything
    else, one char at a time)."""
    i, n = 0, len(query)
    while i < n:
        ch = query[i]
        if ch == "'" or ch == '"':
            j = i + 1
            while j < n:
                if query[j] == ch:
                    if j + 1 < n and query[j + 1] == ch:
                        j += 2
                        continue
                    j += 1
                    break
                j += 1
            yield ("squote" if ch == "'" else "dquote"), query[i:j]
            i = j
            continue
        if ch == "-" and query.startswith("--", i):
            j = query.find("\n", i)
            j = n if j < 0 else j
            yield "line", query[i:j]
            i = j
            continue
        if ch == "/" and query.startswith("/*", i):
            depth, j = 1, i + 2
            while j < n and depth:
                if query.startswith("/*", j):
                    depth, j = depth + 1, j + 2
                elif query.startswith("*/", j):
                    depth, j = depth - 1, j + 2
                else:
                    j += 1
            yield "block", query[i:j]
            i = j
            continue
        if ch == "$":
            m = _DOLLAR_TAG_RE.match(query, i)
            if m is not None:
                close = m.group(0)
                j = query.find(close, m.end())
                j = n if j < 0 else j + len(close)
                yield "dollar", query[i:j]
                i = j
                continue
        yield "text", ch
        i += 1


def translate_pg_lexemes(sql: str) -> str:
    """Rewrite PG lexical constructs the SQLite executor lacks:
    dollar-quoted strings become standard single-quoted literals, and
    block comments (which NEST in PG but not in SQLite) are dropped —
    replaced by one space so adjacent tokens stay separated. Quoted
    regions pass through verbatim."""
    if "$" not in sql and "/*" not in sql:
        return sql
    out: list[str] = []
    for kind, text in _lex_sql(sql):
        if kind == "dollar":
            open_end = text.index("$", 1) + 1
            tag = text[:open_end]
            body = text[open_end:]
            if body.endswith(tag):
                body = body[: -len(tag)]
            out.append("'" + body.replace("'", "''") + "'")
        elif kind == "block":
            out.append(" ")
        else:
            out.append(text)
    return "".join(out)


def split_sql_statements(sql: str) -> list[str]:
    """Split a simple-Query string into statements at TOP-LEVEL
    semicolons, following the PG lexer — semicolons inside literals,
    quoted identifiers, dollar-quoted strings, and (nesting) comments do
    not split. Statements that are empty after comment removal (bare
    ``;``, trailing ``;``, comment-only text) are dropped, per the
    protocol's empty-statement handling."""
    parts: list[str] = []
    cur: list[str] = []
    for kind, text in _lex_sql(sql):
        if kind == "text" and text == ";":
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(text)
    parts.append("".join(cur))
    return [
        p
        for p in parts
        if "".join(
            t for k, t in _lex_sql(p) if k not in ("line", "block")
        ).strip()
    ]


def statement_verb(sql: str) -> str:
    """First keyword of a statement, uppercased, with leading ``--`` /
    ``/* */`` comments stripped via the PG lexer — so ``/* hint */
    INSERT`` and comment-led ROLLBACK classify by their real verb, like
    real PG (which tags commands post-parse, not by raw first token)."""
    stripped = "".join(
        t for k, t in _lex_sql(sql) if k not in ("line", "block")
    )
    head = stripped.strip().split(None, 1)
    return head[0].rstrip(";").upper() if head else ""


_MAIN_VERBS = frozenset(
    {"INSERT", "UPDATE", "DELETE", "SELECT", "VALUES", "TABLE"}
)


def _depth0_tokens(sql: str) -> list[str]:
    """Paren-depth-0 token stream for a statement: words (upper-cased)
    and single punctuation chars outside any parenthesized group.
    Comments vanish; strings / quoted identifiers / dollar-quoted
    bodies collapse to an opaque ``<q>`` token (they separate words but
    can never look like a keyword)."""
    toks: list[str] = []
    depth = 0
    word: list[str] = []

    def _flush() -> None:
        if word:
            if depth == 0:
                toks.append("".join(word).upper())
            word.clear()

    for kind, text in _lex_sql(sql):
        if kind in ("line", "block"):
            _flush()
            continue
        if kind != "text":  # strings / quoted identifiers / dollar
            _flush()
            if depth == 0:
                toks.append("<q>")
            continue
        for ch in text:
            if ch.isalnum() or ch == "_":
                word.append(ch)
                continue
            _flush()
            if ch == "(":
                if depth == 0:
                    toks.append("(")
                depth += 1
            elif ch == ")":
                depth -= 1
            elif depth == 0 and not ch.isspace():
                toks.append(ch)
    _flush()
    return toks


def statement_main_verb(sql: str) -> str:
    """Verb that decides read/write routing: same as ``statement_verb``
    except a WITH-led statement resolves to its TOP-LEVEL main statement
    verb — ``WITH x AS (SELECT ..) INSERT ..`` is an INSERT, like real
    PG's post-parse command tag. CTE bodies live inside parentheses, so
    the main verb is the first paren-depth-0 keyword among INSERT/
    UPDATE/DELETE/SELECT/VALUES/TABLE that is PAST the CTE prologue:
    SELECT/VALUES/TABLE are PG-reserved words (never legal as unquoted
    CTE names) and accept on sight, while INSERT/UPDATE/DELETE are
    PG-unreserved — ``WITH delete AS (SELECT 1) SELECT * FROM delete``
    is a legal read — so they only count when the next depth-0 token is
    neither ``AS`` nor ``(`` (a CTE name is always followed by its
    optional column list and then AS)."""
    verb = statement_verb(sql)
    if verb != "WITH":
        return verb
    toks = _depth0_tokens(sql)
    for i, tok in enumerate(toks):
        if tok not in _MAIN_VERBS:
            continue
        if tok in ("SELECT", "VALUES", "TABLE"):
            return tok
        nxt = toks[i + 1] if i + 1 < len(toks) else ""
        if nxt not in ("AS", "("):
            return tok
    return verb


def substitute_params(query: str, params: list) -> str:
    """Splice decoded bind parameters into ``query`` as SQL literals,
    respecting PostgreSQL's LEXICAL structure so the result matches real
    post-parse binding: ``$n`` is replaced only in plain SQL text, never
    inside single-quoted literals (with ``''`` escapes), double-quoted
    identifiers (with ``""`` escapes), dollar-quoted strings
    (``$$..$$`` / ``$tag$..$tag$``), ``--`` line comments, or ``/* */``
    block comments (which NEST, per the PG lexer). A reference to a
    parameter that was not bound raises sqlstate 42P02; the same
    parameter may be referenced any number of times."""
    out: list[str] = []
    pending = ""  # accumulates 'text' chars so $1 can be spotted
    for kind, text in _lex_sql(query):
        if kind == "text":
            pending += text
            continue
        out.append(_sub_params_in_text(pending, params))
        pending = ""
        out.append(text)
    out.append(_sub_params_in_text(pending, params))
    return "".join(out)


def _sub_params_in_text(text: str, params: list) -> str:
    def sub(m: "re.Match[str]") -> str:
        idx = int(m.group(1))
        if not 1 <= idx <= len(params):
            raise _PgUserError("42P02", f"there is no parameter ${idx}")
        return sql_literal(params[idx - 1])

    return re.sub(r"\$(\d+)", sub, text)


@dataclass
class QueryResult:
    columns: list[str]
    rows: list[tuple]
    tag: str  # CommandComplete tag, e.g. "SELECT 2", "INSERT 0 1"

    @property
    def rows_affected(self) -> int:
        parts = self.tag.split()
        return int(parts[-1]) if parts and parts[-1].isdigit() else 0


class PgWireClient:
    """Blocking protocol-v3 client: startup + simple query + COPY OUT.

    One socket per instance (tokio-postgres's one-connection shape);
    thread-safe via an internal lock — the metadata store serializes
    its calls anyway."""

    def __init__(
        self,
        host: str,
        port: int,
        user: str = "moonlink",
        database: str = "postgres",
        password: str | None = None,
        timeout_s: float = 10.0,
        sslmode: str | None = None,
        ssl_ca_file: str | None = None,
        ssl_server_hostname: str | None = None,
        replication: str | None = None,
    ):
        """``replication``: startup parameter selecting a replication
        connection ("database" for logical replication — the walsender
        then accepts START_REPLICATION; libpq's replication= keyword).
        Auth/TLS run IDENTICALLY on replication connections — the whole
        point of routing the replication client through this startup."""
        # libpq's documented environment defaults (PGSSLMODE /
        # PGSSLROOTCERT) apply when the caller passes nothing — the
        # deployment knob every PG client container already understands
        if sslmode is None:
            sslmode = os.environ.get("PGSSLMODE", "disable")
        if ssl_ca_file is None:
            ssl_ca_file = os.environ.get("PGSSLROOTCERT") or None
        if sslmode not in (
            "disable", "prefer", "require", "verify-ca", "verify-full"
        ):
            raise ValueError(f"unsupported sslmode {sslmode!r}")
        self._lock = threading.Lock()
        # set while query_cursor is mid-stream: the connection's socket
        # is dedicated to the suspended portal, so a nested call from
        # the SAME thread must fail loud (the non-reentrant lock would
        # otherwise deadlock it silently)
        self._cursor_active = False
        self._addr = (host, port)
        # (backend pid, secret key) from BackendKeyData — cancel() credentials
        self.backend_key: tuple[int, int] = (0, 0)
        self.sock = socket.create_connection((host, port), timeout=timeout_s)
        self.sock.settimeout(timeout_s)
        # RFC 5929 tls-server-end-point data once TLS is up (consumed by
        # SCRAM-SHA-256-PLUS channel binding); None on cleartext
        self._tls_cert_der: bytes | None = None
        if sslmode != "disable":
            self._tls_negotiate(
                sslmode, host, ssl_ca_file, ssl_server_hostname
            )
        self._f = self.sock.makefile("rb")
        self.parameters: dict[str, str] = {}
        # last ReadyForQuery status byte (the field real drivers track):
        # b"I" idle, b"T" in a transaction block, b"E" in a failed one
        self.txn_status: bytes = b"I"
        self._startup(user, database, password, replication=replication)

    def _tls_negotiate(
        self,
        sslmode: str,
        host: str,
        ca_file: str | None,
        server_hostname: str | None,
    ) -> None:
        """libpq's SSLRequest dance: 8-byte frame, one-byte answer,
        then the TLS handshake on the same socket. Verification follows
        libpq's sslmode ladder — require = encrypt (chain-verified only
        when a CA is pinned), verify-ca = chain, verify-full = chain +
        hostname; prefer falls back to cleartext on 'N'."""
        self.sock.sendall(struct.pack(">II", 8, _SSL_REQUEST))
        answer = self.sock.recv(1)
        if answer == b"N":
            if sslmode == "prefer":
                return  # continue in cleartext, libpq's prefer shape
            raise PgProtocolError(
                f"server refused TLS and sslmode={sslmode} requires it"
            )
        if answer != b"S":
            raise PgProtocolError(f"bad SSLRequest answer {answer!r}")
        if sslmode == "require" and ca_file is None:
            ctx = _ssl.SSLContext(_ssl.PROTOCOL_TLS_CLIENT)
            ctx.minimum_version = _ssl.TLSVersion.TLSv1_2
            ctx.check_hostname = False
            ctx.verify_mode = _ssl.CERT_NONE
        else:
            from moonlink_spark.tlsutil import client_context

            ctx = client_context(
                ca_file, check_hostname=(sslmode == "verify-full")
            )
        self.sock = ctx.wrap_socket(
            self.sock, server_hostname=server_hostname or host
        )
        self._tls_cert_der = self.sock.getpeercert(binary_form=True)

    def _startup(
        self,
        user: str,
        database: str,
        password: str | None,
        replication: str | None = None,
    ) -> None:
        kv = [
            ("user", user),
            ("database", database),
            ("client_encoding", "UTF8"),
            ("application_name", "moonlink_spark"),
        ]
        if replication is not None:
            kv.append(("replication", replication))
        params = b"".join(_cstr(k) + _cstr(v) for k, v in kv) + b"\x00"
        body = struct.pack(">I", _PROTO_V3) + params
        self.sock.sendall(struct.pack(">I", len(body) + 4) + body)
        while True:
            t, b = _read_msg(self._f)
            if t == b"R":
                (code,) = struct.unpack_from(">I", b, 0)
                if code == 0:
                    continue  # AuthenticationOk
                if code == 3:  # cleartext password
                    if password is None:
                        raise PgProtocolError(
                            "server requires a password and none was given"
                        )
                    self.sock.sendall(_msg(b"p", _cstr(password)))
                    continue
                if code == 5:  # MD5 password: md5(md5(pw+user)+salt)
                    if password is None:
                        raise PgProtocolError(
                            "server requires a password and none was given"
                        )
                    import hashlib as _hl

                    salt = b[4:8]
                    inner = _hl.md5(
                        password.encode() + user.encode()
                    ).hexdigest()
                    digest = _hl.md5(inner.encode() + salt).hexdigest()
                    self.sock.sendall(_msg(b"p", _cstr("md5" + digest)))
                    continue
                if code == 10:  # AuthenticationSASL: mechanism list
                    if password is None:
                        raise PgProtocolError(
                            "server requires SCRAM and no password was given"
                        )
                    mechs = [
                        m.decode()
                        for m in b[4:].split(b"\x00")
                        if m
                    ]
                    # RFC 7677 mechanism negotiation: bind the channel
                    # whenever both sides can (TLS up AND -PLUS offered);
                    # over TLS against a no--PLUS server announce "y"
                    # so a binding-capable server detects the downgrade
                    if (
                        _SCRAM_MECH_PLUS in mechs
                        and self._tls_cert_der is not None
                    ):
                        mech, gs2 = (
                            _SCRAM_MECH_PLUS,
                            f"p={_CB_TYPE},,",
                        )
                    elif _SCRAM_MECH in mechs:
                        mech = _SCRAM_MECH
                        gs2 = "y,," if self._tls_cert_der else "n,,"
                    else:
                        raise PgProtocolError(
                            f"no supported SASL mechanism in {mechs} "
                            f"(client speaks {_SCRAM_MECH}[-PLUS])"
                        )
                    self._scram_state = self._scram_start(mech, gs2)
                    continue
                if code == 11:  # AuthenticationSASLContinue
                    final = self._scram_continue(
                        b[4:].decode("utf-8"), password
                    )
                    self.sock.sendall(_msg(b"p", final.encode("utf-8")))
                    continue
                if code == 12:  # AuthenticationSASLFinal
                    self._scram_verify_server(b[4:].decode("utf-8"))
                    continue
                raise PgProtocolError(
                    f"unsupported authentication method {code} (trust, "
                    "cleartext, MD5 and SCRAM-SHA-256 are implemented)"
                )
            if t == b"S":  # ParameterStatus
                k, v = b.split(b"\x00")[:2]
                self.parameters[k.decode()] = v.decode()
            elif t == b"K":  # BackendKeyData — cancel() credentials
                self.backend_key = struct.unpack(">II", b)
            elif t == b"Z":  # ReadyForQuery
                return
            elif t == b"E":
                raise PgServerError(_error_fields(b))

    # -- SCRAM-SHA-256 client exchange (RFC 5802 message flow) ---------------

    def _scram_start(self, mech: str, gs2: str) -> dict:
        import base64
        import os as _os

        cnonce = base64.b64encode(_os.urandom(18)).decode()
        first_bare = f"n=,r={cnonce}"
        initial = gs2 + first_bare
        # SASLInitialResponse: mechanism name, int32 length, initial data
        payload = (
            _cstr(mech)
            + struct.pack(">I", len(initial))
            + initial.encode("utf-8")
        )
        self.sock.sendall(_msg(b"p", payload))
        return {"cnonce": cnonce, "first_bare": first_bare, "gs2": gs2}

    def _scram_continue(self, server_first: str, password: str) -> str:
        import base64

        st = self._scram_state
        fields = _scram_parse(server_first)
        nonce, salt_b64, iters = fields["r"], fields["s"], int(fields["i"])
        if not nonce.startswith(st["cnonce"]):
            raise PgProtocolError("SCRAM server nonce does not extend ours")
        salted = _scram_salted_password(
            password, base64.b64decode(salt_b64), iters
        )
        client_key, stored_key, server_key = _scram_keys(salted)
        # channel binding attribute (RFC 5802 §5.1 "c="): base64 of the
        # GS2 header plus, under -PLUS, the tls-server-end-point hash of
        # the certificate THIS connection handshook with — a MITM
        # terminating TLS presents a different cert and the proof dies
        cbind = st["gs2"].encode("utf-8")
        if st["gs2"].startswith("p="):
            from moonlink_spark.tlsutil import cert_fingerprint_for_binding

            cbind += cert_fingerprint_for_binding(self._tls_cert_der)
        final_no_proof = (
            f"c={base64.b64encode(cbind).decode()},r={nonce}"
        )
        auth_message = ",".join(
            (st["first_bare"], server_first, final_no_proof)
        )
        sig = _scram_hmac(stored_key, auth_message)
        proof = bytes(a ^ b for a, b in zip(client_key, sig))
        st["server_sig"] = _scram_hmac(server_key, auth_message)
        return final_no_proof + ",p=" + base64.b64encode(proof).decode()

    def _scram_verify_server(self, server_final: str) -> None:
        """Mutual auth: the v= signature proves the server knows the
        credentials too (a MITM without them cannot forge it)."""
        import base64
        import hmac as _hmac

        fields = _scram_parse(server_final)
        want = self._scram_state.get("server_sig", b"")
        got = base64.b64decode(fields.get("v", ""))
        if not _hmac.compare_digest(want, got):
            raise PgProtocolError("SCRAM server signature mismatch")

    def _guard_not_streaming(self) -> None:
        if self._cursor_active:
            raise PgProtocolError(
                "connection is streaming a cursor (query_cursor is "
                "mid-iteration); drain or close() the iterator first, "
                "or use a second connection"
            )

    def query(self, sql: str) -> QueryResult:
        """One simple-query round trip. Multiple statements per string are
        legal in the protocol; the LAST result set / tag wins (enough for
        the store's single-statement calls)."""
        self._guard_not_streaming()
        with self._lock:
            self.sock.sendall(_msg(b"Q", _cstr(sql)))
            cols: list[str] = []
            rows: list[tuple] = []
            tag = ""
            err: dict[str, str] | None = None
            while True:
                t, b = _read_msg(self._f)
                if t == b"T":
                    cols = self._row_description(b)
                    rows = []
                elif t == b"D":
                    rows.append(self._data_row(b))
                elif t == b"C":
                    tag = b.rstrip(b"\x00").decode()
                elif t == b"E":
                    err = _error_fields(b)
                elif t == b"I":  # EmptyQueryResponse
                    tag = ""
                elif t == b"N":  # NoticeResponse — ignore
                    pass
                elif t == b"Z":
                    self.txn_status = b[:1]
                    if err is not None:
                        raise PgServerError(err)
                    return QueryResult(cols, rows, tag)

    _PARAM_OIDS = {bool: 16, int: 20, float: 701, str: 25}

    def _encode_parse_bind(self, sql: str, params: list) -> bytes:
        """Parse + Bind payloads for the unnamed statement/portal with
        text-format parameters — THE one encoding of parameter OIDs and
        values, shared by query_params and query_cursor (a fix applied
        to one copy used to leave the other inconsistent)."""
        oids = [
            self._PARAM_OIDS.get(type(v), 25) if v is not None else 25
            for v in params
        ]
        parse = (
            _cstr("")
            + _cstr(sql)
            + struct.pack(">h", len(oids))
            + b"".join(struct.pack(">I", o) for o in oids)
        )
        bind = _cstr("") + _cstr("") + struct.pack(">h", 0)
        bind += struct.pack(">h", len(params))
        for v in params:
            if v is None:
                bind += struct.pack(">i", -1)
            else:
                raw = (
                    (b"t" if v else b"f")
                    if isinstance(v, bool)
                    else str(v).encode("utf-8")
                )
                bind += struct.pack(">i", len(raw)) + raw
        bind += struct.pack(">h", 0)  # result formats: all text
        return _msg(b"P", parse) + _msg(b"B", bind)

    def query_params(self, sql: str, params: list) -> QueryResult:
        """One extended-protocol round trip (Parse/Bind/Describe/Execute/
        Sync) with text-format parameters — values never ride inside the
        SQL string, the tokio-postgres shape the reference's metadata
        store uses. Parameter type OIDs are declared from the Python
        types (int->int8, float->float8, bool->bool, str/None->text)."""
        pb = self._encode_parse_bind(sql, params)
        self._guard_not_streaming()
        with self._lock:
            self.sock.sendall(
                pb
                + _msg(b"D", b"P" + _cstr(""))
                + _msg(b"E", _cstr("") + struct.pack(">i", 0))
                + _msg(b"S", b"")
            )
            cols: list[str] = []
            rows: list[tuple] = []
            tag = ""
            err: dict[str, str] | None = None
            while True:
                t, b = _read_msg(self._f)
                if t == b"1" or t == b"2" or t == b"n":
                    continue  # ParseComplete / BindComplete / NoData
                if t == b"T":
                    cols = self._row_description(b)
                elif t == b"D":
                    rows.append(self._data_row(b))
                elif t == b"C":
                    tag = b.rstrip(b"\x00").decode()
                elif t == b"E":
                    err = _error_fields(b)
                elif t == b"Z":
                    self.txn_status = b[:1]
                    if err is not None:
                        raise PgServerError(err)
                    return QueryResult(cols, rows, tag)

    def query_cursor(
        self,
        sql: str,
        fetch_size: int = 100,
        params: list | None = None,
    ) -> Iterator[tuple]:
        """Streamed extended-protocol read: Execute with a max-rows
        limit, resume on PortalSuspended — the JDBC ``setFetchSize`` /
        tokio-postgres streamed-read shape, at most ``fetch_size`` rows
        buffered at a time. Resumes ride between Syncs, so like real PG
        cursors this works both in autocommit (the portal lives until
        the final Sync here) and inside an explicit transaction.
        Abandoning the iterator early is safe: the portal is closed and
        the connection drained back to ReadyForQuery."""
        if fetch_size <= 0:
            raise ValueError("fetch_size must be positive")
        params = params or []
        pb = self._encode_parse_bind(sql, params)
        execute = _msg(b"E", _cstr("") + struct.pack(">i", fetch_size))
        # Guard BEFORE taking the non-reentrant lock: a second cursor
        # started on this connection while one is suspended must fail
        # loud here, not deadlock on self._lock below.
        self._guard_not_streaming()
        with self._lock:
            self.sock.sendall(pb + execute)
            err: dict[str, str] | None = None
            done = False
            self._cursor_active = True
            try:
                while not done and err is None:
                    t, b = _read_msg(self._f)
                    if t in (b"1", b"2", b"n", b"T"):
                        continue
                    if t == b"D":
                        yield self._data_row(b)
                    elif t == b"s":  # PortalSuspended: resume
                        self.sock.sendall(execute)
                    elif t == b"C":
                        done = True
                    elif t == b"E":
                        err = _error_fields(b)
            finally:
                self._cursor_active = False
                # reached on completion, server error, AND generator
                # abandonment: close the portal, Sync, drain to ready.
                # A dead socket here must not mask the original error —
                # the connection is already unusable either way.
                try:
                    self.sock.sendall(
                        _msg(b"C", b"P" + _cstr("")) + _msg(b"S", b"")
                    )
                    while True:
                        t, b = _read_msg(self._f)
                        if t == b"E" and err is None:
                            err = _error_fields(b)
                        elif t == b"Z":
                            self.txn_status = b[:1]
                            break
                except OSError:
                    pass
            if err is not None:
                raise PgServerError(err)

    def copy_out(self, sql: str) -> Iterator[bytes]:
        """``COPY ... TO STDOUT``: yields one newline-terminated text-format
        row per iteration. The protocol permits CopyData frames to split or
        batch rows arbitrarily (protocol docs, COPY subsection), so rows are
        reassembled across frame boundaries here rather than assuming
        one-row-per-frame. Abandoning the generator early is safe: close()
        drains the remaining COPY stream to ReadyForQuery so the connection
        lock is released in a usable state rather than held until GC."""
        frames = self.copy_out_frames(sql)
        try:
            rest = b""
            for frame in frames:
                if rest:
                    frame = rest + frame
                lines = frame.split(b"\n")
                rest = lines.pop()  # partial trailing row (b"" if none)
                for line in lines:
                    yield line + b"\n"
            if rest:  # final row missing its terminator — still a row
                yield rest
        finally:
            frames.close()  # abandoned mid-COPY: drain + release the lock

    def copy_out_frames(self, sql: str) -> Iterator[bytes]:
        """``COPY ... TO STDOUT`` at frame granularity: yields raw CopyData
        payloads, each possibly holding many rows (and possibly ending
        mid-row). The bulk path for shard readers — pair with
        :func:`parse_copy_text_rows` to decode a frame at a time instead of
        paying generator + parse overhead per row."""
        self._guard_not_streaming()
        with self._lock:
            self.sock.sendall(_msg(b"Q", _cstr(sql)))
            t, b = _read_msg(self._f)
            if t == b"E":
                fields = _error_fields(b)
                self._drain_to_ready()
                raise PgServerError(fields)
            if t != b"H":
                raise PgProtocolError(f"expected CopyOutResponse, got {t!r}")
            try:
                while True:
                    t, b = _read_msg(self._f)
                    if t == b"d":
                        yield b
                    elif t == b"c":  # CopyDone
                        self._drain_to_ready()
                        return
                    elif t == b"E":
                        fields = _error_fields(b)
                        self._drain_to_ready()
                        raise PgServerError(fields)
            except GeneratorExit:
                # consumer abandoned the stream mid-COPY: drain the rest
                # (CopyData ... CopyDone/Error, CommandComplete, Z) so the
                # next query on this connection starts from a clean state
                while True:
                    t, b = _read_msg(self._f)
                    if t == b"Z":
                        self.txn_status = b[:1]
                        break
                raise

    def copy_in(self, sql: str, rows: Iterable[tuple]) -> int:
        """``COPY ... FROM STDIN`` (text format): streams ``rows`` as
        ~256 KiB CopyData frames and returns the server's inserted row
        count from the ``COPY n`` tag. The bulk-load path — one round
        trip for the whole stream instead of one INSERT statement per
        batch. If encoding a row raises mid-stream, CopyFail is sent so
        the server aborts cleanly (nothing inserts) and the connection
        stays usable."""
        self._guard_not_streaming()
        with self._lock:
            self.sock.sendall(_msg(b"Q", _cstr(sql)))
            t, b = _read_msg(self._f)
            if t == b"E":
                fields = _error_fields(b)
                self._drain_to_ready()
                raise PgServerError(fields)
            if t != b"G":
                raise PgProtocolError(f"expected CopyInResponse, got {t!r}")
            try:
                buf = bytearray()
                for row in rows:
                    buf += copy_text_row(row)
                    if len(buf) >= _COPY_FRAME_BYTES:
                        self.sock.sendall(_msg(b"d", bytes(buf)))
                        buf.clear()
                tail = _msg(b"d", bytes(buf)) if buf else b""
                self.sock.sendall(tail + _msg(b"c", b""))
            except (ConnectionError, OSError):
                raise
            except BaseException as e:
                # the row iterable failed mid-stream: abort server-side
                self.sock.sendall(_msg(b"f", _cstr(str(e) or "aborted")))
                self._drain_to_ready()
                raise
            tag, err = "", None
            while True:
                t, b = _read_msg(self._f)
                if t == b"C":
                    tag = b.rstrip(b"\x00").decode()
                elif t == b"E":
                    err = _error_fields(b)
                elif t == b"Z":
                    self.txn_status = b[:1]
                    if err is not None:
                        raise PgServerError(err)
                    return int(tag.split()[-1])

    def cancel(self) -> None:
        """Out-of-band query cancellation (the protocol's CancelRequest,
        libpq's PQcancel shape): opens a NEW plaintext connection carrying
        this backend's (pid, secret key) from BackendKeyData; the
        statement currently running on THIS connection aborts with
        sqlstate 57014 if it is still in flight. Fire-and-forget — the
        server never answers a cancel connection, and a cancel that
        arrives after the query finished is a no-op. Deliberately takes
        no lock: the whole point is firing while another thread holds
        this connection inside query()."""
        pid, key = self.backend_key
        s = socket.create_connection(self._addr, timeout=5.0)
        try:
            s.sendall(
                struct.pack(">IIII", 16, _CANCEL_REQUEST, pid, key)
            )
        finally:
            s.close()

    def _drain_to_ready(self) -> None:
        while True:
            t, b = _read_msg(self._f)
            if t == b"Z":
                self.txn_status = b[:1]
                return

    @staticmethod
    def _row_description(b: bytes) -> list[str]:
        (n,) = struct.unpack_from(">h", b, 0)
        cols, pos = [], 2
        for _ in range(n):
            end = b.index(b"\x00", pos)
            cols.append(b[pos:end].decode())
            pos = end + 1 + 18  # table oid 4, attnum 2, type oid 4, typlen 2, atttypmod 4, format 2
        return cols

    @staticmethod
    def _data_row(b: bytes) -> tuple:
        (n,) = struct.unpack_from(">h", b, 0)
        vals, pos = [], 2
        for _ in range(n):
            (ln,) = struct.unpack_from(">i", b, pos)
            pos += 4
            if ln < 0:
                vals.append(None)
            else:
                vals.append(b[pos : pos + ln].decode("utf-8"))
                pos += ln
        return tuple(vals)

    def close(self) -> None:
        try:
            self.sock.sendall(_msg(b"X", b""))
        except OSError:
            pass
        try:
            self._f.close()
            self.sock.close()
        except OSError:
            pass


# ---------------------------------------------------------------------------
# in-process server
# ---------------------------------------------------------------------------

_INFO_SCHEMA_RE = re.compile(
    r"FROM\s+information_schema\.tables\s+WHERE\s+table_schema\s*=\s*"
    r"'public'\s+AND\s+table_name\s*=\s*'([^']+)'",
    re.IGNORECASE,
)
# the reference's exact statement shape is `COPY ... TO STDOUT WITH
# (FORMAT text)` (pg_replicate/clients/postgres.rs:199,261) — accept the
# WITH options clause, rejecting non-text formats rather than mis-parsing
_COPY_WITH_RE = r"(?:\s+WITH\s*\(\s*FORMAT\s+text\s*\))?"
_COPY_RE = re.compile(
    r"^\s*COPY\s+(.+?)\s+TO\s+STDOUT" + _COPY_WITH_RE + r"\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_COPY_IN_RE = re.compile(
    r"^\s*COPY\s+([\w.\"]+)\s*(?:\(([^)]*)\))?\s+FROM\s+STDIN"
    + _COPY_WITH_RE
    + r"\s*;?\s*$",
    re.IGNORECASE,
)
_EXPORT_SNAPSHOT_RE = re.compile(
    r"^\s*SELECT\s+pg_export_snapshot\(\)\s*(?:,\s*pg_current_wal_lsn\(\)\s*)?;?\s*$",
    re.IGNORECASE,
)
_WAL_LSN_RE = re.compile(
    r"^\s*SELECT\s+pg_current_wal_lsn\(\)\s*;?\s*$", re.IGNORECASE
)
_SET_SNAPSHOT_RE = re.compile(
    r"^\s*SET\s+TRANSACTION\s+SNAPSHOT\s+'([^']+)'\s*;?\s*$", re.IGNORECASE
)


def wal_lsn_str(lsn: int) -> str:
    """PG LSN text form ``XXXXXXXX/XXXXXXXX``."""
    return f"{lsn >> 32:X}/{lsn & 0xFFFFFFFF:X}"


def parse_wal_lsn(s: str) -> int:
    hi, lo = s.split("/")
    return (int(hi, 16) << 32) | int(lo, 16)


class ServerAuth:
    """Server-side PG startup + authentication, shared by PgMockServer
    (query wire) and ReplicationWireServer (replication wire) — real PG
    guards BOTH wires behind the same pg_hba.conf auth, and the
    reference connects its replication stream authenticated
    (``pg_replicate/postgres_source.rs:532+`` over tokio-postgres).

    Handles SSLRequest (TLS upgrade when a cert is configured),
    CancelRequest dispatch (via callback), the startup packet, and
    cleartext / MD5 / SCRAM-SHA-256[-PLUS] auth. The SCRAM side stores
    only the VERIFIER (pg_authid shape), never the password."""

    def __init__(
        self,
        password: str | None = None,
        auth: str = "password",
        ssl_cert: str | None = None,
        ssl_key: str | None = None,
    ):
        if auth not in ("password", "md5", "scram-sha-256"):
            raise ValueError(f"unsupported auth mode {auth!r}")
        self.password = password
        self.auth = auth
        # TLS: with a cert/key pair the server answers SSLRequest with
        # 'S' and upgrades the connection (real PG's ssl=on); without,
        # 'N' and the client may continue cleartext (ssl=off).
        self._ssl_ctx: _ssl.SSLContext | None = None
        self._cert_der: bytes | None = None
        if ssl_cert is not None:
            from moonlink_spark.tlsutil import server_context

            self._ssl_ctx = server_context(ssl_cert, ssl_key or ssl_cert)
            with open(ssl_cert, "rb") as fh:
                pem = fh.read()
            self._cert_der = _ssl.PEM_cert_to_DER_cert(pem.decode())
        if password is not None and auth == "scram-sha-256":
            # the server stores the VERIFIER, never the password —
            # exactly pg_authid's SCRAM-SHA-256$<i>:<salt>$<stored>:<server>
            import os as _os

            self._scram_salt = _os.urandom(16)
            self._scram_iterations = 4096
            salted = _scram_salted_password(
                password, self._scram_salt, self._scram_iterations
            )
            _ck, self._scram_stored_key, self._scram_server_key = (
                _scram_keys(salted)
            )

    @staticmethod
    def err(code: str, message: str) -> bytes:
        return _msg(
            b"E",
            b"S" + _cstr("ERROR") + b"C" + _cstr(code) + b"M" + _cstr(message)
            + b"\x00",
        )

    def handshake(self, sock, f, on_cancel=None):
        """Startup + auth. Returns ``(sock, f, params)`` — possibly
        TLS-upgraded, with the decoded startup parameters — after
        AuthenticationOk, or None on any refusal/disconnect (including
        a CancelRequest connection, which is dispatched to ``on_cancel``
        and never answered, per the spec). Callers send their own
        post-auth tail (ParameterStatus / BackendKeyData /
        ReadyForQuery)."""
        while True:
            head = f.read(4)
            if len(head) < 4:
                return None
            (n,) = struct.unpack(">I", head)
            # a garbage startup frame (bad length, truncated body) is a
            # protocol violation, not a server thread crash: refuse and
            # close, like real PG's "invalid length of startup packet"
            if n < 8 or n > (1 << 20):
                try:
                    sock.sendall(
                        self.err("08P01", f"invalid startup packet length {n}")
                    )
                except OSError:
                    pass
                return None
            body = f.read(n - 4)
            if len(body) < n - 4:
                return None  # peer vanished mid-startup
            (code,) = struct.unpack_from(">I", body, 0)
            if code == _SSL_REQUEST:
                if self._ssl_ctx is None:
                    sock.sendall(b"N")  # no TLS; client may continue
                    continue
                # 'S' then the TLS handshake on the same socket (real
                # PG's ssl=on). The read-ahead buffer is empty here: the
                # client waits for this byte before its ClientHello.
                sock.sendall(b"S")
                try:
                    sock = self._ssl_ctx.wrap_socket(sock, server_side=True)
                except _ssl.SSLError:
                    return None
                f = sock.makefile("rb")
                continue
            if code == _CANCEL_REQUEST:
                # [code:4][pid:4][key:4]: dispatch to the owner iff the
                # secret key matches. No response is ever sent.
                if len(body) >= 12 and on_cancel is not None:
                    pid, key = struct.unpack_from(">II", body, 4)
                    on_cancel(pid, key)
                return None
            if code != _PROTO_V3:
                sock.sendall(self.err("0A000", f"bad protocol {code}"))
                return None
            # startup parameters: key\0value\0...\0 — MD5 auth hashes the
            # startup user into the inner digest, so keep it
            kv = body[4:].split(b"\x00")
            params = dict(zip(kv[0::2], kv[1::2]))
            # local, NOT instance state: concurrent handshakes on the
            # threading server must not see each other's startup user
            startup_user = params.get(b"user", b"").decode("utf-8")
            break
        if self.password is not None and self.auth == "scram-sha-256":
            if not self._scram_handshake(sock, f):
                return None
        elif self.password is not None and self.auth == "md5":
            import hashlib as _hl
            import os as _os

            salt = _os.urandom(4)
            sock.sendall(_msg(b"R", struct.pack(">I", 5) + salt))
            t, b = _read_msg(f)
            # the server may store just the md5(pw+user) inner hash, the
            # pg_authid md5 verifier shape — it never needs the password
            inner = _hl.md5(
                self.password.encode() + startup_user.encode()
            ).hexdigest()
            want = "md5" + _hl.md5(inner.encode() + salt).hexdigest()
            if t != b"p" or b.rstrip(b"\x00").decode() != want:
                sock.sendall(
                    self.err("28P01", "password authentication failed")
                )
                return None
        elif self.password is not None:
            sock.sendall(_msg(b"R", struct.pack(">I", 3)))  # cleartext
            t, b = _read_msg(f)
            if t != b"p" or b.rstrip(b"\x00").decode() != self.password:
                sock.sendall(
                    self.err("28P01", "password authentication failed")
                )
                return None
        sock.sendall(_msg(b"R", struct.pack(">I", 0)))  # AuthenticationOk
        return sock, f, params

    def _scram_handshake(self, sock, f) -> bool:
        """Server side of RFC 5802 over the PG SASL messages: R code 10
        (mechanism list) -> SASLInitialResponse -> R code 11
        (server-first) -> SASLResponse (client-final, proof verified
        against the stored key) -> R code 12 (server signature) -> Ok.

        Over TLS the server additionally offers SCRAM-SHA-256-PLUS
        (RFC 7677): the client-final c= attribute must then carry the
        tls-server-end-point hash of THIS server's certificate, and a
        "y" GS2 header is rejected as a downgrade (RFC 5802 §6.1 — the
        client claimed binding support while pretending the server
        offered none)."""
        import base64
        import hashlib
        import hmac as _hmac
        import os as _os

        tls_active = isinstance(sock, _ssl.SSLSocket)
        offer_plus = tls_active and self._cert_der is not None
        mech_list = (
            _cstr(_SCRAM_MECH_PLUS) + _cstr(_SCRAM_MECH)
            if offer_plus
            else _cstr(_SCRAM_MECH)
        )
        sock.sendall(
            _msg(b"R", struct.pack(">I", 10) + mech_list + b"\x00")
        )
        t, b = _read_msg(f)
        if t != b"p":
            sock.sendall(self.err("28000", f"expected SASL, got {t!r}"))
            return False
        mech_end = b.index(b"\x00")
        mech = b[:mech_end].decode()
        if mech not in (_SCRAM_MECH, _SCRAM_MECH_PLUS) or (
            mech == _SCRAM_MECH_PLUS and not offer_plus
        ):
            sock.sendall(self.err("28000", "unsupported SASL mechanism"))
            return False
        (ilen,) = struct.unpack_from(">I", b, mech_end + 1)
        initial = b[mech_end + 5 : mech_end + 5 + ilen].decode("utf-8")
        gs2: str | None = None
        for prefix in ("n,,", "y,,", f"p={_CB_TYPE},,"):
            if initial.startswith(prefix):
                gs2 = prefix
                break
        if gs2 is None or (mech == _SCRAM_MECH_PLUS) != gs2.startswith("p="):
            sock.sendall(self.err("28000", "bad GS2 header"))
            return False
        if gs2.startswith("y") and offer_plus:
            # downgrade detection: we DID advertise -PLUS, so a binding-
            # capable client claiming we did not is a stripped offer
            sock.sendall(
                self.err("28000", "channel binding downgrade detected")
            )
            return False
        want_cbind = gs2.encode("utf-8")
        if gs2.startswith("p="):
            from moonlink_spark.tlsutil import cert_fingerprint_for_binding

            want_cbind += cert_fingerprint_for_binding(self._cert_der)
        want_c = base64.b64encode(want_cbind).decode()
        first_bare = initial.split(",,", 1)[1]
        cnonce = _scram_parse(first_bare)["r"]
        snonce = cnonce + base64.b64encode(_os.urandom(18)).decode()
        server_first = (
            f"r={snonce},s="
            f"{base64.b64encode(self._scram_salt).decode()},"
            f"i={self._scram_iterations}"
        )
        sock.sendall(
            _msg(b"R", struct.pack(">I", 11) + server_first.encode("utf-8"))
        )
        t, b = _read_msg(f)
        if t != b"p":
            sock.sendall(self.err("28000", f"expected SASL, got {t!r}"))
            return False
        client_final = b.decode("utf-8")
        fields = _scram_parse(client_final)
        final_no_proof = client_final.rsplit(",p=", 1)[0]
        auth_message = ",".join((first_bare, server_first, final_no_proof))
        if fields.get("r") != snonce or fields.get("c") != want_c:
            sock.sendall(self.err("28P01", "SCRAM nonce/channel mismatch"))
            return False
        # recover ClientKey from the proof and check SHA256(ClientKey)
        # against the stored key — the server never needs the password
        sig = _scram_hmac(self._scram_stored_key, auth_message)
        proof = base64.b64decode(fields.get("p", ""))
        client_key = bytes(a ^ x for a, x in zip(proof, sig))
        if not _hmac.compare_digest(
            hashlib.sha256(client_key).digest(), self._scram_stored_key
        ):
            sock.sendall(
                self.err("28P01", "password authentication failed")
            )
            return False
        server_sig = _scram_hmac(self._scram_server_key, auth_message)
        final = "v=" + base64.b64encode(server_sig).decode()
        sock.sendall(
            _msg(b"R", struct.pack(">I", 12) + final.encode("utf-8"))
        )
        return True


class PgMockServer:
    """Protocol-v3 server over a SQLite database file.

    The wire is real; the executor is SQLite, which shares PG's SQL
    core for everything the metadata store and COPY leg emit. PG-isms
    translated: ``information_schema.tables`` probes become
    ``sqlite_master`` lookups (SQLite accepts the ``JSON`` type name
    as-is). ``password`` enables cleartext auth — wrong or missing
    passwords get a fatal 28P01 ErrorResponse, the server's
    fail-loud stand-in for real HBA.

    Source-database role (the initial-copy leg, ``pg_replicate/
    postgres_source.rs`` shape): ``SELECT pg_export_snapshot(),
    pg_current_wal_lsn()`` atomically freezes every user table into
    snapshot tables and returns (snapshot id, boundary LSN) — the mock's
    stand-in for PG's exported-snapshot + WAL boundary; a connection
    that then issues ``SET TRANSACTION SNAPSHOT '<id>'`` has its reads
    and COPYs served from the frozen state, so N sharded readers on N
    connections observe one consistent snapshot while writers keep
    committing. Every INSERT/UPDATE/DELETE advances the server's WAL
    LSN counter."""

    def __init__(
        self,
        db_path: str,
        host: str = "127.0.0.1",
        port: int = 0,
        password: str | None = None,
        auth: str = "password",
        ssl_cert: str | None = None,
        ssl_key: str | None = None,
        chaos: dict | None = None,
    ):
        self.db_path = db_path
        self.password = password
        # Deterministic crash injection (the Kafka broker's drop_every
        # counterpart). Keys:
        #   commit_crash: "before" | "after" — tear the connection down
        #     around the Nth writer COMMIT ("before": the txn is lost and
        #     rolls back on disconnect; "after": the commit is durable
        #     but the client never hears CommandComplete — the classic
        #     in-doubt commit). commit_crash_at: N (default 1).
        #   copy_drop_after: int — kill the first COPY OUT stream to
        #     emit that many CopyData messages.
        #   copyin_drop_after: int — kill the first COPY FROM STDIN
        #     stream to receive that many CopyData frames (the torn
        #     bulk-load: nothing inserts, the client sees a dead socket).
        # Each hook fires ONCE per server (chaos_fired counts), so a
        # client retry against the same server observes recovery.
        self.chaos = dict(chaos or {})
        self.chaos_fired = {"commit": 0, "copy": 0, "copyin": 0}
        self._chaos_lock = threading.Lock()
        # live backends by pid -> (secret key, sqlite conn) for
        # CancelRequest dispatch (conn.interrupt() is documented
        # thread-safe, the one SQLite call that is)
        self._backends: dict[int, tuple[int, Any]] = {}
        self._backend_lock = threading.Lock()
        self._backend_seq = 0
        self._commit_ordinal = 0
        self._exported_snaps: set[str] = set()
        # startup/auth/TLS shared with the replication wire (ServerAuth)
        self._auth = ServerAuth(
            password=password, auth=auth, ssl_cert=ssl_cert, ssl_key=ssl_key
        )
        self.auth = auth
        os.makedirs(os.path.dirname(os.path.abspath(db_path)), exist_ok=True)
        # WAL position: advanced under _snap_lock when writes become
        # VISIBLE — at statement end for autocommit writes, at COMMIT for
        # explicit transactions — so pg_export_snapshot()'s (freeze, LSN)
        # capture is atomic with respect to concurrent writers and never
        # counts rows the frozen tables do not contain
        self.lsn = 0
        self._snap_lock = threading.Lock()
        server = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                server._serve_conn(self.request)

        class TCP(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._tcp = TCP((host, port), Handler)
        self.host, self.port = self._tcp.server_address
        self._thread: threading.Thread | None = None

    # -- lifecycle ----------------------------------------------------------

    def start(self) -> "PgMockServer":
        self._thread = threading.Thread(
            target=self._tcp.serve_forever, name="pgmock-server", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._tcp.shutdown()
        self._tcp.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
        # snapshot database files are full copies of every user table;
        # nothing else reclaims them (review r10) — a snapshot's
        # lifetime is bounded by the exporting server's, like real PG's
        # exported snapshots dying with the exporting backend
        for snap_id in list(getattr(self, "_exported_snaps", ())):
            try:
                os.unlink(self._snap_db_path(snap_id))
            except OSError:
                pass
            self._exported_snaps.discard(snap_id)

    # -- connection ---------------------------------------------------------

    def _serve_conn(self, sock: socket.socket) -> None:
        f = sock.makefile("rb")
        with self._backend_lock:
            self._backend_seq += 1
            backend_pid = self._backend_seq
        backend_key = int.from_bytes(os.urandom(4), "big")
        try:
            upgraded = self._handshake(sock, f, backend_pid, backend_key)
            if upgraded is None:
                return
            # the handshake may have upgraded the connection to TLS —
            # everything from the startup packet on rides the new socket
            sock, f = upgraded
            conn = sqlite3.connect(self.db_path, timeout=30.0)
            conn.isolation_level = None  # explicit BEGIN/COMMIT pass through
            conn.execute("PRAGMA busy_timeout = 30000")
            conn.execute("PRAGMA journal_mode = WAL")  # concurrent readers
            with self._backend_lock:
                self._backends[backend_pid] = (backend_key, conn)
            state: dict[str, Any] = {"snapshot": None}
            ext: dict[str, Any] = {"stmts": {}, "portals": {}, "failed": False}
            try:
                while True:
                    t, body = _read_msg(f)
                    try:
                        if t == b"X":
                            return
                        if t == b"Q":
                            sql = body.rstrip(b"\x00").decode("utf-8")
                            self._run_query(sock, f, conn, sql, state)
                            continue
                        if t in (b"P", b"B", b"D", b"E", b"C", b"H", b"S"):
                            self._run_extended(sock, conn, t, body, state, ext)
                            continue
                    except (
                        struct.error,
                        ValueError,
                        IndexError,
                        UnicodeDecodeError,
                    ) as e:
                        # malformed message BODY: protocol violation —
                        # answer 08P01 and close (framing can no longer
                        # be trusted), never an unhandled thread crash
                        try:
                            sock.sendall(
                                self._err("08P01", f"malformed {t!r}: {e}")
                            )
                        except OSError:
                            pass
                        return
                    sock.sendall(self._err("08P01", f"unexpected {t!r}"))
                    sock.sendall(self._ready(state))
            finally:
                with self._backend_lock:
                    self._backends.pop(backend_pid, None)
                conn.close()
        except _ChaosKill:
            # injected crash: conn.close() above already rolled back any
            # open transaction; fall through to the abrupt socket close
            return
        except (ConnectionError, OSError):
            return
        finally:
            try:
                f.close()
                sock.close()
            except OSError:
                pass

    def _handshake(self, sock, f, backend_pid: int = 0, backend_key: int = 0):
        """Startup + auth (delegated to ServerAuth, shared with the
        replication wire server). Returns (sock, f) — possibly
        TLS-upgraded — on success, None on any refusal/disconnect
        (including a CancelRequest connection, which is dispatched and
        never answered, per the spec)."""

        def on_cancel(pid: int, key: int) -> None:
            # interrupt the target backend's in-flight statement iff the
            # secret key matches — it fails with 57014
            with self._backend_lock:
                hit = self._backends.get(pid)
            if hit is not None and hit[0] == key:
                hit[1].interrupt()

        res = self._auth.handshake(sock, f, on_cancel=on_cancel)
        if res is None:
            return None
        sock, f, _params = res
        sock.sendall(
            _msg(b"S", _cstr("server_version") + _cstr("16.0 (moonlink-mock)"))
        )
        sock.sendall(_msg(b"K", struct.pack(">II", backend_pid, backend_key)))
        sock.sendall(_msg(b"Z", b"I"))
        return sock, f


    # -- query execution ----------------------------------------------------

    def _chaos_commit_ordinal(self) -> int:
        with self._chaos_lock:
            self._commit_ordinal += 1
            return self._commit_ordinal

    def _chaos_maybe_kill_commit(self, phase: str, ordinal: int) -> None:
        if self.chaos.get("commit_crash") != phase:
            return
        if ordinal != int(self.chaos.get("commit_crash_at", 1)):
            return
        with self._chaos_lock:
            if self.chaos_fired["commit"]:
                return
            self.chaos_fired["commit"] += 1
        raise _ChaosKill(f"commit crash ({phase})")

    def _chaos_copy_tick(self, sent: int) -> None:
        after = self.chaos.get("copy_drop_after")
        if after is None or sent < int(after):
            return
        with self._chaos_lock:
            if self.chaos_fired["copy"]:
                return
            self.chaos_fired["copy"] += 1
        raise _ChaosKill("copy stream crash")

    def _chaos_copyin_tick(self, received: int) -> None:
        after = self.chaos.get("copyin_drop_after")
        if after is None or received < int(after):
            return
        with self._chaos_lock:
            if self.chaos_fired["copyin"]:
                return
            self.chaos_fired["copyin"] += 1
        raise _ChaosKill("copy-in stream crash")

    def _run_query(
        self,
        sock,
        f,
        conn: sqlite3.Connection,
        sql: str,
        state: dict[str, Any],
    ) -> None:
        try:
            m = _COPY_RE.match(sql)
            if m is not None:
                self._run_copy_out(
                    sock, conn, self._snapshot_rewrite(conn, m.group(1), state)
                )
            elif (m := _COPY_IN_RE.match(sql)) is not None:
                self._run_copy_in(
                    sock, f, conn, m.group(1), m.group(2), state
                )
            else:
                self._run_simple(sock, conn, sql, state)
        except _PgUserError as e:
            self._mark_txn_failed(state)
            sock.sendall(self._err(e.sqlstate, str(e)))
        except sqlite3.Error as e:
            self._mark_txn_failed(state)
            sock.sendall(self._err(_sqlite_sqlstate(e), str(e)))
        except Exception as e:  # noqa: BLE001 — protocol boundary
            self._mark_txn_failed(state)
            sock.sendall(self._err("XX000", str(e)))
        sock.sendall(self._ready(state))

    @staticmethod
    def _mark_txn_failed(state: dict[str, Any]) -> None:
        """Real-PG rule: an error inside an explicit transaction ABORTS
        it — every later statement fails 25P02 until ROLLBACK (or COMMIT,
        which rolls back). Errors in autocommit mark nothing."""
        if state.get("in_txn"):
            state["txn_failed"] = True

    @staticmethod
    def _ready(state: dict[str, Any]) -> bytes:
        """ReadyForQuery with the real status byte: I idle, T in an open
        transaction block, E in a failed one (drivers track this)."""
        status = (
            b"E" if state.get("txn_failed")
            else b"T" if state.get("in_txn")
            else b"I"
        )
        return _msg(b"Z", status)

    # -- extended query protocol (Parse/Bind/Describe/Execute/Sync) ----------

    def _run_extended(
        self, sock, conn, t: bytes, body: bytes, state, ext
    ) -> None:
        """One extended-protocol message. After an error, everything
        until Sync is discarded (the spec's error-recovery rule); Sync
        answers ReadyForQuery and clears the failed flag."""
        if t == b"S":  # Sync
            ext["failed"] = False
            if not state.get("in_txn"):
                # real-PG portal lifetime: Sync ends the implicit
                # transaction and non-holdable portals die with it — a
                # later Execute of the name is 34000. Inside an explicit
                # BEGIN the transaction (and its suspended portals,
                # i.e. open fetch-size cursors) survives Sync.
                ext["portals"].clear()
            sock.sendall(self._ready(state))
            return
        if ext["failed"]:
            return  # skip-until-Sync
        try:
            if t == b"P":
                self._ext_parse(sock, body, ext)
            elif t == b"B":
                self._ext_bind(sock, body, ext)
            elif t == b"D":
                self._ext_describe(sock, conn, body, state, ext)
            elif t == b"E":
                self._ext_execute(sock, conn, body, state, ext)
            elif t == b"C":  # Close statement/portal
                kind, name = chr(body[0]), body[1:].split(b"\x00")[0].decode()
                (ext["stmts"] if kind == "S" else ext["portals"]).pop(
                    name, None
                )
                sock.sendall(_msg(b"3", b""))  # CloseComplete
            elif t == b"H":  # Flush: no-op (we never buffer)
                pass
        except _PgUserError as e:
            ext["failed"] = True
            self._mark_txn_failed(state)
            sock.sendall(self._err(e.sqlstate, str(e)))
        except sqlite3.Error as e:
            ext["failed"] = True
            self._mark_txn_failed(state)
            sock.sendall(self._err(_sqlite_sqlstate(e), str(e)))
        except Exception as e:  # noqa: BLE001 — protocol boundary
            ext["failed"] = True
            self._mark_txn_failed(state)
            sock.sendall(self._err("XX000", str(e)))

    @staticmethod
    def _ext_parse(sock, body: bytes, ext) -> None:
        # stmt name \0 query \0 int16 nparam-oids + oids
        z1 = body.index(b"\x00")
        z2 = body.index(b"\x00", z1 + 1)
        name = body[:z1].decode()
        query = body[z1 + 1 : z2].decode("utf-8")
        (n,) = struct.unpack_from(">h", body, z2 + 1)
        oids = list(
            struct.unpack_from(f">{n}I", body, z2 + 3)
        ) if n else []
        ext["stmts"][name] = (query, oids)
        sock.sendall(_msg(b"1", b""))  # ParseComplete

    @staticmethod
    def _decode_param(raw: bytes | None, oid: int, fmt: int = 0):
        """Bind parameter -> Python value by declared type OID. Both
        wire formats are accepted: text (format 0 — what our client
        sends) and binary (format 1 — what tokio-postgres, the
        reference's driver, sends by default: big-endian ints/floats,
        one-byte bools, UTF-8 text)."""
        if raw is None:
            return None
        if fmt == 1:  # binary
            if oid in (20, 21, 23):  # int8/int2/int4, big-endian signed
                return int.from_bytes(raw, "big", signed=True)
            if oid == 700:
                return struct.unpack(">f", raw)[0]
            if oid == 701:
                return struct.unpack(">d", raw)[0]
            if oid == 16:
                return raw != b"\x00"
            return raw.decode("utf-8")  # text/varchar/json
        text = raw.decode("utf-8")
        if oid in (20, 21, 23):  # int8/int2/int4
            return int(text)
        if oid in (700, 701, 1700):  # float4/float8/numeric
            return float(text)
        if oid == 16:  # bool
            return text in ("t", "true", "TRUE", "1")
        return text  # text/varchar/json/unknown: bind as string

    def _ext_bind(self, sock, body: bytes, ext) -> None:
        z1 = body.index(b"\x00")
        z2 = body.index(b"\x00", z1 + 1)
        portal = body[:z1].decode()
        stmt = body[z1 + 1 : z2].decode()
        if stmt not in ext["stmts"]:
            raise _PgUserError("26000", f"unknown statement {stmt!r}")
        pos = z2 + 1
        (nfmt,) = struct.unpack_from(">h", body, pos)
        pos += 2
        fmts = list(struct.unpack_from(f">{nfmt}h", body, pos))
        pos += 2 * nfmt
        (nparams,) = struct.unpack_from(">h", body, pos)
        pos += 2
        raws: list[bytes | None] = []
        for _ in range(nparams):
            (ln,) = struct.unpack_from(">i", body, pos)
            pos += 4
            if ln < 0:
                raws.append(None)
            else:
                raws.append(body[pos : pos + ln])
                pos += ln
        query, oids = ext["stmts"][stmt]

        # per the spec: zero format codes = all text; one = applies to
        # every parameter; else one per parameter
        def fmt_of(i: int) -> int:
            if not fmts:
                return 0
            return fmts[0] if len(fmts) == 1 else fmts[i]

        params = [
            self._decode_param(
                raw, oids[i] if i < len(oids) else 0, fmt_of(i)
            )
            for i, raw in enumerate(raws)
        ]
        # trailing result-format codes (spec: 0 = all text, 1 = applies
        # to every column, else per column). Every result column here is
        # declared OID 25 (text), whose BINARY wire form is the raw
        # UTF-8 string — byte-identical to text — so honoring a binary
        # request means echoing the format code in RowDescription; the
        # DataRow bytes are the same either way. tokio-postgres and
        # psycopg3 request binary results by default.
        rfmts: list[int] = []
        if pos + 2 <= len(body):
            (nrf,) = struct.unpack_from(">h", body, pos)
            pos += 2
            rfmts = list(struct.unpack_from(f">{nrf}h", body, pos))
        ext["portals"][portal] = {
            "query": query,
            "params": params,
            "result": None,
            "result_formats": rfmts,
        }
        sock.sendall(_msg(b"2", b""))  # BindComplete

    def _ext_run_portal(self, conn, portal: dict, state) -> None:
        """Substitute $n parameters and run through the shared execution
        core exactly once per portal (Describe caches for Execute).
        Values are inlined as literals server-side — safe by
        construction: they arrived as separate protocol fields, so no
        user-controlled quoting ever reaches the parser."""
        if portal["result"] is not None:
            return

        sql = substitute_params(portal["query"], portal["params"])
        portal["result"] = self._exec_statement(conn, sql, state)

    def _ext_describe(self, sock, conn, body: bytes, state, ext) -> None:
        kind, name = chr(body[0]), body[1:].split(b"\x00")[0].decode()
        if kind == "S":
            if name not in ext["stmts"]:
                raise _PgUserError(
                    "26000", f"prepared statement {name!r} does not exist"
                )
            if state.get("txn_failed"):
                # real PG: Describe inside an aborted transaction errors
                # (25P02) and the error recovery skips to Sync — the
                # probe's broad except must never turn this into NoData
                raise _PgUserError(
                    "25P02",
                    "current transaction is aborted, commands ignored "
                    "until end of transaction block",
                )
            query, oids = ext["stmts"][name]
            sock.sendall(  # ParameterDescription
                _msg(
                    b"t",
                    struct.pack(">h", len(oids))
                    + b"".join(struct.pack(">I", o) for o in oids),
                )
            )
            cols = self._statement_columns(conn, query, state)
            if cols is None:
                sock.sendall(_msg(b"n", b""))  # NoData (DML, no RETURNING)
            else:
                sock.sendall(self._row_description(cols))
            return
        portal = ext["portals"].get(name)
        if portal is None:
            raise _PgUserError("34000", f"unknown portal {name!r}")
        self._ext_run_portal(conn, portal, state)
        cols, _rows, _tag = portal["result"]
        if cols is None:
            sock.sendall(_msg(b"n", b""))  # NoData
        else:
            sock.sendall(
                self._row_description(
                    cols, portal.get("result_formats")
                )
            )

    def _statement_columns(self, conn, query: str, state) -> list[str] | None:
        """Column names of a prepared statement WITHOUT executing it —
        what Describe(statement) must answer (real PG derives this at
        parse time; JDBC and tokio-postgres map result columns from the
        Describe(S) RowDescription BEFORE any Execute). SQLite's Python
        binding cannot prepare-only, so row-returning statements are
        probed through the shared execution core wrapped in a zero-row
        subquery (``SELECT * FROM (<q with $n -> NULL>) WHERE 0``) —
        plans the query, scans nothing, side-effect-free. Anything that
        is not SELECT-shaped answers None (NoData), like real PG for
        DML without RETURNING; a probe failure (a $n somewhere NULL is
        not type-legal) degrades to NoData rather than erroring the
        Describe."""
        import re as _re

        if statement_main_verb(query) not in ("SELECT", "VALUES", "TABLE"):
            return None
        # parameter count by lexeme scan ($n only lives in plain text;
        # $1 never matches the dollar-quote tag, which can't be numeric)
        text_only = "".join(
            t for k, t in _lex_sql(query) if k == "text"
        )
        nparams = max(
            (int(m) for m in _re.findall(r"\$(\d+)", text_only)), default=0
        )
        try:
            probe = substitute_params(query, [None] * nparams)
            wrapped = f"SELECT * FROM ({probe.strip().rstrip(';')}) WHERE 0"
            cols, _rows, _tag = self._exec_statement(conn, wrapped, state)
            return cols
        except Exception:  # noqa: BLE001 — describe must not fail the txn
            return None

    def _ext_execute(self, sock, conn, body: bytes, state, ext) -> None:
        """Execute with the spec's max-rows field honored: a positive
        limit streams at most that many rows and answers PortalSuspended
        (``s``) with the portal position kept, so a re-Execute of the
        same portal resumes where it left off — the mechanism behind
        JDBC ``setFetchSize`` and tokio-postgres streamed reads. Zero
        means no limit. The CommandComplete row count is cumulative
        across resumes (PG's ``es_processed`` accumulates per portal)."""
        z = body.index(b"\x00")
        name = body[:z].decode()
        (max_rows,) = struct.unpack_from(">i", body, z + 1)
        portal = ext["portals"].get(name)
        if portal is None:
            raise _PgUserError("34000", f"unknown portal {name!r}")
        self._ext_run_portal(conn, portal, state)
        cols, rows, tag = portal["result"]
        if cols is None:
            sock.sendall(_msg(b"C", _cstr(tag)))
            return
        pos = portal.get("pos", 0)
        remaining = rows[pos:]
        if max_rows > 0 and len(remaining) > max_rows:
            for r in remaining[:max_rows]:
                sock.sendall(self._data_row(r))
            portal["pos"] = pos + max_rows
            sock.sendall(_msg(b"s", b""))  # PortalSuspended
            return
        for r in remaining:
            sock.sendall(self._data_row(r))
        portal["pos"] = len(rows)
        sock.sendall(_msg(b"C", _cstr(tag)))

    _TXN_VERBS = frozenset({"BEGIN", "COMMIT", "END", "ROLLBACK", "ABORT"})
    # verbs that can NEVER write; everything else (incl. WITH-led CTEs
    # and unrecognized verbs) is conservatively treated as a write for
    # the implicit-transaction wrap
    _READ_VERBS = frozenset({"SELECT", "VALUES", "SHOW", "EXPLAIN", "TABLE"})

    def _run_simple(
        self, sock, conn, sql: str, state: dict[str, Any]
    ) -> None:
        """Simple-Query execution with the protocol's multi-statement
        rules: the string splits at top-level semicolons, each statement
        answers its own result set + CommandComplete, an empty string
        (or comment-only text) answers EmptyQueryResponse, and — the
        real-PG rule tokio-postgres's batch_execute leans on — a
        multi-statement string with no explicit transaction control runs
        as ONE implicit transaction: the first error rolls back every
        statement in the string, and the WAL counter covers all of its
        writes atomically at the end. Statements carrying their own
        BEGIN/COMMIT run sequentially under the explicit-transaction
        machinery instead (COPY inside a multi-statement string is not
        routed and fails loudly)."""
        stmts = split_sql_statements(sql)
        if not stmts:
            sock.sendall(_msg(b"I", b""))  # EmptyQueryResponse
            return
        verbs = {statement_verb(s) for s in stmts}
        # wrap only when the batch can WRITE: the wrap opens BEGIN
        # IMMEDIATE (SQLite's write lock), which a read-only batch must
        # not take — N shard readers would serialize against writers for
        # SELECTs that have no rollback-able effects anyway. Verbs are
        # comment-stripped (statement_verb), and anything that is not a
        # KNOWN read-only verb counts as a potential write — a CTE-led
        # `WITH .. INSERT` or an unrecognized verb must get the
        # implicit-transaction atomicity real PG gives the batch.
        implicit = (
            len(stmts) > 1
            and not state.get("in_txn")
            and not (self._TXN_VERBS & verbs)
            and bool(verbs - self._READ_VERBS)
        )
        if implicit:
            self._exec_statement(conn, "BEGIN", state)
        try:
            for s in stmts:
                cols, rows, tag = self._exec_statement(conn, s, state)
                if cols is not None:
                    sock.sendall(self._row_description(cols))
                    for r in rows:
                        sock.sendall(self._data_row(r))
                sock.sendall(_msg(b"C", _cstr(tag)))
        except Exception:
            if implicit and state.get("in_txn"):
                # implicit transaction: no statement in the string
                # survives the error (a _ChaosKill skips this — the
                # connection teardown's rollback covers it)
                state.pop("txn_failed", None)
                self._exec_statement(conn, "ROLLBACK", state)
            raise
        if implicit:
            self._exec_statement(conn, "COMMIT", state)

    def _exec_statement(
        self, conn, sql: str, state: dict[str, Any]
    ) -> tuple[list[str] | None, list[tuple], str]:
        """Execution core shared by the simple AND extended protocols:
        returns (columns-or-None, rows, CommandComplete tag); raises
        _PgUserError for user-level SQL errors. All transaction / LSN /
        snapshot semantics live here exactly once."""
        if state.get("txn_failed"):
            verb0 = statement_verb(sql)
            if verb0 not in ("ROLLBACK", "ABORT", "COMMIT", "END"):
                raise _PgUserError(
                    "25P02",
                    "current transaction is aborted, commands ignored "
                    "until end of transaction block",
                )
            # real PG: in an aborted transaction ROLLBACK rolls back and
            # COMMIT/END ALSO roll back, answering with a ROLLBACK tag —
            # either way nothing the transaction wrote survives and the
            # WAL counter never covers it
            state.pop("txn_failed", None)
            state.pop("txn_writes", None)
            if not state.pop("reader_txn", False):
                try:
                    conn.execute("ROLLBACK")
                except sqlite3.Error:
                    pass  # SQLite may have auto-rolled-back on the error
            state.pop("in_txn", None)
            self._clear_snapshot(conn, state)
            return None, [], "ROLLBACK"
        # PG-ism translation: dollar quoting + nested block comments
        # for the SQLite executor (same category as the
        # information_schema rewrite below)
        sql = translate_pg_lexemes(sql)
        m = _EXPORT_SNAPSHOT_RE.match(sql)
        if m is not None:
            with_lsn = "pg_current_wal_lsn" in sql
            snap_id, lsn = self._export_snapshot(conn)
            # real PG: an exporting REPEATABLE READ transaction reads its
            # own exported snapshot for the rest of the transaction —
            # mirror that so the control connection's bounds queries see
            # the frozen state without an (illegal-on-PG) SET TRANSACTION
            # SNAPSHOT of its own. An autocommit exporter stays live (its
            # snapshot was per-statement), also like real PG.
            if state.get("in_txn"):
                state["snapshot"] = snap_id
            cols = ["pg_export_snapshot"] + (
                ["pg_current_wal_lsn"] if with_lsn else []
            )
            row = (snap_id,) + ((wal_lsn_str(lsn),) if with_lsn else ())
            return cols, [row], "SELECT 1"
        if _WAL_LSN_RE.match(sql):
            return (
                ["pg_current_wal_lsn"],
                [(wal_lsn_str(self.lsn),)],
                "SELECT 1",
            )
        m = _SET_SNAPSHOT_RE.match(sql)
        if m is not None:
            state["snapshot"] = m.group(1)
            return None, [], "SET"
        sql = _INFO_SCHEMA_RE.sub(
            lambda m: "FROM (SELECT name AS table_name FROM sqlite_master "
            "WHERE type='table') WHERE table_name = "
            + sql_literal(m.group(1)),
            sql,
        )
        # Strip trailing semicolons before verb extraction: an external
        # client sending 'BEGIN;'/'COMMIT;' must hit the in_txn tracking
        # and the snap-lock-guarded LSN bump, not fall through to the
        # bare execute path (which would commit writes the WAL counter
        # never counts and let a snapshot boundary LSN miscover rows).
        sql = sql.strip().rstrip(";").rstrip()
        # comment-stripped verb; WITH-led statements route by their
        # top-level main statement (WITH .. INSERT is a WRITE — the WAL
        # counter must cover its rows and reader txns must reject it)
        verb = statement_verb(sql)
        main_verb = statement_main_verb(sql)
        nwrites: int | None = None  # total_changes delta for DML
        if verb == "BEGIN":
            if state.get("in_txn"):
                # real-PG rule: BEGIN inside an open transaction is a
                # WARNING + no-op — it must NOT flip a writer txn into a
                # reader txn (the later COMMIT would take the reader
                # branch and never commit the underlying SQLite txn:
                # writes acknowledged then silently rolled back at
                # disconnect; review r10)
                return None, [], "BEGIN"
            if "ISOLATION" in sql.upper():
                # snapshot-reader transactions (BEGIN ISOLATION LEVEL
                # REPEATABLE READ) never write and read only immutable
                # frozen state — no underlying SQLite transaction at all,
                # which keeps ATTACH (of the snapshot file) legal and
                # lets N shard readers coexist with open writers
                state["in_txn"] = True
                state["reader_txn"] = True
                state["txn_writes"] = 0
                return None, [], "BEGIN"
            # writer BEGIN takes SQLite's write lock up front: a
            # deferred BEGIN upgrading to write mid-transaction can
            # hit an unwaitable SQLITE_BUSY deadlock against another
            # writer; immediate + busy_timeout serializes cleanly
            sql = "BEGIN IMMEDIATE"
            state["in_txn"] = True
            state["txn_writes"] = 0
        if main_verb in ("SELECT", "VALUES", "TABLE") and verb in (
            "SELECT",
            "WITH",
        ):
            sql = self._snapshot_rewrite(conn, sql, state)
        if main_verb in ("INSERT", "UPDATE", "DELETE"):
            if state.get("reader_txn"):
                # real-PG rule: a snapshot transaction opened with BEGIN
                # ISOLATION LEVEL REPEATABLE READ for import is used
                # read-only here. Silently autocommitting (there is no
                # underlying SQLite txn) would leave a committed row the
                # WAL counter never saw and make ROLLBACK a lie — reject.
                raise _PgUserError(
                    "25006",
                    f"cannot execute {main_verb} in a read-only "
                    "transaction",
                )
            # sqlite3 reports rowcount=-1 for DML it didn't recognize
            # by first token (WITH-led INSERT/UPDATE/DELETE), so count
            # writes by the total_changes delta — exact for every shape
            if state.get("in_txn"):
                # inside an explicit transaction the rows are invisible
                # until COMMIT — the WAL position must not count them yet,
                # or a snapshot exported mid-transaction would carry a
                # boundary LSN covering rows it does not contain (the CDC
                # switchover would then drop those rows' events: loss)
                before = conn.total_changes
                cur = conn.execute(sql)
                nwrites = conn.total_changes - before
                if nwrites > 0:
                    state["txn_writes"] = (
                        state.get("txn_writes", 0) + nwrites
                    )
            else:
                # autocommit write, restated as a short explicit txn so
                # the LOCK ORDER is identical everywhere: SQLite write
                # lock first (BEGIN IMMEDIATE, acquired while holding no
                # Python lock), _snap_lock second, around the COMMIT +
                # LSN bump — the visibility event. Taking _snap_lock
                # around a bare autocommit execute instead inverts the
                # order against an open explicit transaction (it holds
                # SQLite's lock and wants _snap_lock at COMMIT), stalling
                # both until busy_timeout.
                conn.execute("BEGIN IMMEDIATE")
                try:
                    before = conn.total_changes
                    cur = conn.execute(sql)
                    nwrites = conn.total_changes - before
                    with self._snap_lock:
                        conn.execute("COMMIT")
                        if nwrites > 0:
                            self.lsn += nwrites
                except BaseException:
                    try:
                        conn.execute("ROLLBACK")
                    except sqlite3.Error:
                        pass
                    raise
        elif verb == "COMMIT":
            # commit + LSN bump under the snapshot lock: an export sees
            # either (pre-commit tables, pre-bump LSN) or (post, post).
            # Lock order matches the autocommit path: SQLite write lock
            # (held since BEGIN IMMEDIATE) first, _snap_lock second.
            if state.pop("reader_txn", False):
                # no underlying SQLite txn was opened for a reader txn
                state.pop("txn_writes", None)
                state.pop("in_txn", None)
                self._clear_snapshot(conn, state)
                return None, [], "COMMIT"
            ordinal = self._chaos_commit_ordinal()
            # "before": the SQLite txn is still open — conn.close() on
            # the disconnect path rolls it back, so the write is LOST
            # exactly as when a real backend dies pre-commit
            self._chaos_maybe_kill_commit("before", ordinal)
            with self._snap_lock:
                cur = conn.execute(sql)
                self.lsn += state.pop("txn_writes", 0)
            # "after": durable commit, client never hears about it —
            # the in-doubt-commit case every retry loop must tolerate
            self._chaos_maybe_kill_commit("after", ordinal)
            if state.pop("in_txn", False):
                self._clear_snapshot(conn, state)
        elif verb == "ROLLBACK":
            if state.pop("reader_txn", False):
                state.pop("txn_writes", None)
                state.pop("in_txn", None)
                self._clear_snapshot(conn, state)
                return None, [], "ROLLBACK"
            cur = conn.execute(sql)
            state.pop("txn_writes", None)
            if state.pop("in_txn", False):
                self._clear_snapshot(conn, state)
        else:
            cur = conn.execute(sql)
        if cur.description is not None:
            rows = cur.fetchall()
            cols = [d[0] for d in cur.description]
            return cols, rows, f"SELECT {len(rows)}"
        nrows = nwrites if nwrites is not None else max(cur.rowcount, 0)
        if main_verb == "INSERT":
            tag = f"INSERT 0 {nrows}"
        elif main_verb in ("UPDATE", "DELETE"):
            tag = f"{main_verb} {nrows}"
        else:
            tag = verb or "OK"
        return None, [], tag

    # -- snapshot export (source-database role) ------------------------------

    def _snap_db_path(self, snap_id: str) -> str:
        return f"{self.db_path}.snap-{snap_id}.db"

    def _export_snapshot(self, conn) -> tuple[str, int]:
        """Freeze every user table into a SEPARATE snapshot database file
        and return (snapshot id, boundary LSN), atomically w.r.t. writers.

        The freeze writes only the snapshot file, reading main through a
        WAL-mode read snapshot — so an export can proceed while another
        connection holds an OPEN write transaction (its uncommitted rows
        are invisible to the read snapshot AND uncounted in the LSN,
        because commits bump the LSN under the same _snap_lock held for
        the whole freeze). Real PG's MVCC gives exactly this pairing."""
        snap_id = uuid.uuid4().hex[:12]
        self._exported_snaps.add(snap_id)
        sconn = sqlite3.connect(self.db_path, timeout=30.0)
        try:
            sconn.execute("PRAGMA busy_timeout = 30000")
            sconn.execute(
                "ATTACH DATABASE ? AS snap", (self._snap_db_path(snap_id),)
            )
            with self._snap_lock:  # no COMMIT can land during the freeze
                names = [
                    r[0]
                    for r in sconn.execute(
                        "SELECT name FROM sqlite_master WHERE type='table' "
                        "AND name NOT GLOB 'sqlite_*'"
                    )
                ]
                for t in names:
                    sconn.execute(
                        f'CREATE TABLE snap."{t}" AS SELECT * FROM main."{t}"'
                    )
                sconn.commit()
                return snap_id, self.lsn
        finally:
            sconn.close()

    def _clear_snapshot(self, conn, state: dict[str, Any]) -> None:
        """End-of-transaction snapshot unbinding: DETACH every snapshot
        database this connection attached — SQLite caps attached
        databases at 10, so a pooled connection importing snapshots
        repeatedly would otherwise hit 'too many attached databases'."""
        state["snapshot"] = None
        for snap in sorted(state.pop("attached_snaps", set()) or ()):
            try:
                conn.execute(f'DETACH DATABASE "snap_{snap}"')
            except sqlite3.Error:
                pass  # already detached or mid-use elsewhere: best-effort

    def _snapshot_rewrite(
        self, conn, sql: str, state: dict[str, Any]
    ) -> str:
        """Point table references at the connection's frozen snapshot
        (the attached per-snapshot database file)."""
        snap = state.get("snapshot")
        if not snap:
            return sql
        alias = f"snap_{snap}"
        attached = state.setdefault("attached_snaps", set())
        if snap not in attached:
            path = self._snap_db_path(snap)
            if not os.path.exists(path):
                raise PgProtocolError(f"unknown snapshot {snap!r}")
            conn.execute(f'ATTACH DATABASE ? AS "{alias}"', (path,))
            attached.add(snap)
        frozen = [
            r[0]
            for r in conn.execute(
                f'SELECT name FROM "{alias}".sqlite_master '
                "WHERE type='table'"
            )
        ]
        if not frozen:
            raise PgProtocolError(f"unknown snapshot {snap!r}")
        # rewrite only OUTSIDE single-quoted string literals: the name
        # lookarounds don't exclude quote context, so a literal like
        # WHERE kind = 'items' was corrupted into a schema-qualified
        # string (review r10). Split on literals ('' escapes included),
        # rewrite the code segments, reassemble.
        parts = re.split(r"('(?:[^']|'')*')", sql)
        for i in range(0, len(parts), 2):  # even indexes = non-literal SQL
            for t in sorted(frozen, key=len, reverse=True):
                parts[i] = re.sub(
                    rf'(?<![\w"]){re.escape(t)}(?![\w"])',
                    f'"{alias}"."{t}"',
                    parts[i],
                )
        return "".join(parts)

    def _run_copy_out(self, sock, conn, target: str) -> None:
        target = target.strip()
        if target.startswith("("):
            query = target[1:-1]  # COPY (SELECT ...) TO STDOUT
        elif (m := re.match(r'^([\w.\"]+)\s*\(([^)]*)\)$', target)) is not None:
            # COPY tbl (col, ...) TO STDOUT — the reference's primary
            # table-reader shape (pg_replicate/clients/postgres.rs:199)
            query = f"SELECT {m.group(2)} FROM {m.group(1)}"
        else:
            query = f"SELECT * FROM {target}"
        cur = conn.execute(query)
        # CopyOutResponse: overall format 0 (text), per-column formats
        ncols = len(cur.description or ())
        sock.sendall(
            _msg(b"H", struct.pack(">bh", 0, ncols) + b"\x00\x00" * ncols)
        )
        # Batch rows into large CopyData frames (the protocol allows any
        # chunking); one syscall per ~256 KiB instead of per row. A chaos
        # kill mid-copy drops the unflushed tail — same visible effect as a
        # real backend crash between writes.
        n = 0
        buf = bytearray()
        for row in cur:
            buf += copy_text_row(row)
            n += 1
            if len(buf) >= _COPY_FRAME_BYTES:
                sock.sendall(_msg(b"d", bytes(buf)))
                buf.clear()
            self._chaos_copy_tick(n)
        tail = _msg(b"d", bytes(buf)) if buf else b""
        sock.sendall(tail + _msg(b"c", b"") + _msg(b"C", _cstr(f"COPY {n}")))

    def _run_copy_in(
        self, sock, f, conn, table: str, collist: str | None, state
    ) -> None:
        """``COPY ... FROM STDIN`` (text format): ``G`` CopyInResponse,
        then the client streams ``d`` CopyData frames (any row chunking)
        ended by ``c`` CopyDone or ``f`` CopyFail. The whole COPY is ONE
        statement: in autocommit it commits atomically and bumps the LSN
        by the row count under the snapshot lock (same visibility event
        as an autocommit INSERT); inside an explicit transaction the rows
        stay invisible to the WAL counter until COMMIT, exactly like the
        INSERT path. A CopyFail or malformed stream inserts nothing.

        The stream is always consumed to its terminator BEFORE any error
        is raised, so an ErrorResponse never races half-sent CopyData and
        the connection stays usable for the next query."""
        if state.get("txn_failed"):
            # COPY bypassed the aborted-transaction guard _exec_statement
            # enforces: rows would commit in autocommit (the SQLite txn
            # is gone) while txn_writes was later discarded without an
            # LSN bump — durable rows a snapshot boundary never covers
            # (review r10)
            raise _PgUserError(
                "25P02",
                "current transaction is aborted, commands ignored until "
                "end of transaction block",
            )
        if state.get("reader_txn"):
            raise _PgUserError(
                "25006",
                "cannot execute COPY FROM in a read-only transaction",
            )
        cols = (
            [c.strip().strip('"') for c in collist.split(",")]
            if collist and collist.strip()
            else None
        )
        # zero-row probe: validates table/columns BEFORE CopyInResponse
        # (real PG's ordering) and yields the expected field count
        sel = ", ".join(f'"{c}"' for c in cols) if cols else "*"
        probe = conn.execute(f"SELECT {sel} FROM {table} LIMIT 0")
        ncols = len(probe.description)
        ins = (
            f"INSERT INTO {table} "
            + (f"({', '.join(chr(34) + c + chr(34) for c in cols)}) " if cols else "")
            + f"VALUES ({', '.join(['?'] * ncols)})"
        )
        sock.sendall(
            _msg(b"G", struct.pack(">bh", 0, ncols) + b"\x00\x00" * ncols)
        )
        rows: list[list[str | None]] = []
        rest = b""
        fail: tuple[str, str] | None = None  # (sqlstate, message)
        nframes = 0
        while True:
            t, body = _read_msg(f)
            if t == b"d":
                if fail is not None:
                    continue  # already failed: discard until Done/Fail
                try:
                    got, rest = parse_copy_text_rows(body, rest)
                except Exception as e:  # noqa: BLE001 — malformed data
                    # the protocol's error-during-COPY-IN rule: note the
                    # error but keep READING (discarding) until the
                    # client's CopyDone/CopyFail — erroring immediately
                    # would leave its in-flight CopyData frames to desync
                    # the next query on this connection
                    fail = ("22P04", f"invalid COPY data: {e}")
                    continue
                rows.extend(got)
                nframes += 1
                self._chaos_copyin_tick(nframes)
            elif t == b"c":  # CopyDone
                break
            elif t == b"f":  # CopyFail — client-initiated abort
                msg = body.rstrip(b"\x00").decode("utf-8", "replace")
                fail = ("57014", f"COPY from stdin failed: {msg}")
                break
            elif t in (b"H", b"S"):  # Flush/Sync mid-copy: no-ops per spec
                continue
            elif t == b"X":
                raise ConnectionError("terminated mid-COPY")
            else:
                fail = (
                    "08P01",
                    f"unexpected message {t!r} during COPY FROM STDIN",
                )
                break
        if fail is not None:
            raise _PgUserError(*fail)
        if rest:  # unterminated trailing row — still a row, per COPY text
            rows.append(parse_copy_text_row(rest))
        for r in rows:
            if len(r) != ncols:
                raise _PgUserError(
                    "22P04",
                    f"row field count {len(r)} does not match "
                    f"column count {ncols}",
                )
        if state.get("in_txn"):
            conn.executemany(ins, rows)
            if rows:
                state["txn_writes"] = state.get("txn_writes", 0) + len(rows)
        else:
            # lock order identical to the autocommit INSERT path: SQLite
            # write lock first, _snap_lock second around COMMIT + bump
            conn.execute("BEGIN IMMEDIATE")
            try:
                conn.executemany(ins, rows)
                with self._snap_lock:
                    conn.execute("COMMIT")
                    self.lsn += len(rows)
            except BaseException:
                try:
                    conn.execute("ROLLBACK")
                except sqlite3.Error:
                    pass
                raise
        sock.sendall(_msg(b"C", _cstr(f"COPY {len(rows)}")))

    # -- wire encoding ------------------------------------------------------

    @staticmethod
    def _row_description(
        cols: list[str], result_formats: list[int] | None = None
    ) -> bytes:
        # per-column format: [] = all text; [f] = f for every column;
        # else one per column (the Bind result-format resolution rule).
        # Columns are OID 25 (text), whose binary wire form is the raw
        # UTF-8 string, so echoing a requested binary format changes
        # only this declaration — DataRow bytes are identical.
        fmts = result_formats or []

        def fmt_of(i: int) -> int:
            if not fmts:
                return 0
            return fmts[0] if len(fmts) == 1 else fmts[i]

        body = struct.pack(">h", len(cols))
        for i, c in enumerate(cols):
            # table oid 0, attnum 0, type oid 25 (text), typlen -1,
            # atttypmod -1, format per Bind
            body += _cstr(c) + struct.pack(
                ">IhIhih", 0, 0, 25, -1, -1, fmt_of(i)
            )
        return _msg(b"T", body)

    @staticmethod
    def _data_row(row: tuple) -> bytes:
        body = struct.pack(">h", len(row))
        for v in row:
            if v is None:
                body += struct.pack(">i", -1)
            else:
                enc = str(v).encode("utf-8")
                body += struct.pack(">i", len(enc)) + enc
        return _msg(b"D", body)

    _err = staticmethod(ServerAuth.err)


# ---------------------------------------------------------------------------
# COPY text format (protocol + `COPY` docs: tab-delimited, \N for NULL)
# ---------------------------------------------------------------------------

_COPY_FRAME_BYTES = 256 * 1024  # server-side CopyData batching threshold

_COPY_ESCAPES = {
    "\\": "\\\\", "\b": "\\b", "\f": "\\f", "\n": "\\n",
    "\r": "\\r", "\t": "\\t", "\v": "\\v",
}
_COPY_UNESCAPES = {
    "\\": "\\", "b": "\b", "f": "\f", "n": "\n",
    "r": "\r", "t": "\t", "v": "\v", "N": None,
}


def copy_text_row(row: tuple) -> bytes:
    """Encode one row in COPY text format."""
    cells = []
    for v in row:
        if v is None:
            cells.append("\\N")
        else:
            s = str(v)
            for raw, esc in _COPY_ESCAPES.items():
                s = s.replace(raw, esc)
            cells.append(s)
    return ("\t".join(cells) + "\n").encode("utf-8")


def parse_copy_text_rows(frame: bytes, rest: bytes = b"") -> tuple[list[list[str | None]], bytes]:
    """Decode a multi-row CopyData frame in COPY text format.

    ``rest`` is the partial trailing row carried over from the previous
    frame (frames may end mid-row). Returns ``(rows, new_rest)``. Lines
    without a backslash — the overwhelming majority in real data — take a
    single decode+split; only lines containing escapes (or ``\\N`` NULLs,
    which necessarily contain a backslash) fall back to the per-character
    parser."""
    if rest:
        frame = rest + frame
    lines = frame.split(b"\n")
    new_rest = lines.pop()
    rows: list[list[str | None]] = []
    for line in lines:
        if b"\\" in line:
            rows.append(parse_copy_text_row(line))
        else:
            rows.append(line.decode("utf-8").split("\t"))
    return rows, new_rest


def parse_copy_text_row(data: bytes) -> list[str | None]:
    """Decode one COPY-text row (a single newline-terminated line)."""
    s = data.decode("utf-8")
    if s.endswith("\n"):
        s = s[:-1]
    out: list[str | None] = []
    cell: list[str] = []
    is_null = False
    i = 0
    while i <= len(s):
        ch = s[i] if i < len(s) else "\t"  # sentinel flushes the last cell
        if ch == "\t":
            out.append(None if is_null else "".join(cell))
            cell, is_null = [], False
        elif ch == "\\" and i + 1 < len(s):
            i += 1
            nxt = s[i]
            rep = _COPY_UNESCAPES.get(nxt, nxt)
            if rep is None:  # \N alone in a cell = NULL
                is_null = True
            else:
                cell.append(rep)
        else:
            cell.append(ch)
        i += 1
    return out
