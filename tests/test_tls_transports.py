"""TLS on the wire transports (reference parity: tokio-postgres
sslmode, rustls-backed reqwest for S3/GCS, rdkafka security.protocol).

Each transport's server is started with a per-test minted cert signed
by a per-test CA; clients verify against the PINNED CA (the
verify-full deployment shape) — never verification-off."""

from __future__ import annotations

import pytest

from moonlink_spark.tlsutil import mint_test_tls


@pytest.fixture(scope="module")
def tls(tmp_path_factory):
    return mint_test_tls(str(tmp_path_factory.mktemp("tls")))


# --------------------------------------------------------------------------- #
# PG wire
# --------------------------------------------------------------------------- #


def _pg_server(tmp_path, tls, **kw):
    from moonlink_spark.pg_protocol import PgMockServer

    return PgMockServer(
        str(tmp_path / "pg.db"),
        ssl_cert=tls.cert_path,
        ssl_key=tls.key_path,
        **kw,
    ).start()


def test_pg_verify_full_roundtrip(tmp_path, tls):
    from moonlink_spark.pg_protocol import PgWireClient

    srv = _pg_server(tmp_path, tls)
    try:
        c = PgWireClient(
            srv.host,
            srv.port,
            sslmode="verify-full",
            ssl_ca_file=tls.ca_path,
        )
        assert c._tls_cert_der is not None  # TLS actually negotiated
        c.query("CREATE TABLE t (id INTEGER, v TEXT)")
        c.query_params("INSERT INTO t VALUES ($1, $2)", [1, "over-tls"])
        r = c.query("SELECT v FROM t WHERE id = 1")
        assert r.rows == [("over-tls",)]
        # COPY OUT over the encrypted channel
        rows = list(c.copy_out("COPY (SELECT * FROM t) TO STDOUT"))
        assert rows == [b"1\tover-tls\n"]
        c.close()
    finally:
        srv.stop()


def test_pg_untrusted_ca_rejected(tmp_path, tmp_path_factory, tls):
    """A client pinning a DIFFERENT CA must fail the handshake — proof
    the chain is actually verified, not just encrypted."""
    import ssl

    from moonlink_spark.pg_protocol import PgWireClient

    other = mint_test_tls(str(tmp_path_factory.mktemp("otherca")))
    srv = _pg_server(tmp_path, tls)
    try:
        with pytest.raises(ssl.SSLError):
            PgWireClient(
                srv.host,
                srv.port,
                sslmode="verify-full",
                ssl_ca_file=other.ca_path,
            )
    finally:
        srv.stop()


def test_pg_sslmode_require_against_plaintext_server_fails(tmp_path):
    from moonlink_spark.pg_protocol import (
        PgMockServer,
        PgProtocolError,
        PgWireClient,
    )

    srv = PgMockServer(str(tmp_path / "plain.db")).start()
    try:
        with pytest.raises(PgProtocolError, match="refused TLS"):
            PgWireClient(srv.host, srv.port, sslmode="require")
        # prefer falls back to cleartext and works
        c = PgWireClient(srv.host, srv.port, sslmode="prefer")
        assert c._tls_cert_der is None
        assert c.query("SELECT 1 AS one").rows == [("1",)]
        c.close()
    finally:
        srv.stop()


@pytest.mark.parametrize("auth", ["password", "md5", "scram-sha-256"])
def test_pg_auth_methods_over_tls(tmp_path, tls, auth):
    from moonlink_spark.pg_protocol import (
        PgServerError,
        PgWireClient,
    )

    srv = _pg_server(tmp_path, tls, password="sekret", auth=auth)
    try:
        c = PgWireClient(
            srv.host,
            srv.port,
            password="sekret",
            sslmode="verify-full",
            ssl_ca_file=tls.ca_path,
        )
        assert c.query("SELECT 2 AS two").rows == [("2",)]
        c.close()
        with pytest.raises((PgServerError, ConnectionError)):
            PgWireClient(
                srv.host,
                srv.port,
                password="wrong",
                sslmode="verify-full",
                ssl_ca_file=tls.ca_path,
            )
    finally:
        srv.stop()


def test_pg_metadata_store_over_tls(tmp_path, tls):
    """The PG-backed metadata store runs its lifecycle unchanged over
    an encrypted connection."""
    from moonlink_spark.metadata_store import (
        PgMetadataStore,
        serialize_table_config,
    )

    srv = _pg_server(tmp_path, tls)
    try:
        store = PgMetadataStore(
            srv.host,
            srv.port,
            sslmode="verify-full",
            ssl_ca_file=tls.ca_path,
        )
        cfg = serialize_table_config(
            {"mode": "single", "columns": ["id"]}, False
        )
        store.store_table_metadata("db", "t", "src.t", "uri://s", cfg)
        entries = store.get_all_table_metadata_entries()
        assert len(entries) == 1
        assert entries[0].database == "db"
        store.delete_table_metadata("db", "t")
        assert store.get_all_table_metadata_entries() == []
        store.close()
    finally:
        srv.stop()


# --------------------------------------------------------------------------- #
# Kafka wire
# --------------------------------------------------------------------------- #


def test_kafka_produce_consume_over_tls(tmp_path, tls):
    from moonlink_spark.sources.kafka_wire import (
        KafkaWireBroker,
        KafkaWireConsumer,
        KafkaWireProducer,
    )

    b = KafkaWireBroker(
        str(tmp_path / "logs"),
        ssl_cert=tls.cert_path,
        ssl_key=tls.key_path,
    ).start()
    try:
        prod = KafkaWireProducer(
            b.host, b.port, ssl_ca_file=tls.ca_path
        )
        base = prod.send(
            "events", [(b"k1", b"v1"), (b"k2", b"v2")]
        )
        assert base == 0
        cons = KafkaWireConsumer(
            b.host, b.port, "events", ssl_ca_file=tls.ca_path
        )
        msgs = cons.poll()
        assert [(m[1], m[2]) for m in msgs] == [
            (b"k1", b"v1"), (b"k2", b"v2")
        ]
        cons.commit(msgs[-1][0] + 1)
        assert cons.committed == 2
        prod.close()
        cons.close()
    finally:
        b.stop()


def test_kafka_tls_broker_drops_plaintext_client(tmp_path, tls):
    """A plaintext client against a TLS-only broker fails its request
    (connection dropped at the TLS handshake) instead of garbling."""
    from moonlink_spark.sources.kafka_wire import (
        KafkaWireBroker,
        KafkaWireProducer,
    )

    b = KafkaWireBroker(
        str(tmp_path / "logs"),
        ssl_cert=tls.cert_path,
        ssl_key=tls.key_path,
    ).start()
    try:
        prod = KafkaWireProducer(b.host, b.port)  # no TLS
        with pytest.raises((OSError, ConnectionError)):
            prod.send("t", [(None, b"x")])
    finally:
        b.stop()


def test_kafka_group_tls_with_sasl(tmp_path, tls):
    """TLS + SASL/PLAIN compose (the SASL_SSL listener shape): auth runs
    INSIDE the encrypted channel and group coordination works."""
    from moonlink_spark.sources.kafka_wire import (
        KafkaGroupConsumer,
        KafkaWireBroker,
        KafkaWireProducer,
    )

    b = KafkaWireBroker(
        str(tmp_path / "logs"),
        sasl_credentials={"svc": "pw1"},
        ssl_cert=tls.cert_path,
        ssl_key=tls.key_path,
    ).start()
    try:
        prod = KafkaWireProducer(
            b.host, b.port, sasl_plain=("svc", "pw1"),
            ssl_ca_file=tls.ca_path,
        )
        prod.send("t", [(None, b"a"), (None, b"b")])
        g = KafkaGroupConsumer(
            b.host, b.port, "t", "grp",
            sasl_plain=("svc", "pw1"), ssl_ca_file=tls.ca_path,
        )
        msgs = g.poll()
        assert sorted(m[3] for m in msgs) == [b"a", b"b"]
        g.close()
        prod.close()
    finally:
        b.stop()


# --------------------------------------------------------------------------- #
# S3 / GCS object stores
# --------------------------------------------------------------------------- #


def test_s3_https_signed_roundtrip(tls):
    from moonlink_spark.table.s3 import S3HttpFS, S3MemServer

    srv = S3MemServer(
        credentials={"AK": "SK"},
        ssl_cert=tls.cert_path,
        ssl_key=tls.key_path,
    ).start()
    try:
        assert srv.endpoint.startswith("https://")
        fs = S3HttpFS(
            srv.endpoint,
            access_key="AK",
            secret_key="SK",
            ssl_ca_file=tls.ca_path,
        )
        fs.write_bytes("s3mem://b/k/data.bin", b"tls-payload")
        assert fs.open_read_binary("s3mem://b/k/data.bin").read() == b"tls-payload"
        assert fs.getsize("s3mem://b/k/data.bin") == 11
        assert fs.exists("s3mem://b/k/data.bin")
        # multipart threshold path also rides TLS
        big = b"x" * (6 * 1024 * 1024)
        fs.write_bytes("s3mem://b/k/big.bin", big)
        assert fs.open_read_binary("s3mem://b/k/big.bin").read() == big
    finally:
        srv.stop()


def test_s3_https_untrusted_ca_fails_closed(tls, tmp_path_factory):
    import ssl

    from moonlink_spark.table.s3 import S3HttpFS, S3MemServer

    other = mint_test_tls(str(tmp_path_factory.mktemp("s3ca")))
    srv = S3MemServer(
        ssl_cert=tls.cert_path, ssl_key=tls.key_path
    ).start()
    try:
        fs = S3HttpFS(srv.endpoint, ssl_ca_file=other.ca_path)
        with pytest.raises(ssl.SSLError):
            fs.write_bytes("s3mem://b/k", b"x")
    finally:
        srv.stop()


def test_gcs_https_bearer_roundtrip(tls):
    from moonlink_spark.table.gcs import GCSHttpFS, GCSMemServer

    srv = GCSMemServer(
        valid_tokens={"tok-1"},
        ssl_cert=tls.cert_path,
        ssl_key=tls.key_path,
    ).start()
    try:
        assert srv.endpoint.startswith("https://")
        fs = GCSHttpFS(
            srv.endpoint, token="tok-1", ssl_ca_file=tls.ca_path
        )
        fs.write_bytes("gcsmem://b/k/data.bin", b"gcs-tls")
        assert fs.open_read_binary("gcsmem://b/k/data.bin").read() == b"gcs-tls"
        # resumable threshold path also rides TLS
        big = b"y" * (9 * 1024 * 1024)
        fs.write_bytes("gcsmem://b/k/big.bin", big)
        assert fs.open_read_binary("gcsmem://b/k/big.bin").read() == big
    finally:
        srv.stop()


# --------------------------------------------------------------------------- #
# SCRAM-SHA-256-PLUS channel binding + SASLprep
# --------------------------------------------------------------------------- #


def test_scram_plus_negotiated_over_tls(tmp_path, tls):
    """Over TLS against a -PLUS-offering server the client MUST pick the
    bound mechanism (gs2 'p=tls-server-end-point') and authenticate."""
    from moonlink_spark.pg_protocol import PgWireClient

    srv = _pg_server(
        tmp_path, tls, password="sekret", auth="scram-sha-256"
    )
    try:
        c = PgWireClient(
            srv.host,
            srv.port,
            password="sekret",
            sslmode="verify-full",
            ssl_ca_file=tls.ca_path,
        )
        assert c._scram_state["gs2"] == "p=tls-server-end-point,,"
        assert c.query("SELECT 1 AS one").rows == [("1",)]
        c.close()
    finally:
        srv.stop()


def test_scram_plus_wrong_binding_rejected(tmp_path, tls):
    """A client presenting a DIFFERENT certificate hash in c= (the MITM
    shape: binding data from the attacker's TLS leg) must fail auth."""
    from moonlink_spark import pg_protocol as P

    srv = _pg_server(
        tmp_path, tls, password="sekret", auth="scram-sha-256"
    )
    orig = P.PgWireClient._scram_continue

    def tampered(self, server_first, password):
        real_der = self._tls_cert_der
        self._tls_cert_der = b"not-the-server-cert"
        try:
            return orig(self, server_first, password)
        finally:
            self._tls_cert_der = real_der

    try:
        P.PgWireClient._scram_continue = tampered
        with pytest.raises((P.PgServerError, ConnectionError)):
            P.PgWireClient(
                srv.host,
                srv.port,
                password="sekret",
                sslmode="verify-full",
                ssl_ca_file=tls.ca_path,
            )
    finally:
        P.PgWireClient._scram_continue = orig
        srv.stop()


def test_scram_downgrade_y_header_rejected(tmp_path, tls):
    """gs2 'y' (client: "I support binding but you offered no -PLUS")
    against a server that DID offer -PLUS = a stripped mechanism list;
    the server must refuse (RFC 5802 §6.1)."""
    from moonlink_spark import pg_protocol as P

    srv = _pg_server(
        tmp_path, tls, password="sekret", auth="scram-sha-256"
    )
    orig = P.PgWireClient._scram_start

    def forced_y(self, mech, gs2):
        return orig(self, P._SCRAM_MECH, "y,,")

    try:
        P.PgWireClient._scram_start = forced_y
        with pytest.raises((P.PgServerError, ConnectionError)):
            P.PgWireClient(
                srv.host,
                srv.port,
                password="sekret",
                sslmode="verify-full",
                ssl_ca_file=tls.ca_path,
            )
    finally:
        P.PgWireClient._scram_start = orig
        srv.stop()


def test_saslprep_normalizes_equivalent_passwords(tmp_path, tls):
    """RFC 4013: NFKC-equivalent spellings are the SAME password — a
    server provisioned with composed U+00E9 must accept a client typing
    decomposed e + U+0301, and non-ASCII spaces map to ASCII space."""
    from moonlink_spark.pg_protocol import PgWireClient

    srv = _pg_server(
        tmp_path, tls, password="café x", auth="scram-sha-256"
    )
    try:
        c = PgWireClient(
            srv.host,
            srv.port,
            password="café x",  # decomposed é + NBSP
            sslmode="verify-full",
            ssl_ca_file=tls.ca_path,
        )
        assert c.query("SELECT 3 AS n").rows == [("3",)]
        c.close()
    finally:
        srv.stop()


def test_saslprep_prohibited_character_rejected():
    from moonlink_spark.pg_protocol import PgProtocolError, saslprep

    assert saslprep("plain-ascii") == "plain-ascii"
    assert saslprep("café") == "café"
    with pytest.raises(PgProtocolError, match="prohibited"):
        saslprep("bad‎foo")  # U+200E LRM: C.8, prohibited
    with pytest.raises(PgProtocolError, match="empty"):
        saslprep("­")  # soft hyphen maps to nothing
