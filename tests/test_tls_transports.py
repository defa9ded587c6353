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
