"""TLS material and contexts for the four wire transports.

Parity: every client in the reference speaks TLS — tokio-postgres via
``sslmode`` (``src/moonlink_metadata_store/src/postgres/utils.rs``
builds the connect config), the S3/GCS accessors via rustls inside
reqwest/opendal, and the Kafka consumer via rdkafka's
``security.protocol=SSL``. This module provides the shared pieces the
Python transports need:

- :func:`mint_test_tls` mints a CA plus a leaf certificate for
  ``127.0.0.1``/``localhost`` (SAN: DNS + IP) using the public
  ``cryptography`` package, import-gated — tests mint per-tmpdir certs
  and pin the CA on the client side (the ``verify-full`` shape, not
  ``verify=False``);
- :func:`server_context` / :func:`client_context` wrap stdlib
  ``ssl.SSLContext`` with the settings every transport shares
  (TLS 1.2+, client verifies against a pinned CA and checks the
  hostname).

Channel binding: :func:`cert_fingerprint_for_binding` computes the
RFC 5929 ``tls-server-end-point`` channel-binding data (the hash of
the server certificate, using the certificate's signature hash —
SHA-256 for everything minted here), used by SCRAM-SHA-256-PLUS in
``pg_protocol.py``.
"""

from __future__ import annotations

import dataclasses
import datetime as dt
import hashlib
import os
import ssl


class TlsUnavailableError(RuntimeError):
    """The ``cryptography`` package is required to MINT certificates
    (verifying/serving with pre-minted files needs only stdlib ssl)."""


@dataclasses.dataclass(frozen=True)
class TlsFiles:
    ca_path: str
    cert_path: str
    key_path: str


def mint_test_tls(
    out_dir: str,
    hostname: str = "localhost",
    ip: str = "127.0.0.1",
    valid_days: int = 7,
) -> TlsFiles:
    """Mint a CA and a CA-signed leaf cert for in-process servers.

    Files land in ``out_dir`` (``ca.pem``, ``server.pem``,
    ``server.key``); re-minting into the same directory overwrites.
    The leaf carries SAN entries for both the DNS name and the IP so
    clients connecting to either verify under ``check_hostname``."""
    try:
        from cryptography import x509
        from cryptography.hazmat.primitives import hashes, serialization
        from cryptography.hazmat.primitives.asymmetric import ec
        from cryptography.x509.oid import NameOID
        import ipaddress
    except ImportError as e:  # pragma: no cover - env without cryptography
        raise TlsUnavailableError(
            "minting test certificates requires the 'cryptography' "
            "package; provide pre-minted cert/key/CA files instead"
        ) from e

    os.makedirs(out_dir, exist_ok=True)
    now = dt.datetime.now(dt.timezone.utc)
    not_after = now + dt.timedelta(days=valid_days)

    ca_key = ec.generate_private_key(ec.SECP256R1())
    ca_name = x509.Name(
        [x509.NameAttribute(NameOID.COMMON_NAME, "moonlink-test-ca")]
    )
    ca_cert = (
        x509.CertificateBuilder()
        .subject_name(ca_name)
        .issuer_name(ca_name)
        .public_key(ca_key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - dt.timedelta(minutes=5))
        .not_valid_after(not_after)
        .add_extension(x509.BasicConstraints(ca=True, path_length=0), True)
        .sign(ca_key, hashes.SHA256())
    )

    leaf_key = ec.generate_private_key(ec.SECP256R1())
    leaf_cert = (
        x509.CertificateBuilder()
        .subject_name(
            x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, hostname)])
        )
        .issuer_name(ca_name)
        .public_key(leaf_key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - dt.timedelta(minutes=5))
        .not_valid_after(not_after)
        .add_extension(
            x509.SubjectAlternativeName(
                [
                    x509.DNSName(hostname),
                    x509.IPAddress(ipaddress.ip_address(ip)),
                ]
            ),
            False,
        )
        .sign(ca_key, hashes.SHA256())
    )

    ca_path = os.path.join(out_dir, "ca.pem")
    cert_path = os.path.join(out_dir, "server.pem")
    key_path = os.path.join(out_dir, "server.key")
    with open(ca_path, "wb") as fh:
        fh.write(ca_cert.public_bytes(serialization.Encoding.PEM))
    with open(cert_path, "wb") as fh:
        fh.write(leaf_cert.public_bytes(serialization.Encoding.PEM))
    with open(key_path, "wb") as fh:
        fh.write(
            leaf_key.private_bytes(
                serialization.Encoding.PEM,
                serialization.PrivateFormat.PKCS8,
                serialization.NoEncryption(),
            )
        )
    return TlsFiles(ca_path, cert_path, key_path)


def server_context(cert_path: str, key_path: str) -> ssl.SSLContext:
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.minimum_version = ssl.TLSVersion.TLSv1_2
    ctx.load_cert_chain(cert_path, key_path)
    return ctx


def client_context(
    ca_path: str | None = None, check_hostname: bool = True
) -> ssl.SSLContext:
    """Client context pinned to ``ca_path`` (the deployment shape for a
    private CA). Without a CA file, the system trust store applies —
    never verification-off: a transport that wants tokio-postgres's
    lax ``sslmode=require`` passes ``check_hostname=False`` but still
    verifies the chain against the pinned CA."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.minimum_version = ssl.TLSVersion.TLSv1_2
    if ca_path is not None:
        ctx.load_verify_locations(ca_path)
    else:
        ctx.load_default_certs()
    ctx.check_hostname = check_hostname
    ctx.verify_mode = ssl.CERT_REQUIRED
    return ctx


def cert_fingerprint_for_binding(cert_der: bytes) -> bytes:
    """RFC 5929 tls-server-end-point channel-binding data.

    The binding hash follows the certificate's signature algorithm,
    with MD5/SHA-1 upgraded to SHA-256. Everything this repo mints is
    ECDSA-SHA256, and parsing the signature OID without the
    ``cryptography`` package is not worth the fidelity at the edge —
    so: use the cert's signature hash when parseable, else SHA-256."""
    try:
        from cryptography import x509
        from cryptography.hazmat.primitives import hashes

        cert = x509.load_der_x509_certificate(cert_der)
        algo = cert.signature_hash_algorithm
        if algo is not None and not isinstance(
            algo, (hashes.MD5, hashes.SHA1)
        ):
            h = hashlib.new(algo.name)
            h.update(cert_der)
            return h.digest()
    except Exception:
        pass
    return hashlib.sha256(cert_der).digest()
