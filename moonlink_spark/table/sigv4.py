"""AWS Signature Version 4 — the public signing algorithm, stdlib only.

Parity: the reference's S3 accessor authenticates through the AWS SDK
(``storage/filesystem/accessor/*``, opendal/aws credentials); this
module implements the SAME wire contract from the public specification
(docs.aws.amazon.com/IAM/latest/UserGuide/create-signed-request.html)
so :class:`~moonlink_spark.table.s3.S3HttpFS` signs its requests and
the in-process server VERIFIES them — both sides of the algorithm, no
SDK. The canonicalization rules matter and are followed exactly:

- canonical URI = each path segment URI-encoded (``/`` preserved,
  unreserved chars ``A-Za-z0-9-._~`` bare);
- canonical query = parameters sorted by name then value, both
  URI-encoded with the same rules;
- canonical headers = lowercased names, trimmed values, sorted;
- payload hash = SHA-256 hex of the body, also sent as
  ``x-amz-content-sha256`` (S3 requires the header signed);
- signing key = HMAC chain over date/region/service/aws4_request.
"""

from __future__ import annotations

import datetime as dt
import hashlib
import hmac
import urllib.parse

_ALGORITHM = "AWS4-HMAC-SHA256"
_UNRESERVED = "-._~"


def _uri_encode(s: str, keep_slash: bool = False) -> str:
    safe = _UNRESERVED + ("/" if keep_slash else "")
    return urllib.parse.quote(s, safe=safe)


def _canonical_query(query: str) -> str:
    pairs = urllib.parse.parse_qsl(query, keep_blank_values=True)
    enc = sorted(
        (_uri_encode(k), _uri_encode(v)) for k, v in pairs
    )
    return "&".join(f"{k}={v}" for k, v in enc)


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode(), hashlib.sha256).digest()


def signing_key(secret_key: str, date: str, region: str, service: str) -> bytes:
    k = _hmac(("AWS4" + secret_key).encode(), date)
    k = _hmac(k, region)
    k = _hmac(k, service)
    return _hmac(k, "aws4_request")


def sign_request(
    method: str,
    url: str,
    headers: dict[str, str],
    payload: bytes | None,
    access_key: str,
    secret_key: str,
    region: str = "us-east-1",
    service: str = "s3",
    now: dt.datetime | None = None,
    session_token: str | None = None,
) -> dict[str, str]:
    """Return ``headers`` plus ``x-amz-date``, ``x-amz-content-sha256``
    and the SigV4 ``Authorization`` header. ``headers`` MUST already
    contain ``Host`` (it is always signed). With ``session_token``
    (STS temporary credentials — the IAM-role shape on EC2/EKS), the
    ``x-amz-security-token`` header is attached and SIGNED, per S3's
    SigV4 requirement for temporary credentials."""
    t = now or dt.datetime.now(dt.timezone.utc)
    amz_date = t.strftime("%Y%m%dT%H%M%SZ")
    date = t.strftime("%Y%m%d")
    payload_hash = hashlib.sha256(payload or b"").hexdigest()

    out = dict(headers)
    out["x-amz-date"] = amz_date
    out["x-amz-content-sha256"] = payload_hash
    if session_token is not None:
        out["x-amz-security-token"] = session_token

    parsed = urllib.parse.urlsplit(url)
    canonical_uri = _uri_encode(
        urllib.parse.unquote(parsed.path or "/"), keep_slash=True
    )
    canonical_query = _canonical_query(parsed.query)

    lower = {k.lower(): " ".join(v.split()) for k, v in out.items()}
    signed_names = sorted(lower)
    canonical_headers = "".join(f"{k}:{lower[k]}\n" for k in signed_names)
    signed_headers = ";".join(signed_names)

    canonical_request = "\n".join(
        [
            method.upper(),
            canonical_uri,
            canonical_query,
            canonical_headers,
            signed_headers,
            payload_hash,
        ]
    )
    scope = f"{date}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join(
        [
            _ALGORITHM,
            amz_date,
            scope,
            hashlib.sha256(canonical_request.encode()).hexdigest(),
        ]
    )
    sig = hmac.new(
        signing_key(secret_key, date, region, service),
        string_to_sign.encode(),
        hashlib.sha256,
    ).hexdigest()
    out["Authorization"] = (
        f"{_ALGORITHM} Credential={access_key}/{scope}, "
        f"SignedHeaders={signed_headers}, Signature={sig}"
    )
    return out


def parse_authorization(value: str) -> dict[str, str] | None:
    """-> {access_key, date, region, service, signed_headers, signature}
    or None if the header is not SigV4-shaped."""
    if not value.startswith(_ALGORITHM + " "):
        return None
    fields: dict[str, str] = {}
    for part in value[len(_ALGORITHM) + 1 :].split(","):
        k, _, v = part.strip().partition("=")
        fields[k] = v
    cred = fields.get("Credential", "").split("/")
    if len(cred) != 5 or cred[4] != "aws4_request":
        return None
    return {
        "access_key": cred[0],
        "date": cred[1],
        "region": cred[2],
        "service": cred[3],
        "signed_headers": fields.get("SignedHeaders", ""),
        "signature": fields.get("Signature", ""),
    }


def verify_request(
    method: str,
    path_and_query: str,
    headers,
    payload: bytes,
    secret_for_key,
) -> tuple[bool, str]:
    """Server-side verification: recompute the signature from the raw
    request. ``headers`` is any case-insensitive mapping (e.g.
    http.server's message object); ``secret_for_key(access_key) ->
    secret | None``. Returns (ok, error_code) with S3 error-code names."""
    lower = {str(k).lower(): str(v) for k, v in headers.items()}
    auth = lower.get("authorization")
    if not auth:
        return False, "AccessDenied"
    parsed_auth = parse_authorization(auth)
    if parsed_auth is None:
        return False, "InvalidRequest"
    secret = secret_for_key(parsed_auth["access_key"])
    if secret is None:
        return False, "InvalidAccessKeyId"
    claimed_payload = lower.get("x-amz-content-sha256", "")
    if hashlib.sha256(payload).hexdigest() != claimed_payload:
        return False, "XAmzContentSHA256Mismatch"

    # Real-S3 rules the mock must share or a captured request replays:
    # host, x-amz-date and x-amz-content-sha256 MUST be covered by the
    # signature (a request signing zero meaningful headers proves
    # nothing), and x-amz-date must be within the 15-minute acceptance
    # window real S3 enforces.
    signed_set = set(parsed_auth["signed_headers"].split(";"))
    for required in ("host", "x-amz-date", "x-amz-content-sha256"):
        if required not in signed_set:
            return False, "SignatureDoesNotMatch"
    try:
        req_ts = dt.datetime.strptime(
            lower.get("x-amz-date", ""), "%Y%m%dT%H%M%SZ"
        ).replace(tzinfo=dt.timezone.utc)
    except ValueError:
        return False, "InvalidRequest"
    now = dt.datetime.now(dt.timezone.utc)
    if abs((now - req_ts).total_seconds()) > 900:
        return False, "RequestTimeTooSkewed"

    parsed = urllib.parse.urlsplit(path_and_query)
    canonical_uri = _uri_encode(
        urllib.parse.unquote(parsed.path or "/"), keep_slash=True
    )
    canonical_query = _canonical_query(parsed.query)
    names = [n for n in parsed_auth["signed_headers"].split(";") if n]
    canonical_headers = ""
    for n in names:
        v = lower.get(n)
        if v is None:
            return False, "SignatureDoesNotMatch"
        canonical_headers += f"{n}:{' '.join(v.split())}\n"
    canonical_request = "\n".join(
        [
            method.upper(),
            canonical_uri,
            canonical_query,
            canonical_headers,
            ";".join(names),
            claimed_payload,
        ]
    )
    amz_date = lower.get("x-amz-date", "")
    scope = (
        f"{parsed_auth['date']}/{parsed_auth['region']}/"
        f"{parsed_auth['service']}/aws4_request"
    )
    string_to_sign = "\n".join(
        [
            _ALGORITHM,
            amz_date,
            scope,
            hashlib.sha256(canonical_request.encode()).hexdigest(),
        ]
    )
    expect = hmac.new(
        signing_key(
            secret,
            parsed_auth["date"],
            parsed_auth["region"],
            parsed_auth["service"],
        ),
        string_to_sign.encode(),
        hashlib.sha256,
    ).hexdigest()
    if not hmac.compare_digest(expect, parsed_auth["signature"]):
        return False, "SignatureDoesNotMatch"
    return True, ""
