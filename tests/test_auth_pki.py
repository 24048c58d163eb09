"""PkiAuthSrv: client-certificate authentication
(auth/PkiAuthSrv.scala:17-91) — subject-DN RDN extraction first, SAN
fallback (incl. the Microsoft UPN othername the reference decodes
specially, :30-61), local-user-table authorization, and the
TLS-terminator header transport through the HTTP front door."""

from __future__ import annotations

import datetime as dt
import json
from urllib.parse import quote

import pytest

from scalligraph_spark.auth import (
    AuthenticationError,
    MultiAuthSrv,
    PasswordAuthSrv,
    PkiAuthSrv,
    hash_password,
)

cryptography = pytest.importorskip("cryptography")

from cryptography import x509  # noqa: E402
from cryptography.hazmat.primitives import hashes, serialization  # noqa: E402
from cryptography.hazmat.primitives.asymmetric import ec  # noqa: E402
from cryptography.x509.oid import NameOID, ObjectIdentifier  # noqa: E402

UPN_OID = ObjectIdentifier("1.3.6.1.4.1.311.20.2.3")


def make_cert(cn: str | None = None, email: str | None = None, upn: str | None = None):
    """Self-signed cert with the subject / SAN shapes the provider reads."""
    key = ec.generate_private_key(ec.SECP256R1())
    attrs = [x509.NameAttribute(NameOID.ORGANIZATION_NAME, "corp")]
    if cn is not None:
        attrs.append(x509.NameAttribute(NameOID.COMMON_NAME, cn))
    subject = x509.Name(attrs)
    now = dt.datetime(2026, 1, 1)
    b = (
        x509.CertificateBuilder()
        .subject_name(subject)
        .issuer_name(subject)
        .public_key(key.public_key())
        .serial_number(7)
        .not_valid_before(now)
        .not_valid_after(now + dt.timedelta(days=365))
    )
    sans: list = []
    if email is not None:
        sans.append(x509.RFC822Name(email))
    if upn is not None:
        raw = upn.encode()
        sans.append(x509.OtherName(UPN_OID, b"\x0c" + bytes([len(raw)]) + raw))
    if sans:
        b = b.add_extension(x509.SubjectAlternativeName(sans), critical=False)
    return b.sign(key, hashes.SHA256())


def pem(cert) -> bytes:
    return cert.public_bytes(serialization.Encoding.PEM)


@pytest.fixture(scope="module")
def users(spark):
    rows = [
        ("u1", "alice", ["acme"], ["read", "write"], json.dumps({"nations": [1]})),
        ("u2", "alice@corp.example", ["acme"], ["read"], None),
    ]
    return spark.createDataFrame(
        rows,
        "user_id string, user_name string, organisations array<string>, "
        "permissions array<string>, policy_data string",
    )


def test_subject_cn_extraction(users):
    srv = PkiAuthSrv(users, certificate_field="CN")
    cert = make_cert(cn="alice", email="alice@corp.example")
    for form in (cert, pem(cert), pem(cert).decode(), cert.public_bytes(serialization.Encoding.DER)):
        ctx = srv.authenticate_certificate(form)
        assert (ctx.user_id, ctx.user_name) == ("u1", "alice")
    assert ctx.has_permission("write")


def test_san_fallback_when_field_absent_from_subject(users):
    # rfc822Name is not an RDN type: subject extraction yields nothing,
    # the SAN path answers (extractFieldFromSubject→orElse→SAN, :84-89)
    srv = PkiAuthSrv(users, certificate_field="rfc822Name")
    ctx = srv.authenticate_certificate(make_cert(cn="alice", email="alice@corp.example"))
    assert ctx.user_id == "u2"  # the email-named user, not the CN one


def test_upn_othername_decode(users):
    srv = PkiAuthSrv(users, certificate_field="upn")
    ctx = srv.authenticate_certificate(make_cert(cn="ignored-by-upn-field", upn="alice@corp.example"))
    assert ctx.user_id == "u2"


def test_unknown_user_and_missing_field_and_garbage(users):
    srv = PkiAuthSrv(users, certificate_field="CN")
    with pytest.raises(AuthenticationError):  # valid cert, unknown principal
        srv.authenticate_certificate(make_cert(cn="mallory"))
    with pytest.raises(AuthenticationError):  # no CN anywhere
        srv.authenticate_certificate(make_cert(email="nobody@corp.example"))
    with pytest.raises(AuthenticationError):  # unparseable bytes
        srv.authenticate_certificate(b"not a certificate")


def test_multi_auth_chain_routes_certificates(users):
    pw_users = users.sparkSession.createDataFrame(
        [("u9", "carol", hash_password("pw", "s"), "s")],
        "user_id string, user_name string, password_hash string, salt string",
    )
    chain = MultiAuthSrv([PasswordAuthSrv(pw_users), PkiAuthSrv(users, "CN")])
    assert chain.authenticate_certificate(make_cert(cn="alice")).user_id == "u1"
    assert chain.authenticate("carol", "pw").user_id == "u9"
    with pytest.raises(AuthenticationError):
        chain.authenticate_certificate(make_cert(cn="mallory"))


def test_http_client_cert_header(spark, users):
    """X-Client-Cert (URL-encoded PEM — the nginx $ssl_client_escaped_cert
    convention for forwarding the TLS chain head) authenticates a query
    with no Bearer header; a cert naming an unknown user is a 401."""
    import http.client

    from scalligraph_spark.http_api import QueryServer
    from scalligraph_spark.suite import executor_for

    ex = executor_for(spark, "/root/testdata/sf0.001")
    with QueryServer(ex, auth_srv=PkiAuthSrv(users, "CN")).serve() as srv:
        def post(headers):
            conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
            body = json.dumps({"query": [{"_name": "all_nation"}, {"_name": "count"}]})
            conn.request("POST", "/api/v1/query", body=body, headers={"Content-Type": "application/json", **headers})
            r = conn.getresponse()
            data = r.read()
            conn.close()
            return r.status, data

        status, data = post({"X-Client-Cert": quote(pem(make_cert(cn="alice")).decode())})
        assert status == 200 and json.loads(data) == [{"count": 25}]
        status, data = post({"X-Client-Cert": quote(pem(make_cert(cn="mallory")).decode())})
        assert status == 401 and json.loads(data)["type"] == "AuthenticationError"
