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


def make_cert(
    cn: str | None = None,
    email: str | None = None,
    upn: str | None = None,
    not_before: dt.datetime | None = None,
    days: int = 365,
    issuer=None,  # (name, key) pair → CA-signed instead of self-signed
):
    """Cert with the subject / SAN shapes the provider reads — self-signed
    by default, CA-signed when ``issuer=(ca_name, ca_key)`` is given.
    """
    key = ec.generate_private_key(ec.SECP256R1())
    attrs = [x509.NameAttribute(NameOID.ORGANIZATION_NAME, "corp")]
    if cn is not None:
        attrs.append(x509.NameAttribute(NameOID.COMMON_NAME, cn))
    subject = x509.Name(attrs)
    issuer_name, signing_key = issuer if issuer is not None else (subject, key)
    now = not_before or dt.datetime(2026, 1, 1)
    b = (
        x509.CertificateBuilder()
        .subject_name(subject)
        .issuer_name(issuer_name)
        .public_key(key.public_key())
        .serial_number(7)
        .not_valid_before(now)
        .not_valid_after(now + dt.timedelta(days=days))
    )
    sans: list = []
    if email is not None:
        sans.append(x509.RFC822Name(email))
    if upn is not None:
        raw = upn.encode()
        sans.append(x509.OtherName(UPN_OID, b"\x0c" + bytes([len(raw)]) + raw))
    if sans:
        b = b.add_extension(x509.SubjectAlternativeName(sans), critical=False)
    return b.sign(signing_key, hashes.SHA256())


def make_ca(cn: str = "corp-ca"):
    """A CA identity: (certificate, (name, key)) — pass the second element
    as ``make_cert(issuer=...)`` to mint leaves it signed."""
    key = ec.generate_private_key(ec.SECP256R1())
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, cn)])
    now = dt.datetime(2026, 1, 1)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(1)
        .not_valid_before(now)
        .not_valid_after(now + dt.timedelta(days=3650))
        .add_extension(x509.BasicConstraints(ca=True, path_length=0), critical=True)
        .sign(key, hashes.SHA256())
    )
    return cert, (name, key)


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


def test_validity_period_enforced(users):
    """Expired and not-yet-valid certificates are rejected regardless of
    who they name — the check the JVM TLS stack did for the reference and
    a header transport must do itself."""
    srv = PkiAuthSrv(users, certificate_field="CN")
    assert srv.authenticate_certificate(make_cert(cn="alice")).user_id == "u1"
    with pytest.raises(AuthenticationError):  # expired years ago
        srv.authenticate_certificate(make_cert(cn="alice", not_before=dt.datetime(2020, 1, 1), days=30))
    with pytest.raises(AuthenticationError):  # not yet valid
        srv.authenticate_certificate(make_cert(cn="alice", not_before=dt.datetime(2030, 1, 1)))
    # injectable clock: the same cert flips accept→reject as time passes
    ticking = PkiAuthSrv(users, "CN", clock=lambda: dt.datetime(2027, 6, 1, tzinfo=dt.timezone.utc))
    with pytest.raises(AuthenticationError):
        ticking.authenticate_certificate(make_cert(cn="alice"))  # expired by 2027-06


def test_ca_bundle_rejects_self_signed(users):
    """With a configured trust bundle, a certificate must be SIGNED by a
    bundled CA: a self-signed cert naming a real user no longer
    authenticates (the ADVICE forgery scenario), a CA-issued one does,
    and one issued by a DIFFERENT CA is rejected."""
    ca_cert, ca_issuer = make_ca()
    rogue_cert, rogue_issuer = make_ca("rogue-ca")
    srv = PkiAuthSrv(users, certificate_field="CN", ca_bundle=[pem(ca_cert)])
    assert srv.authenticate_certificate(make_cert(cn="alice", issuer=ca_issuer)).user_id == "u1"
    with pytest.raises(AuthenticationError):
        srv.authenticate_certificate(make_cert(cn="alice"))  # self-signed forgery
    with pytest.raises(AuthenticationError):
        srv.authenticate_certificate(make_cert(cn="alice", issuer=rogue_issuer))


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
    with no Bearer header UNDER THE TRUSTED-PROXY OPT-IN; a cert naming
    an unknown user is a 401."""
    import http.client

    from scalligraph_spark.http_api import QueryServer
    from scalligraph_spark.suite import executor_for

    ex = executor_for(spark, "/root/testdata/sf0.001")
    with QueryServer(ex, auth_srv=PkiAuthSrv(users, "CN"), trust_client_cert_header=True).serve() as srv:
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


def test_http_cert_header_ignored_without_opt_in_and_fails_loud(spark, users):
    """Defaults are safe: without ``trust_client_cert_header`` a forged
    header is inert (Bearer still required), and WITH the opt-in a
    presented-but-rejected certificate is a 401 — it does NOT silently
    fall through to a key that would mask the misconfiguration."""
    import http.client

    from scalligraph_spark.auth import KeyAuthSrv, MultiAuthSrv
    from scalligraph_spark.http_api import QueryServer
    from scalligraph_spark.suite import executor_for

    key_users = spark.createDataFrame(
        [("u1", "alice", ["acme"], ["read"], None, "k-alice")],
        "user_id string, user_name string, organisations array<string>, "
        "permissions array<string>, policy_data string, api_key string",
    )
    ex = executor_for(spark, "/root/testdata/sf0.001")
    chain = MultiAuthSrv([PkiAuthSrv(users, "CN"), KeyAuthSrv(key_users)])
    body = json.dumps({"query": [{"_name": "all_nation"}, {"_name": "count"}]})

    def post(srv, headers):
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        conn.request("POST", "/api/v1/query", body=body, headers={"Content-Type": "application/json", **headers})
        r = conn.getresponse()
        data = r.read()
        conn.close()
        return r.status, data

    good_cert = {"X-Client-Cert": quote(pem(make_cert(cn="alice")).decode())}
    bad_cert = {"X-Client-Cert": quote(pem(make_cert(cn="mallory")).decode())}
    with QueryServer(ex, auth_srv=chain).serve() as srv:  # no opt-in
        status, _ = post(srv, good_cert)
        assert status == 401, "header transport must be inert without the trusted-proxy opt-in"
        status, _ = post(srv, dict(good_cert, Authorization="Bearer k-alice"))
        assert status == 200, "Bearer still works; the untrusted header is simply ignored"
    with QueryServer(ex, auth_srv=chain, trust_client_cert_header=True).serve() as srv:
        status, _ = post(srv, dict(bad_cert, Authorization="Bearer k-alice"))
        assert status == 401, "a rejected presented cert must fail loud, not fall through to Bearer"


def test_cert_header_with_no_cert_provider_falls_through_to_bearer(spark, users):
    """A MultiAuthSrv chain with NO certificate-capable provider must
    surface NotSupportedError (a capability statement), not
    AuthenticationError — so a trusted proxy that always forwards
    X-Client-Cert does not brick Bearer auth for key-only deployments."""
    import http.client

    from scalligraph_spark.auth import KeyAuthSrv, MultiAuthSrv, NotSupportedError
    from scalligraph_spark.http_api import QueryServer
    from scalligraph_spark.suite import executor_for

    key_users = spark.createDataFrame(
        [("u1", "alice", ["acme"], ["read"], None, "k-alice")],
        "user_id string, user_name string, organisations array<string>, "
        "permissions array<string>, policy_data string, api_key string",
    )
    chain = MultiAuthSrv([KeyAuthSrv(key_users)])  # no PKI provider anywhere
    with pytest.raises(NotSupportedError):
        chain.authenticate_certificate(make_cert(cn="alice"))

    ex = executor_for(spark, "/root/testdata/sf0.001")
    body = json.dumps({"query": [{"_name": "all_nation"}, {"_name": "count"}]})
    with QueryServer(ex, auth_srv=chain, trust_client_cert_header=True).serve() as srv:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        conn.request("POST", "/api/v1/query", body=body, headers={
            "Content-Type": "application/json",
            "X-Client-Cert": quote(pem(make_cert(cn="alice")).decode()),
            "Authorization": "Bearer k-alice",
        })
        r = conn.getresponse()
        status, data = r.status, r.read()
        conn.close()
    assert status == 200 and json.loads(data) == [{"count": 25}]


def test_ca_bundle_tolerates_malformed_entry(users):
    """One corrupt bundle entry must not brick certificate auth for
    certs the GOOD CAs signed — the bad entry is skipped with a loud
    warning, verification proceeds against the rest."""
    import warnings

    ca_cert, ca_issuer = make_ca()
    srv = PkiAuthSrv(users, "CN", ca_bundle=[b"not a certificate", pem(ca_cert)])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        ctx = srv.authenticate_certificate(make_cert(cn="alice", issuer=ca_issuer))
    assert ctx.user_id == "u1"
    assert any("unparseable ca_bundle entry" in str(x.message) for x in w)
    with pytest.raises(AuthenticationError):  # forgeries still rejected
        srv.authenticate_certificate(make_cert(cn="alice"))


def test_expired_ca_stops_vouching_for_valid_leaves(users):
    """ADVICE r9: the ISSUER's own validity window is checked with the
    same clock as the leaf's — an expired trusted CA must not keep
    authenticating the (still-valid) leaves it signed."""
    key = ec.generate_private_key(ec.SECP256R1())
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "old-ca")])
    old_ca = (
        x509.CertificateBuilder()
        .subject_name(name).issuer_name(name)
        .public_key(key.public_key()).serial_number(2)
        .not_valid_before(dt.datetime(2020, 1, 1))
        .not_valid_after(dt.datetime(2021, 1, 1))  # long expired
        .add_extension(x509.BasicConstraints(ca=True, path_length=0), critical=True)
        .sign(key, hashes.SHA256())
    )
    leaf = make_cert(cn="alice", issuer=(name, key))  # leaf itself is valid NOW
    srv = PkiAuthSrv(users, "CN", ca_bundle=[pem(old_ca)])
    with pytest.raises(AuthenticationError):
        srv.authenticate_certificate(leaf)
    # the same leaf cross-checked against a LIVE CA still authenticates
    live_cert, live_issuer = make_ca()
    leaf2 = make_cert(cn="alice", issuer=live_issuer)
    srv2 = PkiAuthSrv(users, "CN", ca_bundle=[pem(old_ca), pem(live_cert)])
    assert srv2.authenticate_certificate(leaf2).user_id == "u1"


def test_non_ca_bundle_entry_is_skipped_loudly(users):
    """ADVICE r9: a LEAF certificate mistakenly added to the bundle
    (no basicConstraints CA=true) must not become a trusted issuer."""
    import warnings as _warnings

    rogue_key = ec.generate_private_key(ec.SECP256R1())
    rogue_name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "rogue")])
    rogue = (  # a plain leaf: NO basicConstraints extension at all
        x509.CertificateBuilder()
        .subject_name(rogue_name).issuer_name(rogue_name)
        .public_key(rogue_key.public_key()).serial_number(3)
        .not_valid_before(dt.datetime(2026, 1, 1))
        .not_valid_after(dt.datetime(2027, 1, 1))
        .sign(rogue_key, hashes.SHA256())
    )
    victim = make_cert(cn="alice", issuer=(rogue_name, rogue_key))
    srv = PkiAuthSrv(users, "CN", ca_bundle=[pem(rogue)])
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        with pytest.raises(AuthenticationError):
            srv.authenticate_certificate(victim)
    assert any("basicConstraints" in str(x.message) for x in w)
