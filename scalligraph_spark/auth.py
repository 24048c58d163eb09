"""Authentication tier — the batch-engine analog of the reference's
pluggable auth stack (core/.../auth/AuthSrv.scala:45-77,
MultiAuthSrv.scala:86-118, KeyAuthSrv.scala:11-27,
SessionAuthSrv.scala, UserSrv.scala).

The reference authenticates HTTP requests through an ordered provider
chain and threads the resulting ``AuthContext`` into every traversal
(organisation-scoped visibility).  This engine's query layer already
consumes auth contexts (row policies + auth-aware properties take an
``auth`` dict); this module supplies the producing side:

* :class:`AuthContext` — who/where/what: user, organisation, permission
  set, plus a ``data`` dict that surfaces policy feeds (e.g. the nation
  grants the demo row policy reads).  ``to_auth()`` is the bridge into
  ``QueryExecutor.execute(chain, auth=...)``.
* :class:`PasswordAuthSrv` — user-table authentication with salted
  PBKDF2 password hashes (stdlib ``hashlib.pbkdf2_hmac``; the
  BasicAuthSrv analog).  The user table is a plain DataFrame/LabelStore
  label, so user management gets versioning/audit like any other table.
* :class:`KeyAuthSrv` — API-key authentication (``authByKey``
  capability), constant-time compare.
* :class:`PkiAuthSrv` — client-certificate (mutual-TLS) authentication
  (PkiAuthSrv.scala:17-91): subject-DN RDN / SAN field extraction →
  local user table.
* :class:`SessionAuthSrv` — HMAC-signed expiring tokens
  (``setSessionUser``/session renewal analog); the clock is an explicit
  parameter so expiry is deterministic and testable.
* :class:`MultiAuthSrv` — the ordered first-success provider chain;
  every provider failing yields one aggregated
  :class:`AuthenticationError` (the reference logs each failure and
  returns a generic error, MultiAuthSrv.scala:73-99).

Scale note: authentication is CONTROL PLANE — one driver-side lookup of
one user row per session establishment, never a per-row operation.  The
data-plane enforcement (row policies as pushdown-able Columns,
auth-aware property redaction) already lives in qlang/executor.py and
properties.py.
"""

from __future__ import annotations

import hashlib
import hmac
import json
import time
from dataclasses import dataclass, field


class AuthenticationError(RuntimeError):
    """Authentication failed (deliberately unspecific, like the
    reference's generic 'Authentication failure')."""


class NotSupportedError(RuntimeError):
    """This provider does not support the requested method
    (AuthSrv.scala's NotSupportedError)."""


@dataclass(frozen=True)
class AuthContext:
    """The reference's AuthContext (auth/package.scala): identity +
    organisation + permissions, plus engine-specific policy feeds."""

    user_id: str
    user_name: str
    organisation: str | None = None
    permissions: frozenset[str] = frozenset()
    data: dict = field(default_factory=dict)

    def has_permission(self, p: str) -> bool:
        return p in self.permissions

    def to_auth(self) -> dict:
        """The dict the query layer consumes: row policies and auth-aware
        properties read keys from this (e.g. ``nations``); standard
        identity fields ride along for audit stamping."""
        return {
            "user": self.user_id,
            "userName": self.user_name,
            "organisation": self.organisation,
            "permissions": sorted(self.permissions),
            **self.data,
        }


def hash_password(password: str, salt: str, iterations: int = 10_000) -> str:
    """Salted PBKDF2-HMAC-SHA256 (stdlib).  Iterations are low by
    production standards — tune up on a real deployment; the shape
    (salted, iterated, constant-time verify) is the point."""
    return hashlib.pbkdf2_hmac(
        "sha256", password.encode(), salt.encode(), iterations
    ).hex()


class AuthSrv:
    """Provider base (AuthSrv.scala:45-77): every method unsupported
    until a subclass opts in; MultiAuthSrv skips NotSupportedError and
    moves down the chain."""

    name: str = "base"
    capabilities: frozenset[str] = frozenset()

    def authenticate(self, username: str, password: str, organisation: str | None = None) -> AuthContext:
        raise NotSupportedError(f"{self.name}: password authentication not supported")

    def authenticate_key(self, key: str, organisation: str | None = None) -> AuthContext:
        raise NotSupportedError(f"{self.name}: key authentication not supported")

    def authenticate_token(self, token: str) -> AuthContext:
        raise NotSupportedError(f"{self.name}: session tokens not supported")

    def authenticate_certificate(self, certificate, organisation: str | None = None) -> AuthContext:
        raise NotSupportedError(f"{self.name}: certificate authentication not supported")

    def authenticate_header(self, username: str, organisation: str | None = None) -> AuthContext:
        raise NotSupportedError(f"{self.name}: trusted-header authentication not supported")


def _user_row(users, username: str):
    """One driver-side control-plane lookup; users is a DataFrame with at
    least (user_id, user_name) plus provider-specific columns."""
    rows = users.where(users["user_name"] == username).limit(2).collect()
    if len(rows) != 1:
        raise AuthenticationError("Authentication failure")
    return rows[0]


def _ctx_from_row(row, organisation: str | None) -> AuthContext:
    orgs = list(row["organisations"] or []) if "organisations" in row.__fields__ else []
    org = organisation or (orgs[0] if orgs else None)
    if organisation is not None and orgs and organisation not in orgs:
        raise AuthenticationError("Authentication failure")
    perms = frozenset(row["permissions"] or []) if "permissions" in row.__fields__ else frozenset()
    data = {}
    if "policy_data" in row.__fields__ and row["policy_data"]:
        data = json.loads(row["policy_data"])
    return AuthContext(
        user_id=str(row["user_id"]),
        user_name=str(row["user_name"]),
        organisation=org,
        permissions=perms,
        data=data,
    )


class PasswordAuthSrv(AuthSrv):
    """User-table password authentication (BasicAuthSrv/LocalAuthSrv
    analog).  Expects columns: user_id, user_name, password_hash, salt
    [, organisations array, permissions array, policy_data json]."""

    name = "password"
    capabilities = frozenset({"changePassword"})

    def __init__(self, users, iterations: int = 10_000):
        self.users = users
        self.iterations = iterations

    def authenticate(self, username: str, password: str, organisation: str | None = None) -> AuthContext:
        row = _user_row(self.users, username)
        expect = row["password_hash"]
        got = hash_password(password, row["salt"], self.iterations)
        if not hmac.compare_digest(str(expect), got):
            raise AuthenticationError("Authentication failure")
        return _ctx_from_row(row, organisation)


class HeaderAuthSrv(AuthSrv):
    """Reverse-proxy SSO provider (HeaderAuthenticateSrv.scala:15-35):
    the proxy has already authenticated the user (SAML/Kerberos/etc.)
    and forwards ONLY the username in a trusted header — this provider
    resolves that name against the user table (authorization stays
    local: organisations, permissions, policy data).

    There is NO credential check here by design — which is exactly why
    the HTTP front door only consults it under the explicit
    ``trust_user_header`` opt-in (off by default, same discipline as
    ``trust_client_cert_header``): a directly-reachable server must
    never honor a header any client can type."""

    name = "header"
    capabilities = frozenset()

    def __init__(self, users):
        self.users = users

    def authenticate_header(self, username: str, organisation: str | None = None) -> AuthContext:
        if not username:
            raise AuthenticationError("Authentication failure")
        return _ctx_from_row(_user_row(self.users, username), organisation)


class DirectoryAuthSrv(AuthSrv):
    """LDAP / Active-Directory-shaped provider (LdapAuthSrv.scala,
    ADAuthSrv.scala): the credential check is a BIND against an external
    directory, injected as a callable ``bind(principal, password) ->
    bool`` so deployments plug ldap3/python-ldap and tests fake the
    directory — while authorization (organisations, permissions) stays
    in the LOCAL user table, the reference's split: the directory
    authenticates, the application's user records authorize, and a
    directory-valid principal UNKNOWN to the application is still
    rejected.

    ``principal_format`` reproduces ``ADAuthSrv``'s UPN construction
    ("{username}@corp.example" / "uid={username},ou=people,dc=…"): the
    app-level username formats into the directory principal before the
    bind.  A bind that RAISES (directory unreachable, malformed DN) is
    an authentication failure, not a fall-through — matching the
    reference, which only falls through the MultiAuthSrv chain on
    NotSupported, never on a directory error.  No ``changePassword``
    capability: the directory owns credentials."""

    name = "ldap"
    capabilities = frozenset()

    def __init__(self, users, bind, principal_format: str | None = None):
        self.users = users
        self.bind = bind
        self.principal_format = principal_format

    def authenticate(self, username: str, password: str, organisation: str | None = None) -> AuthContext:
        row = _user_row(self.users, username)  # app-side authorization record
        principal = (
            self.principal_format.format(username=username)
            if self.principal_format
            else username
        )
        try:
            ok = bool(self.bind(principal, password))
        except Exception:
            raise AuthenticationError("Authentication failure") from None
        if not ok:
            raise AuthenticationError("Authentication failure")
        return _ctx_from_row(row, organisation)


class KeyAuthSrv(AuthSrv):
    """API-key authentication (KeyAuthSrv.scala:11-27, the ``authByKey``
    capability).  Expects an ``api_key`` column; keys compare
    constant-time."""

    name = "key"
    capabilities = frozenset({"authByKey"})

    def __init__(self, users):
        self.users = users

    def authenticate_key(self, key: str, organisation: str | None = None) -> AuthContext:
        """Keyed lookup, not a table drain: the candidate row is selected
        by a SHA-256 digest equality pushed into the scan (comparing
        digests leaks nothing about the key bytes themselves), then the
        actual key compares constant-time on the single candidate — the
        full-collect of every API-key row is gone while the
        constant-time property is kept where it matters."""
        from pyspark.sql import functions as F

        digest = hashlib.sha256(key.encode()).hexdigest()
        rows = (
            self.users.where(self.users["api_key"].isNotNull())
            .where(F.sha2(F.col("api_key").cast("string"), 256) == digest)
            .limit(2)
            .collect()
        )
        for row in rows:
            if hmac.compare_digest(str(row["api_key"]), key):
                return _ctx_from_row(row, organisation)
        raise AuthenticationError("Authentication failure")


class OAuth2AuthSrv(AuthSrv):
    """OAuth2/OIDC-shaped bearer-token provider (OAuth2Srv.scala analog):
    token VERIFICATION is delegated to an injected
    ``verify(token) -> dict`` callable returning the provider's claims
    (deployments plug a JWT validator or an introspection endpoint call;
    tests fake the IdP) — the engine never parses provider tokens itself.
    The claim named by ``username_claim`` (``preferred_username`` by
    default, the OIDC standard claim) maps into the LOCAL user table for
    authorization, the same authenticate-remotely/authorize-locally
    split as :class:`DirectoryAuthSrv`: a valid token for a user unknown
    to the application is rejected.  A verifier that raises or returns a
    claims dict without the username claim is an authentication failure,
    never a silent fall-through."""

    name = "oauth2"
    capabilities = frozenset({"sso"})

    def __init__(self, users, verify, username_claim: str = "preferred_username"):
        self.users = users
        self.verify = verify
        self.username_claim = username_claim

    def authenticate_token(self, token: str) -> AuthContext:
        try:
            claims = self.verify(token)
        except Exception:
            raise AuthenticationError("Authentication failure") from None
        username = (claims or {}).get(self.username_claim)
        if not username:
            raise AuthenticationError("Authentication failure")
        row = _user_row(self.users, str(username))
        return _ctx_from_row(row, (claims or {}).get("organisation"))


#: SAN othername OID Microsoft uses for the User Principal Name — the one
#: SAN type the reference decodes specially (PkiAuthSrv.scala:46 maps
#: 1.3.6.1.4.1.311.20.2.3 to "upn" before the generic id→value fallback)
_UPN_OID = "1.3.6.1.4.1.311.20.2.3"


def _decode_asn1_string(der: bytes) -> str:
    """Decode a primitive ASN.1 string value (UTF8String/PrintableString/
    IA5String/OctetString — the shapes PkiAuthSrv.scala:22-27 ``asn1String``
    folds to text) from its DER encoding: tag byte, length (short or long
    form), then the raw bytes as UTF-8."""
    if len(der) < 2:
        raise ValueError("truncated ASN.1 value")
    n, off = der[1], 2
    if n & 0x80:  # long form: low bits = number of length octets
        k = n & 0x7F
        n = int.from_bytes(der[2 : 2 + k], "big")
        off = 2 + k
    return der[off : off + n].decode("utf-8")


class PkiAuthSrv(AuthSrv):
    """Client-certificate (mutual-TLS) authentication
    (auth/PkiAuthSrv.scala:17-91): the configured ``certificate_field``
    is extracted from the certificate's subject DN RDNs first
    (``extractFieldFromSubject``, :63-72 — LdapName RDN-type match), then
    from the SubjectAlternativeName extension (``extractFieldFromSAN``,
    :74-82 — by SAN type name, with the Microsoft UPN othername
    1.3.6.1.4.1.311.20.2.3 decoded specially, :30-61); the extracted
    value then resolves through the LOCAL user table — the same
    authenticate-remotely/authorize-locally split as the directory and
    OAuth2 providers: a certificate naming a user unknown to the
    application is rejected.

    ``certificate`` may be a ``cryptography.x509.Certificate``, PEM
    text/bytes, or DER bytes (what a TLS terminator forwards).  The
    ``cryptography`` dependency is imported lazily; environments without
    it get ``NotSupportedError`` so a MultiAuthSrv chain falls through
    instead of crashing.

    ``certificate_field`` is an RFC 4514 attribute name (``CN``,
    ``UID``, …) or dotted OID for the subject path, and a SAN type name
    (``rfc822Name``, ``dNSName``, ``upn``, ``uniformResourceIdentifier``,
    ``iPAddress``, ``directoryName``, ``registeredID``) for the SAN
    path — the same one knob the reference exposes
    (PkiAuthProvider, :94-101: ``certificateField``).  No
    ``changePassword``: the CA owns credentials.

    Identity extraction is gated behind certificate CHECKS — in the
    reference the JVM's TLS stack has already verified the client chain
    before PkiAuthSrv sees it; a header-forwarded certificate gets no
    such free verification, so this provider does its own:

    * validity period is always enforced (``not_valid_before`` /
      ``not_valid_after`` against ``clock``, injectable for tests);
    * when ``ca_bundle`` is configured (an iterable of trusted issuer
      certificates in any form ``_load_cert`` accepts), the presented
      certificate must be directly issued and SIGNED by one of them —
      a self-signed certificate naming a victim CN no longer
      authenticates.  Without a bundle the signature is NOT checked;
      only deploy that mode behind a TLS terminator that already
      verified the chain (see ``QueryServer``'s
      ``trust_client_cert_header`` opt-in)."""

    name = "pki"
    capabilities = frozenset()

    def __init__(self, users, certificate_field: str = "CN", ca_bundle=None, clock=None):
        self.users = users
        self.certificate_field = certificate_field
        self.ca_bundle = list(ca_bundle) if ca_bundle is not None else None
        self._ca_parsed = None  # bundle parsed once, lazily (hot auth path)
        self.clock = clock  # () -> aware-UTC datetime; None = wall clock

    @staticmethod
    def _load_cert(certificate):
        try:
            from cryptography import x509
        except ImportError:  # pragma: no cover - baked in this container
            raise NotSupportedError("pki: the cryptography package is not available") from None
        if isinstance(certificate, x509.Certificate):
            return certificate
        raw = certificate.encode() if isinstance(certificate, str) else bytes(certificate)
        try:
            if b"-----BEGIN" in raw:
                return x509.load_pem_x509_certificate(raw)
            return x509.load_der_x509_certificate(raw)
        except Exception:
            raise AuthenticationError("Authentication failure") from None

    def _field_from_subject(self, cert) -> str | None:
        # LdapName RDN walk (PkiAuthSrv.scala:63-72): first RDN whose type
        # matches the configured field, by short name or dotted OID
        for rdn in cert.subject.rdns:
            for attr in rdn:
                name = getattr(attr, "rfc4514_attribute_name", None) or attr.oid.dotted_string
                if name == self.certificate_field or attr.oid.dotted_string == self.certificate_field:
                    return str(attr.value)
        return None

    def _field_from_san(self, cert) -> str | None:
        from cryptography import x509

        try:
            san = cert.extensions.get_extension_for_class(x509.SubjectAlternativeName).value
        except x509.ExtensionNotFound:
            return None
        by_type = {
            "rfc822Name": x509.RFC822Name,
            "dNSName": x509.DNSName,
            "uniformResourceIdentifier": x509.UniformResourceIdentifier,
            "directoryName": x509.DirectoryName,
            "iPAddress": x509.IPAddress,
            "registeredID": x509.RegisteredID,
        }
        if self.certificate_field in by_type:
            for v in san.get_values_for_type(by_type[self.certificate_field]):
                return v.rfc4514_string() if hasattr(v, "rfc4514_string") else str(v)
        # othernames: UPN decodes specially, any other OID matches by its
        # dotted string (the reference's "add other object id" fallback)
        want_oid = _UPN_OID if self.certificate_field == "upn" else self.certificate_field
        for other in san.get_values_for_type(x509.OtherName):
            if other.type_id.dotted_string == want_oid:
                try:
                    return _decode_asn1_string(other.value)
                except (ValueError, UnicodeDecodeError):
                    continue
        return None

    def _check_validity(self, cert) -> None:
        import datetime as _dt

        now = self.clock() if self.clock is not None else _dt.datetime.now(_dt.timezone.utc)
        if now < cert.not_valid_before_utc or now > cert.not_valid_after_utc:
            raise AuthenticationError("Authentication failure")

    def _check_issuer(self, cert) -> None:
        if self._ca_parsed is None:
            # per-entry tolerance: one malformed bundle entry must not
            # brick certificate auth for certs the GOOD CAs signed —
            # skip it LOUDLY (silent skip would hide a truncated bundle)
            import warnings

            from cryptography import x509

            parsed = []
            for ca in self.ca_bundle:
                try:
                    ca_cert = self._load_cert(ca)
                except Exception:
                    warnings.warn(
                        "pki: skipping an unparseable ca_bundle entry — "
                        "certificates issued by it will NOT authenticate",
                        UserWarning,
                        stacklevel=2,
                    )
                    continue
                # a bundle entry must actually BE a CA: basicConstraints
                # CA=true — a leaf cert mistakenly dropped into the bundle
                # must not become a trusted issuer (ADVICE r9)
                try:
                    bc = ca_cert.extensions.get_extension_for_class(x509.BasicConstraints).value
                    is_ca = bool(bc.ca)
                except x509.ExtensionNotFound:
                    is_ca = False
                if not is_ca:
                    warnings.warn(
                        "pki: skipping a ca_bundle entry without basicConstraints "
                        "CA=true — it is not an issuer certificate",
                        UserWarning,
                        stacklevel=2,
                    )
                    continue
                parsed.append(ca_cert)
            self._ca_parsed = parsed
        for ca in self._ca_parsed:
            try:
                cert.verify_directly_issued_by(ca)
                # the ISSUER must be inside its own validity window at auth
                # time (same clock as the leaf check): an expired trusted CA
                # must stop vouching for the leaves it signed (ADVICE r9).
                # An expired match keeps scanning — a cross-signed leaf may
                # still carry a signature from a live bundle CA.
                self._check_validity(ca)
                return  # issuer-name match + signature verified + CA valid
            except Exception:
                continue
        raise AuthenticationError("Authentication failure")

    def authenticate_certificate(self, certificate, organisation: str | None = None) -> AuthContext:
        cert = self._load_cert(certificate)
        self._check_validity(cert)
        if self.ca_bundle is not None:
            self._check_issuer(cert)
        value = self._field_from_subject(cert)
        if value is None:
            value = self._field_from_san(cert)
        if value is None:
            raise AuthenticationError("Authentication failure")
        return _ctx_from_row(_user_row(self.users, value), organisation)


class SessionAuthSrv(AuthSrv):
    """HMAC-signed expiring session tokens (SessionAuthSrv analog).
    ``issue`` after any successful authenticate; ``authenticate_token``
    verifies signature + expiry.  ``clock`` is injectable so expiry is
    deterministic under test."""

    name = "session"
    capabilities = frozenset({"sso"})

    def __init__(self, secret: str, ttl_seconds: int = 3600, clock=time.time):
        self.secret = secret.encode()
        self.ttl = ttl_seconds
        self.clock = clock

    def _sign(self, payload: str) -> str:
        return hmac.new(self.secret, payload.encode(), hashlib.sha256).hexdigest()

    def issue(self, ctx: AuthContext) -> str:
        payload = json.dumps(
            {
                "user_id": ctx.user_id,
                "user_name": ctx.user_name,
                "organisation": ctx.organisation,
                "permissions": sorted(ctx.permissions),
                "data": ctx.data,
                "exp": int(self.clock()) + self.ttl,
            },
            sort_keys=True,
        )
        return payload.encode().hex() + "." + self._sign(payload)

    def authenticate_token(self, token: str) -> AuthContext:
        try:
            body_hex, sig = token.rsplit(".", 1)
            payload = bytes.fromhex(body_hex).decode()
        except ValueError:
            raise AuthenticationError("Authentication failure") from None
        if not hmac.compare_digest(self._sign(payload), sig):
            raise AuthenticationError("Authentication failure")
        d = json.loads(payload)
        if int(self.clock()) >= d["exp"]:
            raise AuthenticationError("Authentication failure")
        return AuthContext(
            user_id=d["user_id"],
            user_name=d["user_name"],
            organisation=d["organisation"],
            permissions=frozenset(d["permissions"]),
            data=d["data"],
        )


class MultiAuthSrv(AuthSrv):
    """Ordered first-success provider chain (MultiAuthSrv.scala:86-118):
    NotSupportedError falls through silently; real failures are recorded
    and surfaced as ONE generic AuthenticationError if every provider
    fails."""

    name = "multi"

    def __init__(self, providers: list[AuthSrv]):
        self.providers = list(providers)
        self.capabilities = frozenset().union(*(p.capabilities for p in providers)) if providers else frozenset()

    def _chain(self, call) -> AuthContext:
        if not self.providers:
            # an empty chain can never authenticate anything: that is a
            # misconfiguration, and it fails CLOSED as an auth failure
            raise AuthenticationError("Authentication failure")
        failures = []
        for p in self.providers:
            try:
                return call(p)
            except NotSupportedError:
                continue
            except AuthenticationError as e:
                failures.append((p.name, e))
        if not failures:
            # NO provider supports this method at all — that is a
            # capability statement, not an authentication verdict, and
            # callers rely on the distinction (the HTTP front door falls
            # through to the next transport on NotSupportedError but
            # fails loud on AuthenticationError)
            raise NotSupportedError("multi: no provider supports this method")
        raise AuthenticationError("Authentication failure")

    def authenticate(self, username: str, password: str, organisation: str | None = None) -> AuthContext:
        return self._chain(lambda p: p.authenticate(username, password, organisation))

    def authenticate_key(self, key: str, organisation: str | None = None) -> AuthContext:
        return self._chain(lambda p: p.authenticate_key(key, organisation))

    def authenticate_token(self, token: str) -> AuthContext:
        return self._chain(lambda p: p.authenticate_token(token))

    def authenticate_certificate(self, certificate, organisation: str | None = None) -> AuthContext:
        return self._chain(lambda p: p.authenticate_certificate(certificate, organisation))

    def authenticate_header(self, username: str, organisation: str | None = None) -> AuthContext:
        return self._chain(lambda p: p.authenticate_header(username, organisation))
