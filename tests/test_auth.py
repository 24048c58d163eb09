"""Auth tier: provider chain semantics (AuthSrv.scala:45-77,
MultiAuthSrv.scala:86-118) and the bridge into the query layer's auth
contexts (row policies + auth-aware properties)."""

from __future__ import annotations

import json

import pytest

from scalligraph_spark.auth import (
    AuthContext,
    AuthenticationError,
    KeyAuthSrv,
    MultiAuthSrv,
    NotSupportedError,
    PasswordAuthSrv,
    SessionAuthSrv,
    hash_password,
)


@pytest.fixture(scope="module")
def users(spark):
    rows = [
        (
            "u1", "alice", hash_password("s3cret", "salt1"), "salt1",
            ["acme", "globex"], ["read", "write"], "k-alice",
            json.dumps({"nations": [1, 4, 9]}),
        ),
        (
            "u2", "bob", hash_password("hunter2", "salt2"), "salt2",
            ["acme"], ["read"], None,
            None,
        ),
    ]
    return spark.createDataFrame(
        rows,
        "user_id string, user_name string, password_hash string, salt string, "
        "organisations array<string>, permissions array<string>, api_key string, "
        "policy_data string",
    )


def test_password_auth_success_and_failure(users):
    srv = PasswordAuthSrv(users)
    ctx = srv.authenticate("alice", "s3cret")
    assert ctx.user_id == "u1" and ctx.organisation == "acme"
    assert ctx.has_permission("write") and not ctx.has_permission("admin")
    assert ctx.data == {"nations": [1, 4, 9]}
    for bad in [("alice", "wrong"), ("nobody", "x")]:
        with pytest.raises(AuthenticationError):
            srv.authenticate(*bad)
    # organisation scoping: member passes, non-member rejected
    assert srv.authenticate("alice", "s3cret", organisation="globex").organisation == "globex"
    with pytest.raises(AuthenticationError):
        srv.authenticate("bob", "hunter2", organisation="globex")


def test_key_auth(users):
    srv = KeyAuthSrv(users)
    assert srv.authenticate_key("k-alice").user_name == "alice"
    with pytest.raises(AuthenticationError):
        srv.authenticate_key("k-wrong")
    with pytest.raises(NotSupportedError):
        srv.authenticate("alice", "s3cret")


def test_key_auth_is_keyed_lookup_not_full_collect(users):
    """The lookup must select its candidate via a digest filter pushed to
    the scan — never collect every API-key row to the driver: the plan
    the collect executes carries the sha2 equality filter, and a
    successful auth ships exactly one row."""
    collected = []
    orig_collect = type(users).collect

    def spy_collect(self):
        rows = orig_collect(self)
        collected.append((len(rows), self._jdf.queryExecution().optimizedPlan().toString()))
        return rows

    srv = KeyAuthSrv(users)
    import unittest.mock as mock

    with mock.patch.object(type(users), "collect", spy_collect):
        assert srv.authenticate_key("k-alice").user_name == "alice"
    (n_rows, plan), = collected
    assert n_rows == 1  # one candidate reached the driver, not the table
    assert "sha2" in plan  # the digest equality is in the executed plan


def test_session_tokens_sign_and_expire():
    now = [1000]
    srv = SessionAuthSrv("topsecret", ttl_seconds=60, clock=lambda: now[0])
    ctx = AuthContext("u1", "alice", "acme", frozenset({"read"}), {"nations": [2]})
    token = srv.issue(ctx)
    back = srv.authenticate_token(token)
    assert back == ctx  # frozen dataclass round-trip
    # tampering breaks the signature
    with pytest.raises(AuthenticationError):
        srv.authenticate_token(token[:-1] + ("0" if token[-1] != "0" else "1"))
    with pytest.raises(AuthenticationError):
        srv.authenticate_token("garbage")
    # expiry via the injected clock
    now[0] = 1061
    with pytest.raises(AuthenticationError):
        srv.authenticate_token(token)


def test_multi_auth_first_success_chain(users):
    now = [0]
    session = SessionAuthSrv("s", clock=lambda: now[0])
    multi = MultiAuthSrv([session, KeyAuthSrv(users), PasswordAuthSrv(users)])
    assert "authByKey" in multi.capabilities and "sso" in multi.capabilities
    # password falls through session+key (NotSupportedError) to the pw provider
    assert multi.authenticate("bob", "hunter2").user_id == "u2"
    assert multi.authenticate_key("k-alice").user_id == "u1"
    token = session.issue(AuthContext("u9", "eve"))
    assert multi.authenticate_token(token).user_id == "u9"
    # all-fail aggregates to ONE generic failure
    with pytest.raises(AuthenticationError, match="Authentication failure"):
        multi.authenticate("alice", "wrong")
    with pytest.raises(AuthenticationError):
        MultiAuthSrv([]).authenticate("alice", "s3cret")


def test_auth_context_drives_row_policy_end_to_end(spark, users):
    """The full reference loop: authenticate → AuthContext → to_auth() →
    policy-gated query sees exactly the granted nations."""
    from scalligraph_spark.suite import executor_for

    ctx = PasswordAuthSrv(users).authenticate("alice", "s3cret")
    ex = executor_for(spark, "/root/testdata/sf0.001", with_row_policy=True)
    got = ex.execute([{"_name": "all_customer"}], auth=ctx.to_auth())
    nations = {r["c_nationkey"] for r in got.df.select("c_nationkey").distinct().collect()}
    assert nations <= {1, 4, 9} and got.df.count() > 0
    # bob has no nation grants in policy_data -> deny-by-default
    bob = PasswordAuthSrv(users).authenticate("bob", "hunter2")
    assert ex.execute([{"_name": "all_customer"}], auth=bob.to_auth()).df.count() == 0


def test_directory_auth_bind_and_local_authorization(users):
    """DirectoryAuthSrv (LdapAuthSrv/ADAuthSrv analog): the injected
    bind callable decides the credential check against the formatted
    directory principal; organisations/permissions still come from the
    LOCAL user table, and a directory-valid principal unknown to the
    app is rejected."""
    from scalligraph_spark.auth import DirectoryAuthSrv

    binds: list = []

    def fake_directory(principal, password):
        binds.append(principal)
        return (principal, password) in {
            ("alice@corp.example", "ldap-pass"),
            ("mallory@corp.example", "mallory-pass"),
        }

    srv = DirectoryAuthSrv(users, fake_directory, principal_format="{username}@corp.example")
    ctx = srv.authenticate("alice", "ldap-pass")
    assert binds == ["alice@corp.example"]  # UPN formatting applied
    assert (ctx.user_id, ctx.organisation) == ("u1", "acme")
    assert "write" in ctx.permissions  # authorization from the app table

    with pytest.raises(AuthenticationError):
        srv.authenticate("alice", "wrong")  # directory says no
    with pytest.raises(AuthenticationError):
        srv.authenticate("mallory", "mallory-pass")  # no app user record
    assert "mallory@corp.example" not in binds  # rejected BEFORE the bind

    # a bind that raises (directory down) is a failure, not a crash
    def broken(principal, password):
        raise ConnectionError("directory unreachable")

    with pytest.raises(AuthenticationError):
        DirectoryAuthSrv(users, broken).authenticate("alice", "ldap-pass")

    # key/token stay unsupported so MultiAuthSrv falls through cleanly
    with pytest.raises(NotSupportedError):
        srv.authenticate_key("k-alice")


def test_multi_auth_chain_with_directory_provider(users):
    """Directory-first chain (the TheHive deployment shape: LDAP then
    local accounts): an LDAP-only user authenticates via the bind, a
    local-only password user falls through the failed bind to
    PasswordAuthSrv, and key auth skips the directory entirely."""
    from scalligraph_spark.auth import DirectoryAuthSrv

    directory = DirectoryAuthSrv(
        users, lambda p, w: (p, w) == ("alice", "ldap-pass")
    )
    multi = MultiAuthSrv([directory, PasswordAuthSrv(users), KeyAuthSrv(users)])

    assert multi.authenticate("alice", "ldap-pass").user_id == "u1"  # via bind
    assert multi.authenticate("bob", "hunter2").user_id == "u2"  # via password
    assert multi.authenticate_key("k-alice").user_id == "u1"  # skips directory
    with pytest.raises(AuthenticationError):
        multi.authenticate("bob", "nope")


def test_oauth2_token_provider_maps_claims_to_local_users(users):
    """OAuth2AuthSrv: the injected verifier owns token validity; the
    OIDC username claim maps into the local user table for
    authorization.  Valid tokens for unknown users, verifier errors,
    and claims without the username all fail generically; the provider
    chains behind SessionAuthSrv for token auth."""
    from scalligraph_spark.auth import OAuth2AuthSrv, SessionAuthSrv

    def verify(token):
        if token == "good-alice":
            return {"preferred_username": "alice", "organisation": "globex"}
        if token == "good-mallory":
            return {"preferred_username": "mallory"}
        if token == "no-claim":
            return {"sub": "opaque"}
        raise ValueError("bad signature")

    srv = OAuth2AuthSrv(users, verify)
    ctx = srv.authenticate_token("good-alice")
    assert (ctx.user_id, ctx.organisation) == ("u1", "globex")  # claim-selected org
    assert "write" in ctx.permissions  # authorization from the app table

    for bad in ("good-mallory", "no-claim", "garbage"):
        with pytest.raises(AuthenticationError):
            srv.authenticate_token(bad)
    with pytest.raises(NotSupportedError):
        srv.authenticate("alice", "pw")  # passwords stay with the IdP

    # chain: session tokens first, IdP tokens fall through cleanly
    sess = SessionAuthSrv(secret="s", ttl_seconds=60)
    multi = MultiAuthSrv([sess, srv])
    assert multi.authenticate_token("good-alice").user_id == "u1"
    tok = sess.issue(srv.authenticate_token("good-alice"))
    assert multi.authenticate_token(tok).user_id == "u1"
