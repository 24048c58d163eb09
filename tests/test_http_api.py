"""HTTP front door: a JSON chain round-trips over a REAL socket through
the same parse_and_execute fold the embedded API uses, with the
reference's error shapes (ScalligraphRouter.scala:74-85,
ErrorHandler.scala:28-51) — typed JSON errors, accumulated Field-tier
validation, X-Total for rich pages, Bearer-key auth → 401/403."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _post(port, chain=None, body=None, headers=None, path="/api/v1/query"):
    data = body if body is not None else json.dumps({"query": chain}).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, headers=headers or {}, method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, dict(resp.headers), json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), json.loads(e.read())


@pytest.fixture(scope="module")
def server(spark):
    from scalligraph_spark.http_api import QueryServer
    from scalligraph_spark.suite import executor_for

    srv = QueryServer(executor_for(spark, SF_DIR)).serve()
    yield srv
    srv.close()


def test_query_chain_roundtrip_over_socket(server):
    status, headers, rows = _post(
        server.port,
        chain=[
            {"_name": "all_customer"},
            {"_name": "filter", "_is": {"_field": "c_mktsegment", "_value": "BUILDING"}},
            {"_name": "sort", "_fields": [{"c_custkey": "incr"}]},
            {"_name": "limit", "n": 3},
        ],
    )
    assert status == 200 and headers["Content-Type"] == "application/json"
    assert len(rows) == 3
    assert [r["c_custkey"] for r in rows] == sorted(r["c_custkey"] for r in rows)
    assert all(r["c_mktsegment"] == "BUILDING" for r in rows)


def test_concurrent_clients_share_one_session(server):
    """ThreadingHTTPServer + one SparkSession: 8 simultaneous chains must
    all succeed with per-request-correct results (Spark schedules
    concurrent actions from multiple driver threads; nothing in the
    handler may share mutable per-request state)."""
    import concurrent.futures

    segments = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD"] * 2

    def one(seg):
        status, _, rows = _post(
            server.port,
            chain=[
                {"_name": "all_customer"},
                {"_name": "filter", "_is": {"_field": "c_mktsegment", "_value": seg}},
                {"_name": "limit", "n": 5},
            ],
        )
        return status, seg, rows

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(one, segments))
    for status, seg, rows in results:
        assert status == 200
        assert rows and all(r["c_mktsegment"] == seg for r in rows)


def test_rich_page_total_moves_to_x_total_header(server):
    status, headers, rows = _post(
        server.port,
        chain=[
            {"_name": "all_customer"},
            {"_name": "sort", "_fields": [{"c_custkey": "incr"}]},
            {"_name": "page", "from": 0, "to": 5, "withTotal": True},
        ],
    )
    assert status == 200
    assert len(rows) == 5 and all("total" not in r for r in rows)
    assert int(headers["X-Total"]) == 150  # sf0.001 customer count


def test_malformed_chain_returns_accumulated_field_errors(server):
    status, _, err = _post(
        server.port,
        chain=[
            {"_name": "noSuchQuery"},
            {"_name": "limit", "n": "three"},
        ],
    )
    assert status == 400 and err["type"] == "AttributeCheckingError"
    kinds = {(e["name"], e["type"]) for e in err["errors"]}
    assert ("[0]._name", "UnknownAttributeError") in kinds
    assert any(name == "[1].n" for name, _ in kinds)  # bad number accumulated too


def test_error_shapes_bad_json_wrong_path_missing_query(server):
    status, _, err = _post(server.port, body=b"{not json")
    assert (status, err["type"]) == (400, "BadRequest")
    status, _, err = _post(server.port, chain=[{"_name": "all_customer"}], path="/api/v9/query")
    assert (status, err["type"]) == (404, "NotFound")
    status, _, err = _post(server.port, body=json.dumps({"q": []}).encode())
    assert (status, err["type"]) == (400, "BadRequest")


def test_bearer_auth_and_permission_gate(spark):
    from scalligraph_spark.auth import KeyAuthSrv
    from scalligraph_spark.http_api import QueryServer
    from scalligraph_spark.suite import executor_for

    users = spark.createDataFrame(
        [
            ("u1", "alice", "k-alice", "acme", ["read:customer"]),
            ("u2", "bob", "k-bob", "acme", []),
        ],
        "user_id string, user_name string, api_key string, organisation string, permissions array<string>",
    )
    ex = executor_for(spark, SF_DIR)
    ex.register_init(
        "gatedCustomers",
        lambda g, s, a: g.V("customer"),
        permission="read:customer",
    )
    with QueryServer(ex, auth_srv=KeyAuthSrv(users)).serve() as srv:
        chain = [{"_name": "gatedCustomers"}, {"_name": "count"}]
        # no/bad key -> 401 AuthenticationError
        status, _, err = _post(srv.port, chain=chain)
        assert (status, err["type"]) == (401, "AuthenticationError")
        status, _, err = _post(
            srv.port, chain=chain, headers={"Authorization": "Bearer k-wrong"}
        )
        assert (status, err["type"]) == (401, "AuthenticationError")
        # authenticated but unpermitted -> 403 AuthorizationError
        status, _, err = _post(
            srv.port, chain=chain, headers={"Authorization": "Bearer k-bob"}
        )
        assert (status, err["type"]) == (403, "AuthorizationError")
        assert "read:customer" in err["message"]
        # permitted -> the count comes back
        status, _, rows = _post(
            srv.port, chain=chain, headers={"Authorization": "Bearer k-alice"}
        )
        assert status == 200 and rows[0]["count"] == 150


def test_access_log_records_authenticated_user(spark):
    """The access-log record carries the authenticated user_id
    (AccessLogFilter.scala:14-43 logs the login name alongside
    method/path/status/time); failed auth logs user=None and a fresh
    request on the same keep-alive connection never inherits the
    previous request's identity."""
    from scalligraph_spark.auth import KeyAuthSrv
    from scalligraph_spark.http_api import QueryServer
    from scalligraph_spark.suite import executor_for

    users = spark.createDataFrame(
        [("u1", "alice", "k-alice", "acme", ["read:customer"])],
        "user_id string, user_name string, api_key string, organisation string, permissions array<string>",
    )
    records = []
    srv_obj = QueryServer(
        executor_for(spark, SF_DIR), auth_srv=KeyAuthSrv(users), access_log=records.append
    )
    with srv_obj.serve() as srv:
        chain = [{"_name": "all_customer"}, {"_name": "count"}]
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=60)
        body = json.dumps({"query": chain}).encode()
        conn.request("POST", "/api/v1/query", body=body,
                     headers={"Authorization": "Bearer k-alice",
                              "Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200 and json.loads(r.read())[0]["count"] == 150
        # same keep-alive connection (same handler thread), now anonymous
        conn.request("POST", "/api/v1/query", body=body,
                     headers={"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 401
        r.read()
        conn.close()
    assert [(rec["status"], rec["user"]) for rec in records] == [(200, "u1"), (401, None)]


def test_streamed_chunked_response_and_access_log(spark):
    """Transport completion: chunkSize streams the result as a chunked
    JSON array (toLocalIterator-backed — the IteratorOutput analog) with
    X-Total peeked into the headers BEFORE any body byte; every response
    carries Request-Time; one access-log record fires per request
    (AccessLogFilter analog)."""
    from scalligraph_spark.http_api import QueryServer
    from scalligraph_spark.suite import executor_for

    records = []
    with QueryServer(executor_for(spark, SF_DIR), access_log=records.append).serve() as srv:
        body = json.dumps(
            {
                "query": [
                    {"_name": "all_customer"},
                    {"_name": "sort", "_fields": [{"c_custkey": "incr"}]},
                    {"_name": "page", "from": 0, "to": 10, "withTotal": True},
                ],
                "chunkSize": 3,  # forces multiple transfer chunks
            }
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/api/v1/query", data=body, method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as resp:
            assert resp.headers["X-Total"] == "150"
            assert resp.headers["Transfer-Encoding"] == "chunked"
            assert "Content-Length" not in resp.headers
            assert int(resp.headers["Request-Time"]) >= 0
            rows = json.loads(resp.read())
        assert len(rows) == 10 and all("total" not in r for r in rows)
        assert [r["c_custkey"] for r in rows] == list(range(10))

        # buffered responses carry Request-Time too, and errors are logged
        status, headers, _ = _post(srv.port, chain=[{"_name": "nope"}])
        assert status == 400 and int(headers["Request-Time"]) >= 0

    assert [r["status"] for r in records] == [200, 400]
    assert records[0]["method"] == "POST" and records[0]["path"] == "/api/v1/query"
    assert records[0]["bytes"] > 0 and records[0]["ms"] >= 0
    assert all(r["user"] is None for r in records), "anonymous requests log user=None"


def test_login_flow_issues_session_token_that_authorizes_queries(spark):
    """The reference's session flow over the wire: POST /login with
    credentials -> HMAC session token; the token rides Bearer headers
    into /query where permissions apply; bad credentials and tampered
    tokens 401."""
    from scalligraph_spark.auth import PasswordAuthSrv, SessionAuthSrv, hash_password
    from scalligraph_spark.http_api import QueryServer
    from scalligraph_spark.suite import executor_for

    users = spark.createDataFrame(
        [("u1", "alice", hash_password("s3cret", "pep"), "pep", ["read:customer"])],
        "user_id string, user_name string, password_hash string, salt string, permissions array<string>",
    )
    ex = executor_for(spark, SF_DIR)
    ex.register_init("gated", lambda g, s, a: g.V("customer"), permission="read:customer")
    records = []
    srv = QueryServer(
        ex,
        auth_srv=PasswordAuthSrv(users),
        session_srv=SessionAuthSrv(secret="test-secret", ttl_seconds=3600),
        access_log=records.append,
    ).serve()
    try:
        # login -> token + identity payload
        status, _, out = _post(
            srv.port,
            body=json.dumps({"user": "alice", "password": "s3cret"}).encode(),
            path="/api/v1/login",
        )
        assert status == 200 and out["user"] == "alice"
        assert out["permissions"] == ["read:customer"]
        token = out["token"]

        # the session token authorizes a permission-gated query
        status, _, rows = _post(
            srv.port,
            chain=[{"_name": "gated"}, {"_name": "count"}],
            headers={"Authorization": f"Bearer {token}"},
        )
        assert status == 200 and rows[0]["count"] == 150

        # bad password / tampered token / malformed body
        status, _, err = _post(
            srv.port,
            body=json.dumps({"user": "alice", "password": "wrong"}).encode(),
            path="/api/v1/login",
        )
        assert (status, err["type"]) == (401, "AuthenticationError")
        status, _, err = _post(
            srv.port,
            chain=[{"_name": "gated"}, {"_name": "count"}],
            headers={"Authorization": f"Bearer {token[:-4]}beef"},
        )
        assert (status, err["type"]) == (401, "AuthenticationError")
        status, _, err = _post(srv.port, body=b'{"user": "alice"}', path="/api/v1/login")
        assert (status, err["type"]) == (400, "BadRequest")
        # the access log attributes the SUCCESSFUL login to the user; the
        # failed/malformed attempts log user=None
        login_recs = [(r["status"], r["user"]) for r in records
                      if r["path"] == "/api/v1/login"]
        assert login_recs == [(200, "u1"), (401, None), (400, None)]
    finally:
        srv.close()


def test_login_via_directory_provider_chain(spark):
    """HTTP login through a directory-first MultiAuthSrv chain: an
    LDAP-only user (no usable local password hash) logs in via the fake
    directory bind, receives a session token, and the token authorizes
    queries; wrong directory credentials 401."""
    from scalligraph_spark.auth import (
        DirectoryAuthSrv,
        MultiAuthSrv,
        PasswordAuthSrv,
        SessionAuthSrv,
    )
    from scalligraph_spark.http_api import QueryServer
    from scalligraph_spark.suite import executor_for

    users = spark.createDataFrame(
        [("u9", "carol", "!directory-managed!", "n/a", ["read:customer"])],
        "user_id string, user_name string, password_hash string, salt string, "
        "permissions array<string>",
    )
    directory = DirectoryAuthSrv(
        users,
        lambda p, w: (p, w) == ("carol@corp.example", "dir-pass"),
        principal_format="{username}@corp.example",
    )
    ex = executor_for(spark, SF_DIR)
    ex.register_init("gated", lambda g, s, a: g.V("customer"), permission="read:customer")
    srv = QueryServer(
        ex,
        auth_srv=MultiAuthSrv([directory, PasswordAuthSrv(users)]),
        session_srv=SessionAuthSrv(secret="test-secret", ttl_seconds=3600),
    ).serve()
    try:
        status, _, out = _post(
            srv.port,
            body=json.dumps({"user": "carol", "password": "dir-pass"}).encode(),
            path="/api/v1/login",
        )
        assert status == 200 and out["user"] == "carol"
        token = out["token"]
        status, _, rows = _post(
            srv.port,
            chain=[{"_name": "gated"}, {"_name": "count"}],
            headers={"Authorization": f"Bearer {token}"},
        )
        assert status == 200 and rows[0]["count"] == 150

        status, _, err = _post(
            srv.port,
            body=json.dumps({"user": "carol", "password": "bad"}).encode(),
            path="/api/v1/login",
        )
        assert (status, err["type"]) == (401, "AuthenticationError")
    finally:
        srv.close()


def test_query_cache_behind_the_front_door(spark, tmp_path):
    """QueryServer(cache=…): identical chains serve from the
    version-keyed cache with X-Query-Cache hit/miss visibility; a store
    write invalidates; noCache and streamed requests bypass."""
    from scalligraph_spark.catalog import GraphCatalog
    from scalligraph_spark.http_api import QueryServer
    from scalligraph_spark.qlang import QueryCache, QueryExecutor
    from scalligraph_spark.store import LabelStore

    store = LabelStore(str(tmp_path / "qc"))
    store.write(
        "person",
        spark.createDataFrame(
            [(1, "marko", 29), (2, "vadas", 27)], "person_id long, name string, age long"
        ),
    )
    cat = GraphCatalog(spark)
    cat.add_store_vertex(store, "person", "person_id")
    ex = QueryExecutor(cat)
    ex.register_init("people", lambda g, s, a: g.V("person"))
    srv = QueryServer(ex, cache=QueryCache(ex, store)).serve()
    try:
        chain = [{"_name": "people"}, {"_name": "count"}]
        status, h1, rows1 = _post(srv.port, chain=chain)
        assert (status, h1.get("X-Query-Cache")) == (200, "miss")
        assert rows1[0]["count"] == 2
        status, h2, rows2 = _post(srv.port, chain=chain)
        assert (status, h2.get("X-Query-Cache")) == (200, "hit")
        assert rows2 == rows1

        # label write → exact invalidation, fresh rows
        store.write(
            "person",
            store.read(spark, "person").unionByName(
                spark.createDataFrame([(3, "josh", 32)], "person_id long, name string, age long")
            ),
        )
        status, h3, rows3 = _post(srv.port, chain=chain)
        assert (status, h3.get("X-Query-Cache")) == (200, "miss")
        assert rows3[0]["count"] == 3

        # explicit opt-out: no cache header at all
        status, h4, _ = _post(
            srv.port, body=json.dumps({"query": chain, "noCache": True}).encode()
        )
        assert status == 200 and "X-Query-Cache" not in h4
    finally:
        srv.close()


def _get(port, path):
    req = urllib.request.Request(f"http://127.0.0.1:{port}{path}")
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_explain_endpoint(server):
    status, _, out = _post(
        server.port,
        body=json.dumps(
            {
                "query": [
                    {"_name": "all_customer"},
                    {"_name": "filter", "_gte": {"_field": "c_acctbal", "_value": 0}},
                ]
            }
        ).encode(),
        path="/api/v1/explain",
    )
    assert status == 200
    text = out["explain"]
    assert "all_customer <registered[graph]>" in text
    assert "Physical plan" in text and "PushedFilters" in text
    # malformed chains get the Field-tier accumulated errors, typed
    status2, _, err = _post(
        server.port,
        body=json.dumps({"query": [{"no_name": 1}]}).encode(),
        path="/api/v1/explain",
    )
    assert status2 == 400


def test_schema_endpoint(server):
    status, out = _get(server.port, "/api/v1/schema")
    assert status == 200
    assert "type Query" in out["sdl"] and "all_customer: CustomerStep" in out["sdl"]


def test_health_endpoint_without_store(server):
    """Liveness + runtime diagnostics (ProcessStats.scala:8-31 analog):
    JVM memory, executor cache/task view from the statusTracker, and
    driver Python memory/threads — all metadata-only."""
    status, out = _get(server.port, "/api/v1/health")
    assert status == 200 and out["status"] == "ok" and "labels" not in out
    rt = out["runtime"]
    assert rt["jvm"]["max_mb"] > 0 and rt["jvm"]["used_mb"] >= 0
    assert rt["python"]["threads"] >= 1 and rt["python"]["max_rss_mb"] > 0
    assert rt["default_parallelism"] >= 1
    assert isinstance(rt["executors"], list) and rt["active_jobs"] >= 0


def test_health_endpoint_with_store(spark, tmp_path):
    from scalligraph_spark.http_api import QueryServer
    from scalligraph_spark.store import LabelStore
    from scalligraph_spark.suite import executor_for

    store = LabelStore(str(tmp_path / "hstore"))
    store.write("things", spark.range(5).toDF("id"))
    with QueryServer(executor_for(spark, SF_DIR), store=store).serve() as srv:
        status, out = _get(srv.port, "/api/v1/health")
    assert status == 200 and out["status"] == "ok"
    (row,) = [r for r in out["labels"] if r["label"] == "things"]
    assert row["version"] == 1
    assert out["runtime"]["jvm"]["max_mb"] > 0  # runtime section rides along


def test_health_stays_alive_when_spark_is_gone(tmp_path):
    """/health is a LIVENESS endpoint first: a stopped SparkContext or
    dead py4j gateway must degrade the diagnostics (Python section only,
    labels_error note), never 500 the probe loop that decides whether to
    restart the server."""
    import json as _json

    from scalligraph_spark.http_api import QueryServer
    from scalligraph_spark.store import LabelStore

    class _DeadCatalog:
        @property
        def spark(self):
            raise RuntimeError("py4j gateway is down")

    class _DeadExecutor:
        catalog = _DeadCatalog()

    srv = QueryServer(_DeadExecutor(), store=LabelStore(str(tmp_path / "s")))
    status, _hdrs, body = srv._run_health()
    out = _json.loads(body)
    assert status == 200 and out["status"] == "ok"
    assert out["runtime"]["python"]["threads"] >= 1
    assert "jvm" not in out["runtime"] and "default_parallelism" not in out["runtime"]
    assert "labels_error" in out and "labels" not in out


def test_basic_auth_transport(spark):
    """HTTP Basic (BasicAuthSrv.scala:20-38): 'Authorization: Basic
    <b64 user:pass>' decodes into the password provider — the curl -u
    transport.  Wrong password / malformed base64 / unknown user are all
    the one generic 401."""
    import base64

    from scalligraph_spark.auth import MultiAuthSrv, PasswordAuthSrv, hash_password
    from scalligraph_spark.http_api import QueryServer
    from scalligraph_spark.suite import executor_for

    users = spark.createDataFrame(
        [("u1", "alice", hash_password("s3cret", "salt1"), "salt1", ["acme"], ["read"], None)],
        "user_id string, user_name string, password_hash string, salt string, "
        "organisations array<string>, permissions array<string>, policy_data string",
    )
    ex = executor_for(spark, SF_DIR)
    chain = [{"_name": "all_customer"}, {"_name": "count"}]

    def basic(u, p):
        return {"Authorization": "Basic " + base64.b64encode(f"{u}:{p}".encode()).decode()}

    with QueryServer(ex, auth_srv=MultiAuthSrv([PasswordAuthSrv(users)])).serve() as srv:
        status, _, rows = _post(srv.port, chain=chain, headers=basic("alice", "s3cret"))
        assert status == 200 and rows[0]["count"] == 150
        for hdr in (
            basic("alice", "wrong"),
            basic("mallory", "s3cret"),
            {"Authorization": "Basic @@not-base64@@"},
        ):
            status, _, err = _post(srv.port, chain=chain, headers=hdr)
            assert (status, err["type"]) == (401, "AuthenticationError"), hdr
        # a password containing ':' survives the first-colon split
        users2 = spark.createDataFrame(
            [("u2", "carol", hash_password("a:b:c", "s2"), "s2", ["acme"], ["read"], None)],
            users.schema,
        )
    with QueryServer(ex, auth_srv=PasswordAuthSrv(users2)).serve() as srv:
        status, _, rows = _post(srv.port, chain=chain, headers=basic("carol", "a:b:c"))
        assert status == 200


def test_trusted_user_header_sso(spark):
    """Reverse-proxy SSO (HeaderAuthenticateSrv.scala:15-35): the
    username header authenticates ONLY under the explicit
    trust_user_header opt-in; by default the header is inert (401); a
    proxy-asserted unknown user fails loud (401, no fallthrough); and a
    chain without a header provider falls through to Bearer."""
    from scalligraph_spark.auth import HeaderAuthSrv, KeyAuthSrv, MultiAuthSrv
    from scalligraph_spark.http_api import QueryServer
    from scalligraph_spark.suite import executor_for

    users = spark.createDataFrame(
        [("u1", "alice", ["acme"], ["read"], None, "k-alice")],
        "user_id string, user_name string, organisations array<string>, "
        "permissions array<string>, policy_data string, api_key string",
    )
    ex = executor_for(spark, SF_DIR)
    chain = [{"_name": "all_customer"}, {"_name": "count"}]
    srv_chain = MultiAuthSrv([HeaderAuthSrv(users), KeyAuthSrv(users)])

    # opt-in OFF (default): the header any client can type is ignored
    with QueryServer(ex, auth_srv=srv_chain).serve() as srv:
        status, _, err = _post(srv.port, chain=chain, headers={"X-Remote-User": "alice"})
        assert (status, err["type"]) == (401, "AuthenticationError")

    with QueryServer(ex, auth_srv=srv_chain, trust_user_header="X-Remote-User").serve() as srv:
        # proxy-asserted user authenticates
        status, _, rows = _post(srv.port, chain=chain, headers={"X-Remote-User": "alice"})
        assert status == 200 and rows[0]["count"] == 150
        # unknown proxy-asserted user fails LOUD — no Bearer fallthrough
        status, _, err = _post(
            srv.port, chain=chain,
            headers={"X-Remote-User": "mallory", "Authorization": "Bearer k-alice"},
        )
        assert (status, err["type"]) == (401, "AuthenticationError")
        # no header → Bearer still works
        status, _, rows = _post(srv.port, chain=chain,
                                headers={"Authorization": "Bearer k-alice"})
        assert status == 200

    # opt-in set but NO header provider in the chain: NotSupportedError
    # falls through to Bearer (the MultiAuthSrv discipline)
    with QueryServer(ex, auth_srv=MultiAuthSrv([KeyAuthSrv(users)]),
                     trust_user_header="X-Remote-User").serve() as srv:
        status, _, rows = _post(
            srv.port, chain=chain,
            headers={"X-Remote-User": "alice", "Authorization": "Bearer k-alice"},
        )
        assert status == 200


def test_access_log_marks_failed_sends(spark):
    """ADVICE r11: a send that fails midway (client disconnect) must not
    be logged as a completed response — the log appends a record with
    error="write_failed" carrying how far the body actually got, so
    operators can distinguish delivered bytes from attempted ones."""
    import socket
    import struct
    import time as _t

    from scalligraph_spark.http_api import QueryServer
    from scalligraph_spark.suite import executor_for

    records = []
    with QueryServer(executor_for(spark, SF_DIR), access_log=records.append).serve() as srv:
        body = json.dumps(
            {"query": [{"_name": "all_lineitem"}], "chunkSize": 500}
        ).encode()
        s = socket.create_connection(("127.0.0.1", srv.port), timeout=60)
        s.sendall(
            b"POST /api/v1/query HTTP/1.1\r\nHost: x\r\n"
            b"Content-Type: application/json\r\n"
            b"Content-Length: %d\r\n\r\n%s" % (len(body), body)
        )
        assert s.recv(1)  # headers flushed — the server is now mid-stream
        # RST-close: the kernel rejects every later server write with
        # EPIPE/ECONNRESET while the Spark iterator is still producing
        s.setsockopt(socket.SOL_SOCKET, socket.SO_LINGER, struct.pack("ii", 1, 0))
        s.close()
        deadline = _t.time() + 60
        while _t.time() < deadline and not any(r.get("error") for r in records):
            _t.sleep(0.05)
    failed = [r for r in records if r.get("error") == "write_failed"]
    assert failed, f"expected a write_failed record, got {records}"
    assert failed[0]["status"] == 200 and failed[0]["bytes"] >= 0


def test_cold_key_stampede_computes_once(spark, tmp_path):
    """VERDICT r11 #6: ThreadingHTTPServer + QueryCache under a cold-key
    stampede — 8 concurrent identical chains must compute ONCE (per-key
    single-flight); followers block on the leader and serve the
    committed write-through."""
    import threading
    import time as _t

    from scalligraph_spark.catalog import GraphCatalog
    from scalligraph_spark.http_api import QueryServer
    from scalligraph_spark.qlang import QueryCache, QueryExecutor
    from scalligraph_spark.store import LabelStore

    store = LabelStore(str(tmp_path / "qc"))
    store.write(
        "person",
        spark.createDataFrame(
            [(1, "marko", 29), (2, "vadas", 27)], "person_id long, name string, age long"
        ),
    )
    cat = GraphCatalog(spark)
    cat.add_store_vertex(store, "person", "person_id")
    ex = QueryExecutor(cat)
    ex.register_init("people", lambda g, s, a: g.V("person"))

    class CountingExecutor:
        """Executor proxy that counts compute calls and widens the
        stampede window so every thread is in flight before the leader
        lands its write-through."""

        def __init__(self, inner):
            self.inner = inner
            self.catalog = inner.catalog
            self._row_policies = getattr(inner, "_row_policies", {})
            self.calls = 0
            self._mu = threading.Lock()

        def execute(self, chain, auth=None):
            with self._mu:
                self.calls += 1
            _t.sleep(1.0)
            return self.inner.execute(chain, auth=auth)

    counting = CountingExecutor(ex)
    cache = QueryCache(counting, store)
    srv = QueryServer(ex, cache=cache).serve()
    try:
        chain = [{"_name": "people"}, {"_name": "count"}]
        results, errors = [], []

        def fire():
            try:
                status, headers, rows = _post(srv.port, chain=chain)
                results.append((status, rows[0]["count"]))
            except Exception as e:  # surface thread failures in the assert
                errors.append(repr(e))

        threads = [threading.Thread(target=fire) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errors, errors
        assert results == [(200, 2)] * 8
        assert counting.calls == 1, (
            f"stampede must single-flight: {counting.calls} computes"
        )
        assert cache.misses == 1 and cache.hits == 7
    finally:
        srv.close()
