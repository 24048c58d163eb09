"""Stdlib HTTP front door for the query executor — the ScalligraphRouter
analog.

Reference: the Play router exposes ``POST /api/v${version}/query``, folds
the body's ``query`` chain through the versioned executor, streams the
result as a chunked JSON array with an ``X-Total`` header when the query
computed a total (ScalligraphRouter.scala:74-85,
QueryExecutor.scala:40-45, IteratorOutput), and maps every engine error
to a typed JSON body + status through a central handler
(ErrorHandler.scala:28-51, Errors.scala:6-40).

Spark re-expression: ``http.server.ThreadingHTTPServer`` over the same
``parse_and_execute`` fold the embedded API uses — the HTTP layer adds
transport, auth-header handling and the error-shape contract, nothing
else.  Chain validation still happens in the Field tier
(fields.validate_chain), so malformed chains come back as the
reference's accumulated ``AttributeCheckingError`` JSON
(``{"type": ..., "message": ..., "errors": [...]}``), not a stack trace.

Auth: ``Authorization: Bearer <api-key>`` resolves through any AuthSrv
with ``authenticate_key`` (KeyAuthSrv / MultiAuthSrv); the resulting
AuthContext feeds the executor — permission-gated registered queries and
row policies then apply exactly as in-process (401 on a bad key, 403 on
a missing permission).  Without an ``auth_srv`` the server runs open
(embedded/trusted deployments), passing ``auth=None``.

This is a front door for the DRIVER process: Spark stays the execution
engine; handler threads only build plans and iterate results.
"""

from __future__ import annotations

import itertools
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from scalligraph_spark.fields import AttributeCheckingError
from scalligraph_spark.qlang.executor import AuthorizationError


def _error_body(exc: BaseException) -> tuple[int, dict]:
    """ErrorHandler.toErrorResult analog: exception → (status, typed JSON)."""
    from scalligraph_spark.auth import AuthenticationError

    if isinstance(exc, AttributeCheckingError):
        return 400, {
            "type": "AttributeCheckingError",
            "message": str(exc),
            "errors": [
                {"name": e.name, "type": e.type, "message": str(e)} for e in exc.errors
            ],
        }
    from scalligraph_spark.auth import NotSupportedError

    if isinstance(exc, AuthenticationError):
        return 401, {"type": "AuthenticationError", "message": str(exc)}
    if isinstance(exc, NotSupportedError):
        # no provider supports the attempted method: to the CLIENT that is
        # an authentication failure, not a server error (and the generic
        # message leaks nothing about the provider topology)
        return 401, {"type": "AuthenticationError", "message": "Authentication failure"}
    if isinstance(exc, AuthorizationError):
        return 403, {"type": "AuthorizationError", "message": str(exc)}
    if isinstance(exc, (ValueError, KeyError, TypeError)):
        return 400, {"type": "BadRequest", "message": str(exc)}
    return 500, {"type": type(exc).__name__, "message": str(exc)}


class QueryServer:
    """One executor behind ``POST /api/v1/query``.

    ``serve(port=0)`` binds (port 0 = ephemeral, read ``.port``) and
    handles requests on daemon threads until :meth:`close`.  Body:
    ``{"query": [<chain steps>]}``.  Response: JSON array of result
    rows; when the chain computed a rich-page total (a ``total`` column,
    executor page/withTotal contract) the value moves to the ``X-Total``
    response header — the reference's streamed-output contract
    (QueryExecutor.scala:45) — and leaves the row bodies.
    """

    def __init__(
        self,
        executor,
        auth_srv=None,
        api_version: int = 1,
        access_log=None,
        session_srv=None,
        cache=None,
        store=None,
        trust_client_cert_header: bool = False,
        trust_user_header: str | None = None,
        maintenance=None,
    ):
        self.executor = executor
        # X-Client-Cert is only meaningful when a trusted TLS-terminating
        # proxy sets it; a directly-reachable server must NOT honor a
        # header any client can forge (self-signed cert naming a victim).
        # Explicit opt-in, off by default.
        self.trust_client_cert_header = bool(trust_client_cert_header)
        # reverse-proxy SSO username header (HeaderAuthenticateSrv analog):
        # the header NAME to trust (e.g. "X-Remote-User"), None = off — the
        # same forgery discipline as the cert header
        self.trust_user_header = str(trust_user_header) if trust_user_header else None
        # optional LabelStore: wires GET /health to store_report (the
        # metadata-only operational dashboard — no data scans per request)
        self.store = store
        self.auth_srv = auth_srv
        # optional version-keyed result cache (qlang.QueryCache): when set,
        # non-streamed queries serve store-committed results on identical
        # (chain, auth identity, store versions); the response carries
        # X-Query-Cache: hit|miss.  Streamed requests bypass it — the
        # chunked path exists for results too big to want a cached copy.
        self.cache = cache
        # optional (store, [(index_name, kind), ...]) fleet declaration:
        # wires POST /maintenance to maintain_indexes over EXACTLY these
        # indexes — the declared-at-construction discipline of atSnapshot
        # (clients choose the policy knobs, never the labels), gated on
        # the "admin" permission (the reference's admin/reindex routes)
        self.maintenance = maintenance
        self.path = f"/api/v{api_version}/query"
        self.login_path = f"/api/v{api_version}/login"
        # GraphQL facade over the same executor (SchemaGenerator route
        # analog): POST {"query": "...", "variables": {...}} — shares the
        # auth transports and the registered-query surface with /query
        self.graphql_path = f"/api/v{api_version}/graphql"
        self._graphql_schema = None
        # operational tier: chain explain (TraversalPrinter over HTTP),
        # GraphQL SDL dump, store health
        self.explain_path = f"/api/v{api_version}/explain"
        self.schema_path = f"/api/v{api_version}/schema"
        self.health_path = f"/api/v{api_version}/health"
        self.maintenance_path = f"/api/v{api_version}/maintenance"
        # AccessLogFilter analog (AccessLogFilter.scala:16-36): called with
        # one record per request; every response also carries Request-Time
        self.access_log = access_log
        self._request_ctx = threading.local()  # per-request user for the log
        # SessionAuthSrv for the login flow: POST /login authenticates
        # credentials through auth_srv and issues an HMAC session token;
        # Bearer headers then accept tokens OR api keys (the reference's
        # session-cookie + key dual transport)
        self.session_srv = session_srv
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- request handling --------------------------------------------------
    def _auth_from_headers(self, headers) -> dict | None:
        auth = self._resolve_auth(headers)
        if auth is not None:
            # per-request thread-local (each request runs on its own
            # daemon thread): the access-log record can report WHO made
            # the request (AccessLogFilter.scala:14-43 logs the username
            # alongside method/path/status/time) without re-running the
            # authentication chain at log time
            self._request_ctx.user = auth.get("user")
        return auth

    def _resolve_auth(self, headers) -> dict | None:
        if self.auth_srv is None:
            return None
        from scalligraph_spark.auth import AuthenticationError, NotSupportedError

        # client-certificate transport (PkiAuthSrv.scala:84-91 reads the
        # TLS client chain; behind a TLS-terminating proxy the chain head
        # arrives URL-encoded in a header, the nginx
        # $ssl_client_escaped_cert convention).  Honored ONLY under the
        # explicit trusted-proxy opt-in — otherwise the header is
        # attacker-controlled — and a presented-but-rejected certificate
        # FAILS the request instead of silently falling through to
        # Bearer: a misconfigured proxy or revoked cert should surface as
        # a 401, not as a puzzling key-auth fallback.  NotSupportedError
        # (no provider in the chain does certificates) still falls
        # through, the MultiAuthSrv discipline.
        cert_pem = headers.get("X-Client-Cert")
        if cert_pem and self.trust_client_cert_header:
            from urllib.parse import unquote

            try:
                return self.auth_srv.authenticate_certificate(unquote(cert_pem)).to_auth()
            except NotSupportedError:
                pass
        # trusted-header SSO (HeaderAuthenticateSrv.scala:15-35): a reverse
        # proxy that already authenticated the user forwards the username in
        # the configured header.  Same trust discipline as the cert header —
        # explicit opt-in (the header NAME, so deployments match their proxy
        # config), presented-but-rejected FAILS rather than falling through
        # (a proxy-asserted unknown user is a 401, not a key-auth puzzle);
        # only NotSupportedError (no header provider in the chain) falls on.
        if self.trust_user_header:
            user_hdr = headers.get(self.trust_user_header)
            if user_hdr:
                try:
                    return self.auth_srv.authenticate_header(user_hdr).to_auth()
                except NotSupportedError:
                    pass
        header = headers.get("Authorization", "")
        # HTTP Basic (BasicAuthSrv.scala:20-38): base64 "user:pass" decoded
        # into the password provider — the curl -u transport
        if header.startswith("Basic "):
            import base64
            import binascii

            try:
                user, _, password = (
                    base64.b64decode(header[len("Basic ") :], validate=True)
                    .decode("utf-8")
                    .partition(":")
                )
            except (binascii.Error, UnicodeDecodeError):
                raise AuthenticationError("Authentication failure") from None
            return self.auth_srv.authenticate(user, password).to_auth()
        if not header.startswith("Bearer "):
            raise AuthenticationError("Authentication failure")
        bearer = header[len("Bearer ") :]
        # session token first (issued by /login), then API key — one
        # generic failure either way (MultiAuthSrv discipline)
        for srv, call in (
            (self.session_srv, "authenticate_token"),
            (self.auth_srv, "authenticate_token"),
            (self.auth_srv, "authenticate_key"),
        ):
            if srv is None:
                continue
            try:
                return getattr(srv, call)(bearer).to_auth()
            except (NotSupportedError, AuthenticationError):
                continue
        raise AuthenticationError("Authentication failure")

    def _run_login(self, body: bytes) -> tuple[int, dict[str, str], bytes]:
        """Credential login → HMAC session token (the reference's
        authRoutes/session flow): authenticate through auth_srv, issue
        through session_srv; the token then rides Bearer headers."""
        try:
            payload = json.loads(body.decode("utf-8"))
            user, password = payload["user"], payload["password"]
        except Exception:
            return 400, {}, json.dumps(
                {"type": "BadRequest", "message": 'login body needs "user" and "password"'}
            ).encode()
        try:
            if self.auth_srv is None or self.session_srv is None:
                raise ValueError("login requires auth_srv and session_srv")
            ctx = self.auth_srv.authenticate(user, password, payload.get("organisation"))
            # successful logins carry the identity into the access log too
            # (the reference logs the login name on every request alike)
            self._request_ctx.user = ctx.user_id
            return 200, {}, json.dumps(
                {
                    "token": self.session_srv.issue(ctx),
                    "user": ctx.user_name,
                    "organisation": ctx.organisation,
                    "permissions": sorted(ctx.permissions),
                }
            ).encode()
        except Exception as e:
            status, err = _error_body(e)
            return status, {}, json.dumps(err).encode()

    def _run_query(self, body: bytes, headers):
        """→ (status, headers, body bytes) or (status, headers, chunk
        iterator) when the request opts into streaming (``chunkSize``)."""
        from scalligraph_spark.qlang.renderers import render_rows, render_stream

        try:
            payload = json.loads(body.decode("utf-8"))
        except (UnicodeDecodeError, json.JSONDecodeError) as e:
            status, err = 400, {"type": "BadRequest", "message": f"invalid JSON body: {e}"}
            return status, {}, json.dumps(err).encode()
        try:
            auth = self._auth_from_headers(headers)
            if not isinstance(payload, dict) or "query" not in payload:
                raise ValueError('body must be a JSON object with a "query" chain')
            cache_state = None
            if self.cache is not None and not payload.get("chunkSize") and not payload.get("noCache"):
                # Field-tier validation still applies (cache.execute assumes
                # a well-formed chain, exactly like executor.execute)
                from scalligraph_spark.fields import validate_chain

                known = tuple(q.name for q in self.executor._queries)
                chain = validate_chain(payload["query"], known_queries=known)
                hits_before = self.cache.hits
                result = self.cache.execute(chain, auth)
                cache_state = "hit" if self.cache.hits > hits_before else "miss"
            else:
                result = self.executor.parse_and_execute(payload["query"], auth)
            if payload.get("chunkSize"):
                # streamed result: toLocalIterator-backed chunks (the
                # IteratorOutput / chunked-JSON analog) — the driver never
                # holds the full result; X-Total still leads as a header,
                # peeked from the first chunk before any byte of body
                chunks = render_stream(result.df, chunk_size=int(payload["chunkSize"]))
                first = next(chunks, [])
                extra_headers = {}
                if first and "total" in first[0]:
                    extra_headers["X-Total"] = str(first[0]["total"])

                def stream_chunks():
                    sep = b""
                    yield b"["
                    for chunk in itertools.chain([first] if first else [], chunks):
                        for r in chunk:
                            r.pop("total", None)
                            yield sep + json.dumps(r, default=str).encode()
                            sep = b","
                    yield b"]"

                return 200, extra_headers, stream_chunks()
            rows = render_rows(result.df)
            extra_headers = {}
            if cache_state is not None:
                extra_headers["X-Query-Cache"] = cache_state
            if rows and "total" in rows[0]:
                # richPage contract: the limited-count total rides every row
                # (broadcast crossJoin); the transport hoists it to X-Total
                extra_headers["X-Total"] = str(rows[0]["total"])
                for r in rows:
                    r.pop("total", None)
            return 200, extra_headers, json.dumps(rows, default=str).encode()
        except Exception as e:  # every engine error maps to a typed body
            status, err = _error_body(e)
            return status, {}, json.dumps(err).encode()

    def _run_graphql(self, body: bytes, headers) -> tuple[int, dict[str, str], bytes]:
        """GraphQL-over-HTTP: request-level failures (bad JSON, missing
        query, failed authentication) get their HTTP status; query-level
        failures ride the 200 ``{"errors": [...]}`` envelope per the
        GraphQL spec (the errors are part of the result, not transport)."""
        from scalligraph_spark.graphql import GraphQLSchema

        try:
            payload = json.loads(body.decode("utf-8"))
            source = payload["query"]
            if not isinstance(source, str):
                raise ValueError("graphql 'query' must be a string document")
        except Exception as e:
            return 400, {}, json.dumps({"type": "BadRequest", "message": str(e)}).encode()
        try:
            auth = self._auth_from_headers(headers)
        except Exception as e:
            status, err = _error_body(e)
            return status, {}, json.dumps(err).encode()
        if self._graphql_schema is None:
            self._graphql_schema = GraphQLSchema(self.executor)
        result = self._graphql_schema.execute(
            source,
            variables=payload.get("variables"),
            auth=auth,
            operation_name=payload.get("operationName"),
        )
        return 200, {}, json.dumps(result, default=str).encode()

    def _run_explain(self, body: bytes, headers) -> tuple[int, dict[str, str], bytes]:
        """``POST /explain`` {"query": [chain]} → the TraversalPrinter dump
        (step-by-step fold resolution + the Catalyst physical plan) as
        ``{"explain": "..."}``.  Auth applies exactly as on /query — the
        explain of a permission-gated or policy-gated chain must not leak
        what the execution would refuse."""
        try:
            payload = json.loads(body.decode("utf-8"))
            chain = payload["query"]
        except Exception as e:
            return 400, {}, json.dumps({"type": "BadRequest", "message": str(e)}).encode()
        try:
            auth = self._auth_from_headers(headers)
            from scalligraph_spark.fields import validate_chain

            known = tuple(q.name for q in self.executor._queries)
            text = self.executor.explain_chain(validate_chain(chain, known_queries=known), auth)
            return 200, {}, json.dumps({"explain": text}).encode()
        except Exception as e:
            status, err = _error_body(e)
            return status, {}, json.dumps(err).encode()

    def _run_schema(self) -> tuple[int, dict[str, str], bytes]:
        """``GET /schema`` → the GraphQL SDL (SchemaRenderer analog)."""
        from scalligraph_spark.graphql import GraphQLSchema

        if self._graphql_schema is None:
            self._graphql_schema = GraphQLSchema(self.executor)
        try:
            return 200, {}, json.dumps({"sdl": self._graphql_schema.render()}).encode()
        except Exception as e:
            status, err = _error_body(e)
            return status, {}, json.dumps(err).encode()

    def _runtime_stats(self) -> dict:
        """Process/runtime diagnostics (utils/ProcessStats.scala:8-31
        exposes JVM memory + thread counts; the Spark analog adds the
        statusTracker's executor view): JVM heap, per-executor cache
        bytes + running tasks, active job/stage counts, and driver-side
        Python memory/threads.  All metadata-only — no Spark jobs run —
        so the endpoint stays cheap enough for a probe loop."""
        import resource
        import threading as _threading

        out: dict = {}
        # the Python-side section can never depend on Spark being alive —
        # /health is a LIVENESS endpoint first; a stopped SparkContext or
        # dead py4j gateway must degrade the diagnostics, not 500 the probe
        import sys as _sys

        ru = resource.getrusage(resource.RUSAGE_SELF)
        # ru_maxrss units are platform-defined: KiB on Linux, BYTES on
        # macOS — an unguarded KiB assumption inflates Darwin readings
        # 1024× and poisons any probe-loop memory threshold
        rss_div = (1 << 20) if _sys.platform == "darwin" else 1024
        out["python"] = {
            "max_rss_mb": int(ru.ru_maxrss / rss_div),
            "threads": _threading.active_count(),
        }
        try:
            spark = self.executor.catalog.spark
            sc = spark.sparkContext
            out["default_parallelism"] = int(sc.defaultParallelism)
        except Exception:
            return out
        try:
            rt = spark._jvm.java.lang.Runtime.getRuntime()
            mb = 1 << 20
            out["jvm"] = {
                "used_mb": int((rt.totalMemory() - rt.freeMemory()) / mb),
                "total_mb": int(rt.totalMemory() / mb),
                "max_mb": int(rt.maxMemory() / mb),
            }
        except Exception:
            pass
        try:
            tracker = sc._jsc.sc().statusTracker()
            out["executors"] = [
                {
                    "host": e.host(),
                    "cache_bytes": int(e.cacheSize()),
                    "running_tasks": int(e.numRunningTasks()),
                }
                for e in tracker.getExecutorInfos()
            ]
            out["active_jobs"] = len(tracker.getActiveJobIds())
            out["active_stages"] = len(tracker.getActiveStageIds())
        except Exception:
            pass
        return out

    def _run_health(self) -> tuple[int, dict[str, str], bytes]:
        """``GET /health`` → runtime diagnostics (always) plus
        store_report rows (metadata-only) when a store is wired."""
        try:
            body = {"status": "ok", "runtime": self._runtime_stats()}
            if self.store is not None:
                try:
                    from scalligraph_spark.qlang.renderers import render_rows
                    from scalligraph_spark.store import store_report

                    spark = self.executor.catalog.spark
                    body["labels"] = render_rows(store_report(spark, self.store))
                except Exception as e:
                    # liveness first: a dead SparkContext degrades the
                    # store section instead of failing the probe
                    body["labels_error"] = str(e)
            return 200, {}, json.dumps(body, default=str).encode()
        except Exception as e:
            status, err = _error_body(e)
            return status, {}, json.dumps(err).encode()

    def _run_maintenance(self, body: bytes, headers) -> tuple[int, dict[str, str], bytes]:
        """``POST /maintenance`` → per-index report dicts from one
        :func:`~scalligraph_spark.operators.maintain_indexes` sweep over
        the fleet declared at construction.  Requires the ``admin``
        permission (the reference's admin/reindex routes are
        operator-only); clients choose only the policy knobs
        (``compactOver``, ``onMutation``, ``vacuum``,
        ``vacuumRetentionSeconds``), never the labels.
        Knobs are validated BEFORE the sweep: a typo'd policy must be a
        400, not an HTTP-200 sweep reporting every index failed (ADVICE
        r9).  ``vacuum`` defaults off — folded-label reclaim must be an
        explicit operator decision tied to the retention policy."""
        from scalligraph_spark.qlang.executor import AuthorizationError

        try:
            if self.maintenance is None:
                return 404, {}, json.dumps(
                    {"type": "NotFound", "message": "no maintenance fleet declared"}
                ).encode()
            auth = self._auth_from_headers(headers) if self.auth_srv else None
            if self.auth_srv is not None and "admin" not in (auth or {}).get("permissions", []):
                raise AuthorizationError("maintenance requires the admin permission")
            payload = json.loads(body.decode("utf-8")) if body else {}
            on_mutation = str(payload.get("onMutation", "error"))
            vacuum = payload.get("vacuum", False)
            try:
                compact_over = int(payload.get("compactOver", 8))
            except (TypeError, ValueError):
                compact_over = None
            from scalligraph_spark.store import check_retention

            try:
                # one validator for the retention contract (check_retention:
                # finite-or-inf number >= 0, NaN rejected) — two copies of
                # the rule would drift; bool is int-coercible but never a
                # duration, so the transport rejects it before coercion
                if isinstance(payload.get("vacuumRetentionSeconds"), bool):
                    raise ValueError("bool is not a duration")
                retention = check_retention(payload.get("vacuumRetentionSeconds", 0.0))
            except (TypeError, ValueError):
                retention = None
            if (
                on_mutation not in ("error", "reindex", "tombstone")
                or compact_over is None
                or not isinstance(vacuum, bool)
                or retention is None
            ):
                return 400, {}, json.dumps({
                    "type": "BadRequest",
                    "message": "onMutation must be error|reindex|tombstone, "
                               "compactOver an integer, vacuum a boolean, "
                               "vacuumRetentionSeconds a number >= 0",
                }).encode()
            from scalligraph_spark.operators import maintain_indexes

            m_store, indexes = self.maintenance
            reports = maintain_indexes(
                self.executor.catalog.spark,
                m_store,
                list(indexes),
                compact_over=compact_over,
                on_mutation=on_mutation,
                vacuum=vacuum,
                vacuum_retention_seconds=retention,
            )
            return 200, {}, json.dumps({"reports": reports}, default=str).encode()
        except Exception as e:
            status, err = _error_body(e)
            return status, {}, json.dumps(err).encode()

    # -- server lifecycle --------------------------------------------------
    def serve(self, host: str = "127.0.0.1", port: int = 0) -> "QueryServer":
        server = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"  # chunked transfer needs 1.1

            def log_message(self, *a):  # quiet: no stderr per request
                pass

            def _send(self, status: int, headers: dict[str, str], body, t0: float) -> None:
                """Body is bytes (Content-Length) or an iterator of byte
                fragments (Transfer-Encoding: chunked — the reference's
                Results.Ok.chunked streamed output).  Every response
                carries Request-Time, and one access-log record fires per
                request (AccessLogFilter.scala:16-36).  The completion
                record fires BEFORE the last byte reaches the socket (a
                keep-alive client that observed the full response is
                guaranteed to find it); a send that then fails midway
                (client disconnect, broken pipe) APPENDS a record with
                ``error="write_failed"`` so the log never silently claims
                bytes that missed the wire, and the connection closes."""
                user = getattr(server._request_ctx, "user", None)
                server._request_ctx.user = None  # reset for keep-alive reuse
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                for k, v in headers.items():
                    self.send_header(k, v)

                def _log(n_bytes: int, error: str | None = None) -> None:
                    if server.access_log is not None:
                        rec = {
                            "remote": self.client_address[0],
                            "method": self.command,
                            "path": self.path,
                            "status": status,
                            "ms": int((time.monotonic() - t0) * 1000),
                            "bytes": n_bytes,
                            # authenticated user_id, None for anonymous /
                            # failed auth (the reference logs the login
                            # name the same way)
                            "user": user,
                        }
                        if error is not None:
                            rec["error"] = error
                        server.access_log(rec)

                if isinstance(body, bytes):
                    self.send_header("Content-Length", str(len(body)))
                    self.send_header("Request-Time", str(int((time.monotonic() - t0) * 1000)))
                    self.end_headers()
                    _log(len(body))
                    try:
                        self.wfile.write(body)
                    except OSError:
                        _log(len(body), error="write_failed")
                        self.close_connection = True
                else:
                    self.send_header("Transfer-Encoding", "chunked")
                    self.send_header("Request-Time", str(int((time.monotonic() - t0) * 1000)))
                    self.end_headers()
                    n_bytes = 0
                    try:
                        for frag in body:
                            if frag:
                                self.wfile.write(b"%x\r\n%s\r\n" % (len(frag), frag))
                                n_bytes += len(frag)
                    except OSError:
                        # mid-stream disconnect: the only record for this
                        # request says how far the body actually got
                        _log(n_bytes, error="write_failed")
                        self.close_connection = True
                        return
                    _log(n_bytes)  # the client blocks on the terminator below
                    try:
                        self.wfile.write(b"0\r\n\r\n")
                    except OSError:
                        _log(n_bytes, error="write_failed")
                        self.close_connection = True

            def do_POST(self):
                t0 = time.monotonic()
                n = int(self.headers.get("Content-Length", 0))
                if self.path == server.path:
                    status, headers, body = server._run_query(self.rfile.read(n), self.headers)
                elif self.path == server.login_path:
                    status, headers, body = server._run_login(self.rfile.read(n))
                elif self.path == server.graphql_path:
                    status, headers, body = server._run_graphql(self.rfile.read(n), self.headers)
                elif self.path == server.explain_path:
                    status, headers, body = server._run_explain(self.rfile.read(n), self.headers)
                elif self.path == server.maintenance_path:
                    status, headers, body = server._run_maintenance(self.rfile.read(n), self.headers)
                else:
                    status, headers, body = (
                        404,
                        {},
                        json.dumps({"type": "NotFound", "message": self.path}).encode(),
                    )
                self._send(status, headers, body, t0)

            def do_GET(self):
                t0 = time.monotonic()
                if self.path == server.schema_path:
                    status, headers, body = server._run_schema()
                elif self.path == server.health_path:
                    status, headers, body = server._run_health()
                else:
                    status, headers, body = (
                        404,
                        {},
                        json.dumps({"type": "NotFound", "message": self.path}).encode(),
                    )
                self._send(status, headers, body, t0)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._httpd.daemon_threads = True
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    @property
    def port(self) -> int:
        assert self._httpd is not None, "serve() first"
        return self._httpd.server_address[1]

    def close(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    def __enter__(self) -> "QueryServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
