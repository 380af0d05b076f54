"""HTTP serving loop: the reference's query server, Spark-backed.

Mirrors the reference server surface (reference: api/server.go:44-72
route registration + serve loop; api/middleware.go:8-52 logging +
panic-recover; api/healthcheck.go:5-10):

    POST /api/logs/search   -> api.search_request envelope
    GET  /healthcheck       -> liveness envelope

Implemented on stdlib ``ThreadingHTTPServer`` — the serving loop is
deliberately thin: all decode/validate/search logic lives in
:mod:`.api` (tested against the reference contracts); the server only
maps envelopes to HTTP status codes the way the reference's fault
codes do (bad input -> 400, internal panic -> recovered 500, else 200).

TLS + CORS parity (api/server.go:57-64, api/middleware.go:18-40):
``cert_file``/``key_file`` switch the listener to TLS exactly like the
reference's ListenAndServeTLS when both are configured; trusted-origin
CORS echoes Access-Control-Allow-Origin only for configured origins and
answers preflight OPTIONS (with Access-Control-Request-Method) using
the reference's own allow lists, byte-for-byte.

Driver-side by design: a search collects at most ``limit`` rows
(MAX_LIMIT-capped) — the heavy lifting stays on the executors; handler
threads may issue concurrent Spark actions (the scheduler is
thread-safe, jobs interleave).
"""

from __future__ import annotations

import json
import logging
import ssl
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame

from .api import MAX_BODY_BYTES, search_request

log = logging.getLogger("logzilla_spark.server")


def _envelope(success: bool, message: str = "", data=None, metadata=None) -> dict:
    return {"success": success, "message": message, "data": data,
            "metadata": metadata}


class _Handler(BaseHTTPRequestHandler):
    server_version = "logzilla-spark"
    records: DataFrame  # bound by make_server
    alerts: DataFrame | None = None  # bound by make_server (optional)
    recordings = None  # LocalCatalog with rec_* tables (optional)
    tail = None  # (LocalCatalog, SparkSession) for /api/logs/tail (optional)
    trusted_origins: tuple[str, ...] = ()  # bound by make_server
    # Per-connection socket timeout (BaseRequestHandler.setup applies
    # it to the accepted socket). Without it a client that connects
    # and never sends bytes — including a TLS client that never sends
    # a ClientHello, since the deferred handshake runs on first read —
    # pins its handler thread forever, and ThreadingHTTPServer spawns
    # threads unbounded. On timeout handle_one_request closes the
    # connection and the thread is reaped.
    timeout = 30

    def _cors_headers(self) -> None:
        """Trusted-origin CORS, the reference's corsMiddleware
        (api/middleware.go:18-40): Vary on every response; echo
        Allow-Origin only when the Origin header matches a configured
        trusted origin exactly."""
        self.send_header("Vary", "Origin")
        self.send_header("Vary", "Access-Control-Request-Method")
        origin = self.headers.get("Origin", "")
        if origin and origin in self.trusted_origins:
            self.send_header("Access-Control-Allow-Origin", origin)

    def _write(self, status: int, payload: dict) -> None:
        body = json.dumps(payload, default=str).encode("utf-8")
        self.send_response(status)
        self._cors_headers()
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, fmt, *args):  # middleware.go logging analog
        log.info("%s %s", self.address_string(), fmt % args)

    def do_OPTIONS(self):  # noqa: N802
        # Preflight for a trusted origin: the reference answers with its
        # fixed allow lists and an empty 200 (api/middleware.go:26-33).
        origin = self.headers.get("Origin", "")
        if (
            origin
            and origin in self.trusted_origins
            and self.headers.get("Access-Control-Request-Method")
        ):
            self.send_response(200)
            self._cors_headers()
            self.send_header(
                "Access-Control-Allow-Methods", "OPTIONS, PUT, PATCH, DELETE"
            )
            self.send_header(
                "Access-Control-Allow-Headers", "Authorization, Content-Type"
            )
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        # non-preflight OPTIONS falls through to routing, like the
        # reference's mux (no OPTIONS route registered)
        self._write(404, _envelope(False, f"no route: OPTIONS {self.path}"))

    def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler API
        if self.path == "/healthcheck":
            # reference returns the bare OK envelope (healthcheck.go:5-10)
            self._write(200, _envelope(True, "healthy"))
        elif self.path == "/api/tables":
            from logzilla_spark.api import tables_request

            try:
                resp = tables_request(type(self).tail)
                self._write(200 if resp["success"] else 400, resp)
            except Exception as e:  # noqa: BLE001 — the recover middleware
                log.exception("panic recovered in tables handler")
                self._write(500, _envelope(False, f"internal error: {type(e).__name__}"))
        elif self.path.startswith("/api/logs/labels"):
            from logzilla_spark.api import labels_request

            try:
                resp = labels_request(type(self).records, self.path)
                self._write(200 if resp["success"] else 400, resp)
            except Exception as e:  # noqa: BLE001 — the recover middleware
                log.exception("panic recovered in labels handler")
                self._write(500, _envelope(False, f"internal error: {type(e).__name__}"))
        elif self.path.startswith("/api/logs/complete"):
            from logzilla_spark.api import complete_request

            try:
                resp = complete_request(type(self).records, self.path)
                self._write(200 if resp["success"] else 400, resp)
            except Exception as e:  # noqa: BLE001 — the recover middleware
                log.exception("panic recovered in complete handler")
                self._write(500, _envelope(False, f"internal error: {type(e).__name__}"))
        else:
            self._write(404, _envelope(False, f"no route: GET {self.path}"))

    def do_POST(self):  # noqa: N802
        if self.path == "/api/logs/search":
            handler = search_request
        elif self.path == "/api/logs/facets":
            from logzilla_spark.api import facets_request

            handler = facets_request
        elif self.path == "/api/logs/context":
            from logzilla_spark.api import context_request

            handler = context_request
        elif self.path == "/api/logs/significant":
            from logzilla_spark.api import sigterms_request

            handler = sigterms_request
        elif self.path == "/api/logs/absent":
            from logzilla_spark.api import absent_request

            handler = absent_request
        elif self.path == "/api/logs/query_range":
            from logzilla_spark.api import query_range_request

            # a {"rule": ...} body reads the committed recording table
            handler = lambda records, b: query_range_request(  # noqa: E731
                records, type(self).recordings, b
            )
        elif self.path == "/api/logs/tail":
            from logzilla_spark.api import tail_request

            # bound to a (catalog, spark) pair, not the records frame
            handler = lambda _records, b: tail_request(  # noqa: E731
                type(self).tail, b
            )
        elif self.path == "/api/alerts":
            from logzilla_spark.api import alerts_request

            # bound to the alert LEDGER, not the records frame
            handler = lambda _records, b: alerts_request(  # noqa: E731
                type(self).alerts, b
            )
        else:
            self._write(404, _envelope(False, f"no route: POST {self.path}"))
            return
        try:
            # malformed / negative Content-Length is a CLIENT error:
            # int() garbage must not fall into the 500 recover path, and
            # a negative value would turn rfile.read(n) into read-to-EOF
            # (one slow client pinning a handler thread)
            raw_len = self.headers.get("Content-Length", "0")
            # RFC 7230: 1*DIGIT — int() alone also accepts '+100',
            # ' 100 ', '1_000' and unicode digits
            if not (raw_len.isascii() and raw_len.isdigit()):
                self._write(400, _envelope(False, "invalid Content-Length"))
                return
            length = int(raw_len)
            if length > MAX_BODY_BYTES:
                self._write(400, _envelope(
                    False, f"Body must not be larger than {MAX_BODY_BYTES} bytes."))
                return
            body = self.rfile.read(length)
            resp = handler(type(self).records, body)
            # fault-code -> status mapping (fault.go:7-12 analog):
            # validation/bad-input envelopes are client errors
            self._write(200 if resp["success"] else 400, resp)
        except Exception as e:  # noqa: BLE001 — the recover middleware
            log.exception("panic recovered in search handler")
            self._write(500, _envelope(False, f"internal error: {type(e).__name__}"))


def make_server(
    records: DataFrame,
    host: str = "127.0.0.1",
    port: int = 0,
    cert_file: str | None = None,
    key_file: str | None = None,
    trusted_origins: tuple[str, ...] = (),
    handler_timeout: float = 30.0,
    alerts: DataFrame | None = None,
    recordings=None,
    tail=None,
) -> ThreadingHTTPServer:
    """Build (not start) the server bound to a records DataFrame.

    ``port=0`` picks a free port (``server.server_address[1]``).
    TLS is enabled exactly like the reference (api/server.go:57-64):
    only when BOTH cert_file and key_file are configured.
    ``handler_timeout`` bounds how long an idle connection (or a
    never-completing TLS handshake) may hold its handler thread.
    ``alerts`` (optional) binds the alert-ledger frame behind
    ``POST /api/alerts``; ``recordings`` (optional) binds a catalog
    whose ``rec_*`` tables serve ``{"rule": ...}`` query_range bodies;
    ``tail`` (optional) binds a ``(LocalCatalog, SparkSession)`` pair
    behind ``POST /api/logs/tail``. Without a binding, those routes
    answer with client envelope errors."""
    handler = type(
        "BoundHandler",
        (_Handler,),
        {
            "records": records,
            "alerts": alerts,
            "recordings": recordings,
            "tail": tail,
            "trusted_origins": tuple(trusted_origins),
            "timeout": handler_timeout,
        },
    )
    srv = ThreadingHTTPServer((host, port), handler)
    if cert_file and key_file:
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(certfile=cert_file, keyfile=key_file)
        # do_handshake_on_connect=False: accept() runs in the single
        # serve_forever loop, so an eager handshake there lets one
        # stalled client (half-open probe, no ClientHello) block every
        # other connection. Deferred, the handshake happens on first
        # read INSIDE the per-connection handler thread — the same
        # per-goroutine shape as the reference's ListenAndServeTLS.
        srv.socket = ctx.wrap_socket(
            srv.socket, server_side=True, do_handshake_on_connect=False
        )
        log.info("starting server with TLS")
    return srv


def serve_background(
    records: DataFrame,
    host: str = "127.0.0.1",
    port: int = 0,
    cert_file: str | None = None,
    key_file: str | None = None,
    trusted_origins: tuple[str, ...] = (),
    alerts: DataFrame | None = None,
    recordings=None,
    tail=None,
) -> tuple[ThreadingHTTPServer, threading.Thread]:
    """Start the serve loop on a daemon thread; returns (server, thread).

    Shut down with ``server.shutdown()`` (joins the loop)."""
    srv = make_server(
        records, host, port, cert_file, key_file, trusted_origins,
        alerts=alerts, recordings=recordings, tail=tail,
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True,
                         name="logzilla-http")
    t.start()
    return srv, t
