"""HTTP serving loop (logzilla_spark/server.py vs api/server.go).

Drives a live ThreadingHTTPServer over the real records frame: the
search route end-to-end, the healthcheck, fault-code status mapping,
and 404 routing.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest

from logzilla_spark.server import serve_background


@pytest.fixture()
def live_server(spark, records_sf0001):
    srv, _t = serve_background(records_sf0001)
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        yield base
    finally:
        srv.shutdown()


def _post(base, payload: dict):
    req = urllib.request.Request(
        f"{base}/api/logs/search",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def test_search_route_end_to_end(live_server):
    status, resp = _post(live_server, {
        "start": "2024-01-01T00:00:00Z",
        "end": "2024-01-08T00:00:00Z",
        "limit": 5,
        "node": {"field": "level", "op": "eq", "value": "FATAL"},
        "select_columns": ["id", "timestamp", "level"],
    })
    assert status == 200 and resp["success"]
    assert 0 < len(resp["data"]) <= 5
    assert all(r["level"] == "FATAL" for r in resp["data"])
    assert resp["metadata"]["count"] == len(resp["data"])


def test_bad_input_maps_to_400(live_server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(live_server, {"limit": 5})  # start missing
    assert exc.value.code == 400
    body = json.loads(exc.value.read())
    assert body["success"] is False and "start" in body["message"]


def test_invalid_content_length_is_client_error(live_server):
    """Garbage or negative Content-Length must map to 400, not the 500
    recover path — and a negative value must never reach rfile.read()
    (read(-n) means read-to-EOF: one slow client pins a handler
    thread)."""
    import http.client

    host, port = live_server.removeprefix("http://").split(":")
    for bad in ("banana", "-5", "1_000", "+100"):
        conn = http.client.HTTPConnection(host, int(port), timeout=10)
        conn.putrequest("POST", "/api/logs/search")
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", bad)
        conn.endheaders()
        resp = conn.getresponse()
        body = json.loads(resp.read())
        assert resp.status == 400, bad
        assert body["success"] is False and "Content-Length" in body["message"]
        conn.close()


def test_healthcheck_and_404(live_server):
    with urllib.request.urlopen(f"{live_server}/healthcheck") as r:
        assert r.status == 200 and json.loads(r.read())["success"]
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(f"{live_server}/nope")
    assert exc.value.code == 404


def _selfsigned(tmp_path):
    """Self-signed localhost cert via the cryptography lib."""
    import datetime

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "127.0.0.1")])
    now = datetime.datetime.now(datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name).issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now)
        .not_valid_after(now + datetime.timedelta(days=1))
        .add_extension(
            x509.SubjectAlternativeName([x509.IPAddress(
                __import__("ipaddress").ip_address("127.0.0.1"))]),
            critical=False,
        )
        .sign(key, hashes.SHA256())
    )
    cert_p, key_p = str(tmp_path / "crt.pem"), str(tmp_path / "key.pem")
    with open(cert_p, "wb") as f:
        f.write(cert.public_bytes(serialization.Encoding.PEM))
    with open(key_p, "wb") as f:
        f.write(key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption(),
        ))
    return cert_p, key_p


def test_tls_loopback(spark, records_sf0001, tmp_path):
    """cert+key configured -> the listener serves TLS, like the
    reference's ListenAndServeTLS (api/server.go:57-64)."""
    import ssl

    cert_p, key_p = _selfsigned(tmp_path)
    srv, _t = serve_background(records_sf0001, cert_file=cert_p, key_file=key_p)
    try:
        ctx = ssl.create_default_context(cafile=cert_p)
        url = f"https://127.0.0.1:{srv.server_address[1]}/healthcheck"
        with urllib.request.urlopen(url, context=ctx) as r:
            assert r.status == 200
            assert json.loads(r.read())["success"]
        # plaintext against the TLS port fails the handshake client-side
        with pytest.raises(Exception):
            urllib.request.urlopen(
                f"http://127.0.0.1:{srv.server_address[1]}/healthcheck",
                timeout=5,
            )
        # a connection that never sends a ClientHello must not block the
        # accept loop (deferred handshake runs in the handler thread,
        # not serve_forever): the next real client still gets served
        import socket as _socket

        stall = _socket.create_connection(
            ("127.0.0.1", srv.server_address[1]), timeout=10
        )
        try:
            with urllib.request.urlopen(url, context=ctx, timeout=10) as r:
                assert r.status == 200
        finally:
            stall.close()
    finally:
        srv.shutdown()


def test_cors_trusted_origin_and_preflight(spark, records_sf0001):
    """Trusted-origin CORS parity (api/middleware.go:18-40): echo
    Allow-Origin only for configured origins; answer preflight with the
    reference's fixed allow lists; always Vary."""
    srv, _t = serve_background(
        records_sf0001, trusted_origins=("https://app.example",)
    )
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # trusted origin echoed
        req = urllib.request.Request(
            f"{base}/healthcheck", headers={"Origin": "https://app.example"}
        )
        with urllib.request.urlopen(req) as r:
            assert r.headers["Access-Control-Allow-Origin"] == "https://app.example"
            assert "Origin" in r.headers.get_all("Vary")
        # untrusted origin NOT echoed (but Vary still present)
        req = urllib.request.Request(
            f"{base}/healthcheck", headers={"Origin": "https://evil.example"}
        )
        with urllib.request.urlopen(req) as r:
            assert r.headers["Access-Control-Allow-Origin"] is None
            assert "Origin" in r.headers.get_all("Vary")
        # preflight
        req = urllib.request.Request(
            f"{base}/api/logs/search",
            headers={
                "Origin": "https://app.example",
                "Access-Control-Request-Method": "POST",
            },
            method="OPTIONS",
        )
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
            assert r.headers["Access-Control-Allow-Methods"] == (
                "OPTIONS, PUT, PATCH, DELETE"
            )
            assert r.headers["Access-Control-Allow-Headers"] == (
                "Authorization, Content-Type"
            )
        # OPTIONS without preflight header: routed like any other verb
        req = urllib.request.Request(
            f"{base}/api/logs/search",
            headers={"Origin": "https://app.example"},
            method="OPTIONS",
        )
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req)
        assert exc.value.code == 404
    finally:
        srv.shutdown()


def test_stalled_tls_client_is_reaped(spark, records_sf0001, tmp_path):
    """A client that connects and never sends a ClientHello must not
    pin its handler thread forever (ADVICE r3): the per-connection
    timeout closes the socket, and the server keeps serving."""
    import socket
    import ssl
    import threading

    from logzilla_spark.server import make_server

    cert_p, key_p = _selfsigned(tmp_path)
    srv = make_server(
        records_sf0001, cert_file=cert_p, key_file=key_p, handler_timeout=1.0
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        stall = socket.create_connection(
            ("127.0.0.1", srv.server_address[1]), timeout=15
        )
        stall.settimeout(15)
        try:
            # EOF (or reset) when the server reaps the stalled handshake
            assert stall.recv(1) == b""
        except (ConnectionResetError, BrokenPipeError):
            pass
        finally:
            stall.close()
        # the listener is still healthy afterwards
        ctx = ssl.create_default_context(cafile=cert_p)
        url = f"https://127.0.0.1:{srv.server_address[1]}/healthcheck"
        with urllib.request.urlopen(url, context=ctx, timeout=15) as r:
            assert r.status == 200
    finally:
        srv.shutdown()
