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


def test_healthcheck_and_404(live_server):
    with urllib.request.urlopen(f"{live_server}/healthcheck") as r:
        assert r.status == 200 and json.loads(r.read())["success"]
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(f"{live_server}/nope")
    assert exc.value.code == 404
