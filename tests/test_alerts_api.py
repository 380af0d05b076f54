"""POST /api/alerts: the alert ledger behind the HTTP surface.

Drives a live server bound to a hand-built ledger frame: filtering,
deterministic ordering, limit cap, strict-body rejection, and the
unconfigured-route envelope.
"""

from __future__ import annotations

import datetime as dt
import json
import urllib.error
import urllib.request

import pytest

from logzilla_spark.server import serve_background


def _ledger(spark):
    rows = [
        ("error_burst", dt.datetime(2024, 1, 1, h), dt.datetime(2024, 1, 1, h + 1),
         "json", "ERROR", 5 + h, 5)
        for h in range(4)
    ] + [
        ("hot_window", dt.datetime(2024, 1, 1, 2), dt.datetime(2024, 1, 1, 3),
         "access", "INFO", 99, 60),
    ]
    return spark.createDataFrame(
        rows,
        "rule_name string, window_start timestamp, window_end timestamp, "
        "category string, level string, n bigint, min_count bigint",
    )


@pytest.fixture()
def alert_server(spark, records_sf0001):
    srv, _t = serve_background(records_sf0001, alerts=_ledger(spark))
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        yield base
    finally:
        srv.shutdown()


def _post(base, payload: dict):
    req = urllib.request.Request(
        f"{base}/api/alerts",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def test_alerts_route_newest_first(alert_server):
    status, resp = _post(alert_server, {})
    assert status == 200 and resp["success"]
    assert resp["metadata"]["count"] == 5
    starts = [r["window_start"] for r in resp["data"]]
    assert starts == sorted(starts, reverse=True)
    # deterministic tie-break inside the shared window hour
    tied = [r["rule_name"] for r in resp["data"] if r["window_start"].startswith("2024-01-01 02")]
    assert tied == ["error_burst", "hot_window"]


def test_rule_and_window_filters(alert_server):
    _s, resp = _post(alert_server, {"rule": "error_burst", "since": "2024-01-01T02:00:00Z"})
    assert [r["n"] for r in resp["data"]] == [8, 7]  # hours 3, 2
    _s, resp = _post(
        alert_server,
        {"since": "2024-01-01T01:00:00Z", "until": "2024-01-01T02:00:00Z"},
    )
    assert resp["metadata"]["count"] == 1 and resp["data"][0]["n"] == 6


def test_limit_applies_and_is_validated(alert_server):
    _s, resp = _post(alert_server, {"limit": 2})
    assert resp["metadata"]["count"] == 2
    for bad in (0, 1001, "5", True):
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(alert_server, {"limit": bad})
        assert exc.value.code == 400


def test_strict_body(alert_server):
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(alert_server, {"rules": "typo"})
    assert exc.value.code == 400
    body = json.loads(exc.value.read())
    assert "unknown field" in body["message"]
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(alert_server, {"rule": "../etc"})
    assert exc.value.code == 400


def test_unconfigured_route_is_client_error(spark, records_sf0001):
    srv, _t = serve_background(records_sf0001)  # no alerts frame
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(base, {})
        assert exc.value.code == 400
        assert "not configured" in json.loads(exc.value.read())["message"]
    finally:
        srv.shutdown()


# -- /api/logs/context (rides the same server; tested here to reuse the
#    live harness) -------------------------------------------------------


def _post_ctx(base, payload):
    req = urllib.request.Request(
        f"{base}/api/logs/context",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def test_context_route_end_to_end(alert_server, spark, records_sf0001):
    anchor = records_sf0001.orderBy("id").limit(3).collect()[2]["id"]
    status, resp = _post_ctx(alert_server, {"id": anchor, "before": 2, "after": 2})
    assert status == 200 and resp["success"]
    assert resp["metadata"]["anchor"] == anchor
    assert 1 <= resp["metadata"]["count"] <= 5
    assert any(r["id"] == anchor for r in resp["data"])
    url = anchor.rsplit("#", 1)[0]
    assert all(r["id"].rsplit("#", 1)[0] == url for r in resp["data"])


def test_context_route_validation(alert_server):
    for payload in (
        {},                                  # id missing
        {"id": "not-a-record-id"},           # malformed anchor
        {"id": "https://a/x#0001", "before": 101},  # span cap
        {"id": "https://a/x#0001", "nope": 1},      # unknown field
    ):
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post_ctx(alert_server, payload)
        assert exc.value.code == 400
