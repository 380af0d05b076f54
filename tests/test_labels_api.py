"""Labels API (api.labels_request, T75 — Loki /labels parity)."""

import json
import urllib.request

import pytest

from logzilla_spark.api import labels_request


def test_label_names_include_observed_metadata_keys(records_sf0001):
    resp = labels_request(records_sf0001, "/api/logs/labels")
    assert resp["success"], resp["message"]
    data = resp["data"]
    assert {"id", "level", "message", "source", "timestamp"} <= set(data)
    md = [d for d in data if d.startswith("metadata.")]
    assert "metadata.service" in md and "metadata.size" in md
    assert data == sorted(data[:5]) + sorted(md)  # envelope then sorted keys


def test_label_values_ranked_and_capped(records_sf0001):
    resp = labels_request(records_sf0001, "/api/logs/labels/level/values?k=3")
    assert resp["success"], resp["message"]
    assert len(resp["data"]) == 3
    ns = [d["n"] for d in resp["data"]]
    assert ns == sorted(ns, reverse=True)
    resp_all = labels_request(records_sf0001, "/api/logs/labels/level/values")
    levels = {d["value"] for d in resp_all["data"]}
    assert {"ERROR", "INFO", "UNKNOWN"} <= levels


def test_label_values_metadata_path_and_range(records_sf0001):
    resp = labels_request(
        records_sf0001,
        "/api/logs/labels/metadata.service/values"
        "?start=2024-01-01T00:00:00&end=2024-01-02T00:00:00",
    )
    assert resp["success"], resp["message"]
    vals = {d["value"] for d in resp["data"]}
    assert vals and all(v.startswith("svc") for v in vals)
    # a range outside the data is empty, not an error
    resp2 = labels_request(
        records_sf0001,
        "/api/logs/labels/metadata.service/values"
        "?start=2030-01-01T00:00:00&end=2030-01-02T00:00:00",
    )
    assert resp2["success"] and resp2["data"] == []


@pytest.mark.parametrize(
    "path,msg",
    [
        ("/api/logs/labels/bogus;drop/values", "not allowed"),
        ("/api/logs/labels/level/values?k=0", "k:"),
        ("/api/logs/labels/level/values?k=x", "k:"),
        ("/api/logs/labels/level/values?start=notadate", "start"),
        ("/api/logs/labels/level/nope", "no route"),
    ],
)
def test_label_errors(records_sf0001, path, msg):
    resp = labels_request(records_sf0001, path)
    assert not resp["success"] and msg in resp["message"], resp["message"]


def test_live_endpoint(records_sf0001):
    from logzilla_spark.server import serve_background

    srv, _t = serve_background(records_sf0001, port=0)
    try:
        port = srv.server_address[1]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/logs/labels"
        ) as r:
            resp = json.loads(r.read())
        assert resp["success"] and "metadata.service" in resp["data"]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/api/logs/labels/source/values?k=5"
        ) as r:
            resp = json.loads(r.read())
        assert resp["success"] and len(resp["data"]) == 5
    finally:
        srv.shutdown()
