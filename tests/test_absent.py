"""Absence detection (anomaly.absent_keys, T71)."""

import datetime as dt
import json

import pandas as pd
import pytest

from logzilla_spark.api import absent_request
from logzilla_spark.operators.anomaly import (
    absent_keys,
    absent_keys_from_counts,
    absent_keys_sql,
)
from logzilla_spark.operators.query import Query, QueryValidationError

T0 = dt.datetime(2024, 1, 1)
PIVOT = dt.datetime(2024, 1, 1, 12)
END = dt.datetime(2024, 1, 2)


@pytest.fixture(scope="module")
def toy(spark):
    rows = []
    # svc0: active all day; svc1: dies at 09:00 (absent);
    # svc2: born at 18:00 (current only, never absent);
    # svc3: one row exactly AT the pivot (current -> not absent)
    for h in range(24):
        ts = T0 + dt.timedelta(hours=h)
        rows.append(("a", ts, "INFO", "svc0", "m"))
        if h < 9:
            rows.append(("b", ts, "WARN", "svc1", "m"))
        if h >= 18:
            rows.append(("c", ts, "INFO", "svc2", "m"))
    rows.append(("d", PIVOT, "INFO", "svc3", "m"))
    return spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["id", "timestamp", "level", "source", "message"]
        ),
        schema="id string, timestamp timestamp, level string, "
        "source string, message string",
    )


def _q(**kw):
    kw.setdefault("start", T0)
    kw.setdefault("end", END)
    return Query(**kw)


def test_dead_key_found_with_exact_evidence(toy):
    got = absent_keys(toy, _q(), by=["source"], pivot=PIVOT).toPandas()
    assert list(got.source) == ["svc1"]
    assert got.n_baseline.iloc[0] == 9
    last = dt.datetime.fromtimestamp(
        got.last_seen_us.iloc[0] / 1e6, dt.timezone.utc
    ).replace(tzinfo=None)
    assert last == T0 + dt.timedelta(hours=8)


def test_pivot_row_counts_as_current(toy):
    # svc3's only row is AT the pivot -> current half -> not absent
    got = absent_keys(toy, _q(), by=["source"], pivot=PIVOT).toPandas()
    assert "svc3" not in set(got.source)


def test_node_filter_scopes_the_baseline(toy):
    from logzilla_spark.operators.query import ComparisonNode

    # among INFO rows only, svc1 (WARN-only) never existed; svc0 is
    # active, svc2 is current-only -> nothing absent
    got = absent_keys(
        toy, _q(node=ComparisonNode("level", "INFO", "eq")),
        by=["source"], pivot=PIVOT,
    ).toPandas()
    assert got.empty


def test_validation(toy):
    with pytest.raises(QueryValidationError, match="pivot must lie inside"):
        absent_keys(toy, _q(), by=["source"], pivot=END + dt.timedelta(days=1))
    with pytest.raises(QueryValidationError, match="non-empty"):
        absent_keys(toy, _q(), by=[], pivot=PIVOT)
    with pytest.raises(QueryValidationError, match="not allowed"):
        absent_keys(toy, _q(), by=["bogus"], pivot=PIVOT)
    with pytest.raises(QueryValidationError, match="duplicate"):
        absent_keys(toy, _q(), by=["source", "source"], pivot=PIVOT)
    with pytest.raises(QueryValidationError, match="requires end"):
        absent_keys(toy, Query(start=T0), by=["source"], pivot=PIVOT)


def test_auto_swap_reversed_range(toy):
    got = absent_keys(
        toy, Query(start=END, end=T0), by=["source"], pivot=PIVOT
    ).toPandas()
    assert list(got.source) == ["svc1"]


def test_twin_parity(toy, tmp_path):
    import duckdb

    pq = str(tmp_path / "toy.parquet")
    toy.coalesce(1).write.parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW r AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    for by in (["source"], ["source", "level"]):
        got = (
            absent_keys(toy, _q(), by=by, pivot=PIVOT)
            .toPandas().sort_values(by).reset_index(drop=True)
        )
        want = (
            con.execute(absent_keys_sql("r", _q(), by=by, pivot=PIVOT))
            .df().sort_values(by).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_from_counts_production_shape(spark):
    counts = spark.createDataFrame(
        [
            ("k1", T0, 5), ("k1", PIVOT, 1),           # active
            ("k2", T0, 3),                              # dead
            ("k3", PIVOT, 2),                           # born after pivot
        ],
        "key string, bucket timestamp, x long",
    )
    got = absent_keys_from_counts(counts, PIVOT).toPandas()
    assert list(got.key) == ["k2"]
    assert got.n_baseline.iloc[0] == 3
    assert got.last_bucket.iloc[0] == T0


def test_api_envelope(records_sf0001):
    body = {
        "start": "2024-01-01T00:00:00",
        "end": "2024-01-08T00:00:00",
        "pivot": "2024-01-06T00:00:00",
        "by": ["source", "metadata.service"],
    }
    resp = absent_request(records_sf0001, json.dumps(body))
    assert resp["success"], resp["message"]
    assert resp["metadata"]["count"] > 0
    seen = [r["last_seen_us"] for r in resp["data"]]
    assert seen == sorted(seen, reverse=True)  # died-last first
    assert set(resp["data"][0]) == {"source", "m_service", "n_baseline",
                                    "last_seen_us"}


@pytest.mark.parametrize(
    "patch,msg",
    [
        ({"pivot": None}, "pivot"),
        ({"by": "source"}, "by:"),
        ({"limit": 0}, "limit:"),
        ({"pivot": "2025-06-01T00:00:00"}, "inside"),
        ({"bogus": 1}, "unknown field"),
    ],
)
def test_api_errors(records_sf0001, patch, msg):
    body = {
        "start": "2024-01-01T00:00:00",
        "end": "2024-01-08T00:00:00",
        "pivot": "2024-01-06T00:00:00",
        "by": ["source"],
        **patch,
    }
    if body.get("pivot") is None:
        del body["pivot"]
    resp = absent_request(records_sf0001, json.dumps(body))
    assert not resp["success"] and msg in resp["message"], resp["message"]


def test_live_endpoint(records_sf0001):
    import urllib.request

    from logzilla_spark.server import serve_background

    srv, _t = serve_background(records_sf0001, port=0)
    try:
        port = srv.server_address[1]
        body = json.dumps(
            {
                "start": "2024-01-01T00:00:00",
                "end": "2024-01-08T00:00:00",
                "pivot": "2024-01-06T00:00:00",
                "by": ["source", "level"],
                "limit": 5,
            }
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/logs/absent",
            data=body, headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            resp = json.loads(r.read())
        assert resp["success"] and len(resp["data"]) <= 5
    finally:
        srv.shutdown()
