"""Faceted search aggregations (query.search_facets, T41)."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logzilla_spark.operators.query import ComparisonNode, Query, search_facets
from tests.conftest import SF001, canon_rows, duck


@pytest.fixture(scope="module")
def toy(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(60):
        rows.append(
            {
                "id": str(i),
                "timestamp": t0 + dt.timedelta(minutes=7 * i),
                "level": ["ERROR", "WARN", "INFO"][i % 3],
                "source": f"svc{i % 5}",
                "message": f"m{i}",
            }
        )
    return spark.createDataFrame(pd.DataFrame(rows))


def test_facets_match_pandas(toy):
    q = Query(start=dt.datetime(2024, 1, 1), end=dt.datetime(2024, 1, 2))
    got = search_facets(toy, q, top_k=10).toPandas()
    pdf = toy.toPandas()
    lv = pdf.level.value_counts()
    for name, n in lv.items():
        assert (
            got[(got.facet == "level") & (got.value == name)].n.iloc[0] == n
        )
    hist = got[got.facet == "_histogram"]
    # 60 events x 7 min span exactly 7 distinct hours; every bucket
    # present (no top-k on the histogram) and counts sum to the corpus
    assert len(hist) == 7
    assert hist.n.sum() == 60


def test_topk_boundary_ties_all_surface(toy):
    q = Query(start=dt.datetime(2024, 1, 1), end=dt.datetime(2024, 1, 2))
    got = search_facets(toy, q, facet_fields=("source",), top_k=1).toPandas()
    src = got[got.facet == "source"]
    # all 5 sources have 12 events -> rank()==1 for every one of them:
    # a row_number cutoff would arbitrarily drop four
    assert len(src) == 5 and set(src.n) == {12}


def test_filter_matches_hits_path(toy):
    q = Query(
        start=dt.datetime(2024, 1, 1),
        end=dt.datetime(2024, 1, 2),
        node=ComparisonNode("level", "INFO", "ne"),
    )
    got = search_facets(toy, q, facet_fields=("level",)).toPandas()
    assert set(got[got.facet == "level"].value) == {"ERROR", "WARN"}
    n_total = got[got.facet == "level"].n.sum()
    assert n_total == 40  # 60 minus the 20 INFO rows


def test_single_scan_plan(toy):
    q = Query(start=dt.datetime(2024, 1, 1), end=dt.datetime(2024, 1, 2))
    out = search_facets(toy, q)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the union-of-group-bys shape would rescan per facet; the explode
    # shape must not (one scan feeding one aggregate)
    assert plan.count("LocalTableScan") + plan.count("Scan parquet") <= 1


def test_registered_facets_vs_oracle_sf0001(spark):
    import __spark_entry__ as entry

    got = entry.queries()["q_search_facets"](spark, SF001).toPandas()
    ref = duck(SF001).execute(entry.oracle_sql(SF001)["q_search_facets"]).df()
    assert canon_rows(got) == canon_rows(ref)


def test_facets_http_endpoint(spark, toy):
    """POST /api/logs/facets over a live server: envelope shape, facet
    whitelist enforcement, and bad-unit rejection."""
    import json
    import urllib.request

    from logzilla_spark.server import serve_background

    srv, _t = serve_background(toy, port=0)
    port = srv.server_address[1]
    try:
        def post(body: dict, path="/api/logs/facets"):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
                method="POST",
            )
            try:
                with urllib.request.urlopen(req) as r:
                    return r.status, json.loads(r.read())
            except urllib.error.HTTPError as e:
                return e.code, json.loads(e.read())

        ok = {"start": "2024-01-01T00:00:00Z", "end": "2024-01-02T00:00:00Z"}
        status, resp = post(ok)
        assert status == 200 and resp["success"]
        facets = {d["facet"] for d in resp["data"]}
        assert facets == {"level", "source", "_histogram"}
        assert resp["metadata"]["count"] == len(resp["data"])

        status, resp = post({**ok, "facets": ["category"]})
        assert status == 400 and "whitelisted" in resp["message"]
        status, resp = post({**ok, "histogram": "fortnight"})
        assert status == 400
        status, resp = post({**ok, "top_k": 0})
        assert status == 400
    finally:
        srv.shutdown()
