"""Regex line filter in the sealed tree + DSL (query.RegexNode, T76)."""

import datetime as dt
import json

import pandas as pd
import pytest

from logzilla_spark.operators.dsl import DslSyntaxError, parse_dsl
from logzilla_spark.operators.query import (
    NotNode,
    Query,
    QueryValidationError,
    RegexNode,
    search,
    search_oracle_sql,
)

T0 = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def toy(spark):
    msgs = [
        "timeout contacting upstream", "connection reset", "cache miss",
        "disk full", "GET /api/v1/items", "user login ok",
    ]
    rows = [
        {
            "id": f"u#{i:04d}",
            "timestamp": T0 + dt.timedelta(minutes=i),
            "level": ["ERROR", "INFO"][i % 2],
            "source": "svc0",
            "message": msgs[i % len(msgs)],
            "metadata": {},
        }
        for i in range(36)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows),
        schema="id string, timestamp timestamp, level string, source string,"
        " message string, metadata map<string,string>",
    )


def test_rlike_search_semantics(toy):
    node = RegexNode("message", r"(timeout|reset)")
    got = search(
        toy, Query(start=T0, end=T0 + dt.timedelta(hours=1), node=node)
    ).toPandas()
    assert set(got.message) == {"timeout contacting upstream",
                                "connection reset"}
    # unanchored: a mid-string match counts; anchoring is explicit
    anchored = RegexNode("message", r"^reset")
    got2 = search(
        toy, Query(start=T0, end=T0 + dt.timedelta(hours=1), node=anchored)
    ).toPandas()
    assert got2.empty


def test_validation():
    with pytest.raises(QueryValidationError, match="not allowed"):
        RegexNode("bogus", "x").to_sql(lambda f: f)
    with pytest.raises(QueryValidationError, match="timestamp"):
        RegexNode("timestamp", "2024").to_sql(lambda f: f)
    with pytest.raises(QueryValidationError, match="only"):
        RegexNode("message", "(?=x)").to_sql(lambda f: f)
    with pytest.raises(QueryValidationError, match="unsupported escape"):
        RegexNode("message", r"\p{L}").to_sql(lambda f: f)


def test_dsl_regex_operator():
    node = parse_dsl('message=~"(disk|cache) [a-z]+"')
    assert isinstance(node, RegexNode)
    assert node.pattern == "(disk|cache) [a-z]+"
    # composes under NOT; bad patterns are positioned DSL errors
    n2 = parse_dsl('NOT source=~"svc[0-9]"')
    assert isinstance(n2, NotNode) and isinstance(n2.child, RegexNode)
    with pytest.raises(DslSyntaxError, match="unbalanced"):
        parse_dsl('message=~"(x"')
    with pytest.raises(DslSyntaxError, match="timestamp"):
        parse_dsl('timestamp=~"2024"')


def test_twin_parity(toy, tmp_path):
    import duckdb

    pq = str(tmp_path / "toy.parquet")
    toy.select(
        "id", "timestamp", "level", "source", "message"
    ).coalesce(1).write.parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW records AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    q = Query(
        start=T0, end=T0 + dt.timedelta(hours=1),
        node=RegexNode("message", r"(timeout|reset|c[a-z]+e) "),
        select_columns=["id", "message"],
    )
    got = (
        search(toy, q).toPandas()
        .sort_values("id").reset_index(drop=True)
    )
    sql = search_oracle_sql(
        "records", q, time_column='"timestamp"', select_sql=["id", "message"]
    )
    want = con.execute(sql).df().sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_json_wire_form(records_sf0001):
    from logzilla_spark.api import search_request

    body = {
        "start": "2024-01-01T00:00:00",
        "end": "2024-01-08T00:00:00",
        "limit": 10,
        "node": {"field": "message", "regex": "(disk|cache) [a-z]+"},
    }
    resp = search_request(records_sf0001, json.dumps(body))
    assert resp["success"], resp["message"]
    assert resp["data"] and all(
        ("disk " in r["message"]) or ("cache " in r["message"])
        for r in resp["data"]
    )
    bad = dict(body, node={"field": "message", "regex": "(x", "bogus": 1})
    resp2 = search_request(records_sf0001, json.dumps(bad))
    assert not resp2["success"] and "unknown node key" in resp2["message"]
    bad2 = dict(body, node={"regex": "x"})
    resp3 = search_request(records_sf0001, json.dumps(bad2))
    assert not resp3["success"] and "missing key" in resp3["message"]
