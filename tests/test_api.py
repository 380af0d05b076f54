"""API facade tests: strict JSON decode (reference api/helper.go:21-80)
and the full search request lifecycle."""

from __future__ import annotations

import json
from datetime import datetime

import pytest

from logzilla_spark.api import (
    BadInputError,
    decode_node,
    decode_query,
    search_request,
)
from logzilla_spark.operators.query import AndNode, ComparisonNode, NotNode, OrNode

BASE = {"start": "2024-01-01T00:00:00Z", "limit": 10}


def body(**kw) -> str:
    return json.dumps({**BASE, **kw})


# --- strict decode (reference readJson) ------------------------------------

def test_unknown_top_level_field_rejected():
    with pytest.raises(BadInputError, match="unknown field: 'bogus'"):
        decode_query(body(bogus=1))


def test_empty_body_rejected():
    with pytest.raises(BadInputError, match="empty"):
        decode_query("   ")


def test_trailing_json_value_rejected():
    with pytest.raises(BadInputError, match="single JSON value"):
        decode_query(body() + ' {"x": 1}')


def test_oversized_body_rejected():
    pad = "x" * 1_100_000
    with pytest.raises(BadInputError, match="larger than"):
        decode_query(body(cursor=pad))


def test_malformed_json_rejected():
    with pytest.raises(BadInputError, match="badly-formed"):
        decode_query('{"start": ')


def test_missing_start_rejected():
    with pytest.raises(BadInputError, match="start: Field is required."):
        decode_query('{"limit": 5}')


def test_sort_fields_wire_names():
    q = decode_query(body(sort_fields=[{"name": "source", "is_descending": True}]))
    assert q.sort[0].name == "source" and q.sort[0].descending


def test_timestamps_parsed():
    q = decode_query(body(end="2024-01-02T03:04:05Z"))
    assert q.start == datetime(2024, 1, 1)
    assert q.end == datetime(2024, 1, 2, 3, 4, 5)


# --- node wire format -------------------------------------------------------

def test_node_tree_decodes():
    n = decode_node(
        {
            "and": [
                {"or": [
                    {"field": "level", "op": "eq", "value": "ERROR"},
                    {"field": "level", "op": "eq", "value": "FATAL"},
                ]},
                {"not": {"field": "message", "op": "like", "value": "disk%"}},
            ]
        }
    )
    assert isinstance(n, AndNode)
    assert isinstance(n.children[0], OrNode)
    assert isinstance(n.children[1], NotNode)
    assert isinstance(n.children[1].child, ComparisonNode)


def test_node_unknown_key_rejected():
    with pytest.raises(BadInputError, match="unknown node key"):
        decode_node({"field": "level", "op": "eq", "value": "E", "extra": 1})


def test_node_unknown_operator_rejected():
    with pytest.raises(BadInputError, match="unknown operator"):
        decode_node({"field": "level", "op": "regex", "value": "E"})


def test_node_missing_key_rejected():
    with pytest.raises(BadInputError, match="missing key"):
        decode_node({"field": "level", "op": "eq"})


# --- full lifecycle over Spark ----------------------------------------------

def test_search_request_end_to_end(spark, records_sf0001):
    req = body(
        limit=25,
        end="2024-01-08T00:00:00Z",
        node={"field": "level", "op": "eq", "value": "FATAL"},
        select_columns=["id", "timestamp", "level", "message"],
    )
    resp = search_request(records_sf0001, req)
    assert resp["success"], resp["message"]
    rows = resp["data"]
    assert 0 < len(rows) <= 25
    assert all(r["level"] == "FATAL" for r in rows)
    # full page => continuation cursor; follow it and get disjoint rows
    if resp["metadata"]["cursor"]:
        resp2 = search_request(
            records_sf0001, body(
                limit=25, end="2024-01-08T00:00:00Z",
                node={"field": "level", "op": "eq", "value": "FATAL"},
                select_columns=["id", "timestamp", "level", "message"],
                cursor=resp["metadata"]["cursor"],
            )
        )
        assert resp2["success"]
        assert not ({r["id"] for r in rows} & {r["id"] for r in resp2["data"]})


def test_search_request_validation_error_envelope(spark, records_sf0001):
    resp = search_request(records_sf0001, body(limit=5000))
    assert resp["success"] is False
    assert "limit" in resp["message"]


# --- ADVICE round-2 regressions ----------------------------------------------

def test_offset_timestamps_converted_to_utc():
    """A '+05:00' start must mean the same instant as its UTC form —
    stripping tzinfo without converting would shift the window by 5h."""
    q = decode_query(body(start="2024-01-01T05:00:00+05:00"))
    assert q.start == datetime(2024, 1, 1, 0, 0, 0)
    # naive inputs are interpreted as already-UTC
    q2 = decode_query(body(start="2024-01-01T00:00:00"))
    assert q2.start == q.start


def test_type_mismatches_rejected_as_bad_input():
    for kw in (
        {"limit": "50"},
        {"limit": True},
        {"cursor": 5},
        {"select_columns": "id"},
        {"select_columns": ["id", 3]},
        {"sort_fields": [{"name": 7}]},
        {"sort_fields": [{"name": "level", "is_descending": "yes"}]},
    ):
        with pytest.raises(BadInputError):
            decode_query(body(**kw))


def test_full_page_without_id_column_returns_no_cursor(spark, records_sf0001):
    """next_cursor needs (timestamp, id); a full page selected without
    'id' must return cursor=None, not crash outside the error envelope."""
    resp = search_request(
        records_sf0001,
        body(limit=5, end="2024-01-08T00:00:00Z",
             select_columns=["timestamp", "message"]),
    )
    assert resp["success"], resp["message"]
    assert len(resp["data"]) == 5
    assert resp["metadata"]["cursor"] is None


def test_custom_sorted_page_returns_no_cursor(spark, records_sf0001):
    """Keyset cursors are only sound from canonically-ordered pages: a
    custom sort fills the page in a different order, so no cursor."""
    resp = search_request(
        records_sf0001,
        body(limit=5, end="2024-01-08T00:00:00Z",
             sort_fields=[{"name": "level", "is_descending": True}]),
    )
    assert resp["success"], resp["message"]
    assert len(resp["data"]) == 5
    assert resp["metadata"]["cursor"] is None
