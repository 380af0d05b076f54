"""T55 query-string DSL: text queries compiled to the sealed node tree.

The parser is a pure front-end for operators/query.py, so the key
invariant is EQUIVALENCE: a parsed query must return exactly what the
hand-built tree returns through the same search path, and must render
through the same to_sql twin. Plus grammar semantics (precedence,
implicit AND, wildcards, directives) and error positions.
"""

from datetime import datetime

import pytest

from logzilla_spark.api import search_request
from logzilla_spark.operators.dsl import (
    DslSyntaxError,
    parse_dsl,
    parse_dsl_query,
)
from logzilla_spark.operators.query import (
    AndNode,
    ComparisonNode,
    NotNode,
    OrNode,
    Query,
    QueryValidationError,
    SortField,
    default_field_sql,
    search,
)

T = datetime


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("a", "s1", T(2024, 1, 1, 10), "ERROR", "disk full", {"svc": "api"}),
        ("b", "s1", T(2024, 1, 2, 10), "INFO", "user login", {"svc": "web"}),
        ("c", "s2", T(2024, 1, 3, 10), "WARN", "Disk almost full", {"svc": "api"}),
        ("d", "s2", T(2024, 1, 4, 10), "FATAL", "crash", {}),
        ("e", "s3", T(2024, 1, 4, 11), "ERROR", "disk error", {"svc": "db"}),
    ]
    return spark.createDataFrame(
        rows,
        "id string, source string, timestamp timestamp, level string, "
        "message string, metadata map<string,string>",
    )


def ids(out):
    return [r.id for r in out.select("id").collect()]


def run(df, text, **kw):
    kw.setdefault("start", T(2024, 1, 1))
    q = parse_dsl_query(text, select_columns=["id"], **kw)
    return ids(search(df, q))


# ---------------------------------------------------------------- tree shape


def test_equivalent_to_hand_built_tree(df):
    """The JSON-API tree and the parsed text produce identical results."""
    hand = Query(
        start=T(2024, 1, 1),
        node=AndNode([
            OrNode([
                ComparisonNode("level", "ERROR", "eq"),
                ComparisonNode("level", "FATAL", "eq"),
            ]),
            NotNode(ComparisonNode("message", "disk%", "like")),
        ]),
        select_columns=["id"],
    )
    parsed = parse_dsl_query(
        "(level:ERROR OR level:FATAL) NOT message:disk*",
        start=T(2024, 1, 1),
        select_columns=["id"],
    )
    got_hand = ids(search(df, hand))
    got_parsed = ids(search(df, parsed))
    # 'disk*' compiles to ILIKE (case-insensitive) vs the hand tree's
    # LIKE: on this fixture both exclude only lowercase 'disk%' ERRORs
    assert got_hand == got_parsed == ["d"]


def test_or_precedence_binds_looser_than_and(df):
    # A OR B C == A OR (B AND C)
    out = run(df, "level:FATAL OR level:ERROR source:s3")
    assert out == ["d", "e"]
    # parens flip it: (A OR B) AND C
    out = run(df, "(level:FATAL OR level:ERROR) source:s3")
    assert out == ["e"]


def test_explicit_and_keyword_case_insensitive(df):
    assert run(df, "level:ERROR and source:s1") == ["a"]
    assert run(df, "level:ERROR AND source:s1") == ["a"]


def test_not_and_nested_not(df):
    assert run(df, "NOT level:INFO NOT level:ERROR") == ["c", "d"]
    assert run(df, "NOT (level:INFO OR level:ERROR)") == ["c", "d"]


# ----------------------------------------------------------------- operators


def test_smart_colon_exact_vs_wildcard(df):
    assert run(df, "level:ERROR") == ["a", "e"]
    # wildcard value -> case-insensitive pattern
    assert run(df, "message:disk*") == ["a", "c", "e"]
    # '?' single-char wildcard
    assert run(df, "source:s?") == ["a", "b", "c", "d", "e"]


def test_equals_is_always_literal(df):
    # '=' never expands wildcards: no message is literally 'disk*'
    assert run(df, "message=disk*") == []


def test_contains_and_negated_contains(df):
    assert run(df, "message~DISK") == ["a", "c", "e"]
    assert run(df, "message!~disk") == ["b", "d"]


def test_comparisons_and_timestamp_values(df):
    assert run(df, "timestamp>=2024-01-04T00:00:00") == ["d", "e"]
    assert run(df, "timestamp<2024-01-02T00:00:00") == ["a"]
    # RFC3339 offset converted to UTC instant, not stripped
    assert run(df, "timestamp>=2024-01-04T02:00:00+02:00") == ["d", "e"]
    assert run(df, "level!=ERROR level!=INFO") == ["c", "d"]


def test_in_list_and_metadata_path(df):
    assert run(df, "level in (FATAL, WARN)") == ["c", "d"]
    assert run(df, "metadata.svc:api") == ["a", "c"]
    assert run(df, 'metadata.svc in (api, "db")') == ["a", "c", "e"]


def test_bare_and_quoted_terms_search_message(df):
    assert run(df, "login") == ["b"]
    assert run(df, '"almost full"') == ["c"]
    # quoted phrase with escaped quote parses
    node = parse_dsl('"say \\"hi\\""')
    assert node.value == '%say "hi"%'


# ---------------------------------------------------------------- directives


def test_directives_fill_the_query_envelope():
    q = parse_dsl_query(
        "level:ERROR since:2024-01-02 until:2024-01-05 limit:7 "
        "sort:-timestamp,source"
    )
    assert q.start == T(2024, 1, 2)
    assert q.end == T(2024, 1, 5)
    assert q.limit == 7
    assert q.sort == [SortField("timestamp", True), SortField("source", False)]


def test_directive_overrides_keyword_defaults():
    q = parse_dsl_query("since:2024-01-03", start=T(2024, 1, 1), limit=5)
    assert q.start == T(2024, 1, 3)
    assert q.limit == 5
    assert q.node is None  # directives-only: time range alone


def test_directive_value_in_following_token():
    q = parse_dsl_query('since: "2024-01-02 03:00:00"')
    assert q.start == T(2024, 1, 2, 3)


def test_quoting_defeats_directive_extraction(df):
    # '"limit:50"' is a message term, not a directive
    q = parse_dsl_query('"limit:50"', start=T(2024, 1, 1))
    assert q.limit == 100
    assert q.node.value == "%limit:50%"


def test_directive_errors():
    with pytest.raises(DslSyntaxError, match="duplicate"):
        parse_dsl_query("limit:5 limit:6", start=T(2024, 1, 1))
    with pytest.raises(DslSyntaxError, match="bad limit"):
        parse_dsl_query("limit:many", start=T(2024, 1, 1))
    with pytest.raises(DslSyntaxError, match="bad timestamp"):
        parse_dsl_query("since:yesterday")
    with pytest.raises(QueryValidationError, match="sort field not allowed"):
        parse_dsl_query("sort:message", start=T(2024, 1, 1))
    with pytest.raises(QueryValidationError, match="start is required"):
        parse_dsl_query("level:ERROR")
    # filter-only entry point rejects directives outright
    with pytest.raises(DslSyntaxError, match="not allowed here"):
        parse_dsl("level:ERROR limit:5")


# -------------------------------------------------------------------- errors


def test_error_positions():
    with pytest.raises(DslSyntaxError, match=r"unknown field 'levl' \(at position 0\)"):
        parse_dsl("levl:ERROR")
    with pytest.raises(DslSyntaxError, match=r"at position 13"):
        parse_dsl("level:ERROR (")
    with pytest.raises(DslSyntaxError, match="unterminated quoted string"):
        parse_dsl('message:"oops')
    with pytest.raises(DslSyntaxError, match="needs a value"):
        parse_dsl("message:")
    with pytest.raises(DslSyntaxError, match="empty IN list"):
        parse_dsl("level in ()")
    with pytest.raises(DslSyntaxError, match="unexpected end of query"):
        parse_dsl("level:ERROR OR")
    with pytest.raises(DslSyntaxError, match="unexpected keyword"):
        parse_dsl("and level:ERROR")


def test_injection_is_neutralized_by_the_value_layer():
    node = parse_dsl("message:\"'; DROP TABLE logs; --\"")
    sql = node.to_sql(default_field_sql)
    # single quotes doubled by the shared _sql_lit — the value can
    # never terminate the literal
    assert sql == "message = '''; DROP TABLE logs; --'"


# ----------------------------------------------------------------- API layer


def test_search_request_accepts_dsl_body(df):
    import json

    body = json.dumps({
        "q": "level:ERROR since:2024-01-01",
        "select_columns": ["id"],
    })
    resp = search_request(df, body)
    assert resp["success"], resp["message"]
    assert [r["id"] for r in resp["data"]] == ["a", "e"]


def test_search_request_dsl_and_node_exclusive(df):
    import json

    body = json.dumps({
        "start": "2024-01-01T00:00:00",
        "q": "level:ERROR",
        "node": {"field": "level", "op": "eq", "value": "ERROR"},
    })
    resp = search_request(df, body)
    assert not resp["success"]
    assert "mutually exclusive" in resp["message"]


def test_search_request_dsl_syntax_error_enveloped(df):
    import json

    body = json.dumps({"q": "levl:ERROR since:2024-01-01"})
    resp = search_request(df, body)
    assert not resp["success"]
    assert "unknown field 'levl'" in resp["message"]


def test_search_request_json_sort_applies_without_directive(df):
    import json

    body = json.dumps({
        "q": "level:ERROR since:2024-01-01",
        "sort_fields": [{"name": "timestamp", "is_descending": True}],
        "select_columns": ["id"],
    })
    resp = search_request(df, body)
    assert resp["success"], resp["message"]
    assert [r["id"] for r in resp["data"]] == ["e", "a"]
