"""T65: quoted-phrase / proximity terms in the DSL and the sealed tree.

``"a b"~N`` (Lucene/ES proximity syntax, suffix adjacent to the
closing quote) compiles to a PhraseNode — the T63/T64 scan semantics
over the FULL searchable text as a composable filter node. A bare
quoted string without the suffix keeps its existing meaning (message
substring containment). The node must agree with the fulltext
operators exactly, compose under AND/OR/NOT, and render through
to_sql for the oracle twin (the driver gate q_search_phrase_dsl pins
that end-to-end).
"""

from datetime import datetime

import pytest

from logzilla_spark.operators.dsl import DslSyntaxError, parse_dsl
from logzilla_spark.operators.fulltext import full_text_near, full_text_phrase
from logzilla_spark.operators.query import (
    ComparisonNode,
    NotNode,
    PhraseNode,
    Query,
    QueryValidationError,
    default_field_sql,
    search,
)

T = datetime


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        ("a", "s1", T(2024, 1, 1, 10), "ERROR", "disk full", {"svc": "api"}),
        ("b", "s1", T(2024, 1, 2, 10), "INFO", "disk nearly full", {"svc": "web"}),
        ("c", "s2", T(2024, 1, 3, 10), "WARN", "disk is almost full", {"svc": "api"}),
        ("d", "s2", T(2024, 1, 4, 10), "FATAL", "full disk", {}),
        ("e", "s3", T(2024, 1, 4, 11), "ERROR", "diskette fully ok", {"svc": "db"}),
    ]
    return spark.createDataFrame(
        rows,
        "id string, source string, timestamp timestamp, level string, "
        "message string, metadata map<string,string>",
    )


def ids(df_, node):
    q = Query(start=T(2024, 1, 1), node=node, limit=1000, select_columns=["id"])
    return sorted(r.id for r in search(df_, q).collect())


def test_parse_phrase_and_slop():
    assert parse_dsl('"disk full"~0') == PhraseNode("disk full", 0)
    assert parse_dsl('"disk full"~3') == PhraseNode("disk full", 3)
    # composes inside the tree
    node = parse_dsl('"disk full"~1 NOT level:ERROR')
    assert PhraseNode("disk full", 1) in node.children
    assert any(isinstance(c, NotNode) for c in node.children)


def test_bare_quoted_stays_substring_containment():
    assert parse_dsl('"disk full"') == ComparisonNode(
        "message", "%disk full%", "ilike"
    )
    # a space before ~N breaks adjacency: it is a bare word term, not slop
    node = parse_dsl('"disk full" ~2')
    assert node.children[0] == ComparisonNode("message", "%disk full%", "ilike")
    assert node.children[1] == ComparisonNode("message", "%~2%", "ilike")


def test_slop_errors():
    with pytest.raises(DslSyntaxError, match="slop needs a number"):
        parse_dsl('"disk full"~x')
    with pytest.raises(DslSyntaxError, match="bare quoted phrase"):
        parse_dsl('message:"disk full"~2')
    with pytest.raises(DslSyntaxError, match="empty phrase"):
        parse_dsl('"  -- "~2')
    with pytest.raises(QueryValidationError):
        PhraseNode("a b", -1).to_column(None)


def test_phrase_semantics_on_frame(df):
    # slop=0: adjacency in order; slop grows the per-gap window
    assert ids(df, PhraseNode("disk full", 0)) == ["a"]
    assert ids(df, PhraseNode("disk full", 1)) == ["a", "b"]
    assert ids(df, PhraseNode("disk full", 2)) == ["a", "b", "c"]
    # token match, not substring: 'diskette fully' never matches
    assert "e" not in ids(df, PhraseNode("disk full", 9))
    # order matters
    assert ids(df, PhraseNode("full disk", 0)) == ["d"]


def test_node_agrees_with_fulltext_operators(records_sf0001):
    for phrase, slop in (("get 200", 2), ("timeout contacting upstream", 0)):
        node_ids = sorted(
            r.id
            for r in search(
                records_sf0001,
                Query(start=T(2024, 1, 1), node=PhraseNode(phrase, slop),
                      limit=1000, select_columns=["id"]),
            ).collect()
        )
        op = (
            full_text_phrase(records_sf0001, phrase)
            if slop == 0
            else full_text_near(records_sf0001, phrase, slop)
        )
        op_ids = sorted(
            r.id
            for r in op.filter("timestamp >= '2024-01-01'")
            .orderBy("timestamp", "id")
            .limit(1000)
            .select("id")
            .collect()
        )
        assert node_ids == op_ids


def test_to_sql_renders(df):
    s0 = PhraseNode("disk full", 0).to_sql(default_field_sql)
    s2 = PhraseNode("disk full", 2).to_sql(default_field_sql)
    assert "contains(" in s0 and " disk full " in s0
    assert "regexp_matches(" in s2 and "{0,2}" in s2
    # empty phrase collapses like an empty And/Or node
    assert PhraseNode("  ", 1).to_sql(default_field_sql) is None
    assert PhraseNode("  ", 1).to_column(None) is None
