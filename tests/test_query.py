"""Query-layer semantics (O25-O35) incl. the reference's quirks."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from logzilla_spark.operators.query import (
    AndNode,
    ComparisonNode,
    NotNode,
    OrNode,
    Query,
    QueryValidationError,
    SortField,
    search,
)

T = datetime


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        # id, source, timestamp, level, message, metadata
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


def test_mandatory_start_and_range(df):
    q = Query(start=T(2024, 1, 2), end=T(2024, 1, 4, 12), select_columns=["id"])
    assert ids(search(df, q)) == ["b", "c", "d", "e"]


def test_auto_swap_and_backward_desc(df):
    # reversed bounds -> swap + DESC chronology (sqlbuilder.go:89-97,122-125)
    q = Query(start=T(2024, 1, 4, 12), end=T(2024, 1, 2), select_columns=["id"])
    assert ids(search(df, q)) == ["e", "d", "c", "b"]  # DESC chronology


def test_timestamp_tiebreaker_appended(df):
    # sort on source only; timestamp ASC is implicitly appended
    q = Query(
        start=T(2024, 1, 1), sort=[SortField("source")], select_columns=["id"]
    )
    assert ids(search(df, q)) == ["a", "b", "c", "d", "e"]


def test_operators_matrix(df):
    base = dict(start=T(2024, 1, 1), select_columns=["id"], limit=1000)
    cases = [
        (ComparisonNode("level", "ERROR", "eq"), {"a", "e"}),
        (ComparisonNode("level", "ERROR", "ne"), {"b", "c", "d"}),
        (ComparisonNode("timestamp", T(2024, 1, 3), "gt"), {"c", "d", "e"}),
        (ComparisonNode("timestamp", T(2024, 1, 3), "lt"), {"a", "b"}),
        (ComparisonNode("timestamp", T(2024, 1, 3, 10), "gte"), {"c", "d", "e"}),
        (ComparisonNode("timestamp", T(2024, 1, 1, 10), "lte"), {"a"}),
        (ComparisonNode("message", "disk%", "like"), {"a", "e"}),
        (ComparisonNode("message", "disk%", "ilike"), {"a", "c", "e"}),
        (ComparisonNode("level", ["WARN", "FATAL"], "in"), {"c", "d"}),
        (ComparisonNode("metadata.svc", "api", "eq"), {"a", "c"}),
    ]
    for node, want in cases:
        q = Query(node=node, **base)
        assert set(ids(search(df, q))) == want, node


def test_tree_composition_and_empty_collapse(df):
    q = Query(
        start=T(2024, 1, 1),
        select_columns=["id"],
        node=AndNode(
            [
                OrNode([]),  # collapses to no-op (sqlbuilder.go:220-228)
                NotNode(ComparisonNode("level", "INFO", "eq")),
                OrNode(
                    [
                        ComparisonNode("message", "disk%", "ilike"),
                        ComparisonNode("level", "FATAL", "eq"),
                    ]
                ),
            ]
        ),
    )
    assert set(ids(search(df, q))) == {"a", "c", "d", "e"}
    # fully-empty tree == time-range only
    q2 = Query(start=T(2024, 1, 1), node=AndNode([]), select_columns=["id"])
    assert len(ids(search(df, q2))) == 5


def test_limit_bounds(df):
    with pytest.raises(QueryValidationError):
        search(df, Query(start=T(2024, 1, 1), limit=0))
    with pytest.raises(QueryValidationError):
        search(df, Query(start=T(2024, 1, 1), limit=1001))
    q = Query(start=T(2024, 1, 1), limit=2, select_columns=["id"])
    assert len(ids(search(df, q))) == 2


def test_field_whitelist(df):
    for bad in ["drop table", "metadata.", 'metadata."a"b', "lang; --"]:
        with pytest.raises(QueryValidationError):
            search(df, Query(start=T(2024, 1, 1), node=ComparisonNode(bad, "x", "eq")))
    with pytest.raises(QueryValidationError):
        search(df, Query(start=T(2024, 1, 1), sort=[SortField("message")]))
    with pytest.raises(QueryValidationError):
        search(df, Query(start=T(2024, 1, 1), node=ComparisonNode("level", None, "eq")))


def test_topk_plan_no_global_sort(df):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (true top-k)."""
    q = Query(start=T(2024, 1, 1), limit=2, select_columns=["id"])
    plan = search(df, q)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# --------------------------------------------------------------------------
# O33 — keyset cursor pagination (unbuilt TODO in the reference,
# storage/clickhouse.go:211; implemented here as strict keyset)
# --------------------------------------------------------------------------


def test_cursor_pagination_walks_all_rows(df):
    from logzilla_spark.operators.query import next_cursor

    base = dict(start=T(2024, 1, 1), end=T(2024, 1, 5), limit=2,
                select_columns=["id", "timestamp"])
    seen = []
    cur = None
    for _ in range(5):
        rows = search(df, Query(**base, cursor=cur)).collect()
        if not rows:
            break
        seen += [r.id for r in rows]
        cur = next_cursor(rows)
    assert seen == ["a", "b", "c", "d", "e"]  # no dup, no loss, in order
    # pages are disjoint and exhaustive even with shared timestamps


def test_cursor_backward_direction(df):
    from logzilla_spark.operators.query import next_cursor

    base = dict(start=T(2024, 1, 5), end=T(2024, 1, 1), limit=2,
                select_columns=["id", "timestamp"])  # reversed => backward
    rows1 = search(df, Query(**base)).collect()
    assert [r.id for r in rows1] == ["e", "d"]
    # continue backward from the last row of page 1 via cursor
    rows2 = search(df, Query(**base, cursor=next_cursor(rows1))).collect()
    assert [r.id for r in rows2] == ["c", "b"]


def test_cursor_rejects_garbage(df):
    q = Query(start=T(2024, 1, 1), limit=2, cursor="not-a-cursor",
              select_columns=["id"])
    with pytest.raises(QueryValidationError):
        search(df, q).collect()


class TestSearchContext:
    def _records(self, spark):
        rows = []
        for url, n in (("https://a/x", 5), ("https://b/y", 3)):
            for p in range(n):
                rows.append((f"{url}#{p:04d}", url, f"line {p} of {url}"))
        return spark.createDataFrame(rows, "id string, url string, message string")

    def test_window_and_order(self, spark):
        from logzilla_spark.operators.query import search_context

        out = search_context(self._records(spark), "https://a/x#0002").collect()
        assert [r["pos"] for r in out] == [0, 1, 2, 3, 4]
        assert all(r["url"] == "https://a/x" for r in out)

    def test_document_edges_truncate(self, spark):
        from logzilla_spark.operators.query import search_context

        out = search_context(
            self._records(spark), "https://b/y#0000", before=2, after=1
        ).collect()
        assert [r["pos"] for r in out] == [0, 1]

    def test_never_crosses_documents(self, spark):
        from logzilla_spark.operators.query import search_context

        out = search_context(
            self._records(spark), "https://b/y#0001", before=10, after=10
        ).collect()
        assert {r["url"] for r in out} == {"https://b/y"}
        assert len(out) == 3

    def test_malformed_anchor_and_args_raise(self, spark):
        import pytest as _pytest

        from logzilla_spark.operators.query import search_context

        rec = self._records(spark)
        for bad in ("nohash", "https://a/x#", "#0001", "https://a/x#12a"):
            with _pytest.raises(ValueError, match="not a record id"):
                search_context(rec, bad)
        with _pytest.raises(ValueError, match=">= 0"):
            search_context(rec, "https://a/x#0001", before=-1)
