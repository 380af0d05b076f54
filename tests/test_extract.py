"""Query-time field extraction (operators/extract.py, T69)."""

import datetime as dt
import json

import pandas as pd
import pytest

from logzilla_spark.api import range_request
from logzilla_spark.operators.extract import (
    Extraction,
    extract_where_column,
    extract_where_sql,
)
from logzilla_spark.operators.query import Query, QueryValidationError
from logzilla_spark.operators.range_query import range_query, range_query_sql

T0 = dt.datetime(2024, 1, 1)


def _q(**kw):
    kw.setdefault("start", T0)
    kw.setdefault("end", dt.datetime(2024, 1, 2))
    return Query(**kw)


# -- pattern compilation ------------------------------------------------


def test_pattern_compiles_lazy_and_trailing_greedy():
    ex = Extraction.pattern("<method> /<path>")
    assert ex.names == ("method", "path")
    assert ex.regex == r"^(.*?) \/(.*)"


def test_pattern_anonymous_skip_is_noncapturing():
    ex = Extraction.pattern("<_> took <ms>ms")
    assert ex.names == ("ms",)
    assert ex.regex == "^.*? took (.*?)ms"


def test_pattern_literal_escaping_is_portable():
    ex = Extraction.pattern("a+b [x] <v>")
    # every special char escaped, alnum/space/_ verbatim
    assert ex.regex == r"^a\+b \[x\] (.*)"


@pytest.mark.parametrize(
    "text,msg",
    [
        ("no captures here", "at least one named capture"),
        ("<a><b>", "consecutive captures"),
        ("<a> <a>", "duplicate capture"),
        ("", "non-empty"),
        ("x" * 600, "longer than"),
    ],
)
def test_pattern_rejections(text, msg):
    with pytest.raises(QueryValidationError, match=msg):
        Extraction.pattern(text)


def test_pattern_non_ident_angle_is_literal():
    # "<3>" is not a capture (not an identifier) — literal text
    ex = Extraction.pattern("<3> <v>")
    assert ex.names == ("v",)
    assert ex.regex.startswith("^\\<3\\> ")


# -- portable-regex validation -----------------------------------------


@pytest.mark.parametrize(
    "pattern,names",
    [
        (r"^([A-Z]+) /([a-z0-9]+)", ["m", "s"]),
        (r"(\d+)ms", ["ms"]),
        (r"(?:GET|POST) /(\w+)", ["seg"]),
        (r"err=([^ ]+)", ["e"]),
        (r"a{2,3}?(b+)$", ["b"]),
        # bounded outer over unbounded inner is fine (classic IP shape)
        (r"(?:\d+\.){3}(\d+)", ["last"]),
        # unbounded outer over a *non-repeating* group is fine
        (r"(?:ab)+(c)", ["c"]),
        # bounded-over-bounded nesting is fine
        (r"(a{2,3}){2}", ["a"]),
    ],
)
def test_regexp_accepts_portable_subset(pattern, names):
    assert Extraction.regexp(pattern, names).names == tuple(names)


@pytest.mark.parametrize(
    "pattern,names,msg",
    [
        (r"(?<name>x)", ["n"], "only"),
        (r"(?=x)(y)", ["y"], "only"),
        (r"(x)\1", ["x"], "unsupported escape"),
        (r"\p{L}(x)", ["x"], "unsupported escape"),
        (r"(x", ["x"], "unbalanced"),
        (r"x)", [], "at least one name"),
        (r"+x", ["x"], "nothing to repeat"),
        (r"[a[b]](x)", ["x"], "nested"),
        (r"(\d+) (\d+)", ["one"], "2 capturing groups but 1 names"),
        (r"a$b(x)", ["x", "y"], "1 capturing groups but 2 names"),
        (r"col\(1\)*", ["x"], "0 capturing groups but 1 names"),
        (r"{bad}(x)", ["x"], "nothing to repeat"),
        # inverted interval: Java throws PatternSyntaxException at
        # RUNTIME for these — the validator must catch them eagerly
        (r"a{5,2}(x)", ["x"], "inverted"),
        (r"(x){9,3}", ["x"], "inverted"),
        # repetition-count cap
        (r"a{1001}(x)", ["x"], "repetition count above"),
        (r"(x){2,5000}", ["x"], "repetition count above"),
        # catastrophic backtracking: unbounded quantifier over a group
        # whose body itself repeats unboundedly — Java backtracks
        # exponentially where RE2 is linear
        (r"(a+)+", ["x"], "catastrophic"),
        (r"(a*)*b", ["x"], "catastrophic"),
        (r"(?:\w+)+(x)", ["x"], "catastrophic"),
        (r"(a+){2,}", ["x"], "catastrophic"),
        # ...including through an intermediate bounded group
        (r"(?:(a+){3})*", ["x"], "catastrophic"),
    ],
)
def test_regexp_rejections(pattern, names, msg):
    with pytest.raises(QueryValidationError, match=msg):
        Extraction.regexp(pattern, names)


def test_inverted_interval_caught_before_java():
    """ADVICE r4: 'a{5,2}' passed eager validation but threw
    java.util.regex.PatternSyntaxException at execution time (and
    'invalid repetition size' in DuckDB) — a 500 where the contract
    promises a 400 QueryValidationError."""
    import re as _re

    with pytest.raises(_re.error):
        _re.compile(r"a{5,2}")  # proves the pattern is runtime-fatal
    with pytest.raises(QueryValidationError, match="inverted"):
        Extraction.regexp(r"a{5,2}(x)", ["x"])


def test_regexp_requires_escaping_risky_punct():
    with pytest.raises(QueryValidationError, match="must be backslash-escaped"):
        Extraction.regexp(r"a]b(x)", ["x"])  # ] literal only outside Java


# -- field binding ------------------------------------------------------


def test_resolver_binds_groups_positionally(spark):
    ex = Extraction.regexp(r"(\d+)x(\d+)", ["w", "h"])
    df = spark.createDataFrame([("a 640x480 b",)], "message string")
    row = df.select(
        ex.resolver()("extracted.w").alias("w"),
        ex.resolver()("extracted.h").alias("h"),
    ).collect()[0]
    assert (row.w, row.h) == ("640", "480")


def test_unknown_extracted_field_raises():
    ex = Extraction.pattern("<a> <b>")
    with pytest.raises(QueryValidationError, match="unknown extracted field"):
        ex.resolver()("extracted.c")


def test_filters_validated():
    ex = Extraction.pattern("<a> <b>")
    with pytest.raises(QueryValidationError, match="one of"):
        extract_where_column([("extracted.a", "~", 1)], ex)
    with pytest.raises(QueryValidationError, match="must be extracted"):
        extract_where_column([("level", "==", "x")], ex)
    with pytest.raises(QueryValidationError, match="int or a string"):
        extract_where_sql([("extracted.a", "==", 1.5)], ex)


# -- end-to-end: toy frame, Spark vs DuckDB ----------------------------


@pytest.fixture(scope="module")
def toy(spark):
    rows = []
    for i in range(48):
        if i % 3 == 0:
            msg = f"req /api/{['a', 'b'][i % 2]} took {10 * i}ms"
        elif i % 3 == 1:
            msg = "cache miss"
        else:
            msg = f"req /static/x took {i}ms"
        rows.append(
            {
                "id": f"u#{i:04d}",
                "timestamp": T0 + dt.timedelta(minutes=30 * i),
                "level": "INFO",
                "source": "svc0",
                "message": msg,
            }
        )
    return spark.createDataFrame(
        pd.DataFrame(rows),
        schema="id string, timestamp timestamp, level string, "
        "source string, message string",
    )


@pytest.fixture(scope="module")
def toy_duck(toy, tmp_path_factory):
    import duckdb

    pq = str(tmp_path_factory.mktemp("extract") / "toy.parquet")
    toy.coalesce(1).write.parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW r AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    return con


_EX = Extraction.pattern("req /<path> took <ms>ms")


def _both(toy, toy_duck, kw, srt):
    got = (
        range_query(toy, _q(), **kw)
        .toPandas().sort_values(srt).reset_index(drop=True)
    )
    want = (
        toy_duck.execute(range_query_sql("r", _q(), **kw))
        .df().sort_values(srt).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    return got


def test_twin_pattern_labels_and_unwrap(toy, toy_duck):
    got = _both(
        toy, toy_duck,
        dict(agg="sum_over_time", step=43200, by=["extracted.path"],
             unwrap="extracted.ms", extract=_EX),
        ["x_path", "bucket"],
    )
    # non-matching rows ('cache miss') extract '' -> NULL uv -> excluded
    assert "" not in set(got.x_path)
    assert set(got.columns) == {"x_path", "bucket", "v"}


def test_twin_empty_label_kept_without_filter(toy, toy_duck):
    got = _both(
        toy, toy_duck,
        dict(agg="count_over_time", step=86400, by=["extracted.path"],
             extract=_EX),
        ["x_path", "bucket"],
    )
    # 'cache miss' rows carry the empty label (Loki behavior)
    assert "" in set(got.x_path)


def test_twin_numeric_label_filter(toy, toy_duck):
    got = _both(
        toy, toy_duck,
        dict(agg="count_over_time", step=86400, by=["extracted.path"],
             extract=_EX,
             extract_where=[("extracted.ms", ">", 100),
                            ("extracted.path", "!=", "static/x")]),
        ["x_path", "bucket"],
    )
    assert set(got.x_path) <= {"api/a", "api/b"}
    # numeric filter through TRY_CAST: '' never passes
    assert got.v.sum() > 0


def test_extract_where_requires_extract(toy):
    with pytest.raises(QueryValidationError, match="requires extract"):
        range_query(
            toy, _q(), agg="count_over_time", step=3600,
            extract_where=[("extracted.ms", ">", 1)],
        )
    with pytest.raises(QueryValidationError, match="requires extract"):
        range_query_sql(
            "r", _q(), agg="count_over_time", step=3600,
            extract_where=[("extracted.ms", ">", 1)],
        )


def test_extracted_fields_rejected_without_extraction(toy):
    with pytest.raises(QueryValidationError, match="by field not allowed"):
        range_query(toy, _q(), step=3600, by=["extracted.ms"])
    ex = Extraction.pattern("<a> x")
    with pytest.raises(QueryValidationError, match="unwrap field not allowed"):
        range_query(toy, _q(), agg="sum_over_time", step=3600,
                    unwrap="extracted.zz", extract=ex)


# -- HTTP body ----------------------------------------------------------


def test_api_extract_body(records_sf0001):
    body = {
        "start": "2024-01-01T00:00:00",
        "end": "2024-01-08T00:00:00",
        "step": "1d",
        "extract": {"pattern": "<method> /<path>"},
        "extract_where": [["extracted.path", "!=", ""]],
        "by": ["extracted.method"],
    }
    resp = range_request(records_sf0001, json.dumps(body))
    assert resp["success"], resp["message"]
    methods = {tuple(s["labels"].items())[0][1] for s in resp["data"]}
    assert methods == {"GET", "POST", "PUT"}


@pytest.mark.parametrize(
    "patch,msg",
    [
        ({"extract": {"bogus": 1}}, "extract:"),
        ({"extract": {"pattern": 7}}, "extract.pattern"),
        ({"extract": {"regexp": "(x", "names": ["x"]}}, "unbalanced"),
        ({"extract": {"pattern": "<m> x"},
          "extract_where": [["extracted.m", "~~", "y"]]}, "one of"),
        ({"extract": {"pattern": "<m> x"}, "by": ["extracted.nope"]},
         "by field not allowed"),
        ({"extract_where": "nope"}, "extract_where:"),
    ],
)
def test_api_extract_errors(records_sf0001, patch, msg):
    body = {
        "start": "2024-01-01T00:00:00",
        "end": "2024-01-02T00:00:00",
        "step": 3600,
        **patch,
    }
    resp = range_request(records_sf0001, json.dumps(body))
    assert not resp["success"] and msg in resp["message"], resp["message"]


def test_search_page_extracted_columns(records_sf0001):
    from logzilla_spark.api import search_request

    body = {
        "start": "2024-01-01T00:00:00",
        "end": "2024-01-08T00:00:00",
        "limit": 20,
        "extract": {"pattern": "<method> /<path>"},
    }
    resp = search_request(records_sf0001, json.dumps(body))
    assert resp["success"], resp["message"]
    assert resp["data"], "expected hits"
    for hit in resp["data"]:
        assert "x_method" in hit and "x_path" in hit
        if hit["message"].startswith(("GET /", "POST /", "PUT /")):
            assert hit["x_method"] == hit["message"].split(" ")[0]
        else:
            assert hit["x_method"] == ""  # no-match extracts ''
    # cursor contract untouched by the projection
    assert resp["metadata"]["cursor"] is not None


def test_search_page_extract_needs_message(records_sf0001):
    from logzilla_spark.api import search_request

    body = {
        "start": "2024-01-01T00:00:00",
        "end": "2024-01-08T00:00:00",
        "select_columns": ["id", "timestamp"],
        "extract": {"pattern": "<m> x"},
    }
    resp = search_request(records_sf0001, json.dumps(body))
    assert not resp["success"] and "message" in resp["message"]


def test_search_page_bad_extract_enveloped(records_sf0001):
    from logzilla_spark.api import search_request

    body = {
        "start": "2024-01-01T00:00:00",
        "end": "2024-01-02T00:00:00",
        "extract": {"regexp": "(?=x)(y)", "names": ["y"]},
    }
    resp = search_request(records_sf0001, json.dumps(body))
    assert not resp["success"] and "only" in resp["message"]


def test_facets_on_extracted_field(records_sf0001):
    from logzilla_spark.api import facets_request

    body = {
        "start": "2024-01-01T00:00:00",
        "end": "2024-01-08T00:00:00",
        "extract": {"pattern": "<method> /<path>"},
        "facets": ["extracted.method", "level"],
        "top_k": 5,
    }
    resp = facets_request(records_sf0001, json.dumps(body))
    assert resp["success"], resp["message"]
    by_facet = {}
    for r in resp["data"]:
        by_facet.setdefault(r["facet"], {})[r["value"]] = r["n"]
    methods = by_facet["extracted.method"]
    assert {"GET", "POST", "PUT", ""} <= set(methods)
    assert "" in methods  # non-access lines facet as the empty label
    assert "_histogram" in by_facet and "level" in by_facet
    # without an extraction the same field is rejected
    del body["extract"]
    resp2 = facets_request(records_sf0001, json.dumps(body))
    assert not resp2["success"] and "whitelisted" in resp2["message"]


def test_class_intersection_rejected():
    # Java set intersection [a&&b] has no RE2 equivalent
    with pytest.raises(QueryValidationError, match="intersection"):
        Extraction.regexp(r"[ab&&cd](x)", ["x"])
    # a single & stays a literal class member in both dialects
    assert Extraction.regexp(r"([a&b]+)", ["x"]).names == ("x",)
