"""T67 typeahead completion: token-prefix suggestions by doc frequency.

Pins per-doc-distinct counting (a token repeated in one doc counts
once), the (n_docs DESC, token ASC) deterministic cut, scan ==
postings-index == committed-served equality, and prefix-RANGE file
pruning on the token-clustered committed postings (a keystroke reads
only the files whose manifest token range overlaps the prefix
interval).
"""

import pytest

from logzilla_spark.operators.fulltext import (
    POSTINGS_SUFFIX,
    build_fulltext_index_table,
    build_inverted_index,
    complete_prefix,
    complete_prefix_index,
    serve_complete,
)
from logzilla_spark.sources.catalog import LocalCatalog


def _rows(df):
    return [(r.token, r.n_docs) for r in df.collect()]


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (1, "alpha alpine alpha", "h1.example", "INFO", {}),
        (2, "alpine beta", "h1.example", "INFO", {}),
        (3, "alpha beta", "h2.example", "WARN", {}),
        (4, "altitude", "h2.example", "WARN", {}),
    ]
    return spark.createDataFrame(
        rows, "id int, message string, source string, level string, "
              "metadata map<string,string>"
    )


def test_doc_frequency_and_cut(tiny):
    # 'alpha' twice in doc 1 counts once -> alpha 2, alpine 2,
    # altitude 1; count tie breaks by token ASC
    assert _rows(complete_prefix(tiny, "al")) == [
        ("alpha", 2), ("alpine", 2), ("altitude", 1)
    ]
    assert _rows(complete_prefix(tiny, "al", k=1)) == [("alpha", 2)]
    assert _rows(complete_prefix(tiny, "alt")) == [("altitude", 1)]
    assert _rows(complete_prefix(tiny, "zz")) == []
    # case-normalized like the tokenizer
    assert _rows(complete_prefix(tiny, "AL")) == _rows(complete_prefix(tiny, "al"))


def test_prefix_validation(tiny):
    for bad in ("", "a b", "a%", "a_b", "a*"):
        with pytest.raises(ValueError):
            complete_prefix(tiny, bad)


def test_index_tier_equals_scan(tiny, records_sf0001):
    for df, prefixes in ((tiny, ["al", "b", "h"]),
                         (records_sf0001, ["1", "p", "re", "zz"])):
        idx = build_inverted_index(df)
        for p in prefixes:
            assert _rows(complete_prefix_index(idx, p)) == _rows(
                complete_prefix(df, p)
            )


def test_served_equals_scan_with_pruning(spark, records_sf0001, tmp_path,
                                         small_advisory):
    cat = LocalCatalog(str(tmp_path / "wh"))
    build_fulltext_index_table(records_sf0001, cat, "logs")
    for p in ("1", "p", "re"):
        assert _rows(serve_complete(spark, cat, "logs", p, k=12)) == _rows(
            complete_prefix(records_sf0001, p, k=12)
        )
    # pruning: the prefix interval keeps a strict subset of files
    name = "logs" + POSTINGS_SUFFIX
    groups, total = cat.stats_pruned_files(name, "token", ranges=[("re", "re￿")])
    kept = sum(len(g["files"]) for g in groups)
    assert total > 1 and 0 < kept < total
    # no committed file can contain the prefix -> empty frame, schema kept
    out = serve_complete(spark, cat, "logs", "zzzzzz")
    assert out.count() == 0 and out.columns == ["token", "n_docs"]


def test_api_request(tiny):
    from logzilla_spark.api import complete_request

    resp = complete_request(tiny, "/api/logs/complete?prefix=al&k=2")
    assert resp["success"] and [d["token"] for d in resp["data"]] == [
        "alpha", "alpine"
    ]
    assert not complete_request(tiny, "/api/logs/complete?prefix=a%25")["success"]
    assert not complete_request(tiny, "/api/logs/complete")["success"]
    assert not complete_request(tiny, "/api/logs/complete?prefix=al&k=0")["success"]
