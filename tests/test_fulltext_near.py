"""Proximity search (T64): in-order tokens, bounded per-gap slop.

Pins the tier between AND (tokens anywhere) and phrase (adjacent):
query tokens must appear IN ORDER with at most ``slop`` non-matching
tokens between each consecutive pair. slop=0 must equal the phrase
semantics exactly; the index tier (chain join over positional
postings) and the committed served tier must be row-identical to the
scan-tier regex on every probe.
"""

import pytest

from logzilla_spark.operators.fulltext import (
    build_phrase_index_table,
    build_positional_index,
    full_text_near,
    full_text_phrase,
    full_text_search,
    search_near_index,
    serve_near,
)
from logzilla_spark.sources.catalog import LocalCatalog


def _ids(df):
    return sorted(r.id for r in df.select("id").collect())


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        # gap between 'alpha' and 'omega': 0, 1, 2, 3 filler tokens
        (1, "alpha omega", "h1.example", "INFO", {"service": "svc1"}),
        (2, "alpha one omega", "h1.example", "INFO", {"service": "svc1"}),
        (3, "alpha one two omega", "h1.example", "INFO", {"service": "svc1"}),
        (4, "alpha one two three omega", "h1.example", "INFO", {"service": "svc1"}),
        # wrong order — never matches any slop
        (5, "omega one alpha", "h1.example", "INFO", {"service": "svc1"}),
        # PER-GAP semantics: alpha -1- mid -1- omega matches slop=1
        # even though the total spread is 2
        (6, "alpha one mid two omega", "h1.example", "INFO", {"service": "svc1"}),
        # cross-field gap: message ends 'alpha', source contributes
        # 'beta' + 'example', so alpha -2- omega(service) needs slop>=3
        (7, "alpha", "beta.example", "INFO", {"service": "omega"}),
        # repeated tokens: na -1- na satisfied by the 2nd..3rd 'na'
        (8, "na xx na", "h2.example", "WARN", {"service": "svc2"}),
        (9, "na xx yy na", "h2.example", "WARN", {"service": "svc2"}),
    ]
    return spark.createDataFrame(
        rows, "id int, message string, source string, level string, "
              "metadata map<string,string>"
    )


def test_near_slop_window(tiny):
    assert _ids(full_text_near(tiny, "alpha omega", 0)) == [1]
    assert _ids(full_text_near(tiny, "alpha omega", 1)) == [1, 2]
    assert _ids(full_text_near(tiny, "alpha omega", 2)) == [1, 2, 3]
    assert _ids(full_text_near(tiny, "alpha omega", 3)) == [1, 2, 3, 4, 6, 7]
    # order is required at every slop: id 5 never matches
    assert 5 not in _ids(full_text_near(tiny, "alpha omega", 9))


def test_near_per_gap_not_total(tiny):
    # alpha -1- mid -1- omega: each gap <= 1, total spread 2
    assert _ids(full_text_near(tiny, "alpha mid omega", 1)) == [6]
    # but alpha..omega directly in id 6 needs a 3-token gap
    assert 6 not in _ids(full_text_near(tiny, "alpha omega", 2))
    assert 6 in _ids(full_text_near(tiny, "alpha omega", 3))


def test_near_slop0_equals_phrase(tiny, records_sf0001):
    for df, qs in (
        (tiny, ("alpha omega", "na na", "alpha", "omega alpha")),
        (records_sf0001, ("timeout contacting upstream", "disk full",
                          "get index html", "1 200")),
    ):
        for q in qs:
            assert _ids(full_text_near(df, q, 0)) == _ids(
                full_text_phrase(df, q)
            )


def test_near_between_phrase_and_and(records_sf0001):
    # phrase subset-of near subset-of AND, on a probe where all three differ
    a = set(_ids(full_text_search(records_sf0001, "get 200")))
    n = set(_ids(full_text_near(records_sf0001, "get 200", 2)))
    p = set(_ids(full_text_phrase(records_sf0001, "get 200")))
    assert p <= n <= a and len(p) < len(n) < len(a)


def test_near_duplicate_tokens(tiny):
    assert _ids(full_text_near(tiny, "na na", 1)) == [8]
    assert _ids(full_text_near(tiny, "na na", 2)) == [8, 9]


def test_index_tier_equals_scan_tier(tiny, records_sf0001):
    for df, probes in (
        (tiny, [("alpha omega", 0), ("alpha omega", 1), ("alpha omega", 3),
                ("alpha mid omega", 1), ("na na", 1), ("na na", 2),
                ("omega alpha", 5), ("nosuchtoken", 1)]),
        (records_sf0001, [("get 200", 2), ("get 200", 3),
                          ("timeout upstream", 1), ("1 200", 0)]),
    ):
        idx = build_positional_index(df)
        for q, s in probes:
            assert _ids(search_near_index(idx, df, q, s)) == _ids(
                full_text_near(df, q, s)
            ), (q, s)


def test_served_equals_scan_tier(spark, records_sf0001, tmp_path):
    # the SAME committed positional postings table serves phrase and near
    cat = LocalCatalog(str(tmp_path / "wh"))
    build_phrase_index_table(records_sf0001, cat, "logs")
    for q, s in (("get 200", 2), ("timeout upstream", 1)):
        served = serve_near(spark, cat, "logs", records_sf0001, q, s)
        assert _ids(served) == _ids(full_text_near(records_sf0001, q, s))
    out = serve_near(spark, cat, "logs", records_sf0001, "zzzznope zzzz", 2)
    assert out.count() == 0 and out.columns == records_sf0001.columns


def test_near_validates_slop(tiny):
    with pytest.raises(ValueError):
        full_text_near(tiny, "alpha omega", -1)
