"""Phrase search (T63): token-adjacency semantics, both tiers.

Pins the contract the AND tiers can't express: the query tokens must
appear CONSECUTIVELY, in order, in the record's searchable token
sequence — including across field boundaries (that's the 'across all
log fields' reading, mirrored exactly by oracle.phrase_sql). The
synthetic cases prove phrase ⊊ AND; the corpus cases prove the
positional-index tier and the committed served tier are row-identical
to the scan tier.
"""

import pytest
from pyspark.sql import functions as F

from logzilla_spark.operators.fulltext import (
    PHRASE_POSTINGS_SUFFIX,
    build_phrase_index_table,
    build_positional_index,
    full_text_phrase,
    full_text_search,
    search_phrase_index,
    serve_phrase,
)
from logzilla_spark.sources.catalog import LocalCatalog


def _ids(df):
    return sorted(r.id for r in df.select("id").collect())


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        # id, message, source, level, metadata
        (1, "alpha beta gamma", "h1.example", "INFO", {"service": "svc1"}),
        (2, "beta alpha gamma", "h1.example", "INFO", {"service": "svc1"}),
        (3, "alpha", "beta.example", "INFO", {"service": "svc1"}),
        (4, "ba na na", "h2.example", "WARN", {"service": "svc2"}),
        (5, "na ba na", "h2.example", "WARN", {"service": "svc2"}),
        (6, "alpha beta", "h3.example", "ERROR", {"service": "beta"}),
    ]
    return spark.createDataFrame(
        rows, "id int, message string, source string, level string, "
              "metadata map<string,string>"
    )


def test_phrase_is_strictly_stronger_than_and(tiny):
    # AND matches any order/spacing; phrase demands adjacency in order
    assert _ids(full_text_search(tiny, "alpha beta")) == [1, 2, 3, 6]
    assert _ids(full_text_phrase(tiny, "alpha beta")) == [1, 3, 6]
    # id 3: 'alpha' (message) immediately precedes 'beta' (source) in
    # the concatenated searchable text — cross-field adjacency is part
    # of the contract, same as the DuckDB twin
    assert _ids(full_text_phrase(tiny, "beta alpha")) == [2]


def test_phrase_duplicate_tokens(tiny):
    assert _ids(full_text_phrase(tiny, "na na")) == [4]
    assert _ids(full_text_phrase(tiny, "ba na na")) == [4]
    assert _ids(full_text_phrase(tiny, "na ba na")) == [5]


def test_phrase_single_and_empty(tiny):
    assert _ids(full_text_phrase(tiny, "gamma")) == [1, 2]
    # empty phrase = no constraint (same as the AND tiers)
    assert _ids(full_text_phrase(tiny, "  --  ")) == [1, 2, 3, 4, 5, 6]


def test_index_tier_equals_scan_tier_synthetic(tiny):
    idx = build_positional_index(tiny)
    for q in ("alpha beta", "beta alpha", "na na", "na ba na", "gamma",
              "nosuchtoken", "alpha beta gamma"):
        assert _ids(search_phrase_index(idx, tiny, q)) == _ids(
            full_text_phrase(tiny, q)
        )


def test_index_tier_equals_scan_tier_corpus(records_sf0001):
    idx = build_positional_index(records_sf0001)
    for q in ("timeout contacting upstream", "disk full", "full disk",
              "index html", "1 200"):
        assert _ids(search_phrase_index(idx, records_sf0001, q)) == _ids(
            full_text_phrase(records_sf0001, q)
        )


def test_served_equals_scan_tier(spark, records_sf0001, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    build_phrase_index_table(records_sf0001, cat, "logs")
    for q in ("timeout contacting upstream", "full disk", "disk full"):
        served = serve_phrase(spark, cat, "logs", records_sf0001, q)
        assert _ids(served) == _ids(full_text_phrase(records_sf0001, q))
    # all-tokens-out-of-range phrase: provably empty without a read
    out = serve_phrase(spark, cat, "logs", records_sf0001, "zzzznope zzzznope")
    assert out.count() == 0 and out.columns == records_sf0001.columns


def test_phrase_postings_prune(spark, records_sf0001, tmp_path, small_advisory):
    cat = LocalCatalog(str(tmp_path / "wh"))
    build_phrase_index_table(records_sf0001, cat, "logs")
    name = "logs" + PHRASE_POSTINGS_SUFFIX
    groups, total = cat.stats_pruned_files(name, "token", ["disk", "full"])
    kept = sum(len(g["files"]) for g in groups)
    assert total > 1 and 0 < kept < total
    # soundness: the pruned read holds every posting of the query tokens
    pruned = cat.read_stats_pruned(spark, name, "token", ["disk", "full"])
    full = cat.read(spark, name)
    want = F.col("token").isin(["disk", "full"])
    assert pruned.filter(want).count() == full.filter(want).count()
