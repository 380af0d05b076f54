"""Rehearsal of the driver's correctness gate: every queries() entry vs
its oracle_sql() twin on sf0.01 — row count, column names, and
order-insensitive value multiset must match.
"""

import pytest

import __spark_entry__ as entry
from .conftest import SF01, canon_rows

QUERIES = entry.queries()
ORACLES = entry.oracle_sql()


def test_every_query_has_oracle_or_is_declared():
    # every oracle key must have a query; queries without oracle get the
    # weaker rows-only check (allowed, but should be rare)
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck01):
    df = QUERIES[name](spark, SF01)
    spdf = df.toPandas()
    assert len(spdf) >= 0
    if name not in ORACLES:
        pytest.skip("rows-only query (no SQL-expressible oracle)")
    odf = duck01.sql(ORACLES[name]).df()
    assert len(spdf) == len(odf), f"row count {len(spdf)} != oracle {len(odf)}"
    assert sorted(spdf.columns) == sorted(odf.columns)
    a, b = canon_rows(spdf), canon_rows(odf)
    if a != b:
        only_a = list((a - b).items())[:3]
        only_b = list((b - a).items())[:3]
        raise AssertionError(f"value mismatch:\nspark-only={only_a}\noracle-only={only_b}")


def test_entry_smoke(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "window_start" in df.columns


def test_oracle_sql_follows_sf_dir():
    """oracle_sql(sf_dir) must embed that SF's pages/media cache paths
    in every corpus-backed statement (the no-arg default stays sf0.01,
    the driver's gate), so scripts/verify_oracle.py compares Spark and
    DuckDB over the SAME bytes at any scale."""
    from logzilla_spark.testdata import ensure_media, ensure_pages

    default = entry.oracle_sql()
    alt = entry.oracle_sql("/root/testdata/sf0.001")
    assert set(default) == set(alt)
    p001 = f"{ensure_pages('/root/testdata/sf0.001')}/pages.parquet"
    m001 = ensure_media("/root/testdata/sf0.001")
    for name, want in [
        ("q_pipeline_records", p001),
        ("q_search_cursor_page2", p001),
        ("q_search_backward", p001),
        ("q_media_stats", m001),
    ]:
        assert want in alt[name], name
        assert want not in default[name], name
    # relational/docs-table statements are SF-independent text: the
    # verify harness rebinds their DuckDB views instead
    assert default["q_tpch_q1"] == alt["q_tpch_q1"]
    assert default["q_dedup_exact"] == alt["q_dedup_exact"]
