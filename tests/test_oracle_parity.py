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
