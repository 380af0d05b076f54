"""search_catalog: the O29 mandatory time range applied as FILE-LEVEL
pruning over a timestamp-clustered committed table (T25 clustered
writes + manifest stats), before Spark lists anything. Pruning is an
optimization, never the filter — every test pins result equality with
the unpruned ``search(catalog.read(...), query)``.
"""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from logzilla_spark.operators.query import Query, search, search_catalog
from logzilla_spark.sources.catalog import LocalCatalog


@pytest.fixture()
def cat(spark, records_sf0001, tmp_path, small_advisory):
    c = LocalCatalog(str(tmp_path / "wh"))
    c.overwrite(records_sf0001, "records", cluster_by=["timestamp"])
    return c


def _span(spark, cat):
    full = cat.read(spark, "records")
    row = full.agg(
        F.min("timestamp").alias("lo"), F.max("timestamp").alias("hi")
    ).collect()[0]
    return row.lo, row.hi


def _rows(df):
    return sorted((r.id, str(r.timestamp)) for r in df.collect())


def test_narrow_window_prunes_files_and_matches_unpruned(spark, cat):
    lo, hi = _span(spark, cat)
    mid = lo + (hi - lo) / 2
    # anchor on an actual row's timestamp so the window is non-vacuous
    full = cat.read(spark, "records")
    mid = full.filter(F.col("timestamp") >= mid).agg(
        F.min("timestamp")
    ).collect()[0][0]
    q = Query(start=mid, end=mid + timedelta(minutes=5), limit=1000)
    groups, total = cat.stats_pruned_files(
        "records", "timestamp", ranges=[(q.start, q.end)]
    )
    kept = sum(len(g["files"]) for g in groups)
    assert total > 1 and 0 < kept < total  # the window really pruned files
    got = search_catalog(spark, cat, "records", q)
    want = search(cat.read(spark, "records"), q)
    assert _rows(got) == _rows(want)
    assert got.count() > 0  # non-vacuous


def test_window_outside_data_is_empty_with_schema(spark, cat):
    lo, _ = _span(spark, cat)
    q = Query(start=lo - timedelta(days=400), end=lo - timedelta(days=399))
    got = search_catalog(spark, cat, "records", q)
    assert got.count() == 0
    assert got.columns == search(cat.read(spark, "records"), q).columns


def test_auto_swap_backward_range_still_prunes_correctly(spark, cat):
    lo, hi = _span(spark, cat)
    mid = lo + (hi - lo) / 2
    # end < start -> auto-swap + backward chronology (O29/O31)
    q = Query(start=mid + timedelta(minutes=5), end=mid, limit=50)
    got = search_catalog(spark, cat, "records", q)
    want = search(cat.read(spark, "records"), q)
    assert _rows(got) == _rows(want)


def test_unbounded_end_range(spark, cat):
    lo, hi = _span(spark, cat)
    q = Query(start=hi - timedelta(minutes=2), end=None, limit=1000)
    got = search_catalog(spark, cat, "records", q)
    want = search(cat.read(spark, "records"), q)
    assert _rows(got) == _rows(want)
    groups, total = cat.stats_pruned_files(
        "records", "timestamp", ranges=[(q.start, None)]
    )
    assert sum(len(g["files"]) for g in groups) < total


def test_timestamp_stats_are_json_portable_ints(spark, cat):
    """Manifest timestamp stats round-trip through JSON as epoch-micros
    ints (datetime objects would not survive the manifest)."""
    sid = cat.last_snapshot_id("records")
    seen = 0
    for g in cat._groups("records", sid):
        for st in g.get("stats", {}).values():
            lo, hi = st["timestamp"]
            assert isinstance(lo, int) and isinstance(hi, int) and lo <= hi
            seen += 1
    assert seen > 1


def test_unclustered_table_degrades_to_unpruned_search(spark, records_sf0001, tmp_path):
    c = LocalCatalog(str(tmp_path / "wh"))
    c.overwrite(records_sf0001, "records")  # no cluster_by -> no stats
    lo = records_sf0001.agg(F.min("timestamp")).collect()[0][0]
    q = Query(start=lo, end=lo + timedelta(minutes=1), limit=1000)
    got = search_catalog(spark, c, "records", q)
    want = search(c.read(spark, "records"), q)
    assert _rows(got) == _rows(want)


def test_no_constraint_raises(cat):
    with pytest.raises(ValueError):
        cat.stats_pruned_files("records", "timestamp")
