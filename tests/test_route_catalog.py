"""Catalog snapshot semantics + routing invariants (G3, G7 primitives)."""

import pytest
from pyspark.sql import functions as F

from logzilla_spark.operators.parse import parse_records
from logzilla_spark.operators.route import read_all_sinks, route_to_sinks, sink_name
from logzilla_spark.schemas import CATEGORIES
from logzilla_spark.sources.catalog import LocalCatalog, SnapshotError
from logzilla_spark.testdata import ensure_pages

from .conftest import SF001


def test_catalog_append_overwrite_timetravel(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    df1 = spark.range(5).withColumn("v", F.lit("a"))
    df2 = spark.range(3).withColumn("v", F.lit("b"))
    s1 = cat.append(df1, "t")
    s2 = cat.append(df2, "t")
    assert [s1, s2] == [1, 2]
    assert cat.read(spark, "t").count() == 8
    assert cat.read(spark, "t", snapshot_id=s1).count() == 5  # time travel
    inc = cat.read_incremental(spark, "t", after_snapshot_id=s1)
    assert inc.count() == 3  # only the second append
    assert cat.read_incremental(spark, "t", after_snapshot_id=s2) is None
    s3 = cat.overwrite(df1, "t")
    assert cat.read(spark, "t", snapshot_id=s3).count() == 5
    with pytest.raises(SnapshotError):
        cat.read(spark, "missing")


def test_route_set_equality_and_disjoint(spark, tmp_path):
    """north_rule invariants: union of sinks == parsed rows; sinks disjoint."""
    cat = LocalCatalog(str(tmp_path / "wh"))
    d = ensure_pages(SF001)
    rec = parse_records(spark.read.parquet(f"{d}/pages.parquet"), impl="native")
    snaps = route_to_sinks(rec, cat, run_id="r1")
    assert set(snaps) == set(CATEGORIES)

    union = read_all_sinks(spark, cat)
    n_rec = rec.count()
    assert union.count() == n_rec
    # set equality on id (ids are unique per line)
    assert union.select("id").distinct().count() == n_rec
    assert (
        union.select("id").exceptAll(rec.select("id")).count() == 0
        and rec.select("id").exceptAll(union.select("id")).count() == 0
    )
    # pairwise disjoint + each sink pure
    for c in CATEGORIES:
        sdf = cat.read(spark, sink_name(c))
        assert sdf.filter(F.col("category") != c).count() == 0


def test_route_is_single_upstream_pass(spark, tmp_path):
    """The parse stage must run once, not once per sink: route over an
    accumulator-instrumented source and count upstream evaluations."""
    acc = spark.sparkContext.accumulator(0)

    def bump(it):
        for row in it:
            acc.add(1)
            yield row

    d = ensure_pages(SF001)
    pages = spark.read.parquet(f"{d}/pages.parquet")
    counted = spark.createDataFrame(pages.rdd.mapPartitions(bump), pages.schema)
    rec = parse_records(counted, impl="native")
    cat = LocalCatalog(str(tmp_path / "wh"))
    route_to_sinks(rec, cat, run_id="r1")
    n_pages = pages.count()
    # one materialization (plus zero re-reads thanks to persist)
    assert acc.value == n_pages, f"upstream evaluated {acc.value / n_pages:.1f}x"
