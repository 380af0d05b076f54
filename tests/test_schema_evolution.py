"""Iceberg-style schema evolution on LocalCatalog: the writer's schema
is recorded in the snapshot manifest and applied EXPLICITLY at read, so
adding a column is a metadata operation — files from before the add
fill it with NULL, no rewrite, no footer sampling — and time travel
reads each snapshot under ITS OWN schema.
"""

import pytest
from pyspark.sql import functions as F

from logzilla_spark.sources.catalog import LocalCatalog


def _df(spark, lo, hi, extra=False):
    base = spark.range(lo, hi).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id").cast("string")).alias("name")
    )
    if extra:
        base = base.withColumn("score", (F.col("id") * 2).cast("double"))
    return base


def test_added_column_backfills_null(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    cat.append(_df(spark, 0, 10), "t")
    cat.append(_df(spark, 10, 20, extra=True), "t")  # schema adds `score`
    got = cat.read(spark, "t")
    assert got.columns == ["id", "name", "score"]
    rows = {r.id: r for r in got.collect()}
    assert len(rows) == 20
    assert rows[5].score is None       # pre-evolution file -> NULL fill
    assert rows[15].score == 30.0      # post-evolution file -> real value


def test_time_travel_sees_each_snapshots_schema(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    s1 = cat.append(_df(spark, 0, 10), "t")
    s2 = cat.append(_df(spark, 10, 20, extra=True), "t")
    assert cat.read(spark, "t", snapshot_id=s1).columns == ["id", "name"]
    assert cat.read(spark, "t", snapshot_id=s2).columns == ["id", "name", "score"]


def test_dropped_column_ignored_in_old_files(spark, tmp_path):
    """Appending with a NARROWER schema makes it current — the column
    physically present in older files is projected away, not resurrected."""
    cat = LocalCatalog(str(tmp_path / "wh"))
    cat.append(_df(spark, 0, 10, extra=True), "t")
    cat.append(_df(spark, 10, 20), "t")  # no `score`
    got = cat.read(spark, "t")
    assert got.columns == ["id", "name"]
    assert got.count() == 20


def test_incremental_read_uses_head_schema(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    s1 = cat.append(_df(spark, 0, 10), "t")
    cat.append(_df(spark, 10, 20, extra=True), "t")
    inc = cat.read_incremental(spark, "t", s1)
    assert inc.columns == ["id", "name", "score"]
    assert sorted(r.id for r in inc.collect()) == list(range(10, 20))


def test_rollback_restores_old_schema(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    s1 = cat.append(_df(spark, 0, 10), "t")
    cat.append(_df(spark, 10, 20, extra=True), "t")
    cat.rollback("t", s1)
    got = cat.read(spark, "t")
    assert got.columns == ["id", "name"]
    assert got.count() == 10


def test_evolution_composes_with_partitioned_tables(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    d1 = _df(spark, 0, 10).withColumn("part", F.lit("a"))
    d2 = _df(spark, 10, 20, extra=True).withColumn("part", F.lit("b"))
    cat.append(d1, "t", partition_by=["part"])
    cat.append(d2, "t", partition_by=["part"])
    got = cat.read(spark, "t")
    assert set(got.columns) == {"id", "name", "score", "part"}
    by_part = {r.part: r["count"] for r in got.groupBy("part").count().collect()}
    assert by_part == {"a": 10, "b": 10}
    # partition-pruned read still recovers the dir column under the
    # explicit committed schema
    only_b = cat.read_partitions(spark, "t", "part", ["b"])
    assert only_b.count() == 10 and only_b.filter("score IS NULL").count() == 0


def test_evolution_composes_with_stats_pruning(spark, tmp_path, small_advisory):
    cat = LocalCatalog(str(tmp_path / "wh"))
    big = spark.range(30000).select(
        F.col("id"), F.format_string("k%05d", F.col("id")).alias("key")
    )
    cat.overwrite(big, "t", cluster_by=["key"])
    cat.append(
        spark.range(30000, 30010)
        .select(
            F.col("id"),
            F.format_string("k%05d", F.col("id")).alias("key"),
            F.lit(1.5).alias("w"),
        ),
        "t",
        cluster_by=["key"],
    )
    got = cat.read_stats_pruned(spark, "t", "key", ["k00007", "k30005"])
    assert got is not None
    vals = {r.key: r.w for r in got.filter(F.col("key").isin("k00007", "k30005")).collect()}
    assert vals == {"k00007": None, "k30005": 1.5}
