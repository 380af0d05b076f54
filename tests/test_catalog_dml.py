"""Row-level DML on LocalCatalog (delete_where / merge_upsert) — the
Iceberg copy-on-write DELETE FROM / MERGE INTO analogs a web corpus
needs for takedowns and recrawl upserts.

Gates: content equality vs the equivalent filter/union; untouched
files carry over as the SAME physical paths (metadata-only — the
100 TB property: cost is O(matching files), not O(table)); manifest
stats prune the candidate list before any data IO; SQL NULL semantics
(condition NULL retains); history preserved (time travel + rollback);
optimistic-concurrency conflict raises instead of dropping a
concurrent writer's files; partitioned layout survives a rewrite.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from logzilla_spark.sources.catalog import (
    CommitConflictError,
    LocalCatalog,
    SnapshotError,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        F.element_at(
            F.array(F.lit("en"), F.lit("de"), F.lit("fr")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("lang"),
        (F.col("id") % 100).alias("score"),
    )


def _files(cat, name):
    sid = cat.last_snapshot_id(name)
    return sorted(f for g in cat._groups(name, sid) for f in g["files"])


@pytest.fixture()
def clustered(spark, tmp_path):
    """8 range-disjoint files clustered by doc_id (stats committed)."""
    cat = LocalCatalog(str(tmp_path / "wh"))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        cat.overwrite(
            _docs(spark).repartitionByRange(8, "doc_id"),
            "docs",
            cluster_by=["doc_id"],
        )
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    assert len(_files(cat, "docs")) == 8
    return cat


# -- delete_where ---------------------------------------------------------


def test_delete_content_and_metadata_only_carry(spark, clustered):
    cat = clustered
    before = _files(cat, "docs")
    sid = cat.delete_where(
        spark, "docs", "doc_id BETWEEN 50 AND 80",
        prune_column="doc_id", prune_ranges=[(50, 80)],
    )
    got = sorted(r.doc_id for r in cat.read(spark, "docs").collect())
    assert got == [i for i in range(400) if not 50 <= i <= 80]
    # a tight range over an 8-way range-clustered table touches <= 2 files;
    # every other file is the SAME physical path (metadata-only carry)
    after = _files(cat, "docs")
    rewritten = cat.snapshot_summary("docs", sid)["rewritten_files"]
    assert rewritten <= 2
    assert len(set(before) & set(after)) == len(before) - rewritten


def test_delete_replacement_files_keep_stats(spark, clustered):
    """Pruning must survive DML: the rewritten files get fresh manifest
    stats on the same columns, so a later stats-pruned read still
    skips files."""
    cat = clustered
    cat.delete_where(
        spark, "docs", "doc_id BETWEEN 50 AND 80",
        prune_column="doc_id", prune_ranges=[(50, 80)],
    )
    groups, total = cat.stats_pruned_files("docs", "doc_id", points=[90])
    kept = sum(len(g["files"]) for g in groups)
    assert kept < total  # still prunes after the rewrite


def test_delete_null_condition_rows_retained(spark, tmp_path):
    """SQL DELETE semantics: only condition IS TRUE deletes — a NULL
    predicate value retains the row."""
    cat = LocalCatalog(str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id INT, tag STRING"
    )
    cat.overwrite(df, "t")
    cat.delete_where(spark, "t", "tag = 'a'")
    got = sorted(r.id for r in cat.read(spark, "t").collect())
    assert got == [2, 3]  # NULL-tag row survived


def test_delete_history_time_travel_and_rollback(spark, clustered):
    cat = clustered
    pre = cat.last_snapshot_id("docs")
    cat.delete_where(spark, "docs", "lang = 'de'")
    assert cat.read(spark, "docs").count() < 400
    assert cat.read(spark, "docs", snapshot_id=pre).count() == 400
    cat.rollback("docs", pre)
    assert cat.read(spark, "docs").count() == 400


def test_delete_no_match_is_noop(spark, clustered):
    cat = clustered
    head = cat.last_snapshot_id("docs")
    assert cat.delete_where(spark, "docs", "doc_id = -1") == head
    assert cat.last_snapshot_id("docs") == head  # no snapshot published


def test_delete_conflict_raises(spark, clustered, monkeypatch):
    """A commit landing between the rewrite's read and its publish must
    raise, not silently drop the concurrent writer's files."""
    cat = clustered
    real_stage = cat._stage_write

    def stage_with_concurrent_append(df, name, partition_by, cluster_by=None):
        files = real_stage(df, name, partition_by, cluster_by)
        monkeypatch.undo()  # only fire once
        cat.append(_docs(spark, 5), "docs")
        return files

    monkeypatch.setattr(cat, "_stage_write", stage_with_concurrent_append)
    with pytest.raises(CommitConflictError):
        cat.delete_where(spark, "docs", "doc_id < 10")
    # the concurrent append's rows are intact
    assert cat.read(spark, "docs").count() == 405


def test_delete_partitioned_layout_preserved(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    cat.overwrite(_docs(spark), "t", partition_by=["lang"])
    cat.delete_where(spark, "t", "score >= 50 AND lang = 'de'")
    # rewritten files are still under lang= dirs
    assert all("lang=" in f for f in _files(cat, "t"))
    de = cat.read_partitions(spark, "t", "lang", ["de"])
    assert de.count() == sum(1 for i in range(400) if i % 3 == 1 and i % 100 < 50)
    # untouched partitions unaffected
    en = cat.read_partitions(spark, "t", "lang", ["en"])
    assert en.count() == sum(1 for i in range(400) if i % 3 == 0)


def test_delete_empty_table_raises(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    with pytest.raises(SnapshotError):
        cat.delete_where(spark, "nope", "1=1")


# -- merge_upsert ---------------------------------------------------------


def test_merge_source_wins_and_inserts(spark, clustered):
    cat = clustered
    src = spark.range(10).select(
        (F.col("id") * 40).alias("doc_id"),  # 0,40,...,360 match; plus inserts
        F.lit("updated").alias("text"),
        F.lit("xx").alias("lang"),
        F.lit(-1).alias("score"),
    ).union(
        spark.range(3).select(
            (F.col("id") + 1000).alias("doc_id"),
            F.lit("fresh").alias("text"),
            F.lit("yy").alias("lang"),
            F.lit(-2).alias("score"),
        )
    )
    cat.merge_upsert(spark, src, "docs", keys=["doc_id"])
    out = cat.read(spark, "docs")
    assert out.count() == 403  # 400 + 3 inserts
    assert out.filter("text = 'updated'").count() == 10
    assert out.filter("doc_id >= 1000").count() == 3
    assert out.count() == out.select("doc_id").distinct().count()


def test_merge_stats_prune_narrows_rewrite(spark, clustered):
    """A source bounded to a tight key range must rewrite only the
    overlapping clustered files — manifest stats gate the semi-join."""
    cat = clustered
    before = _files(cat, "docs")
    src = spark.range(5).select(
        (F.col("id") + 60).alias("doc_id"),
        F.lit("u").alias("text"), F.lit("en").alias("lang"),
        F.lit(0).alias("score"),
    )
    sid = cat.merge_upsert(spark, src, "docs", keys=["doc_id"])
    rewritten = cat.snapshot_summary("docs", sid)["rewritten_files"]
    assert rewritten <= 2
    assert len(set(before) & set(_files(cat, "docs"))) == len(before) - rewritten


def test_merge_keep_newest(spark, tmp_path):
    """order_col: an OLDER source row leaves the committed row in
    place; a newer one replaces it; ties go to the source."""
    cat = LocalCatalog(str(tmp_path / "wh"))
    tgt = spark.createDataFrame(
        [(1, "t1", 10), (2, "t2", 10), (3, "t3", 10)], "k INT, v STRING, ts INT"
    )
    cat.overwrite(tgt, "t")
    src = spark.createDataFrame(
        [(1, "newer", 20), (2, "older", 5), (3, "tie", 10), (4, "ins", 1)],
        "k INT, v STRING, ts INT",
    )
    cat.merge_upsert(spark, src, "t", keys=["k"], order_col="ts")
    got = {r.k: r.v for r in cat.read(spark, "t").collect()}
    assert got == {1: "newer", 2: "t2", 3: "tie", 4: "ins"}


def test_merge_idempotent_replay(spark, clustered):
    """Replaying the same merge converges to the same content (the
    recrawl batch applied twice — rewrites happen but rows don't
    duplicate)."""
    cat = clustered
    src = spark.range(7).select(
        (F.col("id") * 31).alias("doc_id"),
        F.lit("re").alias("text"), F.lit("en").alias("lang"),
        F.lit(1).alias("score"),
    )
    cat.merge_upsert(spark, src, "docs", keys=["doc_id"])
    n1 = cat.read(spark, "docs").count()
    cat.merge_upsert(spark, src, "docs", keys=["doc_id"])
    out = cat.read(spark, "docs")
    assert out.count() == n1
    assert out.count() == out.select("doc_id").distinct().count()
    assert out.filter("text = 're'").count() == 7


def test_merge_partitioned_layout_preserved(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    cat.overwrite(_docs(spark), "t", partition_by=["lang"])
    src = spark.createDataFrame(
        [(0, "u0", "en", 0), (5000, "ins", "de", 0)],
        "doc_id LONG, text STRING, lang STRING, score LONG",
    )
    cat.merge_upsert(spark, src, "t", keys=["doc_id"])
    assert all("lang=" in f for f in _files(cat, "t"))
    out = cat.read(spark, "t")
    assert out.count() == 401
    assert out.filter("doc_id = 0").first().text == "u0"
    assert cat.read_partitions(spark, "t", "lang", ["de"]).filter(
        "doc_id = 5000"
    ).count() == 1
