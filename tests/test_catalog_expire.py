"""Snapshot expiration + orphan-file cleanup (the Iceberg maintenance
pair that bounds disk under copy-on-write churn — compact/DELETE/MERGE
replace files but never delete them).

Gates: disk actually shrinks; kept snapshots read bit-identically
(carried files referenced by a kept snapshot are NOT deleted even when
an expired one also references them); expired time travel raises;
keep_ids pins a rollback target; external (append_external) files are
never deleted; orphan cleanup removes crash-staged files past the age
guard and nothing referenced or fresh.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from logzilla_spark.sources.catalog import LocalCatalog, SnapshotError


def _df(spark, n, tag):
    return spark.range(n).select(
        F.col("id"), F.lit(tag).alias("tag"), (F.col("id") % 9).alias("v")
    )


def _data_files(cat, name):
    out = []
    for root, _d, fn in os.walk(cat._data_dir(name)):
        out += [os.path.join(root, f) for f in fn if f.endswith(".parquet")]
    return sorted(out)


@pytest.fixture()
def churned(spark, tmp_path):
    """A table with copy-on-write history: overwrite + append +
    delete (rewrites a file) + compact (rewrites everything)."""
    cat = LocalCatalog(str(tmp_path / "wh"))
    cat.overwrite(_df(spark, 100, "a"), "t")
    cat.append(_df(spark, 50, "b"), "t")
    cat.delete_where(spark, "t", "tag = 'a' AND id < 10")
    cat.compact(spark, "t")
    return cat


def test_expire_shrinks_disk_and_preserves_head(spark, churned):
    cat = churned
    before = _data_files(cat, "t")
    head_rows = sorted(
        (r.id, r.tag) for r in cat.read(spark, "t").collect()
    )
    res = cat.expire_snapshots("t", keep_last=1)
    assert res["expired"] and res["deleted_files"] > 0
    after = _data_files(cat, "t")
    assert len(after) < len(before)
    # head reads bit-identically from the surviving files
    assert sorted((r.id, r.tag) for r in cat.read(spark, "t").collect()) == head_rows
    assert cat.snapshot_ids("t") == [cat.last_snapshot_id("t")]


def test_expired_time_travel_raises_kept_still_reads(spark, churned):
    cat = churned
    ids = cat.snapshot_ids("t")
    cat.expire_snapshots("t", keep_last=2)
    with pytest.raises(SnapshotError):
        cat.read(spark, "t", snapshot_id=ids[0])
    # the second-newest snapshot (post-delete, pre-compact) survives
    # INCLUDING files it shares with expired snapshots (carried appends)
    assert cat.read(spark, "t", snapshot_id=ids[-2]).count() == 140


def test_keep_ids_pins_rollback_target(spark, churned):
    cat = churned
    pre_delete = cat.snapshot_ids("t")[1]  # the append snapshot
    cat.expire_snapshots("t", keep_last=1, keep_ids=[pre_delete])
    assert cat.read(spark, "t", snapshot_id=pre_delete).count() == 150
    cat.rollback("t", pre_delete)
    assert cat.read(spark, "t").count() == 150


def test_expire_never_deletes_external_files(spark, tmp_path):
    """append_external files belong to their staging owner (the route
    fan-out's shared write) — expire skips them and reports them."""
    cat = LocalCatalog(str(tmp_path / "wh"))
    ext = str(tmp_path / "ext")
    _df(spark, 20, "x").write.parquet(ext)
    files = sorted(
        os.path.join(ext, f) for f in os.listdir(ext) if f.endswith(".parquet")
    )
    cat.append_external("t", files, ext)
    cat.overwrite(_df(spark, 5, "y"), "t")  # external snapshot now dead
    res = cat.expire_snapshots("t", keep_last=1)
    assert res["external_skipped"] == files
    assert all(os.path.exists(f) for f in files)


def test_noop_when_nothing_to_expire(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    cat.overwrite(_df(spark, 5, "a"), "t")
    assert cat.expire_snapshots("t", keep_last=3) == {
        "expired": [], "deleted_files": 0, "external_skipped": []
    }


def test_orphan_cleanup_crash_staged_files(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    cat.overwrite(_df(spark, 30, "a"), "t")
    committed = set(_data_files(cat, "t"))
    # simulate a crash: staged but never committed
    orphans = cat._stage_write(_df(spark, 10, "crash"), "t", None)
    assert orphans
    # fresh orphans survive the age guard (in-flight writer protection)
    assert cat.remove_orphan_files("t", older_than_seconds=3600) == []
    for f in orphans:
        os.utime(f, (1, 1))
    removed = cat.remove_orphan_files("t", older_than_seconds=3600)
    assert set(removed) == set(orphans)
    assert set(_data_files(cat, "t")) == committed
    assert cat.read(spark, "t").count() == 30
