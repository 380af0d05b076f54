"""Partition retention (drop_partitions / expire_partitions_before).

Pins the contract the registry oracle can't see: metadata-only drops
(kept partitions keep their PHYSICAL files), time travel to the
pre-retention snapshot, fail-closed on unpartitioned layouts, and the
full TTL lifecycle (drop -> expire_snapshots reclaims the files).
"""

from __future__ import annotations

import os
import tempfile

import pytest

from logzilla_spark.sources.catalog import LocalCatalog, SnapshotError


def _cat():
    return LocalCatalog(tempfile.mkdtemp(prefix="cat_ttl_test_"))


def _events(spark, days=("2024-01-01", "2024-01-02", "2024-01-15", "2024-01-20")):
    rows = [(d, i, f"e{i % 2}") for d in days for i in range(5)]
    return spark.createDataFrame(rows, "day string, n bigint, event_type string")


def _files(cat, name):
    sid = cat.last_snapshot_id(name)
    return sorted(f for g in cat._groups(name, sid) for f in g["files"])


class TestDropPartitions:
    def test_metadata_only_and_time_travel(self, spark):
        cat = _cat()
        cat.append(_events(spark), "ev", partition_by=["day"])
        pre_sid = cat.last_snapshot_id("ev")
        pre_files = _files(cat, "ev")
        kept_before = [f for f in pre_files if "day=2024-01-01" not in f]

        sid = cat.drop_partitions("ev", "day", ["2024-01-01"])
        assert sid == pre_sid + 1
        # kept partitions keep their PHYSICAL files — no rewrite
        assert _files(cat, "ev") == sorted(kept_before)
        # dropped files stay on disk for time travel
        dropped = set(pre_files) - set(kept_before)
        assert dropped and all(os.path.exists(f) for f in dropped)
        assert cat.read(spark, "ev", snapshot_id=pre_sid).count() == 20
        assert cat.read(spark, "ev").count() == 15
        assert set(
            r["day"] for r in cat.read(spark, "ev").select("day").distinct().collect()
        ) == {"2024-01-02", "2024-01-15", "2024-01-20"}

    def test_fail_closed_on_unpartitioned_files(self, spark):
        cat = _cat()
        cat.append(_events(spark), "ev")  # NOT partitioned by day
        with pytest.raises(ValueError, match="outside"):
            cat.drop_partitions("ev", "day", ["2024-01-01"])

    def test_missing_table_raises(self, spark):
        with pytest.raises(SnapshotError):
            _cat().drop_partitions("nope", "day", ["2024-01-01"])


class TestExpirePartitionsBefore:
    def test_lexicographic_cutoff(self, spark):
        cat = _cat()
        cat.append(_events(spark), "ev", partition_by=["day"])
        sid, dropped = cat.expire_partitions_before("ev", "day", "2024-01-15")
        assert dropped == ["2024-01-01", "2024-01-02"]
        assert sid == cat.last_snapshot_id("ev")
        assert cat.read(spark, "ev").count() == 10

    def test_noop_when_nothing_old(self, spark):
        cat = _cat()
        cat.append(_events(spark), "ev", partition_by=["day"])
        head = cat.last_snapshot_id("ev")
        sid, dropped = cat.expire_partitions_before("ev", "day", "2024-01-01")
        assert (sid, dropped) == (None, [])
        assert cat.last_snapshot_id("ev") == head  # no empty commit

    def test_full_ttl_lifecycle_reclaims_disk(self, spark):
        # retention drop -> history expiry -> the dropped partition's
        # physical files are gone, survivors still read correctly.
        cat = _cat()
        cat.append(_events(spark), "ev", partition_by=["day"])
        pre_files = _files(cat, "ev")
        old = [f for f in pre_files if "day=2024-01-01" in f]
        cat.expire_partitions_before("ev", "day", "2024-01-02")
        res = cat.expire_snapshots("ev", keep_last=1)
        assert res["deleted_files"] == len(old)
        assert all(not os.path.exists(f) for f in old)
        assert cat.read(spark, "ev").count() == 15

    def test_stats_carry_over(self, spark):
        # manifest [min,max] stats on kept files survive the drop —
        # retention must not disable pruning on the survivors.
        cat = _cat()
        cat.append(
            _events(spark), "ev", partition_by=["day"], cluster_by=["n"]
        )
        sid0 = cat.last_snapshot_id("ev")
        had = {
            f
            for g in cat._groups("ev", sid0)
            for f in g.get("stats", {})
            if "day=2024-01-01" not in f
        }
        assert had, "precondition: clustered write recorded stats"
        cat.drop_partitions("ev", "day", ["2024-01-01"])
        sid1 = cat.last_snapshot_id("ev")
        kept = {
            f for g in cat._groups("ev", sid1) for f in g.get("stats", {})
        }
        assert kept == had
