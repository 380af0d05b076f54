"""Small-file compaction (LocalCatalog.compact +
streaming.maintenance.compact_table) — the Iceberg rewrite_data_files
analog a streaming sink needs.

Gates: content unchanged; file counts actually drop; untouched
partitions carry over the SAME physical files (metadata-only);
history preserved (rollback to pre-compaction works); the live
stream_agg sink still accepts upserts after compaction and reads the
merged truth.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.streaming.maintenance import compact_table


def _rows(spark, n, month):
    return spark.range(n).select(
        F.col("id"),
        F.lit(month).alias("m"),
        (F.col("id") % 7).alias("v"),
    )


@pytest.fixture()
def fragmented(spark, tmp_path):
    """A partitioned table built by 6 small appends across 2 months."""
    cat = LocalCatalog(str(tmp_path / "wh"))
    for i in range(6):
        cat.append(
            _rows(spark, 10, "202401" if i % 2 == 0 else "202402"),
            "t",
            partition_by=["m"],
        )
    return cat


def _content(spark, cat, table):
    return sorted(
        map(tuple, cat.read(spark, table).select("id", "m", "v").collect())
    )


def test_compact_partitions_reduces_files_keeps_content(spark, fragmented):
    cat = fragmented
    before = _content(spark, cat, "t")
    counts0 = cat.partition_file_counts("t", "m")
    assert all(n >= 3 for n in counts0.values()), counts0
    frag = cat.fragmented_partitions("t", "m", min_files=3)
    assert frag == ["202401", "202402"]
    pre_sid = cat.last_snapshot_id("t")

    cat.compact(spark, "t", "m", frag)
    counts1 = cat.partition_file_counts("t", "m")
    assert all(counts1[v] < counts0[v] for v in frag), (counts0, counts1)
    assert _content(spark, cat, "t") == before

    # history preserved: the pre-compaction snapshot still reads
    assert sorted(
        map(
            tuple,
            cat.read(spark, "t", snapshot_id=pre_sid)
            .select("id", "m", "v")
            .collect(),
        )
    ) == before
    # and rollback works
    cat.rollback("t", pre_sid)
    assert _content(spark, cat, "t") == before


def test_compact_scoped_partition_carries_others_metadata_only(spark, fragmented):
    cat = fragmented
    sid = cat.last_snapshot_id("t")
    files_before = {
        f
        for g in cat._groups("t", sid)
        for f in g["files"]
        if "m=202402" in f.split(os.sep)
    }
    cat.compact(spark, "t", "m", ["202401"])
    sid2 = cat.last_snapshot_id("t")
    files_after = {
        f
        for g in cat._groups("t", sid2)
        for f in g["files"]
        if "m=202402" in f.split(os.sep)
    }
    assert files_after == files_before  # untouched partition: same files


def test_compact_whole_table_with_clustering(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    for _ in range(5):
        cat.append(_rows(spark, 20, "x"), "u")
    before = _content(spark, cat, "u")
    n0 = sum(cat.partition_file_counts("u", "m").values())
    cat.compact(spark, "u", cluster_by=["id"])
    n1 = sum(cat.partition_file_counts("u", "m").values())
    assert n1 < n0
    assert _content(spark, cat, "u") == before


def test_compact_live_agg_sink_then_upsert(spark, tmp_path):
    """Compaction composes with the streaming agg sink: upserts before
    and after compaction, truth never changes except by the upserts."""
    from logzilla_spark.streaming.stream_pipeline import upsert_agg_batch

    cat = LocalCatalog(str(tmp_path / "wh"))

    def batch(n, day):
        return spark.range(n).select(
            F.to_timestamp(F.lit(f"2024-01-0{day} 00:00:00")).alias("window_start"),
            F.to_timestamp(F.lit(f"2024-01-0{day} 01:00:00")).alias("window_end"),
            F.lit("json").alias("category"),
            F.concat(F.lit("L"), (F.col("id") % 3).cast("string")).alias("level"),
            F.lit(n).alias("n"),
        ).distinct()

    for i in range(1, 5):
        upsert_agg_batch(spark, cat, batch(10 + i, 1 + (i % 2)), batch_id=i)
    before = sorted(map(tuple, cat.read(spark, "stream_agg").collect()))
    touched = compact_table(spark, cat, "stream_agg", "agg_month", min_files=2)
    assert touched, "nothing compacted — fixture too small"
    assert sorted(map(tuple, cat.read(spark, "stream_agg").collect())) == before
    # the sink keeps working after compaction
    assert upsert_agg_batch(spark, cat, batch(99, 3), batch_id=9)
    after = cat.read(spark, "stream_agg")
    assert after.filter(F.col("n") == 99).count() == 3


def test_retention_sweep_on_live_agg_sink(spark, tmp_path):
    """Retention composes with the streaming agg sink: old months age
    out metadata-only, later epochs touching other months never
    resurrect them."""
    from logzilla_spark.streaming.maintenance import retention_sweep
    from logzilla_spark.streaming.stream_pipeline import upsert_agg_batch

    cat = LocalCatalog(str(tmp_path / "wh"))

    def batch(n, month, day=1):
        return spark.range(n).select(
            F.to_timestamp(
                F.lit(f"2024-{month:02d}-{day:02d} 00:00:00")
            ).alias("window_start"),
            F.to_timestamp(
                F.lit(f"2024-{month:02d}-{day:02d} 01:00:00")
            ).alias("window_end"),
            F.lit("json").alias("category"),
            F.concat(F.lit("L"), (F.col("id") % 3).cast("string")).alias("level"),
            F.lit(n).alias("n"),
        ).distinct()

    upsert_agg_batch(spark, cat, batch(5, 1), batch_id=0)   # 202401
    upsert_agg_batch(spark, cat, batch(6, 2), batch_id=1)   # 202402
    upsert_agg_batch(spark, cat, batch(7, 3), batch_id=2)   # 202403

    sid, dropped = retention_sweep(cat, "stream_agg", "agg_month", "202403")
    assert dropped == ["202401", "202402"]
    months = {
        r["agg_month"]
        for r in cat.read(spark, "stream_agg").select("agg_month").distinct().collect()
    }
    assert {str(m) for m in months} == {"202403"}

    # a later epoch touching only a NEW month leaves the sweep intact
    assert upsert_agg_batch(spark, cat, batch(8, 4), batch_id=3)
    months = {
        str(r["agg_month"])
        for r in cat.read(spark, "stream_agg").select("agg_month").distinct().collect()
    }
    assert months == {"202403", "202404"}

    # nothing left to sweep below the same cutoff
    assert retention_sweep(cat, "stream_agg", "agg_month", "202403") == (None, [])


def test_maintenance_cycle_on_live_agg_sink(spark, tmp_path):
    """The nightly cycle (retention -> compaction -> snapshot expiry ->
    orphan cleanup) over a live agg sink: content stays exactly the
    post-retention truth, dropped + superseded files are reclaimed from
    disk, and the sink keeps accepting upserts afterwards."""
    import os

    from logzilla_spark.streaming.maintenance import maintenance_cycle
    from logzilla_spark.streaming.stream_pipeline import upsert_agg_batch

    cat = LocalCatalog(str(tmp_path / "wh"))

    def batch(n, month, day=1):
        return spark.range(n).select(
            F.to_timestamp(
                F.lit(f"2024-{month:02d}-{day:02d} 00:00:00")
            ).alias("window_start"),
            F.to_timestamp(
                F.lit(f"2024-{month:02d}-{day:02d} 01:00:00")
            ).alias("window_end"),
            F.lit("json").alias("category"),
            F.concat(F.lit("L"), (F.col("id") % 3).cast("string")).alias("level"),
            F.lit(n).alias("n"),
        ).distinct()

    # fragment month 202402 with several epochs; month 202401 is old
    upsert_agg_batch(spark, cat, batch(5, 1), batch_id=0)
    for i in range(1, 5):
        upsert_agg_batch(spark, cat, batch(5 + i, 2, day=i), batch_id=i)
    pre_files = {
        f
        for g in cat._groups("stream_agg", cat.last_snapshot_id("stream_agg"))
        for f in g["files"]
    }
    expect = sorted(
        map(tuple, cat.read(spark, "stream_agg")
            .filter(F.col("agg_month") != "202401").collect())
    )

    rep = maintenance_cycle(
        spark, cat, "stream_agg",
        partition_by="agg_month",
        retention_cutoff="202402",
        min_files=2,
        keep_last_snapshots=1,
        orphan_age_seconds=0.0,
    )
    assert rep["retention_dropped"] == ["202401"]
    assert rep["compacted"], "fixture should have fragmented partitions"
    assert rep["snapshots"]["expired"]

    got = sorted(map(tuple, cat.read(spark, "stream_agg").collect()))
    assert got == expect
    # dropped month's physical files are gone from disk
    old = [f for f in pre_files if "agg_month=202401" in f]
    assert old and all(not os.path.exists(f) for f in old)
    # exactly-once bookkeeping SURVIVED the cycle: maintenance commits
    # carry the cumulative committed map forward, so even though
    # expire_snapshots deleted every map-bearing streaming manifest, a
    # replayed old epoch is still refused (no double count)
    assert upsert_agg_batch(spark, cat, batch(5 + 2, 2, day=2), batch_id=2) is False
    # and the sink keeps working after the full cycle
    assert upsert_agg_batch(spark, cat, batch(99, 3), batch_id=9)
    assert cat.read(spark, "stream_agg").filter(F.col("n") == 99).count() == 3
