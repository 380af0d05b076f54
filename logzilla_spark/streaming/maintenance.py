"""Sink maintenance: small-file compaction for live streaming tables.

Every micro-batch of the agg / HLL / routing sinks commits at least
one new data file per touched partition, so file counts grow linearly
with epoch count — at 100 TB-scale trigger rates the listing/open cost
eventually dominates reads (the classic streaming small-file problem;
Iceberg answers it with rewrite_data_files, this module with
``LocalCatalog.compact``). The composition rule is the lock:
compaction read-rewrites the same partitions a live upsert merges, so
it takes the SAME per-(warehouse, table) lock the streaming sinks use
— the rewrite and the epoch merge serialize, and neither loses rows.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.streaming.stream_pipeline import _upsert_lock


def compact_table(
    spark: SparkSession,
    cat: LocalCatalog,
    table: str,
    partition_by: str | None = None,
    min_files: int = 8,
    cluster_by: list[str] | None = None,
) -> dict[str, int] | int | None:
    """Compact a (possibly live) sink table under the streaming upsert
    lock.

    Partitioned tables compact ONLY the fragmented partitions
    (>= ``min_files`` files) — one partition-scoped rewrite, all other
    files carried over metadata-only; returns {partition: new file
    count} for the touched set, or None if nothing is fragmented.
    Unpartitioned tables compact whole (returns the new snapshot id).
    """
    with _upsert_lock(cat, table):
        if partition_by is None:
            return cat.compact(spark, table, cluster_by=cluster_by)
        frag = cat.fragmented_partitions(table, partition_by, min_files)
        if not frag:
            return None
        cat.compact(spark, table, partition_by, frag)
        after = cat.partition_file_counts(table, partition_by)
        return {v: after[v] for v in frag}


def retention_sweep(
    cat: LocalCatalog,
    table: str,
    partition_by: str,
    cutoff: str,
) -> tuple[int | None, list[str]]:
    """Age out a (possibly live) sink table's old partitions under the
    streaming upsert lock.

    The lock matters: an unserialized sweep can race a live keyed merge
    of the SAME partition — the upsert read the pre-drop snapshot, so
    its overwrite_partitions would re-commit the partition's merged OLD
    rows and silently undo the retention. Serialized, the sweep and the
    epoch merge order cleanly either way. Pick a cutoff comfortably
    older than the stream's watermark horizon: a late-but-in-watermark
    row for an already-swept window re-enters the table as a fresh
    partition (correct per the merge semantics, surprising per
    retention intent).
    """
    with _upsert_lock(cat, table):
        return cat.expire_partitions_before(table, partition_by, cutoff)


def maintenance_cycle(
    spark: SparkSession,
    cat: LocalCatalog,
    table: str,
    partition_by: str | None = None,
    retention_cutoff: str | None = None,
    min_files: int = 8,
    keep_last_snapshots: int = 2,
    orphan_age_seconds: float = 3600.0,
    cluster_by: list[str] | None = None,
) -> dict:
    """One nightly maintenance pass over a (possibly live) table — the
    cycle every table-format deployment schedules (Iceberg's
    expire_snapshots + rewrite_data_files + remove_orphan_files, plus
    retention), in the one order that avoids wasted work:

    1. retention first (needs ``partition_by`` + ``retention_cutoff``)
       — dropping doomed partitions BEFORE compaction means the
       rewrite never compacts data about to be deleted;
    2. small-file compaction of what survives;
    3. snapshot expiry — reclaims the files steps 1-2 superseded
       (``keep_last_snapshots`` >= 2 keeps one pre-cycle snapshot for
       a same-day rollback);
    4. orphan-file cleanup (age-guarded; crash leftovers).

    Each step takes the streaming upsert lock itself, so the cycle
    interleaves safely with live sinks (epochs may land BETWEEN steps
    — each step is individually correct against the head snapshot).
    Returns a report dict; steps skipped for lack of parameters or
    work report None/empty.
    """
    report: dict = {"table": table}
    if retention_cutoff is not None:
        if partition_by is None:
            raise ValueError("retention_cutoff requires partition_by")
        _sid, dropped = retention_sweep(
            cat, table, partition_by, retention_cutoff
        )
        report["retention_dropped"] = dropped
    report["compacted"] = compact_table(
        spark, cat, table, partition_by, min_files, cluster_by
    )
    with _upsert_lock(cat, table):
        report["snapshots"] = cat.expire_snapshots(
            table, keep_last=max(keep_last_snapshots, 1)
        )
    report["orphans_removed"] = len(
        cat.remove_orphan_files(table, older_than_seconds=orphan_age_seconds)
    )
    return report
