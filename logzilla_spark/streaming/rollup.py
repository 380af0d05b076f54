"""Continuous-aggregate rollup cascade: incremental fine -> coarse
aggregate maintenance over committed catalog tables.

The Timescale continuous-aggregate / Druid rollup shape the reference
lacks (SURVEY.md §2.4 — no aggregation at all): the streaming agg sink
(stream_pipeline.start_agg_stream) maintains a FINE windowed-count
table; this module folds it into coarser granularities (hour -> day ->
month) so dashboard-range queries read days, not a year of minutes.

Incrementality is SNAPSHOT-DELTA driven, not timer driven: a refresh
diffs the fine table's committed file lists between the last-rolled
snapshot (recorded in the coarse table's commit summary) and the head,
reads ONLY the added files to learn which coarse buckets changed, then
recomputes exactly those buckets from the fine head state and swaps
them in (delete + append, both snapshot commits). Consequences:

- cost per refresh ~ O(new fine files + changed buckets), never
  O(table age) — the property that keeps a year-old rollup cheap;
- UPSERTED fine tables are handled correctly: an overwritten
  partition's files are "added" in the diff, so late-data corrections
  reroll their coarse bucket (a pure read_incremental cursor would
  either miss them or double count);
- replay-safe without a committed-map: the recompute is a pure
  function of the fine HEAD state, so re-running a refresh (crash
  between its delete and append, double trigger) converges to the
  same rows — idempotence by recomputation, where the agg sink needs
  its map because its folds are not recomputations (T29's lesson);
- compaction of the fine table rerolls the compacted buckets
  spuriously but harmlessly (same values — verified by test).

Serving (`serve_range`) answers a time-range count query from the
cascade: whole coarse buckets from the rollup, the ragged edges from
the fine table — the classic materialized-rollup read path.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import LocalCatalog

_ROLLUP_LOCKS: dict[tuple[str, str], threading.Lock] = {}
_ROLLUP_LOCKS_GUARD = threading.Lock()

_MARK = "rollup_fine_snapshot"


def _lock(cat: LocalCatalog, table: str) -> threading.Lock:
    key = (cat.warehouse, table)
    with _ROLLUP_LOCKS_GUARD:
        return _ROLLUP_LOCKS.setdefault(key, threading.Lock())


def _last_rolled(cat: LocalCatalog, coarse_table: str) -> int | None:
    """Newest fine-snapshot marker in the coarse table's history (the
    walk skips the paired delete commits, which carry no marker)."""
    sid = cat.last_snapshot_id(coarse_table)
    while sid is not None and sid >= 1:
        mark = cat.snapshot_summary(coarse_table, sid).get(_MARK)
        if mark is not None:
            return int(mark)
        sid -= 1
    return None


def _files_at(cat: LocalCatalog, table: str, sid: int | None) -> set[str]:
    if sid is None:
        return set()
    return {f for g in cat._groups(table, sid) for f in g["files"]}


def refresh_rollup(
    spark: SparkSession,
    cat: LocalCatalog,
    fine_table: str,
    coarse_table: str,
    coarse: str = "1 day",
    dims: tuple[str, ...] = ("category", "level"),
) -> dict:
    """One incremental maintenance step; safe to call on any cadence.

    Fine-table contract: columns ``window_start``/``window_end``,
    ``dims``, and an additive count ``n`` (the agg-sink shape), with
    fine windows aligned inside coarse buckets. Returns
    {"changed_buckets": k, "fine_snapshot": sid} (k = 0 -> no commit).
    """
    with _lock(cat, coarse_table):
        head = cat.last_snapshot_id(fine_table)
        if head is None:
            return {"changed_buckets": 0, "fine_snapshot": None}
        last = _last_rolled(cat, coarse_table)
        new_files = sorted(
            _files_at(cat, fine_table, head) - _files_at(cat, fine_table, last)
        )
        if not new_files:
            return {"changed_buckets": 0, "fine_snapshot": head}

        # which coarse buckets did the delta touch? (driver-side list:
        # bounded by refresh cadence x bucket width, metadata-scale)
        delta = spark.read.parquet(*new_files)
        bucket = F.window(F.col("window_start"), coarse)
        spans = [
            (r.b, r.e)
            for r in delta.select(
                bucket.start.alias("b"), bucket.end.alias("e")
            )
            .distinct()
            .collect()
        ]
        if not spans:
            return {"changed_buckets": 0, "fine_snapshot": head}
        changed = [b for b, _ in spans]

        # recompute the changed buckets from the fine HEAD state (a
        # stats-pruned read when the fine table is clustered/partitioned
        # on window_start) — pruned by the buckets' full [start, end)
        # SPANS, never by their start points alone (a file holding only
        # mid-bucket rows has min > bucket start and must still be read)
        lo, hi = min(changed), max(e for _, e in spans)
        fine = cat.read_stats_pruned(
            spark, fine_table, "window_start", ranges=spans
        )
        if fine is None:
            fine = cat.read(spark, fine_table, snapshot_id=head).limit(0)
        rolled = (
            fine.withColumn("__b", bucket)
            .filter(F.col("__b.start").isin(changed))
            .groupBy(F.col("__b").alias("w"), *dims)
            .agg(F.sum("n").alias("n"))
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                *dims,
                "n",
            )
        )
        if cat.last_snapshot_id(coarse_table) is not None:
            ts_list = ", ".join(
                f"TIMESTAMP '{b.strftime('%Y-%m-%d %H:%M:%S')}'" for b in changed
            )
            cat.delete_where(
                spark,
                coarse_table,
                f"window_start IN ({ts_list})",
                prune_column="window_start",
                prune_ranges=[(lo, hi)],
            )
        cat.append(
            rolled,
            coarse_table,
            summary={_MARK: head, "changed_buckets": len(changed)},
            cluster_by=["window_start"],
        )
        return {"changed_buckets": len(changed), "fine_snapshot": head}


def serve_range(
    spark: SparkSession,
    cat: LocalCatalog,
    fine_table: str,
    coarse_table: str,
    start,
    end,
    coarse: str = "1 day",
    dims: tuple[str, ...] = ("category", "level"),
) -> DataFrame:
    """Total count per ``dims`` over [start, end): whole coarse buckets
    come from the rollup table, the ragged edges from the fine table —
    at a year of range that is ~365 coarse rows + <=2 buckets of fine
    rows instead of 8760 fine ones, and at 100 TB the coarse read
    prunes to a handful of files via its window_start clustering.

    Contract: refresh_rollup has run since the fine table's last
    commit — a fully-covered bucket missing from a LAGGING rollup
    would silently under-count (tested; the composition in
    __spark_entry__._q_rollup_serve refreshes first)."""
    # coarse span: every fully-covered bucket comes from the rollup
    cdf = cat.read_stats_pruned(
        spark, coarse_table, "window_start", ranges=[(start, end)]
    )
    parts = []
    if cdf is not None:
        parts.append(
            cdf.filter(
                (F.col("window_start") >= F.lit(start))
                & (F.col("window_end") <= F.lit(end))
            ).select(*dims, "n")
        )
    # ragged edges from the fine table: rows inside [start, end) whose
    # coarse bucket is NOT fully covered by the range
    fdf = cat.read_stats_pruned(
        spark, fine_table, "window_start", ranges=[(start, end)]
    )
    if fdf is not None:
        b = F.window(F.col("window_start"), coarse)
        parts.append(
            fdf.filter(
                (F.col("window_start") >= F.lit(start))
                & (F.col("window_end") <= F.lit(end))
                & ((b.start < F.lit(start)) | (b.end > F.lit(end)))
            ).select(*dims, "n")
        )
    if not parts:
        raise ValueError("serve_range: no committed data in range")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.groupBy(*dims).agg(F.sum("n").alias("n"))
