"""G3 — routing fan-out: parsed records -> per-category sink tables.

The reference routes each raw record to a processor chain keyed by its
source tag (reference: engine/processor.go:84-95) and lands everything
in one table; the graft extends this to fan parsed rows out to one sink
table per parsed ``category`` (SURVEY.md §2.5 G3) with two invariants
(BASELINE.json north_rule):

- set equality: union of all sinks == the parsed record set;
- disjointness: sinks are pairwise disjoint on ``id``.

Single-pass guarantee: the parsed DataFrame is materialized exactly once
(``persist``), then each sink write is a filter over the cached data —
upstream parse/enrich run once no matter how many categories exist.
At cluster scale the same shape holds (cache in memory/disk, or write a
single category-partitioned staging table and copy per-partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..schemas import CATEGORIES
from ..sources.catalog import LocalCatalog


def sink_name(category: str) -> str:
    return f"sink_{category}"


def route_to_sinks(
    records: DataFrame,
    catalog: LocalCatalog,
    categories: list[str] | None = None,
    run_id: str | None = None,
    materialized: bool = False,
) -> dict[str, int]:
    """Fan records out to per-category sinks; returns snapshot id per sink.

    One upstream materialization; per-category writes are cached-filter
    scans. Unknown categories (not in ``categories``) would be silently
    dropped — callers pass the closed routing domain (CATEGORIES).

    ``materialized=True``: caller already persisted+materialized the
    frame (and owns its unpersist) — skips the extra count action.
    """
    categories = categories or CATEGORIES
    if not materialized:
        records = records.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        if not materialized:
            records.count()  # materialize once
        snaps: dict[str, int] = {}
        for cat in categories:
            part = records.filter(F.col("category") == cat)
            snaps[cat] = catalog.append(
                part, sink_name(cat), summary={"run_id": run_id, "category": cat}
            )
        return snaps
    finally:
        if not materialized:
            records.unpersist()


def write_partitioned_tables(
    df: DataFrame,
    catalog: LocalCatalog,
    partition_col: str,
    table_for,
    values: list[str],
    summary_for=None,
    cluster_by: list[str] | None = None,
) -> dict[str, int]:
    """ONE ``partitionBy`` write fanning rows out to many tables.

    The upstream plan executes exactly once; the writer splits rows
    into ``<partition_col>=<v>/`` directories as a side effect of the
    single write, and each table then commits its directory's files
    metadata-only (Iceberg ``add_files`` analog) — no cache build, no
    per-value re-scan, no second data pass. This is the fan-out shape
    that survives 100 TB: N destination tables cost one shuffle-free
    write, not N jobs.

    Returns {value: snapshot_id}. Values absent from the data still
    get a (file-less) snapshot so the table exists.
    """
    import glob
    import os
    import uuid as _uuid

    staging = os.path.join(catalog.warehouse, "_routed", _uuid.uuid4().hex)
    if cluster_by:
        # opt-in data clustering (the MergeTree ORDER BY / Iceberg
        # write.sort-order analog — see LocalCatalog._stage_write):
        # range-partition on (partition_col, *cluster_by) so each task
        # owns one destination's contiguous key slice, then sort. Costs
        # ONE range exchange at write time; buys disjoint parquet
        # min/max footers per file, i.e. file/row-group skipping for
        # every future range read (the search path's mandatory ts
        # range). Without it the write is shuffle-free.
        df = df.repartitionByRange(
            partition_col, *cluster_by
        ).sortWithinPartitions(partition_col, *cluster_by)
    df.write.partitionBy(partition_col).parquet(staging)
    snaps: dict[str, int] = {}
    for v in values:
        files = sorted(
            glob.glob(os.path.join(staging, f"{partition_col}={v}", "*.parquet"))
        )
        summary = summary_for(v) if summary_for else {}
        snaps[v] = catalog.append_external(
            table_for(v), files, base_path=staging, summary=summary
        )
    return snaps


def route_to_sinks_single_pass(
    records: DataFrame,
    catalog: LocalCatalog,
    categories: list[str] | None = None,
    run_id: str | None = None,
    summary_extra: dict | None = None,
    cluster_by: list[str] | None = None,
) -> dict[str, int]:
    """True single-pass fan-out to the per-category sinks (G3).

    ``cluster_by=["source", "timestamp"]`` additionally clusters each
    sink's files on the reference's MergeTree sort key (one range
    exchange; see write_partitioned_tables)."""
    categories = categories or CATEGORIES
    return write_partitioned_tables(
        records,
        catalog,
        "category",
        sink_name,
        categories,
        summary_for=lambda c: {
            "run_id": run_id, "category": c, **(summary_extra or {})
        },
        cluster_by=cluster_by,
    )


def read_all_sinks(
    spark: SparkSession, catalog: LocalCatalog, categories: list[str] | None = None
) -> DataFrame:
    """Union of every sink table (for the set-equality invariant)."""
    from ..sources.catalog import SnapshotError

    categories = categories or CATEGORIES
    dfs = []
    for c in categories:
        if not catalog.exists(sink_name(c)):
            continue
        try:
            dfs.append(catalog.read(spark, sink_name(c)))
        except SnapshotError:
            continue  # committed but empty (category saw no rows)
    if not dfs:
        raise ValueError("no sinks committed")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out
