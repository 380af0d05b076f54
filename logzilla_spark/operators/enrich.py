"""G2 — broadcast-hash-join enrichment against dimension tables.

The reference stores `level` as a ClickHouse Enum8 and `source` as a
plain tag; the graft replaces the enum with a severity dimension and
adds a language dimension (SURVEY.md §2.5 G2, FIXTURES.md §2). Both
dims are tiny, so the joins are explicit ``F.broadcast`` hash joins —
no shuffle of the fact side, which is the only plan that survives at
100 TB (a sort-merge join here would shuffle the whole record stream).

Left joins: pages.lang values missing from dim_lang produce NULL
lang_name/lang_family (tested via the two unmatched dim codes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_records(records: DataFrame, dim_lang: DataFrame, dim_severity: DataFrame) -> DataFrame:
    """records + lang dim + severity dim via broadcast hash joins."""
    return records.join(
        F.broadcast(dim_lang), on="lang", how="left"
    ).join(F.broadcast(dim_severity), on="level", how="left")


def join_dim_file_pruned(
    spark,
    catalog,
    name: str,
    column: str,
    dim: DataFrame,
    dim_key: str,
    max_keys: int = 100_000,
) -> DataFrame:
    """Dynamic file pruning for a fact ⋈ small-dim join (the Iceberg/
    Photon DPP shape, pushed to FILE granularity): materialize the
    dim's distinct join keys driver-side (metadata-scale — the same
    collect Spark itself performs for a dynamic-partition-pruning
    subquery broadcast), prune the catalog table's committed file list
    through manifest min/max + bloom sidecars with those keys as
    points, then broadcast-hash-join only the surviving files.

    At 100 TB this is the difference between scanning the whole fact
    table to satisfy a 50-key lookup join and reading the handful of
    files that can possibly hold those keys — no shuffle of the fact
    side either way (the dim broadcasts), the win is pure scan IO.

    Degrades to correct: past ``max_keys`` distinct keys (or when the
    table carries no stats/blooms) every file is read and the join
    result is identical, just unpruned. Inner-join semantics."""
    # NULL dim keys never match an inner join -> excluded from the
    # point set (a None point would disable pruning entirely)
    keys = [
        r[0]
        for r in dim.select(dim_key)
        .filter(F.col(dim_key).isNotNull())
        .distinct()
        .limit(max_keys + 1)
        .collect()
    ]
    if not keys:  # empty dim -> empty inner join, no fact IO at all
        fact = catalog.read(spark, name).limit(0)
    elif len(keys) > max_keys:
        fact = catalog.read(spark, name)
    else:
        fact = catalog.read_stats_pruned(spark, name, column, points=keys)
        if fact is None:  # every file proven irrelevant -> empty join
            fact = catalog.read(spark, name).limit(0)
    return fact.join(F.broadcast(dim), fact[column] == dim[dim_key], "inner")
