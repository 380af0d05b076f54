"""G4/G5 — windowed group-by aggregate counts, with a salted two-phase twin.

The reference has NO aggregation operator (verified, SURVEY.md §2.4) —
its README promises one; the graft mandates tumbling-window counts per
sink (BASELINE.json north_rule). Implemented with the built-in
``F.window`` tumbling window + hash aggregation: Catalyst plans a
partial (map-side) aggregate before the shuffle, so the shuffled data
is one row per (window, category, level, lang) per input partition —
already skew-resistant for counts.

``windowed_counts_salted`` makes the two-phase shape explicit for hot
keys (5% of pages share 3 hot hosts; `en` is 40% of rows): a salt
column splits each hot group across ``n_salts`` reducers, then a second
exact aggregate removes the salt. For plain counts Spark's partial agg
already achieves this; the salted operator exists for aggregates where
partial aggregation is weaker (e.g. large collect-type states) and to
make the skew story testable/explainable — both versions must return
identical results (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WINDOW = "1 hour"


def windowed_counts(
    records: DataFrame,
    window: str = DEFAULT_WINDOW,
    time_col: str = "warc_ts",
    keys: tuple[str, ...] = ("category", "level", "lang"),
) -> DataFrame:
    """Tumbling-window counts per key — the G4 aggregate.

    Output: window_start, window_end, *keys, n.
    """
    w = F.window(F.col(time_col), window)
    return (
        records.groupBy(w.alias("w"), *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n",
        )
    )


def windowed_counts_salted(
    records: DataFrame,
    window: str = DEFAULT_WINDOW,
    time_col: str = "warc_ts",
    keys: tuple[str, ...] = ("category", "level", "lang"),
    n_salts: int = 16,
    salt_source: str = "url",
) -> DataFrame:
    """Two-phase salted aggregate: partial per (keys, salt), then final.

    Phase 1 shuffles on (window, keys, salt) — a hot key fans out over
    ``n_salts`` reducers; phase 2 combines the (tiny) partials exactly.
    """
    w = F.window(F.col(time_col), window)
    salted = records.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts))
    )
    partial = (
        salted.groupBy(w.alias("w"), *keys, F.col("_salt"))
        .agg(F.count(F.lit(1)).alias("pn"))
    )
    return (
        partial.groupBy("w", *keys)
        .agg(F.sum("pn").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            "n",
        )
    )
