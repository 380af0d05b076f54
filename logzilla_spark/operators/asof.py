"""As-of (temporal) join: enrich each left row with the latest
right-side row at-or-before its timestamp, per key.

The reference has no join of any kind (SURVEY.md §2.4 — single-table
search only); this is part of the graft's enrichment family (G2) and
the standard log-analytics primitive Spark's DataFrame API lacks
(pandas has merge_asof, DuckDB/QuestDB have ASOF JOIN, Flink has
temporal joins). Canonical uses: stamp every log event with the config
version / deploy marker / feature flag that was live when it happened.

Algorithm — union-merge carry-forward, NOT a range join:
  1. Tag both sides and union them on (keys, event time, side,
     left-payload?, right-payload?): right rows carry a non-null
     STRUCT of their payload, left rows carry NULL for it.
  2. One window per key ordered by (time, side): the last non-null
     right-struct at-or-before each left row IS its as-of match
     (``F.last(ignorenulls=True)`` over unbounded-preceding..current).
     The struct is load-bearing: carrying value columns individually
     would skip PAST a right row whose value is NULL to an older row —
     the struct is non-null whenever a right ROW exists, so NULL
     payloads match correctly.
  3. Keep left rows, unpack the struct, apply the optional tolerance.

Tie semantics match DuckDB's ``ASOF JOIN .. ON l.ts >= r.ts`` (and
pandas merge_asof allow_exact_matches=True): a right row AT the left
timestamp matches — the right side sorts before the left at equal
times (side 0 < 1). ``allow_exact_matches=False`` flips the right side
to sort AFTER equal-time left rows (side 2 > 1), giving strict ``>``.

Contract: the right side must be unique per (keys, right_time) — the
match at a timestamp must be well-defined. Violations are the caller's
to resolve (e.g. ``groupBy(keys, ts).agg(max_by(...))``); this
operator does not silently pick one.

Scale shape: ONE shuffle of (|L| + |R|) rows on the join keys, then a
per-key in-partition sort — the same cost as any groupBy at 100 TB,
and strictly cheaper than the naive range-join (left x right per key
then argmax) which explodes quadratically per key. The window is
rows-ordered, so Spark streams it without buffering whole partitions.
Skew: one HOT key serializes its merge into a single task (windows
cannot split a partition); for few-key/hot-key workloads pre-bucket by
coarse time (join each bucket to itself + the previous bucket's last
right row) — documented, not automatic, because the detection
threshold is workload-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE_RIGHT_EXACT = 0
_SIDE_LEFT = 1
_SIDE_RIGHT_STRICT = 2


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_time: str = "ts",
    right_time: str = "ts",
    right_cols: list[str] | None = None,
    *,
    matched_time_col: str = "matched_ts",
    allow_exact_matches: bool = True,
    tolerance_s: float | None = None,
) -> DataFrame:
    """Left rows + the latest right row at-or-before ``left_time`` per
    ``keys`` (LEFT OUTER: unmatched left rows keep NULLs).

    Output: every left column, then ``matched_time_col`` (the matched
    right row's ``right_time``) and each of ``right_cols`` under its
    own name. ``tolerance_s`` nulls a match older than the left time
    by more than that many seconds (inclusive bound, like pandas).
    """
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in keys and c != right_time
        ]
    clash = (set(right_cols) | {matched_time_col}) & set(left.columns)
    if clash:
        raise ValueError(
            f"as-of output columns {sorted(clash)!r} collide with left "
            "columns — alias the right side first"
        )

    right_side = _SIDE_RIGHT_EXACT if allow_exact_matches else _SIDE_RIGHT_STRICT
    payload = F.struct(
        F.col(right_time).alias("__t"), *[F.col(c) for c in right_cols]
    )
    left_cols = list(left.columns)
    l_u = left.select(
        *[F.col(c) for c in left_cols],
        F.col(left_time).alias("__asof_ts"),
        F.lit(_SIDE_LEFT).alias("__side"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        ).alias("__r"),
    )
    # right rows carry the join keys (the window partitions on them)
    # and NULL for every other left column; key values cast to the
    # left dtype so the union is well-typed.
    r_u = right.select(
        *[
            (
                F.col(c).cast(left.schema[c].dataType)
                if c in keys
                else F.lit(None).cast(left.schema[c].dataType)
            ).alias(c)
            for c in left_cols
        ],
        F.col(right_time).alias("__asof_ts"),
        F.lit(right_side).alias("__side"),
        payload.alias("__r"),
    )

    w = (
        Window.partitionBy(*keys)
        .orderBy("__asof_ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l_u.unionByName(r_u).withColumn(
        "__m", F.last("__r", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__side") == _SIDE_LEFT)

    match = F.col("__m")
    if tolerance_s is not None:
        tol_us = int(round(tolerance_s * 1_000_000))
        match = F.when(
            F.unix_micros(F.col("__asof_ts")) - F.unix_micros(F.col("__m.__t"))
            <= F.lit(tol_us),
            F.col("__m"),
        )
    return out.select(
        *[F.col(c) for c in left_cols],
        match.getField("__t").alias(matched_time_col),
        *[match.getField(c).alias(c) for c in right_cols],
    )
