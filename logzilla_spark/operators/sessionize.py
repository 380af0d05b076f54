"""Sessionization: gap-based session windows over an event stream.

The reference has no session concept (SURVEY.md §2.4 — no windowing of
any kind); this is part of the graft's windowed-aggregate family (G4)
using Spark's built-in ``F.session_window`` — the dynamic-gap sibling
of the tumbling ``F.window`` used by operators/aggregate.py.

Semantics (Spark's, made explicit so the oracle can mirror them):
an event at time t extends its session's window to [start, t + gap);
the next event joins the same session iff its timestamp is strictly
inside that window, i.e. iff ``ts - prev_ts < gap``. Session output:
start = first event time, end = last event time + gap.

Plan shape: one shuffle on the grouping keys, then per-key in-partition
window merging — the same cost as any groupBy at 100 TB, with AQE skew
splitting for hot keys. In streaming mode the identical expression runs
with a watermark (session state evicted once the watermark passes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_GAP = "30 minutes"


def sessionize(
    events: DataFrame,
    gap: str = DEFAULT_GAP,
    time_col: str = "ts",
    keys: tuple[str, ...] = ("user_id",),
    value_col: str | None = "value",
) -> DataFrame:
    """Events -> one row per (keys, session): bounds, count, exact sum.

    Output: *keys, session_start, session_end (last event + gap),
    n_events, sum_value (decimal-exact, cast to double).
    """
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(
            F.sum(F.col(value_col).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value")
        )
    return (
        events.groupBy(F.session_window(F.col(time_col), gap).alias("sw"), *keys)
        .agg(*aggs)
        .select(
            *keys,
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            *(["sum_value"] if value_col is not None else []),
        )
    )


def sessionize_sql(
    relation: str = "events",
    gap_minutes: int = 30,
    time_col: str = "ts",
    key: str = "user_id",
    value_col: str = "value",
) -> str:
    """ANSI-SQL twin (gaps-and-islands) for the DuckDB oracle.

    A new island starts when ``ts - prev_ts >= gap`` (mirrors Spark's
    strict session_window boundary; an event landing exactly at
    prev_ts + gap begins a NEW session).
    """
    return f"""
WITH flagged AS (
    SELECT {key}, {time_col}, {value_col},
           CASE WHEN {time_col} - LAG({time_col}) OVER w >= INTERVAL {gap_minutes} MINUTE
                     OR LAG({time_col}) OVER w IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM {relation}
    WINDOW w AS (PARTITION BY {key} ORDER BY {time_col})
),
islands AS (
    SELECT *, SUM(new_session) OVER (
        PARTITION BY {key} ORDER BY {time_col}
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS session_no
    FROM flagged
)
SELECT {key},
       MIN({time_col}) AS session_start,
       MAX({time_col}) + INTERVAL {gap_minutes} MINUTE AS session_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST({value_col} AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM islands
GROUP BY {key}, session_no
"""
