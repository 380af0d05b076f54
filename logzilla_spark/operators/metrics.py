"""Log-to-metric extraction: numeric fields -> per-key time series.

The bridge every log engine ships between its search surface and its
dashboards (Loki's ``unwrap bytes | quantile_over_time``, Splunk's
``timechart p95(size) by host``): take a numeric field already
extracted by the parse chain (m_size, m_status, a latency), bucket by
event time, and emit per-(key, bucket) count / sum / min / max / mean
plus exact discrete quantiles.

100 TB shape: ONE corpus scan feeding ONE groupBy on the composite
(key, bucket, value) — map-side partial aggregation collapses the
corpus to distinct-value counts before the shuffle, so the shuffle
carries the value histogram, not rows.  The quantile pass then runs on
that histogram: a window partitioned by (key, bucket) whose state is
bounded by the distinct values in the bucket (metadata scale), never a
global window and never a second corpus scan.  No approx sketch on this
path by design — `approx_percentile` is neither mergeable across
engines nor bit-stable, and the histogram rewrite makes the EXACT
quantile affordable; the sketch alternative for unbounded-cardinality
values is the t-digest-class operator, intentionally out of scope.

Cross-engine exactness: quantiles use the explicit discrete rule
``p_q = min(value : den * cum_count >= num * n)`` with the quantile a
rational num/den — pure BIGINT comparisons, no float rank math; the
only float in the output is ``v_avg = sum/count``, a single IEEE
division.  The DuckDB twin states the same rule literally instead of
trusting ``quantile_disc`` to share a tie/interpolation convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "extract_metrics",
    "metrics_from_histogram",
    "extract_metrics_sql",
    "DEFAULT_QUANTILES",
]

# name -> (num, den): quantile q = num/den, exact rational
DEFAULT_QUANTILES: dict[str, tuple[int, int]] = {
    "p50": (1, 2),
    "p95": (19, 20),
}


def extract_metrics(
    df: DataFrame,
    value_col: str,
    key_col: str,
    ts_col: str = "timestamp",
    bucket: str = "hour",
    quantiles: dict[str, tuple[int, int]] = DEFAULT_QUANTILES,
) -> DataFrame:
    """Per-(key, time-bucket) metric series from a numeric log field.

    ``value_col`` is coerced with try_cast (ANSI-safe): rows with NULL
    key, ts, or a missing/unparseable value are excluded — a row that
    lacks the field is not a zero-valued sample.  Output: ``key,
    bucket, cnt, v_sum, v_min, v_max, v_avg`` + one BIGINT column per
    requested quantile.
    """
    for name, (num, den) in quantiles.items():
        if not (0 < num <= den):
            raise ValueError(f"quantile {name}: need 0 < num <= den, got {num}/{den}")
    base = df.select(
        F.col(key_col).alias("key"),
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        F.col(value_col).try_cast("bigint").alias("v"),
    ).where(
        F.col("key").isNotNull()
        & F.col("bucket").isNotNull()
        & F.col("v").isNotNull()
    )
    # histogram: corpus collapses to distinct (key, bucket, value)
    hist = base.groupBy("key", "bucket", "v").agg(
        F.count(F.lit(1)).alias("c")
    )
    return metrics_from_histogram(hist, quantiles)


def metrics_from_histogram(
    hist: DataFrame,
    quantiles: dict[str, tuple[int, int]] = DEFAULT_QUANTILES,
) -> DataFrame:
    """The series/quantile core over a pre-built value HISTOGRAM
    (``key, bucket, v, c`` — the MERGEABLE artifact: histograms union
    by summing counts per cell, which is what lets a streaming sink
    maintain one committed histogram table and serve exact quantiles
    from it). :func:`extract_metrics` is the one corpus-touching
    groupBy composed with this; everything here runs at histogram
    scale (distinct values per bucket), never corpus scale."""
    for name, (num, den) in quantiles.items():
        if not (0 < num <= den):
            raise ValueError(f"quantile {name}: need 0 < num <= den, got {num}/{den}")
    w = Window.partitionBy("key", "bucket").orderBy("v")
    ranked = hist.select(
        "key",
        "bucket",
        "v",
        "c",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("key", "bucket")).alias("n"),
    )
    qcols = [
        F.min(
            F.when(
                F.lit(den) * F.col("cum") >= F.lit(num) * F.col("n"), F.col("v")
            )
        ).alias(name)
        for name, (num, den) in quantiles.items()
    ]
    return ranked.groupBy("key", "bucket").agg(
        F.sum("c").alias("cnt"),
        F.sum(F.col("v") * F.col("c")).alias("v_sum"),
        F.min("v").alias("v_min"),
        F.max("v").alias("v_max"),
        (
            F.sum(F.col("v") * F.col("c")).cast("double")
            / F.sum("c").cast("double")
        ).alias("v_avg"),
        *qcols,
    )


def extract_metrics_sql(
    relation: str,
    value_expr: str,
    key_expr: str,
    ts_expr: str = '"timestamp"',
    bucket: str = "hour",
    quantiles: dict[str, tuple[int, int]] = DEFAULT_QUANTILES,
) -> str:
    """DuckDB twin of :func:`extract_metrics` — same explicit rank rule."""
    qsel = ",\n       ".join(
        f"CAST(min(CASE WHEN {den} * cum >= {num} * n THEN v END) AS BIGINT) AS {name}"
        for name, (num, den) in quantiles.items()
    )
    return f"""
SELECT key, bucket,
       CAST(sum(c) AS BIGINT) AS cnt,
       CAST(sum(v * c) AS BIGINT) AS v_sum,
       CAST(min(v) AS BIGINT) AS v_min,
       CAST(max(v) AS BIGINT) AS v_max,
       CAST(sum(v * c) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS v_avg,
       {qsel}
FROM (
  SELECT key, bucket, v, c,
         sum(c) OVER (PARTITION BY key, bucket ORDER BY v
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY key, bucket) AS n
  FROM (
    SELECT key, bucket, v, CAST(count(*) AS BIGINT) AS c
    FROM (
      SELECT {key_expr} AS key,
             date_trunc('{bucket}', {ts_expr}) AS bucket,
             TRY_CAST({value_expr} AS BIGINT) AS v
      FROM {relation}
    )
    WHERE key IS NOT NULL AND bucket IS NOT NULL AND v IS NOT NULL
    GROUP BY 1, 2, 3
  )
)
GROUP BY 1, 2"""
