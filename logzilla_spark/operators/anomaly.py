"""Rate-anomaly detection: trailing z-score spikes on bucketed volumes.

The alerting primitive behind every log engine's "this source just went
loud" view: bucket the stream per key, zero-fill the gaps, and flag
buckets whose count sits more than ``threshold`` sample standard
deviations above the key's own trailing-window mean (the classic
3-sigma rule over a self-baseline, not a global one — a chatty service
and a quiet one each get their own normal).

Spark-first shape and the 100 TB story:

- The corpus is touched ONCE, by the bucketing groupBy (map-side
  partial counts; uniform (key, bucket) grouping key — a hot key is
  spread across its buckets, so the classic hot-source skew lands on
  MANY reducer keys, not one).
- Everything after runs on the AGGREGATED series (keys x buckets —
  metadata scale, never corpus scale): the zero-fill grid is a
  broadcast of the global bucket span onto the distinct keys, and the
  trailing window partitions by key over that series, bounded by the
  time range, not by data volume.
- Zero-filling is load-bearing twice: a silent outage bucket must pull
  the baseline DOWN (and be visible as x=0), and "24 preceding ROWS"
  only means "24 preceding hours" on a dense series.

Cross-engine exactness: the window sums (n, sum x, sum x^2) are exact
BIGINT arithmetic; the z-score is then a fixed dag of correctly-rounded
IEEE ops (3 divides, 1 subtract, 1 sqrt) over those exact integers, so
Spark and DuckDB produce the same double BITS — the oracle hash covers
the scores, not just the flags.  Sample variance via the computational
identity n*Sxx - Sx^2 (exact in integers; overflow bound: the trailing
sum of counts must stay below ~3e9, i.e. per-key-per-window volumes
past that need the DECIMAL variant — documented, not silently wrong).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "rate_anomalies",
    "rate_anomalies_from_counts",
    "rate_anomalies_sql",
]

_BUCKETS = {"minute": "1 minute", "hour": "1 hour", "day": "1 day"}


def rate_anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    bucket: str = "hour",
    trailing: int = 24,
    min_history: int = 12,
    threshold: float = 3.0,
) -> DataFrame:
    """Score every (key, bucket) of the zero-filled series.

    Output: ``key``, ``bucket``, ``x`` (count), ``n_hist`` (trailing
    buckets available, < ``trailing`` during warm-up), ``z`` (NULL
    while history < ``min_history`` or the baseline is constant —
    a spike over a flat-zero baseline has no finite z; it still
    surfaces, as x > 0 with z NULL), ``is_anomaly`` (non-null bool:
    z > threshold).  Callers filter; returning the full scored series
    keeps the operator a pure function of the data (and the oracle
    hash strong).
    """
    if bucket not in _BUCKETS:
        raise ValueError(f"bucket must be one of {sorted(_BUCKETS)}")
    counts = (
        df.groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    return rate_anomalies_from_counts(
        counts, bucket=bucket, trailing=trailing,
        min_history=min_history, threshold=threshold,
    )


def rate_anomalies_from_counts(
    counts: DataFrame,
    key_col: str = "key",
    bucket_col: str = "bucket",
    x_col: str = "x",
    bucket: str = "hour",
    trailing: int = 24,
    min_history: int = 12,
    threshold: float = 3.0,
) -> DataFrame:
    """Score a PRE-AGGREGATED (key, bucket, count) series.

    The production shape at scale: a deployment maintains its bucketed
    counts continuously (the exactly-once ``stream_agg`` sink, or the
    rollup cascade), so anomaly scoring should read THAT table —
    metadata-scale, already partition-pruned — never rescan the raw
    corpus. :func:`rate_anomalies` is this function composed with the
    one corpus-touching groupBy; everything here (dense zero-filled
    grid, trailing window, the fixed IEEE z dag) runs on keys x buckets
    rows. Missing buckets are treated as silent (x = 0) — the input
    must carry one row per OBSERVED (key, bucket), which both the
    bucketing groupBy and the agg sink guarantee.
    """
    if bucket not in _BUCKETS:
        raise ValueError(f"bucket must be one of {sorted(_BUCKETS)}")
    step = _BUCKETS[bucket]
    counts = counts.select(
        F.col(key_col).alias("key"),
        F.col(bucket_col).alias("bucket"),
        F.col(x_col).cast("bigint").alias("x"),
    )
    # global bucket span (1 row) broadcast onto the distinct keys ->
    # dense grid; BroadcastNestedLoopJoin with a 1-row build side, by
    # construction never a CartesianProduct shuffle
    span = counts.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    grid = (
        counts.select("key")
        .distinct()
        .join(F.broadcast(span))
        .select(
            "key",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"interval {step}"))
            ).alias("bucket"),
        )
    )
    filled = grid.join(counts, ["key", "bucket"], "left").select(
        "key", "bucket", F.coalesce("x", F.lit(0)).cast("bigint").alias("x")
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(-trailing, -1)
    )
    scored = filled.select(
        "key",
        "bucket",
        "x",
        F.count(F.lit(1)).over(w).alias("n_hist"),
        F.sum("x").over(w).alias("s1"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("s2"),
    )
    # identical textual expression dag as the DuckDB twin (see module
    # docstring: exact ints in, one fixed sequence of IEEE ops out)
    z = (
        f"CASE WHEN n_hist >= {int(min_history)}"
        " AND (n_hist * s2 - s1 * s1) > 0 THEN"
        " (CAST(x AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n_hist AS DOUBLE))"
        " / sqrt(CAST(n_hist * s2 - s1 * s1 AS DOUBLE)"
        "        / CAST(n_hist * (n_hist - 1) AS DOUBLE)) END"
    )
    return scored.selectExpr(
        "key",
        "bucket",
        "x",
        "n_hist",
        f"{z} AS z",
        f"coalesce(({z}) > CAST({float(threshold)} AS DOUBLE), FALSE)"
        " AS is_anomaly",
    )


def rate_anomalies_sql(
    relation: str,
    key_expr: str,
    ts_expr: str = "ts",
    bucket: str = "hour",
    trailing: int = 24,
    min_history: int = 12,
    threshold: float = 3.0,
) -> str:
    """DuckDB twin of :func:`rate_anomalies` (same expression dag)."""
    if bucket not in _BUCKETS:
        raise ValueError(f"bucket must be one of {sorted(_BUCKETS)}")
    step = _BUCKETS[bucket]
    z = (
        f"CASE WHEN n_hist >= {int(min_history)}"
        " AND (n_hist * s2 - s1 * s1) > 0 THEN"
        " (CAST(x AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n_hist AS DOUBLE))"
        " / sqrt(CAST(n_hist * s2 - s1 * s1 AS DOUBLE)"
        "        / CAST(n_hist * (n_hist - 1) AS DOUBLE)) END"
    )
    return f"""
WITH counts AS (
  SELECT {key_expr} AS key, date_trunc('{bucket}', {ts_expr}) AS bucket,
         CAST(count(*) AS BIGINT) AS x
  FROM {relation} GROUP BY 1, 2
),
span AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM counts),
grid AS (
  SELECT key, unnest(generate_series(lo, hi, INTERVAL {step})) AS bucket
  FROM (SELECT DISTINCT key FROM counts), span
),
filled AS (
  SELECT g.key, g.bucket, CAST(coalesce(c.x, 0) AS BIGINT) AS x
  FROM grid g LEFT JOIN counts c ON g.key = c.key AND g.bucket = c.bucket
),
win AS (
  SELECT key, bucket, x,
         CAST(count(*) OVER w AS BIGINT) AS n_hist,
         sum(x) OVER w AS s1,
         sum(x * x) OVER w AS s2
  FROM filled
  WINDOW w AS (PARTITION BY key ORDER BY bucket
               ROWS BETWEEN {int(trailing)} PRECEDING AND 1 PRECEDING)
)
SELECT key, bucket, x, n_hist, {z} AS z,
       coalesce(({z}) > CAST({float(threshold)} AS DOUBLE), FALSE)
         AS is_anomaly
FROM win"""
