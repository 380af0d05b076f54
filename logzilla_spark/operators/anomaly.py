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
    "absent_keys",
    "absent_keys_from_counts",
    "absent_keys_sql",
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


# -- absence detection -------------------------------------------------
#
# The OTHER alerting direction: rate_anomalies fires when a key goes
# LOUD; absent_keys fires when a key goes SILENT (PromQL's absent() /
# "host stopped sending logs" — dead agent, broken shipper, wedged
# service). A key is absent when it has activity in the baseline
# half of the range ([start, pivot)) and NO rows in the current half
# ([pivot, end]). One conditional aggregation over one scan — the
# corpus is never touched twice — and the filter predicate is the
# SAME assembled time+node predicate as the hits page, so "absent
# among what?" can never drift from what search shows.


def absent_keys(
    df: DataFrame,
    query,
    *,
    by,
    pivot,
    time_column: str = "timestamp",
    field_resolver=None,
) -> DataFrame:
    """Keys seen before ``pivot`` but silent since.

    ``query`` scopes the scan (mandatory time range + optional node
    tree — operators/query.py discipline; ``end`` is required: an
    open-ended "current half" has no honest emptiness claim).
    ``by`` is the key shape (whitelisted fields, same rules as
    range-query labels). Output: one row per absent key — label
    columns (``_label_name`` form), ``n_baseline`` (BIGINT rows before
    pivot) and ``last_seen_us`` (BIGINT epoch-micros of the key's last
    row) — deterministic content, exact integers, so the oracle hash
    covers everything.

    100 TB shape: one scan with pushed predicates, one groupBy on the
    key labels (map-side partials collapse to one row per key per
    partition before the shuffle); the output is key-cardinality.
    """
    from .query import QueryValidationError, _assemble_predicate
    from .query import default_field_resolver as _dfr
    from .range_query import _field_ok, _label_name

    if field_resolver is None:
        field_resolver = _dfr
    query.validate()
    if query.end is None:
        raise QueryValidationError("absent_keys requires end (or until:)")
    if not by:
        raise QueryValidationError("absent_keys: by must be non-empty")
    for f in by:
        if not _field_ok(f, None):
            raise QueryValidationError(f"by field not allowed: {f!r}")
    if len(set(by)) != len(list(by)):
        raise QueryValidationError("duplicate by field")
    start, end = query.start, query.end
    if end < start:
        start, end = end, start
    if not (start < pivot <= end):
        raise QueryValidationError(
            "absent_keys: pivot must lie inside the time range"
        )
    pred, _bk, tc = _assemble_predicate(query, time_column, field_resolver)
    labels = [
        field_resolver(f).cast("string").alias(_label_name(f)) for f in by
    ]
    label_names = [_label_name(f) for f in by]
    cur = tc >= pivot
    base = df.filter(pred).select(
        *labels,
        F.when(cur, 1).otherwise(0).alias("_c"),
        F.expr(f"unix_micros(`{time_column}`)").alias("_us"),
    )
    agg = base.groupBy(*label_names).agg(
        F.sum(F.lit(1) - F.col("_c")).cast("bigint").alias("n_baseline"),
        F.sum("_c").cast("bigint").alias("_n_current"),
        F.max("_us").alias("last_seen_us"),
    )
    return agg.filter(F.col("_n_current") == 0).select(
        *label_names, "n_baseline", "last_seen_us"
    )


def absent_keys_from_counts(
    counts: DataFrame,
    pivot,
    key_cols=("key",),
    bucket_col: str = "bucket",
    x_col: str = "x",
) -> DataFrame:
    """Absence over a PRE-AGGREGATED (key..., bucket, count) series —
    the production shape: read the continuously-maintained agg table
    (exactly-once ``stream_agg`` sink / rollup cascade), never rescan
    the corpus. Output: key columns, ``n_baseline`` (sum of counts
    before pivot), ``last_bucket`` (the key's newest bucket)."""
    key_cols = list(key_cols)
    cur = F.col(bucket_col) >= pivot
    agg = counts.groupBy(*key_cols).agg(
        F.sum(F.when(~cur, F.col(x_col)).otherwise(0))
        .cast("bigint").alias("n_baseline"),
        F.sum(F.when(cur, F.col(x_col)).otherwise(0))
        .cast("bigint").alias("_n_current"),
        F.max(bucket_col).alias("last_bucket"),
    )
    return agg.filter(
        (F.col("_n_current") == 0) & (F.col("n_baseline") > 0)
    ).select(*key_cols, "n_baseline", "last_bucket")


def absent_keys_sql(
    relation: str,
    query,
    *,
    by,
    pivot,
    time_column: str = '"timestamp"',
    field_sql=None,
) -> str:
    """DuckDB twin of :func:`absent_keys` — identical WHERE assembly,
    identical conditional aggregation, exact BIGINT outputs."""
    from .query import QueryValidationError, _sql_lit
    from .query import default_field_sql as _dfs
    from .range_query import _field_ok, _label_name

    if field_sql is None:
        field_sql = _dfs
    query.validate()
    if query.end is None:
        raise QueryValidationError("absent_keys requires end (or until:)")
    if not by:
        raise QueryValidationError("absent_keys: by must be non-empty")
    for f in by:
        if not _field_ok(f, None):
            raise QueryValidationError(f"by field not allowed: {f!r}")
    start, end = query.start, query.end
    if end < start:
        start, end = end, start
    if not (start < pivot <= end):
        raise QueryValidationError(
            "absent_keys: pivot must lie inside the time range"
        )
    where = [f"{time_column} >= {_sql_lit(start)}",
             f"{time_column} <= {_sql_lit(end)}"]
    if query.node is not None:
        s = query.node.to_sql(field_sql)
        if s is not None:
            where.append(s)
    label_sel = [
        f"CAST({field_sql(f)} AS VARCHAR) AS {_label_name(f)}" for f in by
    ]
    label_names = [_label_name(f) for f in by]
    cur = f"{time_column} >= {_sql_lit(pivot)}"
    grp = ", ".join(str(i + 1) for i in range(len(by)))
    return f"""WITH _a AS (
  SELECT {', '.join(label_sel)},
         CAST(sum(CASE WHEN {cur} THEN 0 ELSE 1 END) AS BIGINT) AS n_baseline,
         CAST(sum(CASE WHEN {cur} THEN 1 ELSE 0 END) AS BIGINT) AS _n_current,
         CAST(max(epoch_us({time_column})) AS BIGINT) AS last_seen_us
  FROM {relation}
  WHERE {' AND '.join(where)}
  GROUP BY {grp}
)
SELECT {', '.join([*label_names, 'n_baseline', 'last_seen_us'])}
FROM _a WHERE _n_current = 0"""
