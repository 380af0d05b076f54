"""Metric range queries: LogQL/PromQL-style series over the search filter.

The other half of every modern log engine's query surface (Loki's
``query_range`` with ``count_over_time`` / ``rate`` / ``unwrap``
aggregations, Elasticsearch's date-histogram aggs, Splunk timechart):
the reference only ships the hits page (querier/querier.go), but a
dashboard asks "how MANY per step, per label" — a matrix of
(labels, time-step, value) — not for the rows themselves.

Built as a pure composition over the audited search layer: the filter
is the SAME assembled predicate as the hits page and the facets page
(``query._assemble_predicate`` — mandatory time range with auto-swap
AND the user's sealed node tree), so a number on a dashboard panel and
the rows behind it can never drift.  A DSL string (T55) parses to the
same ``Query``, giving ``rate({level:ERROR} ...)``-class text queries
for free.

100 TB shape: ONE scan with the pushed time+node predicate, ONE
groupBy on (labels, bucket) with map-side partial aggregation — the
shuffle carries label x bucket cells (dashboard scale), never rows.
The optional zero-fill grid is driver-computed bounds (the REQUESTED
range, known before any job) exploded onto the distinct observed label
sets — post-aggregation scale, broadcast-joined.  A hot label is
spread across its buckets, so the classic hot-key skew lands on many
reducer keys (same argument as operators/anomaly.py).

Cross-engine exactness: buckets are exact BIGINT epoch-second floors
computed in integer arithmetic on both engines
(``unix_micros(ts) div step_us`` / DuckDB ``epoch_us(ts) // step_us``
— epoch() itself is DOUBLE in DuckDB, so micros are the shared exact
currency); counts/sums/mins/maxes are BIGINT; ``rate`` and
``avg_over_time`` are ONE IEEE division of exact integers, so doubles
hash bit-identical.  Non-negative epochs assumed (pre-1970 buckets
would need floor-division semantics; ``div`` and ``//`` both truncate
toward zero — same on both engines, but not a floor).
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .query import (
    FIELD_PATTERN,
    Query,
    QueryValidationError,
    _assemble_predicate,
    _sql_lit,
    default_field_resolver,
    default_field_sql,
)

__all__ = [
    "AGGS",
    "MAX_BUCKETS",
    "VECTOR_AGGS",
    "range_query",
    "range_query_sliding",
    "range_query_sliding_sql",
    "range_query_sql",
    "vector_agg",
    "vector_agg_sql",
    "vector_binop",
    "vector_binop_sql",
    "vector_topk",
    "vector_topk_sql",
    "parse_step",
]

# agg -> (needs_unwrap, rate_like). rate_like divides the BIGINT base
# value by the step length (the only float in those outputs).
AGGS: dict[str, tuple[bool, bool]] = {
    "count_over_time": (False, False),
    "rate": (False, True),
    "bytes_over_time": (False, False),
    "bytes_rate": (False, True),
    "sum_over_time": (True, False),
    "min_over_time": (True, False),
    "max_over_time": (True, False),
    "avg_over_time": (True, False),
    # exact discrete quantile (operators/metrics.py rank rule); takes
    # the extra ``quantile=(num, den)`` rational parameter
    "quantile_over_time": (True, False),
    # earliest/latest sample per cell (Loki first/last_over_time); the
    # ordering key is the lexicographic BIGINT pair (event micros,
    # value) so a timestamp tie cannot make the answer partition-order
    # dependent — min_by over a struct here, ordered-aggregate
    # first(v ORDER BY us, v) in the twin, identical total order
    "first_over_time": (True, False),
    "last_over_time": (True, False),
}

# second-stage (vector) aggregations over an evaluated matrix:
# PromQL's ``sum by (..) (rate(..))`` family.  ``avg`` is the exact
# sum/count IEEE division; ``sum``/``avg`` over a DOUBLE-valued matrix
# (rate/avg upstream) are float additions and therefore order-
# dependent — exact cross-engine twinning is guaranteed only for the
# BIGINT-valued matrices (count/bytes/sum/min/max/quantile/first/last).
VECTOR_AGGS = ("sum", "min", "max", "avg", "count")

# Loki's max resolution per query (11000 points); the grid is
# driver-validated against it before any job starts.
MAX_BUCKETS = 11_000

_EPOCH = datetime(1970, 1, 1)

_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400}


def parse_step(step) -> int:
    """``step`` as an int (seconds) or a duration string ``30s`` /
    ``5m`` / ``1h`` / ``1d``."""
    if isinstance(step, bool):
        raise QueryValidationError("step: expected seconds or a duration string")
    if isinstance(step, int):
        n = step
    elif isinstance(step, str) and len(step) >= 2 and step[:-1].isdigit() \
            and step[-1] in _UNIT_SECONDS:
        n = int(step[:-1]) * _UNIT_SECONDS[step[-1]]
    else:
        raise QueryValidationError(f"step: bad duration {step!r}")
    if n < 1:
        raise QueryValidationError("step: must be >= 1 second")
    return n


def _epoch_seconds(dt: datetime) -> int:
    # exact integer micros (timedelta // timedelta is exact), then
    # truncate to seconds — same truncation as unix_micros div 1e6
    us = (dt - _EPOCH) // timedelta(microseconds=1)
    return us // 1_000_000


def _field_ok(name: str, extract) -> bool:
    """A by/unwrap field is valid if the sealed whitelist admits it OR
    an extraction stage defines it (operators/extract.py)."""
    if FIELD_PATTERN.match(name):
        return True
    if extract is not None and name.startswith("extracted."):
        return name[len("extracted."):] in extract.names
    return False


def _validate(
    query: Query, agg: str, step: int, by: Sequence[str], unwrap: str | None,
    fill: bool, quantile: tuple[int, int] | None = None, extract=None,
) -> tuple[datetime, datetime, int, int]:
    """Shared driver-side validation; returns (start, end, lo, hi)
    with the auto-swap applied and the grid bounds as bucket seconds."""
    query.validate()
    if agg not in AGGS:
        raise QueryValidationError(
            f"unknown range aggregation {agg!r}; one of {sorted(AGGS)}"
        )
    needs_unwrap, _ = AGGS[agg]
    if needs_unwrap and unwrap is None:
        raise QueryValidationError(f"{agg} requires an unwrap field")
    if not needs_unwrap and unwrap is not None:
        raise QueryValidationError(f"{agg} does not take an unwrap field")
    if unwrap is not None and not _field_ok(unwrap, extract):
        raise QueryValidationError(f"unwrap field not allowed: {unwrap!r}")
    for f in by:
        if not _field_ok(f, extract):
            raise QueryValidationError(f"by field not allowed: {f!r}")
    if len(set(by)) != len(list(by)):
        raise QueryValidationError("duplicate by field")
    if agg == "quantile_over_time":
        if quantile is None:
            raise QueryValidationError("quantile_over_time requires quantile")
        num, den = quantile
        if not (isinstance(num, int) and isinstance(den, int) and 0 < num <= den):
            raise QueryValidationError(
                "quantile: need integers 0 < num <= den"
            )
    elif quantile is not None:
        raise QueryValidationError(f"{agg} does not take a quantile")
    if query.cursor is not None:
        raise QueryValidationError("range queries do not paginate (no cursor)")
    if query.end is None:
        # an open range has no grid and no honest rate denominator
        raise QueryValidationError("range queries require end (or until:)")
    if fill and needs_unwrap:
        # zero is a real sample value for an unwrapped metric; a filled
        # 0 would be indistinguishable from data (Loki omits too)
        raise QueryValidationError(f"fill is not defined for {agg}")
    start, end = query.start, query.end
    if end < start:
        start, end = end, start  # same auto-swap as the hits page
    lo = (_epoch_seconds(start) // step) * step
    hi = (_epoch_seconds(end) // step) * step
    n = (hi - lo) // step + 1
    if n > MAX_BUCKETS:
        raise QueryValidationError(
            f"range of {n} buckets exceeds {MAX_BUCKETS}; raise step"
        )
    return start, end, lo, hi


def _label_name(field: str) -> str:
    """Output column for a by/label field — the oracle's flattened
    naming (``metadata.service`` -> ``m_service``) so the Spark frame
    and the DuckDB twin agree column-for-column."""
    return default_field_sql(field)


def range_query(
    df: DataFrame,
    query: Query,
    *,
    agg: str = "count_over_time",
    step: int = 3600,
    by: Sequence[str] = (),
    unwrap: str | None = None,
    fill: bool = False,
    quantile: tuple[int, int] | None = None,
    extract=None,
    extract_where: Sequence[tuple[str, str, object]] = (),
    time_column: str = "timestamp",
    field_resolver=default_field_resolver,
) -> DataFrame:
    """Evaluate a metric range query; returns the long-form matrix
    ``<label columns...>, bucket (BIGINT epoch seconds), v``.

    ``extract`` (an :class:`~.extract.Extraction`) adds a query-time
    parser stage: ``extracted.<name>`` fields become valid in ``by`` /
    ``unwrap`` (labels ``x_<name>``), and ``extract_where`` applies
    the LogQL label-filter stage ``[(field, op, value), ...]`` on the
    same scan.  Extraction is a codegen projection over ``message`` —
    the pushed time+node predicate and the one-scan plan are
    unchanged.

    ``quantile_over_time`` takes the exact rational ``quantile=(num,
    den)`` and applies the discrete rank rule of operators/metrics.py
    (``min(v : den*cum >= num*n)``, pure BIGINT) via the histogram
    rewrite: the corpus collapses to distinct (labels, bucket, value)
    cells map-side, the window then runs at histogram scale.

    ``v`` is BIGINT for count/bytes/sum/min/max, DOUBLE (one IEEE
    division of exact BIGINTs) for rate/bytes_rate/avg.  ``fill=True``
    (count/bytes/rate aggs only) densifies every observed label set
    over the REQUESTED [start, end] grid with zeros — a dashboard
    series with holes reads as "no data", not "zero events".  Rows
    whose unwrapped value is NULL/unparseable are excluded (a row
    lacking the field is not a zero-valued sample — the
    operators/metrics.py convention).

    ``query.sort``/``limit`` are hits-page parameters; they are
    ignored here (the matrix is a pure function of filter + grid).
    """
    step = parse_step(step)
    _start, _end, lo, hi = _validate(query, agg, step, by, unwrap, fill,
                                     quantile, extract)
    if extract is not None:
        field_resolver = extract.resolver(field_resolver)
    elif extract_where:
        raise QueryValidationError("extract_where requires extract")
    pred, _backward, _tc = _assemble_predicate(query, time_column, field_resolver)
    if extract_where:
        from .extract import extract_where_column

        ew = extract_where_column(extract_where, extract)
        if ew is not None:
            pred = pred & ew
    needs_unwrap, rate_like = AGGS[agg]

    labels = [
        field_resolver(f).cast("string").alias(_label_name(f)) for f in by
    ]
    label_names = [_label_name(f) for f in by]
    bucket = F.expr(
        f"(unix_micros(`{time_column}`) div {step * 1_000_000}) * {step}"
    ).alias("bucket")

    extra: list[Column] = []
    if needs_unwrap:
        extra = [field_resolver(unwrap).try_cast("bigint").alias("uv")]
        if agg in ("first_over_time", "last_over_time"):
            # event-time micros: the primary ordering key for the
            # earliest/latest sample (exact BIGINT on both engines)
            extra.append(
                F.expr(f"unix_micros(`{time_column}`)").alias("us")
            )
    elif agg in ("bytes_over_time", "bytes_rate"):
        # message byte length (UTF-8): octet_length here, strlen in the twin
        extra = [F.octet_length("message").alias("bv")]
    base = df.filter(pred).select(*labels, bucket, *extra)
    if needs_unwrap:
        base = base.where(F.col("uv").isNotNull())

    if agg == "quantile_over_time":
        # histogram rewrite (operators/metrics.py): map-side partials
        # collapse the corpus to distinct-value cells, the rank window
        # then runs at histogram scale, never corpus scale
        from pyspark.sql import Window

        num, den = quantile
        hist = base.groupBy(*label_names, "bucket", "uv").agg(
            F.count(F.lit(1)).alias("c")
        )
        cell = [*label_names, "bucket"]
        w = Window.partitionBy(*cell).orderBy("uv")
        ranked = hist.select(
            *cell, "uv", "c",
            F.sum("c").over(w).alias("cum"),
            F.sum("c").over(Window.partitionBy(*cell)).alias("tot"),
        )
        cells = ranked.groupBy(*cell).agg(
            F.min(
                F.when(
                    F.lit(den) * F.col("cum") >= F.lit(num) * F.col("tot"),
                    F.col("uv"),
                )
            ).cast("bigint").alias("n")
        )
        return cells.select(*label_names, "bucket", F.col("n").alias("v"))

    if agg in ("count_over_time", "rate"):
        val: Column = F.count(F.lit(1))
    elif agg in ("bytes_over_time", "bytes_rate"):
        val = F.sum("bv")
    elif agg == "sum_over_time":
        val = F.sum("uv")
    elif agg == "min_over_time":
        val = F.min("uv")
    elif agg == "max_over_time":
        val = F.max("uv")
    elif agg == "first_over_time":
        # deterministic: value of the lexicographically smallest
        # (micros, value) pair — a timestamp tie breaks on the value
        val = F.min_by("uv", F.struct(F.col("us"), F.col("uv")))
    elif agg == "last_over_time":
        val = F.max_by("uv", F.struct(F.col("us"), F.col("uv")))
    else:  # avg_over_time: exact BIGINT sums, one IEEE division
        val = F.sum("uv").cast("double") / F.count("uv").cast("double")
    cells = base.groupBy(*label_names, "bucket").agg(
        val.cast("double" if agg == "avg_over_time" else "bigint").alias("n")
    )

    if fill:
        # observed label sets x the requested grid: post-aggregation
        # scale; 1-row-per-bucket build side broadcast onto the labels
        grid_col = F.explode(
            F.sequence(F.lit(lo), F.lit(hi), F.lit(step))
        ).alias("bucket")
        if label_names:
            grid = cells.select(*label_names).distinct().select(
                *label_names, grid_col
            )
            cells = grid.join(cells, [*label_names, "bucket"], "left")
        else:
            grid = cells.sparkSession.range(1).select(grid_col)
            cells = grid.join(cells, ["bucket"], "left")
        cells = cells.select(
            *label_names, "bucket",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
        )

    if rate_like:
        v = (F.col("n").cast("double") / F.lit(float(step))).alias("v")
    else:
        v = F.col("n").alias("v")
    return cells.select(*label_names, "bucket", v)


def range_query_sql(
    relation: str,
    query: Query,
    *,
    agg: str = "count_over_time",
    step: int = 3600,
    by: Sequence[str] = (),
    unwrap: str | None = None,
    fill: bool = False,
    quantile: tuple[int, int] | None = None,
    extract=None,
    extract_where: Sequence[tuple[str, str, object]] = (),
    time_column: str = '"timestamp"',
    field_sql=default_field_sql,
) -> str:
    """DuckDB twin of :func:`range_query` — identical bucket integer
    arithmetic, identical aggregation, identical division dag."""
    step = parse_step(step)
    _start, _end, lo, hi = _validate(query, agg, step, by, unwrap, fill,
                                     quantile, extract)
    if extract is not None:
        field_sql = extract.field_sql(field_sql)
    elif extract_where:
        raise QueryValidationError("extract_where requires extract")
    needs_unwrap, rate_like = AGGS[agg]

    # same WHERE assembly as query.search_oracle_sql (auto-swap + node)
    start, end = query.start, query.end
    if end is not None and end < start:
        start, end = end, start
    where = [f"{time_column} >= {_sql_lit(start)}"]
    if end is not None:
        where.append(f"{time_column} <= {_sql_lit(end)}")
    if query.node is not None:
        s = query.node.to_sql(field_sql)
        if s is not None:
            where.append(s)
    if extract_where:
        from .extract import extract_where_sql

        where.extend(extract_where_sql(extract_where, extract))
    if needs_unwrap:
        where.append(f"TRY_CAST({field_sql(unwrap)} AS BIGINT) IS NOT NULL")

    label_sel = [f"CAST({field_sql(f)} AS VARCHAR) AS {_label_name(f)}" for f in by]
    label_names = [_label_name(f) for f in by]
    bucket_sql = f"(epoch_us({time_column}) // {step * 1_000_000}) * {step}"

    if agg == "quantile_over_time":
        num, den = quantile
        cell = ", ".join([*label_names, "bucket"])
        cols = ", ".join(
            [*label_sel, f"{bucket_sql} AS bucket",
             f"TRY_CAST({field_sql(unwrap)} AS BIGINT) AS uv"]
        )
        grp = ", ".join(str(i + 1) for i in range(len(by) + 2))
        return f"""WITH hist AS (
  SELECT {cols}, CAST(count(*) AS BIGINT) AS c
  FROM {relation}
  WHERE {' AND '.join(where)}
  GROUP BY {grp}
),
win AS (
  SELECT {cell}, uv, c,
         sum(c) OVER (PARTITION BY {cell} ORDER BY uv
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY {cell}) AS tot
  FROM hist
)
SELECT {cell},
       CAST(min(CASE WHEN {den} * cum >= {num} * tot THEN uv END) AS BIGINT) AS v
FROM win GROUP BY {cell}"""

    if agg in ("count_over_time", "rate"):
        val = "CAST(count(*) AS BIGINT)"
    elif agg in ("bytes_over_time", "bytes_rate"):
        val = "CAST(sum(strlen(message)) AS BIGINT)"
    elif agg == "avg_over_time":
        val = (
            "CAST(sum(TRY_CAST({u} AS BIGINT)) AS DOUBLE)"
            " / CAST(count(*) AS DOUBLE)"
        ).format(u=field_sql(unwrap))
    elif agg in ("first_over_time", "last_over_time"):
        # ordered aggregate over the same lexicographic (micros, value)
        # key as min_by/max_by over the struct on the Spark side
        fn = "first" if agg == "first_over_time" else "last"
        u = f"TRY_CAST({field_sql(unwrap)} AS BIGINT)"
        val = (
            f"CAST({fn}({u} ORDER BY epoch_us({time_column}), {u})"
            f" AS BIGINT)"
        )
    else:
        fn = {"sum_over_time": "sum", "min_over_time": "min",
              "max_over_time": "max"}[agg]
        val = f"CAST({fn}(TRY_CAST({field_sql(unwrap)} AS BIGINT)) AS BIGINT)"

    cols = ", ".join([*label_sel, f"{bucket_sql} AS bucket"])
    group = ", ".join(str(i + 1) for i in range(len(by) + 1))
    cells = (
        f"SELECT {cols}, {val} AS n FROM {relation}\n"
        f"  WHERE {' AND '.join(where)}\n  GROUP BY {group}"
    )

    vexpr = (
        f"CAST(n AS DOUBLE) / {float(step)!r}" if rate_like else "n"
    )
    if not fill:
        sel = ", ".join([*label_names, "bucket", f"{vexpr} AS v"])
        return f"WITH cells AS (\n{cells}\n)\nSELECT {sel} FROM cells"
    on = " AND ".join(
        [f"g.{c} = c.{c}" for c in label_names] + ["g.bucket = c.bucket"]
    )
    gsel = ", ".join([f"g.{c}" for c in label_names] + ["g.bucket"])
    if label_names:
        lbls = ", ".join(label_names)
        grid = (
            f"SELECT {lbls}, unnest(generate_series({lo}, {hi}, {step}))"
            f" AS bucket FROM (SELECT DISTINCT {lbls} FROM cells)"
        )
    else:
        grid = f"SELECT unnest(generate_series({lo}, {hi}, {step})) AS bucket"
    return f"""WITH cells AS (
{cells}
),
grid AS (
  {grid}
),
filled AS (
  SELECT {gsel}, CAST(coalesce(c.n, 0) AS BIGINT) AS n
  FROM grid g LEFT JOIN cells c ON {on}
)
SELECT {', '.join([*label_names, 'bucket'])}, {vexpr} AS v FROM filled"""


# -- vector stage -----------------------------------------------------
#
# PromQL/LogQL's second evaluation stage: operators over an ALREADY
# EVALUATED matrix (labels..., bucket BIGINT, v).  Two members:
#
# - vector_agg: regroup the series onto a label subset
#   (``sum by (level) (count_over_time by (level, source))``).  The
#   input is cell-scale (series x buckets, dashboard cardinality),
#   never corpus-scale, so the shuffle is metadata-sized; composing it
#   over a COMMITTED recording table (streaming/recordings.py) serves
#   a coarser dashboard without any corpus scan — record once at the
#   finest useful granularity, regroup at read time.
# - vector_topk / bottomk: per bucket keep the k extreme series.  A
#   row_number window partitioned by bucket — partition count = grid
#   buckets, partition size = series count, both dashboard-scale.
#
# Determinism: topk ties break on the label columns ascending
# (NULLS FIRST on both engines — Spark's ASC default, made explicit in
# the twin because DuckDB's ASC default is NULLS LAST); ``v`` is
# non-NULL by the range-stage contract (cells exist only where data
# does; fill writes zeros).  See VECTOR_AGGS for the float-sum caveat.


def _matrix_labels(matrix: DataFrame) -> list[str]:
    cols = list(matrix.columns)
    if "bucket" not in cols or "v" not in cols:
        raise QueryValidationError(
            "vector stage expects a range matrix (labels..., bucket, v)"
        )
    return [c for c in cols if c not in ("bucket", "v")]


def _check_vector_by(by: Sequence[str], labels: list[str]) -> list[str]:
    by = list(by)
    if len(set(by)) != len(by):
        raise QueryValidationError("vector by: duplicate label")
    for c in by:
        if c not in labels:
            raise QueryValidationError(
                f"vector by: {c!r} is not a label of the matrix"
                f" (labels: {labels})"
            )
    return by


def vector_agg(
    matrix: DataFrame, op: str, by: Sequence[str] = ()
) -> DataFrame:
    """Regroup a range matrix onto a label subset: per (``by``...,
    bucket), aggregate ``v`` with ``op`` (one of :data:`VECTOR_AGGS`).

    ``by`` names are the matrix's OUTPUT label columns (the flattened
    ``_label_name`` form, e.g. ``m_service``).  ``avg`` is the exact
    BIGINT-sum / count IEEE division when the input matrix is integer-
    valued; ``sum``/``avg`` over a DOUBLE matrix are order-dependent
    float additions (documented at VECTOR_AGGS)."""
    labels = _matrix_labels(matrix)
    if op not in VECTOR_AGGS:
        raise QueryValidationError(
            f"unknown vector aggregation {op!r}; one of {sorted(VECTOR_AGGS)}"
        )
    by = _check_vector_by(by, labels)
    if op == "count":
        val = F.count("v").alias("v")
    elif op == "avg":
        val = (
            F.sum("v").cast("double") / F.count("v").cast("double")
        ).alias("v")
    elif op == "sum":
        val = F.sum("v").alias("v")
    elif op == "min":
        val = F.min("v").alias("v")
    else:
        val = F.max("v").alias("v")
    return matrix.groupBy(*by, "bucket").agg(val).select(*by, "bucket", "v")


def vector_topk(matrix: DataFrame, k: int, *, bottom: bool = False) -> DataFrame:
    """Per bucket, keep the ``k`` series with the largest ``v``
    (``bottom=True``: smallest).  Ties break on the label columns
    ascending NULLS FIRST — fully deterministic, so the result is a
    pure function of the matrix."""
    from pyspark.sql import Window

    labels = _matrix_labels(matrix)
    if isinstance(k, bool) or not isinstance(k, int) or k < 1:
        raise QueryValidationError("vector topk: k must be an integer >= 1")
    order = [F.col("v").asc() if bottom else F.col("v").desc()]
    order += [F.col(c).asc_nulls_first() for c in labels]
    w = Window.partitionBy("bucket").orderBy(*order)
    return (
        matrix.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def vector_binop(
    left: DataFrame, right: DataFrame, op: str, *, offset: int = 0
) -> DataFrame:
    """PromQL's binary operation between two evaluated matrices:
    ``left <op> right`` per (labels, bucket) — the error-ratio /
    week-over-week dashboard panel (``errors / total``,
    ``count - count offset 1d``).

    Matching is PromQL one-to-one: both matrices must carry the SAME
    label columns (for ``on(subset)`` semantics, regroup a side with
    :func:`vector_agg` first — that IS what on() means), and cells
    join on exact (labels..., bucket) equality; unmatched cells drop
    (inner join, PromQL's behavior).  ``offset`` (seconds, multiple of
    the shared step) shifts the RIGHT matrix forward so left at time t
    meets right at t − offset — the PromQL ``offset`` modifier.

    ``div`` cells with a zero denominator are DROPPED (no sample — the
    portable stand-in for PromQL's ±Inf, which would not round-trip
    exactly); its result is one IEEE division of the two cell values.
    ``add``/``sub``/``mul`` stay exact BIGINT when both inputs are
    BIGINT matrices.  Input is cell-scale, so the join shuffle is
    dashboard-sized, never corpus-sized."""
    from pyspark.sql.types import LongType

    ops = ("add", "sub", "mul", "div")
    if op not in ops:
        raise QueryValidationError(f"binary op {op!r}; one of {list(ops)}")
    if isinstance(offset, bool) or not isinstance(offset, int):
        raise QueryValidationError("binary offset: expected seconds (int)")
    lab_l = _matrix_labels(left)
    lab_r = _matrix_labels(right)
    if sorted(lab_l) != sorted(lab_r):
        raise QueryValidationError(
            f"binary: label columns differ ({sorted(lab_l)} vs"
            f" {sorted(lab_r)}); regroup with vector_agg first"
        )
    import functools as _ft

    rs = right.select(
        *lab_r,
        (F.col("bucket") + F.lit(offset)).alias("bucket"),
        F.col("v").alias("_rv"),
    ).alias("_r")
    ls = left.alias("_l")
    # null-safe label equality — a NULL label is a real series key
    # (the twin matches with IS NOT DISTINCT FROM)
    cond = _ft.reduce(
        lambda a, b: a & b,
        [F.col(f"_l.{c}").eqNullSafe(F.col(f"_r.{c}")) for c in lab_l]
        + [F.col("_l.bucket") == F.col("_r.bucket")],
    )
    j = ls.join(rs, cond, "inner")
    both_long = isinstance(left.schema["v"].dataType, LongType) and isinstance(
        right.schema["v"].dataType, LongType
    )
    lv, rv = F.col("_l.v"), F.col("_r._rv")
    if op == "div":
        j = j.filter(rv != 0)
        v = lv.cast("double") / rv.cast("double")
    else:
        l_, r_ = (lv, rv) if both_long else (lv.cast("double"), rv.cast("double"))
        v = {"add": l_ + r_, "sub": l_ - r_, "mul": l_ * r_}[op]
        if both_long:
            v = v.cast("bigint")
    return j.select(
        *[F.col(f"_l.{c}") for c in lab_l], F.col("_l.bucket").alias("bucket"),
        v.alias("v"),
    )


def vector_binop_sql(
    left_inner: str,
    right_inner: str,
    op: str,
    label_names: Sequence[str],
    *,
    offset: int = 0,
    value_type: str = "BIGINT",
) -> str:
    """DuckDB twin of :func:`vector_binop` over two matrix SQL strings
    (normally :func:`range_query_sql` outputs).  ``value_type`` is the
    INPUT matrices' ``v`` type; the twin reproduces the Spark result
    type rule (BIGINT for add/sub/mul over BIGINT inputs, DOUBLE
    otherwise, DOUBLE always for div)."""
    ops = ("add", "sub", "mul", "div")
    if op not in ops:
        raise QueryValidationError(f"binary op {op!r}; one of {list(ops)}")
    labels = list(label_names)
    on = " AND ".join(
        [f"l.{c} IS NOT DISTINCT FROM r.{c}" for c in labels]
        + ["l.bucket = r.bucket"]
    )
    sel_labels = "".join(f"l.{c}, " for c in labels)
    if op == "div":
        expr = "CAST(l.v AS DOUBLE) / CAST(r.v AS DOUBLE)"
        guard = "\nWHERE r.v <> 0"
    else:
        sym = {"add": "+", "sub": "-", "mul": "*"}[op]
        if value_type == "BIGINT":
            expr = f"CAST(l.v {sym} r.v AS BIGINT)"
        else:
            expr = f"CAST(l.v AS DOUBLE) {sym} CAST(r.v AS DOUBLE)"
        guard = ""
    return f"""WITH _bl AS (
{left_inner}
),
_br AS (
{right_inner}
),
_bro AS (
  SELECT {', '.join([*label_names, ''])}bucket + {int(offset)} AS bucket, v
  FROM _br
)
SELECT {sel_labels}l.bucket, {expr} AS v
FROM _bl l JOIN _bro r ON {on}{guard}"""


def vector_agg_sql(
    inner: str,
    op: str,
    by: Sequence[str] = (),
    *,
    value_type: str = "BIGINT",
) -> str:
    """DuckDB twin of :func:`vector_agg` over the matrix SQL ``inner``
    (normally a :func:`range_query_sql` string).  ``value_type`` is the
    matrix's ``v`` type (``BIGINT``/``DOUBLE``) — DuckDB's sum over
    BIGINT widens to HUGEINT, so the twin casts back to the Spark
    result type."""
    by = list(by)
    if op == "count":
        val = "CAST(count(v) AS BIGINT)"
    elif op == "avg":
        val = "CAST(sum(v) AS DOUBLE) / CAST(count(v) AS DOUBLE)"
    elif op == "sum":
        val = f"CAST(sum(v) AS {value_type})"
    else:
        val = f"{op}(v)"
    sel = ", ".join([*by, "bucket", f"{val} AS v"])
    grp = ", ".join(str(i + 1) for i in range(len(by) + 1))
    return f"WITH _m AS (\n{inner}\n)\nSELECT {sel} FROM _m GROUP BY {grp}"


def vector_topk_sql(
    inner: str,
    k: int,
    label_names: Sequence[str],
    *,
    bottom: bool = False,
) -> str:
    """DuckDB twin of :func:`vector_topk` — identical total order
    (v DESC NULLS LAST / ASC NULLS FIRST matches Spark's defaults,
    labels ASC NULLS FIRST made explicit against DuckDB's ASC
    NULLS LAST default)."""
    labels = list(label_names)
    vorder = "v ASC NULLS FIRST" if bottom else "v DESC NULLS LAST"
    ties = "".join(f", {c} ASC NULLS FIRST" for c in labels)
    sel = ", ".join([*labels, "bucket", "v"])
    return f"""WITH _m AS (
{inner}
),
_r AS (
  SELECT *, row_number() OVER (
    PARTITION BY bucket ORDER BY {vorder}{ties}
  ) AS _rk FROM _m
)
SELECT {sel} FROM _r WHERE _rk <= {int(k)}"""


# -- sliding (PromQL range-selector) windows ---------------------------
#
# The tumbling buckets above are Loki's step==range fast path; PromQL's
# general form is rate(x[5m]) evaluated every step — OVERLAPPING
# windows (range > step). Recomputing each point from raw rows would
# scan the corpus once per overlap factor; instead the additive aggs
# compose from the tumbling CELLS: evaluate step-granular cells once
# (one corpus scan), zero-fill each observed series onto the dense
# step grid, and slide a k-cell window sum over it (k = range/step) —
# a cells-scale window, never corpus-scale. Exact BIGINT sums; rate
# divides by the RANGE length (PromQL's denominator), one IEEE op.

# aggs whose window value is a SUM of cell values (the composable set;
# min/max/avg/quantile/first/last need other merge shapes)
SLIDING_AGGS = {
    "count_over_time": ("count_over_time", False),
    "rate": ("count_over_time", True),
    "bytes_over_time": ("bytes_over_time", False),
    "bytes_rate": ("bytes_over_time", True),
    "sum_over_time": ("sum_over_time", False),
}


def _sliding_check(agg: str, step, range_) -> tuple[int, int, int]:
    step = parse_step(step)
    range_ = parse_step(range_)
    if agg not in SLIDING_AGGS:
        raise QueryValidationError(
            f"sliding range: agg must be additive, one of"
            f" {sorted(SLIDING_AGGS)}"
        )
    if range_ < step or range_ % step:
        raise QueryValidationError(
            "sliding range: must be a multiple of step (and >= step)"
        )
    return step, range_, range_ // step


def _extended(query: Query, ext_s: int) -> Query:
    """The scan window reaching back ``ext_s`` seconds before the
    (normalized) start — a window ending at the first requested bucket
    looks back across the extension, exactly PromQL's lookback."""
    s, e = query.start, query.end
    if e is not None and e < s:
        s, e = e, s
    return Query(start=s - timedelta(seconds=ext_s), end=e, node=query.node)


def range_query_sliding(
    df: DataFrame,
    query: Query,
    *,
    agg: str = "rate",
    step: int = 3600,
    range_: int = 21600,
    by: Sequence[str] = (),
    unwrap: str | None = None,
    fill: bool = False,
    extract=None,
    extract_where: Sequence[tuple[str, str, object]] = (),
    time_column: str = "timestamp",
    field_resolver=default_field_resolver,
) -> DataFrame:
    """``agg(x[range_])`` evaluated every ``step`` — overlapping
    windows. Output matrix as :func:`range_query`; a bucket's value
    covers (bucket − range_, bucket + step − range_ .. bucket + step],
    i.e. the ``range_``-long window ENDING at the bucket's close.

    ``fill=False`` (default) emits only buckets whose window saw at
    least one observed cell (PromQL: no sample in range → no point);
    ``fill=True`` densifies with zeros (rate 0.0) like the tumbling
    path."""
    from pyspark.sql import Window

    step, range_, k = _sliding_check(agg, step, range_)
    base, rate_like = SLIDING_AGGS[agg]
    # the caller's fill flows through _validate so sliding enforces the
    # same "fill is not defined for unwrap aggs" rule as tumbling (a
    # filled 0 would be indistinguishable from a real 0-valued sample)
    _s, _e, lo, hi = _validate(
        query, base, step, by, unwrap, fill, None, extract
    )
    cells = range_query(
        df, _extended(query, range_ - step), agg=base, step=step, by=by,
        unwrap=unwrap, fill=False, extract=extract,
        extract_where=extract_where, time_column=time_column,
        field_resolver=field_resolver,
    )
    label_names = [_label_name(f) for f in by]
    # dense per-series grid over the EXTENDED span, observed flag kept
    # (bucket cast to BIGINT: the cells' bucket is long, and python
    # ints under 2^31 would otherwise make sequence() an int32 grid)
    grid_col = F.explode(
        F.sequence(
            F.lit(lo - (k - 1) * step).cast("bigint"),
            F.lit(hi).cast("bigint"),
            F.lit(step).cast("bigint"),
        )
    ).alias("bucket")
    if label_names:
        grid = cells.select(*label_names).distinct().select(
            *label_names, grid_col
        )
        dense = grid.join(cells, [*label_names, "bucket"], "left")
    else:
        dense = cells.sparkSession.range(1).select(grid_col).join(
            cells, ["bucket"], "left"
        )
    dense = dense.select(
        *label_names, "bucket",
        F.coalesce("v", F.lit(0)).cast("bigint").alias("_cv"),
        F.col("v").isNotNull().cast("int").alias("_obs"),
    )
    w = (
        Window.partitionBy(*label_names)
        .orderBy("bucket")
        .rowsBetween(-(k - 1), 0)
    )
    slid = dense.select(
        *label_names, "bucket",
        F.sum("_cv").over(w).cast("bigint").alias("_sv"),
        F.sum("_obs").over(w).cast("bigint").alias("_so"),
    ).filter(F.col("bucket") >= lo)
    if not fill:
        slid = slid.filter(F.col("_so") > 0)
    v = (
        (F.col("_sv").cast("double") / F.lit(float(range_))).alias("v")
        if rate_like
        else F.col("_sv").alias("v")
    )
    return slid.select(*label_names, "bucket", v)


def range_query_sliding_sql(
    relation: str,
    query: Query,
    *,
    agg: str = "rate",
    step: int = 3600,
    range_: int = 21600,
    by: Sequence[str] = (),
    unwrap: str | None = None,
    fill: bool = False,
    extract=None,
    extract_where: Sequence[tuple[str, str, object]] = (),
    time_column: str = '"timestamp"',
    field_sql=default_field_sql,
) -> str:
    """DuckDB twin of :func:`range_query_sliding` — identical grid,
    identical window frame, identical division."""
    step, range_, k = _sliding_check(agg, step, range_)
    base, rate_like = SLIDING_AGGS[agg]
    # the caller's fill flows through _validate so sliding enforces the
    # same "fill is not defined for unwrap aggs" rule as tumbling (a
    # filled 0 would be indistinguishable from a real 0-valued sample)
    _s, _e, lo, hi = _validate(
        query, base, step, by, unwrap, fill, None, extract
    )
    inner = range_query_sql(
        relation, _extended(query, range_ - step), agg=base, step=step,
        by=by, unwrap=unwrap, fill=False, extract=extract,
        extract_where=extract_where, time_column=time_column,
        field_sql=field_sql,
    )
    label_names = [_label_name(f) for f in by]
    lbls = ", ".join(label_names)
    if label_names:
        grid = (
            f"SELECT {lbls}, unnest(generate_series("
            f"{lo - (k - 1) * step}, {hi}, {step})) AS bucket"
            f" FROM (SELECT DISTINCT {lbls} FROM _cells)"
        )
        on = " AND ".join(
            [f"g.{c} = c.{c}" for c in label_names] + ["g.bucket = c.bucket"]
        )
        gsel = ", ".join([f"g.{c}" for c in label_names] + ["g.bucket"])
    else:
        grid = (
            f"SELECT unnest(generate_series({lo - (k - 1) * step}, {hi},"
            f" {step})) AS bucket"
        )
        on = "g.bucket = c.bucket"
        gsel = "g.bucket"
    part = f"PARTITION BY {lbls} " if label_names else ""
    vexpr = (
        f"CAST(_sv AS DOUBLE) / {float(range_)!r}" if rate_like else "_sv"
    )
    so_filter = "" if fill else "\nWHERE _so > 0"
    sel = ", ".join([*label_names, "bucket", f"{vexpr} AS v"])
    return f"""WITH _cells AS (
{inner}
),
_dense AS (
  SELECT {gsel}, CAST(coalesce(c.v, 0) AS BIGINT) AS _cv,
         CAST(c.v IS NOT NULL AS INT) AS _obs
  FROM ({grid}) g LEFT JOIN _cells c ON {on}
),
_slid AS (
  SELECT {', '.join([*label_names, 'bucket'])},
         CAST(sum(_cv) OVER ({part}ORDER BY bucket
              ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW) AS BIGINT) AS _sv,
         CAST(sum(_obs) OVER ({part}ORDER BY bucket
              ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW) AS BIGINT) AS _so
  FROM _dense
)
SELECT {sel} FROM _slid
WHERE bucket >= {lo}{so_filter.replace(chr(10) + 'WHERE', ' AND') if not fill else ''}"""
