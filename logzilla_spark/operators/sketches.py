"""Mergeable distributed sketches: HyperLogLog distinct counts and
count-min heavy hitters (log-analytics staples at 100 TB).

Why sketches: exact COUNT(DISTINCT) over a high-cardinality column
shuffles every distinct value; exact top-k needs the full count table.
At 100 TB the right shape is FIXED-SIZE mergeable state with map-side
combine — each executor folds its partition into m registers /
(d x w) counters, and only sketch-sized state crosses the shuffle.
Both sketches here are plain aggregations over md5-derived register
positions, so Spark's partial aggregation IS the sketch merge and the
state per key is bounded by construction (HLL: m=512 registers; CM:
4x1024 counters) regardless of input size.

Cross-engine determinism (the repo's differential-testing anchor):
positions come from ``functions.hashing.md5_long`` (both engines
compute it natively); rho is derived with integer div + bin()-length
(no libm); the harmonic sum is FIXED-POINT (sum of 2^(rho_max - rho)
as bigint — exact, order-independent); and the only transcendental —
the linear-counting correction m*ln(m/V) — has exactly m possible
inputs, so it is precomputed in Python and inlined as a literal table
into BOTH engines' plans (the hyperplanes trick). Every double the
operators emit is therefore bit-identical between Spark and the
DuckDB twin (oracle_dataops.hll_distinct_sql / cm_heavy_hitters_sql).

Algorithms from the public papers: Flajolet et al. '07 (HyperLogLog,
including the 5m/2 linear-counting small-range correction) and
Cormode & Muthukrishnan '05 (count-min). The reference engine has no
sketch layer; this extends the training-data/log-analytics brief.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logzilla_spark.functions.hashing import md5_long_expr

# --------------------------------------------------------------------------
# HyperLogLog
# --------------------------------------------------------------------------

HLL_P = 9                      # precision: m = 2^p registers
HLL_M = 1 << HLL_P             # 512
HLL_RHO_MAX = 60 - HLL_P + 1   # md5_long is 60 bits -> rho in [1, 52]
HLL_SCALE = 1 << HLL_RHO_MAX   # fixed-point scale for the harmonic sum
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)   # Flajolet '07, m >= 128
# numerator of the raw estimate, folded into ONE Python-computed
# double literal: alpha_m * m^2 * 2^rho_max (the 2^rho_max un-scales
# the fixed-point denominator)
HLL_ALPHA_NUM = HLL_ALPHA * HLL_M * HLL_M * float(HLL_SCALE)
# linear-counting correction m * ln(m / V) has exactly m possible
# inputs (V in 1..m) -> precompute, inline into both engines
HLL_LN_TABLE = [HLL_M * math.log(HLL_M / v) for v in range(1, HLL_M + 1)]
HLL_SMALL_RANGE = 2.5 * HLL_M  # apply correction when est_raw <= 5m/2


def dlit(v: float) -> str:
    """Double literal that parses as DOUBLE (never DECIMAL) in both
    Spark SQL (ANSI) and DuckDB: scientific notation forces the double
    path; repr() round-trips the exact bits."""
    r = repr(float(v))
    return r if ("e" in r or "E" in r) else r + "e0"


def hll_ln_table_literal(open_b: str = "array(", close_b: str = ")") -> str:
    """The m-entry correction table as an inline array literal —
    ``array(...)`` for Spark, ``[...]`` for DuckDB via the brackets."""
    return open_b + ", ".join(dlit(v) for v in HLL_LN_TABLE) + close_b


def hll_registers(
    df: DataFrame, keys: list[str], value_expr: str
) -> DataFrame:
    """(keys..., register, rho): the m-register HLL sketch per key —
    THE mergeable artifact (union two register tables and max(rho)
    per (key, register) to merge sketches across corpora/partitions).

    ``value_expr`` must be a string-typed SQL expression. One
    projection + one (keys, register)-grouped max: the max completes
    map-side, so only <= m rows per key per partition cross the
    shuffle regardless of input size.
    """
    base = df.select(
        *[F.col(k) for k in keys],
        F.expr(md5_long_expr(value_expr)).alias("_h"),
    )
    wb = f"(_h div {HLL_M})"
    rho = (
        f"CASE WHEN {wb} = 0 THEN {HLL_RHO_MAX} "
        f"ELSE {HLL_RHO_MAX} - length(bin({wb})) END"
    )
    return (
        base.select(
            *keys,
            F.expr(f"_h % {HLL_M}").cast("int").alias("register"),
            F.expr(rho).cast("int").alias("rho"),
        )
        .groupBy(*keys, "register")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate_from_registers(
    regs: DataFrame, keys: list[str]
) -> DataFrame:
    """(keys..., n_registers, v_zero, est_distinct) from a register
    table shaped like :func:`hll_registers` output — the read side of
    a sketch maintained elsewhere (e.g. the streaming register table,
    streaming/sketch.py). Bit-deterministic: the harmonic sum is an
    exact bigint, the raw estimate one IEEE divide of a Python-literal
    numerator by that integer cast to double, and the correction
    branch reads the inlined ln table."""
    agg = regs.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("int").alias("n_registers"),
        F.sum(F.expr(f"shiftleft(1L, {HLL_RHO_MAX} - rho)")).alias("_intsum"),
    )
    with_v = agg.select(
        *keys,
        "n_registers",
        (F.lit(HLL_M) - F.col("n_registers")).cast("int").alias("v_zero"),
        "_intsum",
    )
    est_raw = (
        f"{dlit(HLL_ALPHA_NUM)} / "
        f"cast(_intsum + cast(v_zero as bigint) * {HLL_SCALE}L as double)"
    )
    scored = with_v.withColumn("_est_raw", F.expr(est_raw))
    est = (
        f"CASE WHEN v_zero > 0 AND _est_raw <= {dlit(HLL_SMALL_RANGE)} "
        f"THEN element_at({hll_ln_table_literal()}, v_zero) "
        "ELSE _est_raw END"
    )
    return scored.select(
        *keys,
        "n_registers",
        "v_zero",
        F.expr(est).alias("est_distinct"),
    )


def hll_distinct(
    df: DataFrame, keys: list[str], value_expr: str
) -> DataFrame:
    """(keys..., n_registers, v_zero, est_distinct): HLL cardinality
    estimate per key, with the small-range linear-counting correction
    — sketch build and estimate in one plan (see module docstring for
    the bit-determinism contract)."""
    return hll_estimate_from_registers(
        hll_registers(df, keys, value_expr), keys
    )


# --------------------------------------------------------------------------
# Count-min sketch
# --------------------------------------------------------------------------

CM_DEPTH = 4     # independent hash rows; P(overcount) decays as 2^-d
CM_WIDTH = 1024  # counters per row; expected overcount ~ n / w


def _cm_col_expr(i: int, value_expr: str) -> str:
    hashed = md5_long_expr(f"concat('cm{i}:', {value_expr})")
    return f"({hashed}) % {CM_WIDTH}"


def cm_sketch(df: DataFrame, value_expr: str) -> DataFrame:
    """(row, col, cnt): the d x w count-min sketch of ``value_expr``
    occurrences — at most d*w rows out, mergeable by summing cnt.
    The groupBy count completes map-side (d rows per record explode,
    <= d*w partial rows per partition cross the shuffle)."""
    hashes = F.array(
        *[F.expr(_cm_col_expr(i, value_expr)).cast("int") for i in range(CM_DEPTH)]
    )
    return (
        df.select(F.posexplode(hashes).alias("row", "col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_estimate(
    sketch: DataFrame, candidates: DataFrame, value_col: str = "value"
) -> DataFrame:
    """(value, est): count-min point estimate — min over the d rows of
    the candidate's counters (Cormode '05: est >= true count always;
    overcount bounded by collisions). The sketch is <= d*w rows, so it
    broadcasts; candidates stream."""
    # rename FIRST, then hash: the hash exprs reference the real
    # `value` column, not a same-select lateral alias (which generator
    # expressions cannot resolve)
    cand = candidates.select(F.col(value_col).alias("value"))
    expanded = cand.select(
        "value",
        F.posexplode(
            F.array(
                *[
                    F.expr(_cm_col_expr(i, "value")).cast("int")
                    for i in range(CM_DEPTH)
                ]
            )
        ).alias("row", "col"),
    )
    return (
        expanded.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est"))
    )


def cm_heavy_hitters(
    df: DataFrame, value_expr: str, k: int = 10
) -> DataFrame:
    """(value, est, rank): top-k values of ``value_expr`` by count-min
    estimate (est DESC, value ASC tiebreak). All-integer -> exactly
    reproducible by the DuckDB twin.

    The candidate set here is the input's distinct values — the demo
    shape; at 100 TB candidates come from a cheaper prefilter (a
    sample, or per-partition local top-k unioned), and the sketch
    prices each one in O(d) lookups against d*w counters instead of a
    full count table. ``value_expr`` must be string-typed.
    """
    from pyspark.sql import Window

    base = df.select(F.expr(value_expr).alias("value"))
    sketch = cm_sketch(base, "value")
    est = cm_estimate(sketch, base.distinct(), "value")
    # global top-k as orderBy+limit -> TakeOrderedAndProject (per-
    # partition heaps, k rows to the driver-side merge) — the
    # single-partition row_number window then ranks k rows only
    top = est.orderBy(F.col("est").desc(), F.col("value").asc()).limit(int(k))
    w = Window.orderBy(F.col("est").desc(), F.col("value").asc())
    return top.select(
        "value", "est", F.row_number().over(w).alias("rank")
    )


# --------------------------------------------------------------------------
# Histogram quantile sketch (HDR-histogram-style log buckets)
# --------------------------------------------------------------------------

HIST_SUB_BITS = 5                       # 2^5 = 32 sub-buckets per octave
HIST_SUB = 1 << HIST_SUB_BITS           # -> relative error <= 1/32 ~ 3.1%
HIST_EXACT = HIST_SUB << 1              # s < 64: one bucket per integer
HIST_SCALE_BITS = 20
HIST_SCALE = 1 << HIST_SCALE_BITS       # fixed-point: 2^-20 absolute floor

# Exponent-bucketed histogram with linear sub-buckets — the
# HdrHistogram layout (Gil Tene, public domain spec): values scale to
# the integer s = floor(v * 2^20) + 1, small s get an exact bucket,
# larger s share 32 sub-buckets per power of two. State is O(log range
# x 32) counters per key REGARDLESS of input size, counters sum-merge,
# and every step is integer arithmetic off a power-of-two multiply
# (exponent shift — exact in IEEE), so Spark and DuckDB agree on every
# bucket id and the final estimate to the double bit.


def _hist_ops(dialect: str):
    """(int_div, shift_left) SQL formatters for 'spark' / 'duck' — the
    two dialect differences in the histogram arithmetic; length(bin()),
    greatest, floor, ceil, isnan and CAST are engine-shared."""
    if dialect == "spark":
        return (
            lambda a, b: f"(({a}) div ({b}))",
            lambda a, b: f"shiftleft(cast({a} as bigint), {b})",
        )
    if dialect == "duck":
        return (
            lambda a, b: f"(({a}) // ({b}))",
            lambda a, b: f"(cast({a} as bigint) << ({b}))",
        )
    raise ValueError(f"unknown dialect {dialect!r}")


def hist_bucket_expr(s_expr: str, dialect: str = "spark") -> str:
    """Bucket id of the scaled integer ``s_expr`` (>= 1). Exact buckets
    below HIST_EXACT; above, the top SUB_BITS bits after the leading
    one select the sub-bucket (length(bin()) = floor(log2)+1 in both
    engines)."""
    idiv, shl = _hist_ops(dialect)
    msb = f"length(bin({s_expr}))"  # floor(log2 s) + 1 for s >= 1
    e = f"({msb} - 1)"
    sub = f"({idiv(s_expr, shl(1, f'{e} - {HIST_SUB_BITS}'))} - {HIST_SUB})"
    return (
        f"CASE WHEN ({s_expr}) < {HIST_EXACT} THEN ({s_expr}) "
        f"ELSE {HIST_EXACT} + ({e} - {HIST_SUB_BITS + 1}) * {HIST_SUB} + {sub} "
        "END"
    )


def hist_scaled_expr(value_expr: str) -> str:
    """v -> s: clamp negatives to 0, fixed-point scale by 2^20 (an
    exponent shift — the multiply is EXACT for any finite double), +1
    so s >= 1. NaN/NULL are the caller's job to drop."""
    return (
        f"cast(floor(greatest(cast(({value_expr}) as double), 0.0e0) "
        f"* {dlit(float(HIST_SCALE))}) as bigint) + 1"
    )


def hist_bounds_exprs(idx_expr: str, dialect: str = "spark") -> tuple[str, str]:
    """(lo, hi): the inclusive s-range bucket ``idx_expr`` covers —
    the inverse of hist_bucket_expr, pure integer ops."""
    idiv, shl = _hist_ops(dialect)
    g = idiv(f"(({idx_expr}) - {HIST_EXACT})", HIST_SUB)          # octave - 6
    sub = f"((({idx_expr}) - {HIST_EXACT}) % {HIST_SUB})"
    shift = f"({g} + 1)"  # e - SUB_BITS where e = g + SUB_BITS + 1
    lo_big = shl(f"{HIST_SUB} + {sub}", shift)
    hi_big = f"({shl(f'{HIST_SUB} + {sub} + 1', shift)} - 1)"
    lo = f"CASE WHEN ({idx_expr}) < {HIST_EXACT} THEN cast(({idx_expr}) as bigint) ELSE {lo_big} END"
    hi = f"CASE WHEN ({idx_expr}) < {HIST_EXACT} THEN cast(({idx_expr}) as bigint) ELSE {hi_big} END"
    return lo, hi


def hist_estimate_expr(idx_expr: str, dialect: str = "spark") -> str:
    """Representative value of bucket ``idx_expr``: the midpoint of its
    v-range, un-scaling the s = floor(v * 2^20) + 1 map. Integer sum,
    ONE IEEE division — bit-identical cross-engine."""
    lo, hi = hist_bounds_exprs(idx_expr, dialect)
    return (
        f"cast({lo} + {hi} - 2 as double) / {dlit(float(2 * HIST_SCALE))}"
    )


def hist_counts(df: DataFrame, keys: list[str], value_expr: str) -> DataFrame:
    """(keys..., bucket, cnt): THE mergeable artifact — union two count
    tables and sum cnt per (key, bucket) to merge sketches across
    corpora/partitions (partial aggregation does exactly this map-side,
    so only sketch-sized state crosses the shuffle). NULL and NaN
    values are dropped (no rank semantics for them)."""
    base = df.filter(
        F.expr(f"({value_expr}) IS NOT NULL AND NOT isnan(cast(({value_expr}) as double))")
    ).select(
        *[F.col(k) for k in keys],
        F.expr(hist_scaled_expr(value_expr)).alias("_s"),
    )
    return (
        base.select(
            *keys, F.expr(hist_bucket_expr("_s")).cast("int").alias("bucket")
        )
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantiles_from_counts(
    counts: DataFrame, keys: list[str], quantiles: list[float]
) -> DataFrame:
    """(keys..., q, n, est): type-1 (lower) quantile estimates from a
    bucket-count table shaped like :func:`hist_counts` — the read side
    of a sketch maintained elsewhere. For each q: the first bucket
    whose cumulative count reaches rank ceil(q * n), estimated by its
    midpoint. The windows run over the AGGREGATED sketch (O(buckets)
    rows per key, bounded by construction), never the raw input."""
    from pyspark.sql import Window

    if not quantiles:
        raise ValueError("quantiles must be non-empty")
    wcum = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy(*keys)
    cum = counts.select(
        *keys,
        "bucket",
        F.sum("cnt").over(wcum).alias("_cum"),
        F.sum("cnt").over(wall).alias("n"),
    )
    qlit = F.explode(
        F.array(*[F.lit(float(x)).cast("double") for x in sorted(quantiles)])
    ).alias("q")
    hit = (
        cum.select(*keys, "bucket", "_cum", "n", qlit)
        # rank = ceil(q * n): one IEEE multiply + ceil, same both engines
        .filter(F.expr("_cum >= cast(ceil(q * cast(n as double)) as bigint)"))
        .groupBy(*keys, "q", "n")
        .agg(F.min("bucket").alias("_b"))
    )
    return hit.select(
        *keys, "q", "n", F.expr(hist_estimate_expr("_b")).alias("est")
    )


def hist_quantiles(
    df: DataFrame, keys: list[str], value_expr: str, quantiles: list[float]
) -> DataFrame:
    """Sketch build + quantile read in one plan (see hist_counts /
    hist_quantiles_from_counts). Relative error <= 2^-5 per estimate
    (plus the 2^-20 fixed-point floor near zero) — the HdrHistogram
    guarantee — with state O(octaves x 32) per key at any input size."""
    return hist_quantiles_from_counts(
        hist_counts(df, keys, value_expr), keys, quantiles
    )


# --------------------------------------------------------------------------
# Bottom-k sample / KMV distinct estimator
# --------------------------------------------------------------------------

KMV_RANGE = float(1 << 60)  # md5_long is 60 bits


def bottomk_sample(df: DataFrame, key_expr: str, k: int) -> DataFrame:
    """(key, pri): the k input keys with the smallest md5-derived
    priority — a DETERMINISTIC uniform-without-replacement sample (the
    bottom-k / KMV scheme, Bar-Yossef et al. '02): every run, every
    engine, every partitioning picks the SAME k keys, because the
    priority is a pure function of the key, not of an RNG. Mergeable:
    bottom-k of a union == bottom-k of the concatenated per-part
    bottom-k's, so samples maintained per corpus/partition compose by
    union + re-take (property-tested). ``key_expr`` must be a
    string-typed SQL expression and should be unique per entity (the
    sample is of DISTINCT keys; duplicates collapse).

    Plan: orderBy+limit -> TakeOrderedAndProject (per-partition heaps
    of k rows, driver-side merge of n_partitions * k) — no global
    sort, no shuffle of the corpus."""
    if k < 1:
        raise ValueError("k must be >= 1")
    return (
        df.select(F.expr(key_expr).alias("key"))
        .distinct()
        .select("key", F.expr(md5_long_expr("key")).alias("pri"))
        .orderBy("pri", "key")
        .limit(int(k))
    )


def kmv_distinct(df: DataFrame, key_expr: str, k: int = 256) -> DataFrame:
    """(n_sample, est_distinct): KMV cardinality estimate from the
    bottom-k sample — est = (k - 1) / (kth smallest priority / 2^60)
    (Bar-Yossef '02; unbiased for distinct counts >> k). When the
    input has fewer than k distinct keys the sample IS the population
    and the exact count is returned. One IEEE divide off exact
    integers -> bit-identical cross-engine."""
    sample = bottomk_sample(df, key_expr, k)
    agg = sample.agg(
        F.count(F.lit(1)).cast("long").alias("n_sample"),
        F.max("pri").alias("_kth"),
    )
    est = (
        f"CASE WHEN n_sample < {int(k)} THEN cast(n_sample as double) "
        f"ELSE cast(n_sample - 1 as double) / "
        f"(cast(_kth as double) / {dlit(KMV_RANGE)}) END"
    )
    return agg.select("n_sample", F.expr(est).alias("est_distinct"))
