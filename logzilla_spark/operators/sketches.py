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
