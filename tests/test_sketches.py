"""Sketch operators (operators/sketches.py): HLL + count-min.

Anchors:
- pure-Python HLL / count-min references (same md5 positions) must
  match Spark EXACTLY — registers, fixed-point sum, and the final
  est_distinct double bits;
- mergeability: registers of two disjoint halves, unioned and
  max-merged, equal the whole-corpus registers (the property that
  makes partial aggregation correct at any scale);
- count-min never underestimates, and is exact when no collisions;
- HLL accuracy: relative error within the ~1.04/sqrt(m) regime on a
  cardinality well above the small-range correction.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from logzilla_spark.operators import sketches


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_hll(values) -> tuple[int, int, float]:
    """(n_registers, v_zero, est_distinct) — straight from the
    Flajolet '07 description, same md5 hash + fixed-point sum."""
    m, rho_max = sketches.HLL_M, sketches.HLL_RHO_MAX
    regs: dict[int, int] = {}
    for v in values:
        h = _md5_60(v)
        reg, wb = h % m, h // m
        rho = rho_max if wb == 0 else rho_max - wb.bit_length()
        regs[reg] = max(regs.get(reg, 0), rho)
    v_zero = m - len(regs)
    intsum = sum(1 << (rho_max - r) for r in regs.values())
    est_raw = sketches.HLL_ALPHA_NUM / float(
        intsum + v_zero * sketches.HLL_SCALE
    )
    if v_zero > 0 and est_raw <= sketches.HLL_SMALL_RANGE:
        est = sketches.HLL_LN_TABLE[v_zero - 1]
    else:
        est = est_raw
    return len(regs), v_zero, est


def _py_cm(values) -> dict[str, int]:
    d, w = sketches.CM_DEPTH, sketches.CM_WIDTH
    counters: dict[tuple[int, int], int] = {}
    for v in values:
        for i in range(d):
            c = _md5_60(f"cm{i}:{v}") % w
            counters[(i, c)] = counters.get((i, c), 0) + 1
    return {
        v: min(counters[(i, _md5_60(f"cm{i}:{v}") % w)] for i in range(d))
        for v in set(values)
    }


def _vals(spark, n):
    """n distinct string values u0..u{n-1}."""
    return spark.range(n).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("v")
    )


def test_hll_matches_python_reference_bitwise(spark):
    df = _vals(spark, 700).withColumn("g", F.lit("a"))
    got = sketches.hll_distinct(df, ["g"], "v").collect()[0]
    n_regs, v_zero, est = _py_hll([f"u{i}" for i in range(700)])
    assert got["n_registers"] == n_regs
    assert got["v_zero"] == v_zero
    assert got["est_distinct"] == est  # exact double bits


def test_hll_small_range_branch_matches_python(spark):
    df = _vals(spark, 40).withColumn("g", F.lit("a"))
    got = sketches.hll_distinct(df, ["g"], "v").collect()[0]
    _, v_zero, est = _py_hll([f"u{i}" for i in range(40)])
    assert got["v_zero"] == v_zero and v_zero > 0
    assert got["est_distinct"] == est
    # the correction keeps tiny cardinalities honest
    assert abs(est - 40) / 40 < 0.1


def test_hll_duplicates_do_not_move_registers(spark):
    once = _vals(spark, 300).withColumn("g", F.lit("a"))
    thrice = once.union(once).union(once)
    a = sketches.hll_distinct(once, ["g"], "v").collect()[0]
    b = sketches.hll_distinct(thrice, ["g"], "v").collect()[0]
    assert tuple(a) == tuple(b)


def test_hll_registers_merge_across_splits(spark):
    whole = _vals(spark, 1000).withColumn("g", F.lit("a"))
    left = whole.filter(F.expr("cast(substring(v, 2, 10) as int) % 2 = 0"))
    right = whole.filter(F.expr("cast(substring(v, 2, 10) as int) % 2 = 1"))
    merged = (
        sketches.hll_registers(left, ["g"], "v")
        .unionByName(sketches.hll_registers(right, ["g"], "v"))
        .groupBy("g", "register")
        .agg(F.max("rho").alias("rho"))
    )
    full = sketches.hll_registers(whole, ["g"], "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_hll_accuracy_above_correction_range(spark):
    n = 5000  # est_raw branch (5000 >> 2.5 * 512)
    df = _vals(spark, n).withColumn("g", F.lit("a"))
    est = sketches.hll_distinct(df, ["g"], "v").collect()[0]["est_distinct"]
    # 3 sigma of 1.04/sqrt(512) ~= 13.8%
    assert abs(est - n) / n < 0.14


def test_cm_matches_python_and_never_underestimates(spark):
    # skewed multiset: value u{i} appears (i % 7) + 1 times
    df = (
        spark.range(200)
        .select(
            F.concat(F.lit("u"), F.col("id").cast("string")).alias("v"),
            ((F.col("id") % 7) + 1).alias("n"),
        )
        .select(F.expr("explode(array_repeat(v, cast(n as int)))").alias("v"))
    )
    vals = [f"u{i}" for i in range(200) for _ in range(i % 7 + 1)]
    ref = _py_cm(vals)
    sketch = sketches.cm_sketch(df, "v")
    est = {
        r["value"]: r["est"]
        for r in sketches.cm_estimate(sketch, df.distinct(), "v").collect()
    }
    assert est == ref
    true = {f"u{i}": i % 7 + 1 for i in range(200)}
    assert all(est[v] >= true[v] for v in true)


def test_cm_heavy_hitters_top_k(spark):
    # u0 x 50, u1 x 30, u2..u41 x 1
    df = spark.range(42).select(
        F.expr(
            "explode(array_repeat(concat('u', cast(id as string)), "
            "cast(CASE WHEN id = 0 THEN 50 WHEN id = 1 THEN 30 ELSE 1 END "
            "as int)))"
        ).alias("v")
    )
    top = sketches.cm_heavy_hitters(df, "v", k=2).collect()
    assert [(r["value"], r["rank"]) for r in top] == [("u0", 1), ("u1", 2)]
    assert top[0]["est"] >= 50 and top[1]["est"] >= 30


def test_cm_sketch_is_fixed_size(spark):
    big = _vals(spark, 4000)
    n = sketches.cm_sketch(big, "v").count()
    assert n <= sketches.CM_DEPTH * sketches.CM_WIDTH
