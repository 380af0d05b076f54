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


# --------------------------------------------------------------------------
# Histogram quantile sketch
# --------------------------------------------------------------------------


def _py_hist_bucket(v: float) -> int:
    """Pure-Python reference of hist_scaled_expr + hist_bucket_expr."""
    s = int(math.floor(max(float(v), 0.0) * sketches.HIST_SCALE)) + 1
    if s < sketches.HIST_EXACT:
        return s
    e = s.bit_length() - 1
    sub = (s >> (e - sketches.HIST_SUB_BITS)) - sketches.HIST_SUB
    return sketches.HIST_EXACT + (e - sketches.HIST_SUB_BITS - 1) * sketches.HIST_SUB + sub


def _py_hist_estimate(idx: int) -> float:
    if idx < sketches.HIST_EXACT:
        lo = hi = idx
    else:
        g, sub = divmod(idx - sketches.HIST_EXACT, sketches.HIST_SUB)
        shift = g + 1
        lo = (sketches.HIST_SUB + sub) << shift
        hi = ((sketches.HIST_SUB + sub + 1) << shift) - 1
    return float(lo + hi - 2) / float(2 * sketches.HIST_SCALE)


def _value_df(spark, vals):
    return spark.createDataFrame([(float(v),) for v in vals], "value double")


def test_hist_buckets_match_python_reference(spark):
    # spans the exact region, octave boundaries, and large values
    vals = [0.0, 1e-7, 0.4, 1.0, 3.9, 5.0, 61 / sketches.HIST_SCALE,
            0.001, 2.5, 17.3, 999.25, 123456.789]
    got = (
        _value_df(spark, vals)
        .selectExpr(
            "value",
            f"{sketches.hist_bucket_expr(sketches.hist_scaled_expr('value'))} AS b",
        )
        .collect()
    )
    for r in got:
        assert r.b == _py_hist_bucket(r.value), r.value


def test_hist_quantiles_match_python_and_are_accurate(spark):
    import random

    rng = random.Random(7)
    vals = [rng.lognormvariate(2.0, 1.0) for _ in range(5000)]
    df = _value_df(spark, vals).withColumn("k", F.lit("a"))
    out = {
        r.q: r
        for r in sketches.hist_quantiles(df, ["k"], "value", [0.5, 0.9, 0.99]).collect()
    }
    svals = sorted(vals)
    for q in (0.5, 0.9, 0.99):
        exact = svals[math.ceil(q * len(vals)) - 1]
        # python reference: first bucket whose cum count reaches the rank
        counts: dict[int, int] = {}
        for v in vals:
            b = _py_hist_bucket(v)
            counts[b] = counts.get(b, 0) + 1
        rank, cum, hit = math.ceil(q * len(vals)), 0, None
        for b in sorted(counts):
            cum += counts[b]
            if cum >= rank:
                hit = b
                break
        ref = _py_hist_estimate(hit)
        got = out[q]
        assert got.n == len(vals)
        assert got.est == ref  # bit-exact vs the python reference
        # HdrHistogram guarantee: within one bucket of the true quantile
        assert abs(got.est - exact) <= exact / sketches.HIST_SUB + 2 / sketches.HIST_SCALE


def test_hist_counts_merge_across_splits(spark):
    import random

    rng = random.Random(11)
    vals = [rng.expovariate(0.1) for _ in range(2000)]
    df = _value_df(spark, vals).withColumn("k", F.lit("a"))
    whole = sketches.hist_counts(df, ["k"], "value")
    a = sketches.hist_counts(
        _value_df(spark, vals[:900]).withColumn("k", F.lit("a")), ["k"], "value"
    )
    b = sketches.hist_counts(
        _value_df(spark, vals[900:]).withColumn("k", F.lit("a")), ["k"], "value"
    )
    merged = a.unionByName(b).groupBy("k", "bucket").agg(F.sum("cnt").alias("cnt"))
    lhs = {(r.k, r.bucket): r.cnt for r in merged.collect()}
    rhs = {(r.k, r.bucket): r.cnt for r in whole.collect()}
    assert lhs == rhs
    # and the quantile read off the merged sketch equals the one-shot
    direct = sketches.hist_quantiles(df, ["k"], "value", [0.5, 0.95]).collect()
    from_merged = sketches.hist_quantiles_from_counts(merged, ["k"], [0.5, 0.95]).collect()
    assert sorted((r.q, r.est) for r in direct) == sorted(
        (r.q, r.est) for r in from_merged
    )


def test_hist_drops_null_and_nan(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (float("nan"),), (2.0,)], "value double"
    ).withColumn("k", F.lit("a"))
    out = sketches.hist_quantiles(df, ["k"], "value", [0.5]).collect()
    assert out[0].n == 2


def test_hist_negative_values_clamp_to_zero_bucket(spark):
    df = _value_df(spark, [-5.0, -0.001, 0.0]).withColumn("k", F.lit("a"))
    counts = sketches.hist_counts(df, ["k"], "value").collect()
    assert len(counts) == 1 and counts[0].bucket == 1 and counts[0].cnt == 3


# --------------------------------------------------------------------------
# Bottom-k sample / KMV
# --------------------------------------------------------------------------


def test_bottomk_matches_python_and_is_deterministic(spark):
    df = _vals(spark, 500)
    got = [(r.key, r.pri) for r in sketches.bottomk_sample(df, "v", 20).collect()]
    want = sorted(
        ((f"u{i}", _md5_60(f"u{i}")) for i in range(500)), key=lambda t: (t[1], t[0])
    )[:20]
    assert got == want
    # partitioning cannot change a deterministic sample
    again = [
        (r.key, r.pri)
        for r in sketches.bottomk_sample(df.repartition(7), "v", 20).collect()
    ]
    assert again == got


def test_bottomk_merge_property(spark):
    """bottom-k of a union == bottom-k of the concatenated per-part
    bottom-k's — the property that lets per-corpus samples compose."""
    a, b = _vals(spark, 300), spark.range(300, 700).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("v")
    )
    k = 25
    whole = sketches.bottomk_sample(a.unionByName(b), "v", k).collect()
    parts = sketches.bottomk_sample(a, "v", k).unionByName(
        sketches.bottomk_sample(b, "v", k)
    )
    retaken = parts.orderBy("pri", "key").limit(k).collect()
    assert [(r.key, r.pri) for r in whole] == [(r.key, r.pri) for r in retaken]


def test_bottomk_duplicates_collapse(spark):
    df = _vals(spark, 10).unionByName(_vals(spark, 10))
    assert sketches.bottomk_sample(df, "v", 100).count() == 10


def test_kmv_exact_below_k_and_estimates_above(spark):
    small = sketches.kmv_distinct(_vals(spark, 50), "v", k=256).collect()[0]
    assert small.n_sample == 50 and small.est_distinct == 50.0
    big = sketches.kmv_distinct(_vals(spark, 20000), "v", k=256).collect()[0]
    assert big.n_sample == 256
    # KMV relative std ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert abs(big.est_distinct - 20000) / 20000 < 0.25
