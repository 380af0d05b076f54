"""Unit semantics for log-to-metric extraction (operators/metrics.py).

The registry oracle run proves cross-engine equality on the synthetic
corpus; these pin the SEMANTICS on hand-built inputs — the exact
discrete quantile rule, NULL/garbage exclusion, duplicate-value
histogram collapse, and per-(key, bucket) independence.
"""

from __future__ import annotations

import datetime as dt

import pytest

from logzilla_spark.operators.metrics import extract_metrics


def _ts(h: int, m: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m, 0)


def _df(spark, rows):
    # rows: (key, ts, value-as-string)
    return spark.createDataFrame(
        rows, "key string, ts timestamp, val string"
    )


def _run(spark, rows, **kw):
    return extract_metrics(
        _df(spark, rows), "val", "key", ts_col="ts", **kw
    ).collect()


class TestExtractMetrics:
    def test_stats_and_quantiles_by_inspection(self, spark):
        # values 1..20 in one bucket: p50 = min(v : 2*cum >= n) = 10,
        # p95 = min(v : 20*cum >= 19*n) = 19.
        rows = [("a", _ts(3, i), str(v)) for i, v in enumerate(range(1, 21))]
        [r] = _run(spark, rows)
        assert r["bucket"] == _ts(3)
        assert (r["cnt"], r["v_sum"], r["v_min"], r["v_max"]) == (20, 210, 1, 20)
        assert r["v_avg"] == 10.5
        assert (r["p50"], r["p95"]) == (10, 19)

    def test_duplicates_weight_the_quantile(self, spark):
        # histogram {1: 9, 100: 1}: p50 = 1, p95 = 100 (20*9 < 19*10).
        rows = [("a", _ts(0, i), "1") for i in range(9)]
        rows += [("a", _ts(0, 59), "100")]
        [r] = _run(spark, rows)
        assert (r["p50"], r["p95"], r["v_max"]) == (1, 100, 100)

    def test_single_sample(self, spark):
        [r] = _run(spark, [("a", _ts(0), "7")])
        assert (r["cnt"], r["p50"], r["p95"], r["v_avg"]) == (1, 7, 7, 7.0)

    def test_null_and_garbage_values_are_excluded(self, spark):
        rows = [
            ("a", _ts(0), "5"),
            ("a", _ts(0, 1), None),     # missing field
            ("a", _ts(0, 2), "12kb"),   # unparseable -> excluded, no ANSI error
            (None, _ts(0, 3), "9"),     # NULL key
            ("a", None, "9"),           # NULL ts
        ]
        [r] = _run(spark, rows)
        assert (r["cnt"], r["v_sum"]) == (1, 5)

    def test_buckets_and_keys_are_independent(self, spark):
        rows = [
            ("a", _ts(0, 5), "1"),
            ("a", _ts(0, 50), "3"),
            ("a", _ts(1, 5), "100"),
            ("b", _ts(0, 5), "7"),
        ]
        got = {(r["key"], r["bucket"].hour): r for r in _run(spark, rows)}
        assert got[("a", 0)]["cnt"] == 2 and got[("a", 0)]["p50"] == 1
        assert got[("a", 1)]["cnt"] == 1 and got[("a", 1)]["v_max"] == 100
        assert got[("b", 0)]["v_sum"] == 7

    def test_invalid_quantile_rejected(self, spark):
        with pytest.raises(ValueError, match="need 0 < num <= den"):
            _run(spark, [("a", _ts(0), "1")], quantiles={"bad": (3, 2)})

    def test_histogram_collapses_before_shuffle(self, spark):
        # the first aggregate's key must be (key, bucket, v): partial
        # aggregation collapses duplicate values map-side, so the
        # shuffle carries the histogram. Pin the two-level aggregate
        # shape (no corpus-sized window input).
        df = extract_metrics(
            _df(spark, [("a", _ts(0), "1"), ("a", _ts(0), "1")]),
            "val", "key", ts_col="ts",
        )
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Aggregate") == 2
        assert "Window" in plan


# -- property: Spark quantiles == a pure-Python reference of the rule --

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _ref_metrics(values, quantiles):
    """Pure-Python reference of the documented rank rule:
    p_q = min(v : den * cum >= num * n) over the sorted histogram."""
    vs = sorted(values)
    n = len(vs)
    out = {
        "cnt": n,
        "v_sum": sum(vs),
        "v_min": vs[0],
        "v_max": vs[-1],
        "v_avg": float(sum(vs)) / float(n),
    }
    for name, (num, den) in quantiles.items():
        cum = 0
        seen = None
        for v in vs:
            cum += 1
            if den * cum >= num * n:
                seen = v
                break
        out[name] = seen
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=60
    ),
    qnum=st.integers(min_value=1, max_value=20),
)
def test_quantile_rule_matches_python_reference(values, qnum, spark):
    quantiles = {"p50": (1, 2), "p95": (19, 20), "pq": (qnum, 20)}
    df = spark.createDataFrame(
        [("k", dt.datetime(2024, 1, 1), str(v)) for v in values],
        "key string, ts timestamp, val string",
    )
    [r] = extract_metrics(df, "val", "key", ts_col="ts", quantiles=quantiles).collect()
    ref = _ref_metrics(values, quantiles)
    for k, want in ref.items():
        assert r[k] == want, (k, r[k], want, sorted(values))
