"""Unit semantics for log template mining and rate-anomaly detection.

The registry-level oracle runs (verify_oracle / the driver gate) prove
cross-engine equality on the synthetic corpus; these tests pin the
SEMANTICS on hand-built inputs where the right answer is known by
inspection — masking rules, arity separation, zero-fill, warm-up NULLs,
constant-baseline NULLs, and the 3-sigma flag itself.
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from logzilla_spark.operators.anomaly import rate_anomalies
from logzilla_spark.operators.templates import mine_templates, template_delta


def _ts(h: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, 30, 0)


class TestMineTemplates:
    def test_digit_masking_and_volume(self, spark):
        lines = [
            'node1 GET /idx 200 17',
            'node2 GET /idx 500 9',
            'node1 GET /idx 200 17',  # exact dup of line 1
            'ready',                  # no digits -> literal template
            'worker7 ready',          # digit token masked
        ]
        df = spark.createDataFrame([(l,) for l in lines], ["line"])
        out = {r["template"]: r for r in mine_templates(df).collect()}
        t = "<*> GET /idx <*> <*>"
        assert out[t]["n"] == 3
        assert out[t]["n_variants"] == 2
        assert out[t]["n_tokens"] == 5
        # byte-min raw line is the representative
        assert out[t]["example"] == "node1 GET /idx 200 17"
        assert out["ready"]["n"] == 1
        assert out["<*> ready"]["n"] == 1

    def test_arity_keeps_templates_apart(self, spark):
        # "<*>" and "<*> <*>" already differ textually, but "x 1" vs
        # "x  1" (double space -> empty token) only differ by n_tokens.
        df = spark.createDataFrame([("x 1",), ("x  1",)], ["line"])
        rows = mine_templates(df).collect()
        keys = {(r["template"], r["n_tokens"]) for r in rows}
        assert keys == {("x <*>", 2), ("x  <*>", 3)}

    def test_empty_line_is_reported(self, spark):
        df = spark.createDataFrame([("",), ("",)], ["line"])
        [r] = mine_templates(df).collect()
        assert r["template"] == "" and r["n"] == 2 and r["n_tokens"] == 1


class TestTemplateDelta:
    SPLIT = "2024-01-04 00:00:00"

    def _lines(self, spark, rows):
        # rows: (line, day-of-january)
        return spark.createDataFrame(
            [(l, dt.datetime(2024, 1, d)) for l, d in rows],
            ["line", "warc_ts"],
        )

    def test_statuses_by_inspection(self, spark):
        rows = (
            [("boot ok", 2)]                                  # vanished
            + [("oom killed pid 4", 5)] * 3                   # new
            + [("req 1 done", 2), ("req 2 done", 5), ("req 3 done", 6)]  # up (1 -> 2)
            + [("cache miss 9", 1)] * 4 + [("cache miss 9", 6)] * 2      # down (4 -> 2)
            + [("tick 0", 2), ("tick 0", 3), ("tick 1", 5),
               ("tick 2", 6), ("tick 3", 6)]                  # steady (2 -> 3)
        )
        out = {
            r["template"]: r
            for r in template_delta(self._lines(spark, rows), self.SPLIT).collect()
        }
        assert out["boot ok"]["status"] == "vanished"
        assert out["boot ok"]["ratio"] == 0.0
        assert out["oom killed pid <*>"]["status"] == "new"
        assert out["oom killed pid <*>"]["ratio"] is None
        assert out["req <*> done"]["status"] == "up"
        assert out["req <*> done"]["ratio"] == 2.0
        assert out["cache miss <*>"]["status"] == "down"
        assert out["cache miss <*>"]["n_base"] == 4
        assert out["cache miss <*>"]["n_cur"] == 2
        assert out["tick <*>"]["status"] == "steady"
        assert out["tick <*>"]["ratio"] == 1.5

    def test_split_boundary_belongs_to_current(self, spark):
        rows = [("edge 1", 4)]  # exactly at the split instant
        [r] = template_delta(self._lines(spark, rows), self.SPLIT).collect()
        assert (r["n_base"], r["n_cur"], r["status"]) == (0, 1, "new")

    def test_null_ts_counts_as_baseline(self, spark):
        df = spark.createDataFrame(
            [("late 5", None), ("late 6", dt.datetime(2024, 1, 5))],
            "line string, warc_ts timestamp",
        )
        [r] = template_delta(df, self.SPLIT).collect()
        assert (r["n_base"], r["n_cur"], r["status"]) == (1, 1, "steady")

    def test_one_scan_one_aggregate(self, spark):
        # the delta must never be two mined runs joined: exactly one
        # scan of the input and no Join in the optimized plan.
        df = self._lines(spark, [("a 1", 2), ("a 2", 5)])
        plan = template_delta(df, self.SPLIT)._jdf.queryExecution().optimizedPlan().toString()
        assert "Join" not in plan
        assert plan.count("LogicalRDD") == 1


class TestRateAnomalies:
    def _events(self, spark, rows):
        return spark.createDataFrame(rows, ["event_type", "ts"])

    def test_spike_is_flagged_and_zero_fill_counts(self, spark):
        # key "svc": alternating 1/2 events per hour for hours 0..12
        # (variance must be nonzero — a perfectly constant baseline has
        # no finite z by design), then 50 at hour 13.
        rows = [
            ("svc", _ts(h)) for h in range(13) for _ in range(1 + h % 2)
        ]
        rows += [("svc", _ts(13))] * 50
        df = self._events(spark, rows)
        out = {
            r["bucket"].hour: r
            for r in rate_anomalies(df, "event_type").collect()
        }
        assert len(out) == 14  # dense grid over the span
        spike = out[13]
        assert spike["x"] == 50 and spike["n_hist"] == 13
        assert spike["is_anomaly"] is True
        # a normal bucket on the same wobbly baseline: scored, not flagged
        assert out[12]["z"] is not None and out[12]["is_anomaly"] is False
        # hand-check z against the exact integer window sums
        s1, s2, n = 7 * 1 + 6 * 2, 7 * 1 + 6 * 4, 13
        sd = math.sqrt((n * s2 - s1 * s1) / (n * (n - 1)))
        assert abs(spike["z"] - (50 - s1 / n) / sd) < 1e-12

    def test_constant_baseline_spike_surfaces_with_null_z(self, spark):
        # flat 1/hour then a spike: zero variance -> z NULL, not +inf;
        # the bucket still surfaces as x > baseline with z NULL.
        rows = [("svc", _ts(h)) for h in range(13)]
        rows += [("svc", _ts(13))] * 50
        out = {
            r["bucket"].hour: r
            for r in rate_anomalies(
                self._events(spark, rows), "event_type"
            ).collect()
        }
        assert out[13]["x"] == 50
        assert out[13]["z"] is None and out[13]["is_anomaly"] is False

    def test_warmup_is_null_not_flagged(self, spark):
        rows = [("svc", _ts(h)) for h in range(6) for _ in range(h + 1)]
        df = self._events(spark, rows)
        for r in rate_anomalies(df, "event_type").collect():
            assert r["n_hist"] < 12
            assert r["z"] is None and r["is_anomaly"] is False

    def test_gap_buckets_pull_baseline_down(self, spark):
        # key quiet except hours {0, 20}: the grid must materialize the
        # silent hours as x=0 rows (they ARE the baseline).
        rows = [("svc", _ts(0)), ("svc", _ts(20))]
        out = rate_anomalies(self._events(spark, rows), "event_type")
        got = {r["bucket"].hour: r["x"] for r in out.collect()}
        assert got == {h: (1 if h in (0, 20) else 0) for h in range(21)}

    def test_per_key_baselines_are_independent(self, spark):
        # chatty key at 100/hour and quiet key at 1/hour, both flat:
        # neither is anomalous against its own baseline.
        rows = [("loud", _ts(h)) for h in range(20) for _ in range(100)]
        rows += [("quiet", _ts(h)) for h in range(20)]
        out = rate_anomalies(self._events(spark, rows), "event_type")
        assert all(not r["is_anomaly"] for r in out.collect())


class TestRateAnomaliesFromCounts:
    def test_from_counts_equals_raw_scoring(self, spark):
        # the split must be transparent: pre-aggregated counts through
        # rate_anomalies_from_counts == raw events through the
        # one-corpus-scan wrapper.
        from logzilla_spark.operators.anomaly import rate_anomalies_from_counts

        rows = [
            ("svc", _ts(h)) for h in range(15) for _ in range(1 + h % 3)
        ] + [("svc", _ts(15))] * 40 + [("other", _ts(2))]
        df = spark.createDataFrame(rows, ["event_type", "ts"])
        raw = sorted(map(tuple, rate_anomalies(df, "event_type").collect()))
        counts = df.groupBy(
            df.event_type.alias("key"),
            F.date_trunc("hour", df.ts).alias("bucket"),
        ).count().withColumnRenamed("count", "x")
        pre = sorted(
            map(tuple, rate_anomalies_from_counts(counts).collect())
        )
        assert raw == pre and raw

    def test_scores_the_maintained_agg_table(self, spark, tmp_path):
        # the 100 TB shape: anomaly scoring reads the exactly-once
        # stream_agg table (metadata scale), never the raw corpus.
        from logzilla_spark.operators.anomaly import rate_anomalies_from_counts
        from logzilla_spark.sources.catalog import LocalCatalog
        from logzilla_spark.streaming.stream_pipeline import upsert_agg_batch

        cat = LocalCatalog(str(tmp_path / "wh"))

        def batch(day_hours):
            return spark.createDataFrame(
                [
                    (dt.datetime(2024, 1, 1, h), dt.datetime(2024, 1, 1, h + 1),
                     "json", "ERROR", n)
                    for h, n in day_hours
                ],
                "window_start timestamp, window_end timestamp, "
                "category string, level string, n bigint",
            )

        upsert_agg_batch(
            spark, cat, batch([(h, 1 + h % 2) for h in range(14)]), batch_id=0
        )
        upsert_agg_batch(spark, cat, batch([(14, 60)]), batch_id=1)

        agg = cat.read(spark, "stream_agg").select(
            F.concat_ws("/", "category", "level").alias("key"),
            F.col("window_start").alias("bucket"),
            F.col("n").alias("x"),
        )
        out = {
            r["bucket"].hour: r
            for r in rate_anomalies_from_counts(agg).collect()
        }
        assert out[14]["x"] == 60 and out[14]["is_anomaly"] is True
        assert not any(r["is_anomaly"] for h, r in out.items() if h != 14)
