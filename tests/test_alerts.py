"""Continuous alert evaluation (streaming/alerts.py).

Rule semantics by inspection, exactly-once ledger behavior, and the
differential contract: a stream split across triggers lands exactly
the batch alert set, each firing once.
"""

from __future__ import annotations

import datetime as dt
import os

import pytest

from logzilla_spark.operators.aggregate import windowed_counts
from logzilla_spark.operators.parse import parse_records
from logzilla_spark.schemas import PAGES_SCHEMA
from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.streaming.alerts import (
    AlertRule,
    alert_batch,
    evaluate_alerts,
    start_alert_stream,
)

from .test_streaming import staged_pages  # noqa: F401 (fixture reuse)

RULES = [
    AlertRule("error_burst", min_count=3, level="ERROR"),
    AlertRule("unparsed_any", min_count=1, category="unparsed"),
    AlertRule("hot_window", min_count=40),
]


def _agg(spark, rows):
    # rows: (window-hour, category, level, n)
    return spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1, h), dt.datetime(2024, 1, 1, h + 1), c, l, n)
            for h, c, l, n in rows
        ],
        "window_start timestamp, window_end timestamp, "
        "category string, level string, n bigint",
    )


class TestEvaluateAlerts:
    def test_thresholds_and_wildcards(self, spark):
        agg = _agg(
            spark,
            [
                (0, "json", "ERROR", 3),      # error_burst (==, boundary fires)
                (1, "json", "ERROR", 2),      # below threshold
                (0, "unparsed", "UNKNOWN", 1),  # unparsed_any
                (2, "access", "INFO", 40),    # hot_window (wildcards)
            ],
        )
        got = {
            (r["rule_name"], r["window_start"].hour) for r in
            evaluate_alerts(agg, RULES).collect()
        }
        assert got == {
            ("error_burst", 0),
            ("unparsed_any", 0),
            ("hot_window", 2),
        }

    def test_one_row_can_trip_multiple_rules(self, spark):
        agg = _agg(spark, [(0, "json", "ERROR", 50)])
        names = sorted(
            r["rule_name"] for r in evaluate_alerts(agg, RULES).collect()
        )
        assert names == ["error_burst", "hot_window"]

    def test_rule_validation(self, spark):
        agg = _agg(spark, [(0, "json", "INFO", 1)])
        with pytest.raises(ValueError, match="min_count"):
            AlertRule("bad", min_count=0)
        with pytest.raises(ValueError, match="duplicate"):
            evaluate_alerts(agg, [AlertRule("x", 1), AlertRule("x", 2)])
        with pytest.raises(ValueError, match="empty rule set"):
            evaluate_alerts(agg, [])


class TestAlertLedger:
    def test_fires_once_as_window_grows(self, spark, tmp_path):
        cat = LocalCatalog(str(tmp_path / "wh"))
        # epoch 0: window crosses the threshold; epoch 1: same window
        # revised upward — must NOT fire again.
        assert alert_batch(cat, _agg(spark, [(0, "json", "ERROR", 3)]), 0, RULES)
        assert alert_batch(cat, _agg(spark, [(0, "json", "ERROR", 9)]), 1, RULES)
        rows = cat.read(spark, "stream_alerts").collect()
        assert len(rows) == 1
        assert rows[0]["n"] == 3  # the count that tripped it, not the revision

    def test_replayed_epoch_is_skipped(self, spark, tmp_path):
        cat = LocalCatalog(str(tmp_path / "wh"))
        batch = _agg(spark, [(0, "json", "ERROR", 5)])
        assert alert_batch(cat, batch, 0, RULES) is True
        assert alert_batch(cat, batch, 0, RULES) is False
        assert cat.read(spark, "stream_alerts").count() == 1

    def test_empty_epoch_still_advances_the_commit_map(self, spark, tmp_path):
        cat = LocalCatalog(str(tmp_path / "wh"))
        quiet = _agg(spark, [(0, "json", "INFO", 1)])
        assert alert_batch(cat, quiet, 0, RULES) is True
        assert cat.read(spark, "stream_alerts").count() == 0
        assert alert_batch(cat, quiet, 0, RULES) is False  # replay recognized


class TestAlertStreamDifferential:
    def test_stream_matches_batch_alert_set(self, spark, staged_pages):  # noqa: F811
        base, in_dir = staged_pages
        wh = os.path.join(base, "wh_alerts")
        # watermark wider than the corpus's event-time span: the 3-way
        # url-hash split interleaves event times across trigger files,
        # so a narrow watermark would drop genuinely-late rows the
        # batch twin keeps (late-data EVICTION semantics are pinned in
        # test_streaming; this test pins trigger-splitting + the
        # at-most-once firing contract).
        q = start_alert_stream(
            spark,
            in_dir,
            wh,
            os.path.join(base, "ckpt_alerts"),
            RULES,
            watermark="9 days",
            max_files_per_trigger=1,  # 3 micro-batches
        )
        q.awaitTermination(timeout=300)

        cat = LocalCatalog(wh)
        got = {
            (r["rule_name"], r["window_start"], r["window_end"],
             r["category"], r["level"])
            for r in cat.read(spark, "stream_alerts").collect()
        }
        batch_records = parse_records(
            spark.read.schema(PAGES_SCHEMA).parquet(in_dir), impl="arrow"
        )
        expect_df = evaluate_alerts(
            windowed_counts(
                batch_records, time_col="timestamp", keys=("category", "level")
            ),
            RULES,
        )
        expect = {
            (r["rule_name"], r["window_start"], r["window_end"],
             r["category"], r["level"])
            for r in expect_df.collect()
        }
        assert got == expect and got
        # each identity fired exactly once
        assert cat.read(spark, "stream_alerts").count() == len(got)


class TestAnomalyAlerts:
    def _agg_batch(self, spark, rows):
        # rows: (hour, category, level, n)
        return _agg(spark, rows)

    def test_spike_fires_once_quiet_keys_never(self, spark, tmp_path):
        from logzilla_spark.sources.catalog import LocalCatalog
        from logzilla_spark.streaming.alerts import anomaly_alert_batch
        from logzilla_spark.streaming.stream_pipeline import upsert_agg_batch

        cat = LocalCatalog(str(tmp_path / "wh"))
        # epoch 0: 14h wobbly baseline for (json, ERROR); flat noise key
        base = [(h, "json", "ERROR", 1 + h % 2) for h in range(14)]
        base += [(h, "access", "INFO", 3) for h in range(14)]
        b0 = self._agg_batch(spark, base)
        upsert_agg_batch(spark, cat, b0, batch_id=0)
        assert anomaly_alert_batch(cat, b0, 0)
        assert cat.read(spark, "stream_anomaly_alerts").count() == 0

        # epoch 1: hour 14 spikes for the ERROR key only
        b1 = self._agg_batch(spark, [(14, "json", "ERROR", 60),
                                     (14, "access", "INFO", 3)])
        upsert_agg_batch(spark, cat, b1, batch_id=1)
        assert anomaly_alert_batch(cat, b1, 1)
        rows = cat.read(spark, "stream_anomaly_alerts").collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["category"], r["level"], r["x"]) == ("json", "ERROR", 60)
        assert r["z"] > 3.0 and r["window_start"].hour == 14

        # epoch 2: the SAME window revised upward — no second firing;
        # replayed epoch — skipped whole
        b2 = self._agg_batch(spark, [(14, "json", "ERROR", 90)])
        upsert_agg_batch(spark, cat, b2, batch_id=2)
        assert anomaly_alert_batch(cat, b2, 2)
        assert anomaly_alert_batch(cat, b2, 2) is False
        assert cat.read(spark, "stream_anomaly_alerts").count() == 1

    def test_evaluation_restricted_to_changed_keys(self, spark, tmp_path):
        # an epoch touching only key B must not fire key A's windows
        # (even if A's history would flag) — A wasn't revised.
        from logzilla_spark.sources.catalog import LocalCatalog
        from logzilla_spark.streaming.alerts import anomaly_alert_batch
        from logzilla_spark.streaming.stream_pipeline import upsert_agg_batch

        cat = LocalCatalog(str(tmp_path / "wh"))
        a_hist = [(h, "json", "ERROR", 1 + h % 2) for h in range(14)]
        a_hist += [(14, "json", "ERROR", 60)]  # A spikes
        b_hist = [(h, "access", "INFO", 2 + h % 2) for h in range(15)]
        b0 = self._agg_batch(spark, a_hist + b_hist)
        upsert_agg_batch(spark, cat, b0, batch_id=0)
        # epoch 0's anomaly pass is SKIPPED (simulating a deployment
        # that enabled alerting later); epoch 1 touches only B
        b1 = self._agg_batch(spark, [(15, "access", "INFO", 2)])
        upsert_agg_batch(spark, cat, b1, batch_id=1)
        assert anomaly_alert_batch(cat, b1, 1, query_id="anomaly_alerts")
        cats = {
            r["category"]
            for r in cat.read(spark, "stream_anomaly_alerts").collect()
        }
        assert "json" not in cats

    def test_stream_composition_end_to_end(self, spark, staged_pages):  # noqa: F811
        from logzilla_spark.sources.catalog import LocalCatalog
        from logzilla_spark.streaming.alerts import start_anomaly_alert_stream

        base, in_dir = staged_pages
        wh = os.path.join(base, "wh_anom")
        q = start_anomaly_alert_stream(
            spark, in_dir, wh, os.path.join(base, "ckpt_anom"),
            z_threshold=2.0, min_history=6, watermark="9 days",
            max_files_per_trigger=1,
        )
        q.awaitTermination(timeout=300)
        cat = LocalCatalog(wh)
        # both tables exist and the ledger is consistent: every firing's
        # identity is unique and refers to a window in the agg table
        ledger = cat.read(spark, "stream_anomaly_alerts")
        n = ledger.count()
        assert ledger.select("rule_name", "window_start", "category", "level").distinct().count() == n
        agg = cat.read(spark, "stream_agg").select(
            "window_start", "category", "level"
        )
        joined = ledger.join(
            agg, ["window_start", "category", "level"], "left_semi"
        )
        assert joined.count() == n
