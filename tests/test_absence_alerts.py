"""Absence alerts over the maintained agg table
(streaming/alerts.absence_alert_batch, T74)."""

import datetime as dt

import pytest

from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.streaming.alerts import absence_alert_batch
from logzilla_spark.streaming.stream_pipeline import upsert_agg_batch

from .test_streaming import staged_pages  # noqa: F401 (fixture reuse)


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


@pytest.fixture()
def cat(tmp_path):
    return LocalCatalog(str(tmp_path / "wh"))


def test_dead_key_fires_once_live_keys_never(spark, cat):
    # epoch 0: both keys active through hour 3
    b0 = _agg(spark, [(h, "json", "ERROR", 2) for h in range(4)]
              + [(h, "access", "INFO", 3) for h in range(4)])
    upsert_agg_batch(spark, cat, b0, batch_id=0)
    assert absence_alert_batch(cat, b0, 0, silence_hours=2)
    assert cat.read(spark, "stream_absence_alerts").count() == 0

    # epochs 1-2: only access continues (hours 4-6); json silent
    b1 = _agg(spark, [(h, "access", "INFO", 3) for h in (4, 5)])
    upsert_agg_batch(spark, cat, b1, batch_id=1)
    assert absence_alert_batch(cat, b1, 1, silence_hours=2)
    assert cat.read(spark, "stream_absence_alerts").count() == 0  # gap == 2h

    b2 = _agg(spark, [(6, "access", "INFO", 3)])
    upsert_agg_batch(spark, cat, b2, batch_id=2)
    assert absence_alert_batch(cat, b2, 2, silence_hours=2)
    rows = cat.read(spark, "stream_absence_alerts").collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["category"], r["level"]) == ("json", "ERROR")
    assert r["last_window"].hour == 3 and r["frontier"].hour == 6
    assert r["n_total"] == 8

    # epoch 3: frontier advances further — same death, no second firing
    b3 = _agg(spark, [(7, "access", "INFO", 3)])
    upsert_agg_batch(spark, cat, b3, batch_id=3)
    assert absence_alert_batch(cat, b3, 3, silence_hours=2)
    assert cat.read(spark, "stream_absence_alerts").count() == 1


def test_resurrection_then_second_death_fires_again(spark, cat):
    b0 = _agg(spark, [(h, "json", "ERROR", 1) for h in range(2)]
              + [(h, "access", "INFO", 1) for h in range(8)])
    upsert_agg_batch(spark, cat, b0, batch_id=0)
    assert absence_alert_batch(cat, b0, 0, silence_hours=2)
    n1 = cat.read(spark, "stream_absence_alerts").count()
    assert n1 == 1  # json dead at hour 1 vs frontier 7

    # resurrection: json speaks at hour 8; then dies again by hour 11
    b1 = _agg(spark, [(8, "json", "ERROR", 1), (8, "access", "INFO", 1)])
    upsert_agg_batch(spark, cat, b1, batch_id=1)
    assert absence_alert_batch(cat, b1, 1, silence_hours=2)
    assert cat.read(spark, "stream_absence_alerts").count() == 1  # alive again

    b2 = _agg(spark, [(11, "access", "INFO", 1)])
    upsert_agg_batch(spark, cat, b2, batch_id=2)
    assert absence_alert_batch(cat, b2, 2, silence_hours=2)
    rows = cat.read(spark, "stream_absence_alerts").orderBy("last_window").collect()
    assert len(rows) == 2  # a NEW death identity (last_window hour 8)
    assert rows[1]["last_window"].hour == 8


def test_replayed_epoch_skipped_and_empty_table(spark, cat):
    b0 = _agg(spark, [(0, "json", "ERROR", 1), (5, "access", "INFO", 1)])
    upsert_agg_batch(spark, cat, b0, batch_id=0)
    assert absence_alert_batch(cat, b0, 0, silence_hours=2)
    assert absence_alert_batch(cat, b0, 0, silence_hours=2) is False
    assert cat.read(spark, "stream_absence_alerts").count() == 1


def test_stream_composition_end_to_end(spark, tmp_path, staged_pages):  # noqa: F811
    from logzilla_spark.streaming.alerts import start_absence_alert_stream

    _base, in_dir = staged_pages
    q = start_absence_alert_stream(
        spark,
        in_dir,
        str(tmp_path / "wh"),
        str(tmp_path / "ck"),
        silence_hours=1,
        watermark="9 days",
    )
    q.awaitTermination(120)
    cat = LocalCatalog(str(tmp_path / "wh"))
    alerts = cat.read(spark, "stream_absence_alerts")
    agg = cat.read(spark, "stream_agg")
    # differential: the ledger equals the batch rule evaluated on the
    # final agg table (single availableNow trigger -> one evaluation)
    import pyspark.sql.functions as F

    frontier = agg.agg(F.max("window_start").alias("f")).collect()[0]["f"]
    want = (
        agg.groupBy("category", "level")
        .agg(F.max("window_start").alias("lw"))
        .filter(F.col("lw") < frontier - F.expr("interval 1 hours"))
        .count()
    )
    assert alerts.count() == want
