"""Continuous-aggregate rollup cascade (streaming/rollup.py).

Differential bar: after ANY sequence of fine-table commits + refreshes,
the coarse table must equal the one-shot aggregation of the fine head —
and each refresh must touch only the buckets the delta changed."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.streaming.rollup import refresh_rollup, serve_range
from tests.conftest import SF01, canon_rows

DIMS = ("event_type",)


def _fine_agg(events):
    """Hourly counts per event_type — the agg-sink shape."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def _direct_daily(fine):
    return (
        fine.groupBy(F.window("window_start", "1 day").alias("w"), *DIMS)
        .agg(F.sum("n").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *DIMS,
            "n",
        )
    )


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF01}/events.parquet")


def test_incremental_refresh_matches_oneshot(spark, events, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    jan = events.filter(F.dayofmonth("ts") <= 10)
    feb = events.filter((F.dayofmonth("ts") > 10) & (F.dayofmonth("ts") <= 20))
    late = events.filter(F.dayofmonth("ts") > 20)

    cat.append(_fine_agg(jan), "fine", cluster_by=["window_start"])
    r1 = refresh_rollup(spark, cat, "fine", "daily", dims=DIMS)
    assert r1["changed_buckets"] == 10

    cat.append(_fine_agg(feb), "fine", cluster_by=["window_start"])
    r2 = refresh_rollup(spark, cat, "fine", "daily", dims=DIMS)
    assert r2["changed_buckets"] == 10  # only the new days reroll

    cat.append(_fine_agg(late), "fine", cluster_by=["window_start"])
    refresh_rollup(spark, cat, "fine", "daily", dims=DIMS)

    got = cat.read(spark, "daily").toPandas()
    want = _direct_daily(cat.read(spark, "fine")).toPandas()
    assert canon_rows(got) == canon_rows(want)


def test_noop_refresh_publishes_nothing(spark, events, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    cat.append(_fine_agg(events), "fine", cluster_by=["window_start"])
    refresh_rollup(spark, cat, "fine", "daily", dims=DIMS)
    head = cat.last_snapshot_id("daily")
    r = refresh_rollup(spark, cat, "fine", "daily", dims=DIMS)
    assert r["changed_buckets"] == 0
    assert cat.last_snapshot_id("daily") == head


@pytest.fixture()
def tiny_files(spark):
    keys = {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "2k",
    }
    old = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        spark.conf.set(k, v)


def test_late_correction_rerolls_only_changed_files_buckets(
    spark, events, tmp_path, tiny_files
):
    """An upserted fine partition (late data correction) rerolls the
    coarse buckets of the REWRITTEN FILES — with a clustered multi-file
    layout that is a small neighborhood of day 5, never the table."""
    cat = LocalCatalog(str(tmp_path / "wh"))
    fine = _fine_agg(events)
    cat.append(fine, "fine", cluster_by=["window_start"])
    refresh_rollup(spark, cat, "fine", "daily", dims=DIMS)

    # correction: day 5's counts all double (delete + re-append = the
    # overwrite_partitions file pattern: old files out, new files in)
    day5 = (F.dayofmonth("window_start") == 5) & (F.month("window_start") == 1)
    corrected = fine.withColumn(
        "n", F.when(day5, F.col("n") * 2).otherwise(F.col("n"))
    ).filter(day5)
    cat.delete_where(spark, "fine", "dayofmonth(window_start) = 5 AND month(window_start) = 1")
    cat.append(corrected, "fine", cluster_by=["window_start"])

    r = refresh_rollup(spark, cat, "fine", "daily", dims=DIMS)
    # copy-on-write: the reroll scope is the buckets of the files the
    # delete rewrote plus the appended correction — a handful with
    # this layout, and never the whole month
    assert 1 <= r["changed_buckets"] <= 10
    got = cat.read(spark, "daily").toPandas()
    want = _direct_daily(cat.read(spark, "fine")).toPandas()
    assert canon_rows(got) == canon_rows(want)


def test_double_refresh_converges(spark, events, tmp_path):
    """Replay idempotence by recomputation: forcing a second refresh
    over the same delta (marker rolled back to None) converges to the
    same coarse rows."""
    cat = LocalCatalog(str(tmp_path / "wh"))
    cat.append(_fine_agg(events), "fine", cluster_by=["window_start"])
    refresh_rollup(spark, cat, "fine", "daily", dims=DIMS)
    before = canon_rows(cat.read(spark, "daily").toPandas())
    # simulate the crash-replay worst case: marker lost -> full reroll
    cat.append(
        cat.read(spark, "daily").limit(0), "daily", summary={}
    )  # a markerless commit hides nothing (walk skips it)
    refresh_rollup(spark, cat, "fine", "daily", dims=DIMS)
    assert canon_rows(cat.read(spark, "daily").toPandas()) == before


def test_serve_range_coarse_plus_edges(spark, events, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    cat.append(_fine_agg(events), "fine", cluster_by=["window_start"])
    refresh_rollup(spark, cat, "fine", "daily", dims=DIMS)
    start = dt.datetime(2024, 1, 3, 12)   # mid-bucket: ragged start
    end = dt.datetime(2024, 1, 20, 6)     # mid-bucket: ragged end
    got = serve_range(
        spark, cat, "fine", "daily", start, end, dims=DIMS
    ).toPandas()
    want = (
        events.filter((F.col("ts") >= F.lit(start)) & (F.col("ts") < F.lit(end)))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    assert canon_rows(got) == canon_rows(want)


def test_rollup_over_live_agg_stream(spark, tmp_path):
    """Full cascade composition: the streaming agg sink maintains the
    fine table (exactly-once keyed merge), refresh_rollup folds it to
    daily, and the daily table equals the one-shot fold of whatever
    the stream committed — the continuous-aggregate end state."""
    import os
    import shutil

    from logzilla_spark.streaming.stream_pipeline import start_agg_stream
    from logzilla_spark.testdata import ensure_pages

    src = ensure_pages("/root/testdata/sf0.001")
    in_dir = str(tmp_path / "pages_in")
    os.makedirs(in_dir)
    import pyarrow.parquet as pq

    t = pq.read_table(f"{src}/pages.parquet")
    third = max(1, t.num_rows // 3)
    for i in range(3):
        pq.write_table(
            t.slice(i * third, third if i < 2 else t.num_rows - 2 * third),
            os.path.join(in_dir, f"batch{i}.parquet"),
        )
    wh = str(tmp_path / "wh")
    q = start_agg_stream(
        spark, in_dir, wh, str(tmp_path / "ckpt"), watermark="10 minutes"
    )
    q.awaitTermination(timeout=300)

    cat = LocalCatalog(wh)
    r = refresh_rollup(
        spark, cat, "stream_agg", "daily", dims=("category", "level")
    )
    assert r["changed_buckets"] >= 1
    got = cat.read(spark, "daily").toPandas()
    want = (
        cat.read(spark, "stream_agg")
        .groupBy(F.window("window_start", "1 day").alias("w"), "category", "level")
        .agg(F.sum("n").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "category",
            "level",
            "n",
        )
        .toPandas()
    )
    assert canon_rows(got) == canon_rows(want)
