"""Streaming metric histograms (streaming/metrics.py).

Differential contract: a multi-trigger stream's served series is
EXACTLY the batch extract_metrics output over the same records — ints
and the one IEEE avg division — because histograms merge additively.
Plus replay safety (additive merge makes the committed-map guard
load-bearing) and month-scoped partition rewrites.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from logzilla_spark.operators.metrics import extract_metrics
from logzilla_spark.operators.parse import parse_records
from logzilla_spark.schemas import PAGES_SCHEMA
from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.streaming.metrics import (
    read_metric_series,
    start_metrics_stream,
    upsert_metrics_batch,
)

from .test_streaming import staged_pages  # noqa: F401 (fixture reuse)


def test_stream_matches_batch_exactly(spark, staged_pages):  # noqa: F811
    base, in_dir = staged_pages
    wh = os.path.join(base, "wh_metrics")
    q = start_metrics_stream(
        spark,
        in_dir,
        wh,
        os.path.join(base, "ckpt_metrics"),
        max_files_per_trigger=1,  # 3 micro-batches
    )
    q.awaitTermination(timeout=300)

    got = {
        (r["key"], r["bucket"]): tuple(r)[2:]
        for r in read_metric_series(spark, LocalCatalog(wh)).collect()
    }
    records = parse_records(
        spark.read.schema(PAGES_SCHEMA).parquet(in_dir), impl="arrow"
    )
    flat = records.select(
        "timestamp",
        "source",
        F.col("metadata")["size"].alias("m_size"),
    )
    expect = {
        (r["key"], r["bucket"]): tuple(r)[2:]
        for r in extract_metrics(flat, "m_size", "source").collect()
    }
    assert got == expect and got  # exact ints AND exact avg double bits


def test_replay_and_additive_merge(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    df = spark.createDataFrame(
        [("a", "2024-01-01 10:05:00", "10"), ("a", "2024-01-01 10:06:00", "10")],
        "source string, ts string, m_size string",
    ).select(
        F.to_timestamp("ts").alias("timestamp"), "source", "m_size"
    )
    assert upsert_metrics_batch(spark, cat, df, 0, "m_size", "source")
    assert upsert_metrics_batch(spark, cat, df, 0, "m_size", "source") is False
    [r] = read_metric_series(spark, cat).collect()
    assert (r["cnt"], r["v_sum"], r["p50"]) == (2, 20, 10)
    # second epoch merges additively into the same cell + a new one
    df2 = spark.createDataFrame(
        [("a", "2024-01-01 10:07:00", "10"), ("a", "2024-01-01 10:08:00", "30")],
        "source string, ts string, m_size string",
    ).select(F.to_timestamp("ts").alias("timestamp"), "source", "m_size")
    assert upsert_metrics_batch(spark, cat, df2, 1, "m_size", "source")
    [r] = read_metric_series(spark, cat).collect()
    assert (r["cnt"], r["v_sum"], r["v_max"], r["p50"], r["p95"]) == (
        4, 60, 30, 10, 30,
    )


def test_untouched_months_carry_metadata_only(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))

    def batch(month, v):
        return spark.createDataFrame(
            [("a", f"2024-{month:02d}-01 00:01:00", str(v))],
            "source string, ts string, m_size string",
        ).select(F.to_timestamp("ts").alias("timestamp"), "source", "m_size")

    upsert_metrics_batch(spark, cat, batch(1, 5), 0, "m_size", "source")
    sid = cat.last_snapshot_id("stream_metrics")
    jan_files = {
        f
        for g in cat._groups("stream_metrics", sid)
        for f in g["files"]
        if "metric_month=202401" in f
    }
    upsert_metrics_batch(spark, cat, batch(2, 7), 1, "m_size", "source")
    sid2 = cat.last_snapshot_id("stream_metrics")
    jan_after = {
        f
        for g in cat._groups("stream_metrics", sid2)
        for f in g["files"]
        if "metric_month=202401" in f
    }
    assert jan_after == jan_files  # same physical files — no rewrite


def test_empty_epoch_advances_map_without_polluting_layout(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    empty = spark.createDataFrame(
        [], "timestamp timestamp, source string, m_size string"
    )
    assert upsert_metrics_batch(spark, cat, empty, 0, "m_size", "source")
    assert upsert_metrics_batch(spark, cat, empty, 0, "m_size", "source") is False
    # metadata-only: no data files, and the layout verdict stays clean
    sid = cat.last_snapshot_id("stream_metrics")
    assert not [f for g in cat._groups("stream_metrics", sid) for f in g["files"]]
    assert not cat.has_unpartitioned_files("stream_metrics", "metric_month")
    # a real epoch after the empty one works normally
    df = spark.createDataFrame(
        [("a", "2024-01-01 10:05:00", "10")],
        "source string, ts string, m_size string",
    ).select(F.to_timestamp("ts").alias("timestamp"), "source", "m_size")
    assert upsert_metrics_batch(spark, cat, df, 1, "m_size", "source")
    assert read_metric_series(spark, cat).count() == 1
