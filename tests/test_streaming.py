"""Structured Streaming pipeline tests.

Differential contract: the streaming path (file-source micro-batches ->
parse -> foreachBatch route / watermarked windowed agg) must land the
exact same rows as the batch path over the same pages — the streaming
twin of the reference's tail-follow loop (reference: source/file.go:52-126,
engine/orchestrator.go:70-131).
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from logzilla_spark.operators.aggregate import windowed_counts
from logzilla_spark.operators.parse import parse_records
from logzilla_spark.operators.route import sink_name
from logzilla_spark.schemas import CATEGORIES, PAGES_SCHEMA
from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.streaming import (
    route_batch,
    start_agg_stream,
    start_routing_stream,
)
from logzilla_spark.testdata import ensure_pages

SF001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def staged_pages(spark, tmp_path_factory):
    """Pages split into 3 parquet files dropped into a watched dir —
    the streaming analog of lines being appended to a tailed file."""
    d = ensure_pages(SF001)
    base = tmp_path_factory.mktemp("stream")
    in_dir = os.path.join(base, "pages_in")
    os.makedirs(in_dir)
    pages = spark.read.parquet(f"{d}/pages.parquet")
    # deterministic 3-way split by url hash, one file each
    for i in range(3):
        part = pages.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == i)
        part.coalesce(1).write.parquet(os.path.join(base, f"tmp{i}"))
        src = [
            f for f in os.listdir(os.path.join(base, f"tmp{i}")) if f.endswith(".parquet")
        ][0]
        shutil.move(
            os.path.join(base, f"tmp{i}", src), os.path.join(in_dir, f"batch{i}.parquet")
        )
    return str(base), in_dir


def test_streaming_route_matches_batch(spark, staged_pages):
    base, in_dir = staged_pages
    wh = os.path.join(base, "wh_route")
    q = start_routing_stream(
        spark, in_dir, wh, os.path.join(base, "ckpt_route"),
        max_files_per_trigger=1,  # 3 micro-batches, like 3 buffer flushes
    )
    q.awaitTermination(timeout=300)

    cat = LocalCatalog(wh)
    batch_records = parse_records(
        spark.read.schema(PAGES_SCHEMA).parquet(in_dir), impl="arrow"
    )
    expect = {
        r["category"]: r["n"]
        for r in batch_records.groupBy("category").agg(F.count("*").alias("n")).collect()
    }
    got_ids = set()
    total = 0
    for c in CATEGORIES:
        sink = cat.read(spark, sink_name(c))
        rows = sink.select("id", "category").collect()
        assert all(r["category"] == c for r in rows)
        assert expect.get(c, 0) == len(rows)
        ids = {r["id"] for r in rows}
        assert not (ids & got_ids), "sinks must be pairwise disjoint"
        got_ids |= ids
        total += len(rows)
    # set equality: union of sinks == parsed set
    assert total == batch_records.count()
    assert got_ids == {r["id"] for r in batch_records.select("id").collect()}
    # multiple micro-batch commits actually happened
    assert cat.last_snapshot_id(sink_name("json")) >= 2


def test_streaming_epoch_replay_is_idempotent(spark, staged_pages):
    """Re-delivering an already-committed epoch must not double rows."""
    base, in_dir = staged_pages
    wh = os.path.join(base, "wh_replay")
    cat = LocalCatalog(wh)
    batch = parse_records(
        spark.read.schema(PAGES_SCHEMA).parquet(in_dir), impl="arrow"
    )
    route_batch(batch, cat, query_id="q", batch_id=0)
    n1 = {c: cat.read(spark, sink_name(c)).count() for c in CATEGORIES}
    routed = route_batch(batch, cat, query_id="q", batch_id=0)  # replay
    assert all(v == -1 for v in routed.values()), routed
    n2 = {c: cat.read(spark, sink_name(c)).count() for c in CATEGORIES}
    assert n1 == n2


def test_streaming_agg_matches_batch(spark, staged_pages):
    base, in_dir = staged_pages
    wh = os.path.join(base, "wh_agg")
    q = start_agg_stream(
        spark, in_dir, wh, os.path.join(base, "ckpt_agg"), watermark="10 minutes"
    )
    q.awaitTermination(timeout=300)

    cat = LocalCatalog(wh)
    got = {
        (r["window_start"], r["window_end"], r["category"], r["level"]): r["n"]
        for r in cat.read(spark, "stream_agg").collect()
    }
    batch_records = parse_records(
        spark.read.schema(PAGES_SCHEMA).parquet(in_dir), impl="arrow"
    )
    expect_df = windowed_counts(
        batch_records, time_col="timestamp", keys=("category", "level")
    )
    expect = {
        (r["window_start"], r["window_end"], r["category"], r["level"]): r["n"]
        for r in expect_df.collect()
    }
    assert got == expect


def test_streaming_restart_resumes_from_checkpoint(spark, staged_pages):
    """Checkpointed offsets = the reference's seek-to-end semantics
    (source/file.go:59-64): a restarted query must not re-ingest files
    it already processed, and must pick up files added while down."""
    base, in_dir = staged_pages
    # stage 1: only two of the three files visible
    in2 = os.path.join(base, "pages_in2")
    os.makedirs(in2)
    shutil.copy(os.path.join(in_dir, "batch0.parquet"), in2)
    shutil.copy(os.path.join(in_dir, "batch1.parquet"), in2)
    wh = os.path.join(base, "wh_resume")
    ckpt = os.path.join(base, "ckpt_resume")

    q = start_routing_stream(spark, in2, wh, ckpt)
    q.awaitTermination(timeout=300)
    cat = LocalCatalog(wh)
    snap_after_first = {c: cat.last_snapshot_id(sink_name(c)) for c in CATEGORIES}

    # "append" arrives while the query is down; restart from checkpoint
    shutil.copy(os.path.join(in_dir, "batch2.parquet"), in2)
    q = start_routing_stream(spark, in2, wh, ckpt)
    q.awaitTermination(timeout=300)

    batch_records = parse_records(
        spark.read.schema(PAGES_SCHEMA).parquet(in_dir), impl="arrow"
    )
    total = sum(cat.read(spark, sink_name(c)).count() for c in CATEGORIES)
    assert total == batch_records.count()  # no re-ingest, no loss
    # each sink advanced exactly one commit in the second run
    for c in CATEGORIES:
        assert cat.last_snapshot_id(sink_name(c)) == snap_after_first[c] + 1


def test_agg_upsert_touches_only_changed_month(spark, tmp_path):
    """VERDICT r2 #2: a micro-batch touching one window must rewrite
    only that window's month partition; other months' files carry over
    into the new snapshot verbatim (metadata-only)."""
    from logzilla_spark.streaming import upsert_agg_batch

    from datetime import datetime

    cat = LocalCatalog(str(tmp_path / "wh"))
    mk = lambda rows: spark.createDataFrame(
        rows,
        "window_start timestamp, window_end timestamp, "
        "category string, level string, n long",
    )
    jan = (datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 0, 5))
    feb = (datetime(2024, 2, 1, 0, 0), datetime(2024, 2, 1, 0, 5))
    assert upsert_agg_batch(
        spark, cat, mk([(jan[0], jan[1], "json", "INFO", 5),
                        (feb[0], feb[1], "json", "INFO", 7)]), 0
    )
    s1_files = {
        f for g in cat._groups("stream_agg", cat.last_snapshot_id("stream_agg"))
        for f in g["files"]
    }
    jan_s1 = {f for f in s1_files if "agg_month=202401" in f}
    assert jan_s1
    # epoch 1 revises ONLY the February window (late rows arrived)
    assert upsert_agg_batch(
        spark, cat, mk([(feb[0], feb[1], "json", "INFO", 9)]), 1
    )
    s2_files = {
        f for g in cat._groups("stream_agg", cat.last_snapshot_id("stream_agg"))
        for f in g["files"]
    }
    jan_s2 = {f for f in s2_files if "agg_month=202401" in f}
    feb_s2 = {f for f in s2_files if "agg_month=202402" in f}
    assert jan_s2 == jan_s1            # January carried over, not rewritten
    assert not feb_s2 & s1_files       # February replaced
    got = {
        (str(r.window_start), r.category, r.level): r.n
        for r in cat.read(spark, "stream_agg").collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", "json", "INFO"): 5,
        ("2024-02-01 00:00:00", "json", "INFO"): 9,
    }
    # replayed epoch is a no-op
    assert not upsert_agg_batch(
        spark, cat, mk([(feb[0], feb[1], "json", "INFO", 123)]), 1
    )
    assert cat.last_snapshot_id("stream_agg") == 2


def test_agg_upsert_migrates_legacy_unpartitioned_table(spark, tmp_path):
    """A stream_agg table written by the pre-partitioned code (plain
    overwrite, no agg_month= dirs, no agg_month column) must be
    migrated in ONE full rewrite on the first keyed upsert — not
    silently carried forever past the month-token pruning (schema
    clash + double-counted revised windows)."""
    from datetime import datetime

    from logzilla_spark.streaming import upsert_agg_batch

    cat = LocalCatalog(str(tmp_path / "wh"))
    mk = lambda rows: spark.createDataFrame(
        rows,
        "window_start timestamp, window_end timestamp, "
        "category string, level string, n long",
    )
    jan = (datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 0, 5))
    feb = (datetime(2024, 2, 1, 0, 0), datetime(2024, 2, 1, 0, 5))
    # legacy layout: whole-table overwrite, unpartitioned
    cat.overwrite(
        mk([(jan[0], jan[1], "json", "INFO", 5),
            (feb[0], feb[1], "json", "INFO", 7)]),
        "stream_agg",
    )
    assert cat.has_unpartitioned_files("stream_agg", "agg_month")
    # first keyed epoch revises February: migration folds January in
    assert upsert_agg_batch(
        spark, cat, mk([(feb[0], feb[1], "json", "INFO", 9)]), 0
    )
    assert not cat.has_unpartitioned_files("stream_agg", "agg_month")
    got = {
        (str(r.window_start), r.category, r.level): r.n
        for r in cat.read(spark, "stream_agg").collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", "json", "INFO"): 5,
        ("2024-02-01 00:00:00", "json", "INFO"): 9,
    }
    # next epoch takes the keyed path: January files carry over
    before = {
        f for g in cat._groups("stream_agg", cat.last_snapshot_id("stream_agg"))
        for f in g["files"] if "agg_month=202401" in f
    }
    assert upsert_agg_batch(
        spark, cat, mk([(feb[0], feb[1], "json", "INFO", 11)]), 1
    )
    after = {
        f for g in cat._groups("stream_agg", cat.last_snapshot_id("stream_agg"))
        for f in g["files"] if "agg_month=202401" in f
    }
    assert after == before


def test_agg_upsert_migrates_mixed_layout_table(spark, tmp_path):
    """A table with BOTH layouts — legacy unpartitioned files plus
    agg_month= partitions written by keyed epochs that ran against it —
    must migrate without a schema-clash union, and where both layouts
    hold a window key the (newer) partitioned row must win."""
    from datetime import datetime

    from logzilla_spark.streaming import upsert_agg_batch

    cat = LocalCatalog(str(tmp_path / "wh"))
    mk = lambda rows: spark.createDataFrame(
        rows,
        "window_start timestamp, window_end timestamp, "
        "category string, level string, n long",
    )
    jan = (datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 0, 5))
    feb = (datetime(2024, 2, 1, 0, 0), datetime(2024, 2, 1, 0, 5))
    mar = (datetime(2024, 3, 1, 0, 0), datetime(2024, 3, 1, 0, 5))
    # legacy layout holds stale Jan + Feb
    cat.overwrite(
        mk([(jan[0], jan[1], "json", "INFO", 5),
            (feb[0], feb[1], "json", "INFO", 7)]),
        "stream_agg",
    )
    # an intermediate keyed epoch revised Feb into a partitioned file,
    # carrying the legacy files forward untouched (the damaged state)
    cat.overwrite_partitions(
        mk([(feb[0], feb[1], "json", "INFO", 9)]).withColumn(
            "agg_month", F.date_format("window_start", "yyyyMM")
        ),
        "stream_agg",
        "agg_month",
        ["202402"],
    )
    assert cat.has_unpartitioned_files("stream_agg", "agg_month")
    # first epoch after the fix: migration reconciles both layouts
    assert upsert_agg_batch(
        spark, cat, mk([(mar[0], mar[1], "json", "INFO", 2)]), 0
    )
    assert not cat.has_unpartitioned_files("stream_agg", "agg_month")
    got = {
        (str(r.window_start), r.category, r.level): r.n
        for r in cat.read(spark, "stream_agg").collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", "json", "INFO"): 5,   # legacy-only row kept
        ("2024-02-01 00:00:00", "json", "INFO"): 9,   # partitioned row wins
        ("2024-03-01 00:00:00", "json", "INFO"): 2,   # this epoch
    }


def test_agg_upsert_remigates_after_drop_and_legacy_recreate(spark, tmp_path):
    """The fully-partitioned verdict is cached in the CATALOG and
    invalidated by drop(): a table dropped and recreated in legacy
    layout in the same process must migrate again, not skip on a stale
    caller-side cache (the old _MIGRATION_DONE failure)."""
    from datetime import datetime

    from logzilla_spark.streaming import upsert_agg_batch

    cat = LocalCatalog(str(tmp_path / "wh"))
    mk = lambda rows: spark.createDataFrame(
        rows,
        "window_start timestamp, window_end timestamp, "
        "category string, level string, n long",
    )
    jan = (datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 0, 5))
    feb = (datetime(2024, 2, 1, 0, 0), datetime(2024, 2, 1, 0, 5))
    # first life: keyed epoch confirms+caches the partitioned layout
    assert upsert_agg_batch(spark, cat, mk([(jan[0], jan[1], "json", "INFO", 1)]), 0)
    assert not cat.has_unpartitioned_files("stream_agg", "agg_month")
    # drop, recreate in LEGACY (unpartitioned) layout
    cat.drop("stream_agg")
    cat.overwrite(mk([(jan[0], jan[1], "json", "INFO", 5)]), "stream_agg")
    assert cat.has_unpartitioned_files("stream_agg", "agg_month")
    # next epoch must take the migration path, not the stale cache
    assert upsert_agg_batch(spark, cat, mk([(feb[0], feb[1], "json", "INFO", 2)]), 0)
    assert not cat.has_unpartitioned_files("stream_agg", "agg_month")
    got = {
        (str(r.window_start), r.category, r.level): r.n
        for r in cat.read(spark, "stream_agg").collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", "json", "INFO"): 5,
        ("2024-02-01 00:00:00", "json", "INFO"): 2,
    }


def test_agg_upsert_concurrent_queries_lose_no_rows(spark, tmp_path):
    """Two streaming queries upserting DIFFERENT keys of the same table
    and month concurrently: without the per-table upsert lock both read
    partition state at the same snapshot and the later commit replaces
    the earlier one's files (silent row loss, while the committed map
    still marks both batches done)."""
    import threading
    from datetime import datetime

    from logzilla_spark.streaming import upsert_agg_batch

    cat = LocalCatalog(str(tmp_path / "wh"))
    mk = lambda rows: spark.createDataFrame(
        rows,
        "window_start timestamp, window_end timestamp, "
        "category string, level string, n long",
    )
    jan = (datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 0, 5))
    errs = []

    def run(qid, level, n):
        try:
            upsert_agg_batch(
                spark, cat, mk([(jan[0], jan[1], "json", level, n)]), 0,
                query_id=qid,
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=run, args=(f"agg-{i}", f"L{i}", i)) for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs
    got = {r.level: r.n for r in cat.read(spark, "stream_agg").collect()}
    assert got == {f"L{i}": i for i in range(4)}


def test_agg_upsert_remigates_after_legacy_overwrite_without_drop(spark, tmp_path):
    """Invalidation must cover every op that can reintroduce legacy
    files — not just drop(): a plain overwrite (no partition_by) on a
    confirmed table must flip the cached verdict back."""
    from datetime import datetime

    from logzilla_spark.streaming import upsert_agg_batch

    cat = LocalCatalog(str(tmp_path / "wh"))
    mk = lambda rows: spark.createDataFrame(
        rows,
        "window_start timestamp, window_end timestamp, "
        "category string, level string, n long",
    )
    jan = (datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 0, 5))
    feb = (datetime(2024, 2, 1, 0, 0), datetime(2024, 2, 1, 0, 5))
    assert upsert_agg_batch(spark, cat, mk([(jan[0], jan[1], "json", "INFO", 1)]), 0)
    # legacy writer overwrites WITHOUT drop — unpartitioned files return
    cat.overwrite(mk([(jan[0], jan[1], "json", "INFO", 5)]), "stream_agg")
    assert cat.has_unpartitioned_files("stream_agg", "agg_month")
    # batch 1: the committed map survives the overwrite (its cumulative
    # entry is found by walking past the plain-summary snapshot), so
    # batch 0 would correctly be treated as a replay
    assert upsert_agg_batch(spark, cat, mk([(feb[0], feb[1], "json", "INFO", 2)]), 1)
    assert not cat.has_unpartitioned_files("stream_agg", "agg_month")
    got = {
        (str(r.window_start), r.level): r.n
        for r in cat.read(spark, "stream_agg").collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", "INFO"): 5,
        ("2024-02-01 00:00:00", "INFO"): 2,
    }
