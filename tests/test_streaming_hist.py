"""Streaming histogram-quantile maintenance (streaming/histogram.py).

Differential contract: after any number of micro-batches, the
committed counter table — and therefore every quantile estimate —
must equal the batch sketch over the same records BIT-FOR-BIT
(bucket-count sum is associative/commutative, so trigger slicing
cannot matter). Sum-merge is NOT idempotent, so the replay guard is
load-bearing here (unlike the HLL sink's max-merge) — pinned below.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from logzilla_spark.operators.parse import parse_records
from logzilla_spark.operators.sketches import hist_counts, hist_quantiles
from logzilla_spark.schemas import PAGES_SCHEMA
from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.streaming.histogram import (
    DEFAULT_QUANTILES,
    DEFAULT_VALUE_EXPR,
    HIST_TABLE,
    read_hist_quantiles,
    start_hist_stream,
    upsert_hist_batch,
)
from logzilla_spark.testdata import ensure_pages

SF001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = ensure_pages(SF001)
    base = tmp_path_factory.mktemp("hist_stream")
    in_dir = os.path.join(base, "pages_in")
    os.makedirs(in_dir)
    pages = spark.read.parquet(f"{d}/pages.parquet")
    for i in range(3):
        part = pages.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == i)
        tmp = os.path.join(base, f"tmp{i}")
        part.coalesce(1).write.parquet(tmp)
        src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        shutil.move(os.path.join(tmp, src), os.path.join(in_dir, f"b{i}.parquet"))
    return str(base), in_dir


def _batch_records(spark, in_dir):
    return parse_records(
        spark.read.schema(PAGES_SCHEMA).parquet(in_dir), impl="arrow"
    )


def test_streamed_quantiles_equal_batch_bitwise(spark, pages_dir):
    base, in_dir = pages_dir
    wh = os.path.join(base, "wh")
    q = start_hist_stream(
        spark, in_dir, wh, os.path.join(base, "ckpt"),
        max_files_per_trigger=1,  # force multiple epochs
    )
    q.awaitTermination(timeout=300)
    cat = LocalCatalog(wh)
    assert cat.last_snapshot_id(HIST_TABLE) >= 2  # >= 2 epochs committed

    streamed = read_hist_quantiles(spark, cat)
    records = _batch_records(spark, in_dir)
    expect = hist_quantiles(
        records, ["category"], DEFAULT_VALUE_EXPR, list(DEFAULT_QUANTILES)
    )
    got = sorted(map(tuple, streamed.collect()))
    want = sorted(map(tuple, expect.collect()))
    assert got == want  # incl. est double bits
    assert len(got) > 0

    # counter table is sketch-sized: bounded buckets per key
    per_key = cat.read(spark, HIST_TABLE).groupBy("category").count().collect()
    assert all(r["count"] <= 64 * 32 for r in per_key)


def test_replayed_epoch_is_refused_and_harmless(spark, pages_dir):
    """Sum-merge would DOUBLE COUNT a replay — the committed-map guard
    must refuse it, byte-identically."""
    base, in_dir = pages_dir
    wh = os.path.join(base, "wh_replay")
    cat = LocalCatalog(wh)
    records = _batch_records(spark, in_dir)
    assert upsert_hist_batch(spark, cat, records, batch_id=0)
    before = sorted(map(tuple, cat.read(spark, HIST_TABLE).collect()))
    sid = cat.last_snapshot_id(HIST_TABLE)
    assert not upsert_hist_batch(spark, cat, records, batch_id=0)  # replay
    assert cat.last_snapshot_id(HIST_TABLE) == sid
    after = sorted(map(tuple, cat.read(spark, HIST_TABLE).collect()))
    assert after == before  # not doubled


def test_incremental_merge_equals_one_shot(spark, pages_dir):
    base, in_dir = pages_dir
    wh = os.path.join(base, "wh_inc")
    cat = LocalCatalog(wh)
    whole = _batch_records(spark, in_dir)
    for i, f in enumerate(sorted(os.listdir(in_dir))):
        part = parse_records(
            spark.read.schema(PAGES_SCHEMA).parquet(os.path.join(in_dir, f)),
            impl="arrow",
        )
        upsert_hist_batch(spark, cat, part, batch_id=i)
    got = sorted(map(tuple, cat.read(spark, HIST_TABLE).collect()))
    want = sorted(
        map(
            tuple,
            hist_counts(whole, ["category"], DEFAULT_VALUE_EXPR).collect(),
        )
    )
    assert got == want
