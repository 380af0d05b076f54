"""Live searchable log store (streaming/fulltext.py): committed
records + incrementally-maintained fulltext index, per-table
exactly-once, search served from the committed tables.

The differential contract: after any number of micro-batches,
``search_live`` == the batch scan tier over the same records. The
crash-between test pins the healing property: per-table committed maps
make the two-append epoch converge under replay without a cross-table
transaction.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from logzilla_spark.operators.fulltext import POSTINGS_SUFFIX, full_text_search
from logzilla_spark.operators.parse import parse_records
from logzilla_spark.schemas import PAGES_SCHEMA
from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.streaming.fulltext import (
    INDEX_NAME,
    RECORDS_TABLE,
    search_live,
    start_search_stream,
    upsert_search_batch,
)
from logzilla_spark.testdata import ensure_pages

SF001 = "/root/testdata/sf0.001"
QUERY = "disk svc3"


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = ensure_pages(SF001)
    base = tmp_path_factory.mktemp("ft_stream")
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


def _ids(df):
    return sorted(r.id for r in df.select("id").collect())


def test_streamed_search_equals_batch(spark, pages_dir):
    base, in_dir = pages_dir
    wh = os.path.join(base, "wh")
    q = start_search_stream(
        spark, in_dir, wh, os.path.join(base, "ckpt"), max_files_per_trigger=1
    )
    q.awaitTermination(timeout=300)
    cat = LocalCatalog(wh)
    # multiple epochs actually committed to BOTH tables
    assert cat.last_snapshot_id(RECORDS_TABLE) >= 2
    assert cat.last_snapshot_id(INDEX_NAME + POSTINGS_SUFFIX) >= 2
    got = _ids(search_live(spark, cat, QUERY))
    want = _ids(full_text_search(_batch_records(spark, in_dir), QUERY))
    assert got == want and len(got) > 0
    # no duplicate records across epochs
    rec = cat.read(spark, RECORDS_TABLE)
    assert rec.count() == rec.select("id").distinct().count()


def test_replayed_epoch_refused_on_both_tables(spark, pages_dir):
    base, in_dir = pages_dir
    cat = LocalCatalog(os.path.join(base, "wh_replay"))
    records = _batch_records(spark, in_dir)
    assert upsert_search_batch(spark, cat, records, 0) == (True, True)
    n_rec = cat.read(spark, RECORDS_TABLE).count()
    n_post = cat.read(spark, INDEX_NAME + POSTINGS_SUFFIX).count()
    assert upsert_search_batch(spark, cat, records, 0) == (False, False)
    assert cat.read(spark, RECORDS_TABLE).count() == n_rec
    assert cat.read(spark, INDEX_NAME + POSTINGS_SUFFIX).count() == n_post


def test_crash_between_appends_heals_on_replay(spark, pages_dir):
    """Simulate a crash AFTER the records append but BEFORE the
    postings append: replaying the epoch must refuse the records side
    and apply the postings side — the pair converges."""
    base, in_dir = pages_dir
    cat = LocalCatalog(os.path.join(base, "wh_crash"))
    files = sorted(os.listdir(in_dir))
    first = parse_records(
        spark.read.schema(PAGES_SCHEMA).parquet(os.path.join(in_dir, files[0])),
        impl="arrow",
    )
    # epoch 0: records land, postings "crash" (simulated by committing
    # the records table directly with the same bookkeeping)
    from logzilla_spark.streaming.stream_pipeline import _summary_at_publish

    cat.append(
        first, RECORDS_TABLE,
        summary=_summary_at_publish(cat, RECORDS_TABLE, "search", 0),
    )
    # replay of epoch 0 through the sink
    applied = upsert_search_batch(spark, cat, first, 0)
    assert applied == (False, True)  # records refused, postings healed
    got = _ids(search_live(spark, cat, QUERY))
    want = _ids(full_text_search(first, QUERY))
    assert got == want
    rec = cat.read(spark, RECORDS_TABLE)
    assert rec.count() == rec.select("id").distinct().count()
