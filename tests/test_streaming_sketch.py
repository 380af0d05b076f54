"""Streaming HLL maintenance (streaming/sketch.py).

Differential contract: after any number of micro-batches, the
committed register table — and therefore the estimate — must equal
the batch sketch over the same records BIT-FOR-BIT (register merge is
associative/commutative/idempotent, so trigger slicing cannot matter).
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from logzilla_spark.operators.parse import parse_records
from logzilla_spark.operators.sketches import hll_distinct, hll_registers
from logzilla_spark.schemas import PAGES_SCHEMA
from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.streaming.sketch import (
    DEFAULT_VALUE_EXPR,
    HLL_TABLE,
    read_hll_distinct,
    start_hll_stream,
    upsert_hll_batch,
)
from logzilla_spark.testdata import ensure_pages

SF001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = ensure_pages(SF001)
    base = tmp_path_factory.mktemp("sketch_stream")
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


def test_streamed_sketch_equals_batch_bitwise(spark, pages_dir):
    base, in_dir = pages_dir
    wh = os.path.join(base, "wh")
    q = start_hll_stream(
        spark, in_dir, wh, os.path.join(base, "ckpt"),
        max_files_per_trigger=1,  # force multiple epochs
    )
    q.awaitTermination(timeout=300)
    cat = LocalCatalog(wh)
    # >= 2 epochs actually committed (3 files, 1 per trigger; every
    # epoch publishes a snapshot)
    assert cat.last_snapshot_id(HLL_TABLE) >= 2

    streamed = read_hll_distinct(spark, cat)
    records = _batch_records(spark, in_dir).filter(
        F.expr(f"({DEFAULT_VALUE_EXPR}) IS NOT NULL")
    )
    expect = hll_distinct(records, ["category"], DEFAULT_VALUE_EXPR)
    got = sorted(map(tuple, streamed.collect()))
    want = sorted(map(tuple, expect.collect()))
    assert got == want  # incl. est_distinct double bits
    assert len(got) > 0

    # register table is sketch-sized: <= m rows per key
    regs = cat.read(spark, HLL_TABLE)
    per_key = regs.groupBy("category").count().collect()
    assert all(r["count"] <= 512 for r in per_key)


def test_replayed_epoch_is_refused_and_harmless(spark, pages_dir):
    base, in_dir = pages_dir
    wh = os.path.join(base, "wh_replay")
    cat = LocalCatalog(wh)
    records = _batch_records(spark, in_dir)
    assert upsert_hll_batch(spark, cat, records, batch_id=0)
    before = sorted(map(tuple, cat.read(spark, HLL_TABLE).collect()))
    sid = cat.last_snapshot_id(HLL_TABLE)
    assert not upsert_hll_batch(spark, cat, records, batch_id=0)  # replay
    assert cat.last_snapshot_id(HLL_TABLE) == sid
    assert sorted(map(tuple, cat.read(spark, HLL_TABLE).collect())) == before


def test_incremental_merge_equals_one_shot(spark, pages_dir):
    """Registers folded epoch-by-epoch == registers of the whole —
    the associativity that makes the streaming sink correct."""
    base, in_dir = pages_dir
    wh = os.path.join(base, "wh_inc")
    cat = LocalCatalog(wh)
    whole = _batch_records(spark, in_dir)
    for i, f in enumerate(sorted(os.listdir(in_dir))):
        part = parse_records(
            spark.read.schema(PAGES_SCHEMA).parquet(os.path.join(in_dir, f)),
            impl="arrow",
        )
        upsert_hll_batch(spark, cat, part, batch_id=i)
    got = sorted(map(tuple, cat.read(spark, HLL_TABLE).collect()))
    want = sorted(
        map(
            tuple,
            hll_registers(
                whole.filter(F.expr(f"({DEFAULT_VALUE_EXPR}) IS NOT NULL")),
                ["category"],
                DEFAULT_VALUE_EXPR,
            ).collect(),
        )
    )
    assert got == want
