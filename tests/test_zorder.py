"""Z-order clustering (functions/zorder.py + catalog cluster_mode).

The claim under test: with cluster_by=["ts","user_id"], linear mode
gives only the LEADING column (ts) tight per-file stats — a user_id
point lookup keeps every file — while zorder mode prunes on BOTH
columns, at the cost of somewhat looser ts ranges. Content must be
bit-identical either way (layout is a performance property)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from logzilla_spark.functions.zorder import zorder_column
from logzilla_spark.sources.catalog import LocalCatalog
from tests.conftest import SF01, canon_rows

TS_LO = dt.datetime(2024, 1, 10)
TS_HI = dt.datetime(2024, 1, 12)


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF01}/events.parquet")


@pytest.fixture()
def tiny_files(spark):
    keys = {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16k",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "4k",
    }
    old = {k: spark.conf.get(k) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        spark.conf.set(k, v)


@pytest.fixture()
def cats(spark, events, tmp_path, tiny_files):
    cat = LocalCatalog(str(tmp_path / "wh"))
    cat.overwrite(events, "lin", cluster_by=["ts", "user_id"])
    cat.overwrite(events, "zo", cluster_by=["ts", "user_id"], cluster_mode="zorder")
    return cat


def _kept(cat, table, column, **kw):
    groups, total = cat.stats_pruned_files(table, column, **kw)
    return sum(len(g["files"]) for g in groups), total


def test_zorder_prunes_secondary_column_linear_cannot(cats):
    lin_kept, lin_total = _kept(cats, "lin", "user_id", points=[42])
    zo_kept, zo_total = _kept(cats, "zo", "user_id", points=[42])
    assert lin_total >= 8 and zo_total >= 8  # layout actually split
    assert lin_kept == lin_total  # linear: secondary stats span domain
    assert zo_kept <= zo_total // 2  # zorder: real skipping


def test_zorder_still_prunes_leading_column(cats):
    zo_kept, zo_total = _kept(cats, "zo", "ts", ranges=[(TS_LO, TS_HI)])
    assert zo_kept < zo_total  # coarser than linear, but still prunes


def test_zorder_content_identical(spark, events, cats):
    out = cats.read(spark, "zo").toPandas()
    assert canon_rows(out) == canon_rows(events.toPandas())


def test_zorder_pruned_read_correct(spark, events, cats):
    got = (
        cats.read_stats_pruned(spark, "zo", "user_id", points=[42])
        .filter("user_id = 42")
        .toPandas()
    )
    ref = events.filter("user_id = 42").toPandas()
    assert canon_rows(got) == canon_rows(ref)


def test_zorder_rejects_strings(events):
    with pytest.raises(ValueError, match="zorderable"):
        zorder_column(events, ["event_type"])


def test_zvalue_interleaves_buckets(spark):
    from logzilla_spark.functions.zorder import interleave_bits

    # full 16x16 bucket grid: z must be the exact Morton interleave
    df = spark.range(256).select(
        (F.col("id") % 16).alias("a"), (F.col("id") / 16).cast("int").alias("b")
    )
    z = df.select(
        "a", "b", interleave_bits([F.col("a"), F.col("b")]).alias("z")
    ).collect()
    for row in z:
        expect = 0
        for j in range(4):
            expect |= ((row.a >> j) & 1) << (2 * j)
            expect |= ((row.b >> j) & 1) << (2 * j + 1)
        assert row.z == expect, (row.a, row.b, row.z, expect)
    # and the full grid maps 1:1 onto 0..255 (a bijection — no two
    # cells share a z cell)
    assert sorted(r.z for r in z) == list(range(256))
