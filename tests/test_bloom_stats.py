"""Bloom-filter file skipping (functions/bloom.py + catalog sidecars).

Min/max manifest stats prune RANGE predicates on clustered columns;
blooms prune EQUALITY lookups on columns the layout is NOT sorted by —
the Iceberg Puffin sidecar shape. Soundness bar: pruning may only drop
files PROVEN to lack every query point; every test therefore asserts
content equality against the unpruned read alongside the file-count
drop."""

import os

import pytest
from pyspark.sql import functions as F

from logzilla_spark.functions.bloom import (
    MAX_DISTINCT,
    bloom_may_contain,
    bloom_params,
    build_bloom,
)
from logzilla_spark.sources.catalog import LocalCatalog
from tests.conftest import SF001, canon_rows

POINTS = [7, 123, 400]


# ---------------------------------------------------------------- unit


def test_bloom_membership_and_fpp():
    vals = list(range(0, 2000, 2))  # evens
    b = build_bloom(vals)
    assert all(bloom_may_contain(b, v) for v in vals)  # no false negatives
    odds = list(range(1, 2000, 2))
    fp = sum(bloom_may_contain(b, v) for v in odds)
    assert fp / len(odds) < 0.05  # target fpp 1%, generous margin


def test_bloom_deterministic_and_typed():
    assert build_bloom([1, "a", 2.5]) == build_bloom([2.5, "a", 1, 1])
    # int 1 and string "1" are distinct keys (type-tagged serialization)
    b = build_bloom([1])
    assert bloom_may_contain(b, 1)
    assert not bloom_may_contain(b, "1")


def test_bloom_caps_and_unserializable():
    assert build_bloom([object()]) is None
    assert build_bloom(range(MAX_DISTINCT + 2)) is None
    m, k = bloom_params(1000, 0.01)
    assert m >= 9000 and 5 <= k <= 10  # textbook optimum ~9585 bits, k~7


# ------------------------------------------------------------- catalog


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF001}/documents.parquet")


@pytest.fixture()
def bloom_cat(spark, docs, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    # 16 files, doc_id UNSORTED across them: every file's [min, max]
    # spans ~the whole id domain, so min/max alone prunes nothing
    cat.overwrite(docs.repartition(16), "docs", bloom_cols=["doc_id"])
    return cat


def test_point_lookup_prunes_files_and_preserves_content(spark, docs, bloom_cat):
    groups, total = bloom_cat.stats_pruned_files("docs", "doc_id", points=POINTS)
    kept = sum(len(g["files"]) for g in groups)
    assert total == 16
    # each unique id lives in exactly 1 file; 1% fpp over 16 files
    # leaves room for a stray false positive, not for no pruning
    assert kept <= 6
    out = (
        bloom_cat.read_stats_pruned(spark, "docs", "doc_id", points=POINTS)
        .filter(F.col("doc_id").isin(POINTS))
        .toPandas()
    )
    ref = docs.filter(F.col("doc_id").isin(POINTS)).toPandas()
    assert canon_rows(out) == canon_rows(ref)


def test_range_query_ignores_blooms(bloom_cat):
    # an unbounded range keeps every file — blooms must not interfere
    groups, total = bloom_cat.stats_pruned_files(
        "docs", "doc_id", ranges=[(None, None)]
    )
    assert sum(len(g["files"]) for g in groups) == total == 16


def test_absent_point_prunes_everything(spark, bloom_cat):
    df = bloom_cat.read_stats_pruned(spark, "docs", "doc_id", points=[10_000_000])
    # possibly a lone false-positive file; never more than a couple
    assert df is None or df.filter("doc_id = 10000000").count() == 0


def test_append_adds_second_sidecar_and_prunes_both_groups(spark, docs, bloom_cat):
    shifted = docs.withColumn("doc_id", F.col("doc_id") + 1000)
    bloom_cat.append(shifted.repartition(16), "docs", bloom_cols=["doc_id"])
    pts = [7, 1123]  # one in each commit group
    groups, total = bloom_cat.stats_pruned_files("docs", "doc_id", points=pts)
    kept = sum(len(g["files"]) for g in groups)
    assert total == 32 and kept <= 6
    out = (
        bloom_cat.read_stats_pruned(spark, "docs", "doc_id", points=pts)
        .filter(F.col("doc_id").isin(pts))
        .count()
    )
    assert out == 2


def test_unbloomable_column_degrades_to_unpruned(spark, tmp_path):
    emb = spark.read.parquet(f"{SF001}/embeddings.parquet")
    cat = LocalCatalog(str(tmp_path / "wh2"))
    cat.overwrite(emb.repartition(4), "emb", bloom_cols=["embedding"])
    groups, total = cat.stats_pruned_files("emb", "embedding", points=["x"])
    assert sum(len(g["files"]) for g in groups) == total == 4


def test_expire_reclaims_dead_sidecars_keeps_live(spark, docs, bloom_cat):
    bdir = bloom_cat._blooms_dir("docs")
    first = set(os.listdir(bdir))
    bloom_cat.overwrite(docs.repartition(8), "docs", bloom_cols=["doc_id"])
    assert len(os.listdir(bdir)) == len(first) + 1
    bloom_cat.expire_snapshots("docs", keep_last=1)
    left = set(os.listdir(bdir))
    assert len(left) == 1 and not (left & first)
    # the surviving sidecar still prunes
    groups, total = bloom_cat.stats_pruned_files("docs", "doc_id", points=[7])
    assert sum(len(g["files"]) for g in groups) < total == 8


def test_orphan_sweep_reclaims_crash_staged_sidecar(docs, bloom_cat):
    bdir = bloom_cat._blooms_dir("docs")
    stray = os.path.join(bdir, "blooms-deadbeef.json")
    with open(stray, "w") as f:
        f.write("{}")
    os.utime(stray, (1, 1))  # aged past any guard
    removed = bloom_cat.remove_orphan_files("docs", older_than_seconds=60)
    assert stray in removed
    # the committed sidecar survived
    assert len(os.listdir(bdir)) == 1


def test_dpp_join_prunes_scan_and_matches_plain_join(spark, docs, bloom_cat):
    from logzilla_spark.operators.enrich import join_dim_file_pruned

    dim = docs.filter((F.col("doc_id") % 97) == 0).select(
        F.col("doc_id").alias("td_id")
    )
    out = join_dim_file_pruned(spark, bloom_cat, "docs", "doc_id", dim, "td_id")
    ref = docs.join(dim, docs.doc_id == dim.td_id, "inner")
    assert canon_rows(out.toPandas()) == canon_rows(ref.toPandas())
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the pruned scan reads fewer than the committed 16 files
    n_keys = dim.count()
    groups, total = bloom_cat.stats_pruned_files(
        "docs", "doc_id", points=[r[0] for r in dim.collect()]
    )
    assert total == 16 and sum(len(g["files"]) for g in groups) < total


def test_dpp_join_empty_dim_returns_empty(spark, docs, bloom_cat):
    from logzilla_spark.operators.enrich import join_dim_file_pruned

    dim = docs.filter("doc_id < 0").select(F.col("doc_id").alias("td_id"))
    out = join_dim_file_pruned(spark, bloom_cat, "docs", "doc_id", dim, "td_id")
    assert out.count() == 0
    assert out.columns == docs.columns + ["td_id"]
