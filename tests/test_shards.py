"""Deterministic shuffle + shard placement (operators/shards.py, T57)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from logzilla_spark.operators.shards import (
    shard_manifest,
    shard_manifest_sql,
    write_shards,
)


@pytest.fixture(scope="module")
def docs(spark):
    # ids deliberately in sorted "crawl order" so decorrelation is testable
    return spark.range(2000).select(
        F.format_string("doc-%05d", F.col("id")).alias("doc_id"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
    )


def test_partition_of_corpus(docs):
    m = shard_manifest(docs, n_shards=8, seed="s").toPandas()
    # every doc placed exactly once
    assert len(m) == 2000 and m.id.nunique() == 2000
    assert set(m.shard.unique()) <= set(range(8))
    # positions are 0..n_k-1 per shard (dense, no gaps)
    for k, g in m.groupby("shard"):
        assert sorted(g.pos) == list(range(len(g)))


def test_balanced_in_expectation(docs):
    m = shard_manifest(docs, n_shards=8, seed="s").toPandas()
    sizes = m.groupby("shard").size()
    # binomial: mean 250, sd ~15; 5 sd is a generous deterministic bound
    assert sizes.min() > 250 - 75 and sizes.max() < 250 + 75


def test_deterministic_and_partitioning_independent(docs):
    a = shard_manifest(docs, n_shards=8, seed="s").toPandas()
    b = shard_manifest(
        docs.repartition(13).sortWithinPartitions(F.col("doc_id").desc()),
        n_shards=8, seed="s",
    ).toPandas()
    key = lambda df: df.sort_values("id").reset_index(drop=True)  # noqa: E731
    pd.testing.assert_frame_equal(key(a), key(b))


def test_seed_changes_permutation(docs):
    a = shard_manifest(docs, n_shards=8, seed="s1").toPandas()
    b = shard_manifest(docs, n_shards=8, seed="s2").toPandas()
    sa = a.set_index("id").shard.sort_index()
    sb = b.set_index("id").shard.sort_index()
    moved = (sa != sb).mean()
    assert moved > 0.5  # a fresh permutation reassigns ~7/8 of docs


def test_decorrelates_crawl_order(docs):
    # within a shard, consecutive positions must not follow id order:
    # count adjacent (pos, pos+1) pairs that are also id-ascending —
    # random expectation 1/2, crawl order would be 1.0
    m = shard_manifest(docs, n_shards=4, seed="s").toPandas()
    frac_asc = []
    for _, g in m.groupby("shard"):
        g = g.sort_values("pos")
        ids = g.id.tolist()
        asc = sum(a < b for a, b in zip(ids, ids[1:]))
        frac_asc.append(asc / (len(ids) - 1))
    assert all(0.3 < f < 0.7 for f in frac_asc)


def test_null_ids_excluded(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("b",)], "doc_id string"
    )
    m = shard_manifest(df, n_shards=2).toPandas()
    assert sorted(m.id) == ["a", "b"]


def test_nshards_validation(docs):
    with pytest.raises(ValueError):
        shard_manifest(docs, n_shards=0)
    with pytest.raises(ValueError):
        shard_manifest_sql("t", n_shards=0)


def test_duckdb_twin(docs, tmp_path):
    pq = str(tmp_path / "docs.parquet")
    docs.coalesce(1).write.parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW d AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    got = (
        shard_manifest(docs, n_shards=8, seed="tw")
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    want = (
        con.execute(shard_manifest_sql("d", n_shards=8, seed="tw"))
        .df().sort_values("id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_write_shards_layout_and_order(docs, tmp_path):
    import glob

    path = str(tmp_path / "shards")
    summary = write_shards(docs, path, n_shards=4, seed="w").toPandas()
    assert len(summary) == 4
    assert summary.n_rows.sum() == 2000
    assert (summary.min_pos == 0).all()
    assert (summary.max_pos == summary.n_rows - 1).all()
    # directory layout IS the shard layout
    dirs = sorted(glob.glob(f"{path}/shard=*"))
    assert len(dirs) == 4
    # a loader streaming one shard file reads the deterministic order:
    # rows inside each parquet file are pos-ascending
    for d in dirs:
        for f in glob.glob(f"{d}/*.parquet"):
            pdf = pd.read_parquet(f)
            assert pdf.pos.is_monotonic_increasing
    # payload survived: every doc's text rides along
    spark = docs.sparkSession
    back = spark.read.parquet(path)
    assert back.filter(F.col("text").isNull()).count() == 0
    assert back.select("doc_id").distinct().count() == 2000
