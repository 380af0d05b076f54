"""Asymmetric (incremental) near-dup: delta vs reference corpus
(dedup.minhash_lsh_pairs_against, T72)."""

import pandas as pd
import pytest

from logzilla_spark.operators import dedup


def _mk(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        schema="doc_id long, text string",
    )


WORDS = ("spark hash join merge sort shuffle batch stream table scan "
         "filter agg window part key row column value data").split()


def _doc(seed: int, mutate: int | None = None) -> str:
    toks = [WORDS[(seed * 7 + i * 3) % len(WORDS)] for i in range(30)]
    if mutate is not None:
        toks[mutate % 30] = "zzz"
    return " ".join(toks)


@pytest.fixture(scope="module")
def split(spark):
    # corpus: docs 0..19 (4 base shapes); delta: 100..109 — half are
    # near-copies of corpus docs (1-token mutation), half fresh shapes
    corpus = _mk(
        spark, [(i, _doc(i % 4)) for i in range(20)]
    )
    delta = _mk(
        spark,
        [(100 + j,
          _doc(j % 4, mutate=j) if j < 5
          else " ".join(f"w{j}x{i}" for i in range(30)))  # genuinely fresh
         for j in range(10)],
    )
    return delta, corpus


def test_near_copies_found_and_no_corpus_pairs(split):
    delta, corpus = split
    got = dedup.minhash_lsh_pairs_against(delta, corpus).toPandas()
    assert set(got.doc_new) == {100, 101, 102, 103, 104}
    assert set(got.doc_old) <= set(range(20))
    assert (got.jaccard >= dedup.MIN_JACCARD).all()
    # orientation: doc_new always from the delta side
    assert (got.doc_new >= 100).all()


def test_matches_symmetric_cross_pairs(split):
    """On a union corpus small enough that no bucket guard fires, the
    asymmetric pairs are exactly the symmetric operator's cross-side
    pairs (ids ordered so delta ids sort after corpus ids)."""
    delta, corpus = split
    union = corpus.unionByName(delta)
    sym = dedup.minhash_lsh_pairs(union).toPandas()
    cross = sym[(sym.doc_a < 100) & (sym.doc_b >= 100)]
    want = {
        (int(r.doc_b), int(r.doc_a), r.jaccard) for r in cross.itertuples()
    }
    got = dedup.minhash_lsh_pairs_against(delta, corpus).toPandas()
    have = {(int(r.doc_new), int(r.doc_old), r.jaccard) for r in got.itertuples()}
    assert have == want


def test_filter_keeps_only_fresh_docs(split):
    delta, corpus = split
    surv = dedup.neardup_filter_against(delta, corpus).toPandas()
    assert set(surv.doc_id) == {105, 106, 107, 108, 109}


def test_empty_delta_and_empty_corpus(split):
    delta, corpus = split
    empty = delta.limit(0)
    assert dedup.minhash_lsh_pairs_against(empty, corpus).count() == 0
    assert dedup.minhash_lsh_pairs_against(delta, empty.toDF(*delta.columns)).count() == 0
    surv = dedup.neardup_filter_against(delta, delta.limit(0))
    assert surv.count() == delta.count()


def test_per_side_bucket_guard(spark):
    # 30 identical corpus docs -> every corpus band bucket has 30
    # members; with max_bucket=10 the corpus side is guarded out, so a
    # delta copy of that text finds NO pair (sound: guard drops
    # boilerplate, mirrored per side in the twin)
    corpus = _mk(spark, [(i, _doc(0)) for i in range(30)])
    delta = _mk(spark, [(100, _doc(0))])
    got = dedup.minhash_lsh_pairs_against(delta, corpus, max_bucket=10)
    assert got.count() == 0
    ungated = dedup.minhash_lsh_pairs_against(delta, corpus, max_bucket=None)
    assert ungated.count() == 30


def test_twin_parity(split, tmp_path):
    import duckdb

    from logzilla_spark import oracle_dataops

    delta, corpus = split
    union = corpus.unionByName(delta)
    pq = str(tmp_path / "docs.parquet")
    union.coalesce(1).write.parquet(pq)
    got = (
        dedup.minhash_lsh_pairs_against(delta, corpus)
        .toPandas().sort_values(["doc_new", "doc_old"]).reset_index(drop=True)
    )
    sql = oracle_dataops.minhash_lsh_pairs_against_sql(
        f"{pq}/*.parquet", "id >= 100"
    )
    want = (
        duckdb.connect().execute(sql).df()
        .sort_values(["doc_new", "doc_old"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
