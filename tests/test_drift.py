"""Corpus drift report (operators/drift.py, T58)."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from logzilla_spark.operators.drift import (
    corpus_drift,
    corpus_drift_sql,
    kl_bits,
)
from logzilla_spark.operators.textstats import DSIR_FRAC_BITS

FB = 1 << DSIR_FRAC_BITS


def _snap(spark, langs):
    rows = [(i, lang) for i, lang in enumerate(langs)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_counts_and_smoothing(spark):
    a = _snap(spark, ["en"] * 60 + ["de"] * 40)
    b = _snap(spark, ["en"] * 50 + ["de"] * 50)
    got = corpus_drift(a, b, {"lang": F.col("lang")}).toPandas()
    got = got.set_index("key")
    assert got.loc["en", "n_a"] == 60 and got.loc["en", "n_b"] == 50
    # Laplace ppm: (1e6 * 61) div (100 + 2)
    assert got.loc["en", "p_a_ppm"] == (1_000_000 * 61) // 102
    assert got.loc["de", "p_b_ppm"] == (1_000_000 * 51) // 102
    # drift direction: en grew (llr > 0), de shrank (llr < 0)
    assert got.loc["en", "llr_fp"] > 0 > got.loc["de", "llr_fp"]


def test_key_absent_from_one_side(spark):
    a = _snap(spark, ["en"] * 9 + ["zz"])
    b = _snap(spark, ["en"] * 10)
    got = corpus_drift(a, b, {"lang": F.col("lang")}).toPandas()
    zz = got.set_index("key").loc["zz"]
    # smoothing keeps the baseline share finite and positive
    assert zz.n_b == 0 and zz.p_b_ppm == (1_000_000 * 1) // 12
    assert zz.llr_fp > 0  # appeared -> strong positive drift


def test_identical_snapshots_near_zero_kl(spark):
    a = _snap(spark, ["en"] * 30 + ["de"] * 20)
    got = corpus_drift(a, a, {"lang": F.col("lang")}).toPandas()
    assert (got.llr_fp == 0).all()
    assert kl_bits(int(got.kl_term.sum())) == 0.0


def test_shift_increases_chi2(spark):
    base = _snap(spark, ["en"] * 50 + ["de"] * 50)
    mild = _snap(spark, ["en"] * 55 + ["de"] * 45)
    wild = _snap(spark, ["en"] * 90 + ["de"] * 10)

    def chi2(a, b):
        return int(
            corpus_drift(a, b, {"lang": F.col("lang")})
            .toPandas().chi2_term.sum()
        )

    # chi-square is exact integer arithmetic: zero-shift is exactly 0,
    # and it grows monotonically with the shift
    assert chi2(base, base) == 0
    assert 0 < chi2(mild, base) < chi2(wild, base)
    # the approximate KL is only trustworthy at sizeable drift: the
    # wild shift (true KL ~0.53 bits) must dominate its 0.086-bit/log
    # interpolation error
    k_wild = kl_bits(
        int(corpus_drift(wild, base, {"lang": F.col("lang")})
            .toPandas().kl_term.sum())
    )
    assert 0.3 < k_wild < 0.8


def test_null_keys_excluded(spark):
    a = spark.createDataFrame(
        [(1, "en"), (2, None), (3, "de")], "doc_id long, lang string"
    )
    got = corpus_drift(a, a, {"lang": F.col("lang")}).toPandas()
    assert sorted(got.key) == ["de", "en"]
    assert got.n_a.sum() == 2


def test_multi_dim_single_scan_semantics(spark):
    a = spark.createDataFrame(
        [(1, "en", 100), (2, "de", 2000)], "doc_id long, lang string, n long"
    )
    dims = {
        "lang": F.col("lang"),
        "octave": F.expr("cast(length(bin(n)) - 1 as string)"),
    }
    got = corpus_drift(a, a, dims).toPandas()
    assert set(got.dim) == {"lang", "octave"}
    # per-dim totals are independent: each dim saw both docs
    assert got.groupby("dim").n_a.sum().eq(2).all()


def test_requires_dims(spark):
    a = _snap(spark, ["en"])
    with pytest.raises(ValueError):
        corpus_drift(a, a, {})
    with pytest.raises(ValueError):
        corpus_drift_sql("a", "b", {})


def test_duckdb_twin_on_documents(spark, duck01):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = docs.filter(F.expr("doc_id % 2 = 0"))
    b = docs.filter(F.expr("doc_id % 2 = 1"))
    dims = {
        "lang": F.col("lang"),
        "len_octave": F.expr(
            "cast(length(bin(greatest(n_chars, 1L))) - 1 as string)"
        ),
    }
    got = (
        corpus_drift(a, b, dims)
        .toPandas().sort_values(["dim", "key"]).reset_index(drop=True)
    )
    dsql = {
        "lang": "lang",
        "len_octave":
            "CAST(length(printf('%b', greatest(n_chars, 1))) - 1 AS VARCHAR)",
    }
    sql = corpus_drift_sql(
        "(SELECT * FROM documents WHERE doc_id % 2 = 0)",
        "(SELECT * FROM documents WHERE doc_id % 2 = 1)",
        dsql,
    )
    want = (
        duck01.execute(sql).df()
        .sort_values(["dim", "key"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_fixed_point_vs_python_reference(spark):
    """llr_fp matches a pure-Python recomputation of the documented
    rule on the exact smoothed ppm integers."""
    a = _snap(spark, ["en"] * 7 + ["de"] * 13)
    b = _snap(spark, ["en"] * 11 + ["de"] * 3)
    got = corpus_drift(a, b, {"lang": F.col("lang")}).toPandas()

    def log2fp(x: int) -> int:
        m = x.bit_length() - 1
        return m * FB + (x * FB) // (1 << m) - FB

    for r in got.itertuples():
        assert r.llr_fp == log2fp(int(r.p_a_ppm)) - log2fp(int(r.p_b_ppm))
        assert r.kl_term == r.p_a_ppm * r.llr_fp
