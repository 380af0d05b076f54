"""CCNet-style LM perplexity gate (textstats.lm_perplexity).

The oracle run proves cross-engine bit-equality on the corpus; these
pin the SEMANTICS on hand-built inputs: in-domain text scores fewer
bits than out-of-domain text, frequency moves probability, short docs
emit no row, and bucket thresholds are the documented integer rule.
"""

from __future__ import annotations

import pytest

from logzilla_spark.operators.textstats import (
    DSIR_FRAC_BITS,
    lm_perplexity,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestLmPerplexity:
    def test_in_domain_scores_fewer_bits(self, spark):
        train = _docs(spark, [(i, "the cat sat on the mat") for i in range(5)])
        corpus = _docs(
            spark,
            [
                (1, "the cat sat on the mat"),        # exactly the domain
                (2, "zq xv qqk jjw zzt lpo"),          # alien tokens
            ],
        )
        got = {r["id"]: r for r in lm_perplexity(corpus, train).collect()}
        assert got[1]["bits_per_token"] < got[2]["bits_per_token"]
        # alien bigrams hit unseen contexts: P = 1/B -> ~log2(B) bits
        assert got[2]["bits_per_token"] == pytest.approx(10.0, abs=0.1)

    def test_frequency_moves_probability(self, spark):
        # "a b" seen 9x, "a c" seen once: a doc of "a b" beats "a c"
        train = _docs(
            spark, [(i, "a b") for i in range(9)] + [(99, "a c")]
        )
        corpus = _docs(spark, [(1, "a b"), (2, "a c")])
        got = {r["id"]: r["logp_fp"] for r in lm_perplexity(corpus, train).collect()}
        assert got[1] > got[2]  # log-probs are <= 0; higher = likelier

    def test_short_docs_emit_no_row(self, spark):
        train = _docs(spark, [(0, "a b c")])
        corpus = _docs(spark, [(1, "single"), (2, ""), (3, None), (4, "a b")])
        ids = {r["id"] for r in lm_perplexity(corpus, train).collect()}
        assert ids == {4}

    def test_bucket_rule_is_integer_exact(self, spark):
        train = _docs(spark, [(0, "a a a a a a")])  # P(a|a) ~ certain-ish
        corpus = _docs(spark, [(1, "a a a a")])
        fb = 1 << DSIR_FRAC_BITS
        [r] = lm_perplexity(corpus, train, head_bits=9.0, tail_bits=10.0).collect()
        neg = -r["logp_fp"]
        want = (
            "head"
            if neg <= round(9.0 * fb) * r["n_bigrams"]
            else "tail"
            if neg > round(10.0 * fb) * r["n_bigrams"]
            else "middle"
        )
        assert r["bucket"] == want
        # boundary: thresholds AT the score flip exactly per the rule
        exact_bits = neg / (r["n_bigrams"] * fb)
        [r2] = lm_perplexity(
            corpus, train, head_bits=exact_bits, tail_bits=exact_bits
        ).collect()
        assert r2["bucket"] in ("head", "middle")  # <= is head; > only beyond

    def test_invalid_thresholds_raise(self, spark):
        d = _docs(spark, [(0, "a b")])
        with pytest.raises(ValueError, match="head_bits"):
            lm_perplexity(d, d, head_bits=10.0, tail_bits=9.0)
