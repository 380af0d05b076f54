"""BM25 relevance tier (fulltext.bm25_topk).

The oracle run proves bit-identical scores and identical top-k cuts
cross-engine; these pin the RANKING semantics on hand-built records:
idf (rare beats common), tf monotonicity, length normalization, OR
matching, and the deterministic cut.
"""

from __future__ import annotations

import pytest

from logzilla_spark.operators.fulltext import bm25_topk


def _records(spark, messages):
    rows = [
        (f"doc{i:03d}", m, "hostX", "INFO", {})
        for i, m in enumerate(messages)
    ]
    return spark.createDataFrame(
        rows,
        "id string, message string, source string, level string, "
        "metadata map<string,string>",
    )


def _rank(spark, messages, query, k=10):
    out = bm25_topk(_records(spark, messages), query, k=k).collect()
    return [r["id"] for r in out], {r["id"]: r for r in out}


class TestBm25:
    def test_more_matched_terms_rank_higher(self, spark):
        ids, _ = _rank(
            spark,
            ["alpha beta", "alpha noise", "noise only here"],
            "alpha beta",
        )
        assert ids[0] == "doc000"
        assert "doc002" not in ids  # OR semantics still needs >= 1 term

    def test_rare_term_outranks_common_term(self, spark):
        # 'rare' appears in 1 of 10 docs, 'common' in 9: equal tf, the
        # rare-term doc must score higher.
        msgs = ["common filler"] * 9 + ["rare filler"]
        _ids, rows = _rank(spark, msgs, "rare common", k=10)
        rare_doc = rows["doc009"]
        some_common = rows["doc000"]
        assert rare_doc["score"] > some_common["score"]

    def test_tf_monotone_and_length_normalization(self, spark):
        msgs = [
            "term term term",      # tf 3, dl 3
            "term",                # tf 1, dl 1
            "term pad pad pad pad pad pad pad",  # tf 1, dl 8 (diluted)
        ]
        _ids, rows = _rank(spark, msgs, "term")
        assert rows["doc000"]["score"] > rows["doc001"]["score"]
        assert rows["doc001"]["score"] > rows["doc002"]["score"]

    def test_k_cut_is_deterministic_by_id(self, spark):
        # 5 identical docs, k=3: equal scores, ids break the tie
        ids, _ = _rank(spark, ["same text"] * 5, "same", k=3)
        assert ids == ["doc000", "doc001", "doc002"]

    def test_empty_query_raises(self, spark):
        with pytest.raises(ValueError, match="no tokens"):
            bm25_topk(_records(spark, ["x"]), "!!!")

    def test_searchable_fields_include_metadata(self, spark):
        df = spark.createDataFrame(
            [("a", "msg", "h", "INFO", {"service": "billing"}),
             ("b", "msg", "h", "INFO", {})],
            "id string, message string, source string, level string, "
            "metadata map<string,string>",
        )
        out = bm25_topk(df, "billing").collect()
        assert [r["id"] for r in out] == ["a"]
