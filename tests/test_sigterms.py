"""T66 significant terms: JLH-scored overrepresentation in a slice.

Pins doc-frequency (not term-frequency) counting, the foreground ⊆
background contract, the min_fg and overrepresentation-only filters,
the deterministic (score DESC, token ASC) cut, and that the slice is
the SAME assembled predicate the hits page uses (composes with any
node, including T65 phrase terms).
"""

from datetime import datetime

import pytest

from logzilla_spark.operators.fulltext import significant_terms
from logzilla_spark.operators.query import (
    ComparisonNode,
    PhraseNode,
    Query,
)

T = datetime


@pytest.fixture(scope="module")
def df(spark):
    # 4 ERROR docs (foreground), 4 INFO docs. 'boom' in all fg docs
    # and nowhere else; 'shared' everywhere; 'rare' in one fg doc
    # (duplicated in-doc: doc frequency must count it once).
    rows = [
        ("a", "s1", T(2024, 1, 1), "ERROR", "boom shared rare rare", {}),
        ("b", "s1", T(2024, 1, 2), "ERROR", "boom shared", {}),
        ("c", "s2", T(2024, 1, 3), "ERROR", "boom shared", {}),
        ("d", "s2", T(2024, 1, 4), "ERROR", "boom shared", {}),
        ("e", "s3", T(2024, 1, 1), "INFO", "shared calm", {}),
        ("f", "s3", T(2024, 1, 2), "INFO", "shared calm", {}),
        ("g", "s4", T(2024, 1, 3), "INFO", "shared calm", {}),
        ("h", "s4", T(2024, 1, 4), "INFO", "shared calm", {}),
    ]
    return spark.createDataFrame(
        rows,
        "id string, source string, timestamp timestamp, level string, "
        "message string, metadata map<string,string>",
    )


def _q(node=None):
    return Query(start=T(2024, 1, 1), end=T(2024, 1, 8), node=node, limit=1000)


def _rows(df, node=None, **kw):
    q = _q(node or ComparisonNode("level", "ERROR", "eq"))
    return {
        r.token: r
        for r in significant_terms(df, q, **kw).collect()
    }


def test_jlh_scoring_and_filters(df):
    out = _rows(df, min_fg=1)
    # 'boom': fg 4/4, bg 4/8 -> (1 - .5) * (1/.5) = 1.0
    assert out["boom"].fg_docs == 4 and out["boom"].bg_docs == 4
    assert out["boom"].score == pytest.approx(1.0)
    # 'rare' counted by DOC frequency: one fg doc despite 2 occurrences
    assert out["rare"].fg_docs == 1 and out["rare"].bg_docs == 1
    # 'shared' is everywhere: fg% == bg% -> not overrepresented, dropped
    assert "shared" not in out
    # 'calm' is underrepresented (fg 0) -> dropped
    assert "calm" not in out
    # the level token itself is maximally significant (fg-only)
    assert out["error"].score == pytest.approx(1.0)


def test_min_fg_filter(df):
    assert "rare" in _rows(df, min_fg=1)
    assert "rare" not in _rows(df, min_fg=2)
    assert "boom" in _rows(df, min_fg=4)


def test_cut_is_deterministic_total_order(df):
    # 'boom' and 'error' tie at 1.0 -> token ASC breaks the tie
    toks = [r.token for r in significant_terms(
        df, _q(ComparisonNode("level", "ERROR", "eq")), k=2, min_fg=1
    ).collect()]
    assert toks == ["boom", "error"]


def test_time_range_is_part_of_the_slice(df):
    # narrow window: only docs a..b / e..f are in range; the time
    # predicate bounds the FOREGROUND only (background = whole frame)
    q = Query(start=T(2024, 1, 1), end=T(2024, 1, 2, 12),
              node=ComparisonNode("level", "ERROR", "eq"), limit=1000)
    out = {r.token: r for r in significant_terms(df, q, min_fg=1).collect()}
    assert out["boom"].fg_docs == 2 and out["boom"].bg_docs == 4


def test_composes_with_phrase_node(df):
    # slice = proximity phrase (T65): fg docs are those with
    # 'boom ... rare' within slop 1 — only doc a
    out = {
        r.token: r
        for r in significant_terms(
            df, _q(PhraseNode("boom rare", 1)), min_fg=1
        ).collect()
    }
    assert out["rare"].fg_docs == 1
    assert out["rare"].score > out["boom"].score


def test_corpus_smoke(records_sf0001):
    q = Query(start=T(2024, 1, 1), end=T(2024, 1, 8),
              node=ComparisonNode("level", ["ERROR", "FATAL"], "in"),
              limit=1000)
    toks = [r.token for r in
            significant_terms(records_sf0001, q, k=25, min_fg=5).collect()]
    # the failure vocabulary should dominate the ERROR/FATAL slice
    assert {"timeout", "upstream", "disk"} <= set(toks)


def test_validates(df):
    with pytest.raises(ValueError):
        significant_terms(df, _q(), k=0)


def test_api_request(df):
    import json

    from logzilla_spark.api import sigterms_request

    body = json.dumps({
        "start": "2024-01-01T00:00:00", "end": "2024-01-08T00:00:00",
        "node": {"field": "level", "value": "ERROR", "op": "eq"},
        "k": 2, "min_fg": 1,
    })
    resp = sigterms_request(df, body)
    assert resp["success"] and [d["token"] for d in resp["data"]] == [
        "boom", "error"
    ]
    # validation enveloped, not raised
    assert not sigterms_request(df, json.dumps({"k": 3}))["success"]
    assert not sigterms_request(
        df, json.dumps({"start": "2024-01-01T00:00:00", "k": 0})
    )["success"]
