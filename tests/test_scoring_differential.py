"""Pure-Python differentials for the scoring operators.

The DuckDB oracle proves Spark==DuckDB on the synthetic corpus; these
prove Spark == an INDEPENDENT pure-Python implementation of the same
documented pipelines on adversarial random inputs — the BPE/HLL
precedent. Integer pipelines (LM fixed-point) must match exactly;
float dags (BM25) must match to the double BIT, which holds because
Python floats are IEEE doubles and the reference states the identical
operation order.
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from logzilla_spark.operators.fulltext import bm25_topk
from logzilla_spark.operators.textstats import (
    DSIR_FRAC_BITS,
    LM_BUCKETS,
    lm_perplexity,
)

FB = 1 << DSIR_FRAC_BITS


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _log2_fp(x: int) -> int:
    m = x.bit_length() - 1
    return m * FB + ((x << DSIR_FRAC_BITS) // (1 << m)) - FB


_LOG1M = _log2_fp(1_000_000)


# -- LM perplexity reference ------------------------------------------


def _py_bigrams(docs, B):
    out = []
    for i, t in docs:
        if t is None:
            continue
        n = re.sub(r"\s+", " ", t.lower()).strip()
        toks = n.split(" ")
        if len(toks) < 2:
            continue
        for a, b in zip(toks, toks[1:]):
            out.append((i, _md5_long(a) % B, _md5_long(b) % B))
    return out


def _py_lm(corpus, train, B=LM_BUCKETS, head_bits=9.0, tail_bits=10.0):
    pair = Counter((bp, nb) for _, bp, nb in _py_bigrams(train, B))
    ctx = Counter()
    for (bp, _nb), c in pair.items():
        ctx[bp] += c

    def llp(cp, cc):
        p1 = max((1_000_000 * (cp + 1)) // (cc + B), 1)
        return _log2_fp(p1) - _LOG1M

    unseen = _log2_fp(max(1_000_000 // B, 1)) - _LOG1M
    head_fp, tail_fp = round(head_bits * FB), round(tail_bits * FB)
    out = {}
    for i, bp, nb in _py_bigrams(corpus, B):
        if (bp, nb) in pair:
            v = llp(pair[(bp, nb)], ctx[bp])
        elif bp in ctx:
            v = llp(0, ctx[bp])
        else:
            v = unseen
        n, s = out.get(i, (0, 0))
        out[i] = (n + 1, s + v)
    res = {}
    for i, (n, s) in out.items():
        neg = -s
        bucket = (
            "head" if neg <= head_fp * n
            else "tail" if neg > tail_fp * n
            else "middle"
        )
        res[i] = (n, s, float(neg) / float(n * FB), bucket)
    return res


_token = st.text(alphabet="abcdefgh", min_size=1, max_size=3)
_doc = st.lists(_token, min_size=0, max_size=8).map(" ".join)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    corpus=st.lists(_doc, min_size=1, max_size=12),
    train=st.lists(_doc, min_size=1, max_size=8),
)
def test_lm_perplexity_matches_python_reference(corpus, train, spark):
    cdocs = list(enumerate(corpus))
    tdocs = list(enumerate(train))
    cdf = spark.createDataFrame(cdocs, "doc_id bigint, text string")
    tdf = spark.createDataFrame(tdocs, "doc_id bigint, text string")
    got = {
        r["id"]: (r["n_bigrams"], r["logp_fp"], r["bits_per_token"], r["bucket"])
        for r in lm_perplexity(cdf, tdf, n_buckets=64).collect()
    }
    want = _py_lm(cdocs, tdocs, B=64)
    assert got == want  # exact ints AND exact double bits


# -- BM25 reference ----------------------------------------------------


def _py_bm25(records, query_tokens, k, k1=1.2, b=0.75):
    toks = []
    for rid, msg in records:
        full = f"{msg} hostx INFO "
        t = [x for x in re.split(r"[^a-z0-9]+", full.lower()) if x]
        toks.append((rid, t))
    n = len(toks)
    sumdl = sum(len(t) for _, t in toks)
    df = [sum(1 for _, t in toks if q in t) for q in query_tokens]

    def idf(dfi):
        r = max((1_000_000 * (2 * n + 2)) // (2 * dfi + 1), 1)
        return float(_log2_fp(r) - _LOG1M) / FB

    idfs = [idf(d) for d in df]
    k1p1 = k1 + 1.0
    scored = []
    for rid, t in toks:
        dl = len(t)
        matched, score = 0, 0.0
        for i, q in enumerate(query_tokens):
            tf = t.count(q)
            if tf > 0:
                matched += 1
                norm = 1.0 - b + b * (float(dl) / (float(sumdl) / float(n)))
                score = score + idfs[i] * (
                    float(tf) * k1p1 / (float(tf) + k1 * norm)
                )
            else:
                score = score + 0.0
        if matched > 0:
            scored.append((rid, matched, score))
    scored.sort(key=lambda r: (-r[2], r[0]))
    return scored[:k]


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    msgs=st.lists(
        st.lists(
            st.sampled_from(["disk", "error", "svc3", "ok", "warn", "x9"]),
            min_size=1,
            max_size=6,
        ).map(" ".join),
        min_size=1,
        max_size=10,
    )
)
def test_bm25_matches_python_reference(msgs, spark):
    records = [(f"doc{i:03d}", m) for i, m in enumerate(msgs)]
    df = spark.createDataFrame(
        [(rid, m, "hostx", "INFO", {}) for rid, m in records],
        "id string, message string, source string, level string, "
        "metadata map<string,string>",
    )
    got = [
        (r["id"], r["n_terms_matched"], r["score"])
        for r in bm25_topk(df, "disk error svc3", k=5).collect()
    ]
    want = _py_bm25(records, ["disk", "error", "svc3"], k=5)
    assert got == want  # identical selection, order, and double bits
