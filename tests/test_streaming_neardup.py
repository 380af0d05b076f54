"""Streaming near-dup suppression vs a sequential reference.

The differential gate feeds the SAME band sets the operator computes
(collected from the batch builders) into a driver-side sequential
simulation of the documented rule — registry hit OR lost contested
band suppresses; kept docs claim all their bands — so the test pins
the operator's semantics without assuming which texts happen to
collide in LSH space.
"""

import os

import pandas as pd
import pytest

from logzilla_spark.operators.dedup import _minhash_features, minhash_band_hashes
from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.streaming.neardup import (
    KEPT_TABLE,
    REGISTRY_TABLE,
    _registry_before,
    neardup_batch,
    start_neardup_stream,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain in "
    "spain stays mainly in the plain and the cat sat on the mat"
)
EDIT1 = BASE.replace("lazy dog", "sleepy dog")
EDIT2 = BASE.replace("cat sat", "dog sat")
OTHER = (
    "completely different content about distributed query engines "
    "shuffling partitioned columnar data across a thousand executors"
)
OTHER_EDIT = OTHER.replace("thousand", "million")


def _triggers():
    """Three micro-batches: in-trigger dups, cross-trigger dups,
    near-dups of both kept and suppressed docs, and novel docs."""
    return [
        pd.DataFrame({
            "doc_id": [1, 2, 3],
            # 1 vs 2: exact in-trigger dup (full band contention);
            # 3: unrelated
            "text": [BASE, BASE, OTHER],
        }),
        pd.DataFrame({
            "doc_id": [4, 5, 6, 9],
            # 4: exact cross-trigger dup of kept 1; 5: near-dup edit
            # of 1; 6: near-dup edit of kept 3; 9: novel (the epoch
            # must register SOME claim for the replay-read test)
            "text": [BASE, EDIT1, OTHER_EDIT,
                     "a third unrelated subject entirely about sea birds"],
        }),
        pd.DataFrame({
            "doc_id": [7, 8],
            # 7: second edit of 1; 8: novel
            "text": [EDIT2, "tiny novel text"],
        }),
    ]


def _band_sets(spark, pdf):
    """doc_id -> set of (band_id, band_hash), via the operator's own
    builders (differential, not assumed)."""
    bands = minhash_band_hashes(
        _minhash_features(
            spark.createDataFrame(pdf), "doc_id", "text"
        ).select("id", "sig")
    ).collect()
    out: dict[int, set] = {int(i): set() for i in pdf["doc_id"]}
    for r in bands:
        out[int(r["id"])].add((r["band_id"], r["band_hash"]))
    return out


def _simulate(trigger_bands):
    """Sequential reference of the documented rule."""
    registry: set = set()
    kept: list[int] = []
    for trig in trigger_bands:
        win: dict = {}
        for d, bs in trig.items():
            for b in bs:
                win[b] = min(win.get(b, d), d)
        kept_now = [
            d
            for d, bs in trig.items()
            if not any(b in registry for b in bs)
            and all(win[b] == d for b in bs)
        ]
        for d in kept_now:
            registry |= trig[d]
        kept.extend(kept_now)
    return sorted(kept)


def test_neardup_batches_match_sequential_reference(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    trigs = _triggers()
    stats = [
        neardup_batch(spark.createDataFrame(t), cat, "q", i)
        for i, t in enumerate(trigs)
    ]
    expected = _simulate([_band_sets(spark, t) for t in trigs])
    got = sorted(
        r["doc_id"] for r in cat.read(spark, KEPT_TABLE).collect()
    )
    assert got == expected
    # the crafted corpus must actually exercise suppression, or the
    # test is vacuous
    assert sum(s["suppressed"] for s in stats) >= 3
    assert 2 not in got and 4 not in got  # exact dup, both trigger shapes
    # registry carries exactly the kept docs' claims
    reg_ids = sorted(
        set(r["id"] for r in cat.read(spark, REGISTRY_TABLE).collect())
    )
    assert reg_ids == expected


def test_neardup_epoch_replay_is_idempotent(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    trigs = _triggers()
    for i, t in enumerate(trigs[:2]):
        neardup_batch(spark.createDataFrame(t), cat, "q", i)
    kept_snaps = cat.snapshot_ids(KEPT_TABLE)
    reg_snaps = cat.snapshot_ids(REGISTRY_TABLE)
    # full replay of epoch 1: both sinks skip, no new snapshots
    res = neardup_batch(spark.createDataFrame(trigs[1]), cat, "q", 1)
    assert res == {"kept": -1, "suppressed": -1}
    assert cat.snapshot_ids(KEPT_TABLE) == kept_snaps
    assert cat.snapshot_ids(REGISTRY_TABLE) == reg_snaps


def test_registry_read_excludes_own_epoch_on_replay(spark, tmp_path):
    """A replay that crashed between the kept append and the registry
    append must read the registry WITHOUT this epoch's claims."""
    cat = LocalCatalog(str(tmp_path / "wh"))
    trigs = _triggers()
    neardup_batch(spark.createDataFrame(trigs[0]), cat, "q", 0)
    neardup_batch(spark.createDataFrame(trigs[1]), cat, "q", 1)
    head = cat.read(spark, REGISTRY_TABLE).count()
    # replay of epoch 1 (the only epoch foreachBatch can replay —
    # epoch 0 would imply epoch 1 never committed): own claims excluded
    before = _registry_before(cat, spark, "q", 1)
    assert before.count() < head
    # and for a NEW epoch the head is the right read
    fresh = _registry_before(cat, spark, "q", 2)
    assert fresh.count() == head


def test_neardup_stream_end_to_end(spark, tmp_path):
    src = tmp_path / "src"
    os.makedirs(src)
    f0 = pd.DataFrame({"doc_id": [1, 2], "text": [BASE, OTHER]})
    f1 = pd.DataFrame({"doc_id": [3, 4], "text": [BASE, "novel text here"]})
    for i, b in enumerate((f0, f1)):
        p = src / f"batch{i}.parquet"
        b.to_parquet(p, index=False)
        os.utime(p, (1000 + i, 1000 + i))  # pin trigger order
    docs = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    wh = str(tmp_path / "wh")
    q = start_neardup_stream(docs, wh, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    cat = LocalCatalog(wh)
    kept = sorted(
        r["doc_id"] for r in cat.read(spark, KEPT_TABLE).collect()
    )
    # exactly one of the two exact copies survives (file order pinned
    # -> doc 1), every distinct doc survives
    assert kept == [1, 2, 4]
    assert cat.read(spark, REGISTRY_TABLE).select("id").distinct().count() == 3


def test_neardup_empty_batch_is_noop(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    empty = spark.createDataFrame([], "doc_id long, text string")
    res = neardup_batch(empty, cat, "q", 0)
    assert res == {"kept": 0, "suppressed": 0}
    assert not cat.exists(KEPT_TABLE) and not cat.exists(REGISTRY_TABLE)


# ---------------------------------------------------------------------------
# property test: random corpora, random trigger splits, vs the
# sequential reference — same differential construction as above
# (band sets come from the operator's own builders)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


@st.composite
def _corpus_splits(draw):
    n = draw(st.integers(min_value=2, max_value=10))
    texts = []
    for i in range(n):
        if texts and draw(st.booleans()):
            # duplicate or near-duplicate of an earlier doc
            base = texts[draw(st.integers(0, len(texts) - 1))]
            if draw(st.booleans()):
                texts.append(base)
            else:
                texts.append(base + " " + draw(st.sampled_from(_WORDS)))
        else:
            words = draw(
                st.lists(st.sampled_from(_WORDS), min_size=4, max_size=12)
            )
            texts.append(" ".join(words))
    n_trig = draw(st.integers(min_value=1, max_value=3))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(0, n), min_size=n_trig - 1, max_size=n_trig - 1
            )
        )
    )
    bounds = [0, *cuts, n]
    return [
        pd.DataFrame(
            {
                "doc_id": list(range(bounds[i], bounds[i + 1])),
                "text": texts[bounds[i]: bounds[i + 1]],
            }
        )
        for i in range(len(bounds) - 1)
        if bounds[i] < bounds[i + 1]
    ]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(trigs=_corpus_splits())
def test_neardup_property_matches_reference(trigs, spark, tmp_path_factory):
    cat = LocalCatalog(str(tmp_path_factory.mktemp("wh")))
    for i, t in enumerate(trigs):
        neardup_batch(spark.createDataFrame(t), cat, "q", i)
    expected = _simulate([_band_sets(spark, t) for t in trigs])
    got = sorted(
        r["doc_id"] for r in cat.read(spark, KEPT_TABLE).collect()
    )
    assert got == expected


def test_batch_compaction_composition(spark, tmp_path):
    """The documented closure of the streaming trade
    (streaming/neardup.py module docstring): periodic BATCH
    compaction over the kept sink — minhash pairs (verified Jaccard)
    + connected components keep-first — collapses any near-dup family
    the candidate-level stream let through and keeps every
    singleton. Asserted structurally over whatever the stream kept:
    compaction output ⊆ stream keeps, exactly one doc per cluster."""
    from logzilla_spark.operators.cluster import neardup_clusters
    from logzilla_spark.operators.dedup import minhash_lsh_pairs

    cat = LocalCatalog(str(tmp_path / "wh"))
    t0 = pd.DataFrame({"doc_id": [1, 2, 3], "text": [BASE, BASE, OTHER]})
    t1 = pd.DataFrame({"doc_id": [4, 5], "text": [EDIT1, "wholly new"]})
    neardup_batch(spark.createDataFrame(t0), cat, "q", 0)
    neardup_batch(spark.createDataFrame(t1), cat, "q", 1)
    kept = cat.read(spark, KEPT_TABLE)
    pairs = minhash_lsh_pairs(kept)
    compacted = neardup_clusters(kept, pairs).filter("is_canonical")
    ids = sorted(r["id"] for r in compacted.collect())
    # compaction output is a subset of the stream's keeps, one doc
    # per verified near-dup family, and retains every singleton
    stream_ids = sorted(r["doc_id"] for r in kept.collect())
    assert set(ids) <= set(stream_ids)
    assert 1 in ids or 4 in ids  # the BASE family survives as one doc
    assert len(ids) == compacted.select("cluster_id").distinct().count()
