"""Streaming curation gates vs the batch operators (differential)."""

import os
from datetime import datetime, timedelta

import pandas as pd
import pytest

from logzilla_spark.operators import textstats
from logzilla_spark.streaming.curate import streaming_curate

T0 = datetime(2024, 3, 1, 8, 0, 0)

EN = ("the quick brown fox jumps over the lazy dog and that is a fine "
      "sentence with plenty of ordinary common words to keep the "
      "quality heuristics comfortably above the funnel threshold here")


@pytest.fixture()
def doc_stream(tmp_path):
    src = tmp_path / "src"
    os.makedirs(src)
    # n_chars mirrors the real documents table: a raw input column whose
    # name COLLIDES with a gate-internal column — it must pass through
    # streaming_curate byte-identical (the shield rename), not be
    # overwritten by the gate's own n_chars or dropped with it
    rows0 = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                EN,                                      # kept
                "el la de que y en un los se del " * 4,  # spanish: gated
                "1 2 3 4 5 6 7 8 9 0 " * 6,              # low quality: gated
                EN + " extra tail words here",           # kept (distinct)
            ],
            "n_chars": [111, 222, 333, 444],
            "ts": [T0 + timedelta(minutes=i) for i in range(4)],
        }
    )
    rows1 = pd.DataFrame(
        {
            "doc_id": [5, 6],
            "text": [EN, EN.replace("fox", "cat")],      # 5 = dup of 1
            "n_chars": [555, 666],
            "ts": [T0 + timedelta(minutes=10), T0 + timedelta(minutes=11)],
        }
    )
    for i, b in enumerate((rows0, rows1)):
        b["ts"] = b["ts"].astype("datetime64[us]")
        b.to_parquet(src / f"batch{i}.parquet", index=False)
    return str(src), str(tmp_path / "ckpt")


def test_streaming_curate_matches_batch_gates(spark, doc_stream):
    src, ckpt = doc_stream
    docs = (
        spark.readStream.schema("doc_id long, text string, n_chars long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_curate(docs)
        .writeStream.format("memory")
        .queryName("stream_curate")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {r.doc_id: r for r in spark.sql("SELECT * FROM stream_curate").collect()}

    # batch twin of the gates over the same rows
    bdf = spark.read.parquet(src)
    langs = {r.id: r.pred_lang for r in textstats.language_id(bdf).collect()}
    quals = {r.id: r.quality for r in textstats.quality_score(bdf).collect()}
    gated = {
        i for i in langs
        if langs[i] == "en" and quals[i] is not None and quals[i] >= 0.4
    }
    assert gated == {1, 4, 5, 6}
    # first-arrival dedup on top: doc 5 (dup of 1, later batch) dropped
    assert set(got) == {1, 4, 6}
    # gate columns surface on the stream and match the batch operators
    for i in got:
        assert got[i].pred_lang == langs[i]
        assert got[i].quality == quals[i]
        assert got[i].content_hash is not None
    # the colliding raw column survives with its ORIGINAL values
    assert {got[i].n_chars for i in got} == {111 * 1, 444, 666}
    # reserved output names are rejected loudly
    import pytest as _pytest
    from logzilla_spark.streaming.curate import streaming_curate as _sc
    bad = spark.range(1).selectExpr("'x' AS text", "1.0 AS quality")
    with _pytest.raises(ValueError):
        _sc(bad)
