"""Streaming exact dedup vs the batch operator (first-arrival-wins)."""

import os
from datetime import datetime, timedelta

import pandas as pd
import pytest

from logzilla_spark.streaming.dedup import streaming_exact_dedup

T0 = datetime(2024, 3, 1, 8, 0, 0)


@pytest.fixture()
def doc_stream(tmp_path):
    src = tmp_path / "src"
    os.makedirs(src)
    # batch 0: three distinct docs, one in-batch duplicate
    b0 = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["alpha beta", "gamma delta", "alpha  beta", "epsilon"],
            "ts": [T0, T0, T0 + timedelta(minutes=1), T0 + timedelta(minutes=2)],
        }
    )
    # batch 1: cross-batch duplicate (within horizon) + one new doc
    b1 = pd.DataFrame(
        {
            "doc_id": [5, 6],
            "text": ["gamma delta", "zeta"],
            "ts": [T0 + timedelta(minutes=10), T0 + timedelta(minutes=11)],
        }
    )
    for i, b in enumerate((b0, b1)):
        b["ts"] = b["ts"].astype("datetime64[us]")
        b.to_parquet(src / f"batch{i}.parquet", index=False)
    return str(src), str(tmp_path / "ckpt")


def test_streaming_dedup_first_arrival_wins(spark, doc_stream):
    src, ckpt = doc_stream
    docs = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_exact_dedup(docs)
    q = (
        out.writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT * FROM stream_dedup").collect()
    # one row per distinct normalized text; duplicates (in-batch doc 3,
    # cross-batch doc 5) dropped
    assert sorted(r.doc_id for r in got) == [1, 2, 4, 6]
    # hash key matches the batch operator's (md5 of normalized text):
    # normalization collapses doc 3's double space into doc 1's hash
    hashes = {r.content_hash for r in got}
    assert len(hashes) == 4
    batch = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta"), (4, "epsilon"), (6, "zeta")],
        "doc_id long, text string",
    )
    from logzilla_spark.operators.dedup import exact_dedup_groups

    assert {
        r.content_hash for r in exact_dedup_groups(batch).collect()
    } == hashes
