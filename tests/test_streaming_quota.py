"""Streaming quota enforcement (streaming/quota.py, T78)."""

import datetime as dt
import os

import pandas as pd
import pytest

from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.streaming.quota import (
    COUNTS_TABLE,
    TAGGED_TABLE,
    _spent_before,
    quota_batch,
)

T0 = dt.datetime(2024, 1, 1)


def _batch(spark, rows):
    # rows: (id, minutes-offset, source)
    return spark.createDataFrame(
        pd.DataFrame(
            [(i, T0 + dt.timedelta(minutes=m), s, "m") for i, m, s in rows],
            columns=["id", "timestamp", "source", "message"],
        ),
        schema="id string, timestamp timestamp, source string, message string",
    )


@pytest.fixture()
def cat(tmp_path):
    return LocalCatalog(str(tmp_path / "wh"))


def test_budget_spans_epochs_and_resets_per_window(spark, cat):
    # quota 3/hour. epoch 0: 2 rows svcA hour 0 -> both admitted
    r = quota_batch(_batch(spark, [("a1", 0, "A"), ("a2", 1, "A")]),
                    cat, "q", 0, quota=3)
    assert r == {"admitted": 2, "over": 0}
    # epoch 1: 3 more svcA hour-0 rows -> only 1 budget left
    r = quota_batch(
        _batch(spark, [("a3", 2, "A"), ("a4", 3, "A"), ("a5", 4, "A")]),
        cat, "q", 1, quota=3,
    )
    assert r == {"admitted": 1, "over": 2}
    tagged = cat.read(spark, TAGGED_TABLE).toPandas()
    assert set(tagged[~tagged.over_quota].id) == {"a1", "a2", "a3"}
    # epoch 2: new hour -> fresh budget; other key unaffected
    r = quota_batch(
        _batch(spark, [("a6", 61, "A"), ("b1", 62, "B")]),
        cat, "q", 2, quota=3,
    )
    assert r == {"admitted": 2, "over": 0}


def test_in_epoch_order_is_canonical(spark, cat):
    # same timestamps: the (ts, id) tie-break decides, not row order
    rows = [("z9", 0, "A"), ("a1", 0, "A"), ("m5", 0, "A")]
    quota_batch(_batch(spark, rows), cat, "q", 0, quota=2)
    tagged = cat.read(spark, TAGGED_TABLE).toPandas()
    assert set(tagged[~tagged.over_quota].id) == {"a1", "m5"}


def test_replay_is_refused_and_counts_not_doubled(spark, cat):
    b = _batch(spark, [("a1", 0, "A"), ("a2", 1, "A")])
    assert quota_batch(b, cat, "q", 0, quota=3)["admitted"] == 2
    assert quota_batch(b, cat, "q", 0, quota=3) == {"admitted": -1, "over": -1}
    assert cat.read(spark, TAGGED_TABLE).count() == 2
    counts = cat.read(spark, COUNTS_TABLE).toPandas()
    assert counts.n_admitted.sum() == 2


def test_replay_reads_pre_epoch_spend(spark, cat):
    quota_batch(_batch(spark, [("a1", 0, "A")]), cat, "q", 0, quota=3)
    quota_batch(_batch(spark, [("a2", 1, "A")]), cat, "q", 1, quota=3)
    # as-of semantics: for a REPLAY of epoch 1 the spend must be the
    # pre-epoch-1 state (1 admitted), not the head (2)
    spent = _spent_before(cat, spark, "q", 1).toPandas()
    assert spent._spent.sum() == 1
    head = _spent_before(cat, spark, "q", 2).toPandas()
    assert head._spent.sum() == 2


def test_matches_sequential_reference(spark, cat):
    """Three epochs vs a driver-side python rate limiter applying the
    same rule to the same epoch sequence."""
    epochs = [
        [("e1", 5, "A"), ("e2", 0, "B"), ("e3", 1, "A")],
        [("e4", 2, "A"), ("e5", 3, "B"), ("e6", 59, "A")],
        [("e7", 61, "A"), ("e8", 4, "A")],
    ]
    for i, rows in enumerate(epochs):
        quota_batch(_batch(spark, rows), cat, "q", i, quota=2)

    spent: dict = {}
    want_admitted = set()
    for rows in epochs:
        ordered = sorted(rows, key=lambda r: (T0 + dt.timedelta(minutes=r[1]), r[0]))
        for rid, m, s in ordered:
            kb = (s, (T0 + dt.timedelta(minutes=m)).hour)
            if spent.get(kb, 0) < 2:
                spent[kb] = spent.get(kb, 0) + 1
                want_admitted.add(rid)
    tagged = cat.read(spark, TAGGED_TABLE).toPandas()
    assert set(tagged[~tagged.over_quota].id) == want_admitted


def test_end_to_end_stream(spark, tmp_path):
    # 3 record files -> availableNow stream with 1 file/trigger
    in_dir = os.path.join(tmp_path, "recs")
    os.makedirs(in_dir)
    for e in range(3):
        _batch(
            spark,
            [(f"s{e}{i}", e * 3 + i, "A") for i in range(4)],
        ).coalesce(1).write.parquet(os.path.join(tmp_path, f"tmp{e}"))
        src = [
            f for f in os.listdir(os.path.join(tmp_path, f"tmp{e}"))
            if f.endswith(".parquet")
        ][0]
        os.rename(
            os.path.join(tmp_path, f"tmp{e}", src),
            os.path.join(in_dir, f"b{e}.parquet"),
        )
    from logzilla_spark.streaming.quota import start_quota_stream

    stream = (
        spark.readStream.schema(
            "id string, timestamp timestamp, source string, message string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = start_quota_stream(
        stream, str(tmp_path / "wh"), str(tmp_path / "ck"), quota=5
    )
    q.awaitTermination(300)
    cat = LocalCatalog(str(tmp_path / "wh"))
    tagged = cat.read(spark, TAGGED_TABLE).toPandas()
    assert len(tagged) == 12
    assert (~tagged.over_quota).sum() == 5  # 12 same-key-hour rows, quota 5
    counts = cat.read(spark, COUNTS_TABLE).toPandas()
    assert counts.n_admitted.sum() == 5
