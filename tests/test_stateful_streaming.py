"""applyInPandasWithState streaming sessionization vs the batch twin.

Closed streaming sessions must be exactly rows of the batch
``sessionize`` output; every session provably closable by the
watermark the stream reached must be emitted.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pandas as pd
import pytest

from logzilla_spark.operators.sessionize import sessionize
from logzilla_spark.streaming.stateful import streaming_sessionize

T0 = datetime(2024, 1, 1)
GAP_S = 600  # 10 minutes


def _events_pdf():
    rows = []
    for u in range(6):
        uid = f"u{u}"
        t = T0 + timedelta(minutes=3 * u)
        # 3 sessions of 4, 2, 3 events, separated by > gap
        for n_events, sep_min in ((4, 2), (2, 3), (3, 1)):
            for _ in range(n_events):
                rows.append({"user_id": uid, "ts": t, "value": 1.0})
                t += timedelta(minutes=sep_min)
            t += timedelta(seconds=GAP_S, minutes=5)  # close the session
    return pd.DataFrame(rows)


@pytest.fixture()
def stream_dirs(tmp_path):
    src = tmp_path / "src"
    os.makedirs(src)
    pdf = _events_pdf()
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")  # Spark-readable precision
    pdf.to_parquet(src / "batch0.parquet", index=False)
    # sentinel far in the future: advances the watermark past every
    # real session so their event-time timers can fire
    sentinel = pd.DataFrame(
        {"user_id": ["zzz"], "ts": [T0 + timedelta(hours=12)], "value": [0.0]}
    )
    sentinel["ts"] = sentinel["ts"].astype("datetime64[us]")
    sentinel.to_parquet(src / "batch1.parquet", index=False)
    return str(src), str(tmp_path / "ckpt"), pdf


def test_streaming_sessions_match_batch(spark, stream_dirs):
    src, ckpt, pdf = stream_dirs
    events = (
        spark.readStream.schema("user_id string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sessions = streaming_sessionize(events, gap_seconds=GAP_S)
    q = (
        sessions.writeStream.format("memory")
        .queryName("stream_sessions")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["key"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM stream_sessions").collect()
    }

    batch_df = spark.createDataFrame(pdf)
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(
            batch_df, gap=f"{GAP_S} seconds", value_col=None
        ).collect()
    }

    # 1. no invented sessions: everything emitted is a real batch session
    assert got <= batch, got - batch
    # 2. completeness: the watermark provably passed every real user's
    #    sessions (sentinel is 12h out), so all non-sentinel sessions
    #    whose timer could fire in a processed batch must be present.
    #    The stream saw the sentinel watermark in its final batch, which
    #    fires all timers <= that watermark.
    wm = T0 + timedelta(hours=12) - timedelta(seconds=0)
    must_close = {
        s for s in batch
        if not s[0].startswith("zzz") and s[2] <= wm
    }
    missing = must_close - got
    assert not missing, f"sessions not closed by final watermark: {missing}"
    # sanity: the fixture really exercises multiple sessions per key
    assert len(must_close) == 18  # 6 users x 3 sessions


def test_late_cross_batch_event_moves_session_start(spark, tmp_path):
    """A late-but-within-watermark event EARLIER than the stored session
    start must pull session_start back to the min event time, matching
    the batch twin (ADVICE round 2)."""
    src = tmp_path / "src2"
    os.makedirs(src)
    t = lambda m: datetime(2024, 1, 1, 10, 0) + timedelta(minutes=m)
    b0 = pd.DataFrame({"user_id": ["u1", "u1"], "ts": [t(0), t(5)], "value": [1.0, 1.0]})
    b1 = pd.DataFrame({"user_id": ["u1"], "ts": [t(-2)], "value": [1.0]})  # late
    b2 = pd.DataFrame({"user_id": ["zzz"], "ts": [t(12 * 60)], "value": [0.0]})
    for i, b in enumerate((b0, b1, b2)):
        b["ts"] = b["ts"].astype("datetime64[us]")
        b.to_parquet(src / f"batch{i}.parquet", index=False)
    events = (
        spark.readStream.schema("user_id string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sessions = streaming_sessionize(events, gap_seconds=GAP_S, watermark="1 hour")
    q = (
        sessions.writeStream.format("memory")
        .queryName("late_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["key"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM late_sessions").collect()
        if r["key"] == "u1"
    }
    batch_df = spark.createDataFrame(pd.concat([b0, b1]))
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(batch_df, gap=f"{GAP_S} seconds", value_col=None).collect()
    }
    assert got == want
    assert next(iter(got))[1] == t(-2)  # start pulled back to the late event
