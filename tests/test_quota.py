"""Per-key ingest quotas (operators/quota.py, T77)."""

import datetime as dt

import pandas as pd
import pytest

from logzilla_spark.operators.quota import (
    ingest_quota,
    ingest_quota_sql,
    quota_summary,
)

T0 = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def toy(spark):
    rows = []
    # svcA: 10 rows/hour for 2 hours (hot); svcB: 2 rows/hour
    for h in range(2):
        for i in range(10):
            rows.append(
                (f"a{h:02d}{i:02d}", T0 + dt.timedelta(hours=h, minutes=i),
                 "svcA", f"m{i}")
            )
        for i in range(2):
            rows.append(
                (f"b{h:02d}{i:02d}", T0 + dt.timedelta(hours=h, minutes=i),
                 "svcB", f"m{i}")
            )
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "timestamp", "source", "message"]),
        schema="id string, timestamp timestamp, source string, message string",
    )


def test_first_n_admitted_per_key_window(toy):
    got = ingest_quota(toy, 3).toPandas()
    assert len(got) == len(toy.toPandas())  # never-drop: tag only
    a0 = got[(got.source == "svcA")
             & (got.timestamp < T0 + dt.timedelta(hours=1))]
    admitted = set(a0[~a0.over_quota].id)
    assert admitted == {"a0000", "a0001", "a0002"}  # first 3 by (ts, id)
    # quota resets each window
    a1 = got[(got.source == "svcA")
             & (got.timestamp >= T0 + dt.timedelta(hours=1))]
    assert (~a1.over_quota).sum() == 3
    # under-quota key untouched
    b = got[got.source == "svcB"]
    assert not b.over_quota.any()


def test_timestamp_tie_breaks_on_id(spark):
    rows = [(f"x{i}", T0, "s", "m") for i in range(5)]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "timestamp", "source", "message"]),
        schema="id string, timestamp timestamp, source string, message string",
    )
    got = ingest_quota(df, 2).toPandas()
    assert set(got[~got.over_quota].id) == {"x0", "x1"}


def test_prebound_phase_is_transparent(toy):
    """The two-phase plan equals the naive one-phase global rule for
    EVERY partitioning of the input."""
    want = ingest_quota(toy.coalesce(1), 3).toPandas()
    want = want.sort_values("id").reset_index(drop=True)
    for parts in (2, 7):
        got = (
            ingest_quota(toy.repartition(parts), 3)
            .toPandas().sort_values("id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)


def test_twin_parity(toy, tmp_path):
    import duckdb

    pq = str(tmp_path / "toy.parquet")
    toy.coalesce(1).write.parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW r AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    got = (
        ingest_quota(toy.repartition(3), 4)
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    want = (
        con.execute(ingest_quota_sql("r", 4)).df()
        .sort_values("id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_summary_and_validation(toy):
    s = quota_summary(ingest_quota(toy, 3)).toPandas().set_index("source")
    assert s.loc["svcA"].n_admitted == 6 and s.loc["svcA"].n_over == 14
    assert s.loc["svcB"].n_admitted == 4 and s.loc["svcB"].n_over == 0
    with pytest.raises(ValueError, match="quota"):
        ingest_quota(toy, 0)
    with pytest.raises(ValueError, match="window"):
        ingest_quota(toy, 1, window="fortnight")
