"""G5 hot-key skew handling + session_window operator tests."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from logzilla_spark.operators.aggregate import windowed_counts, windowed_counts_salted
from logzilla_spark.operators.sessionize import sessionize, sessionize_sql
from tests.conftest import canon_rows

T0 = datetime(2024, 1, 1)


def _hot_key_records(spark, n=20_000, hot_frac=0.95):
    """Synthetic records where one url dominates (SURVEY.md §7.5)."""
    n_hot = int(n * hot_frac)
    return spark.range(n).select(
        F.when(F.col("id") < n_hot, "https://hot.example/x")
        .otherwise(F.concat(F.lit("https://cold"), F.col("id"), F.lit(".example/y")))
        .alias("url"),
        (F.lit(T0) + F.make_interval(secs=(F.col("id") % 7200).cast("double")))
        .alias("warc_ts"),
        F.when(F.col("id") % 3 == 0, "json").otherwise("access").alias("category"),
        F.lit("INFO").alias("level"),
        F.when(F.col("id") < n_hot, "en").otherwise("de").alias("lang"),
    )


def test_salted_equals_plain_on_hot_keys(spark):
    rec = _hot_key_records(spark)
    plain = windowed_counts(rec).toPandas()
    salted = windowed_counts_salted(rec, n_salts=16).toPandas()
    assert canon_rows(plain) == canon_rows(salted)
    # the dominant group really is hot (one (window,cat,level,lang) row
    # holds ~1/3 of all input rows) — the scenario salting targets
    assert plain["n"].max() > 0.3 * plain["n"].sum() / plain.shape[0] * len(plain)


def test_salted_plan_is_two_phase(spark):
    rec = _hot_key_records(spark, n=100)
    plan = windowed_counts_salted(rec)._jdf.queryExecution().optimizedPlan().toString()
    # two Aggregate nodes: partial over (keys, salt), final over keys
    assert plan.count("Aggregate") >= 2
    assert "_salt" in plan


def test_session_window_matches_gaps_and_islands_oracle(spark, duck01):
    sp = sessionize(
        spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    ).toPandas()
    od = duck01.sql(sessionize_sql("events")).df()
    assert len(sp) == len(od)
    assert sorted(sp.columns) == sorted(od.columns)
    assert canon_rows(sp) == canon_rows(od)


def test_session_window_boundary_semantics(spark):
    # events exactly gap apart start NEW sessions (strict boundary)
    rows = [
        ("u1", T0, 1.0),
        ("u1", T0 + timedelta(minutes=29, seconds=59), 1.0),  # same session
        ("u1", T0 + timedelta(minutes=59, seconds=59), 1.0),  # still same
        ("u1", T0 + timedelta(minutes=89, seconds=59 + 60), 1.0),  # >= gap -> new
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
    out = sessionize(df).orderBy("session_start").collect()
    assert [r["n_events"] for r in out] == [3, 1]
    assert out[0]["session_end"] == T0 + timedelta(minutes=89, seconds=59)
