"""Vector stage over range matrices + first/last_over_time (T60).

The second evaluation stage of the PromQL/LogQL query model:
``topk``/``bottomk`` per bucket and label-subset regrouping over an
ALREADY EVALUATED matrix (operators/range_query.py), plus the
``first_over_time``/``last_over_time`` range aggs whose ordering key
is the lexicographic (event micros, value) BIGINT pair.
"""

import datetime as dt
import json

import pandas as pd
import pytest

from logzilla_spark.api import query_range_request, range_request
from logzilla_spark.operators.query import Query, QueryValidationError
from logzilla_spark.operators.range_query import (
    range_query,
    range_query_sql,
    vector_agg,
    vector_agg_sql,
    vector_topk,
    vector_topk_sql,
)

T0 = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def toy(spark):
    rows = []
    for i in range(60):
        rows.append(
            {
                "id": f"u#{i:04d}",
                "timestamp": T0 + dt.timedelta(minutes=7 * i),
                "level": ["ERROR", "WARN", "INFO"][i % 3],
                "source": f"svc{i % 2}",
                "message": "x" * (i + 1),
                "metadata": {"size": str(100 * i)} if i % 4 == 0 else {},
            }
        )
    # two rows share one timestamp (the first/last tie case)
    rows.append(
        {
            "id": "u#tie1",
            "timestamp": T0 + dt.timedelta(minutes=7),
            "level": "ERROR",
            "source": "svc0",
            "message": "tie",
            "metadata": {"size": "7"},
        }
    )
    rows.append(
        {
            "id": "u#tie2",
            "timestamp": T0 + dt.timedelta(minutes=7),
            "level": "ERROR",
            "source": "svc0",
            "message": "tie",
            "metadata": {"size": "3"},
        }
    )
    return spark.createDataFrame(
        pd.DataFrame(rows),
        schema="id string, timestamp timestamp, level string, "
        "source string, message string, metadata map<string,string>",
    )


def _q(**kw):
    kw.setdefault("start", T0)
    kw.setdefault("end", dt.datetime(2024, 1, 2))
    return Query(**kw)


# -- first/last_over_time ---------------------------------------------


def test_first_last_match_pandas(toy):
    for agg, pick in [("first_over_time", "min"), ("last_over_time", "max")]:
        got = range_query(
            toy, _q(), agg=agg, step=7200, unwrap="metadata.size",
        ).toPandas()
        pdf = toy.toPandas()
        pdf["uv"] = pd.to_numeric(
            pdf.metadata.map(lambda m: (m or {}).get("size"))
        )
        pdf = pdf[pdf.uv.notna()]
        pdf["bucket"] = pdf.timestamp.map(
            lambda t: int(t.timestamp() // 7200) * 7200
        )
        pdf["us"] = pdf.timestamp.map(
            lambda t: int(t.timestamp() * 1_000_000)
        )
        for b, grp in pdf.groupby("bucket"):
            keys = sorted(zip(grp.us, grp.uv))
            want = keys[0][1] if pick == "min" else keys[-1][1]
            assert got[got.bucket == b].v.iloc[0] == want, (agg, b)


def test_first_tie_breaks_on_value(toy):
    # bucket containing u#tie1/u#tie2 (size 7 vs 3) plus i=4 (size 400)
    # at a later micros: first = 3 (same micros, smaller value wins),
    # NOT partition-order dependent
    got = range_query(
        toy, _q(), agg="first_over_time", step=86400, unwrap="metadata.size",
    ).toPandas()
    b = int(T0.timestamp() // 86400) * 86400
    # earliest sized row in the day: i=0 (size 0) at T0 — but the ties
    # sit at T0+7min; verify against the explicit min over (us, uv)
    assert got[got.bucket == b].v.iloc[0] == 0
    last = range_query(
        toy, _q(), agg="last_over_time", step=86400, unwrap="metadata.size",
    ).toPandas()
    assert last[last.bucket == b].v.iloc[0] == 5600  # i=56, latest sized


def test_first_requires_unwrap(toy):
    with pytest.raises(QueryValidationError, match="requires an unwrap"):
        range_query(toy, _q(), agg="first_over_time", step=3600)


# -- vector_agg --------------------------------------------------------


def test_regroup_equals_direct_coarser(toy):
    """sum by (level) over count_over_time by (level, source) must be
    EXACTLY count_over_time by (level) — the regroup-at-read-time
    contract that lets a fine recording serve a coarse dashboard."""
    fine = range_query(
        toy, _q(), agg="count_over_time", step=3600, by=["level", "source"]
    )
    got = (
        vector_agg(fine, "sum", ["level"])
        .toPandas().sort_values(["level", "bucket"]).reset_index(drop=True)
    )
    want = (
        range_query(toy, _q(), agg="count_over_time", step=3600, by=["level"])
        .toPandas().sort_values(["level", "bucket"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_regroup_min_max_equal_direct(toy):
    for op, agg in [("min", "min_over_time"), ("max", "max_over_time")]:
        fine = range_query(
            toy, _q(), agg=agg, step=3600, by=["level", "source"],
            unwrap="metadata.size",
        )
        got = (
            vector_agg(fine, op, ["level"])
            .toPandas().sort_values(["level", "bucket"])
            .reset_index(drop=True)
        )
        want = (
            range_query(
                toy, _q(), agg=agg, step=3600, by=["level"],
                unwrap="metadata.size",
            )
            .toPandas().sort_values(["level", "bucket"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_vector_agg_to_scalar_series(toy):
    # empty by: one series, the global per-bucket sum
    fine = range_query(
        toy, _q(), agg="count_over_time", step=3600, by=["level"]
    )
    got = vector_agg(fine, "sum").toPandas()
    assert list(got.columns) == ["bucket", "v"]
    assert got.v.sum() == 60 + 2


def test_vector_agg_count_and_avg(toy):
    fine = range_query(
        toy, _q(), agg="count_over_time", step=86400, by=["level", "source"]
    ).toPandas()
    m = range_query(
        toy, _q(), agg="count_over_time", step=86400, by=["level", "source"]
    )
    cnt = vector_agg(m, "count", ["level"]).toPandas()
    avg = vector_agg(m, "avg", ["level"]).toPandas()
    for lvl in ("ERROR", "WARN", "INFO"):
        sub = fine[fine.level == lvl]
        assert cnt[cnt.level == lvl].v.iloc[0] == len(sub)
        assert avg[avg.level == lvl].v.iloc[0] == sub.v.sum() / len(sub)


def test_vector_agg_validation(toy):
    m = range_query(toy, _q(), step=3600, by=["level"])
    with pytest.raises(QueryValidationError, match="unknown vector"):
        vector_agg(m, "median", ["level"])
    with pytest.raises(QueryValidationError, match="not a label"):
        vector_agg(m, "sum", ["source"])
    with pytest.raises(QueryValidationError, match="duplicate"):
        vector_agg(m, "sum", ["level", "level"])
    with pytest.raises(QueryValidationError, match="range matrix"):
        vector_agg(toy, "sum", [])


# -- vector_topk -------------------------------------------------------


def test_topk_keeps_k_extremes(toy):
    m = range_query(
        toy, _q(), agg="count_over_time", step=86400, by=["level", "source"]
    )
    pdf = m.toPandas()
    top = vector_topk(m, 2).toPandas()
    bot = vector_topk(m, 2, bottom=True).toPandas()
    for b, grp in pdf.groupby("bucket"):
        ranked = grp.sort_values(
            ["v", "level", "source"], ascending=[False, True, True]
        )
        tsub = top[top.bucket == b]
        assert len(tsub) == min(2, len(grp))
        assert set(map(tuple, tsub[["level", "source", "v"]].values)) == set(
            map(tuple, ranked.head(2)[["level", "source", "v"]].values)
        )
        ranked_b = grp.sort_values(
            ["v", "level", "source"], ascending=[True, True, True]
        )
        bsub = bot[bot.bucket == b]
        assert set(map(tuple, bsub[["level", "source", "v"]].values)) == set(
            map(tuple, ranked_b.head(2)[["level", "source", "v"]].values)
        )


def test_topk_k_larger_than_series_is_identity(toy):
    m = range_query(toy, _q(), step=86400, by=["level"])
    assert vector_topk(m, 99).count() == m.count()


def test_topk_validation(toy):
    m = range_query(toy, _q(), step=3600)
    with pytest.raises(QueryValidationError, match="k must be"):
        vector_topk(m, 0)
    with pytest.raises(QueryValidationError, match="k must be"):
        vector_topk(m, True)


# -- DuckDB twins ------------------------------------------------------


def test_vector_twins_on_toy(toy, tmp_path):
    import duckdb

    pq = str(tmp_path / "toy.parquet")
    flat = toy.select(
        "id", "timestamp", "level", "source", "message",
        toy.metadata["size"].alias("m_size"),
    )
    flat.coalesce(1).write.parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW r AS SELECT * FROM read_parquet('{pq}/*.parquet')")

    def resolver(name):
        from pyspark.sql import functions as F

        return F.col("m_size" if name == "metadata.size" else name)

    kw = dict(agg="count_over_time", step=7200, by=["level", "source"])
    m = range_query(flat, _q(), field_resolver=resolver, **kw)
    inner = range_query_sql("r", _q(), **kw)

    for got_df, sql in [
        (vector_topk(m, 2), vector_topk_sql(inner, 2, ["level", "source"])),
        (vector_topk(m, 3, bottom=True),
         vector_topk_sql(inner, 3, ["level", "source"], bottom=True)),
        (vector_agg(m, "sum", ["level"]),
         vector_agg_sql(inner, "sum", ["level"])),
        (vector_agg(m, "avg", ["source"]),
         vector_agg_sql(inner, "avg", ["source"])),
        (vector_agg(m, "count", []), vector_agg_sql(inner, "count", [])),
    ]:
        cols = [c for c in got_df.columns]
        srt = [c for c in cols if c != "v"] + ["v"]
        got = got_df.toPandas().sort_values(srt).reset_index(drop=True)
        want = con.execute(sql).df().sort_values(srt).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    # first/last twins (ties included)
    for agg in ("first_over_time", "last_over_time"):
        kw2 = dict(agg=agg, step=7200, by=["source"], unwrap="metadata.size")
        got = (
            range_query(flat, _q(), field_resolver=resolver, **kw2)
            .toPandas().sort_values(["source", "bucket"])
            .reset_index(drop=True)
        )
        want = (
            con.execute(range_query_sql("r", _q(), **kw2)).df()
            .sort_values(["source", "bucket"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


# -- API ---------------------------------------------------------------


def test_api_vector_topk(records_sf0001):
    body = {
        "q": "since:2024-01-01 until:2024-01-08",
        "step": "1d",
        "agg": "count_over_time",
        "by": ["level", "source"],
        "vector": {"op": "topk", "k": 2},
    }
    resp = range_request(records_sf0001, json.dumps(body))
    assert resp["success"], resp["message"]
    # every bucket appears in at most 2 series
    per_bucket: dict[int, int] = {}
    for s in resp["data"]:
        assert set(s["labels"]) == {"level", "source"}
        for b, _v in s["values"]:
            per_bucket[b] = per_bucket.get(b, 0) + 1
    assert per_bucket and max(per_bucket.values()) <= 2


def test_api_vector_regroup(records_sf0001):
    base = {
        "q": "since:2024-01-01 until:2024-01-08",
        "step": "1d",
        "agg": "count_over_time",
    }
    fine = dict(base, by=["level", "source"],
                vector={"op": "sum", "by": ["level"]})
    direct = dict(base, by=["level"])
    got = range_request(records_sf0001, json.dumps(fine))
    want = range_request(records_sf0001, json.dumps(direct))
    assert got["success"] and want["success"]
    assert got["data"] == want["data"]


@pytest.mark.parametrize(
    "vec,msg",
    [
        ({"op": "topk"}, "k must be"),
        ({"op": "topk", "k": "3"}, "k must be"),
        ({"op": "topk", "k": 2, "by": ["level"]}, "unknown field"),
        ({"op": "sum", "by": ["source"]}, "must be one of the"),
        ({"op": "sum", "by": "level"}, "list of names"),
        ({"op": "nope"}, "op must be"),
        ("topk", "expected an object"),
    ],
)
def test_api_vector_validation(records_sf0001, vec, msg):
    body = {
        "q": "since:2024-01-01 until:2024-01-08",
        "step": "1d",
        "by": ["level"],
        "vector": vec,
    }
    resp = range_request(records_sf0001, json.dumps(body))
    assert not resp["success"]
    assert msg in resp["message"], resp["message"]


def test_recorded_vector_regroup(spark, records_sf0001, tmp_path):
    """Record fine (level, source), serve coarse (level) through the
    rule body — the zero-corpus-scan dashboard path."""
    from logzilla_spark.sources.catalog import LocalCatalog
    from logzilla_spark.streaming.recordings import (
        RecordingRule,
        record_rule_window,
    )

    cat = LocalCatalog(str(tmp_path / "wh"))
    rule = RecordingRule(
        name="lvlsrc",
        agg="count_over_time",
        step=86400,
        by=("level", "source"),
    )
    record_rule_window(
        spark, cat, records_sf0001, rule,
        dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 8),
    )
    got = query_range_request(
        records_sf0001, cat,
        json.dumps({"rule": "lvlsrc",
                    "vector": {"op": "sum", "by": ["level"]}}),
    )
    assert got["success"], got["message"]
    want = range_request(
        records_sf0001,
        json.dumps({
            "q": "since:2024-01-01 until:2024-01-08",
            "step": "1d", "agg": "count_over_time", "by": ["level"],
        }),
    )
    # recorded buckets cover the data months; compare the overlapping
    # series values
    got_map = {
        (s["labels"]["level"], b): v
        for s in got["data"] for b, v in s["values"]
    }
    for s in want["data"]:
        for b, v in s["values"]:
            assert got_map.get((s["labels"]["level"], b)) == v
