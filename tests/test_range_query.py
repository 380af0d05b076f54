"""Metric range queries (operators/range_query.py, T56)."""

import datetime as dt
import json
import math
import urllib.request

import pandas as pd
import pytest

from logzilla_spark.api import range_request
from logzilla_spark.operators.dsl import parse_dsl_query
from logzilla_spark.operators.query import (
    ComparisonNode,
    Query,
    QueryValidationError,
)
from logzilla_spark.operators.range_query import (
    MAX_BUCKETS,
    parse_step,
    range_query,
    range_query_sql,
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
    return spark.createDataFrame(
        pd.DataFrame(rows),
        schema="id string, timestamp timestamp, level string, "
        "source string, message string, metadata map<string,string>",
    )


def _q(**kw):
    kw.setdefault("start", T0)
    kw.setdefault("end", dt.datetime(2024, 1, 2))
    return Query(**kw)


def test_count_matches_pandas(toy):
    got = range_query(
        toy, _q(), agg="count_over_time", step=3600, by=["level"]
    ).toPandas()
    pdf = toy.toPandas()
    pdf["bucket"] = pdf.timestamp.map(
        lambda t: int(t.timestamp() // 3600) * 3600
    )
    want = pdf.groupby(["level", "bucket"]).size()
    assert len(got) == len(want)
    for (lvl, b), n in want.items():
        assert got[(got.level == lvl) & (got.bucket == b)].v.iloc[0] == n


def test_rate_is_count_over_step(toy):
    cnt = range_query(toy, _q(), agg="count_over_time", step=1800).toPandas()
    rate = range_query(toy, _q(), agg="rate", step=1800).toPandas()
    m = cnt.merge(rate, on="bucket", suffixes=("_c", "_r"))
    assert len(m) == len(cnt)
    assert all(m.v_r == m.v_c / 1800.0)


def test_fill_densifies_requested_grid(toy):
    # request a window wider than the data: every step present, zeros
    # where the corpus is silent, bounds from the QUERY not the data
    q = _q(end=dt.datetime(2024, 1, 1, 23, 59))
    got = range_query(toy, q, agg="count_over_time", step=3600, fill=True)
    pdf = got.toPandas().sort_values("bucket")
    assert len(pdf) == 24
    assert pdf.bucket.iloc[0] == int(T0.timestamp())
    # 60 events x 7min = 7 live hours; the rest are explicit zeros
    assert (pdf.v > 0).sum() == 7 and pdf.v.sum() == 60


def test_fill_per_label_series(toy):
    got = range_query(
        toy, _q(end=T0 + dt.timedelta(hours=10)),
        agg="count_over_time", step=3600, by=["source"], fill=True,
    ).toPandas()
    # every observed label set gets the full 11-bucket grid
    assert len(got) == 2 * 11
    assert set(got.groupby("source").size()) == {11}


def test_bytes_and_unwrap_aggs(toy):
    pdf = toy.toPandas()
    got = range_query(toy, _q(), agg="bytes_over_time", step=86400).toPandas()
    assert got.v.iloc[0] == pdf.message.str.len().sum()  # ascii: bytes==chars
    got = range_query(
        toy, _q(), agg="sum_over_time", step=86400, unwrap="metadata.size"
    ).toPandas()
    want = sum(100 * i for i in range(0, 60, 4))
    assert got.v.iloc[0] == want
    got = range_query(
        toy, _q(), agg="avg_over_time", step=86400, unwrap="metadata.size"
    ).toPandas()
    assert got.v.iloc[0] == want / 15.0
    got = range_query(
        toy, _q(), agg="max_over_time", step=86400, unwrap="metadata.size"
    ).toPandas()
    assert got.v.iloc[0] == 5600


def test_quantile_over_time_rank_rule(toy):
    # 15 size samples 0,400,...,5600: p50 = min(v : 2*cum >= n) ->
    # the 8th of 15 values = 2800; p95 -> the 15th = 5600
    got = range_query(
        toy, _q(), agg="quantile_over_time", step=86400,
        unwrap="metadata.size", quantile=(1, 2),
    ).toPandas()
    assert got.v.iloc[0] == 2800
    got = range_query(
        toy, _q(), agg="quantile_over_time", step=86400,
        unwrap="metadata.size", quantile=(19, 20),
    ).toPandas()
    assert got.v.iloc[0] == 5600


def test_quantile_validation(toy):
    with pytest.raises(QueryValidationError, match="requires quantile"):
        range_query(toy, _q(), agg="quantile_over_time", step=86400,
                    unwrap="metadata.size")
    with pytest.raises(QueryValidationError, match="0 < num <= den"):
        range_query(toy, _q(), agg="quantile_over_time", step=86400,
                    unwrap="metadata.size", quantile=(3, 2))
    with pytest.raises(QueryValidationError, match="does not take a quantile"):
        range_query(toy, _q(), agg="rate", step=86400, quantile=(1, 2))


def test_unwrap_null_rows_excluded_not_zero(toy):
    # only 15 of 60 rows carry metadata.size; avg must divide by 15
    got = range_query(
        toy, _q(), agg="avg_over_time", step=86400, unwrap="metadata.size"
    ).toPandas()
    assert not math.isnan(got.v.iloc[0])
    assert got.v.iloc[0] == pytest.approx(2800.0)


def test_filter_matches_hits_semantics(toy):
    q = _q(node=ComparisonNode("level", "ERROR", "eq"))
    got = range_query(toy, q, agg="count_over_time", step=86400).toPandas()
    assert got.v.sum() == 20


def test_auto_swap_reversed_range(toy):
    fwd = range_query(toy, _q(), agg="count_over_time", step=3600).toPandas()
    rev = range_query(
        toy, Query(start=dt.datetime(2024, 1, 2), end=T0),
        agg="count_over_time", step=3600,
    ).toPandas()
    assert sorted(map(tuple, fwd.values.tolist())) == sorted(
        map(tuple, rev.values.tolist())
    )


def test_parse_step():
    assert parse_step(90) == 90
    assert parse_step("30s") == 30
    assert parse_step("5m") == 300
    assert parse_step("2h") == 7200
    assert parse_step("1d") == 86400
    for bad in ("m", "5x", "-1m", 0, True, 1.5, ""):
        with pytest.raises(QueryValidationError):
            parse_step(bad)


@pytest.mark.parametrize(
    "kw,msg",
    [
        (dict(agg="nope"), "unknown range aggregation"),
        (dict(agg="sum_over_time"), "requires an unwrap"),
        (dict(agg="rate", unwrap="metadata.size"), "does not take"),
        (dict(agg="avg_over_time", unwrap="nope"), "unwrap field not allowed"),
        (dict(by=["nope"]), "by field not allowed"),
        (dict(by=["level", "level"]), "duplicate by"),
        (dict(agg="avg_over_time", unwrap="metadata.size", fill=True),
         "fill is not defined"),
        (dict(step=1), "exceeds"),  # 86400 buckets over a day
    ],
)
def test_validation_errors(toy, kw, msg):
    kw.setdefault("step", 3600)
    with pytest.raises(QueryValidationError, match=msg):
        range_query(toy, _q(), **kw)


def test_requires_end_and_rejects_cursor(toy):
    with pytest.raises(QueryValidationError, match="require end"):
        range_query(toy, Query(start=T0), step=3600)
    with pytest.raises(QueryValidationError, match="cursor"):
        range_query(toy, _q(cursor="abc"), step=3600)


def test_bucket_cap_constant():
    # the Loki resolution limit the module documents
    assert MAX_BUCKETS == 11_000


def test_oracle_twin_on_toy(toy, tmp_path):
    """Twin equivalence on the toy frame (the registered sf0.01 query
    covers the corpus; this pins the twin on controlled edge data —
    empty metadata maps, label NULLs, ties)."""
    import duckdb

    pq = str(tmp_path / "toy.parquet")
    toy.select(
        "id", "timestamp", "level", "source", "message",
        toy.metadata["size"].alias("m_size"),
    ).coalesce(1).write.parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW r AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    flat = toy.select(
        "id", "timestamp", "level", "source", "message",
        toy.metadata["size"].alias("m_size"),
    )

    def resolver(name):
        from pyspark.sql import functions as F

        return F.col("m_size" if name == "metadata.size" else name)

    for kw, srt in [
        (dict(agg="rate", step=1800, by=["level"], fill=True), ["level", "bucket"]),
        (dict(agg="avg_over_time", step=7200, by=["source"],
              unwrap="metadata.size"), ["source", "bucket"]),
        (dict(agg="bytes_over_time", step=3600), ["bucket"]),
        (dict(agg="quantile_over_time", step=7200, by=["level"],
              unwrap="metadata.size", quantile=(1, 2)), ["level", "bucket"]),
    ]:
        got = (
            range_query(flat, _q(), field_resolver=resolver, **kw)
            .toPandas().sort_values(srt).reset_index(drop=True)
        )
        sql = range_query_sql("r", _q(), **kw)
        want = con.execute(sql).df().sort_values(srt).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_api_matrix_envelope(records_sf0001):
    body = {
        "q": "level in (ERROR, FATAL) since:2024-01-01 until:2024-01-08",
        "step": "6h",
        "agg": "rate",
        "by": ["level"],
        "fill": True,
    }
    resp = range_request(records_sf0001, json.dumps(body))
    assert resp["success"], resp["message"]
    assert resp["metadata"]["series"] == 2
    for s in resp["data"]:
        assert set(s["labels"]) == {"level"}
        assert len(s["values"]) == 29  # 7 days / 6h + 1, zero-filled
        bks = [b for b, _ in s["values"]]
        assert bks == sorted(bks)
    # matrix points = series x grid
    assert resp["metadata"]["points"] == 2 * 29


@pytest.mark.parametrize(
    "body,msg",
    [
        ({}, "step: Field is required"),
        ({"step": 3600, "start": "2024-01-01T00:00:00"}, "require end"),
        ({"step": 3600, "agg": "bogus", "start": "2024-01-01T00:00:00",
          "end": "2024-01-02T00:00:00"}, "agg:"),
        ({"step": 3600, "by": "level", "start": "2024-01-01T00:00:00",
          "end": "2024-01-02T00:00:00"}, "by:"),
        ({"step": 3600, "fill": "yes", "start": "2024-01-01T00:00:00",
          "end": "2024-01-02T00:00:00"}, "fill:"),
        ({"step": 3600, "bogus": 1, "start": "2024-01-01T00:00:00",
          "end": "2024-01-02T00:00:00"}, "unknown field"),
    ],
)
def test_api_error_envelopes(records_sf0001, body, msg):
    resp = range_request(records_sf0001, json.dumps(body))
    assert not resp["success"] and msg in resp["message"]


def test_live_endpoint(records_sf0001):
    from logzilla_spark.server import serve_background

    srv, _t = serve_background(records_sf0001, port=0)
    try:
        port = srv.server_address[1]
        body = json.dumps(
            {
                "q": "since:2024-01-01 until:2024-01-03",
                "step": "1d",
                "agg": "count_over_time",
                "fill": True,
            }
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/logs/query_range",
            data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert out["success"] and out["metadata"]["series"] == 1
        assert len(out["data"][0]["values"]) == 3
    finally:
        srv.shutdown()


# -- T81 sliding (PromQL range-selector) windows -----------------------


class TestSliding:
    def test_window_is_sum_of_k_cells_with_lookback(self, toy):
        from logzilla_spark.operators.range_query import (
            range_query,
            range_query_sliding,
        )

        q = _q(start=T0 + dt.timedelta(hours=2), end=T0 + dt.timedelta(hours=5))
        # reference cells over the SAME scan window the sliding query
        # uses: lookback-extended start, same end (the end clips the
        # last bucket's cell — the query range governs, as on the
        # tumbling path)
        cells = (
            range_query(
                toy,
                _q(start=q.start - dt.timedelta(hours=1), end=q.end),
                agg="count_over_time", step=3600, by=["level"],
            )
            .toPandas().set_index(["level", "bucket"]).v
        )
        got = range_query_sliding(
            toy, q, agg="count_over_time", step=3600, range_=7200,
            by=["level"],
        ).toPandas()
        for r in got.itertuples():
            want = cells.get((r.level, r.bucket), 0) + cells.get(
                (r.level, r.bucket - 3600), 0
            )
            assert r.v == want, (r.level, r.bucket)
        # the FIRST requested bucket already looks back before start
        first = int(got.bucket.min())
        from logzilla_spark.operators.range_query import _epoch_seconds

        assert first == _epoch_seconds(q.start)

    def test_rate_divides_by_range_and_fill(self, toy):
        from logzilla_spark.operators.range_query import range_query_sliding

        q = _q()
        dense = range_query_sliding(
            toy, q, agg="rate", step=1800, range_=7200, by=["level"],
            fill=True,
        ).toPandas()
        sparse = range_query_sliding(
            toy, q, agg="rate", step=1800, range_=7200, by=["level"],
        ).toPandas()
        assert len(dense) >= len(sparse)
        # rate = window count / RANGE seconds
        assert all(float(v * 7200).is_integer() for v in dense.v)
        # fill=False drops only windows with zero observed cells
        merged = dense.merge(
            sparse, on=["level", "bucket"], how="left", indicator=True
        )
        dropped = merged[merged._merge == "left_only"]
        assert (dropped.v_x == 0).all()

    def test_validation(self, toy):
        from logzilla_spark.operators.range_query import range_query_sliding

        with pytest.raises(QueryValidationError, match="multiple of step"):
            range_query_sliding(toy, _q(), step=3600, range_=5400)
        with pytest.raises(QueryValidationError, match="additive"):
            range_query_sliding(
                toy, _q(), agg="min_over_time", step=3600, range_=7200,
                unwrap="metadata.size",
            )

    def test_sliding_fill_rejected_for_unwrap_aggs(self, toy):
        """ADVICE r4: sliding sum_over_time with fill=True was accepted
        (fill=False was hardcoded into _validate), emitting zero-valued
        samples indistinguishable from data — the exact case the
        tumbling path rejects. Both paths must enforce the rule."""
        from logzilla_spark.operators.range_query import (
            range_query_sliding,
            range_query_sliding_sql,
        )

        with pytest.raises(QueryValidationError, match="fill is not defined"):
            range_query_sliding(
                toy, _q(), agg="sum_over_time", step=3600, range_=7200,
                unwrap="metadata.size", fill=True,
            )
        with pytest.raises(QueryValidationError, match="fill is not defined"):
            range_query_sliding_sql(
                "r", _q(), agg="sum_over_time", step=3600, range_=7200,
                unwrap="metadata.size", fill=True,
            )
        # fill=True stays legal for count-style sliding aggs
        range_query_sliding(
            toy, _q(), agg="rate", step=3600, range_=7200, fill=True
        )

    def test_twin_parity_and_degenerate_range_equals_tumbling(
        self, toy, tmp_path
    ):
        import duckdb

        from logzilla_spark.operators.range_query import (
            range_query,
            range_query_sliding,
            range_query_sliding_sql,
        )

        pq = str(tmp_path / "toy.parquet")
        toy.coalesce(1).write.parquet(pq)
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW r AS SELECT * FROM read_parquet('{pq}/*.parquet')"
        )
        kw = dict(agg="bytes_over_time", step=3600, range_=10800, by=["source"])
        got = (
            range_query_sliding(toy, _q(), **kw)
            .toPandas().sort_values(["source", "bucket"]).reset_index(drop=True)
        )
        want = (
            con.execute(range_query_sliding_sql("r", _q(), **kw)).df()
            .sort_values(["source", "bucket"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # range == step degenerates to the tumbling matrix exactly
        a = (
            range_query_sliding(
                toy, _q(), agg="count_over_time", step=3600, range_=3600,
                by=["level"],
            )
            .toPandas().sort_values(["level", "bucket"]).reset_index(drop=True)
        )
        b = (
            range_query(toy, _q(), agg="count_over_time", step=3600, by=["level"])
            .toPandas().sort_values(["level", "bucket"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_api_range_field(self, records_sf0001):
        body = {
            "q": "level in (ERROR, FATAL)"
                 " since:2024-01-02 until:2024-01-07",
            "step": "1h",
            "range": "6h",
            "agg": "rate",
            "by": ["level"],
        }
        resp = range_request(records_sf0001, json.dumps(body))
        assert resp["success"], resp["message"]
        assert resp["data"]
        bad = dict(body, range="90m")
        resp2 = range_request(records_sf0001, json.dumps(bad))
        assert not resp2["success"] and "multiple of step" in resp2["message"]
