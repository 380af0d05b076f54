"""Binary matrix operations (range_query.vector_binop, T70)."""

import datetime as dt
import json

import pandas as pd
import pytest

from logzilla_spark.api import range_request
from logzilla_spark.operators.query import Query, QueryValidationError
from logzilla_spark.operators.range_query import (
    range_query,
    range_query_sql,
    vector_binop,
    vector_binop_sql,
)

T0 = dt.datetime(2024, 1, 1)


def _q(**kw):
    kw.setdefault("start", T0)
    kw.setdefault("end", dt.datetime(2024, 1, 2))
    return Query(**kw)


@pytest.fixture(scope="module")
def toy(spark):
    rows = []
    for i in range(72):
        rows.append(
            {
                "id": f"u#{i:04d}",
                "timestamp": T0 + dt.timedelta(minutes=20 * i),
                "level": ["ERROR", "WARN", "INFO"][i % 3],
                "source": f"svc{i % 2}",
                "message": f"m{i}",
            }
        )
    return spark.createDataFrame(
        pd.DataFrame(rows),
        schema="id string, timestamp timestamp, level string, "
        "source string, message string",
    )


@pytest.fixture(scope="module")
def matrices(toy):
    kw = dict(agg="count_over_time", step=7200, by=["source"])
    from logzilla_spark.operators.query import ComparisonNode

    errors = range_query(
        toy, _q(node=ComparisonNode("level", "ERROR", "eq")), **kw
    )
    total = range_query(toy, _q(), **kw)
    return errors, total


def test_div_is_ratio_and_drops_zero_denominators(matrices):
    errors, total = matrices
    got = vector_binop(errors, total, "div").toPandas()
    e = errors.toPandas().set_index(["source", "bucket"]).v
    t = total.toPandas().set_index(["source", "bucket"]).v
    for (src, b), v in got.set_index(["source", "bucket"]).v.items():
        assert v == e[(src, b)] / t[(src, b)]
    assert got.v.dtype == "float64"
    assert (got.v > 0).all()


def test_sub_stays_bigint_and_offset_aligns(matrices):
    _, total = matrices
    got = vector_binop(total, total, "sub", offset=7200).toPandas()
    assert got.v.dtype == "int64"
    t = total.toPandas().set_index(["source", "bucket"]).v
    for (src, b), v in got.set_index(["source", "bucket"]).v.items():
        assert v == t[(src, b)] - t[(src, b - 7200)]
    # first bucket of each series has no predecessor -> dropped
    assert len(got) < len(t)


def test_self_div_is_one(matrices):
    _, total = matrices
    got = vector_binop(total, total, "div").toPandas()
    assert (got.v == 1.0).all()


def test_mul_add_double_when_either_side_double(matrices):
    _, total = matrices
    rate = range_query(
        total.sparkSession.createDataFrame(
            [("u#1", T0, "INFO", "svc0", "m")],
            "id string, timestamp timestamp, level string, source string,"
            " message string",
        ),
        _q(), agg="rate", step=7200, by=["source"],
    )
    got = vector_binop(total, rate, "add")
    assert dict(got.dtypes)["v"] == "double"


def test_label_mismatch_and_bad_op_rejected(matrices):
    errors, total = matrices
    other = vector_binop(errors, total, "div")  # same labels, fine
    relabeled = other.withColumnRenamed("source", "lvl")
    with pytest.raises(QueryValidationError, match="label columns differ"):
        vector_binop(errors, relabeled, "div")
    with pytest.raises(QueryValidationError, match="binary op"):
        vector_binop(errors, total, "pow")
    with pytest.raises(QueryValidationError, match="offset"):
        vector_binop(errors, total, "div", offset="1d")


def test_null_labels_match_null_safe(spark):
    rows = [
        {"id": "a", "timestamp": T0, "level": "E", "source": None,
         "message": "m"},
        {"id": "b", "timestamp": T0, "level": "E", "source": None,
         "message": "m"},
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        schema="id string, timestamp timestamp, level string, "
        "source string, message string",
    )
    m = range_query(df, _q(), step=3600, by=["source"])
    got = vector_binop(m, m, "div").toPandas()
    # the NULL-source series joins to itself (IS NOT DISTINCT FROM)
    assert len(got) == 1 and got.v.iloc[0] == 1.0


def test_twin_parity(toy, tmp_path):
    import duckdb

    pq = str(tmp_path / "toy.parquet")
    toy.coalesce(1).write.parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW r AS SELECT * FROM read_parquet('{pq}/*.parquet')")
    from logzilla_spark.operators.query import ComparisonNode

    kw = dict(agg="count_over_time", step=7200, by=["source"])
    qe = _q(node=ComparisonNode("level", "ERROR", "eq"))
    for op, offset in [("div", 0), ("sub", 7200), ("add", 0), ("mul", 0)]:
        got = (
            vector_binop(
                range_query(toy, qe, **kw), range_query(toy, _q(), **kw),
                op, offset=offset,
            )
            .toPandas().sort_values(["source", "bucket"])
            .reset_index(drop=True)
        )
        sql = vector_binop_sql(
            range_query_sql("r", qe, **kw), range_query_sql("r", _q(), **kw),
            op, ["source"], offset=offset,
        )
        want = (
            con.execute(sql).df().sort_values(["source", "bucket"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_api_binary_body(records_sf0001):
    body = {
        "q": "level in (ERROR, FATAL) since:2024-01-01 until:2024-01-08",
        "step": "6h",
        "by": ["source"],
        "binary": {"op": "div", "right": {}},
    }
    resp = range_request(records_sf0001, json.dumps(body))
    assert resp["success"], resp["message"]
    vs = [v for s in resp["data"] for _, v in s["values"]]
    assert vs and all(0 < v <= 1 for v in vs)  # errors are a subset


def test_api_binary_offset_and_defaults(records_sf0001):
    body = {
        "start": "2024-01-01T00:00:00",
        "end": "2024-01-08T00:00:00",
        "step": "1d",
        "by": ["level"],
        "binary": {"op": "sub", "offset": "1d", "right": {}},
    }
    resp = range_request(records_sf0001, json.dumps(body))
    assert resp["success"], resp["message"]
    # 7 daily buckets; a series' first observed bucket has no
    # predecessor, so every series shrinks by at least one point
    assert resp["data"] and all(1 <= len(s["values"]) <= 6 for s in resp["data"])
    assert any(len(s["values"]) == 6 for s in resp["data"])


@pytest.mark.parametrize(
    "binary,msg",
    [
        ("x", "binary: expected an object"),
        ({"op": "div"}, "binary.right"),
        ({"op": "div", "right": {}, "bogus": 1}, "unknown field"),
        ({"op": "pow", "right": {}}, "binary op"),
        ({"op": "div", "right": {"by": ["level"]}}, "must equal the outer"),
        ({"op": "div", "right": {"step": 60}}, "outer step applies"),
        ({"op": "div", "right": {"bogus": 1}}, "unknown"),
    ],
)
def test_api_binary_errors(records_sf0001, binary, msg):
    body = {
        "start": "2024-01-01T00:00:00",
        "end": "2024-01-02T00:00:00",
        "step": 3600,
        "by": ["source"],
        "binary": binary,
    }
    resp = range_request(records_sf0001, json.dumps(body))
    assert not resp["success"] and msg in resp["message"], resp["message"]


def test_api_vector_composes_after_binary(records_sf0001):
    # PromQL's topk(2, a / b): the vector stage cuts the COMPOSED
    # matrix — at most 2 series points per bucket survive
    body = {
        "q": "level in (ERROR, FATAL)"
             " since:2024-01-01 until:2024-01-08",
        "step": "1d",
        "by": ["source"],
        "binary": {"op": "div", "right": {}},
        "vector": {"op": "topk", "k": 2},
    }
    resp = range_request(records_sf0001, json.dumps(body))
    assert resp["success"], resp["message"]
    from collections import Counter

    per_bucket = Counter(
        b for s in resp["data"] for b, _ in s["values"]
    )
    assert per_bucket and max(per_bucket.values()) <= 2
    vs = [v for s in resp["data"] for _, v in s["values"]]
    assert all(0 < v <= 1 for v in vs)


def test_api_defaulted_right_range_extends_by_offset(spark):
    """ADVICE r4: a day-over-day panel with offset >= range returned an
    empty result — the defaulted right start/end did not extend the
    lookback, so the shifted right matrix missed the outer grid
    entirely.  PromQL's offset modifier extends the data lookback; the
    defaulted right range must be (start-offset, end-offset)."""
    rows = []
    for day, n in ((1, 10), (2, 4)):  # day 1: 10 events, day 2: 4
        for i in range(n):
            rows.append(
                {
                    "id": f"d{day}#{i}",
                    "timestamp": dt.datetime(2024, 1, day, 6 + i % 12),
                    "level": "INFO",
                    "source": "svc0",
                    "message": f"m{i}",
                }
            )
    df = spark.createDataFrame(
        pd.DataFrame(rows),
        schema="id string, timestamp timestamp, level string, "
        "source string, message string",
    )
    body = {
        # outer window = day 2 ONLY; offset equals the whole range, so
        # the right side's data lives entirely before the outer window
        "start": "2024-01-02T00:00:00",
        "end": "2024-01-03T00:00:00",
        "step": "1d",
        "by": ["source"],
        "binary": {"op": "sub", "offset": "1d", "right": {}},
    }
    resp = range_request(df, json.dumps(body))
    assert resp["success"], resp["message"]
    pts = [(b, v) for s in resp["data"] for b, v in s["values"]]
    # before the fix: [] (silent no-data); after: day2 - day1 = 4 - 10
    day2 = int(dt.datetime(2024, 1, 2, tzinfo=dt.timezone.utc).timestamp())
    assert pts == [(day2, -6)], pts


def test_api_misaligned_offset_is_client_error(records_sf0001):
    body = {
        "start": "2024-01-01T00:00:00",
        "end": "2024-01-02T00:00:00",
        "step": 3600,
        "by": ["source"],
        "binary": {"op": "sub", "offset": "90m", "right": {}},
    }
    resp = range_request(records_sf0001, json.dumps(body))
    assert not resp["success"] and "multiple of step" in resp["message"]
