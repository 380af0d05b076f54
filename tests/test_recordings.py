"""Recording rules (streaming/recordings.py, T59)."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from logzilla_spark.operators.query import Query, QueryValidationError
from logzilla_spark.operators.range_query import range_query
from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.streaming.recordings import (
    RecordingRule,
    read_recording,
    record_rule_window,
    recording_rules_from_config,
)

T0 = dt.datetime(2024, 1, 1)


def _records(spark, hours, base=T0):
    rows = [
        (
            f"u#{h:04d}{i}",
            base + dt.timedelta(hours=h, minutes=13 * i),
            ["ERROR", "INFO"][i % 2],
            f"m{h}-{i}",
        )
        for h in hours
        for i in range(4)
    ]
    return spark.createDataFrame(
        rows, "id string, timestamp timestamp, level string, message string"
    )


RULE = RecordingRule(
    name="err_hourly", q="level:ERROR", step="1h", agg="count_over_time",
    by=("level",),
)


def _canon(pdf):
    return (
        pdf.sort_values(["level", "bucket"]).reset_index(drop=True)
    )


def test_first_evaluation_matches_direct_query(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    rec = _records(spark, range(6))
    end = T0 + dt.timedelta(hours=6)
    n = record_rule_window(spark, cat, rec, RULE, T0, end)
    assert n == 6
    got = _canon(read_recording(spark, cat, "err_hourly").toPandas())
    want = _canon(
        range_query(
            rec, Query(start=T0, end=end, node=RULE.node),
            agg="count_over_time", step=3600, by=["level"],
        ).toPandas()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_incremental_windows_accumulate(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    rec = _records(spark, range(12))
    mid = T0 + dt.timedelta(hours=6)
    end = T0 + dt.timedelta(hours=12)
    record_rule_window(spark, cat, rec, RULE, T0, mid)
    record_rule_window(spark, cat, rec, RULE, mid, end)
    got = _canon(read_recording(spark, cat, "err_hourly").toPandas())
    want = _canon(
        range_query(
            rec, Query(start=T0, end=end, node=RULE.node),
            agg="count_over_time", step=3600, by=["level"],
        ).toPandas()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_reevaluation_converges_after_late_data(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    end = T0 + dt.timedelta(hours=6)
    record_rule_window(spark, cat, _records(spark, range(3)), RULE, T0, end)
    # late data lands inside the already-recorded window; re-evaluate
    full = _records(spark, range(6))
    record_rule_window(spark, cat, full, RULE, T0, end)
    record_rule_window(spark, cat, full, RULE, T0, end)  # idempotent
    got = _canon(read_recording(spark, cat, "err_hourly").toPandas())
    want = _canon(
        range_query(
            full, Query(start=T0, end=end, node=RULE.node),
            agg="count_over_time", step=3600, by=["level"],
        ).toPandas()
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_untouched_months_carry_metadata_only(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    jan = _records(spark, range(4))
    feb = _records(spark, range(4), base=dt.datetime(2024, 2, 1))
    record_rule_window(
        spark, cat, jan, RULE, T0, T0 + dt.timedelta(hours=4)
    )
    table = "rec_err_hourly"
    sid = cat.last_snapshot_id(table)
    jan_files = {
        f
        for g in cat._groups(table, sid)
        for f in g["files"]
        if "rec_month=202401" in f
    }
    assert jan_files
    record_rule_window(
        spark, cat, feb, RULE, dt.datetime(2024, 2, 1),
        dt.datetime(2024, 2, 1, 4),
    )
    sid2 = cat.last_snapshot_id(table)
    jan_after = {
        f
        for g in cat._groups(table, sid2)
        for f in g["files"]
        if "rec_month=202401" in f
    }
    assert jan_after == jan_files  # same physical files — no rewrite


def test_alignment_enforced(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    rec = _records(spark, range(2))
    with pytest.raises(QueryValidationError, match="step-aligned"):
        record_rule_window(
            spark, cat, rec, RULE, T0 + dt.timedelta(minutes=30),
            T0 + dt.timedelta(hours=2),
        )


def test_rule_validation():
    with pytest.raises(QueryValidationError, match="alphanumeric"):
        RecordingRule(name="bad name!")
    with pytest.raises(QueryValidationError, match="not allowed here"):
        RecordingRule(name="r", q="level:ERROR since:2024-01-01")


class _Cfg:
    def __init__(self, recordings):
        self.recordings = recordings


def test_rules_from_config():
    rules = recording_rules_from_config(
        _Cfg([
            {"name": "a", "q": "level:ERROR", "step": "6h", "agg": "rate",
             "by": ["level"]},
            {"name": "b", "agg": "quantile_over_time",
             "unwrap": "metadata.size", "quantile": [19, 20]},
        ])
    )
    assert [r.name for r in rules] == ["a", "b"]
    assert rules[0].step == 21600 and rules[1].quantile == (19, 20)
    with pytest.raises(QueryValidationError, match="unknown key"):
        recording_rules_from_config(_Cfg([{"name": "a", "bogus": 1}]))
    with pytest.raises(QueryValidationError, match="duplicate"):
        recording_rules_from_config(_Cfg([{"name": "a"}, {"name": "a"}]))
    with pytest.raises(QueryValidationError, match="name is required"):
        recording_rules_from_config(_Cfg([{}]))


def test_record_cli_end_to_end(spark, tmp_path):
    """Config-declared rule through `main.py --record`: ingest the
    sf0.001 corpus into a warehouse, record one day, read the
    committed matrix back."""
    import json as _json

    import main as cli
    from logzilla_spark.testdata import ensure_pages

    pages = f"{ensure_pages('/root/testdata/sf0.001')}/pages.parquet"
    cfg = tmp_path / "pipe.toml"
    cfg.write_text(
        f"""
[pipeline]
warehouse = "{tmp_path}/wh"

[source]
pages = "{pages}"

[[recordings]]
name = "err_rate"
q    = "level in (ERROR, FATAL)"
step = "6h"
agg  = "rate"
by   = ["level"]
"""
    )
    assert cli.main([
        "--config", str(cfg),
        "--record", "2024-01-01T00:00:00Z", "2024-01-02T00:00:00Z",
    ]) == 0
    cat = LocalCatalog(f"{tmp_path}/wh")
    got = read_recording(spark, cat, "err_rate").toPandas()
    assert len(got) > 0
    assert set(got.columns) == {"level", "bucket", "v"}
    assert set(got.level) <= {"ERROR", "FATAL"}
    # rate = count/step: v * 21600 are integer counts
    assert all(float(v * 21600).is_integer() for v in got.v)


def test_serve_recorded_matrix(spark, tmp_path):
    """{"rule": ...} query_range body reads the COMMITTED table —
    matrix envelope identical in shape to the live path, no corpus
    scan; live bodies keep working on the same route."""
    import json as _json
    import urllib.request

    from logzilla_spark.server import serve_background

    cat = LocalCatalog(str(tmp_path / "wh"))
    rec = _records(spark, range(6))
    end = T0 + dt.timedelta(hours=6)
    record_rule_window(spark, cat, rec, RULE, T0, end)
    srv, _t = serve_background(rec, port=0, recordings=cat)
    try:
        port = srv.server_address[1]

        def post(body):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/logs/query_range",
                data=_json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
            )
            try:
                with urllib.request.urlopen(req) as r:
                    return _json.loads(r.read())
            except urllib.error.HTTPError as e:
                return _json.loads(e.read())

        out = post({"rule": "err_hourly"})
        assert out["success"] and out["metadata"]["series"] == 1
        assert out["data"][0]["labels"] == {"level": "ERROR"}
        assert len(out["data"][0]["values"]) == 6
        # start/end narrow the buckets
        out2 = post({
            "rule": "err_hourly",
            "start": "2024-01-01T02:00:00Z", "end": "2024-01-01T03:00:00Z",
        })
        assert out2["success"] and out2["metadata"]["points"] == 2
        # unknown rule / unknown field -> client envelope errors
        assert not post({"rule": "nope"})["success"]
        assert not post({"rule": "err_hourly", "bogus": 1})["success"]
        # the live path still dispatches on the same route
        live = post({
            "q": "level:ERROR since:2024-01-01 until:2024-01-01T06:00:00",
            "step": "1h", "agg": "count_over_time", "by": ["level"],
        })
        assert live["success"]
        assert live["data"][0]["values"] == out["data"][0]["values"]
    finally:
        srv.shutdown()


def test_serve_recorded_without_catalog_is_client_error(records_sf0001):
    from logzilla_spark.api import query_range_request

    out = query_range_request(records_sf0001, None, '{"rule": "x"}')
    assert not out["success"] and "not configured" in out["message"]


def test_config_document_roundtrip(tmp_path):
    from logzilla_spark.config import load_config

    p = tmp_path / "cfg.toml"
    p.write_text(
        """
[pipeline]
warehouse = "/tmp/wh"

[[recordings]]
name = "error_rate_6h"
q    = "level in (ERROR, FATAL)"
step = "6h"
agg  = "rate"
by   = ["level"]
"""
    )
    cfg = load_config(str(p))
    rules = recording_rules_from_config(cfg)
    assert rules[0].name == "error_rate_6h" and rules[0].agg == "rate"


# -- T69 extraction stage in rules -------------------------------------


def test_extract_rule_records_extracted_labels(spark, tmp_path):
    cat = LocalCatalog(str(tmp_path / "wh"))
    rows = [
        (f"u{h}{i}", T0 + dt.timedelta(hours=h), "INFO",
         f"GET /seg{i % 2} done" if i < 3 else "cache miss")
        for h in range(3)
        for i in range(4)
    ]
    rec = spark.createDataFrame(
        rows, "id string, timestamp timestamp, level string, message string"
    )
    rule = RecordingRule(
        name="by_path", step="1h", pattern="<method> /<seg> done",
        by=("extracted.seg",),
        extract_where=(("extracted.method", "==", "GET"),),
    )
    end = T0 + dt.timedelta(hours=3)
    record_rule_window(spark, cat, rec, rule, T0, end)
    got = read_recording(spark, cat, "by_path").toPandas()
    assert set(got.columns) == {"x_seg", "bucket", "v"}
    assert set(got.x_seg) == {"seg0", "seg1"}
    # per hour: i in {0,2} -> seg0 twice, i=1 -> seg1 once (i=3 no match)
    assert got.groupby("x_seg").v.sum().to_dict() == {"seg0": 6.0, "seg1": 3.0}
    # re-evaluation of the same window converges (no double count)
    record_rule_window(spark, cat, rec, rule, T0, end)
    assert read_recording(spark, cat, "by_path").count() == len(got)


def test_extract_rule_validation():
    with pytest.raises(QueryValidationError, match="exclusive"):
        RecordingRule(name="r", pattern="<a> x", regexp="(b)", names=("b",))
    with pytest.raises(QueryValidationError, match="names requires regexp"):
        RecordingRule(name="r", names=("a",))
    with pytest.raises(QueryValidationError, match="requires pattern"):
        RecordingRule(name="r", extract_where=(("extracted.a", "==", "x"),))
    with pytest.raises(QueryValidationError, match="consecutive"):
        RecordingRule(name="r", pattern="<a><b>")


def test_extract_rule_from_config(tmp_path):
    import textwrap

    from logzilla_spark.config import load_config
    from logzilla_spark.streaming.recordings import recording_rules_from_config

    p = tmp_path / "c.toml"
    p.write_text(textwrap.dedent("""
        [pipeline]
        warehouse = "/tmp/wh"
        pages_dir = "/tmp/pages"

        [[recordings]]
        name = "lat"
        step = "1h"
        pattern = "<_> took <ms>ms"
        agg = "avg_over_time"
        unwrap = "extracted.ms"
        extract_where = [["extracted.ms", ">", 0]]
    """))
    rules = recording_rules_from_config(load_config(str(p)))
    assert rules[0].extract is not None
    assert rules[0].extract.names == ("ms",)
    assert rules[0].extract_where == (("extracted.ms", ">", 0),)


def test_serve_binary_between_recordings(spark, tmp_path):
    """T70 on the recorded path: errors / total divided entirely from
    the committed tables — cells-scale, zero corpus scan."""
    import json

    from logzilla_spark.api import query_range_request

    cat = LocalCatalog(str(tmp_path / "wh"))
    rec = _records(spark, range(6))
    end = T0 + dt.timedelta(hours=6)
    errs = RecordingRule(name="errs", q="level:ERROR", step="1h",
                         by=("level",))
    # identical label SHAPE (by=level) so the sides join one-to-one
    total = RecordingRule(name="total", step="1h", by=("level",))
    record_rule_window(spark, cat, rec, errs, T0, end)
    record_rule_window(spark, cat, rec, total, T0, end)
    body = json.dumps({
        "rule": "errs",
        "binary": {"op": "div", "right": {"rule": "total"}},
    })
    resp = query_range_request(rec, cat, body)
    assert resp["success"], resp["message"]
    vs = [v for s in resp["data"] for _, v in s["values"]]
    assert vs and all(v == 1.0 for v in vs)  # ERROR series / itself
    # unknown right rule and malformed spec are client errors
    bad = json.dumps({"rule": "errs",
                      "binary": {"op": "div", "right": {"rule": "nope"}}})
    r2 = query_range_request(rec, cat, bad)
    assert not r2["success"] and "unknown recording rule" in r2["message"]
    bad2 = json.dumps({"rule": "errs", "binary": {"op": "div", "right": {}}})
    r3 = query_range_request(rec, cat, bad2)
    assert not r3["success"] and "binary.right" in r3["message"]
