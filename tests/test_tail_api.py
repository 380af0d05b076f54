"""Live tail over the committed catalog (POST /api/logs/tail).

The reference's tail -f loop (tailer/tail.go: open, SEEK_END, deliver
only what arrives after) re-expressed over snapshots: the cursor is a
snapshot position, the delta is the CDC insert feed. Semantics bar:
every committed row is delivered EXACTLY ONCE across any interleaving
of appends, compactions and upsert rewrites, and a pure-append poll
must be a plain scan of the new files (no exceptAll shuffle).
"""

from __future__ import annotations

import json
import urllib.request

import pytest

from logzilla_spark.server import serve_background
from logzilla_spark.sources.catalog import LocalCatalog
from tests.conftest import canon_rows


@pytest.fixture(scope="module")
def batches(spark, records_sf0001):
    """Three disjoint deterministic 10-row record batches."""
    rows = records_sf0001.orderBy("timestamp", "id").limit(30).collect()
    schema = records_sf0001.schema
    return [
        spark.createDataFrame(rows[i : i + 10], schema) for i in (0, 10, 20)
    ]


@pytest.fixture()
def cat(tmp_path, batches):
    c = LocalCatalog(str(tmp_path / "wh"))
    c.append(batches[0].coalesce(1), "records")
    return c


@pytest.fixture()
def live(spark, records_sf0001, cat):
    srv, _t = serve_background(records_sf0001, tail=(cat, spark))
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        yield base
    finally:
        srv.shutdown()


def _tail(base, payload: dict):
    req = urllib.request.Request(
        f"{base}/api/logs/tail",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        return r.status, json.loads(r.read())


def _ids(resp) -> list[str]:
    return [r["id"] for r in resp["data"]]


def test_seek_to_end_then_drain_exactly_the_new_batch(
    live, cat, batches
):
    # SEEK_END: nothing delivered, only the position
    status, resp = _tail(live, {"table": "records"})
    assert status == 200 and resp["success"]
    assert resp["data"] == [] and resp["metadata"]["count"] == 0
    cur = resp["metadata"]["cursor"]
    assert cur == {"from": cat.last_snapshot_id("records")}

    cat.append(batches[1].coalesce(1), "records")
    _, resp = _tail(live, {"table": "records", "cursor": cur})
    assert sorted(_ids(resp)) == sorted(
        r.id for r in batches[1].collect()
    )
    # drained: the next poll from the advanced cursor is empty
    cur = resp["metadata"]["cursor"]
    assert cur == {"from": cat.last_snapshot_id("records")}
    _, resp = _tail(live, {"table": "records", "cursor": cur})
    assert resp["data"] == [] and resp["metadata"]["cursor"] == cur


def test_compaction_is_never_a_redelivery(spark, live, cat, batches):
    cat.append(batches[1].coalesce(1), "records")
    _, resp = _tail(live, {"table": "records", "cursor": {"from": 0}})
    assert resp["metadata"]["count"] == 20
    cur = resp["metadata"]["cursor"]
    cat.compact(spark, "records")
    _, resp = _tail(live, {"table": "records", "cursor": cur})
    assert resp["data"] == []
    # and the cursor still advanced over the compaction snapshot
    assert resp["metadata"]["cursor"] == {
        "from": cat.last_snapshot_id("records")
    }


def test_upsert_delivers_only_the_new_version(spark, live, cat, batches):
    _, resp = _tail(live, {"table": "records"})
    cur = resp["metadata"]["cursor"]
    one = batches[0].orderBy("id").limit(1)
    from pyspark.sql import functions as F

    recrawl = one.withColumn("message", F.lit("edited"))
    cat.merge_upsert(spark, recrawl, "records", keys=["id"])
    _, resp = _tail(live, {"table": "records", "cursor": cur})
    assert resp["metadata"]["count"] == 1
    assert resp["data"][0]["message"] == "edited"


def test_paged_drain_is_exactly_once_and_pins_the_head(
    live, cat, batches
):
    _, resp = _tail(live, {"table": "records"})
    cur = resp["metadata"]["cursor"]
    cat.append(batches[1].coalesce(1), "records")

    _, p1 = _tail(live, {"table": "records", "cursor": cur, "limit": 4})
    assert p1["metadata"]["count"] == 4
    cur1 = p1["metadata"]["cursor"]
    assert set(cur1) == {"from", "to", "after"}  # pinned page walk

    # rows arriving DURING the walk must not leak into it
    cat.append(batches[2].coalesce(1), "records")

    _, p2 = _tail(live, {"table": "records", "cursor": cur1, "limit": 4})
    _, p3 = _tail(
        live, {"table": "records", "cursor": p2["metadata"]["cursor"],
               "limit": 4},
    )
    got = _ids(p1) + _ids(p2) + _ids(p3)
    assert len(got) == len(set(got)) == 10
    assert sorted(got) == sorted(r.id for r in batches[1].collect())
    # the short page unpinned; the next drain delivers batch 3 exactly
    cur3 = p3["metadata"]["cursor"]
    assert set(cur3) == {"from"}
    _, p4 = _tail(live, {"table": "records", "cursor": cur3})
    assert sorted(_ids(p4)) == sorted(r.id for r in batches[2].collect())


def test_node_filter_applies_to_the_delta(live, cat, batches):
    _, resp = _tail(live, {"table": "records"})
    cur = resp["metadata"]["cursor"]
    cat.append(batches[1].coalesce(1), "records")
    levels = {r.level for r in batches[1].collect()}
    pick = sorted(levels)[0]
    _, resp = _tail(live, {
        "table": "records", "cursor": cur,
        "node": {"field": "level", "op": "eq", "value": pick},
    })
    assert _ids(resp) and all(r["level"] == pick for r in resp["data"])
    assert sorted(_ids(resp)) == sorted(
        r.id for r in batches[1].collect() if r.level == pick
    )


def test_client_errors(live):
    import urllib.error

    for payload, frag in [
        ({"table": "no/such"}, "table"),
        ({"table": "missing"}, "no such table"),
        ({"table": "records", "limit": 0}, "limit"),
        ({"table": "records", "bogus": 1}, "unknown field"),
        ({"table": "records", "cursor": {"from": 999}}, "cursor.from"),
        ({"table": "records",
          "node": {"field": "nope", "op": "eq", "value": 1},
          "cursor": {"from": 0}}, "field not allowed"),
    ]:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _tail(live, payload)
        assert exc.value.code == 400
        body = json.loads(exc.value.read())
        assert not body["success"] and frag in body["message"], payload


def test_unbound_route_is_a_client_envelope_error(spark, records_sf0001):
    import urllib.error

    srv, _t = serve_background(records_sf0001)  # no tail binding
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _tail(base, {"table": "records"})
        assert exc.value.code == 400
    finally:
        srv.shutdown()


# -- catalog-level: the fast path is structural, not incidental -----------


def _canon_maps(pdf):
    """Maps are unordered: the diff path key-sorts entries, so compare
    metadata as sorted item tuples, not insertion-ordered dicts."""
    pdf = pdf.copy()
    pdf["metadata"] = pdf["metadata"].map(
        lambda m: tuple(sorted(m.items())) if isinstance(m, dict) else m
    )
    return pdf


def test_pure_append_delta_has_no_exceptall(spark, cat, batches):
    frm = cat.last_snapshot_id("records")
    cat.append(batches[1].coalesce(1), "records")
    delta = cat.inserts_between(spark, "records", frm)
    plan = delta._jdf.queryExecution().analyzed().toString()
    assert "Except" not in plan
    assert canon_rows(_canon_maps(delta.toPandas())) == canon_rows(
        _canon_maps(batches[1].toPandas())
    )


def test_churned_delta_falls_back_to_the_multiset_diff(
    spark, cat, batches
):
    frm = cat.last_snapshot_id("records")
    cat.append(batches[1].coalesce(1), "records")
    cat.compact(spark, "records")
    delta = cat.inserts_between(spark, "records", frm)
    plan = delta._jdf.queryExecution().analyzed().toString()
    assert "Except" in plan  # churn: correctness needs the diff
    assert canon_rows(_canon_maps(delta.toPandas())) == canon_rows(
        _canon_maps(batches[1].toPandas())
    )


def test_dsl_filter_matches_the_node_form(live, cat, batches):
    _, resp = _tail(live, {"table": "records"})
    cur = resp["metadata"]["cursor"]
    cat.append(batches[1].coalesce(1), "records")
    pick = sorted({r.level for r in batches[1].collect()})[0]
    _, via_q = _tail(live, {
        "table": "records", "cursor": cur, "q": f"level:{pick}",
    })
    _, via_node = _tail(live, {
        "table": "records", "cursor": cur,
        "node": {"field": "level", "op": "eq", "value": pick},
    })
    assert _ids(via_q) == _ids(via_node) != []


def test_dsl_directives_and_node_conflict_are_client_errors(live):
    import urllib.error

    for payload, frag in [
        ({"table": "records", "cursor": {"from": 0},
          "q": "level:ERROR since:2024-01-01T00:00:00Z"}, "directive"),
        ({"table": "records", "cursor": {"from": 0}, "q": "level:ERROR",
          "node": {"field": "level", "op": "eq", "value": "ERROR"}},
         "mutually exclusive"),
        ({"table": "records", "cursor": {"from": 0}, "q": 7}, "q:"),
    ]:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _tail(live, payload)
        assert exc.value.code == 400
        body = json.loads(exc.value.read())
        assert not body["success"] and frag in body["message"], payload


# -- GET /api/tables: warehouse observability ------------------------------


def _get_tables(base):
    with urllib.request.urlopen(f"{base}/api/tables") as r:
        return json.loads(r.read())


def test_tables_status_reflects_commits_and_compaction(
    spark, live, cat, batches
):
    cat.append(batches[1].coalesce(1), "records")
    resp = _get_tables(live)
    assert resp["success"] and resp["metadata"]["count"] == 1
    st = resp["data"][0]
    assert st["table"] == "records"
    assert st["head_snapshot_id"] == cat.last_snapshot_id("records")
    assert st["snapshots"] == 2 and st["files"] == 2
    assert st["operation"] == "append" and st["bytes"] > 0

    cat.compact(spark, "records")  # commits via overwrite
    st = _get_tables(live)["data"][0]
    assert st["operation"] == "overwrite" and st["files"] == 1
    assert st["snapshots"] == 3


def test_tables_unbound_is_a_client_envelope_error(spark, records_sf0001):
    import urllib.error

    from logzilla_spark.server import serve_background as _sb

    srv, _t = _sb(records_sf0001)  # no catalog binding
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with pytest.raises(urllib.error.HTTPError) as exc:
            _get_tables(base)
        assert exc.value.code == 400
    finally:
        srv.shutdown()
