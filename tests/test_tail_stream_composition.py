"""Composition: the live-tail endpoint (T61) follows the streaming
search store (T27's committed records sink) — the full reference loop,
tail -f on the OUTPUT side: pages stream in, committed snapshots out,
a tail client drains each epoch exactly once, and maintenance running
between polls never re-delivers.
"""

from __future__ import annotations

import json
import os
import shutil
import urllib.request

import pytest
from pyspark.sql import functions as F

from logzilla_spark.operators.parse import parse_records
from logzilla_spark.schemas import PAGES_SCHEMA
from logzilla_spark.server import serve_background
from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.streaming.fulltext import RECORDS_TABLE, start_search_stream
from logzilla_spark.testdata import ensure_pages

SF001 = "/root/testdata/sf0.001"


def _tail(base, payload: dict):
    req = urllib.request.Request(
        f"{base}/api/logs/tail",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_tail_follows_the_streaming_sink_exactly_once(
    spark, tmp_path
):
    d = ensure_pages(SF001)
    pages = spark.read.parquet(f"{d}/pages.parquet")
    in_dir = str(tmp_path / "pages_in")
    os.makedirs(in_dir)
    staged = []
    for i in range(3):
        part = pages.filter(F.pmod(F.xxhash64("url"), F.lit(3)) == i)
        tmp = str(tmp_path / f"tmp{i}")
        part.coalesce(1).write.parquet(tmp)
        src = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        staged.append((os.path.join(tmp, src), os.path.join(in_dir, f"b{i}.parquet")))

    wh, ckpt = str(tmp_path / "wh"), str(tmp_path / "ckpt")
    cat = LocalCatalog(wh)

    def run_stream():
        q = start_search_stream(spark, in_dir, wh, ckpt)
        q.awaitTermination(timeout=300)

    def expected_ids(parquet_path):
        return sorted(
            r.id
            for r in parse_records(
                spark.read.schema(PAGES_SCHEMA).parquet(parquet_path),
                impl="arrow",
            ).select("id").collect()
        )

    # epoch 0 committed, THEN the tail client connects
    shutil.copy(*staged[0])
    run_stream()
    srv, _t = serve_background(
        cat.read(spark, RECORDS_TABLE), tail=(cat, spark)
    )
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        # a from-genesis drain sees epoch 0; SEEK_END sees nothing
        resp = _tail(base, {"table": RECORDS_TABLE, "cursor": {"from": 0},
                            "limit": 1000})
        assert sorted(r["id"] for r in resp["data"]) == expected_ids(
            staged[0][1]
        )
        cur = resp["metadata"]["cursor"]

        # epoch 1: stream resumes from its checkpoint, tail drains
        # exactly the new epoch
        shutil.copy(*staged[1])
        run_stream()
        resp = _tail(base, {"table": RECORDS_TABLE, "cursor": cur,
                            "limit": 1000})
        assert sorted(r["id"] for r in resp["data"]) == expected_ids(
            staged[1][1]
        )
        cur = resp["metadata"]["cursor"]

        # maintenance between polls: compaction must poll EMPTY
        cat.compact(spark, RECORDS_TABLE)
        resp = _tail(base, {"table": RECORDS_TABLE, "cursor": cur,
                            "limit": 1000})
        assert resp["data"] == []
        cur = resp["metadata"]["cursor"]

        # epoch 2 after the compaction: delivered once, nothing else
        shutil.copy(*staged[2])
        run_stream()
        resp = _tail(base, {"table": RECORDS_TABLE, "cursor": cur,
                            "limit": 1000})
        assert sorted(r["id"] for r in resp["data"]) == expected_ids(
            staged[2][1]
        )
        # fully drained: the three polls covered the whole corpus
        total = cat.read(spark, RECORDS_TABLE).count()
        assert total == sum(
            len(expected_ids(dst)) for _src, dst in staged
        )
        cur = resp["metadata"]["cursor"]
        resp = _tail(base, {"table": RECORDS_TABLE, "cursor": cur})
        assert resp["data"] == []
    finally:
        srv.shutdown()
