"""O6 TCP source: line-shape mapping + live loopback stream.

The mapping is unit-tested on a batch frame (same pattern as the Kafka
source); the live test runs Spark's real ``format("socket")`` source
against a loopback listener thread and drives the received lines
through the parser chain — at-most-once TCP needs no broker, so unlike
Kafka this one runs for real in the container.
"""

from __future__ import annotations

import socket
import socketserver
import threading
import time

from logzilla_spark.operators.parsers import records_from_lines
from logzilla_spark.sources.net import socket_raw_to_lines, tcp_lines

LINES = [
    '{"timestamp":"2024-01-02T03:04:05Z","level":"warn","message":"m0","k":"v"}',
    '10.1.2.3 - - [05/Jan/2024:12:00:00 +0000] "GET /x HTTP/1.1" 200 99',
    "not a log line",
]


def test_socket_mapping_shape(spark):
    raw = spark.createDataFrame([(v,) for v in LINES], "value string").coalesce(1)
    lines = socket_raw_to_lines(raw, "127.0.0.1", 5140)
    assert set(lines.columns) == {"url", "warc_ts", "lang", "source", "pos", "line"}
    rows = sorted(lines.collect(), key=lambda r: r.pos)
    assert [r.line for r in rows] == LINES
    assert all(r.source == "tcp://127.0.0.1:5140" for r in rows)
    assert all(r.url.startswith("tcp://127.0.0.1:5140/") for r in rows)
    assert [r.pos for r in rows] == [0, 1, 2]
    rec = {r.category: r for r in records_from_lines(lines).collect()}
    assert rec["json"].level == "WARN" and rec["json"].message == "m0"
    assert rec["access"].level == "INFO"
    assert rec["unparsed"].parse_ok is False


class _Emitter(socketserver.ThreadingTCPServer):
    """Loopback log emitter: writes LINES to whoever connects."""

    allow_reuse_address = True
    daemon_threads = True


def _handler_factory(payload: list[str]):
    class H(socketserver.BaseRequestHandler):
        def handle(self):
            self.request.sendall(("\n".join(payload) + "\n").encode())
            # keep the connection open so the source keeps polling
            # until the query is stopped
            time.sleep(60)

    return H


def test_tcp_stream_end_to_end(spark, tmp_path):
    srv = _Emitter(("127.0.0.1", 0), _handler_factory(LINES))
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    q = None
    try:
        rec = records_from_lines(tcp_lines(spark, "127.0.0.1", port))
        q = (
            rec.writeStream.format("memory")
            .queryName("tcp_records")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("tcp_records").count() >= len(LINES):
                break
            time.sleep(1)
        got = spark.table("tcp_records").collect()
        assert len(got) == len(LINES)
        by_cat = {r.category: r for r in got}
        assert by_cat["json"].message == "m0" and by_cat["json"].level == "WARN"
        assert by_cat["access"].level == "INFO"
        assert by_cat["unparsed"].parse_ok is False
        # ids unique, shaped tcp://host:port/<batch>#<pos>
        ids = {r.id for r in got}
        assert len(ids) == len(LINES)
        assert all(i.startswith(f"tcp://127.0.0.1:{port}/") and "#" in i for i in ids)
    finally:
        if q is not None:
            q.stop()
        srv.shutdown()
        srv.server_close()
