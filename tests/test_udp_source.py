"""O6 UDP source: reader unit tests (no Spark) + live loopback stream.

The driver-side ``_UDPSimpleReader`` is plain Python, so its drain /
sequence / multi-line-datagram behavior is tested directly against a
real loopback socket; the end-to-end test then runs the registered
``format("udp_lines")`` source inside a Structured Streaming query
through the parser chain. The emitter re-sends its payload until rows
land (UDP gives no "listener is up" signal), so assertions are on
distinct line text and id uniqueness, not raw counts.
"""

from __future__ import annotations

import socket
import threading
import time

from logzilla_spark.operators.parsers import records_from_lines
from logzilla_spark.sources.udp import _UDPSimpleReader, udp_lines, udp_raw_to_lines

LINES = [
    '{"timestamp":"2024-01-02T03:04:05Z","level":"warn","message":"m0","k":"v"}',
    '10.1.2.3 - - [05/Jan/2024:12:00:00 +0000] "GET /x HTTP/1.1" 200 99',
    "not a log line",
]


def _free_udp_port() -> int:
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_reader_drains_and_sequences():
    port = _free_udp_port()
    r = _UDPSimpleReader({"host": "127.0.0.1", "port": str(port)})
    try:
        assert r.initialOffset() == {"seq": 0}
        r.sock  # bind now (lazy property) so the datagrams below land
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        tx.sendto(b"one", ("127.0.0.1", port))
        tx.sendto(b"two\nthree\n", ("127.0.0.1", port))  # multi-line datagram
        tx.sendto("caf\xe9 中文".encode(), ("127.0.0.1", port))
        tx.sendto(b"\xff\xfebad utf8", ("127.0.0.1", port))  # must not raise
        tx.close()
        time.sleep(0.2)
        rows, off = r.read({"seq": 0})
        rows = list(rows)
        texts = [t for t, _ in rows]
        assert "one" in texts and "two" in texts and "three" in texts
        assert "caf\xe9 中文" in texts
        assert any("bad utf8" in t for t in texts)  # replacement, not a crash
        assert [s for _, s in rows] == list(range(len(rows)))
        assert off == {"seq": len(rows)}
        # empty drain advances nothing
        rows2, off2 = r.read(off)
        assert list(rows2) == [] and off2 == off
        # no journal: replay yields a gap, not duplicates
        assert list(r.readBetweenOffsets({"seq": 0}, off)) == []
        # Spark pickles the reader into its streaming runner process:
        # the socket must be dropped from state and rebound lazily
        import pickle

        r2 = pickle.loads(pickle.dumps(r))
        assert r2._sock is None and r2.port == r.port
    finally:
        r.sock.close()


def test_udp_mapping_shape(spark):
    raw = spark.createDataFrame(
        [(v, i) for i, v in enumerate(LINES)], "value string, seq long"
    )
    lines = udp_raw_to_lines(raw, "127.0.0.1", 5141)
    assert set(lines.columns) == {"url", "warc_ts", "lang", "source", "pos", "line"}
    rows = sorted(lines.collect(), key=lambda r: r.pos)
    assert [r.line for r in rows] == LINES
    assert all(r.source == "udp://127.0.0.1:5141" for r in rows)
    assert all(r.url.startswith("udp://127.0.0.1:5141/") for r in rows)
    assert [r.pos for r in rows] == [0, 1, 2]
    rec = {r.category: r for r in records_from_lines(lines).collect()}
    assert rec["json"].level == "WARN" and rec["json"].message == "m0"
    assert rec["access"].level == "INFO"
    assert rec["unparsed"].parse_ok is False


def test_udp_stream_end_to_end(spark, tmp_path):
    port = _free_udp_port()
    stop = threading.Event()

    def emit():
        tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        while not stop.is_set():
            for line in LINES:
                tx.sendto(line.encode(), ("127.0.0.1", port))
            stop.wait(0.5)
        tx.close()

    t = threading.Thread(target=emit, daemon=True)
    q = None
    try:
        rec = records_from_lines(udp_lines(spark, "127.0.0.1", port))
        q = (
            rec.writeStream.format("memory")
            .queryName("udp_records")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="1 second")
            .start()
        )
        t.start()
        want = {"json", "access", "unparsed"}
        deadline = time.time() + 120
        while time.time() < deadline:
            got = spark.table("udp_records").collect()
            if {r.category for r in got} >= want:
                break
            time.sleep(1)
        got = spark.table("udp_records").collect()
        assert {r.category for r in got} >= want
        # re-sent duplicates are fine (at-most-once source, sender
        # retries) — but every row's id must still be unique
        ids = [r.id for r in got]
        assert len(ids) == len(set(ids))
        assert all(
            i.startswith(f"udp://127.0.0.1:{port}/") and "#" in i for i in ids
        )
        by_cat = {r.category: r for r in got}
        assert by_cat["json"].message == "m0" and by_cat["json"].level == "WARN"
        assert by_cat["access"].level == "INFO"
        assert by_cat["unparsed"].parse_ok is False
    finally:
        stop.set()
        if q is not None:
            q.stop()
