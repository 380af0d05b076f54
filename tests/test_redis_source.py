"""O6 Redis Streams source: RESP client/reader units against a live
fake server + end-to-end Structured Streaming through the parser chain.

The container has no Redis server or client lib, so the test runs a
minimal in-process RESP2 server (XADD / XRANGE with exclusive `(id`
starts / XREVRANGE) on a loopback socket — the reader speaks the real
wire protocol to it. Unlike the TCP/UDP tests, assertions here can be
EXACT: stream entries have durable ids, so delivery is replayable and
counts are deterministic.
"""

from __future__ import annotations

import socket
import threading
import time

from logzilla_spark.operators.parsers import records_from_lines
from logzilla_spark.sources.redis_stream import (
    RESPClient,
    _RedisStreamSimpleReader,
    redis_lines,
    redis_raw_to_lines,
)

LINES = [
    '{"timestamp":"2024-01-02T03:04:05Z","level":"warn","message":"m0","k":"v"}',
    '10.1.2.3 - - [05/Jan/2024:12:00:00 +0000] "GET /x HTTP/1.1" 200 99',
    "not a log line",
]


class FakeRedis:
    """Loopback RESP2 server: streams as {key: [(ms, seq, fields)]}."""

    def __init__(self) -> None:
        self.streams: dict[str, list[tuple[int, int, dict[str, str]]]] = {}
        self.lock = threading.Lock()
        self.clock = 1_700_000_000_000  # fake ms clock for XADD *
        self.srv = socket.create_server(("127.0.0.1", 0))
        self.port = self.srv.getsockname()[1]
        self.stop = threading.Event()
        threading.Thread(target=self._accept, daemon=True).start()

    def xadd(self, key: str, fields: dict[str, str], entry_id: str = "*") -> str:
        with self.lock:
            s = self.streams.setdefault(key, [])
            if entry_id == "*":
                ms = self.clock
                self.clock += 1
                seq = s[-1][1] + 1 if s and s[-1][0] == ms else 0
            else:
                p = entry_id.split("-")
                ms, seq = int(p[0]), int(p[1]) if len(p) > 1 else 0
            s.append((ms, seq, dict(fields)))
            return f"{ms}-{seq}"

    def _bound(self, spec: str, last: bool) -> tuple[int, int, bool]:
        # returns (ms, seq, exclusive)
        if spec == "-":
            return (0, 0, False)
        if spec == "+":
            return (1 << 62, 1 << 62, False)
        excl = spec.startswith("(")
        p = spec.lstrip("(").split("-")
        ms = int(p[0])
        seq = int(p[1]) if len(p) > 1 else ((1 << 62) if last else 0)
        return (ms, seq, excl)

    def _xrange(self, key: str, lo: str, hi: str, count: int, rev: bool):
        lo_ms, lo_seq, lo_x = self._bound(lo, last=False)
        hi_ms, hi_seq, hi_x = self._bound(hi, last=True)
        with self.lock:
            rows = [
                (ms, seq, f)
                for ms, seq, f in self.streams.get(key, [])
                if (lo_ms, lo_seq) < (ms, seq) or (not lo_x and (lo_ms, lo_seq) == (ms, seq))
                if (ms, seq) < (hi_ms, hi_seq) or (not hi_x and (ms, seq) == (hi_ms, hi_seq))
            ]
        if rev:
            rows = rows[::-1]
        return rows[:count]

    def _accept(self) -> None:
        self.srv.settimeout(0.2)
        while not self.stop.is_set():
            try:
                conn, _ = self.srv.accept()
            except (TimeoutError, OSError):
                continue
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _serve(self, conn: socket.socket) -> None:
        buf = b""

        def line() -> bytes:
            nonlocal buf
            while b"\r\n" not in buf:
                c = conn.recv(65536)
                if not c:
                    raise ConnectionError
                buf += c
            out, buf = buf.split(b"\r\n", 1)
            return out

        def exact(n: int) -> bytes:
            nonlocal buf
            while len(buf) < n + 2:
                c = conn.recv(65536)
                if not c:
                    raise ConnectionError
                buf += c
            out, buf = buf[:n], buf[n + 2 :]
            return out

        def bulk(s: str | bytes) -> bytes:
            b = s if isinstance(s, bytes) else s.encode()
            return b"$%d\r\n%s\r\n" % (len(b), b)

        try:
            while True:
                head = line()
                assert head[:1] == b"*", head
                args = []
                for _ in range(int(head[1:])):
                    h = line()
                    assert h[:1] == b"$"
                    args.append(exact(int(h[1:])).decode())
                cmd = args[0].upper()
                if cmd == "PING":
                    conn.sendall(b"+PONG\r\n")
                elif cmd == "XADD":
                    key, eid = args[1], args[2]
                    fields = dict(zip(args[3::2], args[4::2]))
                    conn.sendall(bulk(self.xadd(key, fields, eid)))
                elif cmd in ("XRANGE", "XREVRANGE"):
                    key, a, b = args[1], args[2], args[3]
                    if cmd == "XREVRANGE":
                        a, b = b, a
                    count = int(args[5]) if len(args) > 5 else 1 << 31
                    rows = self._xrange(key, a, b, count, rev=cmd == "XREVRANGE")
                    out = [b"*%d\r\n" % len(rows)]
                    for ms, seq, f in rows:
                        flat = [x for kv in f.items() for x in kv]
                        out.append(b"*2\r\n" + bulk(f"{ms}-{seq}"))
                        out.append(b"*%d\r\n" % len(flat))
                        out.extend(bulk(x) for x in flat)
                    conn.sendall(b"".join(out))
                else:
                    conn.sendall(b"-ERR unknown command\r\n")
        except (ConnectionError, OSError):
            pass
        finally:
            conn.close()

    def close(self) -> None:
        self.stop.set()
        self.srv.close()


def test_resp_client_and_reader_offsets():
    r = FakeRedis()
    try:
        c = RESPClient("127.0.0.1", r.port)
        assert c.cmd("PING") == "PONG"
        for i, text in enumerate(LINES):
            r.xadd("logs", {"message": text, "host": f"h{i}"})
        # one entry with the text under a different field -> fallback
        r.xadd("logs", {"raw": "fallback line"})

        rd = _RedisStreamSimpleReader(
            {"host": "127.0.0.1", "port": str(r.port), "key": "logs"}
        )
        assert rd.initialOffset() == {"last_id": "0-0"}
        rows, off = rd.read({"last_id": "0-0"})
        rows = list(rows)
        assert [t for t, _, _ in rows] == LINES + ["fallback line"]
        assert off == {"last_id": "1700000000003-0"}
        # drained stream: same offset back, no rows
        rows2, off2 = rd.read(off)
        assert list(rows2) == [] and off2 == off
        # REPLAY: interior interval yields exactly the original rows
        mid = {"last_id": "1700000000000-0"}
        replay = list(rd.readBetweenOffsets(mid, off))
        assert [t for t, _, _ in replay] == LINES[1:] + ["fallback line"]
        assert list(rd.readBetweenOffsets(off, off)) == []
        # max_per_batch paging: two entries per read, offsets chain
        rd2 = _RedisStreamSimpleReader(
            {
                "host": "127.0.0.1",
                "port": str(r.port),
                "key": "logs",
                "maxentriesperbatch": "2",
            }
        )
        a, o1 = rd2.read({"last_id": "0-0"})
        b, o2 = rd2.read(o1)
        assert len(list(a)) == 2 and len(list(b)) == 2 and o2 == off
        # startingoffsets=latest begins at the current tail
        rd3 = _RedisStreamSimpleReader(
            {
                "host": "127.0.0.1",
                "port": str(r.port),
                "key": "logs",
                "startingoffsets": "latest",
            }
        )
        assert rd3.initialOffset() == off
        # pickling drops the socket (Spark runner process)
        import pickle

        rd4 = pickle.loads(pickle.dumps(rd))
        assert rd4._client is None and rd4.key == "logs"
        c.close()
    finally:
        r.close()


def test_redis_mapping_shape(spark):
    raw = spark.createDataFrame(
        [(v, 1700000000000 + i, i) for i, v in enumerate(LINES)],
        "value string, ms long, seq long",
    )
    lines = redis_raw_to_lines(raw, "127.0.0.1", 6379, "logs")
    rows = sorted(lines.collect(), key=lambda r: r.pos)
    assert [r.line for r in rows] == LINES
    assert all(r.source == "redis://127.0.0.1:6379/logs" for r in rows)
    assert [r.url for r in rows] == [
        f"redis://127.0.0.1:6379/logs/{1700000000000 + i}" for i in range(3)
    ]
    # warc_ts is the entry id's ms clock, not arrival time
    assert rows[0].warc_ts.year == 2023
    rec = {r.category: r for r in records_from_lines(lines).collect()}
    assert rec["json"].level == "WARN" and rec["json"].message == "m0"
    assert rec["access"].level == "INFO"
    assert rec["unparsed"].parse_ok is False


def test_redis_stream_end_to_end(spark, tmp_path):
    r = FakeRedis()
    q = None
    try:
        for text in LINES:
            r.xadd("logs", {"message": text})
        rec = records_from_lines(redis_lines(spark, "127.0.0.1", r.port, "logs"))
        q = (
            rec.writeStream.format("memory")
            .queryName("redis_records")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("redis_records").count() >= len(LINES):
                break
            time.sleep(1)
        # late entries arrive in a later micro-batch
        late = '{"timestamp":"2024-01-02T03:04:06Z","level":"error","message":"late"}'
        r.xadd("logs", {"message": late})
        while time.time() < deadline:
            if spark.table("redis_records").count() >= len(LINES) + 1:
                break
            time.sleep(1)
        got = spark.table("redis_records").collect()
        # EXACT delivery — replayable offsets, so no dupes and no gaps:
        # ids ARE the four entry ids (fake clock ms, seq 0)
        src = f"redis://127.0.0.1:{r.port}/logs"
        assert sorted(rw.id for rw in got) == [
            f"{src}/{1700000000000 + i}#0000" for i in range(4)
        ]
        by_msg = {r.message: r for r in got}
        assert by_msg["late"].level == "ERROR"
        assert by_msg["m0"].level == "WARN"
    finally:
        if q is not None:
            q.stop()
        r.close()
