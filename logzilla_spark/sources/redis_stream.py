"""O6 — Redis Streams line source (Python DataSource API).

The reference lists Redis collection as "coming soon" (reference:
README.md:16-18) and never ships it. Spark has no built-in Redis
source, so this one is implemented — like the UDP slot — with Spark
4's Python DataSource API as a ``SimpleDataSourceStreamReader``: the
reader runs on the driver, holds one connection, and hands Spark
(rows, next_offset) per trigger.

    spark.dataSource.register(RedisStreamDataSource)
    lines = redis_lines(spark, "redis-host", 6379, key="logs")
    records = records_from_lines(lines)

Redis STREAMS (XADD/XRANGE), not lists: a list (LPUSH/RPOP) is a
destructive read — at-most-once, like TCP/UDP — while a stream entry
has a durable ``ms-seq`` id and ``XRANGE`` replays any id interval.
That makes this the one network source here with REAL offsets:

- **Replayable, at-least-once → effectively exactly-once.** The
  stream offset is the last entry id read; ``readBetweenOffsets``
  re-issues ``XRANGE (start end`` so a restarted or retried epoch
  re-reads exactly its interval, and the engine's idempotent sinks
  (epoch guard) turn that into exactly-once, same as the file and
  Kafka paths. Entries must still live in the stream (mind ``XTRIM``
  / ``MAXLEN`` retention — trimmed history is gone, as with any
  broker).
- **Identity is the entry id.** ``url`` =
  redis://host:port/<key>/<ms> and ``pos`` = the id's sequence
  number, so ``url#pos`` is stable across batches, retries, and
  restarts — no batch-clock or counter involved.
- ``warc_ts`` is the entry id's millisecond clock (Redis assigns it
  at XADD time): true broker-arrival time, like Kafka's timestamp.
- One stream entry = one line (the ``field`` option names which field
  carries the text, default ``message``; entries without it fall back
  to their first field). Entries are structured records, so embedded
  newlines stay inside the line rather than splitting identity.

The client speaks RESP2 over a plain socket (the container has no
redis-py; the protocol is ~5 reply types). Exclusive range starts use
the ``(id`` form (Redis >= 6.2). A connection failure raises — fail
the query, don't silently gap — and the lazy-connect/``__getstate__``
dance mirrors sources/udp.py: Spark pickles the reader into its
streaming runner process, so the socket must not be part of state.
"""

from __future__ import annotations

import socket
from typing import Iterator, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from .lines import lines_shape

MAX_ENTRIES_PER_BATCH = 100_000


class RESPClient:
    """Minimal RESP2 client: send command arrays, parse typed replies."""

    def __init__(self, host: str, port: int, timeout: float = 10.0) -> None:
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.buf = b""

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass

    def _read_line(self) -> bytes:
        while b"\r\n" not in self.buf:
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("redis connection closed mid-reply")
            self.buf += chunk
        line, self.buf = self.buf.split(b"\r\n", 1)
        return line

    def _read_exact(self, n: int) -> bytes:
        while len(self.buf) < n + 2:  # payload + trailing \r\n
            chunk = self.sock.recv(65536)
            if not chunk:
                raise ConnectionError("redis connection closed mid-bulk")
            self.buf += chunk
        data, self.buf = self.buf[:n], self.buf[n + 2 :]
        return data

    def _read_reply(self):
        line = self._read_line()
        t, rest = line[:1], line[1:]
        if t == b"+":
            return rest.decode()
        if t == b"-":
            raise RuntimeError(f"redis error: {rest.decode()}")
        if t == b":":
            return int(rest)
        if t == b"$":
            n = int(rest)
            return None if n == -1 else self._read_exact(n)
        if t == b"*":
            n = int(rest)
            return None if n == -1 else [self._read_reply() for _ in range(n)]
        raise RuntimeError(f"unexpected RESP type byte: {line!r}")

    def cmd(self, *args: str | bytes | int):
        parts = [b"*%d\r\n" % len(args)]
        for a in args:
            b = a if isinstance(a, bytes) else str(a).encode()
            parts.append(b"$%d\r\n%s\r\n" % (len(b), b))
        self.sock.sendall(b"".join(parts))
        return self._read_reply()


def _id_parts(entry_id: str | bytes) -> tuple[int, int]:
    s = entry_id.decode() if isinstance(entry_id, bytes) else entry_id
    ms, _, seq = s.partition("-")
    return int(ms), int(seq or 0)


class _RedisStreamSimpleReader(SimpleDataSourceStreamReader):
    """Driver-side reader over one stream key; offset = last entry id."""

    def __init__(self, options: dict) -> None:
        self.host = options.get("host", "127.0.0.1")
        self.port = int(options.get("port", 6379))
        self.key = options.get("key", "logs")
        self.field = options.get("field", "message")
        self.starting = options.get("startingoffsets", "earliest")
        self.max_per_batch = int(
            options.get("maxentriesperbatch", MAX_ENTRIES_PER_BATCH)
        )
        self._client: RESPClient | None = None

    @property
    def client(self) -> RESPClient:
        if self._client is None:
            self._client = RESPClient(self.host, self.port)
        return self._client

    def __getstate__(self) -> dict:
        state = self.__dict__.copy()
        state["_client"] = None
        return state

    def initialOffset(self) -> dict:
        if self.starting == "latest":
            tail = self.client.cmd("XREVRANGE", self.key, "+", "-", "COUNT", 1)
            if tail:
                entry_id = tail[0][0]
                s = entry_id.decode() if isinstance(entry_id, bytes) else entry_id
                return {"last_id": s}
        return {"last_id": "0-0"}

    def _entries_to_rows(self, entries) -> list[tuple[str, int, int]]:
        rows: list[tuple[str, int, int]] = []
        for entry_id, flat in entries or []:
            ms, seq = _id_parts(entry_id)
            fields = {
                (flat[i].decode() if isinstance(flat[i], bytes) else flat[i]): flat[
                    i + 1
                ]
                for i in range(0, len(flat or []), 2)
            }
            val = fields.get(self.field)
            if val is None and fields:
                val = next(iter(fields.values()))
            text = (
                val.decode("utf-8", errors="replace")
                if isinstance(val, bytes)
                else ("" if val is None else str(val))
            )
            rows.append((text, ms, seq))
        return rows

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        entries = self.client.cmd(
            "XRANGE", self.key, f"({start['last_id']}", "+",
            "COUNT", self.max_per_batch,
        )
        rows = self._entries_to_rows(entries)
        end = dict(start)
        if entries:
            last = entries[-1][0]
            end = {
                "last_id": last.decode() if isinstance(last, bytes) else last
            }
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # True replay: XRANGE over the (exclusive-start, inclusive-end]
        # id interval re-yields exactly the rows the original epoch saw
        # (unless the stream was trimmed past them — broker retention).
        if start["last_id"] == end["last_id"]:
            return iter(())
        entries = self.client.cmd(
            "XRANGE", self.key, f"({start['last_id']}", end["last_id"]
        )
        return iter(self._entries_to_rows(entries))

    def commit(self, end: dict) -> None:
        # Non-destructive consumer: retention is the stream owner's
        # XTRIM policy, not ours (other consumer groups may lag).
        pass


class RedisStreamDataSource(DataSource):
    """``format("redis_stream")`` — stream entries as (value, ms, seq)."""

    @classmethod
    def name(cls) -> str:
        return "redis_stream"

    def schema(self) -> str:
        return "value string, ms long, seq long"

    def simpleStreamReader(self, schema: StructType) -> _RedisStreamSimpleReader:
        return _RedisStreamSimpleReader(dict(self.options))


def redis_raw_to_lines(
    raw: DataFrame, host: str, port: int, key: str
) -> DataFrame:
    """(value, ms, seq) -> the engine's lines shape.

    ``url`` carries the entry id's millisecond half, ``pos`` its
    sequence half, so ``url#pos`` IS the entry id — stable identity
    across retries and restarts (module docstring).
    """
    src = f"redis://{host}:{port}/{key}"
    return lines_shape(
        raw,
        url=F.concat(F.lit(src + "/"), F.col("ms").cast("string")),
        warc_ts=F.timestamp_millis(F.col("ms")),
        source=src,
        pos=F.col("seq"),
        line=F.col("value"),
    )


def redis_lines(
    spark: SparkSession, host: str, port: int, key: str = "logs", **options: str
) -> DataFrame:
    """Streaming lines source over a Redis stream key (replayable
    offsets; see module docstring). Registers the source idempotently."""
    spark.dataSource.register(RedisStreamDataSource)
    raw = (
        spark.readStream.format("redis_stream")
        .option("host", host)
        .option("port", str(port))
        .option("key", key)
        .options(**{k: str(v) for k, v in options.items()})
        .load()
    )
    return redis_raw_to_lines(raw, host, port, key)
