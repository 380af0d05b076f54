"""O6 — UDP datagram line source (Python DataSource API).

The reference lists UDP collection as "coming soon" (reference:
README.md:16) and never ships it. Spark has no built-in UDP source, so
this one is implemented with Spark 4's Python DataSource API as a
``SimpleDataSourceStreamReader`` — the documented shape for low-rate
sources: the reader runs ON THE DRIVER, owns the bound socket across
micro-batches, and hands Spark (rows, next_offset) per trigger.

    spark.dataSource.register(UDPLinesDataSource)
    lines = udp_lines(spark, "0.0.0.0", 5141)
    records = records_from_lines(lines)

Direction note: unlike the TCP slot (where Spark's socket source DIALS
out), UDP LISTENS — the engine binds host:port and log emitters fire
datagrams at it, which is the syslog/UDP-514 collection shape the
reference planned.

Semantics — stated honestly:

- **At-most-once, twice over.** UDP itself drops datagrams under
  pressure (the OS receive buffer — raised to ``so_rcvbuf``, default
  4 MiB — is the loss boundary while the query runs), and there is no
  replayable journal: ``readBetweenOffsets`` returns nothing, so a
  batch replayed after a driver restart yields a gap instead of
  duplicates. That matches what a UDP syslog feed gives ANY collector
  that does not journal it. Use the file or Kafka source when delivery
  matters; front with Kafka for production fan-in.
- **Identity is a global dense sequence.** The driver-side reader
  numbers every line it accepts (``seq``), so ``pos`` is unique for
  the query's lifetime and ``url#pos`` ids never collide — across
  batches, retries, and duplicate payload text.
- **Driver-side by design.** A datagram socket cannot be partitioned;
  SimpleDataSourceStreamReader is the API's explicit slot for exactly
  this (low-throughput, driver-held state). Scale-out ingest is fan-in
  (multiple listeners unioned, or Kafka in front), not parallelizing
  one socket.
- A datagram may carry several newline-separated lines (RFC 5426
  allows one message per datagram; relays batch) — each becomes its
  own row via ``splitlines``. Bytes are decoded UTF-8 with
  replacement, never an exception.
"""

from __future__ import annotations

import socket
from typing import Iterator, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from .lines import lines_shape

DEFAULT_RCVBUF = 4 * 1024 * 1024
MAX_DATAGRAMS_PER_BATCH = 100_000
MAX_DGRAM = 65_535


class _UDPSimpleReader(SimpleDataSourceStreamReader):
    """Driver-side reader: owns the bound socket, drains it per trigger."""

    def __init__(self, options: dict) -> None:
        self.host = options.get("host", "127.0.0.1")
        self.port = int(options.get("port", 5141))
        self.max_per_batch = int(
            options.get("maxdatagramsperbatch", MAX_DATAGRAMS_PER_BATCH)
        )
        self.rcvbuf = int(options.get("so_rcvbuf", DEFAULT_RCVBUF))
        # Lazy socket: Spark PICKLES the reader into its streaming
        # python-runner process (a raw socket is unpicklable), so the
        # bind must happen on first drain inside that process, not at
        # construction on the query thread.
        self._sock: socket.socket | None = None

    @property
    def sock(self) -> socket.socket:
        if self._sock is None:
            # Deliberately NO SO_REUSEADDR: for UDP unicast it would let
            # a second reader bind the same port alongside a lingering
            # one (the API has no stop() hook to close ours — its
            # lifetime is the runner process's), and Linux then delivers
            # each datagram to only ONE of the two sockets — silent
            # partial loss. Without it the second bind fails loudly
            # with EADDRINUSE instead. UDP has no TIME_WAIT, so a
            # closed port rebinds immediately anyway.
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            s.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, self.rcvbuf)
            s.bind((self.host, self.port))
            s.setblocking(False)
            self._sock = s
        return self._sock

    def __getstate__(self) -> dict:
        state = self.__dict__.copy()
        state["_sock"] = None
        return state

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict) -> Tuple[Iterator[Tuple], dict]:
        seq = int(start["seq"])
        rows: list[tuple[str, int]] = []
        for _ in range(self.max_per_batch):
            try:
                data, _addr = self.sock.recvfrom(MAX_DGRAM)
            except BlockingIOError:
                break
            for line in data.decode("utf-8", errors="replace").splitlines():
                rows.append((line, seq))
                seq += 1
        return iter(rows), {"seq": seq}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[Tuple]:
        # No journal: datagrams consumed by a failed epoch are gone.
        # Returning nothing turns a post-restart replay into a gap —
        # the honest at-most-once contract (module docstring).
        return iter(())

    def commit(self, end: dict) -> None:
        pass


class UDPLinesDataSource(DataSource):
    """``format("udp_lines")`` — newline-split datagrams as (value, seq)."""

    @classmethod
    def name(cls) -> str:
        return "udp_lines"

    def schema(self) -> str:
        return "value string, seq long"

    def simpleStreamReader(self, schema: StructType) -> _UDPSimpleReader:
        return _UDPSimpleReader(dict(self.options))


def udp_raw_to_lines(raw: DataFrame, host: str, port: int) -> DataFrame:
    """(value, seq) -> the engine's lines shape.

    ``pos`` is the reader's global sequence (dense, query-lifetime
    unique), so ids stay unique even when two datagrams carry identical
    text; the url's batch-clock component exists for debuggability and
    parity with the TCP source, not for identity.
    """
    src = f"udp://{host}:{port}"
    return lines_shape(
        raw,
        url=F.concat(
            F.lit(src + "/"),
            F.unix_micros(F.current_timestamp()).cast("string"),
            F.lit("/0"),
        ),
        warc_ts=F.current_timestamp(),
        source=src,
        pos=F.col("seq"),
        line=F.col("value"),
    )


def udp_lines(spark: SparkSession, host: str, port: int, **options: str) -> DataFrame:
    """Streaming lines source over a bound UDP socket (at-most-once;
    see module docstring). Registers the data source idempotently."""
    spark.dataSource.register(UDPLinesDataSource)
    raw = (
        spark.readStream.format("udp_lines")
        .option("host", host)
        .option("port", str(port))
        .options(**{k: str(v) for k, v in options.items()})
        .load()
    )
    return udp_raw_to_lines(raw, host, port)
