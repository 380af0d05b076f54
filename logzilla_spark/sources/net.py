"""O6 — TCP network line source.

The reference lists TCP/UDP socket collection as "coming soon"
(reference: README.md:16) and never ships it. Spark has a built-in TCP
text source (``format("socket")``, TextSocketSourceProvider), so the
TCP slot costs one mapping to the engine's lines shape:

    lines = tcp_lines(spark, "log-relay", 5140)
    records = records_from_lines(lines)

Direction note: Spark's socket source DIALS host:port and reads
newline-delimited text — the engine is the client, the log emitter (or
a relay in front of it) is the listener. The reference planned the
opposite (a listening collector); put a tiny relay in front when the
emitter expects to connect.

Semantics — stated honestly, because they differ from file/Kafka:

- **At-most-once.** A TCP byte stream has no offsets; Spark's socket
  source keeps no replayable log, so lines received while a query is
  down are lost and a restarted query cannot re-read old lines. This
  matches what a syslog-style TCP feed gives any collector that does
  not journal it — the reference's planned TCP listener included. Use
  the file or Kafka source when exactly-once matters; Spark itself
  flags the socket source as not fault-tolerant.
- **Identity is (listener, micro-batch, partition, line).** With no
  broker offset to borrow, each micro-batch plays the role one file
  plays for the file source: ``url`` =
  tcp://host:port/<batch-micros>/<partition> (Structured Streaming
  pins ``current_timestamp()`` to the batch clock — constant within a
  batch, distinct across batches) and ``pos`` is the dense line number
  within the batch partition, so ``url#pos`` is unique for the query's
  lifetime. A retried epoch re-reads the same buffered micro-batch at
  the same batch clock, so the sink's epoch guard still dedupes it;
  across query RESTARTS there is nothing to be stable against, because
  unreplayed lines are gone (at-most-once, above).
- ``warc_ts`` is the arrival (batch) time — the ingest-time fallback
  for unparsed lines, same role as the file source's mtime.

``pos`` cannot come from ``monotonically_increasing_id`` (unsupported
on streaming frames) or a window (ditto), so it is an Arrow-batched
``mapInPandas`` enumerator — the repo's sanctioned shape when the JVM
genuinely can't express it. A socket is ONE connection: ingest
parallelism comes from fanning multiple listeners into a union or
fronting with Kafka (the production shape), so a per-partition Python
counter on this path costs nothing that matters.

UDP and Redis have no Spark built-in source; they are implemented with
the Python DataSource API instead (sources/udp.py,
sources/redis_stream.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lines import lines_shape


def _with_pos(raw: DataFrame) -> DataFrame:
    """Add (``_pid``, ``pos``): partition id + dense in-partition line
    number. Stateless per micro-batch, so it runs identically on batch
    and streaming frames."""
    tagged = raw.select("value", F.spark_partition_id().alias("_pid"))

    def gen(batches):
        i = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["pos"] = range(i, i + len(pdf))
            i += len(pdf)
            yield pdf

    return tagged.mapInPandas(gen, "value string, _pid int, pos long")


def socket_raw_to_lines(raw: DataFrame, host: str, port: int) -> DataFrame:
    """Socket-source output (value string) -> the engine's lines shape.

    Separated from the ``readStream`` call so it is testable on any
    single-column frame.
    """
    src = f"tcp://{host}:{port}"
    return lines_shape(
        _with_pos(raw),
        url=F.concat(
            F.lit(src + "/"),
            F.unix_micros(F.current_timestamp()).cast("string"),
            F.lit("/"),
            F.col("_pid").cast("string"),
        ),
        warc_ts=F.current_timestamp(),
        source=src,
        pos=F.col("pos"),
        line=F.col("value"),
    )


def tcp_lines(spark: SparkSession, host: str, port: int) -> DataFrame:
    """Streaming lines source over a TCP socket (at-most-once; see
    module docstring)."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    return socket_raw_to_lines(raw, host, port)
