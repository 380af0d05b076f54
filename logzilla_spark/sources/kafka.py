"""O6 — network stream sources (Kafka slot).

The reference names TCP/UDP/Redis/Kafka sources as "coming soon"
(reference: README.md:16-18) and never ships them; this module wires
the Spark-native Kafka slot for real so the streaming pipeline has a
non-file source story:

    lines = kafka_lines(spark, "broker:9092", "applogs")
    records = records_from_lines(lines, chain=("access", "json"))
    ... records.writeStream / route_batch as with the file source ...

One Kafka message = one log line (the reference's file-tail emits lines
too, source/file.go:101-117). The (topic, partition, offset) triple
becomes the stable record identity — the same role url#pos plays for
pages — so checkpoint-replayed epochs produce identical ids and the
exactly-once sink guard (streaming/stream_pipeline.py) dedupes them.

Requires the ``spark-sql-kafka-0-10`` connector on the cluster
(``spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``).
This container ships no connector jar and no broker, so the integration
test is skip-marked; the line-shape contract itself is unit-tested with
a synthetic frame (tests/test_kafka_source.py).

Scale notes: Spark maps Kafka partitions 1:1 onto tasks — parallelism
is the topic's partition count; ``maxOffsetsPerTrigger`` bounds
micro-batch size exactly like ``maxFilesPerTrigger`` does for the file
source (the raw-buffer knob, reference README.md:162-163).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# LINES_COLUMNS re-exported for existing importers; the contract's
# single definition lives in sources/lines.py
from .lines import LINES_COLUMNS, lines_shape  # noqa: F401


def kafka_raw_to_lines(raw: DataFrame) -> DataFrame:
    """Kafka connector output -> the engine's lines shape.

    Pure column mapping (codegen, no shuffle), separated from the
    ``readStream.format("kafka")`` call so it is testable without a
    broker: any frame with the connector's (value binary, topic string,
    partition int, offset long, timestamp timestamp) columns works.

    - ``url`` = kafka://topic/partition (the "file" identity)
    - ``pos`` = offset (the "line number"; id = url#offset)
    - ``source`` = topic (the reference tags records with their source
      name, source/file.go:104-107)
    - ``warc_ts`` = broker append time (ingest-time fallback for
      unparsed lines, engine/processor.go:99-102)
    """
    return lines_shape(
        raw,
        url=F.concat(
            F.lit("kafka://"), F.col("topic"), F.lit("/"),
            F.col("partition").cast("string"),
        ),
        warc_ts=F.col("timestamp"),
        source=F.col("topic"),
        # offset stays LONG: a cast to int silently truncates past
        # 2^31 messages per partition — reachable on a long-lived
        # topic at the design scale
        pos=F.col("offset"),
        line=F.col("value").cast("string"),
    )


def kafka_lines(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming lines source over a Kafka topic.

    ``starting_offsets="latest"`` is the reference's seek-to-end tail
    semantics (source/file.go:59-64); the stream checkpoint owns the
    offsets afterwards, so a restart resumes exactly where it stopped.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    return kafka_raw_to_lines(reader.load())
