"""O6 Kafka source scaffold: line-shape contract + chain integration.

No broker/connector in this container, so the live readStream test is
skip-marked; the column mapping and its flow into records_from_lines
are fully tested with a synthetic connector-shaped frame.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from logzilla_spark.operators.parsers import records_from_lines
from logzilla_spark.sources.kafka import kafka_lines, kafka_raw_to_lines

T0 = datetime(2024, 1, 1, 12, 0, 0)

RAW_SCHEMA = (
    "value binary, topic string, partition int, offset long, timestamp timestamp"
)


def _raw(spark):
    rows = [
        (b'{"timestamp":"2024-01-02T03:04:05Z","level":"warn","message":"m","k":"v"}',
         "applogs", 0, 7, T0),
        (b'10.1.2.3 - - [05/Jan/2024:12:00:00 +0000] "GET /x HTTP/1.1" 200 99',
         "applogs", 1, 42, T0),
        (b"not a log line", "applogs", 1, 43, T0),
    ]
    return spark.createDataFrame(rows, RAW_SCHEMA)


def test_kafka_line_shape_and_identity(spark):
    lines = kafka_raw_to_lines(_raw(spark))
    got = {r.pos: r for r in lines.collect()}
    assert set(lines.columns) == {"url", "warc_ts", "lang", "source", "pos", "line"}
    assert got[7].url == "kafka://applogs/0"
    assert got[42].url == "kafka://applogs/1"
    assert got[7].source == "applogs" and got[7].warc_ts == T0
    assert got[7].line.startswith('{"timestamp"')


def test_kafka_lines_through_parser_chain(spark):
    rec = records_from_lines(kafka_raw_to_lines(_raw(spark)))
    rows = {r.id: r for r in rec.collect()}
    j = rows["kafka://applogs/0#0007"]
    assert j.category == "json" and j.level == "WARN" and j.message == "m"
    assert j.metadata == {"k": "v"}
    a = rows["kafka://applogs/1#0042"]
    assert a.category == "access" and a.level == "INFO"
    u = rows["kafka://applogs/1#0043"]
    # never-drop: unparsable message flows through with ingest time
    assert u.category == "unparsed" and not u.parse_ok
    assert u.timestamp == T0 and u.message == ""


@pytest.mark.skipif(True, reason="no Kafka broker/connector jar in this container")
def test_kafka_readstream_integration(spark):
    q = (
        records_from_lines(kafka_lines(spark, "localhost:9092", "applogs"))
        .writeStream.format("memory").queryName("kafka_records").start()
    )
    q.awaitTermination(30)
