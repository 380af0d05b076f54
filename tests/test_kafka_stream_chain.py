"""O6 end-to-end (broker-less): a Kafka-SHAPED streaming source through
the registered parser chain.

No connector jar / broker ships in this container, so the live
``format("kafka")`` read stays skip-marked (test_kafka_source.py).
What IS provable here is everything downstream of the connector: the
column mapping (sources/kafka.py), the registry chain — including a
user-registered GrokParser — and (topic, partition, offset) record
identity all run unchanged inside a REAL Structured Streaming query,
micro-batched over multiple triggers, and land exactly the batch
result. ``records_from_lines`` is stateless narrow transforms only, so
a connector-shaped parquet directory read with ``readStream`` stands in
for the broker; swapping in ``kafka_lines()`` changes only the source
node of the same logical plan.
"""

from __future__ import annotations

import os
from datetime import datetime

from logzilla_spark.operators import parsers as P
from logzilla_spark.sources.kafka import kafka_raw_to_lines

RAW_SCHEMA = (
    "value binary, topic string, partition int, offset long, timestamp timestamp"
)
T0 = datetime(2024, 1, 1, 12, 0, 0)
CHAIN = ("access", "json", "legacy")


def _raw_rows():
    """Three micro-batches of connector-shaped messages: JSON, access,
    a legacy format only the user-registered grok knows, and garbage."""
    batches = []
    for b in range(3):
        rows = []
        for i in range(4):
            off = b * 10 + i
            kind = (b + i) % 4
            if kind == 0:
                v = (
                    '{"timestamp":"2024-01-02T03:04:%02dZ","level":"warn",'
                    '"message":"m%d","k":"v%d"}' % (off % 60, off, off)
                ).encode()
            elif kind == 1:
                v = (
                    '10.1.2.%d - - [05/Jan/2024:12:00:%02d +0000] '
                    '"GET /x%d HTTP/1.1" 200 99' % (off % 250, off % 60, off)
                ).encode()
            elif kind == 2:
                v = b"LEGACY evt=%d sev=3" % off
            else:
                v = b"not a log line %d" % off
            rows.append((v, "applogs", b % 2, off, T0))
        batches.append(rows)
    return batches


def _canon(df):
    return sorted(
        (r.id, r.timestamp, r.level, r.message,
         tuple(sorted(r.metadata.items())), r.category, r.parse_ok)
        for r in df.collect()
    )


def test_kafka_shaped_stream_through_registry_chain(spark, tmp_path):
    # another module (e.g. __spark_entry__) may own this name already —
    # restore rather than delete it on exit
    try:
        prev = P.get_parser("legacy")
    except ValueError:
        prev = None
    P.register_parser(
        P.GrokParser(
            name="legacy",
            pattern=r"^LEGACY evt=(?P<evt>\d+) sev=(?P<sev>\d)$",
            level_static="NOTICE",
            message_groups=("evt",),
        ),
        replace=True,
    )
    try:
        in_dir = str(tmp_path / "raw_in")
        os.makedirs(in_dir)
        batches = _raw_rows()
        for b, rows in enumerate(batches):
            # one file per micro-batch, like one connector poll
            spark.createDataFrame(rows, RAW_SCHEMA).coalesce(1).write.parquet(
                str(tmp_path / f"stage{b}")
            )
            src = next(
                f for f in os.listdir(tmp_path / f"stage{b}") if f.endswith(".parquet")
            )
            os.rename(tmp_path / f"stage{b}" / src, f"{in_dir}/batch{b}.parquet")

        raw_stream = (
            spark.readStream.schema(RAW_SCHEMA)
            .option("maxFilesPerTrigger", 1)  # 3 separate micro-batches
            .parquet(in_dir)
        )
        q = (
            P.records_from_lines(kafka_raw_to_lines(raw_stream), chain=CHAIN)
            .writeStream.format("memory")
            .queryName("kafka_chain_records")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=300)
        assert q.lastProgress is not None

        got = _canon(spark.table("kafka_chain_records"))
        batch_raw = spark.createDataFrame(
            [r for rows in batches for r in rows], RAW_SCHEMA
        )
        want = _canon(P.records_from_lines(kafka_raw_to_lines(batch_raw), chain=CHAIN))
        assert got == want

        rec = spark.table("kafka_chain_records")
        cats = {r.category for r in rec.select("category").distinct().collect()}
        assert {"json", "access", "legacy", "unparsed"} <= cats
        # (topic, partition, offset) identity survives the stream
        ids = {r.id for r in rec.select("id").collect()}
        assert "kafka://applogs/0#0000" in ids
        assert len(ids) == 12
    finally:
        if prev is not None:
            P.register_parser(prev, replace=True)
        else:
            P.unregister_parser("legacy")
