"""Engine schemas.

The reference moves one record type, ``LogRecord``
(reference: entity/logrecord.go:25-33): id / source / timestamp / level /
message / metadata, with a schemaless metadata map. Spark needs static
schemas; the envelope is fixed and metadata is ``map<string,string>``
with nested values JSON-encoded (SURVEY.md §1.4).

The graft input table is ``pages`` (BASELINE.json input_hint):
``url string, warc_ts timestamp, html binary, text string, lang string``.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- level domain (reference: entity/logrecord.go:9-22) --------------------
# enum: UNKNOWN=0 DEBUG=1 INFO=2 WARN=3 ERROR=4 FATAL=5
LEVELS: list[str] = ["UNKNOWN", "DEBUG", "INFO", "WARN", "ERROR", "FATAL"]
LEVEL_CODES: dict[str, int] = {name: i for i, name in enumerate(LEVELS)}

# routing categories emitted by the parse stage (FIXTURES.md §3)
CATEGORIES: list[str] = ["json", "access", "unparsed"]

# --- input: pages (BASELINE.json:15 input_hint) -----------------------------
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# --- output: parsed records envelope (reference: entity/logrecord.go:25-33,
# extended with graft columns per FIXTURES.md §4) ----------------------------
RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),  # url#lineno, deterministic
        T.StructField("source", T.StringType(), True),  # url host
        T.StructField("timestamp", T.TimestampType(), True),  # parsed event time
        T.StructField("level", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("category", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("parse_ok", T.BooleanType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
    ]
)

# struct returned by the Arrow parse UDF (one per exploded line)
PARSED_LINE_STRUCT = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("level", T.StringType(), True),
        T.StructField("message", T.StringType(), True),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("parse_ok", T.BooleanType(), True),
    ]
)

# --- dimension tables (FIXTURES.md §2) --------------------------------------
DIM_LANG_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType(), False),
        T.StructField("lang_name", T.StringType(), False),
        T.StructField("lang_family", T.StringType(), False),
    ]
)

DIM_SEVERITY_SCHEMA = T.StructType(
    [
        T.StructField("level", T.StringType(), False),
        T.StructField("level_code", T.IntegerType(), False),
        T.StructField("severity_weight", T.IntegerType(), False),
    ]
)

# --- metrics / lineage table (SURVEY.md §2.5 G6/G7) --------------------------
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), True),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_out", T.LongType(), True),
        T.StructField("input_snapshot_id", T.LongType(), True),
        T.StructField("committed_at", T.TimestampType(), True),
    ]
)

# windowed aggregate output (FIXTURES.md §4 agg_<category>)
AGG_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.TimestampType(), False),
        T.StructField("window_end", T.TimestampType(), False),
        T.StructField("category", T.StringType(), False),
        T.StructField("level", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("n", T.LongType(), False),
    ]
)
