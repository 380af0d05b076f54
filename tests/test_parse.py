"""Parse-stage semantics (reference contracts, SURVEY.md §5.1/§5.3)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from logzilla_spark.functions.levels import parse_level_col, parse_level_pd
from logzilla_spark.operators.parse import parse_records, text_from_html
from logzilla_spark.testdata import ensure_pages

from .conftest import SF001

# exact table incl. quirks (processor/util.go:9-24)
LEVEL_CASES = [
    ("debug", "DEBUG"), ("DEBUG", "DEBUG"), ("Info", "INFO"), ("warn", "WARN"),
    ("ERROR", "ERROR"), ("fatal", "FATAL"),
    ("warning", "UNKNOWN"), ("WARNING", "UNKNOWN"), ("trace", "UNKNOWN"),
    ("", "UNKNOWN"), ("err", "UNKNOWN"),
]


def test_level_table_column(spark):
    df = spark.createDataFrame([(raw,) for raw, _ in LEVEL_CASES], "raw string")
    got = [r.lvl for r in df.select(parse_level_col("raw").alias("lvl")).collect()]
    assert got == [want for _, want in LEVEL_CASES]


def test_level_table_pandas():
    import pandas as pd

    got = parse_level_pd(pd.Series([raw for raw, _ in LEVEL_CASES])).tolist()
    assert got == [want for _, want in LEVEL_CASES]


def _mk_pages(spark, lines: list[str]):
    text = "\n".join(lines)
    html = ("<html><body><pre>" + text + "</pre></body></html>").encode()
    return spark.createDataFrame(
        [("https://h.example/en/p0", datetime(2024, 1, 5, 12, 0, 0), html, text, "en")],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


JSON_CONTRACT_CASES = [
    # (line, expected category, check)
    # missing timestamp -> drop (json.go:50-51)
    ('{"level":"info","message":"x"}', "unparsed", {}),
    # non-string timestamp -> drop
    ('{"timestamp":123,"level":"info"}', "unparsed", {}),
    # empty timestamp -> drop
    ('{"timestamp":"","level":"info"}', "unparsed", {}),
    # unparseable timestamp -> drop (json.go:55-57)
    ('{"timestamp":"not-a-date","level":"info"}', "unparsed", {}),
    # missing level -> drop (json.go:63-64)
    ('{"timestamp":"2024-01-05T12:00:01Z","message":"x"}', "unparsed", {}),
    # non-string level -> drop
    ('{"timestamp":"2024-01-05T12:00:01Z","level":5}', "unparsed", {}),
    # message optional -> "" (Go zero value)
    ('{"timestamp":"2024-01-05T12:00:01Z","level":"warn"}', "json", {"message": ""}),
    # non-string message -> "" but key still removed (json.go:70-72)
    (
        '{"timestamp":"2024-01-05T12:00:01Z","level":"warn","message":7,"a":"b"}',
        "json",
        {"message": "", "metadata": {"a": "b"}},
    ),
    # leftovers -> metadata (json.go:74-79)
    (
        '{"timestamp":"2024-01-05T12:00:01Z","level":"error","message":"m","x":"1","y":"2"}',
        "json",
        {"message": "m", "metadata": {"x": "1", "y": "2"}, "level": "ERROR"},
    ),
    # "warning" level is valid JSON but normalizes to UNKNOWN (util.go:15)
    (
        '{"timestamp":"2024-01-05T12:00:01Z","level":"warning"}',
        "json",
        {"level": "UNKNOWN"},
    ),
    # nested metadata values minified JSON, document key order (SURVEY §1.4)
    (
        '{"timestamp":"2024-01-05T12:00:01Z","level":"info","obj":{"b":1,"a":[2,"x"]}}',
        "json",
        {"metadata": {"obj": '{"b":1,"a":[2,"x"]}'}},
    ),
    # not JSON at all, not access -> unparsed, never crash
    ("garbage", "unparsed", {}),
    # access line: level from status class
    (
        '1.2.3.4 - - [05/Jan/2024:12:00:02 +0000] "GET /a HTTP/1.1" 503 10',
        "access",
        {"level": "ERROR", "message": "GET /a"},
    ),
    (
        '1.2.3.4 - - [05/Jan/2024:12:00:02 +0000] "POST /b HTTP/1.1" 404 10',
        "access",
        {"level": "WARN"},
    ),
    (
        '1.2.3.4 - - [05/Jan/2024:12:00:02 +0000] "GET /c HTTP/1.1" 301 10',
        "access",
        {"level": "INFO"},
    ),
]


@pytest.mark.parametrize("impl", ["arrow", "native", "hybrid"])
def test_json_contract(spark, impl):
    lines = [c[0] for c in JSON_CONTRACT_CASES]
    pages = _mk_pages(spark, lines)
    rows = {
        int(r.id.split("#")[1]): r
        for r in parse_records(pages, impl=impl).collect()
    }
    assert len(rows) == len(lines)
    for i, (line, want_cat, checks) in enumerate(JSON_CONTRACT_CASES):
        r = rows[i]
        assert r.category == want_cat, f"line {i}: {line!r} -> {r.category}"
        assert r.parse_ok == (want_cat != "unparsed")
        if want_cat == "unparsed":
            # tolerance contract: unchanged envelope, ingest timestamp
            assert r.level == "UNKNOWN"
            assert r.message == ""
            assert r.metadata == {}
            assert r.timestamp == datetime(2024, 1, 5, 12, 0, 0)
        for key, want in checks.items():
            if key == "metadata":
                for mk, mv in want.items():
                    assert r.metadata.get(mk) == mv, f"line {i} metadata[{mk}]"
            else:
                assert getattr(r, key) == want, f"line {i} {key}"


def test_arrow_native_full_equality(spark):
    """Full-map differential: all three parse impls agree on everything."""
    d = ensure_pages(SF001)
    pages = spark.read.parquet(f"{d}/pages.parquet")

    # compare metadata via sorted entries
    def canon2(df):
        rows = df.collect()
        return {
            (r.id, r.source, r.timestamp, r.level, r.message,
             tuple(sorted(r.metadata.items())), r.category, r.lang, r.parse_ok)
            for r in rows
        }

    a = canon2(parse_records(pages, impl="arrow"))
    b = canon2(parse_records(pages, impl="native"))
    c = canon2(parse_records(pages, impl="hybrid"))
    assert a == b
    assert a == c


def test_html_text_byte_identity(spark):
    """north_rule invariant: text extracted from html == text column."""
    d = ensure_pages(SF001)
    pages = spark.read.parquet(f"{d}/pages.parquet")
    bad = pages.filter(text_from_html("html") != F.col("text")).count()
    assert bad == 0
    # and parsing from html gives identical records to parsing from text
    # (map columns don't support set ops -> sort entries into an array)
    def sortable(df):
        return df.withColumn("metadata", F.array_sort(F.map_entries("metadata")))

    a = sortable(parse_records(pages, impl="native", use_html=True))
    b = sortable(parse_records(pages, impl="native", use_html=False))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_json_map_fields_null_map_defense(spark):
    """ADVICE r2: if the regex-only routing verdict ever claims a line
    whose from_json comes back NULL (future regex edits, Jackson
    limits), the claimed branch must emit UNKNOWN/''/{} — never NULL
    metadata."""
    from pyspark.sql import functions as F

    from logzilla_spark.operators.parse import _json_map_fields

    df = spark.createDataFrame([('{"level":"info"}',)], "line string").withColumn(
        "m", F.from_json(F.lit(None).cast("string"), "map<string,string>")
    )
    ex = _json_map_fields(F.col("m"))
    r = df.select(
        ex["level"].alias("lv"), ex["message"].alias("msg"),
        ex["metadata"].alias("md"),
    ).first()
    assert r.lv == "UNKNOWN" and r.msg == "" and r.md == {}
