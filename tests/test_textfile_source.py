"""Raw text-file source (sources/textfiles.py — the reference's
primary input: plain log files, O1/O5).

Covers: batch read -> lines shape with deterministic (file, pos)
identity; trailing-newline handling; the full parser chain over a
real mixed-format log file; and the streaming variant picking up new
files per micro-batch (rotation semantics) landing exactly the batch
result.
"""

from __future__ import annotations

import os

from logzilla_spark.operators import parsers as P
from logzilla_spark.sources.textfiles import (
    text_file_lines,
    text_file_lines_stream,
)

LOG_A = (
    '{"timestamp":"2024-01-02T03:04:05Z","level":"error","message":"boom","svc":"api"}\n'
    '10.0.0.1 - - [05/Jan/2024:12:00:01 +0000] "GET /x HTTP/1.1" 200 99\n'
    "\n"
    "not a log line\n"
)
LOG_B = (
    '{"timestamp":"2024-01-02T03:04:06Z","level":"info","message":"ok"}\n'
)


def _write(d, name, body):
    p = os.path.join(d, name)
    with open(p, "w") as f:
        f.write(body)
    return p


def test_batch_lines_shape_and_positions(spark, tmp_path):
    d = str(tmp_path / "logs")
    os.makedirs(d)
    _write(d, "a.log", LOG_A)
    _write(d, "b.log", LOG_B)
    rows = text_file_lines(spark, d).collect()
    by_file = {}
    for r in rows:
        by_file.setdefault(os.path.basename(r.url), []).append(r)
    # trailing newline fabricates NO empty final line; mid-file blank kept
    a = sorted(by_file["a.log"], key=lambda r: r.pos)
    assert [r.pos for r in a] == [0, 1, 2, 3]
    assert a[2].line == "" and a[3].line == "not a log line"
    assert len(by_file["b.log"]) == 1
    # default source tag = file base name; warc_ts = file mtime
    assert a[0].source == "a.log" and a[0].warc_ts is not None


def test_batch_through_parser_chain(spark, tmp_path):
    d = str(tmp_path / "logs2")
    os.makedirs(d)
    _write(d, "a.log", LOG_A)
    rec = {
        (os.path.basename(r.url), int(r.id.split("#")[1])): r
        for r in P.records_from_lines(text_file_lines(spark, d)).collect()
    }
    assert rec[("a.log", 0)].category == "json"
    assert rec[("a.log", 0)].level == "ERROR"
    assert rec[("a.log", 0)].metadata["svc"] == "api"
    assert rec[("a.log", 1)].category == "access"
    assert rec[("a.log", 2)].category == "unparsed"  # blank line kept
    assert rec[("a.log", 3)].category == "unparsed"
    # unparsed lines inherit the file's ingest ts (warc_ts fallback)
    assert rec[("a.log", 2)].timestamp is not None


def test_stream_matches_batch_per_file_triggers(spark, tmp_path):
    in_dir = str(tmp_path / "watch")
    os.makedirs(in_dir)
    _write(in_dir, "a.log", LOG_A)
    _write(in_dir, "b.log", LOG_B)

    stream = text_file_lines_stream(spark, in_dir, max_files_per_trigger=1)
    assert stream.isStreaming
    out_dir = str(tmp_path / "out")

    def run_once():
        # parquet sink: supports checkpoint RECOVERY, so the second
        # availableNow run resumes file tracking (memory sink cannot)
        q = (
            P.records_from_lines(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=300)

    def canon(df):
        return sorted(
            (r.id, str(r.timestamp), r.level, r.message, r.category,
             tuple(sorted(r.metadata.items())))
            for r in df.collect()
        )

    run_once()
    got = canon(spark.read.parquet(out_dir))
    want = canon(P.records_from_lines(text_file_lines(spark, in_dir)))
    assert got == want and len(got) == 5
    # rotation story: a NEW file appears -> ONLY it arrives next run
    # (checkpointed file tracking skips the already-ingested ones)
    _write(in_dir, "c.log", "garbage line 9\n")
    run_once()
    after = canon(spark.read.parquet(out_dir))
    new = [r for r in after if r not in got]
    assert len(after) == 6 and len(new) == 1
    assert new[0][0].endswith("c.log#0000")


def test_logfile_routing_stream_end_to_end(spark, tmp_path):
    """The reference's whole operating loop on its native input: raw
    log files -> registry chain (including a LUA parser) -> routed
    warehouse sinks, exactly-once, incremental across invocations."""
    from logzilla_spark.operators.lua import lua_parser
    from logzilla_spark.operators.route import sink_name
    from logzilla_spark.sources.catalog import LocalCatalog
    from logzilla_spark.streaming import start_logfile_routing_stream

    in_dir = str(tmp_path / "logs")
    wh = str(tmp_path / "wh")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)
    _write(in_dir, "a.log", LOG_A)
    _write(in_dir, "b.log", LOG_B + "garbage line 3\n")

    P.register_parser(
        lua_parser(
            "luatail",
            script=(
                'function parse_log(line)\n'
                '  local n = string.match(line, "^garbage line (%d+)$")\n'
                '  if not n then return nil, nil, nil, {} end\n'
                '  return "debug", n, "1970-01-01T00:00:00Z", { n = n }\n'
                'end'
            ),
        ),
        replace=True,
    )
    chain = ("access", "json", "luatail")
    try:
        q = start_logfile_routing_stream(
            spark, in_dir, wh, ckpt, chain=chain, max_files_per_trigger=1
        )
        q.awaitTermination(timeout=300)
        cat = LocalCatalog(wh)
        counts = {
            c: cat.read(spark, sink_name(c)).count()
            for c in chain + ("unparsed",)
        }
        # LOG_A: json, access, blank->unparsed, "not a log line"->unparsed
        # LOG_B file: json + the Lua-claimed garbage line
        assert counts == {"json": 2, "access": 1, "luatail": 1, "unparsed": 2}
        lua_rows = cat.read(spark, sink_name("luatail")).collect()
        assert lua_rows[0].level == "DEBUG" and lua_rows[0].message == "3"

        # rotation/incremental: a new file -> ONLY its rows append
        _write(in_dir, "c.log", "garbage line 7\nnoise\n")
        q2 = start_logfile_routing_stream(
            spark, in_dir, wh, ckpt, chain=chain, max_files_per_trigger=1
        )
        q2.awaitTermination(timeout=300)
        counts2 = {
            c: cat.read(spark, sink_name(c)).count()
            for c in chain + ("unparsed",)
        }
        assert counts2 == {"json": 2, "access": 1, "luatail": 2, "unparsed": 3}
    finally:
        P.unregister_parser("luatail")
