"""Lua parse_log script compatibility (operators/lua.py + functions/luapat.py).

Covers: Lua-pattern translation (manual §6.4.1 cases), interpreter
semantics (values/operators/stdlib/control flow/sandbox), the codegen
fast-path compiler and its fallback conditions, a fast-vs-interpreter
differential on Spark, RFC3339 acceptance parity between the two tiers,
never-drop error tolerance (script errors, step budget), and config
registration via kind="lua" script-path (the reference's YAML field).
"""

from __future__ import annotations

import re
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from logzilla_spark.functions.luapat import (
    LuaPatternError,
    lua_pattern_to_regex,
)
from logzilla_spark.operators import parsers as P
from logzilla_spark.operators.lua import (
    LUA_TS_FORMAT_SPARK,
    LuaScript,
    LuaScriptError,
    lua_parser,
    parse_rfc3339_utc,
)

T0 = datetime(2024, 1, 1)
_LINES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, "
    "lang string, source string, pos int, line string"
)


def _line_rows(spark, *lines):
    rows = [(f"u{i}", T0, None, ln, "en", "s", i, ln) for i, ln in enumerate(lines)]
    return spark.createDataFrame(rows, _LINES_SCHEMA)


def _run(src: str, line: str):
    return LuaScript(src).run_parse_log(line)


def _raw_first(src: str) -> str:
    """parse_log's first return value, pre-normalization."""
    from logzilla_spark.operators.lua import _Interp

    s = LuaScript(src)
    vals = _Interp(s.g, s.max_steps).call(s.fn, ("x",))
    return vals[0]


# ---------------------------------------------------------------------------
# pattern translation
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "pat,text,want",
    [
        ("%d+", "abc123def", "123"),
        ("%a+", "12abc34", "abc"),
        ("%s", "a b", " "),
        ("%w+", "!!x9_!!", "x9"),
        ("%x+", "zzAF09zz", "AF09"),
        ("%u%l+", "xxHello", "Hello"),
        ("%p+", "ab!?.cd", "!?."),
        ("a.-b", "aXXbYYb", "aXXb"),  # '-' is LAZY
        ("a.*b", "aXXbYYb", "aXXbYYb"),  # '*' greedy
        ("^ab", "abc", "ab"),
        ("c$", "abc", "c"),
        ("%%d", "100%d", "%d"),  # %<punct> escapes
        ("[%d,]+", "a1,2,3b", "1,2,3"),
        ("[^%s]+", "  word  ", "word"),
        ("[a-c]+", "zabcz", "abc"),
        ("%(%d+%)", "x(42)y", "(42)"),
        ("a.b", "a\nb", "a\nb"),  # Lua '.' spans newline
        ("(%a+)=(%a+);%1", "k=v;k", "k=v;k"),  # back-reference
        ("(%d+)-(%d+)", "2024-01", "2024-01"),  # '-' after ')' is literal
        ("*x", "a*xb", "*x"),  # quantifier char with no class is literal
    ],
)
def test_pattern_translation_matches(pat, text, want):
    rx_src, _ = lua_pattern_to_regex(pat)
    m = re.search(rx_src, text)
    assert m is not None and m.group(0) == want


@pytest.mark.parametrize(
    "pat",
    ["%b()", "%f[%a]", "a()b", "[%D]", "%q", "abc(", "a%", "[abc"],
)
def test_pattern_unsupported_or_malformed(pat):
    with pytest.raises(LuaPatternError):
        lua_pattern_to_regex(pat)


def test_pattern_captures_named():
    rx, n = lua_pattern_to_regex("(%d+)-(%a+)", group_names=["num", "word"])
    assert n == 2
    m = re.search(rx, "x99-yes!")
    assert m.group("num") == "99" and m.group("word") == "yes"


# ---------------------------------------------------------------------------
# interpreter semantics
# ---------------------------------------------------------------------------

def test_lua_value_semantics():
    # ints stay ints, / is float, // floored, .. stringifies, %.14g floats
    assert _raw_first(
        "function parse_log(l) return 7//2 .. ':' .. 7/2 .. ':' .. 2^10 "
        ".. ':' .. -7 % 3, 'm', '2024-01-01T00:00:00Z', {} end"
    ) == "3:3.5:1024.0:2"
    # bools are not numbers; and/or return operands; not; # lengths
    assert _raw_first(
        "function parse_log(l)\n"
        "  local t = {1, 2, 3}\n"
        "  local s = (true == 1) and 'bad' or 'good'\n"
        "  return s .. #t .. #'ab' .. tostring(nil == false), "
        "'m', '2024-01-01T00:00:00Z', {} end"
    ) == "good32false"


def test_lua_string_library():
    src = """
function parse_log(line)
  local cleaned, n = string.gsub(line, "%s+", "_")
  local parts = {}
  for w in string.gmatch(cleaned, "[^_]+") do table.insert(parts, w) end
  local head = string.upper(string.sub(line, 1, 3))
  local fmt = string.format("%s|%04d|%.2f|%x", head, n, 1.5, 255)
  return table.concat(parts, ",") .. "#" .. fmt, "m", "2024-01-01T00:00:00Z", {}
end
"""
    s = LuaScript(src)
    from logzilla_spark.operators.lua import _Interp

    out = _Interp(s.g, s.max_steps).call(s.fn, ("ab cd  ef",))[0]
    assert out == "ab,cd,ef#AB |0002|1.50|ff"


def test_lua_find_sub_tonumber():
    src = """
function parse_log(l)
  local a, b = string.find(l, "%d+")
  local n = tonumber(string.sub(l, a, b)) + tonumber("0x10") + (tonumber("zz") == nil and 1 or 0)
  return tostring(n), "m", "2024-01-01T00:00:00Z", {}
end
"""
    s = LuaScript(src)
    from logzilla_spark.operators.lua import _Interp

    assert _Interp(s.g, s.max_steps).call(s.fn, ("ab42cd",))[0] == "59"
    # and on a line with no digits the script errors -> record unchanged
    assert s.run_parse_log("x")[0] is False


def test_lua_control_flow_and_pcall():
    src = """
function helper(x)
  if x > 10 then return "big"
  elseif x > 5 then return "mid"
  else return "small" end
end
function parse_log(l)
  local acc = 0
  for i = 1, 10, 2 do acc = acc + i end          -- 1+3+5+7+9 = 25
  local j = 0
  while j < 3 do j = j + 1 if j == 2 then break end end
  local ok, err = pcall(function() error("boom") end)
  local m = { x = 1, y = 2 }
  local keys = {}
  for k, v in pairs(m) do table.insert(keys, k .. "=" .. v) end
  return helper(acc) .. j .. tostring(ok) .. err .. table.concat(keys, ";"),
         "m", "2024-01-01T00:00:00Z", {}
end
"""
    assert _raw_first(src) == "big2falseboomx=1;y=2"


def test_lua_json_roundtrip_and_metadata_conversion():
    src = """
local json = require("json")
function parse_log(l)
  local t = json.decode(l)
  local meta = { svc = t.svc, n = t.n, half = t.n / 2, arr = t.arr,
                 nested = { a = 1 }, flag = t.flag }
  return "info", json.encode(t.arr), "2024-01-01T00:00:00Z", meta
end
"""
    ok, ts, lvl, msg, mj = _run(src, '{"svc":"api","n":4,"arr":[1,"x"],"flag":true}')
    assert ok and msg == '[1,"x"]'
    import json as j

    meta = j.loads(mj)
    # integral floats collapse to ints (Go float64 json rendering)
    assert meta == {
        "svc": "api", "n": 4, "half": 2, "arr": [1, "x"],
        "nested": {"a": 1}, "flag": True,
    }


def test_lua_error_cases_leave_record_unchanged():
    # script error -> ok False
    assert _run("function parse_log(l) error('x') end", "a")[0] is False
    # bad timestamp -> ok False
    assert _run(
        "function parse_log(l) return 'i', 'm', 'not-a-ts', {} end", "a"
    )[0] is False
    # non-table metadata -> ok False
    assert _run(
        "function parse_log(l) return 'i', 'm', '2024-01-01T00:00:00Z', 'x' end", "a"
    )[0] is False
    # runaway loop -> step budget, ok False (stricter than the reference)
    assert _run(
        "function parse_log(l)\n  while true do end\nend", "a"
    )[0] is False
    # geometric string growth -> size cap trips long before OOM
    assert _run(
        "function parse_log(l)\n  local s = 'aaaaaaaa'\n"
        "  while true do s = s .. s end\nend", "a"
    )[0] is False
    assert _run(
        "function parse_log(l)\n"
        "  return 'i', string.rep('x', 2000000000), "
        "'2024-01-01T00:00:00Z', {} end", "a"
    )[0] is False
    # bad json -> LuaRuntimeError inside -> ok False
    assert _run(
        "local json = require('json')\n"
        "function parse_log(l) local t = json.decode(l) "
        "return 'i','m','2024-01-01T00:00:00Z', t end",
        "{broken",
    )[0] is False


def test_lua_sandbox_has_no_os_io_load():
    src = (
        "function parse_log(l)\n"
        "  return tostring(os) .. tostring(io) .. tostring(load), "
        "'m', '2024-01-01T00:00:00Z', {} end"
    )
    assert _raw_first(src) == "nilnilnil"
    with pytest.raises(LuaScriptError):
        LuaScript("function parse_log(l) return 1 end goto fail")
    with pytest.raises(LuaScriptError):
        LuaScript("not lua at all {{{")
    with pytest.raises(LuaScriptError):
        LuaScript("x = 1")  # no parse_log defined


@pytest.mark.parametrize(
    "s,ok",
    [
        ("2024-01-02T03:04:05Z", True),
        ("2024-01-02t03:04:05z", True),
        ("2024-01-02T03:04:05+02:00", True),
        ("2024-06-15T23:59:59-08:30", True),
        ("2024-01-02T03:04:05+0200", False),  # Go/XXX require the colon
        ("2024-01-02T03:04:05+02", False),
        ("2024-01-02T03:04:05.123Z", False),  # second precision only
        ("2024-02-30T03:04:05Z", False),  # invalid calendar date
        ("2024-01-02T24:00:00Z", False),
        ("12024-01-02T03:04:05Z", False),
        ("2024-01-02 03:04:05Z", False),
    ],
)
def test_rfc3339_python_acceptance(s, ok):
    assert (parse_rfc3339_utc(s) is not None) is ok


def test_rfc3339_parity_with_spark_fast_path(spark):
    """The interpreter's acceptance set == try_to_timestamp(XXX)'s, on
    valid and invalid forms alike — the cross-tier claim invariant."""
    from pyspark.sql import functions as F

    cases = [
        "2024-01-02T03:04:05Z", "2024-01-02t03:04:05z",
        "2024-01-02T03:04:05+02:00", "2024-06-15T23:59:59-08:30",
        "2024-01-02T03:04:05+0200", "2024-01-02T03:04:05+02",
        "2024-01-02T03:04:05.123Z", "2024-02-30T03:04:05Z",
        "2024-01-02T24:00:00Z", "12024-01-02T03:04:05Z",
        "2024-01-02 03:04:05Z", "2024-12-31T23:59:59+18:00",
        "2024-12-31T23:59:59+19:00",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "s string")
    from pyspark.sql import functions as F

    got = {
        r.s: r.t
        for r in df.select(
            "s", F.try_to_timestamp("s", F.lit(LUA_TS_FORMAT_SPARK)).alias("t")
        ).collect()
    }
    for c in cases:
        py = parse_rfc3339_utc(c)
        assert (got[c] is None) == (py is None), c
        if py is not None:
            assert got[c] == py, c


# ---------------------------------------------------------------------------
# fast-path compiler
# ---------------------------------------------------------------------------

_CANONICAL = """
function parse_log(line)
  local ts, lvl, code, msg = string.match(line, "^(%d%d%d%d%-%d%d%-%d%dT%d%d:%d%d:%d%d[%+%-:%d]*Z?) (%a+) %[(%d+)%] (.*)$")
  if ts == nil then
    return nil, nil, nil, {}
  end
  return lvl, msg, ts, { code = code, raw_level = lvl }
end
"""


def test_fast_path_compiles_canonical_shape():
    p = lua_parser("canon", script=_CANONICAL)
    assert p.mode == "codegen"
    g = p.delegate
    assert g.ts_group == "ts" and g.level_group == "lvl"
    assert g.message_groups == ("msg",)
    assert g.metadata_groups == (("code", "code"), ("raw_level", "lvl"))


@pytest.mark.parametrize(
    "src",
    [
        # computed metadata value
        "function parse_log(l)\n local a = string.match(l, '(%d+)')\n"
        " return 'info', a, '2024-01-01T00:00:00Z', { n = a .. 'x' } end",
        # json.decode body
        "local json = require('json')\nfunction parse_log(l)\n"
        " local t = json.decode(l)\n return 'info', t.m, t.ts, { s = t.s } end",
        # whole-match binding (no captures)
        "function parse_log(l)\n local a = string.match(l, '%d+')\n"
        " return 'info', a, '2024-01-01T00:00:00Z', {} end",
        # guard that CLAIMS on no-match (valid constant ts) — only the
        # interpreter can express claim-with-defaults
        "function parse_log(l)\n local a = string.match(l, '(%d+)')\n"
        " if a == nil then return 'info', l, '2024-01-01T00:00:00Z', {} end\n"
        " return 'info', a, '2024-01-01T00:00:00Z', { n = a } end",
        # extra statement after the match
        "function parse_log(l)\n local a = string.match(l, '(%d+)')\n"
        " local b = a\n return 'info', b, '2024-01-01T00:00:00Z', { n = b } end",
    ],
)
def test_fast_path_falls_back_to_interpreter(src):
    assert lua_parser(f"fb{abs(hash(src)) % 997}", script=src).mode == "arrow"


def test_fast_path_static_ts_and_level():
    src = """
function parse_log(line)
  local n = string.match(line, "^garbage line (%d+)$")
  if not n then return nil, nil, nil, {} end
  return "debug", n, "1970-01-01T00:00:00Z", { n = n }
end
"""
    p = lua_parser("luagarbage", script=src)
    assert p.mode == "codegen"
    assert p.delegate.ts_static == "1970-01-01T00:00:00Z"
    assert p.delegate.level_static == "DEBUG"  # normalized at compile time


# ---------------------------------------------------------------------------
# Spark integration: differential fast vs interpreter, chain tolerance
# ---------------------------------------------------------------------------

_DIFF_LINES = [
    "2024-03-05T06:07:08Z error [500] upstream timed out",
    "2024-03-05T06:07:08+02:00 warn [301] redirected",
    "2024-03-05T06:07:08+0200 warn [301] colonless offset must NOT claim",
    "2024-13-05T06:07:08Z error [500] bad month must not claim",
    "no match at all",
    "2024-03-05T06:07:08Z Error [7] level case-insensitive",
    "2024-03-05T06:07:08Z info [1] trailing  spaces kept  ",
    "",
]


def _envelope(df):
    return sorted(
        (r.url, r.category, str(r.timestamp), r.level, r.message,
         tuple(sorted(r.metadata.items())), r.parse_ok)
        for r in df.collect()
    )


def test_differential_codegen_vs_interpreter(spark):
    fast = lua_parser("luafast", script=_CANONICAL)
    slow = lua_parser("luaslow", script=_CANONICAL, force_interpreter=True)
    assert fast.mode == "codegen" and slow.mode == "arrow"
    P.register_parser(fast, replace=True)
    P.register_parser(slow, replace=True)
    try:
        lines = _line_rows(spark, *_DIFF_LINES)
        # category is the parser NAME — neutralize it so the envelopes
        # compare on everything else
        a = _envelope(
            P.records_from_lines(lines, chain=("luafast",))
            .withColumn("category", F.lit("lua"))
        )
        b = _envelope(
            P.records_from_lines(lines, chain=("luaslow",))
            .withColumn("category", F.lit("lua"))
        )
        assert a == b
        # and the claim set is exactly the lines with valid ts + match
        claimed = [r for r in a if r[6]]
        assert len(claimed) == 4
    finally:
        P.unregister_parser("luafast")
        P.unregister_parser("luaslow")


def test_lua_chain_never_drop_on_corpus(spark):
    """Reference-style script claims the corpus's garbage tail; json &
    access lines untouched; nothing dropped (the O17 contract through
    the Lua slot)."""
    from logzilla_spark.operators.parse import parse_records
    from logzilla_spark.testdata import ensure_pages

    src = """
function parse_log(line)
  local n = string.match(line, "^garbage line (%d+)$")
  if not n then return nil, nil, nil, {} end
  return "debug", n, "1970-01-01T00:00:00Z", { n = n }
end
"""
    p = lua_parser("luagarb", script=src)
    assert p.mode == "codegen"
    P.register_parser(p, replace=True)
    try:
        pages = spark.read.parquet(
            f"{ensure_pages('/root/testdata/sf0.001')}/pages.parquet"
        )
        base = parse_records(pages, impl="hybrid")
        rec = P.parse_records_chain(pages, chain=("access", "json", "luagarb"))
        got = {r.category: r["count"] for r in rec.groupBy("category").count().collect()}
        want = {r.category: r["count"] for r in base.groupBy("category").count().collect()}
        assert got["access"] == want["access"] and got["json"] == want["json"]
        assert got.get("luagarb", 0) > 0
        assert got.get("luagarb", 0) + got.get("unparsed", 0) == want["unparsed"]
        assert rec.count() == base.count()
        one = rec.filter("category = 'luagarb'").limit(1).collect()[0]
        assert one.level == "DEBUG" and str(one.timestamp) == "1970-01-01 00:00:00"
        assert one.metadata["n"] == one.message
    finally:
        P.unregister_parser("luagarb")


def test_lua_interpreter_chain_with_json_decode(spark):
    """An interpreter-tier script (json.decode + conditionals) through
    the chain: errors on SOME lines leave those unchanged."""
    src = """
local json = require("json")
function parse_log(line)
  local body = string.match(line, "^EVT (.*)$")
  if body == nil then error("not an EVT line") end
  local t = json.decode(body)
  local msg, n = string.gsub(t.msg, "%s+", " ")
  return t.sev, msg, t.ts, { svc = t.svc, squashed = tostring(n) }
end
"""
    p = lua_parser("luaevt", script=src, candidate_re=r"^EVT ")
    assert p.mode == "arrow"
    P.register_parser(p, replace=True)
    try:
        lines = _line_rows(
            spark,
            'EVT {"sev":"error","msg":"a   b","ts":"2024-03-05T06:07:08Z","svc":"api"}',
            'EVT {"sev":"warn","msg":"x","ts":"garbage","svc":"api"}',  # bad ts
            "EVT {broken json",
            "not an evt line",
        )
        out = {r.url: r for r in P.records_from_lines(lines, chain=("luaevt",)).collect()}
        assert out["u0"].category == "luaevt"
        assert out["u0"].level == "ERROR" and out["u0"].message == "a b"
        assert out["u0"].metadata == {"svc": "api", "squashed": "1"}
        assert str(out["u0"].timestamp) == "2024-03-05 06:07:08"
        for u in ("u1", "u2", "u3"):
            assert out[u].category == "unparsed" and out[u].timestamp == T0
    finally:
        P.unregister_parser("luaevt")


def test_config_lua_kind(spark, tmp_path):
    script = tmp_path / "legacy.lua"
    script.write_text(
        'function parse_log(line)\n'
        '  local n = string.match(line, "^garbage line (%d+)$")\n'
        '  if not n then return nil, nil, nil, {} end\n'
        '  return "debug", n, "1970-01-01T00:00:00Z", { n = n }\nend\n'
    )
    cfg = tmp_path / "pipe.toml"
    cfg.write_text(
        f"""
[pipeline]
warehouse = "{tmp_path}/wh"
chain = ["access", "json", "lua_cfg_legacy"]

[[parsers]]
name = "lua_cfg_legacy"
kind = "lua"
script-path = "{script}"
"""
    )
    from logzilla_spark.config import load_config, _register_configured_parsers

    c = load_config(str(cfg))
    _register_configured_parsers(c.parsers)
    try:
        got = P.get_parser("lua_cfg_legacy")
        assert got.mode == "codegen"
        lines = _line_rows(spark, "garbage line 7", "other")
        out = {r.url: r for r in P.records_from_lines(lines, chain=c.chain).collect()}
        assert out["u0"].category == "lua_cfg_legacy" and out["u0"].message == "7"
        assert out["u1"].category == "unparsed"
    finally:
        P.unregister_parser("lua_cfg_legacy")


def test_config_lua_kind_bad_script_fails_fast(tmp_path):
    from logzilla_spark.config import ConfigError, _register_configured_parsers

    with pytest.raises(ConfigError):
        _register_configured_parsers(
            [{"name": "bad", "kind": "lua", "script": "this is not lua ((("}]
        )


def test_lua_chain_on_structured_stream(spark, tmp_path):
    """Both Lua tiers inside ONE real Structured Streaming query over
    three micro-batch triggers, landing exactly the batch result — the
    streaming twin of the reference running its Lua processor on live
    sources (engine/orchestrator.go applies processors per record as
    sources produce them). records_from_lines is stateless narrow
    transforms only, so the same plan runs batch and streaming."""
    import os

    fast = lua_parser("luafaststream", script=_CANONICAL)
    slow = lua_parser(
        "luaevtstream",
        script="""
local json = require("json")
function parse_log(line)
  local body = string.match(line, "^EVT (.*)$")
  if body == nil then error("not EVT") end
  local t = json.decode(body)
  return t.sev, t.msg, t.ts, { svc = t.svc }
end
""",
        candidate_re=r"^EVT ",
    )
    assert fast.mode == "codegen" and slow.mode == "arrow"
    P.register_parser(fast, replace=True)
    P.register_parser(slow, replace=True)
    chain = ("luafaststream", "luaevtstream")
    all_lines = [
        "2024-03-05T06:07:08Z error [500] upstream timed out",
        'EVT {"sev":"warn","msg":"spill","ts":"2024-03-05T06:07:09Z","svc":"db"}',
        "garbage neither claims",
        "2024-03-05T06:07:10+02:00 info [200] ok",
        'EVT {"sev":"info","msg":"x","ts":"bad-ts","svc":"db"}',  # errors -> unparsed
        "2024-13-05T06:07:08Z error [1] bad month",
    ]
    try:
        in_dir = str(tmp_path / "lines_in")
        os.makedirs(in_dir)
        for b in range(3):  # 2 lines per micro-batch
            part = all_lines[b * 2 : b * 2 + 2]
            df = _line_rows(spark, *part).withColumn(
                "url", F.concat(F.lit(f"b{b}-"), F.col("url"))
            )
            df.coalesce(1).write.parquet(str(tmp_path / f"stage{b}"))
            src = next(
                f
                for f in os.listdir(tmp_path / f"stage{b}")
                if f.endswith(".parquet")
            )
            os.rename(tmp_path / f"stage{b}" / src, f"{in_dir}/batch{b}.parquet")

        stream = (
            spark.readStream.schema(_LINES_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        q = (
            P.records_from_lines(stream, chain=chain)
            .writeStream.format("memory")
            .queryName("lua_chain_stream")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=300)
        got = _envelope(spark.table("lua_chain_stream"))

        batch = spark.read.parquet(in_dir)
        want = _envelope(P.records_from_lines(batch, chain=chain))
        assert got == want
        cats = {r[1] for r in got}
        assert {"luafaststream", "luaevtstream", "unparsed"} <= cats
        claimed = [r for r in got if r[6]]
        assert len(claimed) == 3  # two fast-tier lines + one EVT line
    finally:
        P.unregister_parser("luafaststream")
        P.unregister_parser("luaevtstream")
