"""Config-driven pipeline assembly (logzilla_spark/config.py).

The reference assembles its engine from YAML (config/config.go); here a
TOML/JSON document must build the SAME Pipeline a hand-wired test does
and reproduce its results (VERDICT round-1 item 5 done-criterion).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from logzilla_spark.config import ConfigError, load_config, pipeline_from_file
from logzilla_spark.operators.parse import parse_records
from logzilla_spark.operators.route import sink_name
from logzilla_spark.plans.pipeline import Pipeline
from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.testdata import ensure_pages

from .conftest import SF001

TOML_TEMPLATE = """
[pipeline]
warehouse = "{wh}"
parse_impl = "native"

[source]
pages = "{pages}"

[enrich]
dims_dir = "{dims}"

[session]
shuffle_partitions = 8
"""


def _canon_state(spark, cat, categories):
    out = {}
    for c in categories:
        out[c] = sorted(
            (r.id, r.level, str(r.timestamp), r.message)
            for r in cat.read(spark, sink_name(c))
            .select("id", "level", "timestamp", "message").collect()
        )
    return out


def test_toml_config_reproduces_hand_wired_pipeline(spark, tmp_path):
    d = ensure_pages(SF001)
    cfg_path = tmp_path / "pipeline.toml"
    cfg_path.write_text(
        TOML_TEMPLATE.format(wh=tmp_path / "wh_cfg", pages=f"{d}/pages.parquet",
                             dims=d)
    )
    pipe = pipeline_from_file(spark, str(cfg_path))
    r = pipe.run(run_id="cfg1")
    assert r.rows_in == spark.read.parquet(f"{d}/pages.parquet").count()

    # hand-wired twin (test_pipeline_resume.py shape)
    cat2 = LocalCatalog(str(tmp_path / "wh_hand"))
    hand = Pipeline(spark, cat2, parse_impl="native")
    hand.set_dims(
        spark.read.parquet(f"{d}/dim_lang.parquet"),
        spark.read.parquet(f"{d}/dim_severity.parquet"),
    )
    hand.ingest_pages(spark.read.parquet(f"{d}/pages.parquet"))
    r2 = hand.run(run_id="hand1")
    assert r.rows_routed == r2.rows_routed
    assert _canon_state(spark, pipe.cat, pipe.categories) == _canon_state(
        spark, cat2, hand.categories
    )


def test_json_config_with_parser_chain(spark, tmp_path):
    """A config-registered grok parser + chain routes the corpus's
    garbage tail to its own sink — per-source processor chains
    (config/config.go:45-50) end to end."""
    d = ensure_pages(SF001)
    doc = {
        "pipeline": {
            "warehouse": str(tmp_path / "wh_chain"),
            "chain": ["access", "json", "legacy2"],
        },
        "source": {"pages": f"{d}/pages.parquet"},
        "parsers": [
            {
                "name": "legacy2",
                "kind": "grok",
                "pattern": r"^garbage line (?P<n>\d+)$",
                "level_static": "DEBUG",
                "message_groups": ["n"],
            }
        ],
    }
    cfg_path = tmp_path / "pipeline.json"
    cfg_path.write_text(json.dumps(doc))
    pipe = pipeline_from_file(spark, str(cfg_path))
    assert pipe.categories == ["access", "json", "legacy2", "unparsed"]
    r = pipe.run(run_id="chain1")
    assert r.rows_routed.get("legacy2", 0) > 0
    # set equality with the base parse: chain moves rows between
    # categories but never drops or invents any
    pages = spark.read.parquet(f"{d}/pages.parquet")
    total = sum(r.rows_routed.values())
    assert total == parse_records(pages, impl="native").count()
    sink = pipe.cat.read(spark, sink_name("legacy2"))
    assert sink.filter(F.col("level") != "DEBUG").count() == 0


def test_config_errors(tmp_path):
    p = tmp_path / "bad.toml"
    p.write_text("[pipeline]\nparse_impl = 'native'\n")
    with pytest.raises(ConfigError, match="warehouse"):
        load_config(str(p))
    p.write_text("[pipeline]\nwarehouse = 'w'\nparse_impl = 'nope'\n")
    with pytest.raises(ConfigError, match="unknown impl"):
        load_config(str(p))
    p.write_text("[pipeline]\nwarehouse = 'w'\n\n[typo_section]\nx = 1\n")
    with pytest.raises(ConfigError, match="unknown config section"):
        load_config(str(p))
    q = tmp_path / "bad.ini"
    q.write_text("x")
    with pytest.raises(ConfigError, match="unsupported config format"):
        load_config(str(q))


def test_config_logs_source_drives_tail_loop(spark, tmp_path):
    """A reference-style config — file source + a Lua script parser —
    drives the whole tail-follow loop through main.py: the config's
    chain applies on the stream and the Lua-claimed category gets its
    own routed sink (the one-config switch-over story)."""
    import os

    import main as cli

    logs = tmp_path / "logs"
    os.makedirs(logs)
    (logs / "x.log").write_text(
        'garbage line 5\n'
        '{"timestamp":"2024-01-02T03:04:05Z","level":"info","message":"m"}\n'
    )
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
chain = ["access", "json", "cfgluatail"]

[source]
logs = "{logs}"

[[parsers]]
name = "cfgluatail"
kind = "lua"
script-path = "{script}"
"""
    )
    c = load_config(str(cfg))
    assert c.logs_dir == str(logs) and c.pages_path is None
    try:
        assert cli.main(["--config", str(cfg)]) == 0
        cat = LocalCatalog(f"{tmp_path}/wh")
        assert cat.read(spark, sink_name("cfgluatail")).count() == 1
        assert cat.read(spark, sink_name("json")).count() == 1
        row = cat.read(spark, sink_name("cfgluatail")).collect()[0]
        assert row.level == "DEBUG" and row.metadata["n"] == "5"
    finally:
        from logzilla_spark.operators.parsers import unregister_parser

        unregister_parser("cfgluatail")


def test_config_alert_rules_validation(tmp_path):
    from logzilla_spark.config import configured_alert_rules

    def _cfg(alerts_toml):
        p = tmp_path / "a.toml"
        p.write_text(
            f'[pipeline]\nwarehouse = "{tmp_path}/wh"\n{alerts_toml}'
        )
        return load_config(str(p))

    rules = configured_alert_rules(_cfg(
        '[[alerts]]\nname = "eb"\nmin_count = 5\nlevel = "ERROR"\n'
        '[[alerts]]\nname = "any"\nmin_count = 100\n'
    ))
    assert [(r.name, r.min_count, r.category, r.level) for r in rules] == [
        ("eb", 5, None, "ERROR"), ("any", 100, None, None)
    ]
    assert configured_alert_rules(_cfg("")) == []
    with pytest.raises(ConfigError, match="unknown key"):
        configured_alert_rules(_cfg('[[alerts]]\nname="x"\nmin_count=1\nlvl="E"\n'))
    with pytest.raises(ConfigError, match="min_count"):
        configured_alert_rules(_cfg('[[alerts]]\nname="x"\nmin_count="5"\n'))
    with pytest.raises(ConfigError, match="min_count"):
        configured_alert_rules(_cfg('[[alerts]]\nname="x"\nmin_count=0\n'))
    with pytest.raises(ConfigError, match="duplicate"):
        configured_alert_rules(_cfg(
            '[[alerts]]\nname="x"\nmin_count=1\n'
            '[[alerts]]\nname="x"\nmin_count=2\n'
        ))


def test_config_alerts_drive_tail_alert_stream(spark, tmp_path):
    """A config with [[alerts]] runs the alert stream alongside the
    tail-follow loop: the ledger lands exactly the batch alert set for
    the tailed files."""
    import os

    import main as cli

    from logzilla_spark.operators.aggregate import windowed_counts
    from logzilla_spark.operators.parsers import records_from_lines
    from logzilla_spark.sources.textfiles import text_file_lines
    from logzilla_spark.streaming.alerts import AlertRule, evaluate_alerts

    logs = tmp_path / "logs"
    os.makedirs(logs)
    (logs / "x.log").write_text(
        '{"timestamp":"2024-01-02T03:04:05Z","level":"error","message":"a"}\n'
        '{"timestamp":"2024-01-02T03:10:05Z","level":"error","message":"b"}\n'
        '{"timestamp":"2024-01-02T03:20:05Z","level":"info","message":"c"}\n'
    )
    cfg = tmp_path / "pipe.toml"
    cfg.write_text(
        f"""
[pipeline]
warehouse = "{tmp_path}/wh"
chain = ["access", "json"]

[source]
logs = "{logs}"

[[alerts]]
name = "err2"
min_count = 2
level = "ERROR"
"""
    )
    assert cli.main(["--config", str(cfg)]) == 0
    cat = LocalCatalog(f"{tmp_path}/wh")
    got = {
        (r["rule_name"], r["window_start"], r["category"], r["level"], r["n"])
        for r in cat.read(spark, "stream_alerts").collect()
    }
    batch = evaluate_alerts(
        windowed_counts(
            records_from_lines(
                text_file_lines(spark, str(logs)), chain=("access", "json")
            ),
            time_col="timestamp",
            keys=("category", "level"),
        ),
        [AlertRule("err2", min_count=2, level="ERROR")],
    )
    expect = {
        (r["rule_name"], r["window_start"], r["category"], r["level"], r["n"])
        for r in batch.collect()
    }
    assert got == expect and got
