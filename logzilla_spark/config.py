"""Config-driven pipeline assembly.

The reference builds its whole engine from a YAML file: typed source /
processor / storage factories plus per-source processor chains
(reference: config/config.go:52-224, per-source chains
config/config.go:45-50; cmd/engine/main.go reads the file). This module
is the Spark-native equivalent: one declarative document assembles the
incremental Pipeline — source, parser registrations, parse chain,
enrichment dims, sinks — without the user writing any wiring code.

Formats: TOML (stdlib ``tomllib``) and JSON always work; ``.yaml`` is
accepted too when a ``yaml`` module is importable (PyYAML is not vendored
in this container, and the config schema is format-agnostic).

Schema (TOML shown; JSON/YAML mirror it):

    [pipeline]
    warehouse   = "/path/warehouse"      # required
    parse_impl  = "hybrid"               # arrow | native | hybrid
    # OR a parser chain (overrides parse_impl; names from the registry):
    # chain     = ["access", "json", "legacy"]
    use_html    = true

    [source]                             # optional one-shot ingest
    pages = "/path/pages.parquet"
    # OR raw log files (the reference's file source, config.go:52-83):
    # logs  = "/path/log_dir"            # consumed by main.py --config
    #                                    # as a tail-follow stream

    [enrich]                             # optional broadcast dims
    dims_dir = "/path/dims"              # dim_lang.parquet, dim_severity.parquet

    [[parsers]]                          # optional registry entries (O21)
    name           = "legacy"
    kind           = "grok"              # grok | pandas | lua
    pattern        = '^garbage line (?P<n>\\d+)$'
    level_static   = "DEBUG"
    message_groups = ["n"]
    # pandas kind instead takes: fn = "package.module:function"
    # lua kind instead takes:    script-path = "/path/parse.lua"
    #   (the reference's LuaLogProcessorConfig field, lua.go:15-17;
    #   inline `script = "..."` also accepted) — compiled to codegen
    #   when the script has the canonical string.match shape, else run
    #   in the sandboxed Arrow interpreter (operators/lua.py)

    [[alerts]]                           # optional threshold alert rules
    name      = "error_burst"            # (streaming/alerts.py; consumed
    min_count = 5                        #  by main.py --tail as a second
    level     = "ERROR"                  #  stream writing stream_alerts)
    # category = "json"                  # omitted field = wildcard

    [[recordings]]                       # optional recording rules:
    name = "error_rate_6h"               # range queries maintained as
    q    = "level in (ERROR, FATAL)"     # committed rec_<name> tables
    step = "6h"                          # (streaming/recordings.py)
    agg  = "rate"
    by   = ["level"]

    [session]
    shuffle_partitions = 32              # optional conf overrides
"""

from __future__ import annotations

import importlib
import json
import os
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from .operators.parsers import GrokParser, PandasParser, register_parser
from .plans.pipeline import Pipeline
from .sources.catalog import LocalCatalog


class ConfigError(ValueError):
    """Malformed pipeline config (the reference fails fast on bad YAML)."""


@dataclass
class PipelineConfig:
    warehouse: str
    parse_impl: str = "hybrid"
    chain: tuple[str, ...] | None = None
    use_html: bool = True
    pages_path: str | None = None
    logs_dir: str | None = None
    dims_dir: str | None = None
    parsers: list[dict[str, Any]] = field(default_factory=list)
    alerts: list[dict[str, Any]] = field(default_factory=list)
    recordings: list[dict[str, Any]] = field(default_factory=list)
    quota: dict[str, Any] | None = None
    shuffle_partitions: int | None = None


def _load_document(path: str) -> dict[str, Any]:
    ext = os.path.splitext(path)[1].lower()
    with open(path, "rb") as f:
        raw = f.read()
    if ext == ".toml":
        import tomllib

        return tomllib.loads(raw.decode("utf-8"))
    if ext == ".json":
        return json.loads(raw)
    if ext in (".yaml", ".yml"):
        try:
            yaml = importlib.import_module("yaml")
        except ImportError as e:
            raise ConfigError(
                "YAML config needs a 'yaml' module; use .toml or .json"
            ) from e
        return yaml.safe_load(raw)
    raise ConfigError(f"unsupported config format: {path!r} (toml/json/yaml)")


def load_config(path: str) -> PipelineConfig:
    doc = _load_document(path)
    if not isinstance(doc, dict):
        raise ConfigError("config root must be a mapping")
    pipe = doc.get("pipeline") or {}
    if "warehouse" not in pipe:
        raise ConfigError("pipeline.warehouse is required")
    known = {"pipeline", "source", "enrich", "parsers", "alerts",
             "recordings", "quota", "session"}
    unknown = set(doc) - known
    if unknown:
        # DisallowUnknownFields analog — typos fail fast
        raise ConfigError(f"unknown config section: {sorted(unknown)[0]!r}")
    chain = pipe.get("chain")
    impl = pipe.get("parse_impl", "hybrid")
    if chain is None and impl not in ("arrow", "native", "hybrid"):
        raise ConfigError(f"pipeline.parse_impl: unknown impl {impl!r}")
    return PipelineConfig(
        warehouse=pipe["warehouse"],
        parse_impl=impl,
        chain=tuple(chain) if chain else None,
        use_html=bool(pipe.get("use_html", True)),
        pages_path=(doc.get("source") or {}).get("pages"),
        logs_dir=(doc.get("source") or {}).get("logs"),
        dims_dir=(doc.get("enrich") or {}).get("dims_dir"),
        parsers=list(doc.get("parsers") or []),
        alerts=list(doc.get("alerts") or []),
        recordings=list(doc.get("recordings") or []),
        quota=_check_quota(doc.get("quota")),
        shuffle_partitions=(doc.get("session") or {}).get("shuffle_partitions"),
    )


def _check_quota(q):
    """``[quota]`` section: the T77 runaway-tenant guard, applied in
    the pipeline with over-quota records routed to the 'throttled'
    sink (never-drop). Keys: quota (int >= 1, required), key
    (default 'source'), window ('minute'/'hour'/'day')."""
    if q is None:
        return None
    if not isinstance(q, dict):
        raise ConfigError("quota: expected a table/object")
    unknown = set(q) - {"quota", "key", "window"}
    if unknown:
        raise ConfigError(f"quota: unknown key {sorted(unknown)[0]!r}")
    n = q.get("quota")
    if isinstance(n, bool) or not isinstance(n, int) or n < 1:
        raise ConfigError("quota.quota: expected an integer >= 1")
    if q.get("window", "hour") not in ("minute", "hour", "day"):
        raise ConfigError("quota.window: one of minute/hour/day")
    key = q.get("key", "source")
    import re as _re

    if not isinstance(key, str) or not _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", key):
        raise ConfigError("quota.key: expected a column name")
    return {"quota": n, "key": q.get("key", "source"),
            "window": q.get("window", "hour")}


def _register_configured_parsers(entries: list[dict[str, Any]]) -> None:
    for e in entries:
        kind = e.get("kind", "grok")
        name = e.get("name")
        if not name:
            raise ConfigError("parsers[].name is required")
        if kind == "grok":
            register_parser(
                GrokParser(
                    name=name,
                    pattern=e["pattern"],
                    ts_group=e.get("ts_group"),
                    ts_format_spark=e.get("ts_format_spark"),
                    level_group=e.get("level_group"),
                    level_static=e.get("level_static", "UNKNOWN"),
                    message_groups=tuple(e.get("message_groups") or ()),
                ),
                replace=True,
            )
        elif kind == "pandas":
            ref = e.get("fn", "")
            mod_name, _, fn_name = ref.partition(":")
            if not mod_name or not fn_name:
                raise ConfigError(
                    f"parsers[{name!r}].fn must be 'module:function', got {ref!r}"
                )
            fn = getattr(importlib.import_module(mod_name), fn_name)
            register_parser(
                PandasParser(name=name, fn=fn, candidate_re=e.get("candidate_re")),
                replace=True,
            )
        elif kind == "lua":
            from .operators.lua import LuaScriptError, lua_parser

            try:
                parser = lua_parser(
                    name=name,
                    script=e.get("script"),
                    script_path=e.get("script-path") or e.get("script_path"),
                    candidate_re=e.get("candidate_re"),
                )
            except LuaScriptError as err:
                raise ConfigError(f"parsers[{name!r}]: {err}") from err
            register_parser(parser, replace=True)
        else:
            raise ConfigError(f"parsers[{name!r}].kind: unknown kind {kind!r}")


def build_pipeline(spark: SparkSession, cfg: PipelineConfig) -> Pipeline:
    """Assemble the incremental Pipeline exactly as config.go assembles
    the reference engine: register parsers, wire dims, ingest the
    configured source, return the runnable Pipeline."""
    if cfg.shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
    _register_configured_parsers(cfg.parsers)
    cat = LocalCatalog(cfg.warehouse)
    pipe = Pipeline(
        spark, cat,
        parse_impl=cfg.chain if cfg.chain else cfg.parse_impl,
        use_html=cfg.use_html,
        quota=cfg.quota,
    )
    if cfg.dims_dir:
        pipe.set_dims(
            spark.read.parquet(os.path.join(cfg.dims_dir, "dim_lang.parquet")),
            spark.read.parquet(os.path.join(cfg.dims_dir, "dim_severity.parquet")),
        )
    if cfg.pages_path:
        pipe.ingest_pages(spark.read.parquet(cfg.pages_path))
    return pipe


def pipeline_from_file(spark: SparkSession, path: str) -> Pipeline:
    return build_pipeline(spark, load_config(path))


def configured_alert_rules(cfg: PipelineConfig):
    """[[alerts]] entries -> AlertRule list (streaming/alerts.py).

        [[alerts]]
        name      = "error_burst"
        min_count = 5
        level     = "ERROR"       # optional; omitted = wildcard
        # category = "json"       # optional; omitted = wildcard

    Fail-fast validation in the config layer (the reference's
    DisallowUnknownFields posture): unknown keys, missing name, or a
    non-integer/boolean min_count raise ConfigError before any stream
    starts. Returns [] when the section is absent."""
    from .streaming.alerts import AlertRule

    rules = []
    for e in cfg.alerts:
        unknown = set(e) - {"name", "min_count", "category", "level"}
        if unknown:
            raise ConfigError(f"alerts: unknown key {sorted(unknown)[0]!r}")
        name = e.get("name")
        if not isinstance(name, str) or not name:
            raise ConfigError("alerts: each rule needs a non-empty name")
        mc = e.get("min_count")
        if isinstance(mc, bool) or not isinstance(mc, int):
            raise ConfigError(f"alerts[{name}]: min_count must be an integer")
        for k in ("category", "level"):
            if e.get(k) is not None and not isinstance(e[k], str):
                raise ConfigError(f"alerts[{name}]: {k} must be a string")
        try:
            rules.append(
                AlertRule(
                    name=name,
                    min_count=mc,
                    category=e.get("category"),
                    level=e.get("level"),
                )
            )
        except ValueError as err:
            raise ConfigError(f"alerts[{name}]: {err}") from err
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ConfigError(f"alerts: duplicate rule names {sorted(names)}")
    return rules
