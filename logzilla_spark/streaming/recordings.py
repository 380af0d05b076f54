"""Recording rules: range queries maintained as committed tables.

The Prometheus/Loki recording-rule pattern for dashboards: a panel
that re-runs ``rate({level:ERROR}) by (level)`` against the raw corpus
pays the full scan on every refresh; a RECORDING rule evaluates the
range query once per cycle over the newly-closed time window and
merges the matrix into a committed per-rule table (``rec_<name>``)
that panels read directly — serving cost goes from corpus-scale to
cells-scale, and history accumulates without rescans.

Composition, not new machinery: the evaluator IS
``operators/range_query.range_query`` (a T55 DSL filter string + the
T56 matrix), and the sink discipline IS the streaming agg sink's
month-partitioned keyed merge (``sources/catalog.overwrite_partitions``
— only the months overlapping the evaluated window are read, merged
and rewritten; every other month carries over metadata-only).

Idempotence contract: an evaluation REPLACES its window — old rows
whose bucket falls inside [lo, hi] are dropped, the fresh matrix is
inserted, rows outside the window in the touched months carry over
explicitly.  Re-running the same window over the same corpus is a
no-op change; re-running after late data lands is the correction
path.  Evaluate on step-aligned window edges (the operator floors
buckets), otherwise a window's edge bucket is only partially
re-aggregated — :func:`record_rule_window` enforces alignment rather
than guessing.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from logzilla_spark.operators.dsl import parse_dsl
from logzilla_spark.operators.query import Query, QueryValidationError
from logzilla_spark.operators.range_query import parse_step, range_query
from logzilla_spark.sources.catalog import LocalCatalog

__all__ = [
    "RecordingRule",
    "record_rule_window",
    "recording_rules_from_config",
    "read_recording",
    "recording_table",
]

_NAME_RE = re.compile(r"^[A-Za-z0-9_.\-]{1,64}$")
_MONTH = "rec_month"


@dataclass
class RecordingRule:
    """One declared rule: a T55 filter string + T56 matrix parameters.

    ``q`` is the FILTER only (directives rejected — the window is the
    evaluator's argument, not the rule's; a rule with a baked-in
    ``since:`` would re-record the same fixed window forever).
    """

    name: str
    q: str = ""
    step: int | str = 3600
    agg: str = "count_over_time"
    by: tuple[str, ...] = field(default_factory=tuple)
    unwrap: str | None = None
    quantile: tuple[int, int] | None = None
    # T69 parser stage: record series over QUERY-TIME extracted labels
    # (`extracted.<name>` valid in by/unwrap; pattern XOR regexp+names)
    pattern: str | None = None
    regexp: str | None = None
    names: tuple[str, ...] = field(default_factory=tuple)
    extract_where: tuple = field(default_factory=tuple)

    def __post_init__(self):
        if not _NAME_RE.match(self.name):
            raise QueryValidationError(
                f"recording rule name {self.name!r}: expected a short "
                "alphanumeric name"
            )
        self.step = parse_step(self.step)
        self.node = parse_dsl(self.q)  # directives raise here
        from logzilla_spark.operators.extract import Extraction

        if self.pattern is not None and self.regexp is not None:
            raise QueryValidationError(
                f"rule {self.name!r}: pattern and regexp are exclusive"
            )
        if self.pattern is not None:
            self.extract = Extraction.pattern(self.pattern)
        elif self.regexp is not None:
            self.extract = Extraction.regexp(self.regexp, list(self.names))
        else:
            if self.names:
                raise QueryValidationError(
                    f"rule {self.name!r}: names requires regexp"
                )
            self.extract = None
        # TOML arrays arrive as lists; the filter stage validates the
        # triples at evaluation time (extract required, ops, types)
        self.extract_where = tuple(
            tuple(t) if isinstance(t, (list, tuple)) else t
            for t in self.extract_where
        )
        if self.extract_where and self.extract is None:
            raise QueryValidationError(
                f"rule {self.name!r}: extract_where requires pattern/regexp"
            )


def recording_table(rule_name: str) -> str:
    return f"rec_{rule_name}"


def record_rule_window(
    spark: SparkSession,
    cat: LocalCatalog,
    records: DataFrame,
    rule: RecordingRule,
    start: datetime,
    end: datetime,
) -> int:
    """Evaluate ``rule`` over [start, end] and merge the matrix into
    its committed table; returns the number of fresh matrix rows.

    start/end must be step-aligned (see module docstring).  The merge
    touches only the months overlapping the window: their rows with
    buckets OUTSIDE [lo, hi] carry over, everything inside is replaced
    by the fresh evaluation — so re-evaluation (same data or after
    late arrivals) converges instead of double-counting.
    """
    from logzilla_spark.operators.range_query import _epoch_seconds

    lo, hi = _epoch_seconds(start), _epoch_seconds(end)
    if lo % rule.step or hi % rule.step:
        raise QueryValidationError(
            f"rule {rule.name!r}: window edges must be step-aligned "
            f"(step={rule.step}s)"
        )
    q = Query(start=start, end=end, node=rule.node)
    fresh = range_query(
        records, q, agg=rule.agg, step=rule.step, by=list(rule.by),
        unwrap=rule.unwrap, quantile=rule.quantile, extract=rule.extract,
        extract_where=list(rule.extract_where),
    ).withColumn(_MONTH, F.from_unixtime("bucket", "yyyyMM"))
    n_fresh = fresh.count()

    table = recording_table(rule.name)
    if not cat.exists(table):
        cat.overwrite(fresh, table, partition_by=[_MONTH])
        return n_fresh

    months = [r[_MONTH] for r in fresh.select(_MONTH).distinct().collect()]
    if not months:
        return 0
    old = cat.read_partitions(spark, table, _MONTH, months)
    merged = fresh
    if old is not None:
        # partition-column inference reads the token back as int
        keep = old.withColumn(_MONTH, F.col(_MONTH).cast("string")).filter(
            ~F.col("bucket").between(lo, hi)
        )
        merged = keep.select(*fresh.columns).unionByName(fresh)
    cat.overwrite_partitions(merged, table, _MONTH, months)
    return n_fresh


def read_recording(
    spark: SparkSession, cat: LocalCatalog, rule_name: str
) -> DataFrame:
    """The dashboard read path: the committed matrix, month-prunable
    on the partition column, no corpus scan."""
    return cat.read(spark, recording_table(rule_name)).drop(_MONTH)


def recording_rules_from_config(cfg) -> list[RecordingRule]:
    """``[[recordings]]`` entries -> RecordingRule list.

        [[recordings]]
        name = "error_rate_6h"
        q    = "level in (ERROR, FATAL)"
        step = "6h"
        agg  = "rate"
        by   = ["level"]
        # unwrap = "metadata.size"; quantile = [19, 20]
    """
    rules = []
    for e in getattr(cfg, "recordings", None) or []:
        if "name" not in e:
            raise QueryValidationError("recordings[].name is required")
        known = {"name", "q", "step", "agg", "by", "unwrap", "quantile",
                 "pattern", "regexp", "names", "extract_where"}
        unknown = set(e) - known
        if unknown:
            raise QueryValidationError(
                f"recordings[{e['name']!r}]: unknown key "
                f"{sorted(unknown)[0]!r}"
            )
        quantile = e.get("quantile")
        rules.append(
            RecordingRule(
                name=e["name"],
                q=e.get("q", ""),
                step=e.get("step", 3600),
                agg=e.get("agg", "count_over_time"),
                by=tuple(e.get("by") or ()),
                unwrap=e.get("unwrap"),
                quantile=tuple(quantile) if quantile else None,
                pattern=e.get("pattern"),
                regexp=e.get("regexp"),
                names=tuple(e.get("names") or ()),
                extract_where=tuple(e.get("extract_where") or ()),
            )
        )
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise QueryValidationError("duplicate recording rule name")
    return rules
