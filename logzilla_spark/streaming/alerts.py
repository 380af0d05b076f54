"""Continuous alert evaluation: threshold rules over windowed counts.

The alerting layer every log engine pairs with its aggregation surface
(Grafana/Loki alert rules, Elastic watcher, Splunk saved-search
alerts): declarative threshold rules — "fire when a window's count for
(category, level) reaches N" — evaluated continuously against the
update-mode windowed-count stream, landing each firing EXACTLY ONCE in
a committed alert ledger.

Design (Spark-first, scale-first):

- **Evaluation cost is O(changed windows), never O(history).** The
  update-mode stream already emits only windows whose counts changed
  this trigger, carrying the window's NEW TOTAL count (the agg state
  holds totals), so rule evaluation is a pure projection+filter over
  the epoch's delta — no table rescan, no extra aggregation.
- **Rules join, not rule loops.** The rule set is a tiny broadcast
  frame joined with NULL-wildcard match conditions; one pass evaluates
  every rule (a per-rule filter loop would scan the delta per rule).
- **At-most-once firing per alert identity** (rule, window, key): a
  window's count only grows as late data arrives, so the FIRST epoch
  in which it reaches the threshold fires; later revisions of the same
  window anti-join away against the ledger.
- **Exactly-once ledger.** Same committed-map discipline as every
  other sink (stream_pipeline._committed_map): a replayed epoch is
  recognized and skipped whole, and the in-epoch anti-join dedups
  against crashes between evaluate and commit.

The batch twin (``evaluate_alerts`` over batch ``windowed_counts``) is
the differential oracle: a stream split across arbitrary triggers must
land exactly the batch alert set.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import LocalCatalog

__all__ = [
    "AlertRule",
    "evaluate_alerts",
    "alert_batch",
    "start_alert_stream",
    "start_logfile_alert_stream",
    "ALERT_KEYS",
]

# alert identity: one firing per rule per window per key
ALERT_KEYS = ["rule_name", "window_start", "window_end", "category", "level"]


@dataclass(frozen=True)
class AlertRule:
    """Threshold rule: fire when a window's count for the matched key
    reaches ``min_count``. ``category`` / ``level`` = None is a
    wildcard (matches every value)."""

    name: str
    min_count: int
    category: str | None = None
    level: str | None = None

    def __post_init__(self):
        if self.min_count < 1:
            raise ValueError(f"rule {self.name!r}: min_count must be >= 1")


def _rules_df(spark: SparkSession, rules: list[AlertRule]) -> DataFrame:
    if not rules:
        raise ValueError("evaluate_alerts: empty rule set")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {sorted(names)}")
    # pure-literal frame (constant-folds to a LocalRelation) instead of
    # createDataFrame: no Python-RDD backing, so alert evaluation plans
    # stay 100% JVM-side like every other registered query
    entries = F.array(
        *[
            F.struct(
                F.lit(r.name).alias("rule_name"),
                F.lit(r.min_count).cast("bigint").alias("min_count"),
                F.lit(r.category).cast("string").alias("r_category"),
                F.lit(r.level).cast("string").alias("r_level"),
            )
            for r in rules
        ]
    )
    return (
        spark.range(1).select(F.explode(entries).alias("_r")).select("_r.*")
    )


def evaluate_alerts(agg: DataFrame, rules: list[AlertRule]) -> DataFrame:
    """Firing alerts for a windowed-counts frame (batch or one epoch).

    Input shape: ``window_start, window_end, category, level, n`` (the
    shared batch/streaming aggregate columns). One broadcast join
    evaluates the whole rule set in one pass; NULL rule fields are
    wildcards. Output: ALERT_KEYS + ``n`` (the count that tripped the
    rule) + ``min_count``.
    """
    r = _rules_df(agg.sparkSession, rules)
    cond = (
        (F.col("r_category").isNull() | (F.col("r_category") == F.col("category")))
        & (F.col("r_level").isNull() | (F.col("r_level") == F.col("level")))
        & (F.col("n") >= F.col("min_count"))
    )
    return agg.join(F.broadcast(r), cond, "inner").select(
        *ALERT_KEYS, "n", "min_count"
    )


def alert_batch(
    cat: LocalCatalog,
    batch: DataFrame,
    batch_id: int,
    rules: list[AlertRule],
    query_id: str = "alerts",
    table: str = "stream_alerts",
) -> bool:
    """Evaluate one epoch's changed windows and append NEW firings.

    Returns False for an already-committed (replayed) epoch. The
    ledger append always commits — even an epoch with zero new
    firings — so the committed map advances and a replay is
    recognizable.
    """
    from .stream_pipeline import _committed_map, _summary_at_publish, _upsert_lock

    spark = batch.sparkSession
    with _upsert_lock(cat, table):
        committed = _committed_map(cat, table)
        if committed.get(query_id, -1) >= batch_id:
            return False
        fired = evaluate_alerts(batch, rules)
        if cat.exists(table):
            ledger = cat.read(spark, table).select(*ALERT_KEYS)
            fired = fired.join(ledger, ALERT_KEYS, "left_anti")
        cat.append(
            fired,
            table,
            summary=_summary_at_publish(cat, table, query_id, batch_id),
        )
        return True


def start_alert_stream(
    spark: SparkSession,
    pages_dir: str,
    warehouse: str,
    checkpoint_dir: str,
    rules: list[AlertRule],
    watermark: str = "10 minutes",
    parse_impl: str = "arrow",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """pages stream -> parse -> windowed counts -> alert ledger.

    The reference's operating mode with alerting attached: update-mode
    windowed counts feed ``alert_batch`` per trigger; the ledger table
    ``stream_alerts`` accumulates each firing exactly once.
    """
    from ..operators.parse import parse_records
    from .stream_pipeline import stream_pages, streaming_windowed_counts

    cat = LocalCatalog(warehouse)
    records = parse_records(
        stream_pages(spark, pages_dir, max_files_per_trigger), impl=parse_impl
    )
    agg = streaming_windowed_counts(records, watermark=watermark)

    def _sink(batch: DataFrame, batch_id: int) -> None:
        alert_batch(cat, batch, batch_id, rules)

    writer = (
        agg.writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_logfile_alert_stream(
    spark: SparkSession,
    logs_dir: str,
    warehouse: str,
    checkpoint_dir: str,
    rules: list[AlertRule],
    chain: tuple[str, ...] = ("access", "json"),
    watermark: str = "10 minutes",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Alerting on the reference's native input: raw log files ->
    registry parser chain -> windowed counts -> exactly-once alert
    ledger. The same source/chain as the tail-follow routing loop, so
    one `-config` deployment can run both (separate checkpoints; the
    ledger table keeps its own committed map)."""
    from ..operators.parsers import records_from_lines
    from ..sources.textfiles import text_file_lines_stream
    from .stream_pipeline import streaming_windowed_counts

    cat = LocalCatalog(warehouse)
    lines = text_file_lines_stream(
        spark, logs_dir, max_files_per_trigger=max_files_per_trigger
    )
    records = records_from_lines(lines, chain=chain)
    agg = streaming_windowed_counts(records, watermark=watermark)

    def _sink(batch: DataFrame, batch_id: int) -> None:
        alert_batch(cat, batch, batch_id, rules)

    writer = (
        agg.writeStream.outputMode("update")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
