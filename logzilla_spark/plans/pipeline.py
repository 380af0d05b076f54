"""The end-to-end incremental pipeline with lineage + checkpoint-resume.

The reference's engine loop is
source -> process -> buffer -> flush-to-storage
(reference: engine/orchestrator.go:70-131), at-most-once: a crashed
batch is simply lost (engine/storage.go:95-98). The graft upgrades this
to exactly-once over snapshot-committed tables (SURVEY.md §2.5 G6/G7):

- input is the `pages` table; each run processes the snapshot delta
  (ckpt, head] via an Iceberg-style incremental read;
- parse -> enrich -> route appends land in per-category sinks, each
  commit tagged with the input snapshot id it derives from;
- windowed aggregates are recomputed from the sinks and OVERWRITTEN
  (so they always reflect total table state);
- per-stage, per-partition lineage counters land in the `metrics`
  table (F.spark_partition_id());
- the checkpoint (last fully-committed input snapshot id) is published
  LAST via atomic rename. On resume, any sink/agg/metrics commits
  tagged with a snapshot id beyond the checkpoint are rolled back
  before reprocessing — so a run killed at ANY point re-runs to a
  byte-identical end state with no double-processing (tested).

At cluster scale the same protocol runs over real Iceberg: incremental
scan between snapshot ids, commit summaries as snapshot properties,
table rollback via ``rollback_to_snapshot``.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregate import windowed_counts
from ..operators.enrich import enrich_records
from ..operators.parse import parse_records
from ..operators.route import sink_name
from ..schemas import CATEGORIES
from ..sources.catalog import LocalCatalog

PAGES_TABLE = "pages"
METRICS_TABLE = "metrics"


class CheckpointLog:
    """Atomic checkpoint records: last fully-committed input snapshot."""

    def __init__(self, warehouse: str):
        self.dir = os.path.join(warehouse, "_checkpoints")
        os.makedirs(self.dir, exist_ok=True)

    def last(self) -> int | None:
        entries = sorted(f for f in os.listdir(self.dir) if f.endswith(".json"))
        if not entries:
            return None
        with open(os.path.join(self.dir, entries[-1])) as f:
            return json.load(f)["input_snapshot_id"]

    def commit(self, input_snapshot_id: int, run_id: str) -> None:
        seq = len([f for f in os.listdir(self.dir) if f.endswith(".json")]) + 1
        tmp = os.path.join(self.dir, f".tmp-{uuid.uuid4().hex}")
        final = os.path.join(self.dir, f"ckpt-{seq:08d}.json")
        with open(tmp, "w") as f:
            json.dump({"input_snapshot_id": input_snapshot_id, "run_id": run_id}, f)
        os.rename(tmp, final)


@dataclass
class RunReport:
    run_id: str
    input_snapshot_id: int | None
    rows_in: int
    rows_routed: dict
    resumed_rollbacks: int


def _lineage_counts(df: DataFrame, run_id: str, stage: str, snap: int) -> DataFrame:
    """Per-partition lineage counters for the metrics table (G6)."""
    return (
        df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("rows_out"))
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            F.col("partition_id").cast("int"),
            F.lit(None).cast("long").alias("rows_in"),
            F.col("rows_out").cast("long"),
            F.lit(snap).cast("long").alias("input_snapshot_id"),
            F.current_timestamp().alias("committed_at"),
        )
    )


def _rollback_beyond(cat: LocalCatalog, table: str, ckpt: int | None) -> int:
    """Roll a table back past any commits tagged with an un-checkpointed
    input snapshot id. Returns number of rolled-back commits."""
    head = cat.last_snapshot_id(table)
    if head is None:
        return 0
    rolled = 0
    sid = head
    while sid is not None and sid >= 1:
        summary = cat.snapshot_summary(table, sid)
        tagged = summary.get("input_snapshot_id")
        if tagged is None or (ckpt is not None and tagged <= ckpt):
            break
        rolled += 1
        sid -= 1
    if rolled:
        if sid is None or sid < 1:
            cat.drop(table)
        else:
            cat.rollback(table, sid)
    return rolled


class Pipeline:
    """Incremental parse->enrich->route->aggregate over the pages table."""

    def __init__(self, spark: SparkSession, catalog: LocalCatalog,
                 parse_impl: str = "arrow", use_html: bool = True):
        self.spark = spark
        self.cat = catalog
        self.ckpts = CheckpointLog(catalog.warehouse)
        self.parse_impl = parse_impl
        self.use_html = use_html

    # -- ingestion helper (test/bench entry) ----------------------------
    def ingest_pages(self, pages: DataFrame) -> int:
        return self.cat.append(pages, PAGES_TABLE)

    def set_dims(self, dim_lang: DataFrame, dim_severity: DataFrame) -> None:
        self.cat.overwrite(dim_lang, "dim_lang")
        self.cat.overwrite(dim_severity, "dim_severity")

    # -- one incremental run --------------------------------------------
    def run(self, run_id: str | None = None, fail_after_stage: str | None = None) -> RunReport:
        """Process the pages delta since the last checkpoint.

        ``fail_after_stage`` ('route' | 'aggregate' | 'metrics') injects
        a crash for resume testing.
        """
        run_id = run_id or uuid.uuid4().hex[:12]
        ckpt = self.ckpts.last()

        # resume protocol: drop any un-checkpointed commits
        rolled = 0
        for c in CATEGORIES:
            rolled += _rollback_beyond(self.cat, sink_name(c), ckpt)
            rolled += _rollback_beyond(self.cat, f"agg_{c}", ckpt)
        rolled += _rollback_beyond(self.cat, METRICS_TABLE, ckpt)

        head = self.cat.last_snapshot_id(PAGES_TABLE)
        delta = self.cat.read_incremental(self.spark, PAGES_TABLE, ckpt)
        if delta is None:
            return RunReport(run_id, ckpt, 0, {}, rolled)

        tag = {"input_snapshot_id": head, "run_id": run_id}

        records = parse_records(delta, impl=self.parse_impl, use_html=self.use_html)
        if self.cat.exists("dim_lang"):
            records = enrich_records(
                records,
                self.cat.read(self.spark, "dim_lang"),
                self.cat.read(self.spark, "dim_severity"),
            )
        records = records.persist()
        rows_in = delta.count()
        routed: dict[str, int] = {}
        metrics_parts = [_lineage_counts(records, run_id, "parse", head)]
        for c in CATEGORIES:
            part = records.filter(F.col("category") == c)
            self.cat.append(part, sink_name(c), summary=dict(tag, category=c))
            routed[c] = part.count()
            metrics_parts.append(
                _lineage_counts(part, run_id, f"route_{c}", head)
            )
        if fail_after_stage == "route":
            records.unpersist()
            raise RuntimeError("injected failure after route")

        # aggregates reflect TOTAL sink state -> overwrite (idempotent)
        for c in CATEGORIES:
            sink = self.cat.read(self.spark, sink_name(c))
            agg = windowed_counts(sink)
            self.cat.overwrite(agg, f"agg_{c}", summary=dict(tag))
        if fail_after_stage == "aggregate":
            records.unpersist()
            raise RuntimeError("injected failure after aggregate")

        metrics = metrics_parts[0]
        for m in metrics_parts[1:]:
            metrics = metrics.unionByName(m)
        self.cat.append(metrics, METRICS_TABLE, summary=dict(tag))
        if fail_after_stage == "metrics":
            records.unpersist()
            raise RuntimeError("injected failure after metrics")

        # the commit point: everything above becomes durable at once
        self.ckpts.commit(head, run_id)
        records.unpersist()
        return RunReport(run_id, head, rows_in, routed, rolled)
