"""Long-soak composed stream (VERDICT r4 next-round #6): ONE
continuous stream maintains EVERY committed serving surface at once —
records + full-text postings, windowed aggregates, metric histograms,
value histograms, HLL registers, log templates, per-key quota, alert
ledger, recording rules and the near-dup registry — over >= 20
triggers, with the full maintenance cycle (compaction -> snapshot
expiry -> orphan cleanup) interleaved every 5 epochs, and at the end
every surface equals (or satisfies the committed invariants of) its
batch twin computed from the complete corpus in one shot.

This is the ``pieces exist, compose them'' test: each surface's
stream==batch differential already exists in its own module; this one
proves the whole live warehouse converges under CHURN — all sinks
sharing one catalog, maintenance rewriting files beneath them,
exactly-once bookkeeping surviving the snapshot expiry.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from logzilla_spark.operators.aggregate import windowed_counts
from logzilla_spark.operators.fulltext import full_text_search
from logzilla_spark.operators.metrics import extract_metrics
from logzilla_spark.operators.parse import explode_lines, parse_records
from logzilla_spark.operators.query import Query
from logzilla_spark.operators.range_query import range_query
from logzilla_spark.operators.sketches import hist_quantiles, hll_distinct
from logzilla_spark.operators.templates import mine_templates
from logzilla_spark.schemas import PAGES_SCHEMA
from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.streaming.alerts import AlertRule, alert_batch, evaluate_alerts
from logzilla_spark.streaming.fulltext import (
    RECORDS_TABLE,
    search_live,
    upsert_search_batch,
)
from logzilla_spark.streaming.histogram import (
    DEFAULT_QUANTILES as HIST_QUANTILES,
    DEFAULT_VALUE_EXPR as HIST_VALUE,
    read_hist_quantiles,
    upsert_hist_batch,
)
from logzilla_spark.streaming.maintenance import maintenance_cycle
from logzilla_spark.streaming.metrics import read_metric_series, upsert_metrics_batch
from logzilla_spark.streaming.neardup import (
    KEPT_TABLE,
    REGISTRY_TABLE,
    neardup_batch,
)
from logzilla_spark.streaming.quota import (
    COUNTS_TABLE as QUOTA_COUNTS,
    TAGGED_TABLE as QUOTA_TAGGED,
    quota_batch,
)
from logzilla_spark.streaming.recordings import (
    RecordingRule,
    read_recording,
    record_rule_window,
)
from logzilla_spark.streaming.sketch import (
    DEFAULT_VALUE_EXPR as HLL_VALUE,
    read_hll_distinct,
    upsert_hll_batch,
)
from logzilla_spark.streaming.stream_pipeline import stream_pages, upsert_agg_batch
from logzilla_spark.streaming.templates import read_templates, upsert_templates_batch
from logzilla_spark.testdata import ensure_pages

SF001 = "/root/testdata/sf0.001"
N_EPOCHS = 20
MAINT_EVERY = 5
QUOTA = 50
AGG_KEYS = ("category", "level")

RULES = [
    AlertRule("error_burst", min_count=3, level="ERROR"),
    AlertRule("unparsed_any", min_count=1, category="unparsed"),
]

REC_RULE = RecordingRule(
    name="soak_errs", q="level:ERROR", step=86400, agg="count_over_time",
    by=("level",),
)
REC_START, REC_END = datetime(2024, 1, 1), datetime(2024, 1, 9)


def _flat_metrics(records):
    return records.select(
        "timestamp", "source", F.col("metadata")["size"].alias("m_size")
    )


def _docs(records):
    return records.select(
        F.col("id").alias("doc_id"), F.col("message").alias("text")
    )


def _stage_epoch_files(spark, tmp_path, n_epochs, hold_back=0):
    """Split the sf0.001 pages corpus into ``n_epochs`` single-file
    parquet epochs. The first ``n_epochs - hold_back`` land in the
    watched dir; the rest are returned as (src, dst) moves for the
    caller to release later (the restart scenario)."""
    d = ensure_pages(SF001)
    pages = spark.read.parquet(f"{d}/pages.parquet")
    in_dir = str(tmp_path / "pages_in")
    os.makedirs(in_dir)
    held = []
    for i in range(n_epochs):
        part = pages.filter(F.pmod(F.xxhash64("url"), F.lit(n_epochs)) == i)
        tmp = str(tmp_path / f"tmp{i}")
        part.coalesce(1).write.parquet(tmp)
        src = os.path.join(
            tmp, [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        )
        # strictly-increasing mtimes pin the file source's trigger
        # order: same-millisecond listings tie and the epoch ORDER
        # becomes nondeterministic — which changes order-sensitive
        # surfaces (near-dup first-claim-wins, quota FIFO) between
        # otherwise-identical runs
        os.utime(src, (1_700_000_000 + i, 1_700_000_000 + i))
        dst = os.path.join(in_dir, f"e{i:03d}.parquet")
        if i < n_epochs - hold_back:
            shutil.move(src, dst)
        else:
            held.append((src, dst))
    return in_dir, held


def _make_epoch(cat, maint_every, maint_reports, epochs_seen):
    """The composed per-trigger sink: every committed surface + the
    interleaved maintenance cycle, shared by the soak and restart
    tests."""

    def _epoch(batch, batch_id: int) -> None:
        if batch.isEmpty():
            return
        s = batch.sparkSession
        epochs_seen.append(batch_id)
        records = parse_records(batch, impl="arrow").persist()
        try:
            # records + token-clustered postings (T27/T32)
            upsert_search_batch(s, cat, records, batch_id)
            # revised totals for THIS epoch's windows, computed over
            # the committed table (update-mode semantics without a
            # stateful query — deterministic for the diff below)
            all_rec = cat.read(s, RECORDS_TABLE)
            ewins = (
                windowed_counts(records, keys=AGG_KEYS)
                .select("window_start").distinct()
            )
            revised = windowed_counts(all_rec, keys=AGG_KEYS).join(
                ewins, "window_start"
            ).persist()
            try:
                upsert_agg_batch(s, cat, revised, batch_id)       # T53-adj
                alert_batch(cat, revised, batch_id, RULES)        # T47
            finally:
                revised.unpersist(blocking=False)
            upsert_hist_batch(s, cat, records, batch_id)          # T29
            upsert_hll_batch(s, cat, records, batch_id)           # T24
            upsert_templates_batch(
                s, cat, explode_lines(batch), batch_id
            )                                                     # T48
            upsert_metrics_batch(
                s, cat, _flat_metrics(records), batch_id, "m_size", "source"
            )                                                     # T53
            quota_batch(
                records, cat, "quota", batch_id, QUOTA,
                key_col="source", window="day",
            )                                                     # T78
            neardup_batch(_docs(records), cat, "nd", batch_id)    # T20
            record_rule_window(
                s, cat, cat.read(s, RECORDS_TABLE), REC_RULE,
                REC_START, REC_END,
            )                                                     # T59
        finally:
            records.unpersist(blocking=False)
        if (batch_id + 1) % maint_every == 0:
            maint_reports.append(
                maintenance_cycle(
                    s, cat, RECORDS_TABLE, min_files=2,
                    keep_last_snapshots=2, orphan_age_seconds=0.0,
                )
            )
            maint_reports.append(
                maintenance_cycle(
                    s, cat, "stream_agg", partition_by="agg_month",
                    min_files=2, keep_last_snapshots=2,
                    orphan_age_seconds=0.0,
                )
            )

    return _epoch


def _run_stream(spark, in_dir, ckpt_dir, epoch_fn, timeout=1200):
    q = (
        stream_pages(spark, in_dir, max_files_per_trigger=1)
        .writeStream.foreachBatch(epoch_fn)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=timeout)


def test_long_soak_all_surfaces_converge_under_maintenance(spark, tmp_path):
    in_dir, _ = _stage_epoch_files(spark, tmp_path, N_EPOCHS)
    wh = str(tmp_path / "wh")
    cat = LocalCatalog(wh)
    maint_reports: list[dict] = []
    epochs_seen: list[int] = []
    _run_stream(
        spark, in_dir, str(tmp_path / "ckpt"),
        _make_epoch(cat, MAINT_EVERY, maint_reports, epochs_seen),
    )

    assert len(epochs_seen) >= N_EPOCHS, epochs_seen
    assert len(maint_reports) >= 2 * (N_EPOCHS // MAINT_EVERY)
    assert any(r.get("compacted") for r in maint_reports), (
        "the soak never exercised compaction — fixture too coarse"
    )
    assert any(
        (r.get("snapshots") or {}).get("expired") for r in maint_reports
    )

    # ---- batch twins over the complete corpus, one shot --------------
    batch_pages = spark.read.schema(PAGES_SCHEMA).parquet(in_dir)
    batch_rec = parse_records(batch_pages, impl="arrow").persist()

    # records: exact id multiset
    got_ids = sorted(
        r.id for r in cat.read(spark, RECORDS_TABLE).select("id").collect()
    )
    want_ids = sorted(r.id for r in batch_rec.select("id").collect())
    assert got_ids == want_ids and got_ids

    # full-text serve from the committed postings == batch scan tier
    q_str = "disk svc3"
    got_ft = sorted(
        r.id for r in search_live(spark, cat, q_str).select("id").collect()
    )
    want_ft = sorted(
        r.id for r in full_text_search(batch_rec, q_str).select("id").collect()
    )
    assert got_ft == want_ft

    # windowed aggregates: exact counts per (window, category, level)
    got_agg = {
        (str(r.window_start), r.category, r.level): r.n
        for r in cat.read(spark, "stream_agg").collect()
    }
    want_agg = {
        (str(r.window_start), r.category, r.level): r.n
        for r in windowed_counts(batch_rec, keys=AGG_KEYS).collect()
    }
    assert got_agg == want_agg and got_agg

    # histograms: quantiles bit-equal to the batch sketch
    got_hist = sorted(map(tuple, read_hist_quantiles(spark, cat).collect()))
    want_hist = sorted(
        map(
            tuple,
            hist_quantiles(
                batch_rec, ["category"], HIST_VALUE, list(HIST_QUANTILES)
            ).collect(),
        )
    )
    assert got_hist == want_hist and got_hist

    # HLL distinct: estimate double bits equal to the batch sketch
    # (the streaming fold drops NULL values at ingest — same filter on
    # the twin, as in test_streaming_sketch)
    got_hll = sorted(map(tuple, read_hll_distinct(spark, cat).collect()))
    want_hll = sorted(
        map(
            tuple,
            hll_distinct(
                batch_rec.filter(F.expr(f"({HLL_VALUE}) IS NOT NULL")),
                ["category"],
                HLL_VALUE,
            ).collect(),
        )
    )
    assert got_hll == want_hll and got_hll

    # templates: exact counts per (template, arity)
    got_tpl = {
        (r["template"], r["n_tokens"]): r["n"]
        for r in read_templates(spark, cat).collect()
    }
    want_tpl = {
        (r["template"], r["n_tokens"]): r["n"]
        for r in mine_templates(explode_lines(batch_pages)).collect()
    }
    assert got_tpl == want_tpl and got_tpl

    # metric histograms: every cell exact (counts, sums, percentiles)
    got_met = {
        (r["key"], r["bucket"]): tuple(r)[2:]
        for r in read_metric_series(spark, cat).collect()
    }
    want_met = {
        (r["key"], r["bucket"]): tuple(r)[2:]
        for r in extract_metrics(_flat_metrics(batch_rec), "m_size", "source").collect()
    }
    assert got_met == want_met and got_met

    # alerts: fires-once ledger == batch evaluation keys (counts only
    # grow across epochs, so any mid-stream breach also breaches at
    # the end — set equality, not just subset)
    got_alerts = {
        (r.rule_name, str(r.window_start), r.category, r.level)
        for r in cat.read(spark, "stream_alerts").collect()
    }
    want_alerts = {
        (r.rule_name, str(r.window_start), r.category, r.level)
        for r in evaluate_alerts(
            windowed_counts(batch_rec, keys=AGG_KEYS), RULES
        ).collect()
    }
    assert got_alerts == want_alerts and got_alerts

    # quota: never-drop, committed ledger consistent, per-(key, day)
    # admissions bounded by the quota across ALL epochs
    tagged = cat.read(spark, QUOTA_TAGGED)
    assert tagged.count() == len(want_ids)
    admitted = tagged.filter(~F.col("over_quota"))
    per_bucket = admitted.groupBy(
        "source", F.date_trunc("day", "timestamp").alias("b")
    ).count()
    assert per_bucket.filter(F.col("count") > QUOTA).count() == 0
    ledger_total = (
        cat.read(spark, QUOTA_COUNTS)
        .agg(F.sum("n_admitted").alias("s")).collect()[0].s
    )
    assert ledger_total == admitted.count()

    # near-dup: never-drop partition of the doc stream, and the
    # committed registry is exactly the kept docs' band claims
    kept_n = cat.read(spark, KEPT_TABLE).count()
    reg = cat.read(spark, REGISTRY_TABLE)
    assert 0 < kept_n <= len(want_ids)
    assert reg.select("id").distinct().count() == kept_n

    # recording rule: committed matrix == direct range query at the end
    got_rec = sorted(
        map(tuple, read_recording(spark, cat, REC_RULE.name).collect())
    )
    want_rec = sorted(
        map(
            tuple,
            range_query(
                batch_rec,
                Query(start=REC_START, end=REC_END, node=REC_RULE.node),
                agg="count_over_time", step=86400, by=["level"],
            ).collect(),
        )
    )
    assert got_rec == want_rec and got_rec

    batch_rec.unpersist(blocking=False)


def _surface_state(spark, cat):
    """Canonical committed-surface state for warehouse equality."""
    out = {}
    out["records"] = sorted(
        r.id for r in cat.read(spark, RECORDS_TABLE).select("id").collect()
    )
    out["agg"] = sorted(
        (str(r.window_start), r.category, r.level, r.n)
        for r in cat.read(spark, "stream_agg").collect()
    )
    out["alerts"] = sorted(
        (r.rule_name, str(r.window_start), r.category, r.level)
        for r in cat.read(spark, "stream_alerts").collect()
    )
    out["kept"] = sorted(
        r.doc_id for r in cat.read(spark, KEPT_TABLE).collect()
    )
    out["quota_admitted"] = sorted(
        r.id
        for r in cat.read(spark, QUOTA_TAGGED)
        .filter(~F.col("over_quota")).select("id").collect()
    )
    out["hist"] = sorted(map(tuple, read_hist_quantiles(spark, cat).collect()))
    out["templates"] = sorted(
        (r["template"], r["n_tokens"], r["n"])
        for r in read_templates(spark, cat).collect()
    )
    out["recording"] = sorted(
        map(tuple, read_recording(spark, cat, REC_RULE.name).collect())
    )
    return out


def test_soak_restart_from_checkpoint_converges(spark, tmp_path):
    """Kill the composed stream mid-soak and RESTART it from its
    checkpoint: the interrupted warehouse must end byte-equal (per
    surface) to an uninterrupted twin over the same epochs — the
    exactly-once capstone across ALL committed surfaces at once.

    The restart continues batch ids from the checkpoint, and every
    surface's committed map refuses anything at-or-below its high
    water mark, so the two halves stitch with no gap and no double
    count even though maintenance ran between them."""
    n = 8
    # interrupted run: epochs 0-3 visible, 4-7 held back
    in_dir, held = _stage_epoch_files(spark, tmp_path, n, hold_back=4)
    wh = str(tmp_path / "wh")
    cat = LocalCatalog(wh)
    reports: list[dict] = []
    seen: list[int] = []
    epoch_fn = _make_epoch(cat, 3, reports, seen)
    ckpt = str(tmp_path / "ckpt")
    _run_stream(spark, in_dir, ckpt, epoch_fn, timeout=600)
    assert len(seen) == 4
    mid_records = cat.read(spark, RECORDS_TABLE).count()
    # ...the "crash": the query object is gone; release the rest of
    # the input and restart against the SAME checkpoint + warehouse
    import shutil as _sh

    for src, dst in held:
        _sh.move(src, dst)
    _run_stream(spark, in_dir, ckpt, epoch_fn, timeout=600)
    assert len(seen) == 8 and sorted(seen) == list(range(8)), seen
    assert cat.read(spark, RECORDS_TABLE).count() > mid_records

    # uninterrupted twin: identical epoch files, one continuous run
    twin_dir = str(tmp_path / "twin_in")
    os.makedirs(twin_dir)
    for f in sorted(os.listdir(in_dir)):
        dst = os.path.join(twin_dir, f)
        _sh.copy(os.path.join(in_dir, f), dst)
        st = os.stat(os.path.join(in_dir, f))
        os.utime(dst, (st.st_mtime, st.st_mtime))  # keep the epoch order
    cat2 = LocalCatalog(str(tmp_path / "wh_twin"))
    _run_stream(
        spark, twin_dir, str(tmp_path / "ckpt_twin"),
        _make_epoch(cat2, 3, [], []), timeout=600,
    )

    got = _surface_state(spark, cat)
    want = _surface_state(spark, cat2)
    for k in want:
        assert got[k] == want[k], f"surface {k} diverged after restart"
    assert got["records"] and got["agg"]
