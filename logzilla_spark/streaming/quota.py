"""Streaming ingest-quota enforcement: the T77 guard at the ingest
edge, with committed per-(key, window) admission counts.

The batch operator (operators/quota.py) ranks a COMPLETE frame; at the
ingest edge rows arrive over many micro-batches, so "first ``quota``
rows per key-window" must be evaluated against how much of each
window's budget earlier epochs already spent. That running spend is
CROSS-EPOCH state, kept — like streaming/neardup.py's band registry —
in a snapshot-versioned catalog table instead of executor memory:

- ``stream_quota_tagged`` — every input row, tagged ``over_quota``
  (the never-drop contract; route/drop downstream).
- ``stream_quota_counts`` — per-epoch DELTAS (key, bucket,
  n_admitted); the current spend is the groupBy-SUM of the deltas
  (rows = touched key-buckets per epoch — metadata-scale; squash with
  the maintenance cycle's compaction when epochs accumulate).

Admission rule per epoch: rank the batch's rows per (key, bucket) in
(timestamp, id) order — deterministic WITHIN the epoch — and admit
rank r iff ``spent + r <= quota``. Across epochs the order is arrival
order (FIFO, what a rate limiter means); within an epoch it is the
engine's canonical total order. Deterministic in (batch rows,
pre-epoch counts), which is what makes replays safe.

Exactly-once: BOTH sinks carry the cumulative committed map; the
counts read is as-of the snapshot PRECEDING this epoch's own commit
(a replay that crashed between the two appends would otherwise charge
the batch against its own spend and over-limit every row). A crash
between the appends heals on replay: the tagged append is refused,
the counts delta (recomputed identically from pre-epoch state) is
applied.

Skew: a micro-batch is trigger-sized, so the in-epoch (key, bucket)
window is bounded by the trigger, not the corpus — the batch
operator's two-phase bound is unnecessary here by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window
from pyspark.sql.streaming import StreamingQuery

from logzilla_spark.operators.quota import _bucket
from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.streaming.stream_pipeline import (
    _already_committed,
    _summary_at_publish,
)

TAGGED_TABLE = "stream_quota_tagged"
COUNTS_TABLE = "stream_quota_counts"


def _spent_before(
    cat: LocalCatalog, spark: SparkSession, query_id: str, batch_id: int
) -> DataFrame | None:
    """Per-(key, bucket) spend as of the snapshot BEFORE this epoch's
    own counts commit (None = nothing spent)."""
    sid = cat.last_snapshot_id(COUNTS_TABLE)
    if sid is None:
        return None
    s = cat.snapshot_summary(COUNTS_TABLE, sid)
    if s.get("query_id") == query_id and int(s.get("batch_id", -1)) >= batch_id:
        sid -= 1
        if sid < 1:
            return None
    return (
        cat.read(spark, COUNTS_TABLE, sid)
        .groupBy("key", "bucket")
        .agg(F.sum("n_admitted").cast("bigint").alias("_spent"))
    )


def quota_batch(
    batch: DataFrame,
    cat: LocalCatalog,
    query_id: str,
    batch_id: int,
    quota: int,
    key_col: str = "source",
    window: str = "hour",
    time_column: str = "timestamp",
    id_col: str = "id",
) -> dict[str, int]:
    """Process one micro-batch; returns {"admitted": n, "over": n}
    (-1s for a fully replayed epoch)."""
    if isinstance(quota, bool) or not isinstance(quota, int) or quota < 1:
        raise ValueError("quota must be an integer >= 1")
    tagged_done = _already_committed(cat, TAGGED_TABLE, query_id, batch_id)
    counts_done = _already_committed(cat, COUNTS_TABLE, query_id, batch_id)
    if tagged_done and counts_done:
        return {"admitted": -1, "over": -1}
    if batch.isEmpty():
        return {"admitted": 0, "over": 0}
    spark = batch.sparkSession

    b = batch.withColumn(
        "_qk", F.col(key_col).cast("string")
    ).withColumn("_qb", _bucket(time_column, window))
    w = Window.partitionBy("_qk", "_qb").orderBy(
        F.col(time_column).asc(), F.col(id_col).asc()
    )
    ranked = b.withColumn("_r", F.row_number().over(w))
    spent = _spent_before(cat, spark, query_id, batch_id)
    if spent is not None:
        ranked = ranked.join(
            spent.select(
                F.col("key").alias("_qk"), F.col("bucket").alias("_qb"),
                "_spent",
            ),
            ["_qk", "_qb"],
            "left",
        ).withColumn("_spent", F.coalesce("_spent", F.lit(0)))
    else:
        ranked = ranked.withColumn("_spent", F.lit(0))
    tagged = ranked.select(
        *batch.columns,
        (F.col("_spent") + F.col("_r") > quota).alias("over_quota"),
        F.col("_qk"), F.col("_qb"),
    ).persist()  # two consumers (tagged sink + counts delta), one epoch
    try:
        n_adm = tagged.filter(~F.col("over_quota")).count()
        n_over = tagged.filter(F.col("over_quota")).count()
        if not tagged_done:
            cat.append(
                tagged.select(*batch.columns, "over_quota"),
                TAGGED_TABLE,
                summary=_summary_at_publish(
                    cat, TAGGED_TABLE, query_id, batch_id
                ),
            )
        if not counts_done:
            delta = (
                tagged.filter(~F.col("over_quota"))
                .groupBy(F.col("_qk").alias("key"), F.col("_qb").alias("bucket"))
                .agg(F.count(F.lit(1)).cast("bigint").alias("n_admitted"))
            )
            cat.append(
                delta,
                COUNTS_TABLE,
                summary=_summary_at_publish(
                    cat, COUNTS_TABLE, query_id, batch_id
                ),
            )
        return {"admitted": n_adm, "over": n_over}
    finally:
        tagged.unpersist(blocking=False)


def start_quota_stream(
    records: DataFrame,
    warehouse: str,
    checkpoint_dir: str,
    quota: int,
    key_col: str = "source",
    window: str = "hour",
    available_now: bool = True,
) -> StreamingQuery:
    """Attach quota enforcement to a streaming records DataFrame:
    every row lands tagged in ``TAGGED_TABLE``, per-window spends
    accumulate in ``COUNTS_TABLE``."""
    cat = LocalCatalog(warehouse)

    def _sink(batch: DataFrame, batch_id: int) -> None:
        quota_batch(
            batch, cat, query_id="quota", batch_id=batch_id, quota=quota,
            key_col=key_col, window=window,
        )

    writer = records.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
