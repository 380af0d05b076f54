"""Streaming NEAR-duplicate suppression: micro-batch minhash-LSH
against a catalog-backed band registry.

``streaming.dedup`` removes EXACT re-crawls with one state row per
content hash; near-duplicates (boilerplate re-renders, lightly edited
recrawls) slip through it by construction. The batch near-dup stack
(minhash signatures -> banded LSH -> verify) needs cross-row state
over the whole seen corpus, which no per-row projection or
watermark-bounded state-store operator expresses — so this module
implements the documented composition (streaming/curate.py: corpus
dedups "stay batch-side") as a STREAM: foreachBatch runs the batch
band builders over each micro-batch and keeps a doc iff none of its
LSH band keys was claimed by a previously-kept doc, recording claims
in a snapshot-versioned catalog table instead of executor state.

Semantics (deterministic, differentially tested against a sequential
reference in tests/test_streaming_neardup.py):

- A doc is SUPPRESSED iff (a) any of its band keys (band_id,
  band_hash) exists in the registry — i.e. some earlier-trigger kept
  doc shares a full LSH band with it — or (b) a band it carries is
  contested within its own trigger and a lower-id doc carries it too.
- Kept docs register ALL their band keys; suppressed docs register
  NOTHING. Rule (b) is conservative: a doc can lose a contested band
  to a doc that was itself suppressed by the registry. Consequence of
  both: a later near-dup of a SUPPRESSED doc may be kept (its bands
  were never claimed). This is the streaming-dedup trade the exact
  operator documents — horizon-bounded (here: claim-bounded)
  exactness, closed by the periodic batch compaction
  (operators/dedup.py minhash_lsh_pairs + cluster.neardup_clusters
  over the kept sink), which real pipelines run anyway.
- One shared band is the LSH candidate criterion (est_sim >=
  LSH_ROWS matched positions), not a verified Jaccard: this operator
  is the streaming analog of the CANDIDATE stage, deliberately —
  verification needs both docs' shingle sets, and a registry of full
  shingle sets would carry the corpus, not a sketch. At the ingest
  edge, candidate-level suppression is the recall-biased choice
  (false-positive suppressions are re-admitted by nothing, but the
  batch compaction's verify stage governs the PERMANENT corpus).

Exactly-once: both sinks (kept docs, band registry) carry the
streaming layer's cumulative committed map (stream_pipeline.py) in
every snapshot summary; a replayed epoch skips a sink it already
committed. The registry READ is as-of the snapshot PRECEDING this
epoch's own commit — a replay that crashed between the two appends
would otherwise re-read its own claims and suppress the whole batch.
Single writer per registry table (the one streaming query), as for
every local-FS catalog table.

Scale shape (100 TB): per trigger — one band projection over the
micro-batch (the batch builders: normalize once, md5 once, no
Python), one left-semi shuffle join of batch bands against the
registry keyed by (band_id, band_hash) (uniform 8-byte keys; the
registry side prunes to those keys via predicate pushdown on the
parquet scan), one groupBy(band) min for within-trigger contention,
one metadata-cheap append per sink. Registry rows are 3 longs per
kept doc per band — a sketch of the corpus, not the corpus; on a real
deployment the registry is an Iceberg table bucketed by band_hash so
the per-trigger join co-locates without a registry-side shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from logzilla_spark.operators.dedup import _minhash_features, minhash_band_hashes
from logzilla_spark.sources.catalog import LocalCatalog
from logzilla_spark.streaming.stream_pipeline import (
    _already_committed,
    _summary_at_publish,
)

REGISTRY_TABLE = "neardup_band_registry"
KEPT_TABLE = "neardup_kept"


def _registry_before(
    cat: LocalCatalog, spark: SparkSession, query_id: str, batch_id: int
) -> DataFrame | None:
    """The band registry as of the snapshot BEFORE this epoch's own
    commit (None = empty). On the steady path this is the head; on a
    replayed epoch whose registry append already landed, it is the
    predecessor — reading the head there would join the batch against
    its own claims and suppress every row of the replay."""
    sid = cat.last_snapshot_id(REGISTRY_TABLE)
    if sid is None:
        return None
    s = cat.snapshot_summary(REGISTRY_TABLE, sid)
    if s.get("query_id") == query_id and int(s.get("batch_id", -1)) >= batch_id:
        sid -= 1
        if sid < 1:
            return None
    return cat.read(spark, REGISTRY_TABLE, sid)


def neardup_batch(
    batch: DataFrame,
    cat: LocalCatalog,
    query_id: str,
    batch_id: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict[str, int]:
    """Process one micro-batch: suppress near-dups, append survivors
    to ``KEPT_TABLE`` and their band claims to ``REGISTRY_TABLE``.
    Returns {"kept": n, "suppressed": n} (-1s for a fully replayed
    epoch). Deterministic in (batch rows, pre-epoch registry state),
    which is what makes the epoch replay-safe."""
    kept_done = _already_committed(cat, KEPT_TABLE, query_id, batch_id)
    reg_done = _already_committed(cat, REGISTRY_TABLE, query_id, batch_id)
    if kept_done and reg_done:
        return {"kept": -1, "suppressed": -1}
    if batch.isEmpty():
        # nothing to publish; replaying an empty epoch recomputes this
        # same nothing, so skipping the commit record is idempotent
        return {"kept": 0, "suppressed": 0}
    spark = batch.sparkSession
    # batch band rows: the BATCH builders (one lineage, no Python),
    # persisted for their three consumers within this epoch (registry
    # probe, contention agg, kept-claim projection) — plain persist
    # with a finally-unpersist, not the tracked registry: the lifetime
    # is exactly this function
    bands = minhash_band_hashes(
        _minhash_features(batch, id_col, text_col).select("id", "sig")
    ).persist()
    try:
        reg = _registry_before(cat, spark, query_id, batch_id)
        hit = (
            bands.join(
                reg.select("band_id", "band_hash"),
                ["band_id", "band_hash"],
                "left_semi",
            ).select("id").distinct()
            if reg is not None
            else None
        )
        # within-trigger contention: every contested band goes to its
        # minimum-id carrier (module docstring, rule b)
        win = bands.groupBy("band_id", "band_hash").agg(F.min("id").alias("_w"))
        lost = (
            bands.join(win, ["band_id", "band_hash"])
            .filter(F.col("id") != F.col("_w"))
            .select("id")
            .distinct()
        )
        dropped = lost if hit is None else lost.union(hit).distinct()
        kept = batch.join(
            dropped.select(F.col("id").alias(id_col)), id_col, "left_anti"
        )
        n_in = batch.count()
        if not kept_done:
            n_kept = kept.count()
            cat.append(
                kept, KEPT_TABLE,
                summary=_summary_at_publish(cat, KEPT_TABLE, query_id, batch_id),
            )
        else:
            n_kept = -1
        if not reg_done:
            claims = bands.join(
                kept.select(F.col(id_col).alias("id")), "id", "left_semi"
            )
            cat.append(
                claims, REGISTRY_TABLE,
                summary=_summary_at_publish(
                    cat, REGISTRY_TABLE, query_id, batch_id
                ),
            )
        return {"kept": n_kept, "suppressed": n_in - n_kept if n_kept >= 0 else -1}
    finally:
        bands.unpersist(blocking=False)


def start_neardup_stream(
    docs: DataFrame,
    warehouse: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = True,
) -> StreamingQuery:
    """Attach near-dup suppression to a streaming docs DataFrame:
    survivors land in ``KEPT_TABLE``, band claims in
    ``REGISTRY_TABLE`` (both under ``warehouse``).

    ``available_now=True`` drains what exists then stops (incremental
    batch cadence); ``False`` runs continuously at the ingest edge."""
    cat = LocalCatalog(warehouse)

    def _sink(batch: DataFrame, batch_id: int) -> None:
        neardup_batch(
            batch, cat, query_id="neardup", batch_id=batch_id,
            id_col=id_col, text_col=text_col,
        )

    writer = docs.writeStream.foreachBatch(_sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
