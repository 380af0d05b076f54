"""Streaming exact dedup: keep the first arrival of each content hash.

The batch ``operators.dedup.exact_dedup`` collapses a static corpus;
an ingest pipeline needs the same cut ON THE STREAM — emit a document
iff its content hash has not been seen before, with bounded state. The
Spark primitive is ``dropDuplicatesWithinWatermark``: state is one
entry per distinct hash, expired once the event-time watermark passes
the entry's timestamp + the watermark delay, so state size tracks the
distinct-hash arrival rate within the horizon instead of growing
unboundedly (plain ``dropDuplicates`` on a stream never expires —
a 10^12-doc crawl would accumulate 10^12 state rows).

Semantics: duplicates arriving within the watermark horizon of the
first copy are dropped; a duplicate arriving after the horizon is
emitted again (the standard streaming-dedup trade — horizon-bounded
exactness; the batch operator is the unbounded twin, and a periodic
batch exact_dedup over the sink closes the gap, which is how real
pipelines compose the two).

Scale shape: ONE shuffle keyed by content hash (uniform 128-bit key),
RocksDB-backed state store on a real cluster; a hot boilerplate page
is exactly one state row regardless of how many copies arrive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logzilla_spark.operators.dedup import normalize_text

DEFAULT_DEDUP_HORIZON = "1 hour"


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    time_col: str = "ts",
    horizon: str = DEFAULT_DEDUP_HORIZON,
    hash_col: str | None = None,
) -> DataFrame:
    """First-arrival-wins exact dedup over a streaming DataFrame.

    Adds ``content_hash`` (md5 of the normalized text — the batch
    exact_dedup's key, so the two compose) and drops rows whose hash
    was already seen within ``horizon`` of event time. Passes every
    input column through plus the hash. A caller that already computed
    the hash (streaming_curate normalizes the text anyway for its
    gates) passes ``hash_col`` to skip the second normalize+md5 pass —
    the filter and this projection are separate operators, so Catalyst
    cannot CSE the regex across them.
    """
    if hash_col is None:
        docs = docs.withColumn("content_hash", F.md5(normalize_text(text_col)))
    elif hash_col != "content_hash":
        docs = docs.withColumnRenamed(hash_col, "content_hash")
    hashed = docs.withWatermark(time_col, horizon)
    return hashed.dropDuplicatesWithinWatermark(["content_hash"])
