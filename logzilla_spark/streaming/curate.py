"""Streaming curation: the batch quality gates applied ON THE STREAM.

An ingest pipeline wants to cut junk before it ever lands: the
language and quality gates are PURE PROJECTIONS (one narrow expression
over each row — textstats' `_with_lang_pred` / `_with_quality`
builders, shared with the batch operators so the two cannot drift),
which makes them trivially streaming-safe: no state, no watermark, no
output-mode constraints. Composing them with
``streaming.dedup.streaming_exact_dedup`` gives the standard streaming
curation shape — gate first (stateless, shrinks the stream), dedup
second (the only stateful stage, watermark-bounded).

The other batch gates (Gopher rules, C4 line filter, repetition
stats' line/token fractions) are the same projection class and slot
into the gate expression unchanged; the bigram-repetition signal and
the corpus-level dedups (line/ngram/minhash) are NOT streaming-safe as
row projections — they need cross-row state and stay batch-side (the
periodic-batch-compaction composition the dedup module documents).

Scale shape: the gates are whole-stage-codegen projections fused into
the micro-batch scan; the only shuffle/state is the dedup stage's
content-hash key (one state row per distinct hash in the horizon).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from logzilla_spark.operators.dedup import normalize_text
from logzilla_spark.operators.textstats import (
    FUNNEL_LANG,
    FUNNEL_MIN_QUALITY,
    _with_lang_pred,
    _with_quality,
)
from logzilla_spark.streaming.dedup import (
    DEFAULT_DEDUP_HORIZON,
    streaming_exact_dedup,
)

# columns streaming_curate ADDS to the stream — inputs may not use them
_RESERVED = ("pred_lang", "quality", "content_hash")


def streaming_curate(
    docs: DataFrame,
    text_col: str = "text",
    time_col: str = "ts",
    lang: str = FUNNEL_LANG,
    min_quality: float = FUNNEL_MIN_QUALITY,
    horizon: str = DEFAULT_DEDUP_HORIZON,
) -> DataFrame:
    """Gate a document stream (language + quality, the curation
    funnel's first two stages) and exact-dedup the survivors
    first-arrival-wins. Returns the input columns plus ``pred_lang``,
    ``quality`` and ``content_hash`` (those three names are reserved —
    an input using them raises rather than being silently replaced);
    rows failing a gate never reach the stateful stage.

    Input columns are SHIELDED from the gate computation: the builders
    create working columns (n_chars, n_words, hits_*, ...) that would
    otherwise overwrite same-named input columns (the project's own
    documents table carries ``n_chars``), so every non-text input
    column is renamed aside, the gates run, their working columns are
    dropped BY DERIVATION (whatever the builders added — a new builder
    column cannot silently leak into the sink schema), and the inputs
    are renamed back. The normalized text is hashed once, up front,
    and handed to the dedup stage via ``hash_col``.
    """
    clash = [c for c in docs.columns if c in _RESERVED]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with streaming_curate outputs "
            f"{_RESERVED}; rename them upstream"
        )
    shielded = {}
    tmp = docs
    for c in docs.columns:
        if c == text_col:
            continue
        safe = f"__in_{c}"
        shielded[safe] = c
        tmp = tmp.withColumnRenamed(c, safe)
    base = _with_quality(
        _with_lang_pred(
            tmp.withColumn("_n", normalize_text(text_col)).withColumn(
                "_t", F.split("_n", " ")
            )
        )
    )
    gate = (F.col("pred_lang") == lang) & (F.col("quality") >= min_quality)
    keep_cols = set(shielded) | {text_col, "pred_lang", "quality"}
    kept = (
        base.filter(F.coalesce(gate, F.lit(False)))
        .withColumn("content_hash", F.md5(F.col("_n")))
        .drop(*[c for c in base.columns if c not in keep_cols])
    )
    for safe, orig in shielded.items():
        kept = kept.withColumnRenamed(safe, orig)
    # time_col was shielded through the gates and renamed back above
    return streaming_exact_dedup(
        kept, text_col, time_col, horizon, hash_col="content_hash"
    )
