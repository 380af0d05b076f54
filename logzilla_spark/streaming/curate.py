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

_GATE_COLS = (
    ["_n", "_t", "pred_lang", "quality", "quality_band", "n_chars",
     "n_words", "avg_word_len", "stop_ratio", "digit_ratio"]
    + [f"hits_{lang}" for lang in ("en", "es", "de", "fr")]
)


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
    first-arrival-wins. Returns the input columns plus
    ``pred_lang``, ``quality`` and ``content_hash``; rows failing a
    gate never reach the stateful stage.
    """
    base = _with_quality(
        _with_lang_pred(
            docs.withColumn("_n", normalize_text(text_col)).withColumn(
                "_t", F.split("_n", " ")
            )
        )
    )
    gate = (F.col("pred_lang") == lang) & (F.col("quality") >= min_quality)
    kept = base.filter(F.coalesce(gate, F.lit(False))).drop(
        *[c for c in _GATE_COLS if c not in ("pred_lang", "quality")]
    )
    return streaming_exact_dedup(kept, text_col, time_col, horizon)
