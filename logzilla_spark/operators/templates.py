"""Log template mining: cluster raw lines into constant/variable patterns.

The classic log-analytics operator (Drain: He et al., ICWS '17; SLCT;
LogMine) the reference's search surface implies but never ships: given
the raw line stream, recover the small set of print-statement templates
("``10.5.0.35 - - [..] "POST /search HTTP/1.1" 200 4629``" -> "``<*> - -
<*> "POST /search HTTP/1.1" <*> <*>``") with per-template volume.  Every
real log engine pairs its hits page with this view — it is how an
operator triages an unfamiliar 100 TB corpus.

Spark-first shape: Drain's online parse tree exists to amortize
clustering across a single-node stream; on Spark the same fixed-depth
grouping key (token count + digit-masked token sequence — Drain's
preprocessing plus its first two tree levels) is a pure projection, so
the whole miner is ONE scan + ONE aggregation with map-side partial
aggregation, no state, no Python.  Masked templates are deterministic,
which is what makes the operator oracle-checkable (the stateful online
variants are order-dependent by construction).

100 TB: the projection is whole-stage-codegen'd (split / transform /
array_join are all built-ins); the shuffle carries (template, line)
pre-aggregated partial counts — bounded by the DISTINCT line set, not
corpus rows, and templates are by definition low-cardinality.  No
window, no skew exposure: a mega-template is still one group with
O(distinct-variant) state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "mine_templates",
    "mine_templates_sql",
    "template_delta",
    "template_delta_sql",
]

# A token is VARIABLE iff it contains an ASCII digit — Drain's
# preprocessing rule, kept ASCII-only so the Java and RE2 regex engines
# agree on every input (unicode digit classes differ between them).
_DIGIT_RE = "[0-9]"


def mine_templates(
    df: DataFrame,
    line_col: str = "line",
    mask: str = "<*>",
) -> DataFrame:
    """Mine digit-masked templates from raw log lines.

    Output: ``template`` (the masked line), ``n_tokens`` (Drain's
    length key, kept as an explicit column so same-text different-arity
    templates cannot merge), ``n`` (line volume), ``n_variants``
    (distinct raw lines behind the template — a template whose variant
    count equals its volume is a one-off, one with millions of lines
    over few variants is a hot loop), ``example`` (deterministic
    representative: the byte-wise minimum raw line).

    Empty lines group under the empty template rather than being
    dropped — the miner reports the stream it was given.
    """
    toks = F.split(F.col(line_col), " ", -1)  # literal-space, keep empties
    masked = F.transform(
        toks, lambda t: F.when(t.rlike(_DIGIT_RE), F.lit(mask)).otherwise(t)
    )
    return (
        df.select(
            F.array_join(masked, " ").alias("template"),
            F.size(toks).cast("bigint").alias("n_tokens"),
            F.col(line_col).alias("_line"),
        )
        .groupBy("template", "n_tokens")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("_line").alias("n_variants"),
            F.min("_line").alias("example"),
        )
    )


def template_delta(
    df: DataFrame,
    split_ts: str,
    ts_col: str = "warc_ts",
    line_col: str = "line",
    mask: str = "<*>",
) -> DataFrame:
    """Template volume delta between two time windows — "what changed".

    The triage view an operator actually opens after an incident: the
    same digit-masked templates as :func:`mine_templates`, but with the
    line volume split at ``split_ts`` into a baseline window (ts <
    split) and a current window (ts >= split), plus a classification:

    - ``new``      — template absent from the baseline,
    - ``vanished`` — template absent from the current window,
    - ``up``       — current volume at least doubled,
    - ``down``     — current volume at most halved,
    - ``steady``   — otherwise.

    ONE scan, ONE aggregation: the window split is a conditional
    aggregate on the same groupBy, not a self-join of two mined runs —
    at 100 TB that is one corpus pass instead of two plus a
    template-keyed shuffle join.  Classification is pure BIGINT
    comparison (no float thresholds); ``ratio`` is the single IEEE
    division n_cur/n_base (NULL for new templates), so every output
    column is bit-portable cross-engine.

    Window normalization is the caller's job: pass windows of equal
    duration (or treat ``ratio`` as a volume ratio, not a rate ratio).
    Rows with NULL ``ts_col`` count toward the baseline window (a
    timestampless line cannot be "current"); at the demo scale the
    lines shape's warc_ts is non-null by schema.
    """
    toks = F.split(F.col(line_col), " ", -1)
    masked = F.transform(
        toks, lambda t: F.when(t.rlike(_DIGIT_RE), F.lit(mask)).otherwise(t)
    )
    is_cur = F.col(ts_col) >= F.lit(split_ts).cast("timestamp")
    agg = (
        df.select(
            F.array_join(masked, " ").alias("template"),
            F.size(toks).cast("bigint").alias("n_tokens"),
            F.coalesce(is_cur, F.lit(False)).alias("_cur"),
        )
        .groupBy("template", "n_tokens")
        .agg(
            F.sum(F.when(~F.col("_cur"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_base"),
            F.sum(F.when(F.col("_cur"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_cur"),
        )
    )
    n_base, n_cur = F.col("n_base"), F.col("n_cur")
    return agg.select(
        "template",
        "n_tokens",
        "n_base",
        "n_cur",
        F.when(n_base > 0, n_cur.cast("double") / n_base.cast("double"))
        .alias("ratio"),
        F.when(n_base == 0, F.lit("new"))
        .when(n_cur == 0, F.lit("vanished"))
        .when(n_cur >= 2 * n_base, F.lit("up"))
        .when(2 * n_cur <= n_base, F.lit("down"))
        .otherwise(F.lit("steady"))
        .alias("status"),
    )


def template_delta_sql(
    lines_relation: str,
    split_ts: str,
    ts_col: str = "warc_ts",
    mask: str = "<*>",
) -> str:
    """DuckDB twin of :func:`template_delta` over a ``line`` column."""
    return f"""
SELECT template, n_tokens, n_base, n_cur,
       CASE WHEN n_base > 0
            THEN CAST(n_cur AS DOUBLE) / CAST(n_base AS DOUBLE) END AS ratio,
       CASE WHEN n_base = 0 THEN 'new'
            WHEN n_cur = 0 THEN 'vanished'
            WHEN n_cur >= 2 * n_base THEN 'up'
            WHEN 2 * n_cur <= n_base THEN 'down'
            ELSE 'steady' END AS status
FROM (
  SELECT array_to_string(mt, ' ') AS template,
         CAST(len(mt) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN NOT cur THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
         CAST(sum(CASE WHEN cur THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
  FROM (
    SELECT list_transform(string_split(line, ' '),
             t -> CASE WHEN regexp_matches(t, '{_DIGIT_RE}')
                       THEN '{mask}' ELSE t END) AS mt,
           coalesce({ts_col} >= TIMESTAMP '{split_ts}', FALSE) AS cur
    FROM {lines_relation}
  )
  GROUP BY 1, 2
)"""


def mine_templates_sql(lines_relation: str, mask: str = "<*>") -> str:
    """DuckDB twin of :func:`mine_templates` over a ``line`` column."""
    return f"""
SELECT array_to_string(mt, ' ') AS template,
       CAST(len(mt) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT line) AS BIGINT) AS n_variants,
       min(line) AS example
FROM (
  SELECT line,
         list_transform(string_split(line, ' '),
           t -> CASE WHEN regexp_matches(t, '{_DIGIT_RE}')
                     THEN '{mask}' ELSE t END) AS mt
  FROM {lines_relation}
)
GROUP BY 1, 2"""
