"""Corpus drift report: distribution shift between two snapshots.

The monitoring primitive a continuously-crawled training corpus needs
(and the data-card sibling of textstats.corpus_report): compare THIS
crawl batch against the previous one along categorical dimensions —
language share, document-length octave, quality band, source — and
quantify the shift per key and per dimension, so a pipeline can gate
"publish this batch" on drift staying inside budget (the Evidently/
whylogs drift-monitor class, computed inside the engine instead of by
an external scanner).

Shape: ONE scan per snapshot — all dimensions explode out of a single
pass as (dim, key) pairs (the facets trick, operators/query.py
search_facets) into one count aggregation with map-side partials; the
corpus collapses to dim x key cells before any join.  Everything after
(full-outer key align, per-dim totals broadcast, smoothing, the
divergence terms) runs at cell scale — metadata, never corpus.

Cross-engine exactness (the module float rule): shares are
Laplace-smoothed integer ppm ``(1e6 * (n + 1)) div (total + K)`` — the
smoothing keeps both sides nonzero so a key present in only one
snapshot contributes a finite, large |llr| instead of an infinity.
Two statistics per key, both pure BIGINT (order-independent sums,
hash-portable):

- ``chi2_term = (p_a_ppm - p_b_ppm)^2 div p_b_ppm`` — the headline
  drift statistic (the chi-square/PSI family every drift monitor
  gates on), EXACT integer arithmetic given the ppm shares, monotone
  under growing shift; ``sum(chi2_term) / 1e6`` is the chi-square
  statistic in share units.
- ``llr_fp`` / ``kl_term`` — the signed direction (which way a key
  moved) and the KL(a||b) contribution, via fixed-point log2
  (``textstats._log2_fp`` semantics: exact msb + linear mantissa,
  identical bits on Spark/DuckDB/Python).  The mantissa interpolation
  carries up to 0.086 bits of error per log, so the summed KL is
  approximate (can even dip slightly negative when the true KL is
  near zero) — gate on chi2, read KL as a magnitude-scale report.

Bound: |llr_fp| < 20·2^16, p ≤ 1e6 → |kl_term|, chi2_term < 1.4e12;
a dimension needs > ~6,500 keys of maximal drift to overflow BIGINT
sums — categorical dims (languages, octaves, bands) are orders of
magnitude below that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import DSIR_FRAC_BITS

__all__ = ["corpus_drift", "corpus_drift_sql", "kl_bits"]

_FB = 1 << DSIR_FRAC_BITS


def _log2fp_expr(x: str) -> str:
    """Spark-SQL fixed-point log2 of a positive BIGINT expression
    (textstats.dsir_scores' exact form)."""
    m = f"(length(bin({x})) - 1)"
    return (
        f"(cast({m} as bigint) * {_FB}"
        f" + ({x} * {_FB}) div shiftleft(cast(1 as bigint), {m}) - {_FB})"
    )


def _log2fp_sql(x: str) -> str:
    """DuckDB twin of :func:`_log2fp_expr` (oracle_dataops' exact form)."""
    m = f"(length(printf('%b', {x})) - 1)"
    return (
        f"(CAST({m} AS BIGINT) * {_FB}"
        f" + ({x} * {_FB}) // (1::BIGINT << {m}) - {_FB})"
    )


def corpus_drift(
    a: DataFrame,
    b: DataFrame,
    dims: dict[str, Column],
) -> DataFrame:
    """Per-(dim, key) drift between snapshot ``a`` (current) and
    ``b`` (baseline).

    ``dims`` maps a dimension name to the Column computing its key on
    a snapshot row (cast to string; NULL keys are excluded — an
    unknown language is its own key only if the caller maps it).

    Output: ``dim, key, n_a, n_b`` (exact counts, 0 where absent),
    ``p_a_ppm, p_b_ppm`` (smoothed integer shares), ``chi2_term``
    (exact; ``sum per dim / 1e6`` is the chi-square drift statistic),
    ``llr_fp`` (fixed-point log2(p_a/p_b) — sign says which way the
    key moved), ``kl_term`` (``sum per dim`` through :func:`kl_bits`
    is the approximate KL(a||b) in bits — see module docstring).
    """
    if not dims:
        raise ValueError("at least one dimension is required")

    def counts(df: DataFrame, alias: str) -> DataFrame:
        pairs = F.array(
            *[
                F.struct(
                    F.lit(d).alias("dim"), c.cast("string").alias("key")
                )
                for d, c in dims.items()
            ]
        )
        return (
            df.select(F.explode(pairs).alias("p"))
            .where(F.col("p.key").isNotNull())
            .groupBy(F.col("p.dim").alias("dim"), F.col("p.key").alias("key"))
            .agg(F.count(F.lit(1)).alias(alias))
        )

    cells = (
        counts(a, "na").join(counts(b, "nb"), ["dim", "key"], "full_outer")
        .select(
            "dim", "key",
            F.coalesce("na", F.lit(0)).cast("bigint").alias("n_a"),
            F.coalesce("nb", F.lit(0)).cast("bigint").alias("n_b"),
        )
    )
    tot = cells.groupBy("dim").agg(
        F.sum("n_a").alias("ta"),
        F.sum("n_b").alias("tb"),
        F.count(F.lit(1)).alias("k"),
    )
    out = (
        cells.join(F.broadcast(tot), "dim")
        .withColumn("p_a_ppm", F.expr("(1000000 * (n_a + 1)) div (ta + k)"))
        .withColumn("p_b_ppm", F.expr("(1000000 * (n_b + 1)) div (tb + k)"))
        .withColumn(
            "chi2_term",
            F.expr(
                "((p_a_ppm - p_b_ppm) * (p_a_ppm - p_b_ppm)) div p_b_ppm"
            ),
        )
        .withColumn(
            "llr_fp",
            F.expr(f"{_log2fp_expr('p_a_ppm')} - {_log2fp_expr('p_b_ppm')}"),
        )
        .withColumn("kl_term", F.expr("p_a_ppm * llr_fp"))
    )
    return out.select(
        "dim", "key", "n_a", "n_b", "p_a_ppm", "p_b_ppm",
        "chi2_term", "llr_fp", "kl_term",
    )


def kl_bits(kl_term_sum: int) -> float:
    """Edge conversion of an exact per-dim ``sum(kl_term)`` to float
    bits of KL(a||b) — the only float, applied after all arithmetic."""
    return kl_term_sum / (1_000_000 * _FB)


def corpus_drift_sql(
    a_rel: str,
    b_rel: str,
    dims: dict[str, str],
) -> str:
    """DuckDB twin of :func:`corpus_drift` — ``dims`` maps dimension
    name to the key SQL expression; same smoothing, same fixed-point
    dag.  The per-snapshot pass is a UNION ALL of per-dim GROUP BYs
    (the twin shares results, not plan shape)."""
    if not dims:
        raise ValueError("at least one dimension is required")

    def side(rel: str) -> str:
        parts = [
            f"SELECT '{d}' AS dim, CAST({e} AS VARCHAR) AS key FROM {rel}"
            f" WHERE ({e}) IS NOT NULL"
            for d, e in dims.items()
        ]
        return (
            "SELECT dim, key, CAST(count(*) AS BIGINT) AS n FROM ("
            + " UNION ALL ".join(parts)
            + ") GROUP BY 1, 2"
        )

    la = _log2fp_sql("p_a_ppm")
    lb = _log2fp_sql("p_b_ppm")
    return f"""WITH ca AS ({side(a_rel)}),
cb AS ({side(b_rel)}),
cells AS (
  SELECT coalesce(ca.dim, cb.dim) AS dim, coalesce(ca.key, cb.key) AS key,
         CAST(coalesce(ca.n, 0) AS BIGINT) AS n_a,
         CAST(coalesce(cb.n, 0) AS BIGINT) AS n_b
  FROM ca FULL OUTER JOIN cb ON ca.dim = cb.dim AND ca.key = cb.key
),
tot AS (
  SELECT dim, sum(n_a) AS ta, sum(n_b) AS tb,
         CAST(count(*) AS BIGINT) AS k
  FROM cells GROUP BY 1
),
smoothed AS (
  -- DuckDB sum() widens to HUGEINT; cast back so printf('%b') and the
  -- BIGINT kl_term multiplication match Spark's types
  SELECT c.dim, c.key, c.n_a, c.n_b,
         CAST((1000000 * (c.n_a + 1)) // (t.ta + t.k) AS BIGINT) AS p_a_ppm,
         CAST((1000000 * (c.n_b + 1)) // (t.tb + t.k) AS BIGINT) AS p_b_ppm
  FROM cells c JOIN tot t ON c.dim = t.dim
)
SELECT dim, key, n_a, n_b, p_a_ppm, p_b_ppm,
       ((p_a_ppm - p_b_ppm) * (p_a_ppm - p_b_ppm)) // p_b_ppm AS chi2_term,
       {la} - {lb} AS llr_fp,
       p_a_ppm * ({la} - {lb}) AS kl_term
FROM smoothed"""
