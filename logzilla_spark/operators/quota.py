"""Per-key ingest quotas: Loki/ES-class tenant rate limiting, exact.

Every multi-tenant log engine caps what one tenant/source may ingest
per unit time (Loki ``ingestion_rate_mb`` + per-stream limits, ES
index throttling); the reference has no such guard — a single
runaway ``source`` floods the store. This operator is that guard as
an EXACT, deterministic batch rule: within each (key, window bucket),
the FIRST ``quota`` rows in (timestamp, id) order are within quota,
the rest are over — the same total order the search page and the
exactly-once sinks already rely on, so the admitted set is a pure
function of the data (replay-stable, oracle-hashable).

Never-drop contract (the parse-chain discipline): rows are TAGGED
``over_quota``, not removed — callers route the overflow to a
dead-letter sink (route.py) or drop it explicitly.

100 TB shape — the hot-tenant skew problem is the whole point: a
naive ``row_number() OVER (PARTITION BY key, bucket)`` sends a
runaway key-hour's entire volume to ONE reducer. Two phases bound it:

1. **Salted pre-rank**: rank rows per (salt, key, bucket), where
   salt = hash(id) mod ``N_SALTS`` — a DETERMINISTIC function of the
   row, so the split survives stage retries and branch recomputation
   (spark_partition_id would not: a retried upstream stage can assign
   rows to different partitions, and this operator's two output
   branches each re-evaluate the lineage). Rank > quota is over-quota
   immediately: the global first-``quota`` rows of a (key, bucket)
   include at most ``quota`` rows from any one salt (a superset
   argument — the TakeOrdered trick), so a row ranked past ``quota``
   within its salt can never be within the global quota. The exchange
   spreads every hot (key, bucket) across N_SALTS reducer groups —
   corpus-sized but skew-DIVIDED by construction.
2. **Global rank** over the survivors only: this (key, bucket)-keyed
   window — the one a hot tenant COULD skew — receives at most
   quota x N_SALTS rows per (key, bucket) regardless of how hot the
   key is; everything pre-marked bypasses it entirely (union of
   disjoint, deterministically-assigned tag sets).

Both phases are codegen window/filter operators; the DuckDB twin
implements the one-phase global rule directly (the pre-rank is
provably a no-op on the result — pinned by the differential test).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ingest_quota", "ingest_quota_sql", "quota_summary"]

_BUCKETS = {"minute": "1 minute", "hour": "1 hour", "day": "1 day"}

# pre-rank salt fan-out: the phase-2 bound is quota x N_SALTS rows
# per (key, bucket); 64 matches a wide executor's core count. Override
# per deployment with the conf below (e.g. 4 on a 4-core edge node —
# the correctness bound holds at ANY value >= 1) or per call via the
# ``n_salts`` parameter.
N_SALTS = 64
N_SALTS_CONF = "spark.logzilla.quota.nSalts"


def _resolve_salts(df: DataFrame, n_salts: int | None) -> int:
    if n_salts is None:
        n_salts = int(df.sparkSession.conf.get(N_SALTS_CONF, str(N_SALTS)))
    if isinstance(n_salts, bool) or not isinstance(n_salts, int) or n_salts < 1:
        raise ValueError("n_salts must be an integer >= 1")
    return n_salts


def _bucket(time_column: str, window: str) -> Column:
    if window not in _BUCKETS:
        raise ValueError(f"window must be one of {sorted(_BUCKETS)}")
    return F.date_trunc(window, F.col(time_column))


def ingest_quota(
    df: DataFrame,
    quota: int,
    key_col: str = "source",
    window: str = "hour",
    time_column: str = "timestamp",
    id_col: str = "id",
    spent: DataFrame | None = None,
    n_salts: int | None = None,
) -> DataFrame:
    """Tag every row with ``over_quota`` (non-null boolean).

    Within each (``key_col``, ``window`` bucket), rows ranked past
    ``quota`` in (``time_column``, ``id_col``) ascending order are
    over quota. Input columns pass through unchanged; one
    ``over_quota`` column is appended.

    ``spent`` (optional) charges this frame against budget that EARLIER
    runs already admitted for the same windows: a frame with columns
    ``(key string, bucket timestamp, n_admitted bigint)`` — the
    pipeline's committed per-(key, window) admission counts. A row of
    rank ``r`` is then over quota iff ``spent + r > quota``, so a
    window that spans N incremental runs admits ``quota`` rows TOTAL,
    not N x quota (earlier runs hold their budget — FIFO, the same
    semantics as the streaming quota's committed spend).

    ``n_salts`` overrides the pre-rank fan-out (default: the
    ``spark.logzilla.quota.nSalts`` conf, else N_SALTS) — the result
    is identical at any value (pinned by the differential tests); only
    the skew-division width changes.
    """
    if isinstance(quota, bool) or not isinstance(quota, int) or quota < 1:
        raise ValueError("quota must be an integer >= 1")
    b = _bucket(time_column, window).alias("_qb")
    order = [F.col(time_column).asc(), F.col(id_col).asc()]
    tagged = df.withColumn("_qb", b)

    # phase 1: salted pre-rank — the salt is a deterministic function
    # of the ROW (not of the physical partitioning), so the two output
    # branches and any stage retry recompute the identical split
    # (see module docstring). With prior spend the bound still holds:
    # the admission threshold quota - spent is <= quota, so local rank
    # past quota is over quota a fortiori.
    n_salts = _resolve_salts(df, n_salts)
    wl = Window.partitionBy(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)), key_col, "_qb"
    ).orderBy(*order)
    local = tagged.withColumn("_lr", F.row_number().over(wl))
    over_local = local.filter(F.col("_lr") > quota)
    cand = local.filter(F.col("_lr") <= quota)

    # phase 2: global rank over the bounded candidate set
    wg = Window.partitionBy(key_col, "_qb").orderBy(*order)
    ranked = cand.withColumn("_gr", F.row_number().over(wg))
    if spent is not None:
        # spend is metadata-scale (touched key-buckets), records are
        # corpus-scale: broadcast the small side
        spend = spent.groupBy(
            F.col("key").alias("_sk"), F.col("bucket").alias("_sb")
        ).agg(F.sum("n_admitted").cast("bigint").alias("_spent"))
        ranked = ranked.join(
            F.broadcast(spend),
            (F.col(key_col).cast("string") == F.col("_sk"))
            & (F.col("_qb") == F.col("_sb")),
            "left",
        ).withColumn("_spent", F.coalesce("_spent", F.lit(0)))
    else:
        ranked = ranked.withColumn("_spent", F.lit(0).cast("bigint"))
    out_cols = [*df.columns]
    within = ranked.select(
        *out_cols, (F.col("_spent") + F.col("_gr") > quota).alias("over_quota")
    )
    over = over_local.select(*out_cols, F.lit(True).alias("over_quota"))
    return within.unionByName(over)


def ingest_quota_sql(
    relation: str,
    quota: int,
    key_col: str = "source",
    window: str = "hour",
    time_column: str = '"timestamp"',
    id_col: str = "id",
) -> str:
    """DuckDB twin — the one-phase global rule (the operator's
    partition-local phase provably does not change the result)."""
    if window not in _BUCKETS:
        raise ValueError(f"window must be one of {sorted(_BUCKETS)}")
    return f"""SELECT * EXCLUDE (_gr), _gr > {int(quota)} AS over_quota
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY {key_col}, date_trunc('{window}', {time_column})
    ORDER BY {time_column}, {id_col}
  ) AS _gr
  FROM {relation}
)"""


def quota_summary(tagged: DataFrame, key_col: str = "source") -> DataFrame:
    """Per-key admitted/suppressed counts off the tagged frame — the
    operational view ("who is being limited right now")."""
    return tagged.groupBy(key_col).agg(
        F.sum(F.when(~F.col("over_quota"), 1).otherwise(0))
        .cast("bigint").alias("n_admitted"),
        F.sum(F.when(F.col("over_quota"), 1).otherwise(0))
        .cast("bigint").alias("n_over"),
    )
