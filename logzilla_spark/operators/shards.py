"""Deterministic global shuffle + shard placement for training output.

The last step of every LLM training-data pipeline (Dolma, RedPajama,
Megatron preprocessing): curated/packed examples must reach the
trainer in a pseudo-random order DECORRELATED from crawl order — a
corpus read url-by-url or month-by-month feeds the model long runs of
near-identical distribution, which measurably hurts training — and
split into N shard files the data loader can stream.

Spark-first shape, and why there is no global sort problem:

- The shuffle key is ``md5_long(seed || id)`` — a pure function of
  (id, seed), so the permutation is reproducible bit-for-bit across
  runs, partitionings, and engines (no ``rand()``; a re-run after a
  failure MUST place every example identically or the lineage story
  collapses).  Changing the seed is a fresh permutation.
- Shard assignment is ``pmod(key, n_shards)`` — balanced in
  expectation with binomial deviation O(sqrt(n/N)), i.e. ±0.1% at a
  billion rows over 1024 shards.  No global row_number (that is a
  single-reducer total order — the one thing a 100 TB shuffle must
  never do).
- Within-shard position is a window partitioned by shard, ordered by
  (key, id) — parallelism = n_shards, per-shard state is a spillable
  sort, the same explicit trade as textstats.pack_sequences' packing
  streams.  (key, id): md5 collisions are ~n²/2^60 — a billion rows
  expect ~0.001 of them — but the tie-break makes determinism
  unconditional rather than probabilistic.
- The writer is one repartition on the shard column + a within-
  partition sort + ``partitionBy("shard")`` — one shuffle total, and
  the output directory layout IS the shard layout a loader consumes.

Cross-engine: md5_long and pmod are the repo's standard shared-hash
currency (functions/hashing.py), so the full manifest — key, shard,
position — is reproduced exactly by the DuckDB twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from logzilla_spark.functions.hashing import md5_long, md5_long_sql

__all__ = ["shard_manifest", "shard_manifest_sql", "write_shards"]

DEFAULT_SHARDS = 1024


def shard_manifest(
    df: DataFrame,
    n_shards: int = DEFAULT_SHARDS,
    seed: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic shuffle placement for every row: ``id, skey,
    shard, pos`` — row ``id`` is the ``pos``-th example of shard
    ``shard`` (0-based), in the pseudo-random within-shard order.

    A pure function of (ids, n_shards, seed): independent of input
    partitioning and row order, reproducible across runs and engines.
    NULL ids are a caller bug and excluded (an example with no
    identity cannot be placed reproducibly).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    keyed = (
        df.filter(F.col(id_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            md5_long(
                F.concat(F.lit(seed), F.lit("|"), F.col(id_col).cast("string"))
            ).alias("skey"),
        )
        .select(
            "id", "skey",
            F.pmod("skey", F.lit(int(n_shards))).cast("int").alias("shard"),
        )
    )
    w = Window.partitionBy("shard").orderBy("skey", "id")
    return keyed.select(
        "id", "skey", "shard",
        (F.row_number().over(w) - 1).cast("bigint").alias("pos"),
    )


def shard_manifest_sql(
    relation: str,
    n_shards: int = DEFAULT_SHARDS,
    seed: str = "",
    id_expr: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`shard_manifest` — same hash, same mod,
    same (skey, id) order."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    s = seed.replace("'", "''")
    h = md5_long_sql(f"'{s}' || '|' || CAST({id_expr} AS VARCHAR)")
    return f"""
SELECT id, skey, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY skey, id) - 1
            AS BIGINT) AS pos
FROM (
  SELECT {id_expr} AS id, {h} AS skey,
         CAST({h} % {int(n_shards)} AS INT) AS shard
  FROM {relation}
  WHERE {id_expr} IS NOT NULL
)"""


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int = DEFAULT_SHARDS,
    seed: str = "",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the shuffled corpus: ``path/shard=K/`` holds shard
    K's rows (all payload columns + ``skey``/``pos``), physically
    sorted in the within-shard shuffle order, so a loader streaming a
    shard file reads examples in the deterministic pseudo-random
    sequence.

    ONE wide shuffle (repartition on the shard column) + an in-
    partition sort + a partitioned parquet write — the directory
    layout is the shard layout.  ``repartition(n, shard)`` hash-maps
    shards onto n tasks: every shard lands wholly in one task (so one
    sorted run), a task may carry a few shards (parquet's partitionBy
    splits them back into their own directories).  Returns the
    per-shard manifest summary (shard, n_rows, min/max pos) read back
    from the WRITTEN files — the post-write audit a pipeline records.
    """
    m = shard_manifest(df, n_shards, seed, id_col)
    out = (
        df.filter(F.col(id_col).isNotNull())
        .join(m, df[id_col] == m["id"], "inner")
        .drop("id")
        .repartition(min(int(n_shards), 200), "shard")
        .sortWithinPartitions("shard", "pos")
    )
    out.write.mode("overwrite").partitionBy("shard").parquet(path)
    back = df.sparkSession.read.parquet(path)
    return (
        back.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("pos").alias("min_pos"),
            F.max("pos").alias("max_pos"),
        )
    )
