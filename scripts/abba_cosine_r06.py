#!/usr/bin/env python
"""ABBA probe: embedding_neardup_pairs — array element_at unroll (old)
vs per-row scalarized components (new). Same pinned-order arithmetic,
same bits; the question was per-pair accessor cost over 200M pairs.

OUTCOME (r6, recorded in OPTIMIZATION_r06.md): REJECTED — the
scalarized variant OOMs the 16g driver during analysis/codegen before
a single task runs (a nested-loop join condition referencing 128
scalar columns plus the projection copy is hostile to Catalyst's
transform passes), with or without the width-guarded fold fallback.
The array-unrolled form in dedup.embedding_neardup_pairs stands."""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", os.path.join(REPO, ".cache/sfdir/sf1x"))

from pyspark.sql import functions as F  # noqa: E402


def build(emb, shape: str):
    from logzilla_spark.operators import dedup

    dim = dedup.EMB_UNROLL_DIM
    th = dedup.COSINE_THRESHOLD
    n_parts = emb.sparkSession.sparkContext.defaultParallelism
    if shape == "old":
        return dedup.embedding_neardup_pairs(emb)
    # new: scalarize components once per row; fall back to the fold
    # form when either side is not exactly dim-wide (bit parity with
    # dot_expr's guard)
    comps = [
        F.expr(f"cast(element_at(_e, {i}) as double)").alias(f"_c{i}")
        for i in range(1, dim + 1)
    ]
    base = (
        emb.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("_e"))
        .withColumn("_ok", F.expr(f"size(_e) = {dim}"))
        .select("vid", "_e", "_ok", *comps)
        .withColumn("_d2", F.expr(dedup.dot_expr("_e", "_e")))
    )
    a = base.select(
        F.col("vid").alias("vec_a"), F.col("_e").alias("_ea"),
        F.col("_ok").alias("_oka"), F.col("_d2").alias("_da"),
        *[F.col(f"_c{i}").alias(f"_a{i}") for i in range(1, dim + 1)],
    ).repartition(n_parts)
    b = base.select(
        F.col("vid").alias("vec_b"), F.col("_e").alias("_eb"),
        F.col("_ok").alias("_okb"), F.col("_d2").alias("_db"),
        *[F.col(f"_c{i}").alias(f"_b{i}") for i in range(1, dim + 1)],
    )
    # probe-only: no fold fallback (corpus is known 64-wide) — this
    # measures the UPPER BOUND of the scalarization win; a production
    # version would need the width-guarded fallback for bit parity on
    # arbitrary inputs
    terms = " + ".join(f"_a{i} * _b{i}" for i in range(1, dim + 1))
    dot = f"(cast(0 as double) + {terms})"
    cos = f"try_divide({dot}, sqrt(_da * _db))"
    return (
        a.join(
            F.broadcast(b),
            (F.col("vec_a") < F.col("vec_b")) & (F.expr(cos) >= F.lit(th)),
        )
        .withColumn("cosine", F.expr(cos))
        .select("vec_a", "vec_b", "cosine")
    )


def main() -> None:
    from logzilla_spark.session import get_spark

    shapes = sys.argv[1:] or ["old", "new"]
    spark = get_spark(cores=32, app_name="abba_cosine")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    times: dict[str, list[float]] = {s: [] for s in shapes}
    rows: dict[str, int] = {}
    for s in shapes + shapes[::-1] + shapes:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"cosine pairs: {s}")
        t0 = time.perf_counter()
        rows[s] = build(emb, s).count()
        times[s].append(round(time.perf_counter() - t0, 2))
        print(f"{s}: {times[s][-1]}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"times": times, "rows": rows, "sf": SF_DIR}))


if __name__ == "__main__":
    main()
