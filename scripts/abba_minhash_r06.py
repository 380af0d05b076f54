#!/usr/bin/env python
"""ABBA probe: old (single fat join + interpreted est) vs new (staged
narrow-then-heavy joins + unrolled est) minhash verify, one session,
alternating trials so host drift cancels (BENCH/BASELINE.md method).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", os.path.join(REPO, ".cache/sfdir/sf1x"))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402


def build(docs, shape: str):
    from logzilla_spark.functions.caching import persist_tracked
    from logzilla_spark.operators import dedup

    feat = persist_tracked(dedup._minhash_features(docs))
    bands = dedup.minhash_band_hashes(feat.select("id", "sig"))
    w = Window.partitionBy("band_id", "band_hash")
    bands = (
        bands.withColumn("_bn", F.count(F.lit(1)).over(w))
        .filter(F.col("_bn") <= dedup.MAX_LSH_BUCKET)
        .drop("_bn")
    )
    bands = persist_tracked(bands)
    bl = bands.select(F.col("band_id").alias("_bi"), F.col("band_hash").alias("_bh"), F.col("id").alias("doc_a"))
    br = bands.select(F.col("band_id").alias("_bi"), F.col("band_hash").alias("_bh"), F.col("id").alias("doc_b"))
    cand = (
        bl.join(br, ["_bi", "_bh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    fold_est = F.expr(
        "cast(size(filter(zip_with(_sa, _sb, (x, y) -> x = y), v -> v)) as double) "
        f"/ {dedup.N_MINHASH}.0"
    )
    if shape == "old":
        fa = feat.select(F.col("id").alias("doc_a"), F.col("sig").alias("_sa"), F.col("_sh").alias("_ga"))
        fb = feat.select(F.col("id").alias("doc_b"), F.col("sig").alias("_sb"), F.col("_sh").alias("_gb"))
        out = (
            cand.join(fa, "doc_a").join(fb, "doc_b")
            .withColumn("est_sim", fold_est)
            .filter(F.col("est_sim") >= dedup.MIN_EST_SIM)
        )
    elif shape == "old_unrolled":
        fa = feat.select(F.col("id").alias("doc_a"), F.col("sig").alias("_sa"), F.col("_sh").alias("_ga"))
        fb = feat.select(F.col("id").alias("doc_b"), F.col("sig").alias("_sb"), F.col("_sh").alias("_gb"))
        out = (
            cand.join(fa, "doc_a").join(fb, "doc_b")
            .withColumn("est_sim", F.expr(dedup._est_expr("_sa", "_sb")))
            .filter(F.col("est_sim") >= dedup.MIN_EST_SIM)
        )
    else:  # new
        sa = feat.select(F.col("id").alias("doc_a"), F.col("sig").alias("_sa"))
        sb = feat.select(F.col("id").alias("doc_b"), F.col("sig").alias("_sb"))
        ga = feat.select(F.col("id").alias("doc_a"), F.col("_sh").alias("_ga"))
        gb = feat.select(F.col("id").alias("doc_b"), F.col("_sh").alias("_gb"))
        out = (
            cand.join(sa, "doc_a").join(sb, "doc_b")
            .withColumn("est_sim", F.expr(dedup._est_expr("_sa", "_sb")))
            .filter(F.col("est_sim") >= dedup.MIN_EST_SIM)
            .select("doc_a", "doc_b", "est_sim")
            .join(ga, "doc_a").join(gb, "doc_b")
        )
    return (
        out.withColumn("inter_n", F.expr("size(array_intersect(_ga, _gb))"))
        .withColumn("union_n", F.expr("size(_ga) + size(_gb) - inter_n"))
        .withColumn("jaccard", F.col("inter_n").cast("double") / F.col("union_n").cast("double"))
        .filter(F.col("jaccard") >= dedup.MIN_JACCARD)
        .select("doc_a", "doc_b", "est_sim", "inter_n", "union_n", "jaccard")
    )


def main() -> None:
    from logzilla_spark.session import get_spark

    shapes = sys.argv[1:] or ["old", "new"]
    spark = get_spark(cores=32, app_name="abba_minhash")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    times: dict[str, list[float]] = {s: [] for s in shapes}
    rows: dict[str, int] = {}
    order = shapes + shapes[::-1] + shapes
    for s in order:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"minhash verify: {s}")
        t0 = time.perf_counter()
        rows[s] = build(docs, s).count()
        times[s].append(round(time.perf_counter() - t0, 2))
        print(f"{s}: {times[s][-1]}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"times": times, "rows": rows, "sf": SF_DIR}))


if __name__ == "__main__":
    main()
