#!/usr/bin/env python
"""ABBA probe: ngram_jaccard_pairs candidate-join/agg shapes.

Shapes:
  old         — current operator shape (sz on both join sides, first()
                carries through the 116M-group agg)
  slim        — b side narrow, agg = (count, min(za)), sound
                inter/za >= t prefilter, zb attached post-agg from a
                persisted index
  slim_hash   — slim + md5_long gram ids as the join/window key
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
    from logzilla_spark.functions.hashing import md5_long_expr
    from logzilla_spark.operators import dedup

    n = dedup.WORDGRAM_N
    t = dedup.MIN_WORDGRAM_JACCARD
    grams = (
        dedup._spread(docs)
        .filter(F.col("text").isNotNull())
        .select(F.col("doc_id").alias("id"), dedup.normalize_text("text").alias("_n"))
        .withColumn("_t", F.split("_n", " "))
        .select("id", F.expr(dedup._wordgrams_expr("_t", n)).alias("_g"))
    )
    ex = grams.select(
        "id",
        F.explode(
            F.arrays_zip(F.array_repeat(F.size("_g"), F.size("_g")), F.col("_g"))
        ).alias("z"),
    ).select("id", F.col("z")["0"].alias("sz"), F.col("z")["_g"].alias("gram"))
    if shape == "slim_hash":
        ex = ex.select("id", "sz", F.expr(md5_long_expr("gram")).alias("gram"))
    if shape == "old":
        w = Window.partitionBy("gram")
        exg = (
            ex.withColumn("_df", F.count(F.lit(1)).over(w))
            .filter(F.col("_df") <= dedup.MAX_GRAM_DF)
            .drop("_df")
        )
        a = exg.select(F.col("id").alias("doc_a"), F.col("sz").alias("_za"), "gram")
        b = exg.select(F.col("id").alias("doc_b"), F.col("sz").alias("_zb"), "gram")
        return (
            a.join(b, "gram")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(
                F.count(F.lit(1)).alias("inter_n"),
                F.first("_za").alias("_za"),
                F.first("_zb").alias("_zb"),
            )
            .withColumn("union_n", F.col("_za") + F.col("_zb") - F.col("inter_n"))
            .withColumn("jaccard", F.col("inter_n").cast("double") / F.col("union_n").cast("double"))
            .filter(F.col("jaccard") >= t)
            .select("doc_a", "doc_b", "inter_n", "union_n", "jaccard")
        )
    # slim variants
    exp = persist_tracked(ex)
    w = Window.partitionBy("gram")
    exg = (
        exp.withColumn("_df", F.count(F.lit(1)).over(w))
        .filter(F.col("_df") <= dedup.MAX_GRAM_DF)
        .drop("_df")
    )
    a = exg.select(F.col("id").alias("doc_a"), F.col("sz").alias("_za"), "gram")
    b = exg.select(F.col("id").alias("doc_b"), "gram")
    agg = (
        a.join(b, "gram")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter_n"), F.min("_za").alias("_za"))
        .filter(F.col("inter_n").cast("double") / F.col("_za") >= t)
    )
    sizes = exp.groupBy("id").agg(F.min("sz").alias("_zb")).select(
        F.col("id").alias("doc_b"), "_zb"
    )
    return (
        agg.join(sizes, "doc_b")
        .withColumn("union_n", F.col("_za") + F.col("_zb") - F.col("inter_n"))
        .withColumn("jaccard", F.col("inter_n").cast("double") / F.col("union_n").cast("double"))
        .filter(F.col("jaccard") >= t)
        .select("doc_a", "doc_b", "inter_n", "union_n", "jaccard")
    )


def main() -> None:
    from logzilla_spark.session import get_spark

    shapes = sys.argv[1:] or ["old", "slim", "slim_hash"]
    spark = get_spark(cores=32, app_name="abba_ngram")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    times: dict[str, list[float]] = {s: [] for s in shapes}
    rows: dict[str, int] = {}
    for s in shapes + shapes[::-1] + shapes:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(f"ngram pairs: {s}")
        t0 = time.perf_counter()
        rows[s] = build(docs, s).count()
        times[s].append(round(time.perf_counter() - t0, 2))
        print(f"{s}: {times[s][-1]}", file=sys.stderr)
    spark.stop()
    print(json.dumps({"times": times, "rows": rows, "sf": SF_DIR}))


if __name__ == "__main__":
    main()
