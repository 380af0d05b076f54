#!/usr/bin/env python
"""PQ-at-scale probe: do encode / ADC top-k / IVFxPQ stay linear?

Correctness lives in the DuckDB oracle (q_sim_topk_{pq,ivfpq}, sf0.01
and sf0.1); this probe answers the scale question — the sf0.1
embeddings table is only 2k vectors, far too small to see a plan break
— by synthesizing 1x / 50x / 500x corpora (2k / 100k / 1M vectors, dim
64) and timing pq_encode, pq_topk and pq_topk_ivf with a FIXED probe
set. Linear wall growth with corpus size = the plan the operators
promise (narrow explode, broadcast codebooks, map-side argmin, one
row/vector shuffles); superlinear growth would mean a hidden
corpus-squared stage.

Synthesis is deterministic (hash-perturbed replicas, new id ranges) so
runs are comparable. Writes BENCH/PQ_SCALE.md and prints one JSON line.

Usage: python scripts/pq_scale_probe.py [--max-mult 500]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from logzilla_spark.operators import similarity as S  # noqa: E402
from logzilla_spark.session import get_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CACHE = os.path.join(REPO, ".cache", "pq_scale")
MULTS = (1, 50, 500)
TRIALS = 2


def synth(spark, mult: int) -> str:
    out = os.path.join(CACHE, f"emb_x{mult}")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    if mult == 1:
        emb.write.mode("overwrite").parquet(out)
        return out
    # replica k of vector v: new id = v + k*10M; every component gets a
    # (v, k, i)-specific deterministic nudge so replicas are spread in
    # space, not stacked into degenerate duplicate cells
    reps = emb.select(
        "vec_id", "embedding", "label",
        F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("k"),
    )
    nudged = (
        "transform(embedding, (v, i) -> cast(v + "
        "((vec_id * 31 + k * 17 + i * 7) % 13 - 6) * 0.02 as float))"
    )
    reps.select(
        (
            F.col("vec_id") + F.col("k").cast("long") * F.lit(10_000_000)
        ).alias("vec_id"),
        F.when(F.col("k") == 0, F.col("embedding"))
        .otherwise(F.expr(nudged))
        .alias("embedding"),
        "label",
    ).repartition(32).write.mode("overwrite").parquet(out)
    return out


def main() -> None:
    max_mult = 500
    if "--max-mult" in sys.argv:
        max_mult = int(sys.argv[sys.argv.index("--max-mult") + 1])
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    probes_src = spark.read.parquet(f"{SRC}/embeddings.parquet").filter(
        "vec_id % 100 = 0"
    ).persist()
    n_probes = probes_src.count()

    results = []
    for mult in [m for m in MULTS if m <= max_mult]:
        path = synth(spark, mult)
        emb = spark.read.parquet(path)
        n = emb.count()
        row = {"mult": mult, "n_vectors": n}
        cb = S.pq_codebooks_seeded(emb)

        def run(name, df_fn, agg_col):
            best = float("inf")
            out_n = 0
            for _ in range(TRIALS):
                t0 = time.monotonic()
                df = df_fn()
                out_n = df.agg(F.count(F.lit(1)), F.sum(agg_col)).collect()[0][0]
                best = min(best, time.monotonic() - t0)
            row[name] = round(best, 2)
            row[f"{name}_rows"] = out_n
            print(f"x{mult} {name}: {best:.2f}s ({out_n} rows)")

        run("encode", lambda: S.pq_encode(emb, cb), F.expr("codes[0]"))
        run("pq_topk", lambda: S.pq_topk(emb, probes_src, k=10), F.col("adc"))
        run(
            "ivfpq",
            lambda: S.pq_topk_ivf(emb, probes_src, k=10, nprobe=2),
            F.col("adc"),
        )
        results.append(row)

    lines = [
        "# PQ scale probe (scripts/pq_scale_probe.py)",
        "",
        f"Synthetic replicas of `{SRC}/embeddings.parquet` (dim "
        f"{S.EMB_DIM}), fixed {n_probes}-probe set, local[32], best of "
        f"{TRIALS}. Hash-exact correctness is the oracle's job "
        "(q_sim_topk_pq / q_sim_topk_ivfpq); this measures whether the "
        "plans stay linear in corpus size.",
        "",
        "| corpus | vectors | encode (s) | pq_topk (s) | ivfpq (s) |",
        "|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| x{r['mult']} | {r['n_vectors']:,} | {r['encode']} | "
            f"{r['pq_topk']} | {r['ivfpq']} |"
        )
    if len(results) >= 2:
        a, b = results[0], results[-1]
        growth = b["mult"] / a["mult"]
        lines += [
            "",
            f"Corpus grew {growth:.0f}x end-to-end; wall grew "
            f"{b['encode'] / a['encode']:.1f}x (encode), "
            f"{b['pq_topk'] / a['pq_topk']:.1f}x (pq_topk), "
            f"{b['ivfpq'] / a['ivfpq']:.1f}x (ivfpq). Sub-corpus-growth "
            "factors at small multipliers are fixed job overhead "
            "amortizing; at the top cell the per-vector cost is "
            f"{b['pq_topk'] / b['n_vectors'] * 1e6:.1f} us/vector for the "
            "full-scan ADC path. No quadratic term: the probe set is "
            "fixed, codebooks are broadcast, and every shuffle carries "
            "O(corpus) rows.",
            "",
        ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out = os.path.join(REPO, "BENCH", "PQ_SCALE.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"results": results}))
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
