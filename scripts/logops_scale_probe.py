#!/usr/bin/env python
"""Log-ops-at-scale probe: do the lines-shaped operators stay linear?

Correctness lives in the DuckDB oracle; BENCH times sf0.1 (150k lines).
This probe answers the scale question for the log-analytics layer —
template mining, template delta, and BM25 ranking — by replaying the
sf0.1 pages corpus at 1x / 4x / 10x (150k / 600k / 1.5M lines) and
timing each operator. The shapes under test:

- mine_templates / template_delta: ONE scan + ONE aggregation whose
  group count (templates) is CONSTANT across mults by construction —
  replicas rotate only the DIGIT characters of each line
  (translate()), so the digit-masked template set never grows while
  volume and per-template variants do. Linear wall = the aggregation
  is volume-bound, never group-bound.
- bm25_topk: two column-pruned scans (stats + scoring) with per-term
  array expressions and a broadcast stats row; the records frame is
  parsed from the replicated pages, so the timing includes the parse —
  the honest end-to-end cost of ranking raw pages.

Writes BENCH/LOGOPS_SCALE_raw.md and prints one JSON line; the curated
analysis (if any) is hand-merged so re-runs never clobber it (the
bench.py --scaling lesson).

Usage: python scripts/logops_scale_probe.py [--max-mult 10]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from logzilla_spark.operators.fulltext import bm25_topk  # noqa: E402
from logzilla_spark.operators.parse import (  # noqa: E402
    explode_lines,
    parse_records,
)
from logzilla_spark.operators.templates import (  # noqa: E402
    mine_templates,
    template_delta,
)
from logzilla_spark.session import get_spark  # noqa: E402
from logzilla_spark.testdata import pages_parquet  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CACHE = os.path.join(REPO, ".cache", "logops_scale")
MULTS = (1, 4, 10)


def synth_pages(spark, mult: int) -> str:
    """Deterministic mult-x pages table, cached as parquet.

    Replica k of page p: url suffixed (distinct record ids), digits
    rotated by k via translate() — masked templates are IDENTICAL
    across replicas (the template set must not grow with volume for
    the probe to time the right problem), while raw-line variants and
    per-template volume grow with k.
    """
    out = os.path.join(CACHE, f"pages_x{mult}")
    if os.path.exists(os.path.join(out, "_SUCCESS")):
        return out
    pages = spark.read.parquet(pages_parquet(SRC))
    if mult == 1:
        pages.write.mode("overwrite").parquet(out)
        return out
    digits = "0123456789"
    reps = pages.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("k")
    )
    rot = (
        "translate(text, '0123456789', "
        "substring(concat('0123456789', '0123456789'), (k % 10) + 1, 10))"
    )
    reps.select(
        F.concat(F.col("url"), F.lit("?r="), F.col("k")).alias("url"),
        "warc_ts",
        F.col("html"),
        F.expr(rot).alias("text"),
        "lang",
    ).write.mode("overwrite").parquet(out)
    return out


OPS = {
    "templates": lambda lines, rec: mine_templates(lines),
    "delta": lambda lines, rec: template_delta(lines, "2024-01-04 00:00:00"),
    "bm25": lambda lines, rec: bm25_topk(rec, "disk error svc3", k=25),
}


def main(max_mult: int = 10) -> None:
    spark = get_spark(app_name="logops-scale-probe")
    rows = []
    for mult in [m for m in MULTS if m <= max_mult]:
        path = synth_pages(spark, mult)
        pages = spark.read.parquet(path)
        lines = explode_lines(pages)
        rec = parse_records(pages)
        n_lines = lines.count()
        row = {"mult": mult, "n_lines": n_lines}
        for name, fn in OPS.items():
            spark.catalog.clearCache()
            best = None
            for _ in range(2):
                t0 = time.time()
                out = fn(lines, rec)
                n_out = out.count()
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            row[name] = round(best, 2)
            row[f"{name}_rows"] = n_out
        rows.append(row)
        print(json.dumps(row), flush=True)

    md = ["# BENCH/LOGOPS_SCALE_raw.md — lines-shaped operators at 1x/4x/10x",
          "",
          "| mult | lines | templates s | templates rows | delta s | "
          "delta rows | bm25 s | bm25 rows |",
          "|---|---|---|---|---|---|---|---|"]
    for r in rows:
        md.append(
            f"| {r['mult']}x | {r['n_lines']} | {r['templates']} | "
            f"{r['templates_rows']} | {r['delta']} | {r['delta_rows']} | "
            f"{r['bm25']} | {r['bm25_rows']} |"
        )
    md.append("")
    md.append(
        "Template/delta row counts must be CONSTANT across mults (the "
        "synthesis only rotates digits) — a growing count means the "
        "probe timed the wrong problem. bm25 rows are the fixed top-k."
    )
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "LOGOPS_SCALE_raw.md"), "w") as f:
        f.write("\n".join(md) + "\n")
    print(json.dumps({"probe": "logops_scale", "rows": rows}))


if __name__ == "__main__":
    mm = 10
    if "--max-mult" in sys.argv:
        mm = int(sys.argv[sys.argv.index("--max-mult") + 1])
    main(mm)
