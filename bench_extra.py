#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (bench.py is FROZEN).

Times an arbitrary subset of the registered queries with the same
methodology as bench.py's bench_queries (best-of-N trials in one warm
session, spark.catalog.clearCache() between trials, .count() action) at
an arbitrary SF, and/or dumps .explain("formatted") plans to files.

Usage:
    python bench_extra.py [--sf DIR] [--trials N] [--plans OUTDIR --tag before]
                          [name-substring ...]

Prints one JSON line: {"queries": {...}, "queries_all": {...}, "sf": ...}.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    args = sys.argv[1:]

    def opt(flag: str, default: str | None = None) -> str | None:
        if flag in args:
            i = args.index(flag)
            v = args[i + 1]
            del args[i : i + 2]
            return v
        return default

    sf_dir = opt("--sf", SF_DIR)
    trials = int(opt("--trials", "3"))
    plans_dir = opt("--plans")
    tag = opt("--tag", "before")
    subs = args

    import __spark_entry__ as entry
    from logzilla_spark.session import get_spark

    spark = get_spark(cores=CPUS, app_name="bench_extra")
    names = [
        n
        for n in sorted(entry.queries())
        if not subs or any(s in n for s in subs)
    ]
    qs = entry.queries()
    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)
        for n in names:
            buf = io.StringIO()
            with redirect_stdout(buf):
                qs[n](spark, sf_dir).explain("formatted")
            with open(os.path.join(plans_dir, f"{n}_{tag}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"plan: {n}_{tag}.txt", file=sys.stderr)
    best: dict[str, float] = {}
    samples: dict[str, list[float]] = {}
    if trials > 0:
        for n in names:
            ts = []
            for _ in range(trials):
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"bench_extra:{n}")
                t0 = time.perf_counter()
                qs[n](spark, sf_dir).count()
                ts.append(round(time.perf_counter() - t0, 3))
            best[n] = min(ts)
            samples[n] = ts
            print(f"{n}: {ts}", file=sys.stderr)
    spark.stop()
    print(
        json.dumps(
            {
                "queries": best,
                "queries_samples": samples,
                "sf": os.path.basename(os.path.normpath(sf_dir)),
                "cpus": CPUS,
                "trials": trials,
            }
        )
    )


if __name__ == "__main__":
    main()
