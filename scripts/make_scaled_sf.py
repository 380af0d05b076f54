#!/usr/bin/env python
"""Build a LOCAL driver-shaped corpus dir for optimization measurement.

The driver's round-end bench runs at a driver-generated scale factor
(BENCH_r05.json: "sf1.0") whose tables are not shipped with the repo.
This script synthesizes a statistically matching stand-in at
.cache/sfdir/sf1x so bench_extra.py can measure the heavy dedup/
similarity/curation queries at that scale:

- documents.parquet: 50k rows (10x sf0.1), same 30-word vocab measured
  from /root/testdata/sf0.1 (uniform word salad, 10-100 words/doc),
  5% near-dup injection (copy of an earlier doc with the word "dup"
  spliced in) — matches the measured 250/5000 docs containing "dup",
  244 shared 8-word prefixes, ~0.2% exact dups;
- embeddings.parquet: 20k rows (10x), unit-norm 64-dim near-uniform
  vectors, label 0..9 (measured: no cluster structure, no cos>0.9
  pairs) — reproduces the O(n^2) exact-cosine shape (124.5s at the
  driver's sf1.0 ~ 91x the sf0.1 cost ~ (10x rows)^2);
- events.parquet: 1M rows (10x), same 5 event types, 15k users, 30-day
  ts window, {"k": n} props;
- TPC-H tables + pages: hard-linked from /root/testdata/sf0.1 (the
  TPC-H queries are sub-second and not optimization targets; the
  driver's own sf1.0 pages table was the 500-row n_pages_for fallback,
  so pages-based queries are tiny there anyway).

Deterministic (fixed seeds). Measurement fixture only — never imported
by the engine, never read by bench.py.
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".cache", "sfdir", "sf1x")
SRC = "/root/testdata/sf0.1"

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.15, 0.14]


def gen_documents(n: int, seed: int = 7) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    texts: list[str] = []
    for i in range(n):
        if i > 0 and rng.random() < 0.05:
            # near-dup: copy an earlier doc, splice in "dup"
            base = texts[int(rng.integers(0, i))].split()
            pos = int(rng.integers(0, len(base) + 1))
            texts.append(" ".join(base[:pos] + ["dup"] + base[pos:]))
        else:
            ln = int(rng.integers(10, 101))
            texts.append(" ".join(rng.choice(VOCAB, size=ln)))
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": langs,
            "source": [f"src{i % 20}" for i in range(n)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def gen_embeddings(n: int, dim: int = 64, seed: int = 11) -> pa.Table:
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n).astype(np.int32)),
        }
    )


def gen_events(n: int, n_users: int, seed: int = 13) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2024-01-01")
    secs = np.sort(rng.uniform(0, 30 * 24 * 3600, size=n))
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": base + pd.to_timedelta(secs, unit="s"),
            "user_id": rng.integers(0, n_users, size=n).astype(np.int64),
            "event_type": rng.choice(
                ["signup", "purchase", "view", "click", "error"], size=n
            ),
            "value": np.round(rng.uniform(0, 200, size=n), 2),
            "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, size=n)],
        }
    )


def main() -> None:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    os.makedirs(OUT, exist_ok=True)
    done = os.path.join(OUT, f"_DONE_x{mult}")
    if os.path.exists(done):
        print(OUT)
        return
    pq.write_table(
        pa.Table.from_pandas(gen_documents(5000 * mult), preserve_index=False),
        os.path.join(OUT, "documents.parquet"),
        row_group_size=5000,
    )
    pq.write_table(
        gen_embeddings(2000 * mult),
        os.path.join(OUT, "embeddings.parquet"),
        row_group_size=2000,
    )
    ev = pa.Table.from_pandas(
        gen_events(100_000 * mult, 1500 * mult), preserve_index=False
    )
    # Spark cannot read TIMESTAMP(NANOS); the driver tables are micros
    ev = ev.set_column(
        ev.schema.get_field_index("ts"),
        "ts",
        ev.column("ts").cast(pa.timestamp("us"), safe=False),
    )
    pq.write_table(ev, os.path.join(OUT, "events.parquet"), row_group_size=50_000)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem"):
        dst = os.path.join(OUT, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(os.path.join(SRC, f"{t}.parquet"), dst)
    open(done, "w").close()
    print(OUT)


if __name__ == "__main__":
    main()
