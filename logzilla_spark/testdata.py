"""Deterministic synthetic `pages` corpus + dimension tables.

The graft input (BASELINE.json input_hint) is an Iceberg table
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)`` of Common-Crawl-style web pages with embedded log lines.
No external data is allowed, so this module synthesises the table
deterministically (pure modular arithmetic on the row index — no RNG,
no wall clock) following FIXTURES.md §1/§3:

- hot-key skew: 5% of pages live on one of 3 "hot" hosts (exercises
  salting / AQE skew handling), `en` gets 40% of rows;
- each page embeds 1-5 log lines of three flavors:
  (a) JSON lines satisfying the reference JSON-processor contract
      (reference: processor/json.go:39-80 — RFC3339 `timestamp`,
      string `level`, optional `message`, leftovers -> metadata),
  (b) Apache-combined access lines (the reference's documented
      regex-processor target, reference: README.md:100-107),
  (c) ~5% malformed lines (bad JSON / non-string or unparseable
      timestamp / non-log garbage) exercising the drop-on-error
      tolerance (reference: processor/json.go:48-57,
      engine/processor.go:99-102);
- `text` is the newline-join of the lines; `html` wraps the identical
  bytes in `<html><body><pre>...</pre></body></html>` so the
  byte-identical-extraction invariant (BASELINE.json north_rule) is
  testable.

This is FIXTURE code (runs once per scale, cached to parquet); the
pipeline under test never calls it. Level-string coverage includes the
reference quirk that only exact "warn" maps to WARN while "warning" is
UNKNOWN (reference: processor/util.go:9-24).
"""

from __future__ import annotations

import json
import os
import re
from datetime import datetime, timedelta

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE_ROOT = os.path.join(REPO_ROOT, ".cache", "pages")

EPOCH = datetime(2024, 1, 1, 0, 0, 0)  # UTC-naive; session TZ is pinned UTC
WEEK_SECONDS = 7 * 24 * 3600

# en gets 40% (FIXTURES.md §1 lang skew)
LANG_TABLE = ["en", "en", "en", "en", "es", "de", "fr", "zh", "ja", "ru"]

# mixed-case + quirk coverage (processor/util.go:9-24: lowercase match,
# "warning" does NOT match -> UNKNOWN)
RAW_LEVELS = ["debug", "info", "warn", "error", "fatal", "warning", "INFO", "ERROR"]
MESSAGES = [
    "disk full",
    "user login",
    "cache miss",
    "timeout contacting upstream",
    "payment processed",
    "connection reset",
]
METHODS = ["GET", "POST", "PUT"]
PATHS = ["/index.html", "/api/v1/items", "/static/app.js", "/checkout", "/search"]
STATUSES = [200, 200, 301, 404, 500, 503]

N_PAGES_BY_SF = {"sf0.001": 500, "sf0.01": 5000, "sf0.1": 50000, "sf1": 500000}

# Row-group size for the pages parquet: Spark's scan parallelism over a
# single file is bounded by row-group boundaries, so the fixture writes
# many small row groups (a 100 TB corpus would naturally arrive as many
# files; this keeps local[N] scaling behavior representative).
PAGES_ROW_GROUP = 2000

HTML_PREFIX = "<html><body><pre>"
HTML_SUFFIX = "</pre></body></html>"


def _host(i: int) -> str:
    if i % 100 < 5:  # 5% hot hosts (skew)
        return f"hot{i % 3}.example"
    return f"site{i % 97}.example"


def _line(i: int, j: int) -> str:
    """Log line j (0-based) of page i. Deterministic."""
    flavor = (i * 3 + 5 * j) % 20  # 0-9 json (50%), 10-18 access (45%), 19 malformed (5%)
    ts = EPOCH + timedelta(seconds=(i * 7457) % WEEK_SECONDS + j)
    if flavor < 10:
        obj = {
            "timestamp": ts.strftime("%Y-%m-%dT%H:%M:%SZ"),
            "level": RAW_LEVELS[(i + 2 * j) % 8],
            "message": MESSAGES[(i + j) % 6],
            "service": f"svc{i % 7}",
            "request_id": f"r-{i * 10 + j}",
            "attempt": j + 1,
        }
        return json.dumps(obj, separators=(",", ":"))
    if flavor < 19:
        apache_ts = ts.strftime("%d/%b/%Y:%H:%M:%S +0000")
        ip = f"10.{i % 256}.{j}.{(i * 7) % 256}"
        method = METHODS[(i + j) % 3]
        path = PATHS[(2 * i + j) % 5]
        status = STATUSES[(i + 3 * j) % 6]
        size = 500 + (i * 37 + 11 * j) % 5000
        return f'{ip} - - [{apache_ts}] "{method} {path} HTTP/1.1" {status} {size}'
    variant = (i + j) % 3
    if variant == 0:
        return '{"timestamp": 12345, "level": "info"'  # truncated / non-string ts
    if variant == 1:
        # valid JSON, unparseable timestamp -> reference drops the parse
        return '{"timestamp":"not-a-date","level":"info","message":"m"}'
    return f"garbage line {i}"


def generate_pages_pdf(n_pages: int, start: int = 0) -> pd.DataFrame:
    rows = []
    for i in range(start, start + n_pages):
        lang = LANG_TABLE[(i * 7) % 10]
        n_lines = 1 + i % 5
        text = "\n".join(_line(i, j) for j in range(n_lines))
        rows.append(
            {
                "url": f"https://{_host(i)}/{lang}/page{i}",
                "warc_ts": EPOCH + timedelta(seconds=(i * 7457) % WEEK_SECONDS),
                "html": (HTML_PREFIX + text + HTML_SUFFIX).encode("utf-8"),
                "text": text,
                "lang": lang,
            }
        )
    return pd.DataFrame(rows)


def dim_lang_pdf() -> pd.DataFrame:
    data = [
        ("en", "English", "germanic"),
        ("es", "Spanish", "romance"),
        ("de", "German", "germanic"),
        ("fr", "French", "romance"),
        ("zh", "Chinese", "sinitic"),
        ("ja", "Japanese", "japonic"),
        ("ru", "Russian", "slavic"),
        ("pt", "Portuguese", "romance"),
        # 2 codes never present in pages -> exercise left-join nulls
        ("xx", "Unmatched-1", "none"),
        ("yy", "Unmatched-2", "none"),
    ]
    return pd.DataFrame(data, columns=["lang", "lang_name", "lang_family"])


def dim_severity_pdf() -> pd.DataFrame:
    # exact reference level domain (entity/logrecord.go:11-18)
    levels = ["UNKNOWN", "DEBUG", "INFO", "WARN", "ERROR", "FATAL"]
    return pd.DataFrame(
        {
            "level": levels,
            "level_code": list(range(6)),
            "severity_weight": [i * 10 for i in range(6)],
        }
    )


def _pages_arrow_schema() -> pa.Schema:
    return pa.schema(
        [
            pa.field("url", pa.string(), nullable=False),
            pa.field("warc_ts", pa.timestamp("us"), nullable=False),
            pa.field("html", pa.binary()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
        ]
    )


def n_pages_for(sf_dir: str) -> int:
    name = os.path.basename(os.path.normpath(sf_dir))
    if name in N_PAGES_BY_SF:
        return N_PAGES_BY_SF[name]
    # generic sfN -> N * 500k pages (e.g. sf10 -> 5M), for scaling runs
    m = re.fullmatch(r"sf(\d+)", name)
    if m:
        return int(m.group(1)) * N_PAGES_BY_SF["sf1"]
    return 500


def ensure_pages(sf_dir: str, force: bool = False) -> str:
    """Generate (once) and return the path of the pages parquet for sf_dir.

    Also writes dim_lang.parquet / dim_severity.parquet next to it.
    Returns the directory containing {pages,dim_lang,dim_severity}.parquet.
    """
    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(CACHE_ROOT, name)
    marker = os.path.join(out_dir, "_SUCCESS_v2")
    if os.path.exists(marker) and not force:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    pdf = generate_pages_pdf(n_pages_for(sf_dir))
    table = pa.Table.from_pandas(pdf, schema=_pages_arrow_schema(), preserve_index=False)
    pq.write_table(
        table, os.path.join(out_dir, "pages.parquet"), row_group_size=PAGES_ROW_GROUP
    )
    pq.write_table(
        pa.Table.from_pandas(dim_lang_pdf(), preserve_index=False),
        os.path.join(out_dir, "dim_lang.parquet"),
    )
    pq.write_table(
        pa.Table.from_pandas(dim_severity_pdf(), preserve_index=False),
        os.path.join(out_dir, "dim_severity.parquet"),
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def ensure_pages_spark(sf_dir: str, spark, force: bool = False) -> str:
    """Spark-parallel fixture generation for scaling-run corpora.

    Identical rows to :func:`ensure_pages` (same pure function of the
    global page index), but generated by 32-way mapInPandas instead of
    a single Python loop — multi-million-page corpora in minutes. The
    pages table becomes a parquet DIRECTORY (many files, small row
    groups) which is also the realistic 100 TB layout.
    """
    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(CACHE_ROOT, name)
    marker = os.path.join(out_dir, "_SUCCESS_v2")
    if os.path.exists(marker) and not force:
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    n = n_pages_for(sf_dir)
    chunk = 50_000
    bounds = [(lo, min(n, lo + chunk)) for lo in range(0, n, chunk)]

    def gen(batches):
        for pdf in batches:
            for r in pdf.itertuples():
                yield generate_pages_pdf(r.hi - r.lo, start=r.lo)

    chunks_df = spark.createDataFrame(bounds, "lo long, hi long").repartition(len(bounds))
    (
        chunks_df.mapInPandas(gen, schema="url string, warc_ts timestamp, "
                                          "html binary, text string, lang string")
        .write.mode("overwrite")
        # small row groups/files so local scans split finely (matches
        # the single-file fixture's PAGES_ROW_GROUP intent)
        .option("parquet.block.size", 4 * 1024 * 1024)
        .parquet(os.path.join(out_dir, "pages.parquet"))
    )
    pq.write_table(
        pa.Table.from_pandas(dim_lang_pdf(), preserve_index=False),
        os.path.join(out_dir, "dim_lang.parquet"),
    )
    pq.write_table(
        pa.Table.from_pandas(dim_severity_pdf(), preserve_index=False),
        os.path.join(out_dir, "dim_severity.parquet"),
    )
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def pages_row_count(sf_dir: str) -> int:
    """Exact row count from parquet footers (file or directory layout)."""
    import glob as _glob

    path = os.path.join(CACHE_ROOT, os.path.basename(os.path.normpath(sf_dir)),
                        "pages.parquet")
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in _glob.glob(os.path.join(path, "*.parquet"))
        )
    return pq.ParquetFile(path).metadata.num_rows


def pages_parquet(sf_dir: str) -> str:
    return os.path.join(ensure_pages(sf_dir), "pages.parquet")


def dim_parquet(sf_dir: str, which: str) -> str:
    return os.path.join(ensure_pages(sf_dir), f"dim_{which}.parquet")


# --------------------------------------------------------------------------
# media fixture (multimodal plumbing — operators/multimodal.py)
# --------------------------------------------------------------------------

N_MEDIA_BY_SF = {"sf0.001": 100, "sf0.01": 1000, "sf0.1": 4000}
SAMPLE_RATES = [8000, 16000, 44100]


def generate_media_pdf(n_media: int) -> pd.DataFrame:
    """Deterministic media assets: opaque binary payload + typed meta.

    Payload bytes are a 4-byte ascii header ('IMG0'/'AUD0'/'VID0')
    followed by a repeated md5-hex chain — deterministic from media_id,
    and kept in the ASCII range so the DuckDB oracle can recompute byte
    checksums via decode()+ascii() (operators/multimodal.py module
    doc). Kind mix: 2/3 image, 1/6 audio, 1/6 video; video carries
    width/height + duration_ms + fps (stored in the sample_rate slot —
    one meta struct for all kinds, the sparse-by-kind convention).
    """
    import hashlib

    rows = []
    for i in range(n_media):
        if i % 3 < 2:
            kind = "image"
        else:
            kind = "video" if i % 6 == 5 else "audio"
        body_len = 256 + (i * 37) % 1731
        chain = hashlib.md5(f"media-{i}".encode()).hexdigest()
        body = (chain * (body_len // 32 + 1))[:body_len]
        header = {"image": "IMG0", "audio": "AUD0", "video": "VID0"}[kind]
        if kind == "image":
            meta = {
                "width": 16 * ((i % 40) + 1),
                "height": 16 * ((i % 25) + 1),
                "sample_rate": None,
                "duration_ms": None,
            }
        elif kind == "video":
            meta = {
                "width": 16 * ((i % 30) + 1),
                "height": 16 * ((i % 20) + 1),
                "sample_rate": 25,  # fps for video assets
                "duration_ms": 1000 + (i * 113) % 19000,
            }
        else:
            meta = {
                "width": None,
                "height": None,
                "sample_rate": SAMPLE_RATES[i % 3],
                "duration_ms": 500 + (i * 97) % 9500,
            }
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "name": f"media/{i}.bin",
                "payload": (header + body).encode("ascii"),
                "meta": meta,
            }
        )
    return pd.DataFrame(rows)


def _media_arrow_schema() -> pa.Schema:
    meta_t = pa.struct(
        [
            pa.field("width", pa.int32()),
            pa.field("height", pa.int32()),
            pa.field("sample_rate", pa.int32()),
            pa.field("duration_ms", pa.int32()),
        ]
    )
    return pa.schema(
        [
            pa.field("media_id", pa.int64(), nullable=False),
            pa.field("kind", pa.string(), nullable=False),
            pa.field("name", pa.string(), nullable=False),
            pa.field("payload", pa.binary(), nullable=False),
            pa.field("meta", meta_t),
        ]
    )


def ensure_media(sf_dir: str, force: bool = False) -> str:
    """Generate (once) and return the media parquet path for sf_dir.

    The filename carries a fixture VERSION: ensure_media short-circuits
    on an existing file, so changing generate_media_pdf without bumping
    the version would silently serve the stale cache."""
    name = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(CACHE_ROOT, name)
    path = os.path.join(out_dir, "media_v2.parquet")
    if os.path.exists(path) and not force:
        return path
    os.makedirs(out_dir, exist_ok=True)
    pdf = generate_media_pdf(N_MEDIA_BY_SF.get(name, 100))
    table = pa.Table.from_pandas(pdf, schema=_media_arrow_schema(), preserve_index=False)
    pq.write_table(table, path)
    return path
