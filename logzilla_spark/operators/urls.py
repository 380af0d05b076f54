"""URL curation over the Common-Crawl-style pages table.

Crawl pipelines curate by URL before touching page bytes: normalize
(case-fold scheme+host, strip default ports, fragments and tracking
params), filter against a domain blocklist, and collapse recrawls of
the same normalized URL keeping the newest capture (CCNet Wenzek et
al. '20 keep one snapshot per URL; RefinedWeb Penedo et al. '23 §3.1
URL filtering). The reference engine has no URL stage (its sources are
log lines); this is a graft-mandated training-data extension over the
(url, warc_ts, html, text, lang) input shape.

Everything is pure Catalyst expressions (regex + array ops — no
``parse_url``, whose Java-side semantics DuckDB cannot mirror
bit-for-bit); the DuckDB twin in ``oracle_dataops.url_curate_sql``
shares every pattern constant from HERE.

Scale shape for 100 TB: normalization and the blocklist gate are one
narrow projection + filter (scan-bound, column-pruned, fully codegen)
BEFORE the only shuffle; recrawl dedup is a max_by aggregation with
map-side partial aggregation (SortAggregate — the struct-valued
buffer rules out HashAggregate, but the partial still runs per map
task), so a hot URL (the recrawl skew case — exactly why this
operator exists) collapses to one partial row per map task instead of
shipping every capture to a single reducer (a window over norm_url
would do exactly that, and AQE cannot split window skew).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking query parameters stripped during normalization. Anchored
# prefix match over one `key=value` token; dialect-parity syntax only
# (no lookaround), shared with the DuckDB twin.
TRACKING_PARAM_RE = "^(utm_[a-zA-Z0-9_]*|fbclid|gclid|msclkid|mc_eid|ref)="

# scheme://authority — group 1 is everything up to the first /?#.
SCHEME_HOST_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"

# Domain inside the lowercased authority: skip userinfo@, stop at :port.
DOMAIN_RE = "://(?:[^/?#@]*@)?([^:/?#]+)"

# Default blocklist: matched against the registrable suffix (domain ==
# entry OR domain ends with '.' + entry).
DEFAULT_URL_BLOCKLIST = ("ads.example", "tracker.example")

# Micros from 0001-01-01 (the minimum timestamp both engines can
# represent, proleptic Gregorian) to the Unix epoch: 719162 days.
# Added before zero-padding the keep-newest order key so the padded
# string is non-negative — and therefore numerically ordered — over
# the ENTIRE timestamp domain, including pre-1970 captures whose raw
# epoch micros are negative. Shared with the DuckDB twin.
_MICROS_SINCE_YEAR_1 = 719_162 * 86_400 * 1_000_000  # 62135596800000000


def blocklist_regex(blocklist: tuple[str, ...]) -> str | None:
    """ONE anchored regex for the whole blocklist (suffix-at-dot
    semantics: domain == entry OR domain ends with '.' + entry).

    One regex instead of an OR-chain of equals/endswith because
    PushPredicateThroughProject substitutes the domain expression into
    the pushed filter once PER CONJUNCT: a 4-entry chain re-ran the
    whole 4-regex domain derivation 4x per scanned row (observed in the
    pushed Filter). Shared verbatim with the DuckDB twin (RE2 and Java
    agree on this alternation class). None for an empty blocklist —
    '(^|\\.)()$' would match every domain."""
    if not blocklist:
        return None
    alts = "|".join(re.escape(b) for b in blocklist)
    return f"(^|\\.)({alts})$"


def _blocked(domain: Column, blocklist: tuple[str, ...]) -> Column:
    pat = blocklist_regex(tuple(blocklist))
    return domain.rlike(pat) if pat is not None else F.lit(False)


def url_curate(
    df: DataFrame,
    blocklist: tuple[str, ...] = DEFAULT_URL_BLOCKLIST,
    url_col: str = "url",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Normalize -> blocklist-filter -> keep-newest recrawl dedup.

    Normalization: drop the #fragment; lowercase scheme+authority and
    strip an explicit default port (:80/:443); drop tracking params
    (``TRACKING_PARAM_RE``) from the query string, preserving the
    order of surviving params. Scheme-less strings pass through the
    authority steps unchanged (group 1 matches empty).

    Dedup: one row per surviving ``norm_url`` — the capture with the
    greatest (warc_ts, url) wins, totally ordered via a zero-padded
    epoch-micros string so ties on warc_ts break deterministically on
    the raw url (NULL warc_ts sorts oldest). Returns
    (norm_url, url, warc_ts, domain, n_crawls); NULL urls emit no row.
    """
    # Staged projections: every non-cheap expression (regex, HOF) is
    # materialized under an alias BEFORE being referenced twice —
    # CollapseProject only inlines cheap or single-use expressions, so
    # each regex runs once per row (parse.py's discipline).
    nofrag = F.regexp_replace(F.col(url_col), "#.*$", "")
    base = (
        df.filter(F.col(url_col).isNotNull())
        .select(
            F.col(url_col).alias("url"),
            F.col(ts_col).alias("warc_ts"),
            nofrag.alias("_nofrag"),
        )
        .withColumn("_auth", F.regexp_extract("_nofrag", SCHEME_HOST_RE, 1))
        .select(
            "url",
            "warc_ts",
            F.lower(F.regexp_replace("_auth", ":(80|443)$", "")).alias("_host"),
            F.expr("substring(_nofrag, length(_auth) + 1)").alias("_rest"),
        )
        .select(
            "url",
            "warc_ts",
            "_host",
            F.regexp_extract("_rest", "^([^?]*)", 1).alias("_path"),
            F.array_join(
                F.expr(
                    "filter(split(regexp_extract(_rest, '^[^?]*\\\\?(.*)$', 1),"
                    f" '&'), p -> NOT p rlike '{TRACKING_PARAM_RE}')"
                ),
                "&",
            ).alias("_q"),
        )
    )
    curated = (
        base.select(
            "url",
            "warc_ts",
            F.concat(
                F.col("_host"),
                F.col("_path"),
                F.when(F.col("_q") == "", "").otherwise(
                    F.concat(F.lit("?"), F.col("_q"))
                ),
            ).alias("norm_url"),
            F.regexp_extract("_host", DOMAIN_RE, 1).alias("domain"),
        )
        .filter(~_blocked(F.col("domain"), tuple(blocklist)))
    )
    # total order: zero-padded epoch micros, then the raw url. The
    # ntz->ltz cast is wall-clock identity (session TZ pinned UTC) and
    # matches DuckDB's epoch_us over the naive timestamp. The offset
    # shifts epoch micros to the count since 0001-01-01 (the minimum
    # representable timestamp on both engines), so pre-1970 captures —
    # negative epoch values, whose '-'-prefixed strings would compare
    # magnitude-REVERSED after lpad — stay non-negative and the string
    # order equals the numeric order across the whole domain.
    order_key = F.concat(
        F.coalesce(
            F.lpad(
                (
                    F.unix_micros(F.col("warc_ts").cast("timestamp"))
                    + F.lit(_MICROS_SINCE_YEAR_1)
                ).cast("string"),
                20,
                "0",
            ),
            F.lit(""),
        ),
        F.lit("|"),
        F.col("url"),
    )
    picked = curated.groupBy("norm_url").agg(
        F.max_by(F.struct("url", "warc_ts", "domain"), order_key).alias("_k"),
        F.count(F.lit(1)).alias("n_crawls"),
    )
    return picked.select(
        "norm_url",
        F.col("_k.url").alias("url"),
        F.col("_k.warc_ts").alias("warc_ts"),
        F.col("_k.domain").alias("domain"),
        "n_crawls",
    )
