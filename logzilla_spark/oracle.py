"""DuckDB oracle SQL for the pipeline (differential-test support).

The reference has no test suite (SURVEY.md §5), so correctness is
anchored by reproducing every pipeline stage in an independent engine:
DuckDB SQL over the *same* parquet bytes. These strings are consumed by
``__spark_entry__.oracle_sql()`` (the driver's correctness gate) and by
the local pytest differential tests.

The parse reproduction mirrors the reference contracts exactly:
- JSON flavor: `timestamp` must be a JSON string in RFC3339 Z-form and
  parse; `level` must be a JSON string (processor/json.go:48-67);
  non-string `message` -> '' (processor/json.go:70-72);
- access flavor: the apache-combined grok regex (README.md:100-107),
  level derived from status class;
- anything else: category 'unparsed', level UNKNOWN, message '',
  timestamp = ingest time (engine/processor.go:99-102 tolerance).

Metadata is compared via flattened per-key columns (m_*) because map
column hashing is not portable across engines; full-map equality is
covered by the pytest arrow-vs-native differential tests instead.
"""

from __future__ import annotations

# Apache access regex — single-quoted SQL-safe (no quotes inside except
# the double quotes, which are fine inside single-quoted SQL strings)
ACCESS_RE_SQL = (
    r'^(\S+) \S+ \S+ \[([^\]]+)\] "(\S+) (\S+) ([^"]*)" (\d{3}) (\d+)$'
)
_RFC3339_Z = r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z$"

_LEVEL_CASE = (
    "CASE lower({v}) WHEN 'debug' THEN 'DEBUG' WHEN 'info' THEN 'INFO' "
    "WHEN 'warn' THEN 'WARN' WHEN 'error' THEN 'ERROR' WHEN 'fatal' THEN 'FATAL' "
    "ELSE 'UNKNOWN' END"
)


def records_cte(pages_path: str) -> str:
    """WITH-clause body computing the records relation from pages parquet.

    Exposes relation ``records`` with columns: id, source, "timestamp",
    level, message, category, lang, parse_ok, url, warc_ts, and
    flattened metadata m_service, m_request_id, m_attempt, m_ip,
    m_method, m_path, m_status, m_size.
    """
    acc = ACCESS_RE_SQL.replace("'", "''")
    jlvl = "json_extract_string(line, '$.level')"
    jts = "json_extract_string(line, '$.timestamp')"
    jts_cast = f"try_cast(replace(replace({jts}, 'T', ' '), 'Z', '') AS TIMESTAMP)"
    ats = f"try_strptime(regexp_extract(regexp_extract(line, '{acc}', 2), '^([^ ]+)', 1), '%d/%b/%Y:%H:%M:%S')"
    return f"""
pages AS (
  SELECT * FROM read_parquet('{pages_path}')
),
lines AS (
  SELECT url, warc_ts, lang, source, u.pos AS pos, u.line AS line FROM (
    SELECT url, warc_ts, lang,
           regexp_extract(url, '^https?://([^/]+)/', 1) AS source,
           unnest([{{'pos': i - 1, 'line': sp[i]}} for i in generate_series(1, len(sp))]) AS u
    FROM (SELECT *, string_split(text, chr(10)) AS sp FROM pages)
  )
),
classified AS (
  -- CASE wrappers: DuckDB does not short-circuit AND, and json_* functions
  -- raise on malformed JSON, so every json_* call is guarded.
  SELECT *,
    coalesce(CASE WHEN json_valid(line) THEN
      json_type(line, '$.timestamp') = 'VARCHAR'
      AND regexp_matches({jts}, '{_RFC3339_Z}')
      AND {jts_cast} IS NOT NULL
      AND json_type(line, '$.level') = 'VARCHAR'
    END, FALSE) AS json_ok,
    (regexp_matches(line, '{acc}') AND {ats} IS NOT NULL) AS acc_ok
  FROM lines
),
records AS (
  SELECT
    url || '#' || printf('%04d', pos) AS id,
    source,
    CASE WHEN json_ok THEN {jts_cast}
         WHEN acc_ok THEN {ats}
         ELSE warc_ts END AS "timestamp",
    CASE WHEN json_ok THEN {_LEVEL_CASE.format(v=jlvl)}
         WHEN acc_ok THEN (
           CASE WHEN CAST(regexp_extract(line, '{acc}', 6) AS INT) < 400 THEN 'INFO'
                WHEN CAST(regexp_extract(line, '{acc}', 6) AS INT) < 500 THEN 'WARN'
                ELSE 'ERROR' END)
         ELSE 'UNKNOWN' END AS level,
    CASE WHEN json_ok THEN coalesce(
           CASE WHEN json_type(line, '$.message') = 'VARCHAR'
                THEN json_extract_string(line, '$.message') END, '')
         WHEN acc_ok THEN regexp_extract(line, '{acc}', 3) || ' ' || regexp_extract(line, '{acc}', 4)
         ELSE '' END AS message,
    CASE WHEN json_ok THEN 'json' WHEN acc_ok THEN 'access' ELSE 'unparsed' END AS category,
    lang,
    (json_ok OR acc_ok) AS parse_ok,
    url,
    warc_ts,
    CASE WHEN json_ok THEN json_extract_string(line, '$.service') END AS m_service,
    CASE WHEN json_ok THEN json_extract_string(line, '$.request_id') END AS m_request_id,
    CASE WHEN json_ok THEN json_extract_string(line, '$.attempt') END AS m_attempt,
    CASE WHEN acc_ok THEN regexp_extract(line, '{acc}', 1) END AS m_ip,
    CASE WHEN acc_ok THEN regexp_extract(line, '{acc}', 3) END AS m_method,
    CASE WHEN acc_ok THEN regexp_extract(line, '{acc}', 4) END AS m_path,
    CASE WHEN acc_ok THEN regexp_extract(line, '{acc}', 6) END AS m_status,
    CASE WHEN acc_ok THEN regexp_extract(line, '{acc}', 7) END AS m_size
  FROM classified
)"""


LEGACY_RE_SQL = r"^garbage line (\d+)$"


def records_custom_sql(pages_path: str) -> str:
    """Twin of the registered-parser chain (access, json, legacy):
    the user-registered 'legacy' grok format claims the corpus's
    previously-unparsed `garbage line N` tail (operators/parsers.py
    demo of the Lua-slot successor). Non-legacy rows are identical to
    the base records relation."""
    return f"""WITH {records_cte(pages_path)},
leg AS (
  SELECT url || '#' || printf('%04d', pos) AS id,
         regexp_matches(line, '{LEGACY_RE_SQL}') AS leg_ok,
         regexp_extract(line, '{LEGACY_RE_SQL}', 1) AS n
  FROM classified WHERE NOT json_ok AND NOT acc_ok
)
SELECT r.id, r.source, r."timestamp",
       CASE WHEN coalesce(l.leg_ok, FALSE) THEN 'DEBUG' ELSE r.level END AS level,
       CASE WHEN coalesce(l.leg_ok, FALSE) THEN l.n ELSE r.message END AS message,
       CASE WHEN coalesce(l.leg_ok, FALSE) THEN 'legacy' ELSE r.category END AS category,
       r.lang,
       (r.parse_ok OR coalesce(l.leg_ok, FALSE)) AS parse_ok,
       CASE WHEN coalesce(l.leg_ok, FALSE) THEN l.n END AS m_n
FROM records r LEFT JOIN leg l ON r.id = l.id"""


def records_lua_sql(pages_path: str) -> str:
    """Twin of the Lua-script chain (access, json, lua_legacy): a
    reference-style ``parse_log`` Lua script (operators/lua.py, here
    compiled to the codegen tier) claims the `garbage line N` tail.
    The Lua contract requires a parseable RFC3339 timestamp
    (reference lua.go:104-107) — the script returns an epoch constant
    rather than inheriting ingest time, so claimed rows get it."""
    return f"""WITH {records_cte(pages_path)},
leg AS (
  SELECT url || '#' || printf('%04d', pos) AS id,
         regexp_matches(line, '{LEGACY_RE_SQL}') AS leg_ok,
         regexp_extract(line, '{LEGACY_RE_SQL}', 1) AS n
  FROM classified WHERE NOT json_ok AND NOT acc_ok
)
SELECT r.id, r.source,
       CASE WHEN coalesce(l.leg_ok, FALSE)
            THEN TIMESTAMP '1970-01-01 00:00:00' ELSE r."timestamp"
       END AS "timestamp",
       CASE WHEN coalesce(l.leg_ok, FALSE) THEN 'DEBUG' ELSE r.level END AS level,
       CASE WHEN coalesce(l.leg_ok, FALSE) THEN l.n ELSE r.message END AS message,
       CASE WHEN coalesce(l.leg_ok, FALSE) THEN 'lua_legacy' ELSE r.category END AS category,
       r.lang,
       (r.parse_ok OR coalesce(l.leg_ok, FALSE)) AS parse_ok,
       CASE WHEN coalesce(l.leg_ok, FALSE) THEN l.n END AS m_n
FROM records r LEFT JOIN leg l ON r.id = l.id"""


RECORDS_SELECT = (
    'SELECT id, source, "timestamp", level, message, category, lang, parse_ok, '
    "url, warc_ts, m_service, m_request_id, m_attempt, m_ip, m_method, m_path, "
    "m_status, m_size FROM records"
)


def records_sql(pages_path: str) -> str:
    return f"WITH {records_cte(pages_path)}\n{RECORDS_SELECT}"


def windowed_counts_sql(pages_path: str) -> str:
    return f"""WITH {records_cte(pages_path)}
SELECT time_bucket(INTERVAL '1 hour', warc_ts) AS window_start,
       time_bucket(INTERVAL '1 hour', warc_ts) + INTERVAL '1 hour' AS window_end,
       category, level, lang, CAST(count(*) AS BIGINT) AS n
FROM records GROUP BY 1, 2, 3, 4, 5"""


def route_counts_sql(pages_path: str) -> str:
    return f"""WITH {records_cte(pages_path)}
SELECT category, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT id) AS BIGINT) AS n_ids
FROM records GROUP BY 1"""


def enrich_sql(pages_path: str, dim_lang_path: str, dim_severity_path: str) -> str:
    return f"""WITH {records_cte(pages_path)}
SELECT r.lang, r.level, d.lang_name, d.lang_family, s.level_code, s.severity_weight,
       CAST(count(*) AS BIGINT) AS n, CAST(sum(s.severity_weight) AS BIGINT) AS weight_sum
FROM records r
LEFT JOIN read_parquet('{dim_lang_path}') d ON r.lang = d.lang
LEFT JOIN read_parquet('{dim_severity_path}') s ON r.level = s.level
GROUP BY 1, 2, 3, 4, 5, 6"""


# the oracle records relation flattens metadata to these m_* columns
META_KEYS = ("service", "request_id", "attempt", "ip", "method", "path",
             "status", "size")


def searchable_tokens_sql() -> str:
    """DuckDB expression for the record's searchable token list —
    twin of operators.fulltext.searchable_text + _tokens over the
    flattened records relation (metadata values as m_* columns)."""
    meta_cols = ", ".join(f"coalesce(m_{k}, '')" for k in META_KEYS)
    return (
        "list_filter(string_split_regex(lower(concat_ws(' ', message, source, "
        f"level, {meta_cols})), '[^a-z0-9]+'), t -> t <> '')"
    )


def fulltext_sql(pages_path: str, query: str) -> str:
    """Twin of operators.fulltext: every query token must appear among
    the record's searchable tokens (message, source, level, metadata
    values — here the flattened m_* columns)."""
    import re as _re

    toks = sorted({t for t in _re.split(r"[^a-z0-9]+", query.lower()) if t})
    tok_expr = searchable_tokens_sql()
    preds = " AND ".join(f"list_contains({tok_expr}, '{t}')" for t in toks)
    return (
        f"WITH {records_cte(pages_path)}\n{RECORDS_SELECT}\nWHERE {preds}"
    )


def phrase_sql(pages_path: str, phrase: str) -> str:
    """Twin of operators.fulltext.full_text_phrase: the phrase's tokens
    appear CONSECUTIVELY, in order, in the record's searchable token
    sequence — space-joined tokens with sentinel delimiters on both
    engines, so adjacency (including across field boundaries) agrees
    exactly."""
    import re as _re

    toks = [t for t in _re.split(r"[^a-z0-9]+", phrase.lower()) if t]
    tok_expr = searchable_tokens_sql()
    needle = " " + " ".join(toks) + " "
    pred = f"contains(' ' || array_to_string({tok_expr}, ' ') || ' ', '{needle}')"
    return (
        f"WITH {records_cte(pages_path)}\n{RECORDS_SELECT}\nWHERE {pred}"
    )


def near_sql(pages_path: str, query: str, slop: int = 1) -> str:
    """Twin of operators.fulltext.full_text_near: query tokens in
    order with at most ``slop`` intervening tokens per gap — the SAME
    regex text (fulltext.near_pattern) over the same sentinel-delimited
    token string; Java regex and RE2 agree on bounded quantifiers and
    non-capturing groups over this alphabet."""
    from logzilla_spark.operators.fulltext import near_pattern, phrase_tokens

    toks = phrase_tokens(query)
    tok_expr = searchable_tokens_sql()
    pat = near_pattern(toks, slop)
    pred = (
        f"regexp_matches(' ' || array_to_string({tok_expr}, ' ') || ' ', "
        f"'{pat}')"
    )
    return (
        f"WITH {records_cte(pages_path)}\n{RECORDS_SELECT}\nWHERE {pred}"
    )


def sigterms_sql(
    pages_path: str, where_sql: str, k: int = 20, min_fg: int = 2
) -> str:
    """Twin of operators.fulltext.significant_terms: per-token
    foreground/background doc frequencies from one exploded pass plus
    a totals row, the SAME JLH dag (exact BIGINT counts through one
    fixed order of IEEE divisions/multiply), same (score DESC, token)
    cut. ``where_sql`` is the rendered foreground predicate
    (query.predicate_oracle_sql)."""
    toks = searchable_tokens_sql()
    fgp = "(CAST(fg_docs AS DOUBLE) / CAST(n_fg AS DOUBLE))"
    bgp = "(CAST(bg_docs AS DOUBLE) / CAST(n AS DOUBLE))"
    return f"""WITH {records_cte(pages_path)},
tok AS (
  SELECT CASE WHEN {where_sql} THEN 1 ELSE 0 END AS fg,
         unnest(list_distinct({toks})) AS token
  FROM records
),
totals AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CASE WHEN {where_sql} THEN 1 ELSE 0 END) AS BIGINT) AS n_fg
  FROM records
),
pt AS (
  SELECT token, CAST(sum(fg) AS BIGINT) AS fg_docs,
         CAST(count(*) AS BIGINT) AS bg_docs
  FROM tok GROUP BY token
)
SELECT token, fg_docs, bg_docs,
       ({fgp} - {bgp}) * ({fgp} / {bgp}) AS score
FROM pt, totals
WHERE fg_docs >= {int(min_fg)} AND {fgp} > {bgp}
ORDER BY score DESC, token
LIMIT {int(k)}"""


def complete_sql(pages_path: str, prefix: str, k: int = 10) -> str:
    """Twin of operators.fulltext.complete_prefix: per-doc-distinct
    token doc frequencies, prefix filter, (n_docs DESC, token) cut.
    ``prefix`` is validated [a-z0-9]+ by the operator — no LIKE
    metacharacter hazard."""
    toks = searchable_tokens_sql()
    return f"""WITH {records_cte(pages_path)},
tok AS (
  SELECT unnest(list_distinct({toks})) AS token FROM records
)
SELECT token, CAST(count(*) AS BIGINT) AS n_docs
FROM tok
WHERE token LIKE '{prefix.lower()}%'
GROUP BY token
ORDER BY n_docs DESC, token
LIMIT {int(k)}"""


def multiline_sql(
    pages_path: str, start_re: str = r"^\s*\{|^[0-9]"
) -> str:
    """Gaps-and-islands twin of operators.multiline.reassemble_multiline."""
    # standard-SQL single-quoted strings pass backslashes through to RE2
    esc = start_re.replace("'", "''")
    return f"""WITH pages AS (
  SELECT * FROM read_parquet('{pages_path}')
),
lines AS (
  SELECT url, u.pos AS pos, u.line AS line FROM (
    SELECT url,
           unnest([{{'pos': i - 1, 'line': sp[i]}} for i in generate_series(1, len(sp))]) AS u
    FROM (SELECT url, string_split(text, chr(10)) AS sp FROM pages)
  )
),
flagged AS (
  SELECT *, SUM(CASE WHEN regexp_matches(line, '{esc}') THEN 1 ELSE 0 END) OVER (
    PARTITION BY url ORDER BY pos
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
  ) AS rec_no
  FROM lines
)
SELECT url, CAST(rec_no AS BIGINT) AS rec_no, CAST(MIN(pos) AS INT) AS pos,
       CAST(count(*) AS BIGINT) AS n_lines,
       string_agg(line, chr(10) ORDER BY pos) AS record
FROM flagged GROUP BY url, rec_no"""


def fidelity_sql(pages_path: str) -> str:
    """Byte-identical html-extract vs text, per url (north_rule invariant)."""
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(CASE WHEN regexp_extract(decode(html), '(?s)<pre>(.*)</pre>', 1) = text
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_identical
FROM read_parquet('{pages_path}')"""
