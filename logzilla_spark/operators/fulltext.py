"""Full-text search over the records relation.

The reference README promises "Full-text search across all log fields"
(reference: README.md:28-31) but ships only LIKE/ILIKE on single
fields (querier/sqlbuilder.go:250-272, SURVEY.md §2.4). This module
builds the real thing, Spark-first, in two tiers:

1. ``full_text_search`` — direct scan predicate: tokenize the search
   string, require every token somewhere in the record's searchable
   text (message + source + level + metadata values). All built-in
   functions (lower/concat/array ops) — codegen'd, no Python; at scan
   time Catalyst pushes the time-range prune first so the token match
   only runs inside surviving partitions.

2. ``build_inverted_index`` / ``search_index`` — the 100 TB tier: a
   precomputed (token, id) posting-list table, bucketable by token.
   A query becomes K posting lookups + an intersection (groupBy id
   HAVING count = K), then a semi join back to records — the classic
   search-engine AND query as two shuffles on small intermediates,
   instead of a full corpus scan per query.

Tokenization is the same on both tiers and in the DuckDB oracle twin:
lowercase, split on non-alphanumeric runs, drop empties.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"[^a-z0-9]+"
POSTINGS_SUFFIX = "__postings"


def _tokens(col: Column) -> Column:
    return F.array_remove(F.split(F.lower(col), TOKEN_SPLIT_RE), "")


def query_tokens(query: str) -> list[str]:
    """The query's distinct tokens, sorted — same tokenizer as the
    record side and the DuckDB twin."""
    return sorted({t for t in re.split(TOKEN_SPLIT_RE, query.lower()) if t})


def searchable_text(df: DataFrame | None = None) -> Column:
    """One searchable string per record: message, source, level, and
    every metadata value ('across all log fields', README.md:29).
    Pure column construction — ``df`` is accepted for call-site
    readability but unused (the expression binds by column name)."""
    return F.concat_ws(
        " ",
        F.col("message"),
        F.col("source"),
        F.col("level"),
        F.concat_ws(" ", F.map_values("metadata")),
    )


def full_text_search(records: DataFrame, query: str) -> DataFrame:
    """Scan-tier search: records containing EVERY query token.

    Token containment, not substring: 'disk full' matches any record
    whose searchable fields contain tokens 'disk' and 'full' anywhere.
    """
    q_tokens = query_tokens(query)
    if not q_tokens:
        return records
    toks = _tokens(searchable_text(records))
    pred = None
    for t in q_tokens:
        c = F.array_contains(toks, t)
        pred = c if pred is None else (pred & c)
    return records.filter(pred)


def build_inverted_index(records: DataFrame, id_col: str = "id") -> DataFrame:
    """(token, id) posting list — distinct per record.

    At scale: write bucketed by token (``bucketBy(N, 'token')``) so
    every query's posting lookups are single-bucket scans and the
    intersection groupBy is co-partitioned (no shuffle).
    """
    return (
        records.select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(_tokens(searchable_text(records)))).alias("token"),
        )
        .distinct()
    )


def search_index(
    index: DataFrame, records: DataFrame, query: str, id_col: str = "id"
) -> DataFrame:
    """Index-tier AND search: intersect posting lists, semi-join back.

    Plan: filter index to the K query tokens (pushes to the token
    column — partition/bucket prunable), count distinct tokens per id,
    keep ids with all K, left-semi join records. The record scan only
    materializes matching rows.
    """
    q_tokens = query_tokens(query)
    if not q_tokens:
        return records
    hits = (
        index.filter(F.col("token").isin(q_tokens))
        .groupBy("id")
        .agg(F.countDistinct("token").alias("_k"))
        .filter(F.col("_k") == len(q_tokens))
        .select("id")
    )
    return records.join(
        hits.withColumnRenamed("id", id_col), id_col, "left_semi"
    )


def build_fulltext_index_table(
    records: DataFrame, catalog, name: str, id_col: str = "id"
) -> int:
    """Commit the posting list as a snapshot-versioned catalog table
    ``<name>__postings``, CLUSTERED BY token (range-repartition + sort,
    sources/catalog.py _stage_write), replacing any previous build
    atomically — the committed index table the inline tier's persist
    only stands in for (round-3 verdict on q_fulltext_index).

    The clustering is the serving layout: each data file owns a
    disjoint token range whose [min, max] lands in the snapshot
    manifest, so a query's K token lookups prune to the <= K files
    whose range covers them — file-level, from committed metadata,
    before Spark lists anything. At 100 TB the postings table is
    rebuilt/compacted by a batch job while readers keep the previous
    snapshot (catalog semantics), exactly Iceberg's
    rewrite + time-travel story.
    """
    return catalog.overwrite(
        build_inverted_index(records, id_col),
        name + POSTINGS_SUFFIX,
        cluster_by=["token"],
        summary={"kind": "fulltext_postings", "id_col": id_col},
    )


def update_fulltext_index(
    new_records: DataFrame, catalog, name: str, id_col: str = "id"
) -> int:
    """Incremental maintenance: APPEND the postings of newly-ingested
    records (records are append-only in this engine — O2 tail
    semantics — so index maintenance is append-only too; no tombstone
    path needed). The appended batch is itself clustered by token, so
    its files get their own manifest ranges and serving stays
    file-pruned across an arbitrary mix of base build + increments;
    ``LocalCatalog.compact(..., cluster_by=['token'])`` re-clusters a
    fragmented index back to one range-partitioned layout without
    breaking readers."""
    return catalog.append(
        build_inverted_index(new_records, id_col),
        name + POSTINGS_SUFFIX,
        cluster_by=["token"],
        summary={"kind": "fulltext_postings", "id_col": id_col},
    )


def serve_fulltext(
    spark: SparkSession,
    catalog,
    name: str,
    records: DataFrame,
    query: str,
    id_col: str = "id",
) -> DataFrame:
    """Index-tier AND search served from the COMMITTED postings table:
    read only the posting files whose manifest token range can contain
    a query token (catalog.read_stats_pruned — zero data or footer IO
    for the rest of the index), intersect, semi-join records. Result
    is identical to ``search_index(build_inverted_index(records), …)``
    over the records the index was built from — the persistence layer
    must not perturb a row (tested)."""
    q_tokens = query_tokens(query)
    if not q_tokens:
        return records
    postings = catalog.read_stats_pruned(
        spark, name + POSTINGS_SUFFIX, "token", q_tokens
    )
    if postings is None:
        # every committed file's token range provably misses all query
        # tokens -> nothing matches
        return records.filter(F.lit(False))
    return search_index(postings, records, query, id_col)


# --------------------------------------------------------------------------
# Phrase search — token-adjacency semantics over the searchable text
# --------------------------------------------------------------------------
#
# "Full-text search across all log fields" (reference README.md:28-31)
# in every real search engine comes with quoted-phrase queries; the
# boolean tiers above are AND-of-tokens, this tier requires the query
# tokens to appear CONSECUTIVELY, in order. Two tiers again:
#
# 1. ``full_text_phrase`` — scan tier: the record's token array joined
#    by single spaces contains the space-joined phrase with token
#    delimiters. One codegen'd string `contains` per record — no
#    explode, no shuffle. Adjacency is over the concatenated
#    searchable text, so a phrase may deliberately span a field
#    boundary (message's last token followed by source's first) —
#    that IS the "across all fields" contract, and the DuckDB twin
#    (oracle.phrase_sql) mirrors it exactly.
#
# 2. ``build_positional_index`` / ``search_phrase_index`` — the 100 TB
#    tier: a positional posting table (id, pos, token). A k-token
#    phrase query joins the postings of the query's tokens (token
#    lookups — bucket/file-prunable like the boolean index) against a
#    k-row broadcast (j, token) table and groups on (id, pos - j): a
#    group holding all k offsets j is a phrase occurrence starting at
#    pos - j. Work is proportional to the query tokens' posting lists,
#    never the corpus; the one shuffle is on that small intermediate.

PHRASE_POSTINGS_SUFFIX = "__postings_pos"


def phrase_tokens(query: str) -> list[str]:
    """The phrase's tokens in order, duplicates kept — same tokenizer
    as :func:`query_tokens` but position-preserving."""
    return [t for t in re.split(TOKEN_SPLIT_RE, query.lower()) if t]


def full_text_phrase(records: DataFrame, phrase: str) -> DataFrame:
    """Scan-tier phrase search: records whose searchable tokens contain
    the phrase's tokens consecutively, in order."""
    toks = phrase_tokens(phrase)
    if not toks:
        return records
    haystack = F.concat(
        F.lit(" "),
        F.array_join(_tokens(searchable_text(records)), " "),
        F.lit(" "),
    )
    return records.filter(haystack.contains(" " + " ".join(toks) + " "))


def build_positional_index(records: DataFrame, id_col: str = "id") -> DataFrame:
    """(id, pos, token) positional postings — one row per token
    OCCURRENCE (no distinct: positions are the payload). Same
    at-scale layout story as :func:`build_inverted_index` — write
    clustered/bucketed by token so query-token lookups are pruned
    scans; ~dl rows per record instead of ~distinct(dl), the standard
    positional-index size trade."""
    return records.select(
        F.col(id_col).alias("id"),
        F.posexplode(_tokens(searchable_text(records))).alias("pos", "token"),
    )


def search_phrase_index(
    index: DataFrame, records: DataFrame, phrase: str, id_col: str = "id"
) -> DataFrame:
    """Index-tier phrase search over positional postings.

    Plan: prune the index to the phrase's distinct tokens (pushed
    isin — partition/bucket/file prunable), broadcast-join the k-row
    (j, token) offsets table, group by (id, pos - j) and demand all k
    offsets. Ids with >= 1 phrase start semi-join back to records.
    Duplicate phrase tokens are handled by construction: offset j is
    only satisfied by token toks[j] at pos = base + j.
    """
    toks = phrase_tokens(phrase)
    if not toks:
        return records
    spark = index.sparkSession
    offsets = spark.createDataFrame(
        list(enumerate(toks)), "j int, token string"
    )
    hits = (
        index.filter(F.col("token").isin(sorted(set(toks))))
        .join(F.broadcast(offsets), "token")
        .groupBy(F.col("id"), (F.col("pos") - F.col("j")).alias("_base"))
        .agg(F.countDistinct("j").alias("_k"))
        .filter(F.col("_k") == len(toks))
        .select("id")
        .distinct()
    )
    return records.join(
        hits.withColumnRenamed("id", id_col), id_col, "left_semi"
    )


def build_phrase_index_table(
    records: DataFrame, catalog, name: str, id_col: str = "id"
) -> int:
    """Commit the positional postings as ``<name>__postings_pos``,
    CLUSTERED BY token — identical serving/pruning story to
    :func:`build_fulltext_index_table` (file-level manifest token
    ranges), with positions riding along in the same files."""
    return catalog.overwrite(
        build_positional_index(records, id_col),
        name + PHRASE_POSTINGS_SUFFIX,
        cluster_by=["token"],
        summary={"kind": "phrase_postings", "id_col": id_col},
    )


def serve_phrase(
    spark: SparkSession,
    catalog,
    name: str,
    records: DataFrame,
    phrase: str,
    id_col: str = "id",
) -> DataFrame:
    """Phrase search served from the COMMITTED positional index:
    manifest-stats file pruning on the phrase's tokens, then the
    offset-join intersection, then the records semi-join. Row-identical
    to ``search_phrase_index(build_positional_index(records), ...)``
    over the records the index was built from."""
    toks = phrase_tokens(phrase)
    if not toks:
        return records
    postings = catalog.read_stats_pruned(
        spark, name + PHRASE_POSTINGS_SUFFIX, "token", sorted(set(toks))
    )
    if postings is None:
        return records.filter(F.lit(False))
    return search_phrase_index(postings, records, phrase, id_col)


# --------------------------------------------------------------------------
# Typeahead completion — token-prefix suggestions (ES completion
# suggester / Loki label-values class)
# --------------------------------------------------------------------------
#
# "What tokens start with what the user typed so far", ranked by doc
# frequency. Two tiers: a corpus scan (explode distinct tokens,
# prefix filter, count) for index-less frames, and the committed
# boolean postings table (token, id) — where a prefix is a RANGE over
# the token-clustered layout, so manifest min/max stats prune to just
# the files whose token range overlaps [prefix, prefix+0xFFFF): a
# keystroke's suggestions cost one or two posting files, never the
# index, never the corpus.

_PREFIX_RE = re.compile(r"[a-z0-9]+")


def _check_prefix(prefix: str) -> str:
    p = prefix.lower()
    if not _PREFIX_RE.fullmatch(p):
        raise ValueError(
            "complete_prefix: prefix must be one [a-z0-9]+ token"
        )
    return p


def complete_prefix(records: DataFrame, prefix: str, k: int = 10) -> DataFrame:
    """Scan-tier completion: (token, n_docs) for tokens extending
    ``prefix``, top-k by (n_docs DESC, token ASC) — doc frequency via
    the same per-doc-distinct tokenization as the boolean index, so
    the scan tier and the postings tier can never disagree."""
    p = _check_prefix(prefix)
    return (
        records.select(
            F.explode(
                F.array_distinct(_tokens(searchable_text(records)))
            ).alias("token")
        )
        .filter(F.col("token").startswith(p))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.col("token"))
        .limit(k)
    )


def complete_prefix_index(index: DataFrame, prefix: str, k: int = 10) -> DataFrame:
    """Completion from a (token, id) posting table — postings are
    distinct per (token, doc), so doc frequency is a plain count."""
    p = _check_prefix(prefix)
    return (
        index.filter(F.col("token").startswith(p))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy(F.col("n_docs").desc(), F.col("token"))
        .limit(k)
    )


def serve_complete(
    spark: SparkSession, catalog, name: str, prefix: str, k: int = 10
) -> DataFrame:
    """Completion served from the COMMITTED postings table with
    file-level prefix-range pruning: the token-clustered layout means
    tokens extending ``prefix`` live only in files whose manifest
    [min, max] overlaps [prefix, prefix + U+FFFF] (tokens are
    [a-z0-9]+, so the sentinel upper bound is unreachable)."""
    p = _check_prefix(prefix)
    postings = catalog.read_stats_pruned(
        spark, name + POSTINGS_SUFFIX, "token", ranges=[(p, p + "￿")]
    )
    if postings is None:
        return spark.createDataFrame([], "token string, n_docs bigint")
    return complete_prefix_index(postings, prefix, k)


# --------------------------------------------------------------------------
# Significant terms — "what is unusual about this slice" (ES
# significant_terms class)
# --------------------------------------------------------------------------


def significant_terms(
    records: DataFrame,
    query,
    k: int = 20,
    min_fg: int = 2,
    time_column: str = "timestamp",
    field_resolver=None,
) -> DataFrame:
    """Tokens OVERREPRESENTED in the query's result slice relative to
    the whole records frame — the triage primitive above facets: facets
    show the distribution of fields you name, significant terms
    surface the words you didn't know to ask for ("all the ERROR spike
    docs mention 'upstream'").

    Semantics (ES significant_terms with the JLH heuristic): for each
    token, foreground doc frequency fg (docs matching the query's
    assembled predicate — the SAME time-range + node filter the hits
    page uses, so the slice can never drift from what the user sees)
    and background doc frequency bg (all docs in the frame, a superset
    of the foreground); keep tokens with fg >= min_fg and foreground
    share strictly above background share; score

        jlh = (fg% - bg%) * (fg% / bg%)

    (absolute lift x relative lift). The dag is the division/multiply
    of exact BIGINT counts in one fixed order — bit-identical in the
    DuckDB twin — and the cut is (score DESC, token ASC), a total
    order, so top-k is deterministic.

    Plan shape (scale): ONE exploded pass over the corpus computing
    per-token (fg, bg) via conditional aggregation — the token-keyed
    shuffle carries one row per (doc, distinct token); plus one
    column-pruned count-only pass for the two totals, broadcast back
    via crossJoin (1 row). No corpus re-scan per slice side, no window
    functions, TakeOrderedAndProject for the cut.

    Output: (token, fg_docs, bg_docs, score).
    """
    from logzilla_spark.operators.query import (
        _assemble_predicate,
        default_field_resolver,
    )

    if k < 1:
        raise ValueError("significant_terms: k must be >= 1")
    query.validate()
    pred, _backward, _tc = _assemble_predicate(
        query, time_column, field_resolver or default_field_resolver
    )
    totals = records.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(pred.cast("bigint")).alias("_n_fg"),
    )
    per_token = (
        records.select(
            pred.cast("bigint").alias("_fg"),
            F.explode(
                F.array_distinct(_tokens(searchable_text(records)))
            ).alias("token"),
        )
        .groupBy("token")
        .agg(
            F.sum("_fg").alias("fg_docs"),
            F.count(F.lit(1)).alias("bg_docs"),
        )
    )
    fgp = F.col("fg_docs").cast("double") / F.col("_n_fg").cast("double")
    bgp = F.col("bg_docs").cast("double") / F.col("_n").cast("double")
    return (
        per_token.crossJoin(F.broadcast(totals))
        .filter((F.col("fg_docs") >= min_fg) & (fgp > bgp))
        .select(
            "token",
            "fg_docs",
            "bg_docs",
            ((fgp - bgp) * (fgp / bgp)).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("token"))
        .limit(k)
    )


# --------------------------------------------------------------------------
# Proximity (slop) search — "these words near each other, in order"
# --------------------------------------------------------------------------
#
# The tier between AND (tokens anywhere) and phrase (tokens adjacent):
# the query tokens must appear IN ORDER with at most ``slop``
# non-matching tokens between each consecutive pair (per-gap slop, the
# "within N words of each other" reading; slop=0 degenerates to the
# phrase semantics exactly). Same two-tier story as the phrase layer:
#
# 1. ``full_text_near`` — scan tier: ONE regexp over the
#    sentinel-delimited space-joined token string. Tokens are
#    [a-z0-9]+ by the shared tokenizer, so the gap is the literal
#    pattern ``(?: [a-z0-9]+){0,slop}`` — no escaping hazard, and the
#    pattern text is byte-identical on Spark (Java regex) and DuckDB
#    (RE2): both support bounded quantifiers and non-capturing groups.
#
# 2. ``search_near_index`` — the 100 TB tier over the SAME committed
#    positional postings table the phrase tier serves from: prune the
#    postings to the query's tokens (file-prunable token lookups),
#    then chain k-1 id-keyed equi-joins, each keeping positions whose
#    gap to the previous token's position is in [1, slop+1], with a
#    distinct per step so a token repeated m times in one document
#    contributes one row per distinct reachable position, never m^k
#    blowup. Work is proportional to the query tokens' posting lists;
#    the corpus is only touched by the final semi join.


def full_text_near(records: DataFrame, query: str, slop: int = 1) -> DataFrame:
    """Scan-tier proximity search: query tokens in order, at most
    ``slop`` intervening tokens between each consecutive pair."""
    if slop < 0:
        raise ValueError("full_text_near: slop must be >= 0")
    toks = phrase_tokens(query)
    if not toks:
        return records
    haystack = F.concat(
        F.lit(" "),
        F.array_join(_tokens(searchable_text(records)), " "),
        F.lit(" "),
    )
    return records.filter(haystack.rlike(near_pattern(toks, slop)))


def near_pattern(toks: list[str], slop: int) -> str:
    """The shared scan-tier regex: `` tok1(?: [a-z0-9]+){0,slop} tok2
    … `` over the sentinel-delimited token string. Identical pattern
    text on both engines (Java regex / RE2)."""
    gap = "(?: [a-z0-9]+){0,%d} " % slop
    return " " + gap.join(toks) + " "


def search_near_index(
    index: DataFrame,
    records: DataFrame,
    query: str,
    slop: int = 1,
    id_col: str = "id",
) -> DataFrame:
    """Index-tier proximity search over positional postings.

    Plan: prune postings to the query's distinct tokens (pushed isin),
    then a left-to-right chain — candidate (id, position-of-token-j)
    pairs joined to token j+1's postings on id, keeping positions with
    gap in [1, slop+1]. Each step is a codegen'd equi-join on id over
    posting-list-sized frames with a distinct to bound repeated-token
    fan-out. slop=0 is row-identical to ``search_phrase_index``."""
    if slop < 0:
        raise ValueError("search_near_index: slop must be >= 0")
    toks = phrase_tokens(query)
    if not toks:
        return records
    pruned = index.filter(F.col("token").isin(sorted(set(toks))))
    cand = (
        pruned.filter(F.col("token") == toks[0])
        .select("id", F.col("pos").alias("_p"))
        .distinct()
    )
    for t in toks[1:]:
        nxt = pruned.filter(F.col("token") == t).select(
            F.col("id"), F.col("pos").alias("_q")
        )
        gap = F.col("_q") - F.col("_p")
        cand = (
            cand.join(nxt, "id")
            .filter((gap >= 1) & (gap <= slop + 1))
            .select("id", F.col("_q").alias("_p"))
            .distinct()
        )
    hits = cand.select("id").distinct()
    return records.join(
        hits.withColumnRenamed("id", id_col), id_col, "left_semi"
    )


def serve_near(
    spark: SparkSession,
    catalog,
    name: str,
    records: DataFrame,
    query: str,
    slop: int = 1,
    id_col: str = "id",
) -> DataFrame:
    """Proximity search served from the SAME committed positional
    postings table the phrase tier uses (``<name>__postings_pos``) —
    manifest-stats file pruning on the query's tokens, then the chain
    join. One committed index serves phrase AND near queries."""
    toks = phrase_tokens(query)
    if not toks:
        return records
    postings = catalog.read_stats_pruned(
        spark, name + PHRASE_POSTINGS_SUFFIX, "token", sorted(set(toks))
    )
    if postings is None:
        return records.filter(F.lit(False))
    return search_near_index(postings, records, query, slop, id_col)


# --------------------------------------------------------------------------
# BM25 relevance ranking (Robertson '94) — the scored tier above the
# boolean AND search
# --------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    records: DataFrame,
    query: str,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    id_col: str = "id",
) -> DataFrame:
    """Top-k records by BM25 relevance (OR semantics: any matching
    term scores; the boolean tiers keep AND).

    Spark-first shape — ZERO token-grain shuffles: term frequencies
    are per-term ``size(filter(tokens, x -> x = t))`` array
    expressions (no explode), corpus stats (N, Σdl, per-term document
    frequencies) come from ONE single-row aggregate broadcast back via
    crossJoin, scoring is one projection, and the cut is
    TakeOrderedAndProject on (score DESC, id ASC). Two column-pruned
    scans of the records frame total (stats + scoring) — at 100 TB
    that beats persisting a tokenized corpus copy.

    Cross-engine determinism: idf uses the module-standard fixed-point
    log2 of an exact integer ratio-ppm — ``idf_t = log2((2N + 2) /
    (2 df_t + 1)) / 1`` bits, never ln() — and the remaining score is
    ONE fixed IEEE dag (identical expression text in the DuckDB twin),
    so scores hash bit-identically and the (score, id) top-k cut
    selects identical rows. Ties at rank k break by id ascending.

    Output: (id, n_terms_matched, score), score > 0 only (docs
    matching no term never rank).
    """
    from logzilla_spark.operators.textstats import (
        DSIR_FRAC_BITS,
        DSIR_LOG2_FP_1M,
    )

    q_tokens = query_tokens(query)
    if not q_tokens:
        raise ValueError("bm25_topk: query has no tokens")
    fb = 1 << DSIR_FRAC_BITS

    def _tf_pred(tok: str):
        # single-arg lambda: a two-arg lambda would make F.filter pass
        # the element INDEX as the second argument
        return lambda x: x == F.lit(tok)

    toks = records.select(
        F.col(id_col).alias("id"),
        _tokens(searchable_text(records)).alias("_t"),
    ).select(
        "id",
        F.size("_t").cast("bigint").alias("_dl"),
        *[
            F.size(F.filter("_t", _tf_pred(t)))
            .cast("bigint")
            .alias(f"_tf{i}")
            for i, t in enumerate(q_tokens)
        ],
    )
    stats = toks.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dl").alias("_sumdl"),
        *[
            F.sum((F.col(f"_tf{i}") > 0).cast("bigint")).alias(f"_df{i}")
            for i in range(len(q_tokens))
        ],
    )
    # idf in bits via the fixed-point log2 of the exact rational
    # (N - df + 0.5)/(df + 0.5) + 1 == (2N + 2)/(2 df + 1), as ppm
    def _idf(i: int):
        r = f"greatest((1000000 * (2 * _n + 2)) div (2 * _df{i} + 1), 1L)"
        return F.expr(
            f"cast((cast(length(bin({r})) - 1 as bigint) * {fb} "
            f"+ (({r}) * {fb}) div shiftleft(cast(1 as bigint), "
            f"length(bin({r})) - 1) - {fb}) - {DSIR_LOG2_FP_1M} as double) / {fb}"
        )

    # one fixed IEEE dag per term; identical text in the DuckDB twin
    def _term_score(i: int):
        tf = F.col(f"_tf{i}").cast("double")
        norm = F.lit(1.0) - F.lit(b) + F.lit(b) * (
            F.col("_dl").cast("double")
            / (F.col("_sumdl").cast("double") / F.col("_n").cast("double"))
        )
        return F.when(
            F.col(f"_tf{i}") > 0,
            F.col(f"_idf{i}")
            * (tf * F.lit(k1 + 1.0) / (tf + F.lit(k1) * norm)),
        ).otherwise(F.lit(0.0))

    scored = toks.crossJoin(
        F.broadcast(
            stats.select(
                "_n",
                "_sumdl",
                *[_idf(i).alias(f"_idf{i}") for i in range(len(q_tokens))],
            )
        )
    ).select(
        "id",
        sum(
            ((F.col(f"_tf{i}") > 0).cast("int") for i in range(len(q_tokens))),
            F.lit(0),
        ).alias("n_terms_matched"),
        sum(
            (_term_score(i) for i in range(len(q_tokens))), F.lit(0.0)
        ).alias("score"),
    )
    return (
        scored.filter(F.col("n_terms_matched") > 0)
        .orderBy(F.col("score").desc(), F.col("id"))
        .limit(k)
    )


def bm25_topk_sql(
    records_relation: str,
    query: str,
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    """DuckDB twin of :func:`bm25_topk` — same tokenizer, same exact
    integer idf, same IEEE score dag, same (score DESC, id) cut. The
    searchable string mirrors ``searchable_text`` over the flattened
    records CTE (message, source, level, m_* values)."""
    from logzilla_spark.operators.textstats import (
        DSIR_FRAC_BITS,
        DSIR_LOG2_FP_1M,
    )

    q_tokens = query_tokens(query)
    fb = 1 << DSIR_FRAC_BITS
    meta = ", ".join(
        f"coalesce(m_{k_}, '')"
        for k_ in ["service", "request_id", "attempt", "ip", "method",
                   "path", "status", "size"]
    )
    tf_cols = ",\n         ".join(
        f"CAST(len(list_filter(t, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(q_tokens)
    )
    df_cols = ",\n         ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(q_tokens))
    )

    def _idf(i: int) -> str:
        r = f"greatest((1000000 * (2 * n + 2)) // (2 * df{i} + 1), 1)"
        return (
            f"CAST((CAST(length(printf('%b', {r})) - 1 AS BIGINT) * {fb} "
            f"+ (({r}) * {fb}) // (1::BIGINT << (length(printf('%b', {r})) - 1)) "
            f"- {fb}) - {DSIR_LOG2_FP_1M} AS DOUBLE) / {fb}"
        )

    idf_cols = ",\n         ".join(
        f"{_idf(i)} AS idf{i}" for i in range(len(q_tokens))
    )
    match_sum = " + ".join(
        f"CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END" for i in range(len(q_tokens))
    )
    score_sum = " + ".join(
        f"CASE WHEN tf{i} > 0 THEN idf{i} * (CAST(tf{i} AS DOUBLE) * {k1 + 1.0!r} "
        f"/ (CAST(tf{i} AS DOUBLE) + {k1!r} * (1.0 - {b!r} + {b!r} * "
        f"(CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))) "
        f"ELSE 0.0 END"
        for i in range(len(q_tokens))
    )
    return f"""
toks AS (
  SELECT id, CAST(len(t) AS BIGINT) AS dl,
         {tf_cols}
  FROM (
    SELECT id, list_filter(string_split_regex(lower(
             concat_ws(' ', message, source, level, {meta})),
             '[^a-z0-9]+'), x -> x != '') AS t
    FROM {records_relation}
  )
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS sumdl,
         {df_cols}
  FROM toks
),
idfs AS (
  SELECT n, sumdl,
         {idf_cols}
  FROM stats
)
SELECT id,
       CAST({match_sum} AS INT) AS n_terms_matched,
       {score_sum} AS score
FROM toks, idfs
WHERE {match_sum} > 0
ORDER BY score DESC, id
LIMIT {int(k)}"""
