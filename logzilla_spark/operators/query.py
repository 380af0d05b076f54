"""Search query layer: filter trees compiled to Catalyst Column expressions.

Reimplements the reference's query path (reference: querier/querier.go,
querier/node.go, querier/sqlbuilder.go) where a ``QueryNode`` tree plus
time-range/sort/limit params compile to a single SQL statement pushed to
ClickHouse. Here the tree compiles directly to a ``pyspark.sql.Column``
predicate and the chain ``filter -> orderBy -> limit -> select`` —
Catalyst plans it (ORDER BY+LIMIT becomes TakeOrderedAndProject, i.e.
true distributed top-k; filters and projection push down to the scan).

Reference quirks preserved (each tested):
- start/end auto-swap when reversed (querier/sqlbuilder.go:89-97);
- End < Start requested => backward chronology => timestamp DESC
  (querier/querier.go:69-74, sqlbuilder.go:122-125);
- timestamp appended as sort tie-breaker when absent
  (querier/sqlbuilder.go:153-161);
- limit clamped to [1, 1000] (querier/querier.go:76-87);
- sort fields validated against a whitelist (sqlbuilder.go:127-131,
  default ["source","level","timestamp"], configured
  storage/clickhouse.go:36);
- filter fields validated against the field whitelist pattern including
  ``metadata.key`` paths (storage/clickhouse.go:16);
- empty AND/OR nodes collapse to no-op (sqlbuilder.go:220-228);
- the Column API is parameterized by construction — no string SQL, no
  injection surface (sqlbuilder.go's `?` placeholders, :247-274).
"""

from __future__ import annotations

import functools
import operator as pyop
import re
from dataclasses import dataclass, field
from datetime import datetime
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# reference: storage/clickhouse.go:16
FIELD_PATTERN = re.compile(
    r'^(id|level|timestamp|message|source|metadata(\.("[^"]+"|[a-zA-Z0-9_]+))?)$'
)
# reference: storage/clickhouse.go:35-36
DEFAULT_SELECT_COLUMNS = ["id", "source", "timestamp", "level", "message", "metadata"]
DEFAULT_SORT_WHITELIST = ["source", "level", "timestamp"]

MAX_LIMIT = 1000  # querier/querier.go:79
DEFAULT_LIMIT = 100


class QueryValidationError(ValueError):
    pass


# --------------------------------------------------------------------------
# node tree (reference: querier/node.go:6-77)
# --------------------------------------------------------------------------


class QueryNode:
    """Sealed filter-tree node (sum type in the reference)."""

    def to_column(self, field_resolver) -> Column | None:
        raise NotImplementedError

    def to_sql(self, field_sql) -> str | None:
        """ANSI SQL rendering for the DuckDB oracle (test-only)."""
        raise NotImplementedError


def _compose(children: Sequence[QueryNode], fn, op_sql: str, field_resolver, field_sql, sql: bool):
    rendered = []
    for ch in children:
        r = ch.to_sql(field_sql) if sql else ch.to_column(field_resolver)
        if r is not None:
            rendered.append(r)
    if not rendered:  # empty node collapses (sqlbuilder.go:220-228)
        return None
    if sql:
        return "(" + f" {op_sql} ".join(rendered) + ")"
    return functools.reduce(fn, rendered)


@dataclass
class AndNode(QueryNode):
    children: list[QueryNode] = field(default_factory=list)

    def to_column(self, field_resolver):
        return _compose(self.children, pyop.and_, "AND", field_resolver, None, False)

    def to_sql(self, field_sql):
        return _compose(self.children, None, "AND", None, field_sql, True)


@dataclass
class OrNode(QueryNode):
    children: list[QueryNode] = field(default_factory=list)

    def to_column(self, field_resolver):
        return _compose(self.children, pyop.or_, "OR", field_resolver, None, False)

    def to_sql(self, field_sql):
        return _compose(self.children, None, "OR", None, field_sql, True)


@dataclass
class NotNode(QueryNode):
    child: QueryNode

    def to_column(self, field_resolver):
        c = self.child.to_column(field_resolver)
        return None if c is None else ~c

    def to_sql(self, field_sql):
        s = self.child.to_sql(field_sql)
        return None if s is None else f"NOT ({s})"


# the 9 comparison operators (querier/node.go:40-59)
OPS = ("eq", "ne", "gt", "lt", "gte", "lte", "like", "ilike", "in")
_OP_SQL = {
    "eq": "=", "ne": "!=", "gt": ">", "lt": "<", "gte": ">=", "lte": "<=",
    "like": "LIKE", "ilike": "ILIKE", "in": "IN",
}


def _sql_lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if v is None:
        raise QueryValidationError("nil comparison value")  # sqlbuilder.go:238
    return str(v)


@dataclass
class ComparisonNode(QueryNode):
    field_name: str
    value: object
    op: str  # one of OPS

    def _check(self):
        if self.op not in OPS:
            raise QueryValidationError(f"unknown operator {self.op!r}")
        if not self.field_name:
            raise QueryValidationError("empty field name")  # sqlbuilder.go:239
        if self.value is None:
            raise QueryValidationError("nil value")  # sqlbuilder.go:238
        if not FIELD_PATTERN.match(self.field_name):
            raise QueryValidationError(f"field not allowed: {self.field_name!r}")

    def to_column(self, field_resolver):
        self._check()
        col = field_resolver(self.field_name)
        v = self.value
        if self.op == "eq":
            return col == v
        if self.op == "ne":
            return col != v
        if self.op == "gt":
            return col > v
        if self.op == "lt":
            return col < v
        if self.op == "gte":
            return col >= v
        if self.op == "lte":
            return col <= v
        if self.op == "like":
            return col.like(v)
        if self.op == "ilike":
            return col.ilike(v)
        if self.op == "in":
            if not isinstance(v, (list, tuple)):
                raise QueryValidationError("IN requires a list value")
            return col.isin(*v)
        raise AssertionError

    def to_sql(self, field_sql):
        self._check()
        lhs = field_sql(self.field_name)
        if self.op == "in":
            vals = ", ".join(_sql_lit(x) for x in self.value)
            return f"{lhs} IN ({vals})"
        return f"{lhs} {_OP_SQL[self.op]} {_sql_lit(self.value)}"


@dataclass
class RegexNode(QueryNode):
    """T76: regex line/field filter (Loki ``|~ "re"`` / ES
    ``field:/re/``) in the sealed tree — the tier between ILIKE's
    ``%``-globs and the phrase/proximity terms.

    The pattern must pass the T69 dialect-portable validator
    (operators/extract.py), so ONE pattern string evaluates
    identically on Java regex (``Column.rlike``) and RE2 (DuckDB
    ``regexp_matches``) — both engines use SEARCH semantics
    (unanchored; anchor with ``^``/``$`` explicitly). Negation is
    composition (``NotNode`` / DSL ``NOT`` — Loki's ``!~``)."""

    field_name: str
    pattern: str

    def _check(self):
        from .extract import _validate_portable_regex

        if not self.field_name:
            raise QueryValidationError("empty field name")
        if not FIELD_PATTERN.match(self.field_name):
            raise QueryValidationError(f"field not allowed: {self.field_name!r}")
        if self.field_name == "timestamp":
            # regex over a temporal value is never what anyone means
            # (and rlike on a timestamp column is a cast hazard)
            raise QueryValidationError("regex does not apply to timestamp")
        if not isinstance(self.pattern, str):
            raise QueryValidationError("regex: expected a pattern string")
        _validate_portable_regex(self.pattern)  # raises with position

    def to_column(self, field_resolver):
        self._check()
        return field_resolver(self.field_name).rlike(self.pattern)

    def to_sql(self, field_sql):
        self._check()
        lit = self.pattern.replace("'", "''")
        return f"regexp_matches({field_sql(self.field_name)}, '{lit}')"


@dataclass
class PhraseNode(QueryNode):
    """T65: quoted-phrase / proximity term in the sealed tree —
    ``"disk full"~N`` in the DSL. The T63/T64 scan semantics (query
    tokens in order over the FULL searchable text — message, source,
    level, metadata values — with at most ``slop`` intervening tokens
    per gap; slop=0 = exact adjacency) as a composable filter node, so
    phrases participate in AND/OR/NOT alongside comparisons on every
    search surface (search page, facets, range queries, live tail)
    with zero new code paths there.

    ``to_sql`` renders against the oracle records twin's flattened
    shape (metadata values as m_* columns) like
    :func:`default_field_sql` — the phrase spans all fields, so the
    per-field ``field_sql`` hook does not apply."""

    phrase: str
    slop: int = 0

    def _check(self):
        if self.slop < 0:
            raise QueryValidationError("phrase slop must be >= 0")

    def to_column(self, field_resolver):
        from logzilla_spark.operators.fulltext import (
            _tokens,
            near_pattern,
            phrase_tokens,
            searchable_text,
        )

        self._check()
        toks = phrase_tokens(self.phrase)
        if not toks:
            return None  # no tokens -> no constraint (empty-node collapse)
        hay = F.concat(
            F.lit(" "), F.array_join(_tokens(searchable_text()), " "), F.lit(" ")
        )
        if self.slop == 0:
            return hay.contains(" " + " ".join(toks) + " ")
        return hay.rlike(near_pattern(toks, self.slop))

    def to_sql(self, field_sql):
        from logzilla_spark.operators.fulltext import near_pattern, phrase_tokens
        from logzilla_spark.oracle import searchable_tokens_sql

        self._check()
        toks = phrase_tokens(self.phrase)
        if not toks:
            return None
        hay = f"' ' || array_to_string({searchable_tokens_sql()}, ' ') || ' '"
        # tokens are [a-z0-9]+ by construction — no quoting hazard
        if self.slop == 0:
            return f"contains({hay}, ' {' '.join(toks)} ')"
        return f"regexp_matches({hay}, '{near_pattern(toks, self.slop)}')"


# --------------------------------------------------------------------------
# Query params (reference: querier/querier.go:34-94)
# --------------------------------------------------------------------------


@dataclass
class SortField:
    name: str
    descending: bool = False


# --------------------------------------------------------------------------
# O33 — keyset cursor pagination. The reference declares a response
# cursor but never implements it (storage/clickhouse.go:211 TODO,
# unused skipID sqlbuilder.go:53). Implemented here as strict keyset
# pagination over the total order (timestamp, id): O(page) work per
# page at any depth — no OFFSET scan, which at 100 TB is the only
# viable pagination (OFFSET re-reads every earlier row).
# --------------------------------------------------------------------------


def encode_cursor(ts: datetime, row_id: str) -> str:
    """Opaque continuation token from the last row of a page."""
    import base64
    import json as _json

    return base64.urlsafe_b64encode(
        _json.dumps({"ts": ts.isoformat(), "id": row_id}).encode()
    ).decode()


def decode_cursor(cursor: str) -> tuple[datetime, str]:
    import base64
    import json as _json

    try:
        obj = _json.loads(base64.urlsafe_b64decode(cursor.encode()))
        return datetime.fromisoformat(obj["ts"]), obj["id"]
    except Exception as e:  # noqa: BLE001
        raise QueryValidationError(f"malformed cursor: {e}") from e


def next_cursor(rows, time_column: str = "timestamp") -> str | None:
    """Continuation token for the page after ``rows`` (collected Rows).

    Returns None when the page was empty (end of results).
    """
    if not rows:
        return None
    last = rows[-1]
    return encode_cursor(last[time_column], last["id"])


@dataclass
class Query:
    start: datetime  # mandatory (querier/querier.go:89-91)
    end: datetime | None = None
    node: QueryNode | None = None
    sort: list[SortField] = field(default_factory=list)
    limit: int = DEFAULT_LIMIT
    select_columns: list[str] | None = None
    # O33 keyset cursor: opaque token from ``next_cursor``. When set,
    # the custom sort is ignored — keyset pagination requires the total
    # (timestamp, id) order to be stable across pages.
    cursor: str | None = None

    def validate(self, sort_whitelist: Sequence[str] = DEFAULT_SORT_WHITELIST) -> None:
        # reference Query.Validate (querier/querier.go:76-94) — the Go API
        # handler forgets to call it (api/handler.go:9-41); we always do.
        if self.start is None:
            raise QueryValidationError("start is required")
        if not (1 <= self.limit <= MAX_LIMIT):
            raise QueryValidationError(f"limit must be in [1, {MAX_LIMIT}]")
        for s in self.sort:
            if s.name not in sort_whitelist:
                raise QueryValidationError(f"sort field not allowed: {s.name!r}")


def default_field_resolver(name: str) -> Column:
    """Resolve a whitelisted field path to a Column.

    ``metadata.key`` / ``metadata."key"`` -> map access (the reference's
    ClickHouse JSON path, storage/clickhouse.go:16 + node.go:65-67).
    """
    if name.startswith("metadata."):
        key = name[len("metadata."):].strip('"')
        return F.col("metadata")[key]
    return F.col(name)


def default_field_sql(name: str) -> str:
    if name.startswith("metadata."):
        key = name[len("metadata."):].strip('"')
        return f"m_{key}"  # oracle records relation flattens metadata to m_*
    if name.startswith("extracted."):
        # query-time extraction fields (operators/extract.py) — output
        # column naming only; FIELD_PATTERN keeps them out of the
        # sealed node tree, so this fires solely from extraction-aware
        # call sites (range_query by/unwrap)
        return f"x_{name[len('extracted.'):]}"
    return name


def _assemble_predicate(query: Query, time_column: str, field_resolver):
    """The search WHERE clause: mandatory time range with auto-swap
    (sqlbuilder.go:89-101) AND the user's node tree. Shared by the
    hits path (search) and the aggregations path (search_facets) so
    the two can never drift."""
    start, end = query.start, query.end
    backward = False
    if end is not None and end < start:
        # auto-swap + backward chronology (sqlbuilder.go:89-97,122-125)
        start, end = end, start
        backward = True
    tc = F.col(time_column)
    pred = tc >= start  # mandatory (sqlbuilder.go:100-101)
    if end is not None:
        pred = pred & (tc <= end)
    if query.node is not None:
        user = query.node.to_column(field_resolver)
        if user is not None:
            pred = pred & user
    return pred, backward, tc


def search(
    df: DataFrame,
    query: Query,
    time_column: str = "timestamp",
    sort_whitelist: Sequence[str] = DEFAULT_SORT_WHITELIST,
    field_resolver=default_field_resolver,
) -> DataFrame:
    """Execute a search query: filter -> orderBy -> limit -> select.

    Plan shape: one scan with pushed filters; TakeOrderedAndProject for
    the top-k (no global sort); at 100 TB the mandatory time predicate
    prunes Iceberg partitions (months(warc_ts)) before any I/O.
    """
    query.validate(sort_whitelist)
    pred, backward, tc = _assemble_predicate(query, time_column, field_resolver)

    if query.cursor is not None:
        # O33 keyset: rows strictly after the cursor in (ts, id) order.
        # The predicate pushes to the scan like any other filter, so a
        # deep page never re-reads earlier pages (unlike OFFSET).
        cts, cid = decode_cursor(query.cursor)
        idc = F.col("id")
        if backward:
            pred = pred & ((tc < cts) | ((tc == cts) & (idc < cid)))
        else:
            pred = pred & ((tc > cts) | ((tc == cts) & (idc > cid)))

    out = df.filter(pred)

    order: list[Column] = []
    if query.cursor is not None:
        order = (
            [tc.desc(), F.col("id").desc()]
            if backward
            else [tc.asc(), F.col("id").asc()]
        )
    else:
        has_ts = False
        for s in query.sort:
            c = F.col(s.name)
            order.append(c.desc() if s.descending else c.asc())
            if s.name == time_column:
                has_ts = True
        if not has_ts:
            # implicit tie-breaker (sqlbuilder.go:153-161), direction follows
            # backward flag (querier/querier.go:69-74)
            order.append(tc.desc() if backward else tc.asc())
        if not query.sort:
            # canonical (timestamp, id) total order: keyset cursors are
            # only sound when pages are produced in this order — without
            # the id tie-break, rows sharing the last row's timestamp
            # could be skipped between pages
            order.append(F.col("id").desc() if backward else F.col("id").asc())
    out = out.orderBy(*order).limit(query.limit)
    return out.select(*(query.select_columns or DEFAULT_SELECT_COLUMNS))


def search_catalog(
    spark,
    catalog,
    name: str,
    query: Query,
    time_column: str = "timestamp",
    sort_whitelist: Sequence[str] = DEFAULT_SORT_WHITELIST,
    field_resolver=default_field_resolver,
) -> DataFrame:
    """``search`` over a COMMITTED catalog table, with the mandatory
    time range applied as file-level pruning BEFORE Spark lists a
    single file: the table's manifest [min, max] timestamp stats
    (recorded by ``cluster_by=['timestamp']`` writes — T25 + manifest
    stats) drop every data file whose range cannot overlap
    [start, end]. The in-plan time predicate still runs (pruning is an
    optimization, never the filter), so the result is identical to
    ``search(catalog.read(...), query)`` — tested. At 100 TB this is
    the Iceberg-planning shape: a narrow time window touches only the
    files of that window, not the table's listing.

    Unclustered tables (no stats) degrade to the unpruned read.
    """
    query.validate(sort_whitelist)  # validate BEFORE any IO
    start, end = query.start, query.end
    if end is not None and end < start:
        start, end = end, start
    df = catalog.read_stats_pruned(
        spark, name, time_column, ranges=[(start, end)]
    )
    if df is None:
        # every committed file provably misses the window -> empty page
        # with the table's schema (metadata-only: limit(0) scans nothing)
        df = catalog.read(spark, name).limit(0)
    return search(df, query, time_column, sort_whitelist, field_resolver)


DEFAULT_FACETS = ("level", "source")


def search_facets(
    df: DataFrame,
    query: Query,
    facet_fields: Sequence[str] = DEFAULT_FACETS,
    histogram: str = "hour",
    top_k: int = 10,
    time_column: str = "timestamp",
    field_resolver=default_field_resolver,
) -> DataFrame:
    """ES/Loki-style aggregations over the SAME filter as the hits
    page: top-k value counts per facet field plus a date_trunc time
    histogram, in ONE scan — the per-row (facet, value) pairs explode
    out of a single pass and aggregate on one shuffle, instead of one
    re-scan per facet (a UNION of GROUP BYs cannot share the scan
    across differing aggregates; at 100 TB that multiplies the
    dominant cost by the facet count).

    Output (long form): facet, value, n — facet '_histogram' rows are
    the bucket counts (every bucket, no top-k: a dashboard histogram
    with holes is wrong), field rows are the values with count-rank
    <= ``top_k``. rank() over n alone (no value tie-break): boundary
    ties ALL surface, which is what makes the output SET a pure
    function of the data — a row_number cutoff would pick arbitrary
    winners among equal counts."""
    query.validate()
    pred, _backward, tc = _assemble_predicate(query, time_column, field_resolver)
    pairs = [
        F.struct(
            F.lit(f).alias("facet"),
            field_resolver(f).cast("string").alias("value"),
        )
        for f in facet_fields
    ]
    pairs.append(
        F.struct(
            F.lit("_histogram").alias("facet"),
            F.date_format(
                F.date_trunc(histogram, tc), "yyyy-MM-dd HH:mm:ss"
            ).alias("value"),
        )
    )
    counts = (
        df.filter(pred)
        .select(F.explode(F.array(*pairs)).alias("p"))
        .groupBy(F.col("p.facet").alias("facet"), F.col("p.value").alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rnk = F.rank().over(Window.partitionBy("facet").orderBy(F.col("n").desc()))
    return (
        counts.withColumn("_rnk", rnk)
        .filter((F.col("facet") == "_histogram") | (F.col("_rnk") <= top_k))
        .drop("_rnk")
    )


def predicate_oracle_sql(
    query: Query,
    time_column: str = "timestamp",
    field_sql=default_field_sql,
) -> str:
    """Render ONLY the assembled WHERE predicate (mandatory time range
    with auto-swap + the node tree) — the oracle twin of
    ``_assemble_predicate`` for operators that aggregate over the
    search slice (significant terms, facets) rather than paging it."""
    start, end = query.start, query.end
    if end is not None and end < start:
        start, end = end, start
    where = [f"{time_column} >= {_sql_lit(start)}"]
    if end is not None:
        where.append(f"{time_column} <= {_sql_lit(end)}")
    if query.node is not None:
        s = query.node.to_sql(field_sql)
        if s is not None:
            where.append(s)
    return " AND ".join(where)


def search_oracle_sql(
    relation: str,
    query: Query,
    time_column: str = "timestamp",
    field_sql=default_field_sql,
    select_sql: Sequence[str] | None = None,
) -> str:
    """Render the equivalent ANSI SQL (DuckDB oracle) for a Query.

    Mirrors the reference SQL builder's assembly (sqlbuilder.go:52-80):
    mirrors exactly the semantics applied by :func:`search`.
    """
    query.validate()
    start, end = query.start, query.end
    backward = False
    if end is not None and end < start:
        start, end = end, start
        backward = True
    where = [f"{time_column} >= {_sql_lit(start)}"]
    if end is not None:
        where.append(f"{time_column} <= {_sql_lit(end)}")
    if query.node is not None:
        s = query.node.to_sql(field_sql)
        if s is not None:
            where.append(s)
    order = []
    if query.cursor is not None:
        cts, cid = decode_cursor(query.cursor)
        d, op = ("DESC", "<") if backward else ("ASC", ">")
        where.append(
            f"({time_column} {op} {_sql_lit(cts)} OR "
            f"({time_column} = {_sql_lit(cts)} AND id {op} {_sql_lit(cid)}))"
        )
        order = [f"{time_column} {d}", f"id {d}"]
    else:
        has_ts = False
        for srt in query.sort:
            order.append(f"{srt.name} {'DESC' if srt.descending else 'ASC'}")
            if srt.name == time_column:
                has_ts = True
        if not has_ts:
            order.append(f"{time_column} {'DESC' if backward else 'ASC'}")
        if not query.sort:
            order.append(f"id {'DESC' if backward else 'ASC'}")
    cols = ", ".join(select_sql or query.select_columns or DEFAULT_SELECT_COLUMNS)
    return (
        f"SELECT {cols} FROM {relation} WHERE "
        + " AND ".join(where)
        + " ORDER BY "
        + ", ".join(order)
        + f" LIMIT {query.limit}"
    )


# --------------------------------------------------------------------------
# context view — "show the surrounding lines of this hit"
# --------------------------------------------------------------------------


def parse_record_id(anchor_id: str) -> tuple[str, int]:
    """Split a record id (``url#<zero-padded pos>``, parse.record_id)
    back into (url, pos). Fails loudly on malformed ids — a context
    request for a non-record string is a caller bug, not an empty
    result."""
    url, sep, pos = anchor_id.rpartition("#")
    if not sep or not url or not pos.isdigit():
        raise ValueError(f"not a record id: {anchor_id!r}")
    return url, int(pos)


def search_context(
    records: DataFrame,
    anchor_id: str,
    before: int = 2,
    after: int = 2,
) -> DataFrame:
    """The log-UI "view in context" primitive: the anchor record plus
    its ``before``/``after`` neighbors FROM THE SAME SOURCE DOCUMENT,
    in original line order.

    The id encodes (url, pos), so the anchor is parsed driver-side
    from the string — NO lookup pass, no join, no collect: the whole
    operator is one scan with a conjunctive pushable predicate
    (url equality — partition/file-prunable on a url-clustered layout
    — plus a pos range recovered from the id suffix) and a
    TakeOrderedAndProject-sized sort on the <= before+after+1 rows
    that survive. Gaps at document edges simply return fewer rows.
    """
    if before < 0 or after < 0:
        raise ValueError("before/after must be >= 0")
    url, pos = parse_record_id(anchor_id)
    rpos = F.regexp_extract("id", "#([0-9]+)$", 1).try_cast("int")
    return (
        records.filter(
            (F.col("url") == url)
            & rpos.between(pos - before, pos + after)
        )
        .withColumn("pos", rpos)
        .orderBy("pos")
    )
