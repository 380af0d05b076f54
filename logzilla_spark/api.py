"""API surface: strict JSON search requests -> Query -> response envelope.

Mirrors the reference's ``POST /api/logs/search`` path
(reference: api/handler.go:9-41, api/helper.go:21-80): a strict JSON
decode (unknown fields rejected, 1 MiB body cap, exactly one JSON
value, empty body rejected) into ``querier.Query``
(reference: querier/querier.go:34-56 — wire names ``start``, ``end``,
``limit``, ``sort_fields`` [{``name``, ``is_descending``}],
``cursor``), then the search, then an ``apiResponse``-shaped envelope
(reference: api/helper.go:14-19 — ``success``/``message``/``data``/
``metadata``).

The reference leaves the filter-tree wire format unbuilt (``Node
QueryNode`` is a Go interface; encoding/json cannot decode into it, and
no UnmarshalJSON exists — the endpoint only works for node-less
queries). This engine completes it with an explicit tagged encoding:

    {"and": [node, ...]}            -> AndNode
    {"or":  [node, ...]}            -> OrNode
    {"not": node}                   -> NotNode
    {"field": "level", "op": "eq", "value": "ERROR"}  -> ComparisonNode
    {"phrase": "disk full", "slop": 2}                -> PhraseNode (T65)

``op`` is one of eq ne gt lt gte lte like ilike in
(reference: querier/node.go:40-59).

Two deliberate upgrades over the reference, both noted in SURVEY.md:
``Query.validate()`` actually runs (the Go handler forgets to call it,
api/handler.go:9-41 — O35), and the response cursor is real keyset
pagination instead of the stub ``Cursor: ""``
(storage/clickhouse.go:211 — O33).
"""

from __future__ import annotations

import json
import re
from datetime import datetime, timedelta, timezone
from typing import Any

from pyspark.sql import DataFrame

from .operators.dsl import parse_dsl_query
from .operators.query import (
    DEFAULT_SELECT_COLUMNS,
    OPS,
    AndNode,
    ComparisonNode,
    NotNode,
    OrNode,
    PhraseNode,
    Query,
    QueryNode,
    QueryValidationError,
    SortField,
    next_cursor,
    search,
)

MAX_BODY_BYTES = 1_048_576  # reference: api/helper.go:22

_QUERY_FIELDS = {"start", "end", "limit", "sort_fields", "cursor", "node",
                 "select_columns", "q"}
_SORT_FIELDS = {"name", "is_descending"}
_COMPARISON_FIELDS = {"field", "op", "value"}


class BadInputError(QueryValidationError):
    """fault.BadInputCode analog (reference: fault/fault.go:7-12)."""


def decode_node(obj: Any) -> QueryNode:
    """Decode one filter-tree node from its tagged JSON object."""
    if not isinstance(obj, dict):
        raise BadInputError(f"node must be a JSON object, got {type(obj).__name__}")
    if "and" in obj or "or" in obj:
        if len(obj) != 1:
            raise BadInputError("and/or node must have exactly one key")
        tag, cls = ("and", AndNode) if "and" in obj else ("or", OrNode)
        children = obj[tag]
        if not isinstance(children, list):
            raise BadInputError(f"'{tag}' expects a list of nodes")
        return cls([decode_node(c) for c in children])
    if "not" in obj:
        if len(obj) != 1:
            raise BadInputError("not node must have exactly one key")
        return NotNode(decode_node(obj["not"]))
    if "phrase" in obj:
        # T65: {"phrase": "disk full", "slop": 2} — the JSON form of
        # the DSL's "disk full"~2
        if set(obj) - {"phrase", "slop"}:
            raise BadInputError(
                f"unknown node key: {sorted(set(obj) - {'phrase', 'slop'})[0]!r}"
            )
        if not isinstance(obj["phrase"], str):
            raise BadInputError("phrase: expected string")
        slop = obj.get("slop", 0)
        if not isinstance(slop, int) or isinstance(slop, bool) or slop < 0:
            raise BadInputError("slop: expected an int >= 0")
        return PhraseNode(obj["phrase"], slop)
    if "regex" in obj:
        # T76: {"field": "message", "regex": "(timeout|reset)"} — the
        # JSON form of the DSL's field=~"re"
        if set(obj) - {"field", "regex"}:
            raise BadInputError(
                f"unknown node key: {sorted(set(obj) - {'field', 'regex'})[0]!r}"
            )
        if "field" not in obj:
            raise BadInputError("regex node missing key: 'field'")
        from .operators.query import RegexNode

        return RegexNode(obj["field"], obj["regex"])
    unknown = set(obj) - _COMPARISON_FIELDS
    if unknown:
        # DisallowUnknownFields analog (api/helper.go:26)
        raise BadInputError(f"unknown node key: {sorted(unknown)[0]!r}")
    missing = _COMPARISON_FIELDS - set(obj)
    if missing:
        raise BadInputError(f"comparison node missing key: {sorted(missing)[0]!r}")
    if obj["op"] not in OPS:
        raise BadInputError(f"unknown operator {obj['op']!r}")
    return ComparisonNode(obj["field"], obj["value"], obj["op"])


def _parse_ts(v: Any, field: str) -> datetime:
    """RFC3339 string -> UTC-naive datetime (stored record timestamps
    are UTC-naive). Aware inputs are CONVERTED to UTC first — stripping
    the tzinfo of a '+05:00' instant would silently shift the search
    window by the offset (the reference's time.Parse compares instants).
    Naive inputs are interpreted as already-UTC."""
    if not isinstance(v, str):
        raise BadInputError(f"{field}: expected RFC3339 string")
    try:
        dt = datetime.fromisoformat(v.replace("Z", "+00:00"))
    except ValueError as e:
        raise BadInputError(f"{field}: {e}") from e
    if dt.tzinfo is not None:
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def decode_query(body: str | bytes) -> Query:
    """Strict JSON body -> Query (reference readJson semantics)."""
    raw = body.encode() if isinstance(body, str) else body
    if len(raw) > MAX_BODY_BYTES:
        raise BadInputError(
            f"Body must not be larger than {MAX_BODY_BYTES} bytes."
        )  # api/helper.go:22-23
    if not raw.strip():
        raise BadInputError("Body cannot be empty.")  # api/helper.go:52-53
    dec = json.JSONDecoder()
    try:
        obj, end = dec.raw_decode(raw.decode("utf-8"))
    except (ValueError, UnicodeDecodeError) as e:
        raise BadInputError(f"Body contains badly-formed JSON: {e}") from e
    if raw.decode("utf-8")[end:].strip():
        # single-value rule (api/helper.go:74-77)
        raise BadInputError("Body must only contain a single JSON value.")
    if not isinstance(obj, dict):
        raise BadInputError("Body must be a JSON object.")
    unknown = set(obj) - _QUERY_FIELDS
    if unknown:
        raise BadInputError(f"unknown field: {sorted(unknown)[0]!r}")
    has_dsl = obj.get("q") is not None
    if has_dsl and not isinstance(obj["q"], str):
        raise BadInputError("q: expected string")
    if has_dsl and obj.get("node") is not None:
        raise BadInputError("'q' and 'node' are mutually exclusive")
    # with a DSL string the mandatory start may come from its 'since:'
    # directive; parse_dsl_query enforces the requirement either way
    if "start" not in obj and not has_dsl:
        raise BadInputError("start: Field is required.")  # querier.go:89-91

    sort = []
    for s in obj.get("sort_fields") or []:
        if not isinstance(s, dict) or set(s) - _SORT_FIELDS or "name" not in s:
            raise BadInputError("sort_fields entries need {'name', 'is_descending'}")
        if not isinstance(s["name"], str):
            raise BadInputError("sort_fields.name: expected string")
        isd = s.get("is_descending", False)
        if not isinstance(isd, bool):
            raise BadInputError("sort_fields.is_descending: expected boolean")
        sort.append(SortField(s["name"], isd))

    # strict type checks (Go's json.Decode rejects type mismatches as
    # bad input; a "50" limit must not crash Query.validate with a
    # TypeError that escapes the error envelope)
    limit = obj.get("limit", 100)
    if isinstance(limit, bool) or not isinstance(limit, int):
        raise BadInputError("limit: expected integer")
    cursor = obj.get("cursor")
    if cursor is not None and not isinstance(cursor, str):
        raise BadInputError("cursor: expected string")
    sel = obj.get("select_columns")
    if sel is not None and (
        not isinstance(sel, list) or not all(isinstance(c, str) for c in sel)
    ):
        raise BadInputError("select_columns: expected list of strings")

    if has_dsl:
        # T55 query-string DSL body: {"q": "level:ERROR since:..."}.
        # Directives inside the string win over the JSON keywords; the
        # JSON sort_fields apply only when no sort: directive is given.
        q = parse_dsl_query(
            obj["q"],
            start=_parse_ts(obj["start"], "start") if "start" in obj else None,
            end=_parse_ts(obj["end"], "end") if obj.get("end") is not None else None,
            limit=limit,
            select_columns=sel,
        )
        if sort and not q.sort:
            q.sort = sort
        q.cursor = cursor
        return q

    return Query(
        start=_parse_ts(obj["start"], "start"),
        end=_parse_ts(obj["end"], "end") if obj.get("end") is not None else None,
        node=decode_node(obj["node"]) if obj.get("node") is not None else None,
        sort=sort,
        limit=limit,
        select_columns=sel,
        cursor=cursor,
    )


def search_request(records: DataFrame, body: str | bytes) -> dict:
    """Full request lifecycle: decode -> validate -> search -> envelope.

    Returns the apiResponse-shaped dict (api/helper.go:14-19) with the
    collected records and a real continuation cursor (None at end of
    results — the reference stubs this as "" forever,
    storage/clickhouse.go:211).

    Optional ``extract`` (the T69 parser stage, same forms as
    query_range's) adds the extracted fields as ``x_<name>`` columns
    on every hit — Loki's per-line extracted labels. Extraction runs
    AFTER the top-k cut (a pure projection on page-sized rows — the
    filter/sort plan is untouched) and requires ``message`` among the
    selected columns.
    """
    try:
        raw = body.encode() if isinstance(body, str) else body
        extract = None
        if len(raw) <= MAX_BODY_BYTES and raw.strip():
            try:
                obj = json.loads(raw.decode("utf-8"))
            except (ValueError, UnicodeDecodeError):
                obj = None  # decode_query raises the canonical error
            if isinstance(obj, dict) and "extract" in obj:
                extract = _decode_extract(obj.pop("extract"))
                body = json.dumps(obj)
        q = decode_query(body)
        df = search(records, q)
        if extract is not None:
            if "message" not in df.columns:
                raise BadInputError(
                    "extract requires 'message' among select_columns"
                )
            from pyspark.sql import functions as F

            df = df.select(
                "*",
                *[
                    F.regexp_extract("message", extract.regex, i + 1)
                    .alias(f"x_{n}")
                    for i, n in enumerate(extract.names)
                ],
            )
        rows = df.collect()
    except QueryValidationError as e:
        return {"success": False, "message": str(e), "data": None, "metadata": None}
    # A continuation cursor is only sound when (a) the page was produced
    # in the canonical (timestamp, id) order — a cursor-set page or the
    # default (no custom sort) ordering — and (b) both keyset columns
    # were actually selected, so next_cursor can read them.
    canonical_order = q.cursor is not None or not q.sort
    selected = q.select_columns or DEFAULT_SELECT_COLUMNS
    cursor = (
        next_cursor(rows)
        if canonical_order
        and len(rows) == q.limit
        and "timestamp" in selected
        and "id" in selected
        else None
    )
    return {
        "success": True,
        "message": "",
        "data": [r.asDict(recursive=True) for r in rows],
        "metadata": {"cursor": cursor, "count": len(rows)},
    }


_HISTOGRAM_UNITS = {"minute", "hour", "day", "week", "month"}


def facets_request(records: DataFrame, body: str | bytes) -> dict:
    """``POST /api/logs/facets``: the aggregations sibling of
    search_request — same query body (start/end/node; sort, limit and
    cursor are meaningless for facets and ignored), plus optional
    ``facets`` (field list, same whitelist as comparison nodes),
    ``histogram`` (date_trunc unit), ``top_k`` and ``extract`` (the
    T69 parser stage — ``extracted.<name>`` then becomes a valid
    facet field: top extracted paths/methods without any ingest
    change). One scan, no hits materialized
    (operators/query.search_facets)."""
    from .operators.query import DEFAULT_FACETS, FIELD_PATTERN, search_facets

    try:
        raw = body.encode() if isinstance(body, str) else body
        if len(raw) > MAX_BODY_BYTES:  # cap BEFORE parsing (helper.go:22)
            raise BadInputError(
                f"Body must not be larger than {MAX_BODY_BYTES} bytes."
            )
        try:
            obj = json.loads(raw.decode("utf-8"))
        except (ValueError, UnicodeDecodeError) as e:
            raise BadInputError(f"invalid JSON: {e}") from e
        if not isinstance(obj, dict):
            raise BadInputError("body must be a JSON object")
        fields = obj.pop("facets", list(DEFAULT_FACETS))
        unit = obj.pop("histogram", "hour")
        top_k = obj.pop("top_k", 10)
        extract = obj.pop("extract", None)
        if extract is not None:
            extract = _decode_extract(extract)
        # the remainder is a plain search body (strict decode_query
        # rejects unknown keys, which is exactly right for /search)
        q = decode_query(json.dumps(obj))

        def _facet_ok(f: str) -> bool:
            if FIELD_PATTERN.match(f):
                return True
            return (
                extract is not None
                and f.startswith("extracted.")
                and f[len("extracted."):] in extract.names
            )

        if not isinstance(fields, list) or not fields or not all(
            isinstance(f, str) and _facet_ok(f) for f in fields
        ):
            raise BadInputError(
                "facets: expected a non-empty list of whitelisted fields"
            )
        if unit not in _HISTOGRAM_UNITS:
            raise BadInputError(
                f"histogram: expected one of {sorted(_HISTOGRAM_UNITS)}"
            )
        if not isinstance(top_k, int) or isinstance(top_k, bool) or not (
            1 <= top_k <= 1000
        ):
            raise BadInputError("top_k: expected an int in [1, 1000]")
        from .operators.query import default_field_resolver

        resolver = (
            extract.resolver(default_field_resolver)
            if extract is not None
            else default_field_resolver
        )
        rows = search_facets(
            records, q, facet_fields=fields, histogram=unit, top_k=top_k,
            field_resolver=resolver,
        ).collect()
    except QueryValidationError as e:
        return {"success": False, "message": str(e), "data": None, "metadata": None}
    return {
        "success": True,
        "message": "",
        "data": [r.asDict() for r in rows],
        "metadata": {"count": len(rows)},
    }


def sigterms_request(records: DataFrame, body: str | bytes) -> dict:
    """``POST /api/logs/significant``: significant-terms triage over
    the search slice (T66) — same query body as /search (sort, limit
    and cursor are meaningless here and ignored; the ``q`` DSL string
    works, including T65 phrase terms), plus optional ``k`` (result
    count) and ``min_fg`` (minimum foreground doc frequency). One
    exploded corpus pass + a totals row
    (operators/fulltext.significant_terms)."""
    from .operators.fulltext import significant_terms

    try:
        raw = body.encode() if isinstance(body, str) else body
        if len(raw) > MAX_BODY_BYTES:
            raise BadInputError(
                f"Body must not be larger than {MAX_BODY_BYTES} bytes."
            )
        try:
            obj = json.loads(raw.decode("utf-8"))
        except (ValueError, UnicodeDecodeError) as e:
            raise BadInputError(f"invalid JSON: {e}") from e
        if not isinstance(obj, dict):
            raise BadInputError("body must be a JSON object")
        k = obj.pop("k", 20)
        min_fg = obj.pop("min_fg", 2)
        if not isinstance(k, int) or isinstance(k, bool) or not (
            1 <= k <= 1000
        ):
            raise BadInputError("k: expected an int in [1, 1000]")
        if not isinstance(min_fg, int) or isinstance(min_fg, bool) or min_fg < 1:
            raise BadInputError("min_fg: expected an int >= 1")
        q = decode_query(json.dumps(obj))
        rows = significant_terms(records, q, k=k, min_fg=min_fg).collect()
    except QueryValidationError as e:
        return {"success": False, "message": str(e), "data": None, "metadata": None}
    return {
        "success": True,
        "message": "",
        "data": [r.asDict() for r in rows],
        "metadata": {"count": len(rows)},
    }


def absent_request(records: DataFrame, body: str | bytes) -> dict:
    """``POST /api/logs/absent``: silence detection (T71) — keys with
    baseline activity and no rows since ``pivot`` (RFC3339, inside
    the range). Body: the /search query body (q/node, start/end; sort,
    limit, cursor ignored) plus ``pivot``, ``by`` (whitelisted label
    fields) and optional ``limit`` (int in [1, 1000], default 100).
    Rows are (labels..., n_baseline, last_seen_us), most recently
    seen first (the key that died last tops the triage list), label
    tie-break."""
    from .operators.anomaly import absent_keys

    try:
        raw = body.encode() if isinstance(body, str) else body
        if len(raw) > MAX_BODY_BYTES:
            raise BadInputError(
                f"Body must not be larger than {MAX_BODY_BYTES} bytes."
            )
        try:
            obj = json.loads(raw.decode("utf-8"))
        except (ValueError, UnicodeDecodeError) as e:
            raise BadInputError(f"invalid JSON: {e}") from e
        if not isinstance(obj, dict):
            raise BadInputError("body must be a JSON object")
        if "pivot" not in obj:
            raise BadInputError("pivot: Field is required.")
        pivot = _parse_ts(obj.pop("pivot"), "pivot")
        by = obj.pop("by", [])
        if not isinstance(by, list) or not all(isinstance(f, str) for f in by):
            raise BadInputError("by: expected a list of field names")
        limit = obj.pop("limit", 100)
        if isinstance(limit, bool) or not isinstance(limit, int) or not (
            1 <= limit <= 1000
        ):
            raise BadInputError("limit: expected an int in [1, 1000]")
        q = decode_query(json.dumps(obj))
        from pyspark.sql import functions as F

        df = absent_keys(records, q, by=by, pivot=pivot)
        label_cols = [c for c in df.columns
                      if c not in ("n_baseline", "last_seen_us")]
        rows = (
            df.orderBy(F.col("last_seen_us").desc(), *label_cols)
            .limit(limit)  # TakeOrderedAndProject: top-k, never a full sort
            .collect()
        )
    except QueryValidationError as e:
        return {"success": False, "message": str(e), "data": None, "metadata": None}
    return {
        "success": True,
        "message": "",
        "data": [r.asDict() for r in rows],
        "metadata": {"count": len(rows)},
    }


def complete_request(records: DataFrame, path: str) -> dict:
    """``GET /api/logs/complete?prefix=<p>&k=<n>``: typeahead token
    completions over the bound records frame (T67) — (token, n_docs)
    by doc frequency. ``prefix`` must be one [a-z0-9]+ token (the
    operator validates); ``k`` defaults to 10, capped at 100."""
    from urllib.parse import parse_qs, urlparse

    from .operators.fulltext import complete_prefix

    try:
        qs = parse_qs(urlparse(path).query)
        prefix = qs.get("prefix", [""])[0]
        raw_k = qs.get("k", ["10"])[0]
        if not (raw_k.isascii() and raw_k.isdigit()) or not (
            1 <= int(raw_k) <= 100
        ):
            raise BadInputError("k: expected an int in [1, 100]")
        try:
            rows = complete_prefix(records, prefix, k=int(raw_k)).collect()
        except ValueError as e:
            raise BadInputError(str(e)) from e
    except QueryValidationError as e:
        return {"success": False, "message": str(e), "data": None, "metadata": None}
    return {
        "success": True,
        "message": "",
        "data": [r.asDict() for r in rows],
        "metadata": {"count": len(rows)},
    }


def labels_request(records: DataFrame, path: str) -> dict:
    """The Loki labels API, typed for this engine's data model.

    ``GET /api/logs/labels[?start=&end=]`` — the queryable label
    names: the whitelisted envelope fields plus every
    ``metadata.<key>`` observed in the (optional) time range — one
    column-pruned scan over the map keys, distinct at key cardinality.

    ``GET /api/logs/labels/<field>/values[?start=&end=&k=]`` — the
    field's distinct values ranked (count DESC, value ASC), ``k``
    capped at 1000. Same field whitelist as comparison nodes; one
    scan + one value-keyed groupBy (map-side partials), a
    TakeOrderedAndProject cut."""
    from urllib.parse import parse_qs, unquote, urlparse

    from pyspark.sql import functions as F

    from .operators.query import FIELD_PATTERN, default_field_resolver

    try:
        u = urlparse(path)
        qs = parse_qs(u.query)

        def _ts(name):
            v = qs.get(name, [None])[0]
            return None if v is None else _parse_ts(unquote(v), name)

        start, end = _ts("start"), _ts("end")
        df = records
        if start is not None:
            df = df.filter(F.col("timestamp") >= start)
        if end is not None:
            df = df.filter(F.col("timestamp") <= end)

        parts = [p for p in u.path.split("/") if p]
        # ['api', 'logs', 'labels'] or ['api', 'logs', 'labels', f, 'values']
        if len(parts) == 3:
            keys = [
                r.k for r in df.select(
                    F.explode(F.map_keys("metadata")).alias("k")
                ).distinct().collect()
            ]
            data = ["id", "level", "message", "source", "timestamp"] + sorted(
                f"metadata.{k}" for k in keys
            )
            return {
                "success": True, "message": "", "data": data,
                "metadata": {"count": len(data)},
            }
        if len(parts) == 5 and parts[4] == "values":
            field = unquote(parts[3])
            if not FIELD_PATTERN.match(field):
                raise BadInputError(f"field not allowed: {field!r}")
            raw_k = qs.get("k", ["100"])[0]
            if not (raw_k.isascii() and raw_k.isdigit()) or not (
                1 <= int(raw_k) <= 1000
            ):
                raise BadInputError("k: expected an int in [1, 1000]")
            rows = (
                df.select(default_field_resolver(field).cast("string").alias("v"))
                .where(F.col("v").isNotNull())
                .groupBy("v").agg(F.count(F.lit(1)).alias("n"))
                .orderBy(F.col("n").desc(), F.col("v").asc())
                .limit(int(raw_k))  # TakeOrderedAndProject, no full sort
                .collect()
            )
            return {
                "success": True,
                "message": "",
                "data": [{"value": r.v, "n": r.n} for r in rows],
                "metadata": {"count": len(rows)},
            }
        raise BadInputError(f"no route: GET {u.path}")
    except QueryValidationError as e:
        return {"success": False, "message": str(e), "data": None, "metadata": None}


# -- metric range queries -------------------------------------------------

# driver-side collect cap for a matrix response: the grid is already
# bounded at MAX_BUCKETS points per series; this bounds series count x
# grid without knowing the label cardinality up front (CollectLimit in
# the plan — the executors never ship more than this many cells).
MAX_MATRIX_POINTS = 110_000


def _matrix_envelope(df: DataFrame, rows: list) -> dict:
    label_cols = [c for c in df.columns if c not in ("bucket", "v")]
    series: dict[tuple, list] = {}
    for r in rows:
        series.setdefault(tuple(r[c] for c in label_cols), []).append(
            (r["bucket"], r["v"])
        )
    data = [
        {
            "labels": dict(zip(label_cols, key)),
            "values": sorted(vals),
        }
        # NULL labels sort first (None is not orderable against str)
        for key, vals in sorted(
            series.items(),
            key=lambda kv: tuple((x is not None, x or "") for x in kv[0]),
        )
    ]
    return {
        "success": True,
        "message": "",
        "data": data,
        "metadata": {"series": len(data), "points": len(rows)},
    }


_RECORDED_FIELDS = {"rule", "start", "end", "vector", "binary"}


def _apply_vector(df: "DataFrame", vec, label_mapper=None) -> "DataFrame":
    """Apply a ``"vector"`` body field (the PromQL second stage) to an
    evaluated matrix: ``{"op": "topk"|"bottomk", "k": N}`` or
    ``{"op": "sum"|"min"|"max"|"avg"|"count", "by": [...]}``.

    ``label_mapper`` translates the request's ``by`` names to matrix
    columns — the live path maps range-level FIELD names through
    ``_label_name`` (``metadata.service`` -> ``m_service``); the
    recorded path serves whatever label columns the rule committed, so
    names pass through verbatim (the same names the envelope shows)."""
    from .operators.range_query import VECTOR_AGGS, vector_agg, vector_topk

    if not isinstance(vec, dict):
        raise BadInputError("vector: expected an object")
    op = vec.get("op")
    if op in ("topk", "bottomk"):
        unknown = set(vec) - {"op", "k"}
        if unknown:
            raise BadInputError(
                f"vector: unknown field {sorted(unknown)[0]!r}"
            )
        k = vec.get("k")
        if isinstance(k, bool) or not isinstance(k, int):
            raise BadInputError("vector: k must be an integer")
        return vector_topk(df, k, bottom=(op == "bottomk"))
    if op in VECTOR_AGGS:
        unknown = set(vec) - {"op", "by"}
        if unknown:
            raise BadInputError(
                f"vector: unknown field {sorted(unknown)[0]!r}"
            )
        vby = vec.get("by", [])
        if not isinstance(vby, list) or not all(
            isinstance(f, str) for f in vby
        ):
            raise BadInputError("vector: by must be a list of names")
        if label_mapper is not None:
            vby = [label_mapper(f) for f in vby]
        return vector_agg(df, op, vby)
    raise BadInputError(
        f"vector: op must be topk, bottomk or one of {sorted(VECTOR_AGGS)}"
    )


def recorded_range_request(recordings, spark, body: str | bytes) -> dict:
    """``{"rule": "<name>"}`` body on ``POST /api/logs/query_range``:
    serve the matrix from the rule's COMMITTED table
    (streaming/recordings.py) — the dashboard read path, cells-scale,
    no corpus scan.  Optional ``start``/``end`` (RFC3339) narrow the
    buckets; same matrix envelope and points cap as the live path.
    ``recordings=None`` (server started without a warehouse) is a
    client envelope error."""
    import re as _re

    from .streaming.recordings import read_recording

    try:
        raw = body.encode() if isinstance(body, str) else body
        if len(raw) > MAX_BODY_BYTES:  # cap BEFORE parsing (helper.go:22)
            raise BadInputError(
                f"Body must not be larger than {MAX_BODY_BYTES} bytes."
            )
        obj = json.loads(raw.decode("utf-8"))
        if not isinstance(obj, dict):
            raise BadInputError("body must be a JSON object")
        unknown = set(obj) - _RECORDED_FIELDS
        if unknown:
            raise BadInputError(f"unknown field: {sorted(unknown)[0]!r}")
        if recordings is None:
            raise BadInputError("recordings are not configured on this server")
        rule = obj.get("rule")
        if not isinstance(rule, str) or not _re.match(
            r"^[A-Za-z0-9_.\-]{1,64}$", rule
        ):
            raise BadInputError("rule: expected a short alphanumeric name")
        from .sources.catalog import SnapshotError
        from .operators.range_query import _epoch_seconds

        try:
            df = read_recording(spark, recordings, rule)
        except SnapshotError:
            raise BadInputError(f"unknown recording rule {rule!r}") from None
        from pyspark.sql import functions as F

        if obj.get("start") is not None:
            df = df.filter(
                F.col("bucket") >= _epoch_seconds(_parse_ts(obj["start"], "start"))
            )
        if obj.get("end") is not None:
            df = df.filter(
                F.col("bucket") <= _epoch_seconds(_parse_ts(obj["end"], "end"))
            )
        if obj.get("binary") is not None:
            # T70 between COMMITTED recordings: the error-ratio /
            # week-over-week panel divided entirely at read time —
            # cells-scale join, zero corpus scan. right must name a
            # rule recorded with the SAME label set; offset (seconds
            # or duration) must be a multiple of the rules' shared
            # step (buckets are step-aligned ints — a misaligned
            # offset cannot join).
            from .operators.range_query import parse_step, vector_binop

            spec = obj["binary"]
            if not isinstance(spec, dict):
                raise BadInputError("binary: expected an object")
            bunknown = set(spec) - {"op", "offset", "right"}
            if bunknown:
                raise BadInputError(
                    f"binary: unknown field {sorted(bunknown)[0]!r}"
                )
            right = spec.get("right")
            if not (isinstance(right, dict) and set(right) == {"rule"}
                    and isinstance(right.get("rule"), str)):
                raise BadInputError(
                    'binary.right: expected {"rule": "<name>"} on the'
                    " recorded path"
                )
            boffset = spec.get("offset", 0)
            if isinstance(boffset, str):
                boffset = parse_step(boffset)
            try:
                rdf = read_recording(spark, recordings, right["rule"])
            except SnapshotError:
                raise BadInputError(
                    f"unknown recording rule {right['rule']!r}"
                ) from None
            df = vector_binop(df, rdf, spec.get("op"), offset=boffset)
        if obj.get("vector") is not None:
            # recorded labels are served verbatim: record fine, regroup
            # coarse at read time — still zero corpus scan
            df = _apply_vector(df, obj["vector"])
        rows = df.limit(MAX_MATRIX_POINTS + 1).collect()
        if len(rows) > MAX_MATRIX_POINTS:
            raise BadInputError(
                f"result exceeds {MAX_MATRIX_POINTS} points; narrow start/end"
            )
    except (ValueError, UnicodeDecodeError) as e:
        if not isinstance(e, QueryValidationError):
            e = BadInputError(f"invalid JSON: {e}")
        return {"success": False, "message": str(e), "data": None, "metadata": None}
    return _matrix_envelope(df, rows)


def _decode_extract(obj):
    """``extract`` body field -> Extraction: ``{"pattern": "..."}``
    (Loki pattern stage) or ``{"regexp": "...", "names": [...]}``
    (portable-subset regex, positional group names)."""
    from .operators.extract import Extraction

    if not isinstance(obj, dict):
        raise BadInputError("extract: expected an object")
    keys = set(obj)
    if keys == {"pattern"}:
        if not isinstance(obj["pattern"], str):
            raise BadInputError("extract.pattern: expected a string")
        return Extraction.pattern(obj["pattern"])
    if keys == {"regexp", "names"}:
        if not isinstance(obj["regexp"], str):
            raise BadInputError("extract.regexp: expected a string")
        if not isinstance(obj["names"], list) or not all(
            isinstance(n, str) for n in obj["names"]
        ):
            raise BadInputError("extract.names: expected a list of strings")
        return Extraction.regexp(obj["regexp"], obj["names"])
    raise BadInputError(
        'extract: expected {"pattern": ...} or {"regexp": ..., "names": [...]}'
    )


def _apply_binary(records, left_df, spec, outer_q, *, step, by):
    """``binary`` body field: PromQL's binary operation —
    ``{"op": "div", "right": {...}, "offset": "1d"}``.  ``right`` is a
    second range spec (q/node/start/end, agg, unwrap, fill, quantile,
    extract/extract_where); its ``by`` must equal the outer ``by``
    (identical label sets — PromQL one-to-one matching), its step IS
    the outer step (the grids must align), and start/end default to
    the outer range.  ``offset`` (seconds or a duration string) shifts
    the right matrix back in time (PromQL's offset modifier)."""
    from .operators.range_query import parse_step, range_query, vector_binop

    if not isinstance(spec, dict):
        raise BadInputError("binary: expected an object")
    unknown = set(spec) - {"op", "offset", "right"}
    if unknown:
        raise BadInputError(f"binary: unknown field {sorted(unknown)[0]!r}")
    op = spec.get("op")
    offset = spec.get("offset", 0)
    if isinstance(offset, str):
        offset = parse_step(offset)
    step_s = parse_step(step)
    if isinstance(offset, int) and not isinstance(offset, bool) \
            and offset % step_s != 0:
        # a misaligned offset would join zero cells — "no data" with
        # no diagnostic; fail loudly instead
        raise BadInputError(
            f"binary.offset must be a multiple of step ({step_s}s)"
        )
    right = spec.get("right")
    if not isinstance(right, dict):
        raise BadInputError("binary.right: expected an object")
    r = dict(right)
    ragg = r.pop("agg", "count_over_time")
    rby = r.pop("by", list(by))
    if list(rby) != list(by):
        raise BadInputError(
            f"binary.right.by must equal the outer by {list(by)}"
            " (regroup semantics need identical label sets)"
        )
    runwrap = r.pop("unwrap", None)
    rfill = r.pop("fill", False)
    rquantile = r.pop("quantile", None)
    if rquantile is not None:
        if not (isinstance(rquantile, list) and len(rquantile) == 2):
            raise BadInputError("binary.right.quantile: expected [num, den]")
        rquantile = tuple(rquantile)
    rextract = r.pop("extract", None)
    if rextract is not None:
        rextract = _decode_extract(rextract)
    rextract_where = r.pop("extract_where", [])
    if not isinstance(rextract_where, list) or not all(
        isinstance(t, list) and len(t) == 3 for t in rextract_where
    ):
        raise BadInputError(
            "binary.right.extract_where: expected [field, op, value] items"
        )
    rextract_where = [tuple(t) for t in rextract_where]
    if "step" in r:
        raise BadInputError("binary.right.step: the outer step applies")
    # start/end default to the outer resolved range SHIFTED BACK by
    # offset — PromQL's offset modifier extends the data lookback, so a
    # week-over-week panel (offset >= range) still finds its shifted
    # buckets.  Defaulting to the unshifted outer range made the right
    # side empty/truncated with no diagnostic whenever offset > 0 (an
    # explicit right q/start wins and is not adjusted).
    if "q" not in r:
        shift = timedelta(
            seconds=offset
        ) if isinstance(offset, int) and not isinstance(offset, bool) else \
            timedelta(0)
        if "start" not in r and outer_q.start is not None:
            r["start"] = (outer_q.start - shift).isoformat()
        if "end" not in r and outer_q.end is not None:
            r["end"] = (outer_q.end - shift).isoformat()
    rq = decode_query(json.dumps(r))
    rdf = range_query(
        records, rq, agg=ragg, step=step, by=rby, unwrap=runwrap, fill=rfill,
        quantile=rquantile, extract=rextract, extract_where=rextract_where,
    )
    return vector_binop(left_df, rdf, op, offset=offset)


def range_request(records: DataFrame, body: str | bytes) -> dict:
    """``POST /api/logs/query_range``: the dashboard sibling of
    search_request (Loki's query_range) — same query body (q/node,
    start/end; sort, limit and cursor are hits-page parameters and
    rejected/ignored per operators/range_query.py), plus ``step``,
    ``range`` (PromQL range selector: ``agg(x[range])`` evaluated
    every step — overlapping windows; additive aggs only, must be a
    multiple of step)
    (seconds or ``30s``/``5m``/``1h``/``1d``), ``agg``, ``by`` (label
    fields, comparison-node whitelist), ``unwrap`` (numeric field for
    the *_over_time value aggs), ``fill`` (zero-fill the grid) and
    ``vector`` (the PromQL second stage — ``{"op": "topk", "k": 3}`` /
    ``{"op": "sum", "by": ["level"]}`` applied to the evaluated
    matrix; vector ``by`` names must be range-level ``by`` fields),
    ``extract`` (the LogQL parser stage — ``{"pattern": "<m> /<p>"}``
    or ``{"regexp": ..., "names": [...]}`` making ``extracted.<name>``
    valid in by/unwrap) and ``extract_where`` (the label-filter stage,
    ``[["extracted.ms", ">", 100], ...]``), and ``binary`` (PromQL's
    binary operation against a second range spec — error ratios,
    day-over-day deltas via ``offset``; see :func:`_apply_binary`).

    Response data is the Loki matrix shape: one entry per label set,
    ``{"labels": {...}, "values": [[bucket_epoch_s, v], ...]}`` with
    values bucket-ascending."""
    from .operators.range_query import (
        AGGS,
        MAX_BUCKETS,
        range_query,
    )

    try:
        raw = body.encode() if isinstance(body, str) else body
        if len(raw) > MAX_BODY_BYTES:  # cap BEFORE parsing (helper.go:22)
            raise BadInputError(
                f"Body must not be larger than {MAX_BODY_BYTES} bytes."
            )
        try:
            obj = json.loads(raw.decode("utf-8"))
        except (ValueError, UnicodeDecodeError) as e:
            raise BadInputError(f"invalid JSON: {e}") from e
        if not isinstance(obj, dict):
            raise BadInputError("body must be a JSON object")
        if "step" not in obj:
            raise BadInputError("step: Field is required.")
        step = obj.pop("step")
        rng = obj.pop("range", None)
        agg = obj.pop("agg", "count_over_time")
        by = obj.pop("by", [])
        unwrap = obj.pop("unwrap", None)
        fill = obj.pop("fill", False)
        quantile = obj.pop("quantile", None)
        vector = obj.pop("vector", None)
        binary = obj.pop("binary", None)
        extract = obj.pop("extract", None)
        extract_where = obj.pop("extract_where", [])
        if extract is not None:
            extract = _decode_extract(extract)
        if not isinstance(extract_where, list) or not all(
            isinstance(t, list) and len(t) == 3 for t in extract_where
        ):
            raise BadInputError(
                "extract_where: expected a list of [field, op, value]"
            )
        extract_where = [tuple(t) for t in extract_where]
        if quantile is not None:
            if (
                not isinstance(quantile, list)
                or len(quantile) != 2
                or not all(
                    isinstance(x, int) and not isinstance(x, bool)
                    for x in quantile
                )
            ):
                raise BadInputError(
                    "quantile: expected [num, den] integers (e.g. [19, 20])"
                )
            quantile = tuple(quantile)
        if not isinstance(agg, str) or agg not in AGGS:
            raise BadInputError(f"agg: expected one of {sorted(AGGS)}")
        if not isinstance(by, list) or not all(isinstance(f, str) for f in by):
            raise BadInputError("by: expected a list of field names")
        if unwrap is not None and not isinstance(unwrap, str):
            raise BadInputError("unwrap: expected a field name")
        if not isinstance(fill, bool):
            raise BadInputError("fill: expected a boolean")
        # the remainder is a plain search body (strict decode_query
        # rejects unknown keys); range_query itself rejects cursors
        # and requires end
        q = decode_query(json.dumps(obj))
        if rng is not None:
            # PromQL range selector: agg(x[range]) every step —
            # overlapping windows over the tumbling cells
            from .operators.range_query import range_query_sliding

            if quantile is not None:
                raise BadInputError("range: not defined for quantiles")
            df = range_query_sliding(
                records, q, agg=agg, step=step, range_=rng, by=by,
                unwrap=unwrap, fill=fill, extract=extract,
                extract_where=extract_where,
            )
        else:
            df = range_query(
                records, q, agg=agg, step=step, by=by, unwrap=unwrap,
                fill=fill, quantile=quantile, extract=extract,
                extract_where=extract_where,
            )
        if binary is not None:
            # evaluation order: range -> binary -> vector (PromQL's
            # sum by (..) (a / b) shape — the vector stage regroups or
            # cuts the COMPOSED matrix)
            df = _apply_binary(records, df, binary, q, step=step, by=by)
        if vector is not None:
            from .operators.range_query import _label_name

            def _map_by(f: str) -> str:
                if f not in by:
                    raise BadInputError(
                        f"vector: by field {f!r} must be one of the"
                        f" range-level by fields {list(by)}"
                    )
                return _label_name(f)

            df = _apply_vector(df, vector, _map_by)
        rows = df.limit(MAX_MATRIX_POINTS + 1).collect()
        if len(rows) > MAX_MATRIX_POINTS:
            raise BadInputError(
                f"result exceeds {MAX_MATRIX_POINTS} points"
                f" ({MAX_BUCKETS} buckets/series); raise step or narrow by"
            )
    except QueryValidationError as e:
        return {"success": False, "message": str(e), "data": None, "metadata": None}
    return _matrix_envelope(df, rows)


def query_range_request(records: DataFrame, recordings, body: str | bytes) -> dict:
    """``POST /api/logs/query_range`` dispatcher: a ``rule`` body reads
    the committed recording table; everything else evaluates live."""
    try:
        obj = json.loads(body if isinstance(body, str) else body.decode("utf-8"))
    except (ValueError, UnicodeDecodeError):
        obj = None  # range_request produces the canonical JSON error
    if isinstance(obj, dict) and "rule" in obj:
        return recorded_range_request(recordings, records.sparkSession, body)
    return range_request(records, body)


# -- alerts ------------------------------------------------------------

_ALERT_FIELDS = {"rule", "since", "until", "limit"}
_RULE_NAME_RE_SRC = r"^[A-Za-z0-9_.\-]{1,64}$"


def alerts_request(alerts: DataFrame | None, body: str | bytes) -> dict:
    """``POST /api/alerts``: read the alert ledger (streaming/alerts.py)
    through the search endpoint's discipline — strict JSON body, field
    whitelist, size cap before parsing, collect at the API edge only.

    Body (all optional): ``rule`` (exact rule name), ``since`` /
    ``until`` (RFC3339, matched against window_start: since <= ws <
    until), ``limit`` (int in [1, 1000], default 100). Results are
    newest-window first with a deterministic (rule, category, level)
    tie-break. ``alerts=None`` (server started without a ledger) is a
    client-visible envelope error, not a 500."""
    import re as _re

    from pyspark.sql import functions as F

    try:
        raw = body.encode() if isinstance(body, str) else body
        if len(raw) > MAX_BODY_BYTES:  # cap BEFORE parsing (helper.go:22)
            raise BadInputError(
                f"Body must not be larger than {MAX_BODY_BYTES} bytes."
            )
        try:
            obj = json.loads(raw.decode("utf-8")) if raw.strip() else {}
        except (ValueError, UnicodeDecodeError) as e:
            raise BadInputError(f"invalid JSON: {e}") from e
        if not isinstance(obj, dict):
            raise BadInputError("body must be a JSON object")
        unknown = set(obj) - _ALERT_FIELDS
        if unknown:
            raise BadInputError(f"unknown field: {sorted(unknown)[0]!r}")
        if alerts is None:
            raise BadInputError("alerting is not configured on this server")
        rule = obj.get("rule")
        if rule is not None and not (
            isinstance(rule, str) and _re.match(_RULE_NAME_RE_SRC, rule)
        ):
            raise BadInputError("rule: expected a short alphanumeric name")
        limit = obj.get("limit", 100)
        if isinstance(limit, bool) or not isinstance(limit, int) or not (
            1 <= limit <= 1000
        ):
            raise BadInputError("limit: expected an int in [1, 1000]")
        df = alerts
        if rule is not None:
            df = df.filter(F.col("rule_name") == rule)
        if obj.get("since") is not None:
            df = df.filter(F.col("window_start") >= _parse_ts(obj["since"], "since"))
        if obj.get("until") is not None:
            df = df.filter(F.col("window_start") < _parse_ts(obj["until"], "until"))
        rows = (
            df.orderBy(
                F.col("window_start").desc(), "rule_name", "category", "level"
            )
            .limit(limit)  # TakeOrderedAndProject: top-k, never a full sort
            .collect()
        )
    except QueryValidationError as e:
        return {"success": False, "message": str(e), "data": None, "metadata": None}
    return {
        "success": True,
        "message": "",
        # datetimes serialize at the HTTP edge (server._write default=str),
        # same as search_request's hit rows
        "data": [r.asDict() for r in rows],
        "metadata": {"count": len(rows)},
    }


# -- context view --------------------------------------------------------

_CONTEXT_FIELDS = {"id", "before", "after"}


def context_request(records: DataFrame, body: str | bytes) -> dict:
    """``POST /api/logs/context``: the hits page's "view in context"
    button — anchor record id in, the surrounding same-document lines
    out (operators/query.search_context), with the search endpoint's
    strict-body discipline. ``before``/``after`` are capped so one
    request can never materialize more than 201 rows driver-side."""
    from .operators.query import search_context

    try:
        raw = body.encode() if isinstance(body, str) else body
        if len(raw) > MAX_BODY_BYTES:  # cap BEFORE parsing (helper.go:22)
            raise BadInputError(
                f"Body must not be larger than {MAX_BODY_BYTES} bytes."
            )
        try:
            obj = json.loads(raw.decode("utf-8"))
        except (ValueError, UnicodeDecodeError) as e:
            raise BadInputError(f"invalid JSON: {e}") from e
        if not isinstance(obj, dict):
            raise BadInputError("body must be a JSON object")
        unknown = set(obj) - _CONTEXT_FIELDS
        if unknown:
            raise BadInputError(f"unknown field: {sorted(unknown)[0]!r}")
        anchor = obj.get("id")
        if not isinstance(anchor, str) or not anchor:
            raise BadInputError("id: Field is required.")
        spans = {}
        for k in ("before", "after"):
            v = obj.get(k, 2)
            if isinstance(v, bool) or not isinstance(v, int) or not (
                0 <= v <= 100
            ):
                raise BadInputError(f"{k}: expected an int in [0, 100]")
            spans[k] = v
        try:
            df = search_context(records, anchor, **spans)
        except ValueError as e:
            raise BadInputError(str(e)) from e
        rows = df.collect()
    except QueryValidationError as e:
        return {"success": False, "message": str(e), "data": None, "metadata": None}
    return {
        "success": True,
        "message": "",
        "data": [r.asDict() for r in rows],
        "metadata": {"count": len(rows), "anchor": anchor},
    }


# -- live tail over the committed catalog ----------------------------------

_TAIL_FIELDS = {"table", "cursor", "limit", "node", "q"}
_TAIL_CURSOR_FIELDS = {"from", "to", "after"}
_TABLE_PATTERN = re.compile(r"^[A-Za-z_][A-Za-z0-9_]{0,63}$")


def _node_fields(node: QueryNode) -> list[str]:
    """Every comparison field referenced by a node tree."""
    if isinstance(node, ComparisonNode):
        return [node.field_name]
    if isinstance(node, NotNode):
        return _node_fields(node.child)
    return [f for c in node.children for f in _node_fields(c)]


def tail_request(tail, body: str | bytes) -> dict:
    """``POST /api/logs/tail``: follow a committed catalog table —
    the reference's tail -f loop (tailer/tail.go seek-to-end
    semantics, O2) re-expressed over snapshots: the cursor is a
    snapshot position, the delta is the CDC insert feed
    (catalog.inserts_between), so a poll is delta-sized I/O on the
    append-only fast path and EXACTLY-ONCE across compactions and
    upsert rewrites (a pure compaction yields an empty poll, an
    updated row arrives once as its new version).

    Body: ``table`` (required); ``cursor`` — absent/null seeks to end
    (no rows, just the position, exactly like SEEK_END on open);
    ``{"from": N}`` drains inserts committed after snapshot N;
    ``{"from": N, "to": M, "after": tok}`` continues a pinned page
    walk. ``limit`` in [1, 1000] (default 100) bounds a page; a full
    page pins the head and returns a keyset continuation, a short
    page advances ``from`` to the drained head. ``node`` is the
    search endpoint's filter tree, applied to the delta (fields must
    exist on the table); ``q`` is its T55 DSL string form (filter
    only — time/sort/limit directives rejected, the cursor is the
    time dimension), mutually exclusive with ``node``. Page order is (timestamp, id) — exactly-once
    paging relies on ids being unique within a delta, which the
    parser's deterministic url#pos ids guarantee."""
    from .operators.query import decode_cursor, default_field_resolver

    try:
        if tail is None:
            raise BadInputError("tail is not configured on this server")
        cat, spark = tail
        raw = body.encode() if isinstance(body, str) else body
        if len(raw) > MAX_BODY_BYTES:  # cap BEFORE parsing (helper.go:22)
            raise BadInputError(
                f"Body must not be larger than {MAX_BODY_BYTES} bytes."
            )
        try:
            obj = json.loads(raw.decode("utf-8"))
        except (ValueError, UnicodeDecodeError) as e:
            raise BadInputError(f"invalid JSON: {e}") from e
        if not isinstance(obj, dict):
            raise BadInputError("body must be a JSON object")
        unknown = set(obj) - _TAIL_FIELDS
        if unknown:
            raise BadInputError(f"unknown field: {sorted(unknown)[0]!r}")
        table = obj.get("table")
        if not isinstance(table, str) or not _TABLE_PATTERN.match(table):
            raise BadInputError("table: Field is required (identifier).")
        if not cat.exists(table):
            raise BadInputError(f"table: no such table {table!r}")
        limit = obj.get("limit", 100)
        if isinstance(limit, bool) or not isinstance(limit, int) or not (
            1 <= limit <= 1000
        ):
            raise BadInputError("limit: expected an int in [1, 1000]")
        node = decode_node(obj["node"]) if obj.get("node") is not None else None
        if obj.get("q") is not None:
            # T55 DSL string, filter part only: the tail's time
            # dimension IS the cursor, so since:/until:/limit:/sort:
            # directives are rejected (parse_dsl), like recording rules
            from .operators.dsl import parse_dsl

            if not isinstance(obj["q"], str):
                raise BadInputError("q: expected a string")
            if node is not None:
                raise BadInputError("'q' and 'node' are mutually exclusive")
            node = parse_dsl(obj["q"])

        head = cat.last_snapshot_id(table) or 0
        cursor = obj.get("cursor")
        if cursor is None:
            # seek-to-end: report the position, deliver nothing
            return {
                "success": True,
                "message": "",
                "data": [],
                "metadata": {"cursor": {"from": head}, "count": 0},
            }
        if not isinstance(cursor, dict) or set(cursor) - _TAIL_CURSOR_FIELDS:
            raise BadInputError("cursor: expected {from[, to, after]}")
        snaps = set(cat.snapshot_ids(table))
        frm = cursor.get("from")
        if isinstance(frm, bool) or not isinstance(frm, int) or (
            frm != 0 and frm not in snaps
        ):
            raise BadInputError(
                "cursor.from: expected 0 or a live snapshot id"
            )
        pinned = "to" in cursor
        to = cursor["to"] if pinned else head
        if pinned and (
            isinstance(to, bool) or not isinstance(to, int) or to not in snaps
        ):
            raise BadInputError("cursor.to: expected a live snapshot id")
        if to < frm:
            raise BadInputError("cursor: to precedes from")
        after = None
        if cursor.get("after") is not None:
            if not pinned:
                raise BadInputError("cursor.after: requires a pinned to")
            after = decode_cursor(cursor["after"])

        if to == frm or to == 0:
            return {
                "success": True,
                "message": "",
                "data": [],
                "metadata": {"cursor": {"from": to}, "count": 0},
            }
        delta = cat.inserts_between(spark, table, frm, to)
        if "timestamp" not in delta.columns or "id" not in delta.columns:
            raise BadInputError(
                "table: tail needs (timestamp, id) columns for paging"
            )
        if node is not None:
            # whitelist first (ComparisonNode._check), THEN existence
            # on this table — both are client errors, never a 500
            user = node.to_column(default_field_resolver)
            missing = [
                f for f in _node_fields(node)
                if f.split(".", 1)[0] not in delta.columns
            ]
            if missing:
                raise BadInputError(f"node: no such column {missing[0]!r}")
            if user is not None:
                delta = delta.filter(user)
        if after is not None:
            a_ts, a_id = after
            from pyspark.sql import functions as F

            tc, ic = F.col("timestamp"), F.col("id")
            delta = delta.filter(
                (tc > F.lit(a_ts)) | ((tc == F.lit(a_ts)) & (ic > a_id))
            )
        rows = delta.orderBy("timestamp", "id").limit(limit).collect()
    except QueryValidationError as e:
        return {"success": False, "message": str(e), "data": None, "metadata": None}
    if len(rows) == limit:
        nxt = {"from": frm, "to": to, "after": next_cursor(rows)}
    else:
        nxt = {"from": to}
    return {
        "success": True,
        "message": "",
        "data": [r.asDict(recursive=True) for r in rows],
        "metadata": {"cursor": nxt, "count": len(rows)},
    }


def tables_request(tail) -> dict:
    """``GET /api/tables``: the warehouse at a glance — one
    metadata-only status row per committed table (head snapshot,
    snapshot/file/byte counts, head operation, committed-map keys).
    No Spark job runs; everything comes from manifests plus one stat
    per live file. Bound to the same ``(catalog, spark)`` pair as the
    tail route; unbound servers answer a client envelope error."""
    try:
        if tail is None:
            raise BadInputError("tail is not configured on this server")
        cat, _spark = tail
        data = [cat.table_status(t) for t in cat.tables()]
    except QueryValidationError as e:
        return {"success": False, "message": str(e), "data": None, "metadata": None}
    return {
        "success": True,
        "message": "",
        "data": data,
        "metadata": {"count": len(data)},
    }
