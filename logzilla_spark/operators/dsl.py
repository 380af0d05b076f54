"""Query-string DSL: a text query language compiled to the query tree.

The reference's search API takes a structured JSON filter tree
(querier/node.go:6-77, api/handler.go:9-41).  Every production log UI
in this class (Loki's LogQL, Elasticsearch's query_string, Splunk SPL)
additionally accepts a TEXT query language, because that is what users
actually type.  This module adds that surface as a pure front-end: the
parser produces the EXISTING sealed :class:`QueryNode` tree from
``operators/query.py``, so

- compilation to Catalyst Columns, field whitelisting, empty-node
  collapse, and the parameterized (injection-free) value handling are
  all inherited unchanged from the audited query layer, and
- the DuckDB oracle twin is free: a parsed query renders through the
  same ``to_sql`` path as a hand-built tree.

Nothing here touches Spark — parse errors are raised driver-side before
any job starts, with a character position.

Grammar (EBNF; keywords are case-insensitive):

    query    := orExpr
    orExpr   := andExpr ( OR andExpr )*
    andExpr  := unary ( [AND] unary )*          -- juxtaposition = AND
    unary    := NOT unary | '(' orExpr ')' | term
    term     := field op value
              | field IN '(' value (',' value)* ')'
              | value                           -- bare: message contains
    op       := ':' | '=' | '!=' | '>=' | '<=' | '>' | '<' | '~' | '!~' | '=~'

- ``field`` is one of the whitelisted search fields (``id``, ``level``,
  ``timestamp``, ``message``, ``source``) or a ``metadata.key`` path
  (unquoted key).  Unknown fields are a parse error with position.
- ``value`` is a bare word or a double-quoted string (``\\"`` and
  ``\\\\`` escapes).  Values for ``timestamp`` comparisons are RFC3339
  timestamps; all other values stay strings (the record envelope's
  non-time fields and metadata map values are strings).
- ``:`` is the smart operator: with ``*``/``?`` wildcards in the value
  it compiles to a case-insensitive pattern match (``*``→``%``,
  ``?``→``_``), otherwise to equality.  ``=`` is always literal
  equality (no wildcard expansion).  ``~`` / ``!~`` are case-
  insensitive substring containment (ILIKE ``%value%``), with the same
  wildcard expansion inside the value.  ``=~`` is a true REGEX match
  (Loki's matcher): the pattern must pass the dialect-portable subset
  validator (operators/extract.py — no lookaround/backrefs/named
  groups), runs with search semantics (anchor explicitly), and is
  rejected for ``timestamp``; negate by composition (``NOT f=~"re"``).
- A bare value term (no field) searches the message text:
  ``timeout`` ≡ ``message~timeout``.  A bare quoted string is message
  SUBSTRING containment: ``"disk full"``.
- A bare quoted string with an adjacent ``~N`` suffix is a true
  phrase/proximity term (Lucene/ES syntax): ``"disk full"~0`` demands
  the tokens adjacent in order, ``"get 200"~2`` allows up to 2
  intervening tokens per gap — over the FULL searchable text
  (message, source, level, metadata values; T63/T64 semantics),
  compiled to a :class:`PhraseNode` in the sealed tree.
- Directives ``since:``/``until:`` (RFC3339), ``limit:N`` and
  ``sort:[-]f1,[-]f2`` may appear anywhere at any nesting level; they
  are GLOBAL query parameters, not filter terms (they are extracted
  before tree construction), and at most one of each is allowed.
  ``-field`` sorts descending.  Sort names are validated by
  ``Query.validate`` against the reference's sort whitelist.

Examples::

    level:ERROR service timeout
    (level:FATAL OR level:ERROR) AND NOT message:disk*
    metadata.service in (svc1, svc3) since:2024-01-01 limit:50
    timestamp>=2024-01-02T00:00:00 sort:-timestamp,source
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timezone

from .query import (
    FIELD_PATTERN,
    AndNode,
    ComparisonNode,
    NotNode,
    OrNode,
    PhraseNode,
    Query,
    QueryNode,
    QueryValidationError,
    RegexNode,
    SortField,
)


class DslSyntaxError(QueryValidationError):
    """Parse failure; carries the 0-based character position."""

    def __init__(self, message: str, pos: int):
        super().__init__(f"{message} (at position {pos})")
        self.pos = pos


# --------------------------------------------------------------------------
# lexer
# --------------------------------------------------------------------------

_PUNCT = {"(": "LPAREN", ")": "RPAREN", ",": "COMMA"}
# a WORD runs until whitespace or punctuation that structures the query
_WORD_END = set(' \t\r\n(),"')


@dataclass
class _Tok:
    kind: str  # LPAREN RPAREN COMMA WORD QUOTED EOF
    text: str
    pos: int


def _lex(s: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c.isspace():
            i += 1
            continue
        if c in _PUNCT:
            toks.append(_Tok(_PUNCT[c], c, i))
            i += 1
            continue
        if c == '"':
            start = i
            i += 1
            out: list[str] = []
            while i < n and s[i] != '"':
                if s[i] == "\\" and i + 1 < n and s[i + 1] in ('"', "\\"):
                    out.append(s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            if i >= n:
                raise DslSyntaxError("unterminated quoted string", start)
            i += 1  # closing quote
            toks.append(_Tok("QUOTED", "".join(out), start))
            # Lucene/ES proximity suffix, adjacent to the closing quote:
            # "disk full"~2 -> SLOP token (phrase term with slop 2)
            if i < n and s[i] == "~":
                tpos = i
                i += 1
                dstart = i
                while i < n and s[i].isdigit():
                    i += 1
                if i == dstart:
                    raise DslSyntaxError("'~' slop needs a number", tpos)
                toks.append(_Tok("SLOP", s[tpos:i], tpos))
            continue
        start = i
        while i < n and s[i] not in _WORD_END:
            i += 1
        toks.append(_Tok("WORD", s[start:i], start))
    toks.append(_Tok("EOF", "", n))
    return toks


# --------------------------------------------------------------------------
# term shapes
# --------------------------------------------------------------------------

# field prefix + comparison operator fused into one WORD. Longest
# operators first so '!=' wins over '!', '>=' over '>'.
_FIELD_OP = re.compile(
    r"^(?P<field>id|level|timestamp|message|source|metadata\.[A-Za-z0-9_]+)"
    r"(?P<op>!=|>=|<=|=~|!~|:|=|>|<|~)"
    r"(?P<rest>.*)$",
    re.DOTALL,
)
_DIRECTIVE = re.compile(r"^(?P<name>since|until|limit|sort):(?P<rest>.*)$", re.IGNORECASE)
_KEYWORDS = {"and", "or", "not", "in"}


def _parse_ts(text: str, pos: int) -> datetime:
    try:
        dt = datetime.fromisoformat(text.replace("Z", "+00:00"))
    except ValueError:
        raise DslSyntaxError(f"bad timestamp {text!r}", pos) from None
    if dt.tzinfo is not None:
        # stored timestamps are UTC-naive; convert instants, don't strip
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    return dt


def _wildcards(value: str) -> str:
    """``*``→``%``, ``?``→``_`` (the ES query_string wildcard alphabet)."""
    return value.replace("*", "%").replace("?", "_")


_WILD = re.compile(r"[*?]")


def _comparison(fieldname: str, op: str, value: str, pos: int) -> QueryNode:
    val: object = value
    if fieldname == "timestamp" and op in (">", ">=", "<", "<=", "=", ":", "!="):
        val = _parse_ts(value, pos)
    if op == "=~":
        # Loki's regex matcher: the T76 node validates the pattern
        # against the dialect-portable subset and reports positions
        # relative to the PATTERN (the term position is ours)
        node = RegexNode(fieldname, value)
        try:
            node._check()  # eager: a bad pattern is a parse error here
        except QueryValidationError as e:
            raise DslSyntaxError(str(e), pos) from None
        return node
    if op == ":":
        if isinstance(val, str) and _WILD.search(val):
            return ComparisonNode(fieldname, _wildcards(val), "ilike")
        return ComparisonNode(fieldname, val, "eq")
    if op == "=":
        return ComparisonNode(fieldname, val, "eq")
    if op == "!=":
        return ComparisonNode(fieldname, val, "ne")
    if op == "~":
        return ComparisonNode(fieldname, f"%{_wildcards(value)}%", "ilike")
    if op == "!~":
        # containment negation: NOT (f ILIKE %v%)
        return ComparisonNode(fieldname, f"%{_wildcards(value)}%", "ilike")
    return ComparisonNode(fieldname, val, {">": "gt", ">=": "gte", "<": "lt", "<=": "lte"}[op])


# --------------------------------------------------------------------------
# parser
# --------------------------------------------------------------------------


def _strip_directives(
    toks: list[_Tok],
) -> tuple[list[_Tok], dict[str, tuple[str, int]]]:
    """Pull global ``since:``/``until:``/``limit:``/``sort:`` directives
    out of the token stream before tree construction.  Directives are
    query PARAMETERS, not filter terms, so they may appear anywhere
    (any nesting level) and apply globally; quoting defeats the
    extraction (``"limit:50"`` is a message-containment term)."""
    kept: list[_Tok] = []
    directives: dict[str, tuple[str, int]] = {}
    i = 0
    while i < len(toks):
        t = toks[i]
        m = _DIRECTIVE.match(t.text) if t.kind == "WORD" else None
        if not m:
            kept.append(t)
            i += 1
            continue
        name = m.group("name").lower()
        rest = m.group("rest")
        i += 1
        if not rest:
            # value in the following token: since: "2024-01-01 00:00:00"
            if i >= len(toks) or toks[i].kind not in ("WORD", "QUOTED"):
                raise DslSyntaxError(f"directive '{name}:' needs a value", t.pos)
            rest = toks[i].text
            i += 1
        if name == "sort":
            # comma is a lexer-level token: re-join 'sort:-ts,source'
            while (
                i + 1 < len(toks)
                and toks[i].kind == "COMMA"
                and toks[i + 1].kind in ("WORD", "QUOTED")
            ):
                rest += "," + toks[i + 1].text
                i += 2
        if name in directives:
            raise DslSyntaxError(f"duplicate directive '{name}:'", t.pos)
        directives[name] = (rest, t.pos)
    return kept, directives


class _Parser:
    def __init__(self, toks: list[_Tok]):
        self.toks, self.directives = _strip_directives(toks)
        self.i = 0

    def peek(self) -> _Tok:
        return self.toks[self.i]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def _is_kw(self, t: _Tok, kw: str) -> bool:
        return t.kind == "WORD" and t.text.lower() == kw

    # ---- grammar ----
    def parse(self) -> QueryNode | None:
        if self.peek().kind == "EOF":
            return None  # directives-only / empty: time range alone
        node = self.or_expr()
        t = self.peek()
        if t.kind != "EOF":
            raise DslSyntaxError(f"unexpected {t.text!r}", t.pos)
        return node

    def or_expr(self) -> QueryNode | None:
        parts = [self.and_expr()]
        while self._is_kw(self.peek(), "or"):
            self.next()
            parts.append(self.and_expr())
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else OrNode(parts)

    def and_expr(self) -> QueryNode | None:
        parts: list[QueryNode | None] = [self.unary()]
        while True:
            t = self.peek()
            if self._is_kw(t, "and"):
                self.next()
                parts.append(self.unary())
                continue
            # implicit AND: the next token starts a new unary
            if t.kind in ("WORD", "QUOTED", "LPAREN") and not self._is_kw(t, "or"):
                parts.append(self.unary())
                continue
            break
        kept = [p for p in parts if p is not None]
        if not kept:
            return None
        return kept[0] if len(kept) == 1 else AndNode(kept)

    def unary(self) -> QueryNode | None:
        t = self.peek()
        if self._is_kw(t, "not"):
            self.next()
            child = self.unary()
            if child is None:
                raise DslSyntaxError("NOT needs an operand", t.pos)
            return NotNode(child)
        if t.kind == "LPAREN":
            self.next()
            node = self.or_expr()
            r = self.peek()
            if r.kind != "RPAREN":
                raise DslSyntaxError("expected ')'", r.pos)
            self.next()
            return node
        if t.kind in ("WORD", "QUOTED"):
            return self.term()
        raise DslSyntaxError(
            f"expected a term, got {t.text!r}" if t.kind != "EOF" else "unexpected end of query",
            t.pos,
        )

    def term(self) -> QueryNode | None:
        t = self.next()
        if t.kind == "QUOTED":
            if self.peek().kind == "SLOP":
                # "a b"~N: true phrase/proximity semantics over the full
                # searchable text (T63/T64) — tokens in order, <= N
                # intervening tokens per gap
                s = self.next()
                from logzilla_spark.operators.fulltext import phrase_tokens

                if not phrase_tokens(t.text):
                    raise DslSyntaxError("empty phrase", t.pos)
                return PhraseNode(t.text, int(s.text[1:]))
            # bare quoted string: message containment (substring)
            return ComparisonNode("message", f"%{t.text}%", "ilike")
        word = t.text
        if word.lower() in _KEYWORDS:
            raise DslSyntaxError(f"unexpected keyword {word!r}", t.pos)
        m = _FIELD_OP.match(word)
        if m:
            fieldname, op, rest = m.group("field"), m.group("op"), m.group("rest")
            if rest:
                value = rest
            else:
                v = self.peek()
                if v.kind not in ("WORD", "QUOTED") or (
                    v.kind == "WORD" and v.text.lower() in _KEYWORDS
                ):
                    raise DslSyntaxError(f"operator {op!r} needs a value", t.pos)
                value = self.next().text
            if self.peek().kind == "SLOP":
                raise DslSyntaxError(
                    "slop only applies to a bare quoted phrase", self.peek().pos
                )
            node = _comparison(fieldname, op, value, t.pos)
            return NotNode(node) if op == "!~" else node
        # field IN (a, b, c)
        if FIELD_PATTERN.match(word) and self._is_kw(self.peek(), "in"):
            in_tok = self.next()
            l = self.peek()
            if l.kind != "LPAREN":
                raise DslSyntaxError("IN needs a parenthesized list", in_tok.pos)
            self.next()
            vals: list[str] = []
            while True:
                v = self.peek()
                if v.kind in ("WORD", "QUOTED"):
                    vals.append(self.next().text)
                elif v.kind == "COMMA":
                    self.next()
                elif v.kind == "RPAREN":
                    self.next()
                    break
                else:
                    raise DslSyntaxError("bad IN list", v.pos)
            if not vals:
                raise DslSyntaxError("empty IN list", in_tok.pos)
            return ComparisonNode(word, vals, "in")
        # a word that LOOKS like a field term but has an unknown field
        # name: error with position rather than silently grepping the
        # message for 'levl:ERROR'
        head = word.split(":", 1)[0]
        if ":" in word and re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*", head):
            raise DslSyntaxError(f"unknown field {head!r}", t.pos)
        # bare word: message containment
        return ComparisonNode("message", f"%{_wildcards(word)}%", "ilike")


def parse_dsl(text: str) -> QueryNode | None:
    """Parse the filter part only; directives are rejected.

    Returns ``None`` for an empty/whitespace query (matches the empty
    JSON node — time range only).
    """
    p = _Parser(_lex(text))
    node = p.parse()
    if p.directives:
        name, (_, pos) = next(iter(p.directives.items()))
        raise DslSyntaxError(f"directive '{name}:' not allowed here", pos)
    return node


def parse_dsl_query(
    text: str,
    *,
    start: datetime | None = None,
    end: datetime | None = None,
    limit: int | None = None,
    select_columns: list[str] | None = None,
) -> Query:
    """Parse a full query string into a :class:`Query`.

    ``since:``/``until:``/``limit:``/``sort:`` directives in the text
    override the keyword defaults.  ``start`` is mandatory overall
    (the reference's rule, querier/querier.go:89-91): either the
    ``since:`` directive or the ``start`` keyword must supply it.
    """
    p = _Parser(_lex(text))
    node = p.parse()
    d = p.directives
    if "since" in d:
        start = _parse_ts(*d["since"])
    if "until" in d:
        end = _parse_ts(*d["until"])
    if "limit" in d:
        raw, pos = d["limit"]
        try:
            limit = int(raw)
        except ValueError:
            raise DslSyntaxError(f"bad limit {raw!r}", pos) from None
    sort: list[SortField] = []
    if "sort" in d:
        raw, pos = d["sort"]
        for part in raw.split(","):
            part = part.strip()
            if not part:
                raise DslSyntaxError("empty sort field", pos)
            if part.startswith("-"):
                sort.append(SortField(part[1:], descending=True))
            else:
                sort.append(SortField(part))
    if start is None:
        raise QueryValidationError("start is required (use since: or the start param)")
    q = Query(start=start, end=end, node=node, sort=sort,
              limit=limit if limit is not None else 100,
              select_columns=select_columns)
    q.validate()
    return q
