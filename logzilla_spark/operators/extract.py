"""Query-time field extraction: LogQL's ``| pattern`` / ``| regexp``
parser stages over the record ``message``.

The reference parses fields at INGEST (processor/json.go — the O19
chain); every modern log engine additionally extracts ad-hoc fields at
QUERY time so a dashboard can group or unwrap on something the ingest
chain never materialized (Loki: ``rate({app="x"} | pattern "<_> took
<ms>ms" | unwrap ms [1m])``).  This module is that stage: a validated
extraction spec that plugs into the audited range-query layer
(operators/range_query.py) as ``extracted.<name>`` fields usable in
``by`` / ``unwrap``, plus the label-filter stage (``| ms > 100``)
applied on the same scan.

100 TB shape: extraction is a pure per-row codegen projection
(``regexp_extract`` — JVM regex, whole-stage codegen, no Python, no
shuffle); it rides the existing ONE-scan range-query plan, and the
time+node predicate still pushes to the parquet scan unchanged (the
extraction expression only gates rows AFTER the pushed filters).

Cross-engine exactness: the compiled regex is restricted to a
dialect-portable subset so ONE pattern string runs byte-identically on
Java regex (Spark) and RE2 (DuckDB):

- ``pattern`` specs compile literals through a conservative escaper
  (alnum / space / ``_`` / non-ASCII verbatim, every other byte
  backslash-escaped — backslash-punctuation is a literal in both
  dialects) and captures to leftmost-first lazy groups; both engines
  default to leftmost-first (Perl) alternation/quantifier semantics,
  so the match — and therefore every extracted value — is identical.
- ``regexp`` specs are validated by a linear-scan grammar that rejects
  anything the two dialects could disagree on or RE2 lacks:
  backreferences, lookaround, named groups, inline flags, unicode
  property classes.  Escaped alphabetics are limited to ``\\d \\w \\s``
  (+ negations), which match the same ASCII sets in both engines.

No-match semantics: ``regexp_extract`` returns the EMPTY STRING on
both engines when the pattern misses, so a non-matching row carries
``''`` for every extracted field — an empty label (Loki's behavior),
and NULL after the numeric ``TRY_CAST`` (so unwrap/numeric filters
exclude it, matching "a row without the field is not a 0-valued
sample").

Known newline caveat (documented, not defended): Java's ``$`` also
matches just before a TRAILING newline where RE2's matches only at
end-of-string, and ``.`` excludes ``\n`` in both.  The record
``message`` is produced by line splitting (O3) and therefore never
contains a newline, so neither difference is reachable through the
query surfaces; extraction over a frame with embedded newlines is
outside the portability contract.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Callable, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from .query import QueryValidationError, default_field_resolver, default_field_sql

__all__ = [
    "EXTRACT_OPS",
    "Extraction",
    "extract_where_column",
    "extract_where_sql",
]

PREFIX = "extracted."
MAX_PATTERN_LEN = 512
MAX_NAMES = 16
# {m,n} bound cap: keeps eager validation aligned with Java's runtime
# behaviour (huge counts compile but explode the NFA) and bounds the
# worst-case work a single query regex can demand of an executor.
MAX_REPEAT = 1000
# Much lower cap when the counted group's body itself repeats
# unboundedly: (a+){1,1000} backtracks with polynomial degree ~hi in
# Java (the runtime divergence the unbounded-over-unbounded rule
# rejects outright), while small exponents — (?:\d+\.){3}, the IP
# shape — are harmless.
MAX_REPEAT_OVER_UNBOUNDED = 10

_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]{0,31}$")

# punctuation with no special meaning in EITHER dialect — safe to
# appear unescaped in a user ``regexp`` spec
_SAFE_UNESCAPED = set("!\"#%&',-/:;<=>@`~ _")
# the only escaped ALPHABETICS both dialects agree on (ASCII classes)
_SAFE_CLASS_ESC = set("dDwWsS")

# label-filter comparison operators (the LogQL ``| ms > 100`` stage)
EXTRACT_OPS = ("==", "!=", ">", ">=", "<", "<=")


def _esc_literal(ch: str) -> str:
    """One literal character as portable regex text.

    alnum / space / ``_`` / non-ASCII pass through verbatim (never
    special in either dialect); everything else is backslash-escaped —
    escaped punctuation is a literal in both Java regex and RE2,
    while an escaped alphabetic would be a dialect hazard (hence the
    pass-through rule for alnum)."""
    if ch.isalnum() or ch in " _" or ord(ch) > 127:
        return ch
    return "\\" + ch


def _compile_pattern(text: str) -> tuple[str, tuple[str, ...]]:
    """Compile a Loki ``pattern`` spec to (portable regex, names).

    ``<name>`` captures, ``<_>`` skips; everything else is literal.
    Captures are lazy up to the next literal; a TRAILING capture is
    greedy to end of message (Loki's semantics).  The regex is
    anchored at the start (``^``) and matches a PREFIX of the message
    — trailing message text beyond the pattern is allowed, as in Loki.
    Consecutive captures are rejected (ambiguous split)."""
    if not isinstance(text, str) or not text:
        raise QueryValidationError("pattern: expected a non-empty string")
    if len(text) > MAX_PATTERN_LEN:
        raise QueryValidationError(
            f"pattern: longer than {MAX_PATTERN_LEN} characters"
        )
    # segments: ("lit", text) | ("cap", name) | ("skip", None)
    segs: list[tuple[str, str | None]] = []
    lit: list[str] = []
    i = 0
    while i < len(text):
        ch = text[i]
        if ch == "<":
            j = text.find(">", i + 1)
            inner = text[i + 1:j] if j != -1 else None
            if inner is not None and (inner == "_" or _NAME_RE.match(inner)):
                if lit:
                    segs.append(("lit", "".join(lit)))
                    lit = []
                segs.append(("skip", None) if inner == "_" else ("cap", inner))
                i = j + 1
                continue
        lit.append(ch)
        i += 1
    if lit:
        segs.append(("lit", "".join(lit)))

    names: list[str] = []
    parts: list[str] = []
    for k, (kind, val) in enumerate(segs):
        if kind == "lit":
            parts.append("".join(_esc_literal(c) for c in val))
            continue
        prev = segs[k - 1][0] if k else None
        if prev in ("cap", "skip"):
            raise QueryValidationError(
                "pattern: consecutive captures need a literal between them"
            )
        last = k == len(segs) - 1
        body = ".*" if last else ".*?"
        if kind == "cap":
            if val in names:
                raise QueryValidationError(f"pattern: duplicate capture <{val}>")
            names.append(val)  # type: ignore[arg-type]
            parts.append(f"({body})")
        else:
            parts.append(body)
    if not names:
        raise QueryValidationError("pattern: needs at least one named capture")
    if len(names) > MAX_NAMES:
        raise QueryValidationError(f"pattern: more than {MAX_NAMES} captures")
    return "^" + "".join(parts), tuple(names)


def _validate_portable_regex(pattern: str) -> int:
    """Linear-scan validation of a user ``regexp`` spec against the
    dialect-portable subset; returns the capturing-group count.

    Allowed: literals (alnum, space, ``_``, non-ASCII, the
    never-special punctuation set, backslash-escaped punctuation),
    classes ``[...]``, ``\\d \\w \\s`` (+ negations), quantifiers
    ``* + ? {m} {m,} {m,n}`` with optional lazy ``?``, groups
    ``(...)`` / ``(?:...)``, alternation ``|``, anchors ``^ $``,
    dot.  Rejected: backreferences, lookaround, named groups, inline
    flags, unicode property escapes — the constructs on which Java
    regex and RE2 diverge (or which RE2 lacks entirely)."""
    if not isinstance(pattern, str) or not pattern:
        raise QueryValidationError("regexp: expected a non-empty string")
    if len(pattern) > MAX_PATTERN_LEN:
        raise QueryValidationError(
            f"regexp: longer than {MAX_PATTERN_LEN} characters"
        )

    def err(msg: str, pos: int) -> QueryValidationError:
        return QueryValidationError(f"regexp: {msg} at position {pos}")

    groups = 0
    depth = 0
    atom = False  # a quantifier may follow the previous token
    # Catastrophic-backtracking guard: Java evaluates this subset with
    # exponential backtracking while RE2 is linear, so a pattern like
    # (a+)+ diverges in *runtime*, not just syntax.  Track, per open
    # group, whether its body contains an unbounded repetition; reject
    # an unbounded quantifier applied to such a group.
    unbounded = [False]  # frame 0 = top level, one frame per open group
    closed_group_unbounded: bool | None = None  # set only right after )
    i = 0
    n = len(pattern)
    while i < n:
        c = pattern[i]
        prev_group = closed_group_unbounded
        closed_group_unbounded = None
        if c == "\\":
            if i + 1 >= n:
                raise err("dangling backslash", i)
            nxt = pattern[i + 1]
            if nxt.isalnum():
                if nxt not in _SAFE_CLASS_ESC:
                    raise err(f"unsupported escape \\{nxt}", i)
            i += 2
            atom = True
        elif c == "[":
            j = i + 1
            if j < n and pattern[j] == "^":
                j += 1
            if j < n and pattern[j] == "]":  # leading ] is literal in
                raise err("empty or ]-leading class", i)  # Java only — reject
            while j < n and pattern[j] != "]":
                if pattern[j] == "\\":
                    if j + 1 >= n:
                        raise err("dangling backslash in class", j)
                    if pattern[j + 1].isalnum() and \
                            pattern[j + 1] not in _SAFE_CLASS_ESC:
                        raise err(
                            f"unsupported escape \\{pattern[j + 1]} in class", j
                        )
                    j += 2
                elif pattern[j] == "[":
                    # Java nests classes ([a[b]] is a union there, a
                    # literal [ in RE2) — reject the divergence
                    raise err("nested [ in class", j)
                elif pattern[j] == "&" and j + 1 < n and pattern[j + 1] == "&":
                    # Java set intersection ([a&&b]); RE2 reads two
                    # literal ampersands — reject the divergence
                    # (a single & is a literal in both)
                    raise err("&& in class (Java-only intersection)", j)
                else:
                    j += 1
            if j >= n:
                raise err("unterminated class", i)
            i = j + 1
            atom = True
        elif c == "(":
            if pattern[i:i + 3] == "(?:":
                i += 3
            elif i + 1 < n and pattern[i + 1] == "?":
                raise err("only (?: groups are supported", i)
            else:
                groups += 1
                i += 1
            depth += 1
            unbounded.append(False)
            atom = False
        elif c == ")":
            if depth == 0:
                raise err("unbalanced )", i)
            depth -= 1
            body_unbounded = unbounded.pop()
            unbounded[-1] = unbounded[-1] or body_unbounded
            closed_group_unbounded = body_unbounded
            i += 1
            atom = True
        elif c in "*+?":
            if not atom:
                raise err(f"quantifier {c} with nothing to repeat", i)
            if c in "*+":
                if prev_group:
                    raise err(
                        "unbounded quantifier over a group that itself "
                        "repeats (catastrophic backtracking)", i,
                    )
                unbounded[-1] = True
            i += 1
            if i < n and pattern[i] == "?":  # lazy
                i += 1
            atom = False
        elif c == "{":
            if not atom:
                raise err("quantifier {} with nothing to repeat", i)
            m = re.match(r"\{(\d+)(,(\d*))?\}", pattern[i:])
            if not m:
                raise err("malformed {} quantifier", i)
            lo = int(m.group(1))
            hi_txt = m.group(3)
            open_ended = m.group(2) is not None and hi_txt == ""
            hi = lo if m.group(2) is None else (None if open_ended else int(hi_txt))
            if hi is not None and hi < lo:
                # Java throws PatternSyntaxException at *runtime* for
                # {5,2}; surface it as a validation error instead
                raise err(f"inverted {{{lo},{hi}}} quantifier", i)
            if lo > MAX_REPEAT or (hi is not None and hi > MAX_REPEAT):
                raise err(f"repetition count above {MAX_REPEAT}", i)
            if open_ended:
                if prev_group:
                    raise err(
                        "unbounded quantifier over a group that itself "
                        "repeats (catastrophic backtracking)", i,
                    )
                unbounded[-1] = True
            elif (
                hi is not None
                and hi > MAX_REPEAT_OVER_UNBOUNDED
                and prev_group
            ):
                # a bounded-but-LARGE count over a group whose body
                # repeats unboundedly — (a+){1,1000} — triggers
                # degree-hi polynomial Java backtracking, the same
                # runtime divergence the unbounded branch rejects.
                # Small counts stay legal: (?:\d+\.){3} is the
                # everyday IP-extractor shape and its backtracking is
                # bounded by the tiny exponent.
                raise err(
                    f"counted repetition above {MAX_REPEAT_OVER_UNBOUNDED} "
                    "over a group that itself repeats (catastrophic "
                    "backtracking)", i,
                )
            i += m.end()
            if i < n and pattern[i] == "?":  # lazy
                i += 1
            atom = False
        elif c in "|^$":
            i += 1
            atom = False
        elif c == ".":
            i += 1
            atom = True
        else:
            if not (c.isalnum() or ord(c) > 127 or c in _SAFE_UNESCAPED):
                raise err(f"character {c!r} must be backslash-escaped", i)
            i += 1
            atom = True
    if depth:
        raise QueryValidationError("regexp: unbalanced (")
    return groups


@dataclass(frozen=True)
class Extraction:
    """A validated query-time extraction: one portable regex whose
    capturing group ``i + 1`` binds ``extracted.<names[i]>``."""

    regex: str
    names: tuple[str, ...]

    @classmethod
    def pattern(cls, text: str) -> "Extraction":
        """Loki ``| pattern "<method> /<path>"`` stage."""
        regex, names = _compile_pattern(text)
        return cls(regex=regex, names=names)

    @classmethod
    def regexp(cls, pattern: str, names: Sequence[str]) -> "Extraction":
        """Loki ``| regexp`` stage: a portable-subset regex plus the
        field name for each capturing group IN ORDER (positional
        binding sidesteps the named-group syntax divergence between
        the dialects)."""
        names = tuple(names)
        if not names:
            raise QueryValidationError("regexp: needs at least one name")
        if len(names) > MAX_NAMES:
            raise QueryValidationError(f"regexp: more than {MAX_NAMES} names")
        for nm in names:
            if not isinstance(nm, str) or not _NAME_RE.match(nm):
                raise QueryValidationError(f"regexp: bad field name {nm!r}")
        if len(set(names)) != len(names):
            raise QueryValidationError("regexp: duplicate field name")
        n_groups = _validate_portable_regex(pattern)
        if n_groups != len(names):
            raise QueryValidationError(
                f"regexp: {n_groups} capturing groups but {len(names)} names"
            )
        return cls(regex=pattern, names=names)

    # -- field binding -------------------------------------------------

    def _index(self, field: str) -> int | None:
        if not field.startswith(PREFIX):
            return None
        key = field[len(PREFIX):]
        try:
            return self.names.index(key) + 1
        except ValueError:
            raise QueryValidationError(
                f"unknown extracted field {field!r}; extraction defines"
                f" {[PREFIX + n for n in self.names]}"
            ) from None

    def resolver(
        self, base: Callable[[str], Column] = default_field_resolver
    ) -> Callable[[str], Column]:
        """A field resolver handling ``extracted.*`` (delegating the
        rest to ``base``) — drop-in for range_query's
        ``field_resolver``."""

        def resolve(name: str) -> Column:
            idx = self._index(name)
            if idx is None:
                return base(name)
            return F.regexp_extract(F.col("message"), self.regex, idx)

        return resolve

    def field_sql(
        self, base: Callable[[str], str] = default_field_sql
    ) -> Callable[[str], str]:
        """The DuckDB twin of :meth:`resolver` (value positions only —
        output-column NAMING stays with default_field_sql)."""
        lit = self.regex.replace("'", "''")

        def sql(name: str) -> str:
            idx = self._index(name)
            if idx is None:
                return base(name)
            return f"regexp_extract(message, '{lit}', {idx})"

        return sql


# -- the label-filter stage (``| ms > 100``) ---------------------------


def _check_filters(
    filters: Sequence[tuple[str, str, object]], extract: Extraction
) -> None:
    for f in filters:
        if not (isinstance(f, (tuple, list)) and len(f) == 3):
            raise QueryValidationError(
                "extract filter: expected (field, op, value)"
            )
        field, op, value = f
        if not (isinstance(field, str) and field.startswith(PREFIX)):
            raise QueryValidationError(
                f"extract filter: field must be extracted.*, got {field!r}"
            )
        extract._index(field)  # raises on unknown names
        if op not in EXTRACT_OPS:
            raise QueryValidationError(
                f"extract filter: op {op!r}; one of {list(EXTRACT_OPS)}"
            )
        if isinstance(value, bool) or not isinstance(value, (int, str)):
            raise QueryValidationError(
                "extract filter: value must be an int or a string"
            )


def extract_where_column(
    filters: Sequence[tuple[str, str, object]], extract: Extraction
) -> Column | None:
    """The stage's conjunctive predicate as a Column.  Int values
    compare numerically through ``TRY_CAST`` (a non-numeric extract is
    NULL and never matches — both engines agree); string values
    compare as strings."""
    _check_filters(filters, extract)
    resolve = extract.resolver()
    pred: Column | None = None
    for field, op, value in filters:
        col = resolve(field)
        if isinstance(value, int):
            col = col.try_cast("bigint")
        ops = {
            "==": col.__eq__, "!=": col.__ne__, ">": col.__gt__,
            ">=": col.__ge__, "<": col.__lt__, "<=": col.__le__,
        }
        term = ops[op](F.lit(value))
        pred = term if pred is None else pred & term
    return pred


def extract_where_sql(
    filters: Sequence[tuple[str, str, object]], extract: Extraction
) -> list[str]:
    """DuckDB twin of :func:`extract_where_column` — one WHERE term per
    filter (NULL comparisons drop rows in both engines)."""
    _check_filters(filters, extract)
    fsql = extract.field_sql()
    terms: list[str] = []
    sql_op = {"==": "=", "!=": "<>", ">": ">", ">=": ">=", "<": "<", "<=": "<="}
    for field, op, value in filters:
        e = fsql(field)
        if isinstance(value, int):
            terms.append(f"TRY_CAST({e} AS BIGINT) {sql_op[op]} {value}")
        else:
            lit = str(value).replace("'", "''")
            terms.append(f"{e} {sql_op[op]} '{lit}'")
    return terms
