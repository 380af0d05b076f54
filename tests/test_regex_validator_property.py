"""Property test: the portable-regex validator's acceptance guarantee.

The validator (operators/extract.py::_validate_portable_regex) gates
the user-facing ``=~`` / JSON-regex / extract surface on a subset that
must behave identically in Spark (java.util.regex) and the DuckDB
oracle (RE2) — including at RUNTIME (ADVICE r4: inverted intervals
passed validation and threw mid-query; nested unbounded repetition
passed and backtracked exponentially).

Two properties, driven by a generator biased toward regex
metacharacters so acceptance is common enough to exercise every
branch:

1. Anything the validator ACCEPTS must compile AND execute in both
   engines we can run here — Python's ``re`` (same syntax family as
   java.util.regex for this subset) and DuckDB's RE2 — with no
   exception on a battery of subjects.
2. Acceptance implies the catastrophic-backtracking guard held: no
   unbounded quantifier applies to a group whose body repeats
   unboundedly (checked structurally via a tiny independent parser).

Rejection is always safe, so rejected strings only count for
coverage, not assertions.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from logzilla_spark.operators.extract import (
    QueryValidationError,
    _validate_portable_regex,
)

_TOKENS = [
    "a", "b", "7", " ", "_", "é",
    r"\d", r"\w", r"\s", r"\D", r"\W", r"\S",
    r"\.", r"\+", r"\(", r"\)", r"\[", r"\{",
    "[ab]", "[^xy]", "[a-f0-9]", r"[\d.]",
    ".", "|", "^", "$",
    "(", ")", "(?:",
    "*", "+", "?", "*?", "+?", "??",
    "{2}", "{1,3}", "{2,}", "{0,4}?",
    "{3,1}", "{1200}",  # must-reject shapes stay in the pool
]

SUBJECTS = ["", "a", "abba7", "aaaaaaaaab", "x y_z", "2024-01-01 10:00"]


@st.composite
def patterns(draw):
    return "".join(
        draw(st.lists(st.sampled_from(_TOKENS), min_size=1, max_size=12))
    )


def _unbounded_structure(pattern: str) -> bool:
    """Independent structural check: does any unbounded quantifier
    apply to a group whose body contains an unbounded quantifier?
    (A deliberately tiny re-implementation — shares no state with the
    validator beyond the grammar.)"""
    i, n = 0, len(pattern)
    stack = [False]
    last_group: bool | None = None
    while i < n:
        c = pattern[i]
        prev, last_group = last_group, None
        if c == "\\":
            i += 2
        elif c == "[":
            j = i + 1
            if j < n and pattern[j] == "^":
                j += 1
            while j < n and pattern[j] != "]":
                j += 2 if pattern[j] == "\\" else 1
            i = j + 1
        elif c == "(":
            stack.append(False)
            i += 3 if pattern[i : i + 3] == "(?:" else 1
        elif c == ")":
            body = stack.pop() if len(stack) > 1 else False
            stack[-1] = stack[-1] or body
            last_group = body
            i += 1
        elif c in "*+":
            if prev:
                return True
            stack[-1] = True
            i += 1
        elif c == "{":
            m = re.match(r"\{(\d+)(,(\d*))?\}", pattern[i:])
            if m and m.group(2) is not None and m.group(3) == "":
                if prev:
                    return True
                stack[-1] = True
            i += m.end() if m else 1
        else:
            i += 1
    return False


@given(patterns())
@settings(max_examples=400, deadline=None)
def test_accepted_patterns_run_in_both_engines(pattern):
    try:
        _validate_portable_regex(pattern)
    except QueryValidationError:
        return  # rejection is always safe
    # property 2: the structural guard held
    assert not _unbounded_structure(pattern), pattern
    # property 1a: Python (java-family syntax) compiles and runs
    compiled = re.compile(pattern)
    for s in SUBJECTS:
        compiled.search(s)
    # property 1b: DuckDB's RE2 parses and runs it
    con = duckdb.connect()
    for s in SUBJECTS:
        con.execute(
            "SELECT regexp_matches(?, ?)", [s, pattern]
        ).fetchall()


@pytest.mark.parametrize(
    "pattern",
    ["a{3,1}", "a{1200}", "(a+)+", "(?:\\w+)*", "(?:(a*){2})+"],
)
def test_known_bad_shapes_stay_rejected(pattern):
    with pytest.raises(QueryValidationError):
        _validate_portable_regex(pattern)
