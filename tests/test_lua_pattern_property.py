"""Property test: luapat translation vs an independent Lua-pattern matcher.

The translator (functions/luapat.py) is the one shared front-end for
BOTH Lua execution tiers, so its fidelity is load-bearing. This file
implements Lua 5.4 pattern-matching semantics DIRECTLY from the
manual's documented behavior (§6.4.1: leftmost start, greedy ``*``/
``+`` with backtracking, lazy ``-``, classes, sets, captures, back-
references, anchors) as a naive backtracking matcher, then drives
random patterns + subjects through both and asserts identical
(start, end, captures). The matcher shares NO code with the translator
— a translation bug and a matcher bug would have to coincide exactly
on random inputs to hide.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from logzilla_spark.functions.luapat import lua_pattern_to_regex

# C-locale class membership — from the C standard's ctype tables
# (independent of the translator's range strings).
_PUNCT = set("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")


def _class_member(c: str, cl: str) -> bool:
    low = cl.lower()
    if low == "a":
        r = c.isascii() and c.isalpha()
    elif low == "c":
        r = ord(c) < 32 or ord(c) == 127
    elif low == "d":
        r = c in "0123456789"
    elif low == "g":
        r = 0x21 <= ord(c) <= 0x7E
    elif low == "l":
        r = "a" <= c <= "z"
    elif low == "p":
        r = c in _PUNCT
    elif low == "s":
        r = c in " \t\n\v\f\r"
    elif low == "u":
        r = "A" <= c <= "Z"
    elif low == "w":
        r = c.isascii() and c.isalnum()
    elif low == "x":
        r = c in "0123456789abcdefABCDEF"
    else:
        return cl == c  # %<punct>: escaped literal
    return r != cl.isupper()


class _LuaMatcher:
    """Naive backtracking matcher for the supported pattern subset."""

    def __init__(self, s: str, p: str):
        self.s = s
        self.p = p
        self.caps: list[list[int]] = []  # [start, len]; len == -1 while open

    def class_end(self, pi: int) -> int:
        c = self.p[pi]
        pi += 1
        if c == "%":
            return pi + 1
        if c == "[":
            if self.p[pi] == "^":
                pi += 1
            first = True
            while True:
                if self.p[pi] == "]" and not first:
                    return pi + 1
                first = False
                pi += 2 if self.p[pi] == "%" else 1
        return pi

    def single(self, si: int, pi: int, ep: int) -> bool:
        if si >= len(self.s):
            return False
        c = self.s[si]
        pc = self.p[pi]
        if pc == ".":
            return True
        if pc == "%":
            return _class_member(c, self.p[pi + 1])
        if pc == "[":
            return self.match_set(c, pi, ep - 1)
        return pc == c

    def match_set(self, c: str, pi: int, ep: int) -> bool:
        neg = False
        pi += 1
        if self.p[pi] == "^":
            neg = True
            pi += 1
        r = False
        while pi < ep:
            if self.p[pi] == "%":
                if _class_member(c, self.p[pi + 1]):
                    r = True
                pi += 2
            elif pi + 2 < ep and self.p[pi + 1] == "-":
                if self.p[pi] <= c <= self.p[pi + 2]:
                    r = True
                pi += 3
            else:
                if self.p[pi] == c:
                    r = True
                pi += 1
        return r != neg

    def match(self, si: int, pi: int):
        p = self.p
        while True:
            if pi == len(p):
                return si
            pc = p[pi]
            if pc == "(":
                self.caps.append([si, -1])
                r = self.match(si, pi + 1)
                if r is None:
                    self.caps.pop()
                return r
            if pc == ")":
                for k in range(len(self.caps) - 1, -1, -1):
                    if self.caps[k][1] == -1:
                        self.caps[k][1] = si - self.caps[k][0]
                        r = self.match(si, pi + 1)
                        if r is None:
                            self.caps[k][1] = -1
                        return r
                raise AssertionError("unbalanced ')'")
            if pc == "$" and pi + 1 == len(p):
                return si if si == len(self.s) else None
            if pc == "%" and pi + 1 < len(p) and p[pi + 1].isdigit():
                k = int(p[pi + 1]) - 1
                c0, cl = self.caps[k]
                cap = self.s[c0 : c0 + cl]
                if self.s.startswith(cap, si):
                    si += len(cap)
                    pi += 2
                    continue
                return None
            ep = self.class_end(pi)
            quant = p[ep] if ep < len(p) else ""
            if quant == "?":
                if self.single(si, pi, ep):
                    r = self.match(si + 1, ep + 1)
                    if r is not None:
                        return r
                pi = ep + 1
                continue
            if quant in ("*", "+"):
                if quant == "+":
                    if not self.single(si, pi, ep):
                        return None
                    si += 1
                count = 0
                while self.single(si + count, pi, ep):
                    count += 1
                while count >= 0:
                    r = self.match(si + count, ep + 1)
                    if r is not None:
                        return r
                    count -= 1
                return None
            if quant == "-":
                while True:
                    r = self.match(si, ep + 1)
                    if r is not None:
                        return r
                    if self.single(si, pi, ep):
                        si += 1
                    else:
                        return None
            if self.single(si, pi, ep):
                si += 1
                pi = ep
                continue
            return None


def lua_find(s: str, pat: str):
    """First Lua match: (start, end, captures) 0-based half-open, or None."""
    anchored = pat.startswith("^")
    body = pat[1:] if anchored else pat
    starts = [0] if anchored else range(len(s) + 1)
    for st0 in starts:
        m = _LuaMatcher(s, body)
        e = m.match(st0, 0)
        if e is not None:
            return (st0, e, [s[c0 : c0 + cl] for c0, cl in m.caps])
    return None


def regex_find(s: str, pat: str):
    rx_src, _ = lua_pattern_to_regex(pat)
    m = re.compile(rx_src).search(s)
    if m is None:
        return None
    return (m.start(), m.end(), ["" if g is None else g for g in m.groups()])


# --- pattern generator: supported constructs only, always well-formed ---

_LITS = "ab1 .%+-^$()[]"  # literals incl. every magic char (escaped below)


def _lit(ch: str) -> str:
    return "%" + ch if ch in "^$*+?.([%-)]" else ch


_item = st.one_of(
    st.sampled_from(["%a", "%d", "%s", "%w", "%l", "%u", "%p", "%x", "."]),
    st.sampled_from([_lit(c) for c in _LITS]),
    st.sampled_from(["[ab1]", "[^ab]", "[a-c1-3]", "[%d%s]", "[%a.]", "[]ab]"]),
)
_quant = st.sampled_from(["", "", "*", "+", "-", "?"])
_piece = st.builds(lambda i, q: i + q, _item, _quant)
_seq = st.lists(_piece, min_size=1, max_size=5).map("".join)


@st.composite
def _patterns(draw):
    parts = [draw(_seq)]
    if draw(st.booleans()):  # wrap a segment in a capture
        parts.append("(" + draw(_seq) + ")")
        parts.append(draw(_seq))
        if draw(st.booleans()):  # back-reference to it
            parts.append("%1")
    pat = "".join(parts)
    if draw(st.booleans()):
        pat = "^" + pat
    if draw(st.booleans()):
        pat = pat + "$"
    return pat


_subjects = st.text(alphabet="ab1 .%+-^$()[]AB23\n\tz", max_size=12)


@settings(max_examples=400, deadline=None)
@given(pat=_patterns(), s=_subjects)
def test_translation_matches_independent_lua_semantics(pat, s):
    assert regex_find(s, pat) == lua_find(s, pat)


def test_dollar_is_true_end_of_string():
    # bare regex '$' would also match before a trailing newline — the
    # translator must not inherit that
    assert regex_find("abc\n", "abc$") is None
    assert regex_find("abc", "abc$") == (0, 3, [])
    assert lua_find("abc\n", "abc$") is None
