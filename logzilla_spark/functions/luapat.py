"""Lua pattern -> regex translation (the Lua-script parser front-end).

Lua patterns (Lua 5.4 manual §6.4.1 — public documentation) are a small
matching language: character classes written ``%a %d %s ...``, sets
``[...]``, quantifiers ``* + - ?`` (``-`` is lazy ``*``), anchors ``^ $``,
captures ``( )`` and back-references ``%1``-``%9``. Every construct in
the subset below has an exact counterpart in both Java (Spark JVM
regexps) and Python ``re``, so ONE translated pattern drives both the
codegen fast path (``regexp_replace`` in whole-stage codegen) and the
Arrow interpreter path — the two can never disagree on what matches.

Unsupported constructs raise :class:`LuaPatternError` at registration
time (fail fast, like the reference failing on a bad script at pool
init, processor/lua.go:66-68): ``%b`` balanced match, ``%f`` frontier,
position captures ``()``, and complement classes inside sets (``[%A]``)
— Python ``re`` cannot express a set-union with a complement class.

Lua classes are C-locale byte classes; the translations below are the
exact ASCII expansions (iscntrl/ispunct/isspace/... from the C standard).
"""

from __future__ import annotations

import re

__all__ = ["LuaPatternError", "lua_pattern_to_regex", "compile_lua_pattern"]


class LuaPatternError(ValueError):
    """Malformed or unsupported Lua pattern."""


# C-locale class expansions, as range bodies usable inside [...] too.
_CLASS_BODY = {
    "a": "a-zA-Z",
    "c": "\\x00-\\x1f\\x7f",
    "d": "0-9",
    "g": "\\x21-\\x7e",  # isgraph: printable except space
    "l": "a-z",
    "p": "!-/:-@\\[-`{-~",  # ispunct: the four ASCII punct ranges
    "s": " \\t\\n\\v\\f\\r",
    "u": "A-Z",
    "w": "a-zA-Z0-9",
    "x": "0-9a-fA-F",
}

# Characters that are regex metachars but Lua literals (Lua magic chars
# are handled structurally): always safe to backslash-escape in both
# Java and Python regexps.
_NEEDS_ESCAPE = set("\\^$.|?*+()[]{}")


def _esc(ch: str) -> str:
    return "\\" + ch if ch in _NEEDS_ESCAPE else ch


def _esc_in_set(ch: str) -> str:
    # Inside a class, only \ ] ^ - [ are sensitive (both engines).
    return "\\" + ch if ch in "\\]^-[&" else ch


def _class_token(pat: str, i: int, in_set: bool) -> tuple[str, int]:
    """Translate the token starting at pat[i] (a ``%x`` escape or plain
    char); returns (regex fragment, next index). ``in_set`` switches to
    set-body emission rules."""
    ch = pat[i]
    if ch == "%":
        if i + 1 >= len(pat):
            raise LuaPatternError("pattern ends with '%'")
        nxt = pat[i + 1]
        low = nxt.lower()
        if low in _CLASS_BODY:
            if nxt.isupper():
                if in_set:
                    raise LuaPatternError(
                        f"complement class %{nxt} inside a set is not supported"
                    )
                return f"[^{_CLASS_BODY[low]}]", i + 2
            body = _CLASS_BODY[low]
            return (body if in_set else f"[{body}]"), i + 2
        if nxt.isalnum():
            raise LuaPatternError(f"unknown class %{nxt}")
        # %<punct> — escaped literal
        return (_esc_in_set(nxt) if in_set else _esc(nxt)), i + 2
    return (_esc_in_set(ch) if in_set else _esc(ch)), i + 1


def _translate_set(pat: str, i: int) -> tuple[str, int]:
    """Translate ``[...]`` starting at pat[i] == '['; returns
    (regex set, next index past the closing ``]``)."""
    out = ["["]
    j = i + 1
    if j < len(pat) and pat[j] == "^":
        out.append("^")
        j += 1
    first = True
    while True:
        if j >= len(pat):
            raise LuaPatternError("unterminated set: missing ']'")
        if pat[j] == "]" and not first:
            out.append("]")
            return "".join(out), j + 1
        first = False
        # range a-b (only between plain single chars, as in Lua)
        if (
            pat[j] not in "%]"
            and j + 2 < len(pat)
            and pat[j + 1] == "-"
            and pat[j + 2] != "]"
        ):
            lo, hi = pat[j], pat[j + 2]
            if ord(lo) > ord(hi):
                raise LuaPatternError(f"invalid range {lo}-{hi} in set")
            out.append(f"{_esc_in_set(lo)}-{_esc_in_set(hi)}")
            j += 3
            continue
        frag, j = _class_token(pat, j, in_set=True)
        out.append(frag)


def lua_pattern_to_regex(
    pat: str, group_names: list[str] | None = None
) -> tuple[str, int]:
    """Translate a Lua pattern to a regex valid in Java AND Python.

    Returns ``(regex, n_captures)``. When ``group_names`` is given, the
    k-th capture becomes a Python named group ``(?P<name>`` (the
    GrokParser input convention — it strips names for the Spark side).
    """
    out: list[str] = []
    n_caps = 0
    open_caps = 0
    i = 0
    if pat.startswith("^"):
        out.append("^")
        i = 1
    while i < len(pat):
        ch = pat[i]
        if ch == "(":
            if i + 1 < len(pat) and pat[i + 1] == ")":
                raise LuaPatternError("position capture '()' is not supported")
            n_caps += 1
            open_caps += 1
            if group_names is not None:
                if n_caps > len(group_names):
                    raise LuaPatternError(
                        f"pattern has more than {len(group_names)} captures"
                    )
                out.append(f"(?P<{group_names[n_caps - 1]}>")
            else:
                out.append("(")
            i += 1
            continue
        if ch == ")":
            if open_caps == 0:
                raise LuaPatternError("unbalanced ')'")
            open_caps -= 1
            out.append(")")
            i += 1
            # a quantifier char here is a LITERAL in Lua (quantifiers
            # bind only to single-char classes — "(%d+)-(%d+)" is the
            # idiomatic date pattern); the next loop iteration emits it
            # as an escaped literal via _class_token.
            continue
        if ch == "$" and i == len(pat) - 1:
            # Lua '$' is TRUE end-of-subject; bare regex '$' also matches
            # before a trailing newline in both Java and Python. The
            # lookahead is exact in both engines.
            out.append("(?![\\s\\S])")
            i += 1
            continue
        if ch == "%" and i + 1 < len(pat):
            nxt = pat[i + 1]
            if nxt.isdigit():
                k = int(nxt)
                if k == 0 or k > n_caps:
                    raise LuaPatternError(f"invalid back-reference %{nxt}")
                out.append(f"\\{k}")
                i += 2
                continue
            if nxt in ("b", "f"):
                raise LuaPatternError(f"%{nxt} is not supported")
        if ch == "[":
            frag, i = _translate_set(pat, i)
        elif ch == ".":
            # Lua '.' matches ANY byte incl. newline; [\s\S] does the
            # same in both engines without needing a DOTALL flag.
            frag, i = "[\\s\\S]", i + 1
        else:
            frag, i = _class_token(pat, i, in_set=False)
        # quantifier applies to the single preceding item
        if i < len(pat) and pat[i] in "*+-?":
            q = pat[i]
            frag += {"*": "*", "+": "+", "?": "?", "-": "*?"}[q]
            i += 1
        out.append(frag)
    if open_caps:
        raise LuaPatternError("unbalanced '(' — unfinished capture")
    return "".join(out), n_caps


_COMPILED: dict[str, tuple[re.Pattern, int]] = {}


def compile_lua_pattern(pat: str) -> tuple[re.Pattern, int]:
    """Python-compiled form (interpreter path); cached per pattern —
    the VM-pool amortization analog (reference lua.go pools states so
    scripts compile once; we compile each distinct pattern once per
    worker)."""
    hit = _COMPILED.get(pat)
    if hit is None:
        rx, n = lua_pattern_to_regex(pat)
        hit = _COMPILED[pat] = (re.compile(rx), n)
    return hit
