"""Lua ``parse_log`` script compatibility — the reference's drop-in slot.

The reference lets a user point the engine at a Lua script defining
``parse_log(raw) -> level, message, rfc3339_ts, metadata_table`` and
runs it per record in a pooled sandboxed VM (reference:
processor/lua.go:18-25 contract, 40-76 sandbox — os/io withheld, only
base/package/table/string plus a json module are opened, 81-119 the
per-record call + RFC3339 parse + level normalization + table->map).

This module makes an EXISTING reference user's script run unmodified,
Spark-first, in two tiers:

1. **Codegen fast path** — most real ``parse_log`` scripts are one
   ``string.match`` plus a table-literal return. :func:`_try_compile_grok`
   recognizes that shape in the AST and compiles the Lua pattern to a
   Java regex driving the registry's :class:`~.parsers.GrokParser`
   (ONE whole-stage-codegen regex per row, ZERO Python in the hot
   path — strictly faster than the reference's per-record Lua VM).
2. **Arrow interpreter path** — scripts with conditionals, json.decode,
   loops, gsub, etc. run in a sandboxed Lua-subset interpreter inside
   an Arrow-batched pandas UDF (the registry's :class:`~.parsers.
   PandasParser` slot — the same crossing cost the reference pays for
   its Lua VM, amortized per batch instead of per record).

The interpreter is a from-scratch subset of Lua 5.4 (public language
reference): values nil/boolean/integer/float/string/table/function,
the full expression grammar (including method-call sugar, multiple
returns/assignment, varargs excluded), local/assign/if/while/for/
return/break/do statements, and the sandbox library surface the
reference opens — base (type/tonumber/tostring/pairs/ipairs/error/
assert/pcall/print/require), string (match/find/gmatch/gsub/sub/len/
upper/lower/rep/reverse/byte/char/format), table (insert/remove/
concat), plus ``require("json")`` -> decode/encode, and a small ``math`` table (a
deliberate superset of the reference sandbox — it eases porting and
adds no capability). ``os``/``io``/``load`` do not exist, a per-call
step budget bounds runaway loops, and string concat/rep results are
size-capped (geometric growth outruns any step budget) — all stricter
than the reference's sandbox, which has neither bound.

Both tiers share :mod:`..functions.luapat` for pattern translation, so
a pattern can never match differently between them (differentially
tested). Per the reference contract, a script error, a non-RFC3339
timestamp, or a non-table metadata return leaves the record unchanged
(ok=false -> the chain's never-drop fallback).
"""

from __future__ import annotations

import json as _json
import math
import re
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import Any

import numpy as np
import pandas as pd

from ..functions.levels import _LEVEL_MAP, parse_level_pd
from ..functions.luapat import LuaPatternError, compile_lua_pattern, lua_pattern_to_regex
from .parsers import GrokParser, PandasParser

__all__ = ["LuaScriptError", "LuaRuntimeError", "lua_parser", "LuaScript"]


class LuaScriptError(ValueError):
    """Script failed to lex/parse or uses an unsupported construct
    (fail-fast at registration, like DoFile in the reference pool
    factory, lua.go:66-68)."""


class LuaRuntimeError(Exception):
    """A Lua ``error()`` / runtime fault; carries the Lua error value."""

    def __init__(self, value: Any):
        super().__init__(_tostr(value) if value is not None else "nil")
        self.value = value


# ===========================================================================
# lexer
# ===========================================================================

_KEYWORDS = frozenset(
    "and break do else elseif end false for function if in local nil not "
    "or repeat return then true until while goto".split()
)
_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<longcomment>--\[(?P<lceq>=*)\[.*?\](?P=lceq)\])
  | (?P<comment>--[^\n]*)
  | (?P<name>[A-Za-z_]\w*)
  | (?P<hexnum>0[xX][0-9a-fA-F]+(?:\.[0-9a-fA-F]*)?(?:[pP][-+]?\d+)?)
  | (?P<number>(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)
  | (?P<longstr>\[(?P<lseq>=*)\[.*?\](?P=lseq)\])
  | (?P<string>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<op>\.\.\.|\.\.|==|~=|<=|>=|//|::|[-+*/%^#<>=(){}\[\];:,.])
""",
    re.VERBOSE | re.DOTALL,
)
_ESCAPES = {
    "n": "\n", "t": "\t", "r": "\r", "a": "\a", "b": "\b", "f": "\f",
    "v": "\v", "\\": "\\", '"': '"', "'": "'", "\n": "\n",
}


def _unescape(body: str) -> str:
    out, i = [], 0
    while i < len(body):
        c = body[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        i += 1
        e = body[i]
        if e in _ESCAPES:
            out.append(_ESCAPES[e])
            i += 1
        elif e == "x":
            out.append(chr(int(body[i + 1 : i + 3], 16)))
            i += 3
        elif e.isdigit():
            j = i
            while j < len(body) and j < i + 3 and body[j].isdigit():
                j += 1
            out.append(chr(int(body[i:j])))
            i = j
        elif e == "z":
            i += 1
            while i < len(body) and body[i].isspace():
                i += 1
        elif e == "u" and body[i + 1] == "{":
            j = body.index("}", i)
            out.append(chr(int(body[i + 2 : j], 16)))
            i = j + 1
        else:
            raise LuaScriptError(f"invalid escape \\{e}")
    return "".join(out)


def _lex(src: str) -> list[tuple[str, Any]]:
    toks: list[tuple[str, Any]] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise LuaScriptError(f"unexpected character {src[pos]!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment", "longcomment"):
            continue
        text = m.group()
        if kind == "name":
            toks.append(("kw" if text in _KEYWORDS else "name", text))
        elif kind == "hexnum":
            if "." in text or "p" in text or "P" in text:
                toks.append(("number", float.fromhex(text)))
            else:
                toks.append(("number", int(text, 16)))
        elif kind == "number":
            if "." in text or "e" in text or "E" in text:
                toks.append(("number", float(text)))
            else:
                toks.append(("number", int(text)))
        elif kind == "string":
            toks.append(("string", _unescape(text[1:-1])))
        elif kind == "longstr":
            eq = m.group("lseq")
            body = text[2 + len(eq) : -(2 + len(eq))]
            if body.startswith("\n"):
                body = body[1:]
            toks.append(("string", body))
        else:
            toks.append(("op", text))
    toks.append(("eof", None))
    return toks


# ===========================================================================
# parser — AST as plain tuples (picklable; ships inside the Arrow UDF)
# ===========================================================================

_BINPRI = {
    "or": (1, 1), "and": (2, 2),
    "<": (3, 3), ">": (3, 3), "<=": (3, 3), ">=": (3, 3),
    "~=": (3, 3), "==": (3, 3),
    "..": (9, 8),
    "+": (10, 10), "-": (10, 10),
    "*": (11, 11), "/": (11, 11), "//": (11, 11), "%": (11, 11),
    "^": (14, 13),
}
_UNARY_PRI = 12


class _Parser:
    def __init__(self, toks: list[tuple[str, Any]]):
        self.toks = toks
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, val: Any = None):
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise LuaScriptError(f"expected {val or kind}, got {v!r}")
        return v

    def check_op(self, op: str) -> bool:
        k, v = self.peek()
        if k == "op" and v == op:
            self.i += 1
            return True
        return False

    def check_kw(self, kw: str) -> bool:
        k, v = self.peek()
        if k == "kw" and v == kw:
            self.i += 1
            return True
        return False

    def at_kw(self, *kws: str) -> bool:
        k, v = self.peek()
        return k == "kw" and v in kws

    # --- blocks / statements ---

    def parse_chunk(self) -> list:
        block = self.parse_block()
        if self.peek()[0] != "eof":
            raise LuaScriptError(f"trailing input at token {self.peek()[1]!r}")
        return block

    def parse_block(self) -> list:
        stmts = []
        while True:
            k, v = self.peek()
            if k == "eof" or (k == "kw" and v in ("end", "else", "elseif", "until")):
                return stmts
            if k == "op" and v == ";":
                self.i += 1
                continue
            if k == "kw" and v == "return":
                self.i += 1
                exprs = []
                k2, v2 = self.peek()
                if not (
                    k2 == "eof"
                    or (k2 == "kw" and v2 in ("end", "else", "elseif", "until"))
                    or (k2 == "op" and v2 == ";")
                ):
                    exprs = self.parse_explist()
                self.check_op(";")
                stmts.append(("return", exprs))
                return stmts
            stmts.append(self.parse_statement())

    def parse_statement(self):
        k, v = self.peek()
        if k == "kw":
            if v in ("repeat", "goto"):
                raise LuaScriptError(f"'{v}' is not supported in the subset")
            if v == "local":
                self.i += 1
                if self.at_kw("function"):
                    self.i += 1
                    name = self.expect("name")
                    params, body = self.parse_funcbody()
                    return ("local", [name], [("func", params, body)])
                names = [self.expect("name")]
                while self.check_op(","):
                    names.append(self.expect("name"))
                exprs = self.parse_explist() if self.check_op("=") else []
                return ("local", names, exprs)
            if v == "if":
                self.i += 1
                arms = []
                cond = self.parse_expr()
                self.expect("kw", "then")
                arms.append((cond, self.parse_block()))
                els = None
                while True:
                    if self.check_kw("elseif"):
                        c = self.parse_expr()
                        self.expect("kw", "then")
                        arms.append((c, self.parse_block()))
                    elif self.check_kw("else"):
                        els = self.parse_block()
                        self.expect("kw", "end")
                        break
                    else:
                        self.expect("kw", "end")
                        break
                return ("if", arms, els)
            if v == "while":
                self.i += 1
                cond = self.parse_expr()
                self.expect("kw", "do")
                body = self.parse_block()
                self.expect("kw", "end")
                return ("while", cond, body)
            if v == "for":
                self.i += 1
                n1 = self.expect("name")
                if self.check_op("="):
                    start = self.parse_expr()
                    self.expect("op", ",")
                    stop = self.parse_expr()
                    step = self.parse_expr() if self.check_op(",") else ("number", 1)
                    self.expect("kw", "do")
                    body = self.parse_block()
                    self.expect("kw", "end")
                    return ("fornum", n1, start, stop, step, body)
                names = [n1]
                while self.check_op(","):
                    names.append(self.expect("name"))
                self.expect("kw", "in")
                exprs = self.parse_explist()
                self.expect("kw", "do")
                body = self.parse_block()
                self.expect("kw", "end")
                return ("forin", names, exprs, body)
            if v == "do":
                self.i += 1
                body = self.parse_block()
                self.expect("kw", "end")
                return ("do", body)
            if v == "break":
                self.i += 1
                return ("break",)
            if v == "function":
                self.i += 1
                parts = [self.expect("name")]
                while self.check_op("."):
                    parts.append(self.expect("name"))
                params, body = self.parse_funcbody()
                target = ("name", parts[0])
                for p in parts[1:]:
                    target = ("index", target, ("string", p))
                return ("assign", [target], [("func", params, body)])
        # expression statement: assignment or call
        e = self.parse_suffixed()
        k2, v2 = self.peek()
        if k2 == "op" and v2 in ("=", ","):
            targets = [e]
            while self.check_op(","):
                targets.append(self.parse_suffixed())
            self.expect("op", "=")
            exprs = self.parse_explist()
            for t in targets:
                if t[0] not in ("name", "index"):
                    raise LuaScriptError("cannot assign to this expression")
            return ("assign", targets, exprs)
        if e[0] not in ("call", "methcall"):
            raise LuaScriptError("syntax error: expression is not a statement")
        return ("callstat", e)

    def parse_funcbody(self):
        self.expect("op", "(")
        params = []
        if not self.check_op(")"):
            while True:
                k, v = self.next()
                if k != "name":
                    raise LuaScriptError(f"bad parameter {v!r} ('...' unsupported)")
                params.append(v)
                if not self.check_op(","):
                    break
            self.expect("op", ")")
        body = self.parse_block()
        self.expect("kw", "end")
        return params, body

    # --- expressions ---

    def parse_explist(self) -> list:
        exprs = [self.parse_expr()]
        while self.check_op(","):
            exprs.append(self.parse_expr())
        return exprs

    def parse_expr(self, limit: int = 0):
        k, v = self.peek()
        if (k == "kw" and v == "not") or (k == "op" and v in ("-", "#")):
            self.i += 1
            operand = self.parse_expr(_UNARY_PRI)
            left = ("unop", v, operand)
        else:
            left = self.parse_simple()
        while True:
            k, v = self.peek()
            op = v if (k == "op" or (k == "kw" and v in ("and", "or"))) else None
            pri = _BINPRI.get(op) if op else None
            if not pri or pri[0] <= limit:
                return left
            self.i += 1
            right = self.parse_expr(pri[1])
            left = ("binop", op, left, right)

    def parse_simple(self):
        k, v = self.peek()
        if k == "number":
            self.i += 1
            return ("number", v)
        if k == "string":
            self.i += 1
            return ("string", v)
        if k == "kw":
            if v == "nil":
                self.i += 1
                return ("nil",)
            if v == "true":
                self.i += 1
                return ("true",)
            if v == "false":
                self.i += 1
                return ("false",)
            if v == "function":
                self.i += 1
                params, body = self.parse_funcbody()
                return ("func", params, body)
        if k == "op" and v == "{":
            return self.parse_table()
        if k == "op" and v == "...":
            raise LuaScriptError("'...' varargs are not supported")
        return self.parse_suffixed()

    def parse_primary(self):
        k, v = self.next()
        if k == "name":
            return ("name", v)
        if k == "op" and v == "(":
            e = self.parse_expr()
            self.expect("op", ")")
            return ("paren", e)
        raise LuaScriptError(f"unexpected token {v!r}")

    def parse_suffixed(self):
        e = self.parse_primary()
        while True:
            k, v = self.peek()
            if k == "op" and v == ".":
                self.i += 1
                e = ("index", e, ("string", self.expect("name")))
            elif k == "op" and v == "[":
                self.i += 1
                key = self.parse_expr()
                self.expect("op", "]")
                e = ("index", e, key)
            elif k == "op" and v == ":":
                self.i += 1
                name = self.expect("name")
                e = ("methcall", e, name, self.parse_args())
            elif (k == "op" and v == "(") or k == "string" or (k == "op" and v == "{"):
                e = ("call", e, self.parse_args())
            else:
                return e

    def parse_args(self) -> list:
        k, v = self.peek()
        if k == "string":
            self.i += 1
            return [("string", v)]
        if k == "op" and v == "{":
            return [self.parse_table()]
        self.expect("op", "(")
        if self.check_op(")"):
            return []
        args = self.parse_explist()
        self.expect("op", ")")
        return args

    def parse_table(self):
        self.expect("op", "{")
        entries = []  # (key_expr | None, value_expr)
        while not self.check_op("}"):
            k, v = self.peek()
            if k == "op" and v == "[":
                self.i += 1
                key = self.parse_expr()
                self.expect("op", "]")
                self.expect("op", "=")
                entries.append((key, self.parse_expr()))
            elif k == "name" and self.toks[self.i + 1] == ("op", "="):
                self.i += 2
                entries.append((("string", v), self.parse_expr()))
            else:
                entries.append((None, self.parse_expr()))
            if not (self.check_op(",") or self.check_op(";")):
                self.expect("op", "}")
                break
        return ("table", entries)


# ===========================================================================
# runtime values
# ===========================================================================

class LuaTable:
    __slots__ = ("h",)

    def __init__(self):
        self.h: dict = {}

    @staticmethod
    def _normkey(k):
        if isinstance(k, float) and not isinstance(k, bool):
            if math.isnan(k):
                raise LuaRuntimeError("table index is NaN")
            if k.is_integer():
                return int(k)
        return k

    def get(self, k):
        if k is None:
            return None
        return self.h.get(self._normkey(k))

    def set(self, k, v):
        if k is None:
            raise LuaRuntimeError("table index is nil")
        k = self._normkey(k)
        if v is None:
            self.h.pop(k, None)
        else:
            self.h[k] = v

    def length(self) -> int:
        n = 0
        while (n + 1) in self.h:
            n += 1
        return n


@dataclass
class _LuaFunc:
    params: list
    body: list
    upscopes: tuple  # lexical scope chain at definition


def _truthy(v) -> bool:
    return v is not None and v is not False


def _is_num(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _tostr(v) -> str:
    if v is None:
        return "nil"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        if math.isnan(v):
            return "nan"
        if v.is_integer() and abs(v) < 1e16:
            return "%.1f" % v
        return "%.14g" % v
    if isinstance(v, str):
        return v
    if isinstance(v, LuaTable):
        return f"table: 0x{id(v):012x}"
    return f"function: 0x{id(v):012x}"


def _str2num(s: str):
    t = s.strip()
    try:
        if t[:2].lower() in ("0x", "-0", "+0") and "x" in t[:3].lower():
            neg = t[0] == "-"
            body = t.lstrip("+-")
            return -int(body, 16) if neg else int(body, 16)
        try:
            return int(t)
        except ValueError:
            return float(t)
    except (ValueError, IndexError):
        return None


def _tonum(v, what="perform arithmetic on"):
    if _is_num(v):
        return v
    if isinstance(v, str):
        n = _str2num(v)
        if n is not None:
            return n
    raise LuaRuntimeError(f"attempt to {what} a {_typename(v)} value")


def _typename(v) -> str:
    if v is None:
        return "nil"
    if isinstance(v, bool):
        return "boolean"
    if _is_num(v):
        return "number"
    if isinstance(v, str):
        return "string"
    if isinstance(v, LuaTable):
        return "table"
    return "function"


# ===========================================================================
# interpreter
# ===========================================================================

# sandbox cap on any single Lua string (concat / rep amplification)
_MAX_STR = 10_000_000


class _Break(Exception):
    pass


class _Return(Exception):
    def __init__(self, vals: tuple):
        self.vals = vals


class _Interp:
    def __init__(self, globals_: dict, max_steps: int = 500_000):
        self.g = globals_
        self.max_steps = max_steps
        self.steps = 0

    def _tick(self):
        self.steps += 1
        if self.steps > self.max_steps:
            raise LuaRuntimeError("script exceeded its step budget")

    # --- scope helpers: scopes is a tuple of dicts, innermost LAST ---

    def _lookup(self, scopes, name):
        for s in reversed(scopes):
            if name in s:
                return s[name]
        return self.g.get(name)

    def _assign_name(self, scopes, name, val):
        for s in reversed(scopes):
            if name in s:
                s[name] = val
                return
        self.g[name] = val

    # --- statements ---

    def exec_block(self, block, scopes):
        for st in block:
            self._tick()
            tag = st[0]
            if tag == "local":
                _, names, exprs = st
                vals = self.eval_list(exprs, scopes, len(names))
                scopes[-1].update(zip(names, vals))
            elif tag == "assign":
                _, targets, exprs = st
                vals = self.eval_list(exprs, scopes, len(targets))
                for t, v in zip(targets, vals):
                    if t[0] == "name":
                        self._assign_name(scopes, t[1], v)
                    else:  # index
                        obj = self.eval(t[1], scopes)
                        key = self.eval(t[2], scopes)
                        if not isinstance(obj, LuaTable):
                            raise LuaRuntimeError(
                                f"attempt to index a {_typename(obj)} value"
                            )
                        obj.set(key, v)
            elif tag == "if":
                _, arms, els = st
                done = False
                for cond, body in arms:
                    if _truthy(self.eval(cond, scopes)):
                        self.exec_block(body, scopes + ({},))
                        done = True
                        break
                if not done and els is not None:
                    self.exec_block(els, scopes + ({},))
            elif tag == "return":
                raise _Return(self.eval_multi_list(st[1], scopes))
            elif tag == "callstat":
                self.eval_multi(st[1], scopes)
            elif tag == "while":
                _, cond, body = st
                while _truthy(self.eval(cond, scopes)):
                    self._tick()
                    try:
                        self.exec_block(body, scopes + ({},))
                    except _Break:
                        break
            elif tag == "fornum":
                _, name, e1, e2, e3, body = st
                i = _tonum(self.eval(e1, scopes), "use as a for bound for")
                stop = _tonum(self.eval(e2, scopes), "use as a for bound for")
                step = _tonum(self.eval(e3, scopes), "use as a for bound for")
                if step == 0:
                    raise LuaRuntimeError("'for' step is zero")
                while (i <= stop) if step > 0 else (i >= stop):
                    self._tick()
                    try:
                        self.exec_block(body, scopes + ({name: i},))
                    except _Break:
                        break
                    i += step
            elif tag == "forin":
                _, names, exprs, body = st
                f, s, var = (self.eval_multi_list(exprs, scopes) + (None,) * 3)[:3]
                while True:
                    self._tick()
                    vals = self.call(f, (s, var))
                    vals = vals + (None,) * (len(names) - len(vals))
                    if vals[0] is None:
                        break
                    var = vals[0]
                    try:
                        self.exec_block(body, scopes + (dict(zip(names, vals)),))
                    except _Break:
                        break
            elif tag == "do":
                self.exec_block(st[1], scopes + ({},))
            elif tag == "break":
                raise _Break()
            else:  # pragma: no cover
                raise LuaRuntimeError(f"unknown statement {tag}")

    # --- expressions ---

    def eval_list(self, exprs, scopes, want: int) -> list:
        """explist adjusted to exactly ``want`` values (Lua rules: all
        but the last are truncated to one, the last expands)."""
        vals = list(self.eval_multi_list(exprs, scopes))
        return (vals + [None] * want)[:want]

    def eval_multi_list(self, exprs, scopes) -> tuple:
        if not exprs:
            return ()
        out = [self.eval(e, scopes) for e in exprs[:-1]]
        return tuple(out) + self.eval_multi(exprs[-1], scopes)

    def eval_multi(self, expr, scopes) -> tuple:
        if expr[0] in ("call", "methcall"):
            return self._eval_call(expr, scopes)
        return (self.eval(expr, scopes),)

    def eval(self, expr, scopes):
        self._tick()
        tag = expr[0]
        if tag == "number" or tag == "string":
            return expr[1]
        if tag == "nil":
            return None
        if tag == "true":
            return True
        if tag == "false":
            return False
        if tag == "name":
            return self._lookup(scopes, expr[1])
        if tag == "paren":
            return self.eval(expr[1], scopes)
        if tag == "index":
            obj = self.eval(expr[1], scopes)
            key = self.eval(expr[2], scopes)
            return self._index(obj, key)
        if tag in ("call", "methcall"):
            vals = self._eval_call(expr, scopes)
            return vals[0] if vals else None
        if tag == "func":
            return _LuaFunc(expr[1], expr[2], scopes)
        if tag == "table":
            t = LuaTable()
            entries = expr[1]
            arr_i = 0
            for pos, (key, vexpr) in enumerate(entries):
                if key is None:
                    if pos == len(entries) - 1:
                        for v in self.eval_multi(vexpr, scopes):
                            arr_i += 1
                            t.set(arr_i, v)
                    else:
                        arr_i += 1
                        t.set(arr_i, self.eval(vexpr, scopes))
                else:
                    t.set(self.eval(key, scopes), self.eval(vexpr, scopes))
            return t
        if tag == "binop":
            return self._binop(expr[1], expr[2], expr[3], scopes)
        if tag == "unop":
            op, v = expr[1], self.eval(expr[2], scopes)
            if op == "not":
                return not _truthy(v)
            if op == "-":
                n = _tonum(v)
                return -n
            if op == "#":
                if isinstance(v, str):
                    return len(v)
                if isinstance(v, LuaTable):
                    return v.length()
                raise LuaRuntimeError(
                    f"attempt to get length of a {_typename(v)} value"
                )
        raise LuaRuntimeError(f"unknown expression {tag}")  # pragma: no cover

    def _index(self, obj, key):
        if isinstance(obj, LuaTable):
            return obj.get(key)
        if isinstance(obj, str):
            # strings index into the string library (Lua's string metatable)
            return _STRING_LIB.get(key)
        raise LuaRuntimeError(f"attempt to index a {_typename(obj)} value")

    def _eval_call(self, expr, scopes) -> tuple:
        if expr[0] == "methcall":
            _, objexpr, name, argexprs = expr
            obj = self.eval(objexpr, scopes)
            fn = self._index(obj, name)
            args = (obj,) + self.eval_multi_list(argexprs, scopes)
        else:
            _, fnexpr, argexprs = expr
            fn = self.eval(fnexpr, scopes)
            args = self.eval_multi_list(argexprs, scopes)
        return self.call(fn, args)

    def call(self, fn, args: tuple) -> tuple:
        self._tick()
        if isinstance(fn, _LuaFunc):
            padded = (args + (None,) * len(fn.params))[: len(fn.params)]
            scope = dict(zip(fn.params, padded))
            try:
                self.exec_block(fn.body, fn.upscopes + (scope,))
            except _Return as r:
                return r.vals
            return ()
        if callable(fn):
            out = fn(self, *args)
            return out if isinstance(out, tuple) else (out,)
        raise LuaRuntimeError(f"attempt to call a {_typename(fn)} value")

    def _binop(self, op, le, re_, scopes):
        if op == "and":
            lv = self.eval(le, scopes)
            return self.eval(re_, scopes) if _truthy(lv) else lv
        if op == "or":
            lv = self.eval(le, scopes)
            return lv if _truthy(lv) else self.eval(re_, scopes)
        a = self.eval(le, scopes)
        b = self.eval(re_, scopes)
        if op == "==":
            return _lua_eq(a, b)
        if op == "~=":
            return not _lua_eq(a, b)
        if op == "..":
            for v in (a, b):
                if not (_is_num(v) or isinstance(v, str)):
                    raise LuaRuntimeError(
                        f"attempt to concatenate a {_typename(v)} value"
                    )
            sa, sb = _tostr(a), _tostr(b)
            # sandbox: the step budget can't catch geometric growth
            # (s = s .. s doubles per tick) — cap result size directly
            if len(sa) + len(sb) > _MAX_STR:
                raise LuaRuntimeError("concatenation result too large")
            return sa + sb
        if op in ("<", "<=", ">", ">="):
            if _is_num(a) and _is_num(b):
                pass
            elif isinstance(a, str) and isinstance(b, str):
                pass
            else:
                raise LuaRuntimeError(
                    f"attempt to compare {_typename(a)} with {_typename(b)}"
                )
            return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[op]
        x, y = _tonum(a), _tonum(b)
        both_int = isinstance(x, int) and isinstance(y, int)
        if op == "+":
            return x + y
        if op == "-":
            return x - y
        if op == "*":
            return x * y
        if op == "/":
            # Lua 5.3+: '/' is ALWAYS float division (Python int/int is too)
            try:
                return x / y
            except ZeroDivisionError:
                return math.nan if x == 0 else (math.inf if x > 0 else -math.inf)
        if op == "//":
            if y == 0:
                if both_int:
                    raise LuaRuntimeError("attempt to perform 'n//0'")
                return math.nan if x == 0 else (math.inf if x > 0 else -math.inf)
            if both_int:
                return x // y  # Python floordiv == Lua floored semantics
            return float(math.floor(x / y))
        if op == "%":
            if both_int:
                if y == 0:
                    raise LuaRuntimeError("attempt to perform 'n%0'")
                return x % y  # Python % is floored, same as Lua
            try:
                return x - math.floor(x / y) * y
            except (ZeroDivisionError, OverflowError, ValueError):
                return math.nan
        if op == "^":
            return float(x) ** float(y)
        raise LuaRuntimeError(f"unknown operator {op}")  # pragma: no cover


def _lua_eq(a, b) -> bool:
    # bools are not numbers in Lua; Python's True == 1 must not leak
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b
    if a is None or b is None:
        return a is b
    if _is_num(a) and _is_num(b):
        return a == b
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b


# ===========================================================================
# sandbox library (the reference opens base/table/string + json only)
# ===========================================================================

def _lua_find_impl(s, pat, init, want_find):
    rx, ncaps = compile_lua_pattern(pat)
    pos = _abs_index(init, len(s)) - 1 if init is not None else 0
    pos = max(0, min(pos, len(s)))
    if pat.startswith("^"):
        rx2, _ = _ANCHORED_CACHE.get(pat) or _anchored_variant(pat)
        m = rx2.match(s, pos)
    else:
        m = rx.search(s, pos)
    if not m:
        return (None,)
    caps = tuple(g for g in m.groups()) if ncaps else ()
    if want_find:
        return (m.start() + 1, m.end()) + caps
    return caps if ncaps else (m.group(0),)


_ANCHORED_CACHE: dict[str, tuple[re.Pattern, int]] = {}


def _anchored_variant(pat: str) -> tuple[re.Pattern, int]:
    rx_src, n = lua_pattern_to_regex(pat[1:])
    hit = _ANCHORED_CACHE[pat] = (re.compile(rx_src), n)
    return hit


def _abs_index(i, n):
    if i is None:
        return 1
    i = int(i)
    if i < 0:
        return max(n + i + 1, 1)
    return i if i > 0 else 1


def _check_str(v, fname):
    if isinstance(v, str):
        return v
    if _is_num(v):
        return _tostr(v)
    raise LuaRuntimeError(f"bad argument to '{fname}' (string expected)")


def _s_match(I, s=None, pat=None, init=None):
    return _lua_find_impl(_check_str(s, "match"), _check_str(pat, "match"), init, False)


def _s_find(I, s=None, pat=None, init=None, plain=None):
    s = _check_str(s, "find")
    pat = _check_str(pat, "find")
    if _truthy(plain):
        pos = _abs_index(init, len(s)) - 1
        k = s.find(pat, max(pos, 0))
        return (None,) if k < 0 else (k + 1, k + len(pat))
    return _lua_find_impl(s, pat, init, True)


def _s_gmatch(I, s=None, pat=None):
    s = _check_str(s, "gmatch")
    pat = _check_str(pat, "gmatch")
    rx, ncaps = compile_lua_pattern(pat)
    state = {"pos": 0}

    def it(I2, *_a):
        while state["pos"] <= len(s):
            m = rx.search(s, state["pos"])
            if not m:
                return None
            state["pos"] = m.end() + 1 if m.end() == m.start() else m.end()
            return m.groups() if ncaps else (m.group(0),)
        return None

    return it


def _s_gsub(I, s=None, pat=None, repl=None, n=None):
    s = _check_str(s, "gsub")
    pat = _check_str(pat, "gsub")
    rx, ncaps = compile_lua_pattern(pat)
    limit = int(n) if n is not None else -1
    out = []
    pos = 0
    count = 0
    while pos <= len(s) and count != limit:
        m = rx.search(s, pos)
        if not m:
            break
        out.append(s[pos : m.start()])
        whole = m.group(0)
        caps = m.groups() if ncaps else (whole,)
        if isinstance(repl, str):
            rep = re.sub(
                r"%([0-9%%])",
                lambda mm: "%" if mm.group(1) == "%" else (
                    whole if mm.group(1) == "0" else (caps[int(mm.group(1)) - 1] or "")
                ),
                repl,
            )
        elif isinstance(repl, LuaTable):
            rep = repl.get(caps[0])
        elif callable(repl) or isinstance(repl, _LuaFunc):
            rv = I.call(repl, caps)
            rep = rv[0] if rv else None
        else:
            raise LuaRuntimeError("bad replacement type in gsub")
        if rep is None or rep is False:
            rep = whole
        out.append(_check_str(rep, "gsub"))
        count += 1
        pos = m.end() + 1 if m.end() == m.start() else m.end()
        if m.end() == m.start() and m.start() < len(s):
            out.append(s[m.start()])
    out.append(s[pos:])
    return ("".join(out), count)


def _s_sub(I, s=None, i=None, j=None):
    s = _check_str(s, "sub")
    n = len(s)
    a = _abs_index(int(i) if i is not None else 1, n)
    b = int(j) if j is not None else -1
    b = n + b + 1 if b < 0 else min(b, n)
    if a > b:
        return ""
    return s[a - 1 : b]


def _s_format(I, fmt=None, *args):
    fmt = _check_str(fmt, "format")
    out = []
    ai = 0
    i = 0
    while i < len(fmt):
        c = fmt[i]
        if c != "%":
            out.append(c)
            i += 1
            continue
        m = re.match(r"%([-+ #0]*\d*(?:\.\d+)?)([diufgGeExXoqsc%])", fmt[i:])
        if not m:
            raise LuaRuntimeError(f"invalid format string near {fmt[i:i+3]!r}")
        spec, conv = m.group(1), m.group(2)
        i += m.end()
        if conv == "%":
            out.append("%")
            continue
        arg = args[ai] if ai < len(args) else None
        ai += 1
        if conv in "diu":
            v = _tonum(arg, "format")
            out.append(("%" + spec + "d") % int(v))
        elif conv in "fgGeE":
            out.append(("%" + spec + conv) % float(_tonum(arg, "format")))
        elif conv in "xXo":
            out.append(("%" + spec + conv) % int(_tonum(arg, "format")))
        elif conv == "c":
            out.append(chr(int(_tonum(arg, "format"))))
        elif conv == "q":
            out.append(_json.dumps(_check_str(arg, "format")))
        else:  # s
            out.append(("%" + spec + "s") % _tostr(arg))
    return "".join(out)


def _s_rep(I, s=None, n=None, sep=None):
    s = _check_str(s, "rep")
    k = max(int(_tonum(n)), 0)
    if k * (len(s) + len(sep or "")) > _MAX_STR:
        raise LuaRuntimeError("rep result too large")
    return (sep or "").join([s] * k) if sep else s * k


def _mk_string_lib():
    lib = {
        "match": _s_match,
        "find": _s_find,
        "gmatch": _s_gmatch,
        "gsub": _s_gsub,
        "sub": _s_sub,
        "format": _s_format,
        "len": lambda I, s=None: len(_check_str(s, "len")),
        "upper": lambda I, s=None: _check_str(s, "upper").upper(),
        "lower": lambda I, s=None: _check_str(s, "lower").lower(),
        "rep": _s_rep,
        "reverse": lambda I, s=None: _check_str(s, "reverse")[::-1],
        "byte": _s_byte,
        "char": lambda I, *a: "".join(chr(int(_tonum(x))) for x in a),
    }
    return lib


def _s_byte(I, s=None, i=None, j=None):
    s = _check_str(s, "byte")
    a = int(i) if i is not None else 1
    b = int(j) if j is not None else a
    n = len(s)
    a = n + a + 1 if a < 0 else a
    b = n + b + 1 if b < 0 else b
    a, b = max(a, 1), min(b, n)
    return tuple(ord(c) for c in s[a - 1 : b])


_STRING_LIB = _mk_string_lib()


def _t_insert(I, t=None, a=None, b=None):
    if not isinstance(t, LuaTable):
        raise LuaRuntimeError("bad argument to 'insert' (table expected)")
    if b is None:
        t.set(t.length() + 1, a)
    else:
        pos = int(_tonum(a))
        n = t.length()
        for k in range(n, pos - 1, -1):
            t.set(k + 1, t.get(k))
        t.set(pos, b)
    return None


def _t_remove(I, t=None, pos=None):
    if not isinstance(t, LuaTable):
        raise LuaRuntimeError("bad argument to 'remove' (table expected)")
    n = t.length()
    p = int(_tonum(pos)) if pos is not None else n
    if n == 0:
        return None
    v = t.get(p)
    for k in range(p, n):
        t.set(k, t.get(k + 1))
    t.set(n, None)
    return v


def _t_concat(I, t=None, sep=None, i=None, j=None):
    if not isinstance(t, LuaTable):
        raise LuaRuntimeError("bad argument to 'concat' (table expected)")
    sep = _check_str(sep, "concat") if sep is not None else ""
    a = int(_tonum(i)) if i is not None else 1
    b = int(_tonum(j)) if j is not None else t.length()
    parts = []
    for k in range(a, b + 1):
        v = t.get(k)
        if not (isinstance(v, str) or _is_num(v)):
            raise LuaRuntimeError(f"invalid value (at index {k}) in table for 'concat'")
        parts.append(_tostr(v))
    return sep.join(parts)


def _b_pairs(I, t=None):
    if not isinstance(t, LuaTable):
        raise LuaRuntimeError("bad argument to 'pairs' (table expected)")
    items = list(t.h.items())
    state = {"i": 0}

    def it(I2, *_a):
        while state["i"] < len(items):
            k, v = items[state["i"]]
            state["i"] += 1
            if t.h.get(k) is not None:  # skip keys deleted mid-iteration
                return (k, t.h[k])
        return None

    return (it, t, None)


def _b_ipairs(I, t=None):
    if not isinstance(t, LuaTable):
        raise LuaRuntimeError("bad argument to 'ipairs' (table expected)")

    def it(I2, tt, i):
        nxt = int(i) + 1
        v = t.get(nxt)
        return None if v is None else (nxt, v)

    return (it, t, 0)


def _b_pcall(I, f=None, *args):
    try:
        return (True,) + I.call(f, args)
    except LuaRuntimeError as e:
        return (False, e.value)


def _b_error(I, msg=None, level=None):
    raise LuaRuntimeError(msg)


def _b_assert(I, v=None, msg=None, *rest):
    if not _truthy(v):
        raise LuaRuntimeError(msg if msg is not None else "assertion failed!")
    return (v, msg) + rest if msg is not None else (v,)


def _json_to_lua(v):
    if isinstance(v, dict):
        t = LuaTable()
        for k, val in v.items():
            t.set(k, _json_to_lua(val))
        return t
    if isinstance(v, list):
        t = LuaTable()
        for i, val in enumerate(v, 1):
            t.set(i, _json_to_lua(val))
        return t
    return v


def _lua_to_jsonable(v, depth=0):
    """convertLuaValue analog (reference lua.go:121-160): consecutive
    1..n integer keys -> array, else string-keyed object; numbers stay
    numbers (Go renders integral float64 without '.0' — mirrored by
    collapsing integral floats to ints)."""
    if depth > 16:
        raise LuaRuntimeError("metadata nesting too deep")
    if isinstance(v, LuaTable):
        n = v.length()
        if n > 0 and len(v.h) == n:
            return [_lua_to_jsonable(v.get(i), depth + 1) for i in range(1, n + 1)]
        return {
            _tostr(k): _lua_to_jsonable(val, depth + 1) for k, val in v.h.items()
        }
    if isinstance(v, bool) or v is None or isinstance(v, str):
        return v
    if isinstance(v, float) and v.is_integer() and abs(v) < 2**53:
        return int(v)
    if _is_num(v):
        return v
    return _tostr(v)


def _b_require(I, name=None):
    if name == "json":
        t = LuaTable()
        t.set("decode", lambda I2, s=None: _json_to_lua(_json_loads_lua(s)))
        t.set(
            "encode",
            lambda I2, v=None: _json.dumps(
                _lua_to_jsonable(v), separators=(",", ":")
            ),
        )
        return t
    raise LuaRuntimeError(f"module '{_tostr(name)}' not found")


def _json_loads_lua(s):
    try:
        return _json.loads(_check_str(s, "decode"))
    except (ValueError, LuaRuntimeError) as e:
        raise LuaRuntimeError(f"invalid json: {e}") from None


def _make_globals() -> dict:
    str_t = LuaTable()
    str_t.h.update(_STRING_LIB)
    tbl_t = LuaTable()
    tbl_t.h.update({"insert": _t_insert, "remove": _t_remove, "concat": _t_concat})
    g = {
        "string": str_t,
        "table": tbl_t,
        "type": lambda I, v=None: _typename(v),
        "tostring": lambda I, v=None: _tostr(v),
        "tonumber": _b_tonumber,
        "pairs": _b_pairs,
        "ipairs": _b_ipairs,
        "error": _b_error,
        "assert": _b_assert,
        "pcall": _b_pcall,
        "print": lambda I, *a: None,
        "require": _b_require,
        "select": _b_select,
        "math": _mk_math_table(),
    }
    return g


def _b_tonumber(I, v=None, base=None):
    if base is not None:
        try:
            return int(_check_str(v, "tonumber").strip(), int(_tonum(base)))
        except ValueError:
            return None
    if _is_num(v):
        return v
    if isinstance(v, str):
        return _str2num(v)
    return None


def _b_select(I, what=None, *args):
    if what == "#":
        return len(args)
    k = int(_tonum(what))
    if k < 0:
        k = len(args) + k + 1
    return args[k - 1 :] if 0 < k <= len(args) else ()


def _mk_math_table() -> LuaTable:
    t = LuaTable()
    t.h.update(
        {
            "floor": lambda I, x=None: math.floor(_tonum(x)),
            "ceil": lambda I, x=None: math.ceil(_tonum(x)),
            "abs": lambda I, x=None: abs(_tonum(x)),
            "max": lambda I, *a: max(_tonum(x) for x in a),
            "min": lambda I, *a: min(_tonum(x) for x in a),
            "huge": math.inf,
            "pi": math.pi,
            "sqrt": lambda I, x=None: math.sqrt(_tonum(x)),
            "fmod": lambda I, a=None, b=None: math.fmod(_tonum(a), _tonum(b)),
            "tointeger": lambda I, x=None: (
                int(x) if _is_num(x) and float(x).is_integer() else None
            ),
        }
    )
    return t


# ===========================================================================
# the parse_log contract runner
# ===========================================================================

# Strict second-precision RFC3339: offsets Z or ±HH:MM only — Go's
# time.RFC3339 acceptance set (reference parses with it, lua.go:104),
# minus fractional seconds (documented deviation: neither tier here
# accepts them, so a script can never claim a line on one path and
# miss it on the other). This is ALSO exactly what the codegen fast
# path accepts: Spark's "yyyy-MM-dd'T'HH:mm:ssXXX" is case-insensitive
# on T/Z, requires the colon offset form and a valid calendar date —
# verified empirically and pinned by tests/test_lua_parser.py.
LUA_TS_FORMAT_SPARK = "yyyy-MM-dd'T'HH:mm:ssXXX"
_RFC3339_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})[Tt](\d{2}):(\d{2}):(\d{2})"
    r"(?:[Zz]|([+-])(\d{2}):(\d{2}))$"
)


def parse_rfc3339_utc(s: str):
    """RFC3339 (second precision) -> naive UTC datetime, or None."""
    m = _RFC3339_RE.match(s)
    if not m:
        return None
    try:
        dt = datetime(
            int(m.group(1)), int(m.group(2)), int(m.group(3)),
            int(m.group(4)), int(m.group(5)), int(m.group(6)),
        )
    except ValueError:
        return None
    if m.group(7):
        off = timedelta(hours=int(m.group(8)), minutes=int(m.group(9)))
        if off > timedelta(hours=18):  # java ZoneOffset limit, mirrored
            return None
        dt = dt - off if m.group(7) == "+" else dt + off
    return dt


class LuaScript:
    """A compiled ``parse_log`` script: AST + a fresh sandbox global
    table, executed once (like DoFile per pooled VM, lua.go:66); then
    :meth:`run_parse_log` is called per line. Global state persists
    across calls within one instance — same as one pooled VM."""

    def __init__(self, source: str, max_steps: int = 500_000):
        self.source = source
        self.max_steps = max_steps
        try:
            self.chunk = _Parser(_lex(source)).parse_chunk()
        except LuaScriptError:
            raise
        except Exception as e:  # lexer index errors on malformed input
            raise LuaScriptError(f"script parse failed: {e}") from e
        self.g = _make_globals()
        interp = _Interp(self.g, max_steps)
        try:
            interp.exec_block(self.chunk, ({},))
        except (_Return, _Break):
            pass
        except LuaRuntimeError as e:
            raise LuaScriptError(f"script body failed: {e}") from e
        fn = self.g.get("parse_log")
        if not isinstance(fn, _LuaFunc):
            raise LuaScriptError("script must define function parse_log(line)")
        self.fn = fn

    def run_parse_log(self, line: str):
        """-> (ok, ts: datetime|None, level, message, metadata_json) —
        the reference's Process semantics (lua.go:81-119): any script
        error / bad timestamp / non-table metadata leaves the record
        unchanged (ok=False)."""
        interp = _Interp(self.g, self.max_steps)
        try:
            vals = interp.call(self.fn, (line,))
        except LuaRuntimeError:
            return (False, None, None, None, None)
        vals = (tuple(vals) + (None,) * 4)[:4]
        lvl, msg, ts_raw, meta = vals
        ts_s = ts_raw if isinstance(ts_raw, str) else (
            _tostr(ts_raw) if _is_num(ts_raw) else ""
        )
        ts = parse_rfc3339_utc(ts_s)
        if ts is None:
            return (False, None, None, None, None)
        if not isinstance(meta, LuaTable):
            return (False, None, None, None, None)
        try:
            jmeta = _lua_to_jsonable(meta)
        except LuaRuntimeError:
            return (False, None, None, None, None)
        if not isinstance(jmeta, dict):
            jmeta = {str(i + 1): v for i, v in enumerate(jmeta)}
        lvl_s = lvl if isinstance(lvl, str) else (_tostr(lvl) if _is_num(lvl) else "")
        msg_s = msg if isinstance(msg, str) else (_tostr(msg) if _is_num(msg) else "")
        return (True, ts, lvl_s, msg_s, _json.dumps(jmeta, separators=(",", ":")))


# worker-side cache: the UDF closure pickles only the SOURCE; each
# executor compiles once and reuses the instance across batches — the
# exact analog of the reference's sync.Pool of loaded VMs.
_SCRIPT_CACHE: dict[str, LuaScript] = {}


def _script_for(source: str) -> LuaScript:
    s = _SCRIPT_CACHE.get(source)
    if s is None:
        s = _SCRIPT_CACHE[source] = LuaScript(source)
    return s


def _lua_batch_fn(source: str):
    def fn(lines: pd.Series) -> pd.DataFrame:
        script = _script_for(source)
        lines = lines.reset_index(drop=True)
        n = len(lines)
        ok = np.zeros(n, dtype=bool)
        level = np.full(n, None, dtype=object)
        message = np.full(n, None, dtype=object)
        meta_json = np.full(n, None, dtype=object)
        timestamp = pd.Series(pd.NaT, index=range(n), dtype="datetime64[ns]")
        vals = lines.to_numpy(dtype=object)
        for i in range(n):
            s = vals[i]
            if s is None or (isinstance(s, float) and math.isnan(s)):
                continue
            r_ok, ts, lvl, msg, mj = script.run_parse_log(s)
            if r_ok:
                ok[i] = True
                timestamp[i] = ts
                level[i] = lvl
                message[i] = msg
                meta_json[i] = mj
        lev = parse_level_pd(pd.Series(level, dtype=object))
        lev[~ok] = None
        return pd.DataFrame(
            {
                "ok": ok,
                "timestamp": timestamp,
                "level": lev,
                "message": message,
                "metadata_json": meta_json,
            }
        )

    return fn


# ===========================================================================
# fast path: compile the canonical script shape to GrokParser codegen
# ===========================================================================

def _is_strmatch_call(expr, param: str):
    """Return the pattern literal if expr is string.match(param, "PAT")
    or param:match("PAT")."""
    if expr[0] == "methcall":
        _, obj, name, args = expr
        if name == "match" and obj == ("name", param) and len(args) == 1:
            if args[0][0] == "string":
                return args[0][1]
    if expr[0] == "call":
        _, fnexpr, args = expr
        if (
            fnexpr == ("index", ("name", "string"), ("string", "match"))
            and len(args) == 2
            and args[0] == ("name", param)
            and args[1][0] == "string"
        ):
            return args[1][1]
    return None


def _try_compile_grok(name: str, source: str) -> GrokParser | None:
    """Recognize the canonical parse_log shape and compile to the
    codegen GrokParser. Returns None when the script needs the
    interpreter (any analysis miss falls back — never a wrong plan).

    Shape (what grep over public logzilla-style deployments shows as
    the dominant script): optional require-json prologue, one
    string.match binding locals to captures, an optional
    no-match guard whose return cannot produce a valid timestamp,
    and a final ``return level, message, ts, {k = capture, ...}``.
    """
    try:
        chunk = _Parser(_lex(source)).parse_chunk()
    except LuaScriptError:
        return None
    body = None
    param = None
    for st in chunk:
        if st[0] == "local" and len(st[1]) == 1 and st[2] == [
            ("call", ("name", "require"), [("string", "json")])
        ]:
            continue  # local json = require("json") prologue
        if (
            st[0] == "assign"
            and len(st[1]) == 1
            and st[1][0] == ("name", "parse_log")
            and len(st[2]) == 1
            and st[2][0][0] == "func"
        ):
            if body is not None:
                return None
            params = st[2][0][1]
            if len(params) != 1:
                return None
            param, body = params[0], st[2][0][2]
            continue
        return None
    if body is None:
        return None

    it = iter(body)
    st = next(it, None)
    # 1) local c1, ..., ck = string.match(line, "PAT")
    if st is None or st[0] != "local" or len(st[2]) != 1:
        return None
    pat = _is_strmatch_call(st[2][0], param)
    if pat is None:
        return None
    cap_names = st[1]
    try:
        _, ncaps = lua_pattern_to_regex(pat)
    except LuaPatternError:
        return None
    if ncaps == 0 or len(cap_names) > ncaps:
        return None  # whole-match binding / over-binding: interpreter
    group_names = list(cap_names) + [f"_luacap{i}" for i in range(len(cap_names), ncaps)]
    if len(set(group_names)) != len(group_names):
        return None
    regex, _ = lua_pattern_to_regex(pat, group_names=group_names)
    caps = set(cap_names)

    st = next(it, None)
    # 2) optional guard: if <cap> == nil / not <cap> then return ... end
    if st is not None and st[0] == "if":
        arms, els = st[1], st[2]
        if len(arms) != 1 or els is not None:
            return None
        cond, blk = arms[0]
        guard_ok = (
            cond[0] == "binop"
            and cond[1] == "=="
            and cond[2][0] == "name"
            and cond[2][1] in caps
            and cond[3] == ("nil",)
        ) or (
            cond[0] == "unop"
            and cond[1] == "not"
            and cond[2][0] == "name"
            and cond[2][1] in caps
        )
        if not guard_ok:
            return None
        if len(blk) != 1 or blk[0][0] != "return":
            return None
        # the guard return must be UNCLAIMABLE: ts position nil/absent
        # or a non-RFC3339 literal (else reference semantics claim the
        # line with defaults — only the interpreter can express that)
        rex = blk[0][1]
        ts_e = rex[2] if len(rex) > 2 else ("nil",)
        if ts_e == ("nil",):
            pass
        elif ts_e[0] == "string" and parse_rfc3339_utc(ts_e[1]) is None:
            pass
        else:
            return None
        st = next(it, None)

    # 3) return level, message, ts, {entries}
    if st is None or st[0] != "return" or next(it, None) is not None:
        return None
    rex = st[1]
    if len(rex) != 4:
        return None
    lvl_e, msg_e, ts_e, tbl_e = rex

    level_group = None
    level_static = "UNKNOWN"
    if lvl_e[0] == "name" and lvl_e[1] in caps:
        level_group = lvl_e[1]
    elif lvl_e[0] == "string":
        level_static = _LEVEL_MAP.get(lvl_e[1].lower(), "UNKNOWN")
    else:
        return None

    message_groups: tuple[str, ...] = ()
    message_static = ""
    def _flatten_concat(e, acc):
        if e[0] == "binop" and e[1] == "..":
            return _flatten_concat(e[2], acc) and _flatten_concat(e[3], acc)
        acc.append(e)
        return True

    if msg_e[0] == "name" and msg_e[1] in caps:
        message_groups = (msg_e[1],)
    elif msg_e[0] == "string":
        message_static = msg_e[1]
    elif msg_e[0] == "binop" and msg_e[1] == "..":
        parts: list = []
        _flatten_concat(msg_e, parts)
        # GrokParser joins message groups with single spaces — accept
        # exactly the alternating  cap .. " " .. cap  shape
        grps: list[str] = []
        for j, p in enumerate(parts):
            if j % 2 == 0:
                if p[0] == "name" and p[1] in caps:
                    grps.append(p[1])
                else:
                    return None
            elif p != ("string", " "):
                return None
        if len(parts) % 2 == 0:
            return None
        message_groups = tuple(grps)
    else:
        return None

    ts_group = None
    ts_static = None
    if ts_e[0] == "name" and ts_e[1] in caps:
        ts_group = ts_e[1]
    elif ts_e[0] == "string":
        ts_static = ts_e[1]  # invalid constant -> never claims (contract)
    else:
        return None

    if tbl_e[0] != "table":
        return None
    meta_entries: list[tuple[str, str]] = []
    for key, vexpr in tbl_e[1]:
        if key is None or key[0] != "string":
            return None
        if vexpr[0] == "name" and vexpr[1] in caps:
            meta_entries.append((key[1], vexpr[1]))
        else:
            return None  # literal/computed metadata values -> interpreter

    return GrokParser(
        name=name,
        pattern=regex,
        ts_group=ts_group,
        ts_format_spark=LUA_TS_FORMAT_SPARK if (ts_group or ts_static) else None,
        ts_static=ts_static,
        level_group=level_group,
        level_static=level_static,
        message_groups=message_groups,
        message_static=message_static,
        metadata_groups=tuple(meta_entries),
    )


# ===========================================================================
# public factory
# ===========================================================================

@dataclass(frozen=True)
class LuaParser:
    """LineParser facade: delegates to the compiled tier.

    ``mode`` is ``"codegen"`` (GrokParser fast path — zero Python per
    row) or ``"arrow"`` (sandboxed interpreter in a pandas UDF).
    """

    name: str
    source: str
    delegate: Any = field(compare=False)
    mode: str = "arrow"

    def plan(self, lines, claimed):
        return self.delegate.plan(lines, claimed)


def lua_parser(
    name: str,
    script: str | None = None,
    script_path: str | None = None,
    force_interpreter: bool = False,
    candidate_re: str | None = None,
) -> LuaParser:
    """Build a registry parser from a reference-style Lua script.

    Exactly one of ``script`` / ``script_path`` (the reference's
    ``script-path`` YAML field, config/config.go + lua.go:15-17).
    The script is validated NOW (bad scripts fail registration, like
    the reference pool factory's DoFile panic). ``force_interpreter``
    pins the Arrow tier (used by the differential tests);
    ``candidate_re`` is an optional codegen prefilter for the Arrow
    tier so non-candidate lines never cross into Python.
    """
    if (script is None) == (script_path is None):
        raise LuaScriptError("exactly one of script / script_path is required")
    if script_path is not None:
        with open(script_path, "r", encoding="utf-8") as f:
            script = f.read()
    assert script is not None
    LuaScript(script)  # validate: lex/parse + module body + parse_log exists
    if not force_interpreter:
        grok = _try_compile_grok(name, script)
        if grok is not None:
            return LuaParser(name=name, source=script, delegate=grok, mode="codegen")
    delegate = PandasParser(
        name=name, fn=_lua_batch_fn(script), candidate_re=candidate_re
    )
    return LuaParser(name=name, source=script, delegate=delegate, mode="arrow")
