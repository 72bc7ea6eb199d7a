"""Lucene expressions module: the JavaScript-like scoring-expression
language compiled to a Catalyst SQL expression.

Reference: expressions/src/java/org/apache/lucene/expressions/js/
Javascript.g4 (the ANTLR grammar this parser transcribes: precedence
ladder precedence < unary < muldiv < addsub < bwshift < boolcomp <
booleqne < bwand < bwxor < bwor < booland < boolor < conditional,
?: right-associative) and JavascriptCompiler.java (all values are
doubles; bitwise/shift operators cast double->long->double; boolean
operators and comparisons yield 1.0/0.0; truthiness = value != 0).
The default function table is JavascriptCompiler.properties (26
functions, all static double methods).

Where the reference compiles to JVM bytecode reading
``DoubleValuesSource`` bindings, this compiles to a Spark SQL string
whole-stage-codegen evaluates over DataFrame columns — bindings map
variable names to SQL snippets (SimpleBindings analog), e.g.
``{"_score": "score"}``. With ``bindings=None`` every variable is
bound to the column of the same name (names are validated to plain
identifiers before quoting).

Documented deviations (each pinned by a test):

- NaN ordering follows Spark (NaN > any double, NaN == NaN) in
  comparisons, not Java's always-false dcmp.
- ``haversin``/``haversinMeters`` use the exact haversine at the
  IUGG mean radius, not SloppyMath's table approximation (the
  reference documents its own error bound of ~40 cm).
- ``ln``/``log10``/``logn`` are wrapped to Java semantics (0 ->
  -Infinity, negative -> NaN) because Spark's ``ln`` returns NULL
  off-domain.
"""

from __future__ import annotations

import re

__all__ = ["compile_expression", "JavascriptParseError", "FUNCTIONS"]


class JavascriptParseError(ValueError):
    """Syntax/semantic error in an expression (the reference throws
    ParseException from JavascriptCompiler.compile)."""


_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<hex>0[xX][0-9a-fA-F]+)
  | (?P<octal>0[0-7]+)
  | (?P<decimal>(?:(?:0|[1-9][0-9]*)(?:\.[0-9]*)?|\.[0-9]+)(?:[eE][+-]?[0-9]+)?)
  | (?P<variable>[_$a-zA-Z][_$a-zA-Z0-9]*
        (?:\[(?:'(?:\\'|\\\\|[^\\'])*'|"(?:\\"|\\\\|[^\\"])*"|[0-9]+)\])*
        (?:\.[_$a-zA-Z][_$a-zA-Z0-9]*
        (?:\[(?:'(?:\\'|\\\\|[^\\'])*'|"(?:\\"|\\\\|[^\\"])*"|[0-9]+)\])*)*)
  | (?P<op><<|>>>|>>|<=|>=|==|!=|&&|\|\||[-+*/%()!~<>&^|?:,])
""", re.VERBOSE)

# name -> (arity, emitter) where emitter takes already-double SQL args
_EARTH_MEAN_RADIUS_M = 6_371_008.7714


def _java_log(fn: str, x: str) -> str:
    """Java Math.log-family semantics: 0 -> -Infinity, <0 -> NaN
    (Spark's ln/log10/log return NULL off-domain)."""
    return (f"(CASE WHEN {x} > 0.0D THEN {fn}({x}) "
            f"WHEN {x} = 0.0D THEN double('-Infinity') "
            f"ELSE double('NaN') END)")


def _haversin_meters(lat1, lon1, lat2, lon2) -> str:
    return (f"(2.0D * {_EARTH_MEAN_RADIUS_M}D * asin(sqrt("
            f"pow(sin((radians({lat2}) - radians({lat1})) / 2.0D), 2.0D)"
            f" + cos(radians({lat1})) * cos(radians({lat2})) * "
            f"pow(sin((radians({lon2}) - radians({lon1})) / 2.0D), 2.0D)"
            f")))")


FUNCTIONS: dict = {
    # JavascriptCompiler.properties, same names and arities
    "abs": (1, lambda a: f"abs({a})"),
    "acos": (1, lambda a: f"acos({a})"),
    "acosh": (1, lambda a: f"acosh({a})"),
    "asin": (1, lambda a: f"asin({a})"),
    "asinh": (1, lambda a: f"asinh({a})"),
    "atan": (1, lambda a: f"atan({a})"),
    "atan2": (2, lambda a, b: f"atan2({a}, {b})"),
    "atanh": (1, lambda a: f"atanh({a})"),
    "ceil": (1, lambda a: f"CAST(ceil({a}) AS DOUBLE)"),
    "cos": (1, lambda a: f"cos({a})"),
    "cosh": (1, lambda a: f"cosh({a})"),
    "exp": (1, lambda a: f"exp({a})"),
    "floor": (1, lambda a: f"CAST(floor({a}) AS DOUBLE)"),
    "haversin": (4, lambda a, b, c, d:
                 f"({_haversin_meters(a, b, c, d)} / 1000.0D)"),
    "haversinMeters": (4, _haversin_meters),
    "ln": (1, lambda a: _java_log("ln", a)),
    "log10": (1, lambda a: _java_log("log10", a)),
    # MathUtil.log(base, x) = ln(x)/ln(base); keep Java off-domain
    "logn": (2, lambda b, x: f"({_java_log('ln', x)} / "
                             f"{_java_log('ln', b)})"),
    "max": (2, lambda a, b: f"greatest({a}, {b})"),
    "min": (2, lambda a, b: f"least({a}, {b})"),
    "pow": (2, lambda a, b: f"pow({a}, {b})"),
    "sin": (1, lambda a: f"sin({a})"),
    "sinh": (1, lambda a: f"sinh({a})"),
    "sqrt": (1, lambda a: f"sqrt({a})"),
    "tan": (1, lambda a: f"tan({a})"),
    "tanh": (1, lambda a: f"tanh({a})"),
}

_IDENT_RE = re.compile(r"^[_$a-zA-Z][_$a-zA-Z0-9]*$")


def _tokenize(src: str) -> list:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            raise JavascriptParseError(
                f"unexpected character {src[pos]!r} at position {pos}")
        pos = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


class _Parser:
    """Recursive descent over the Javascript.g4 precedence ladder."""

    def __init__(self, tokens: list) -> None:
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def take(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, text: str):
        k, v = self.take()
        if v != text:
            raise JavascriptParseError(f"expected {text!r}, got {v!r}")

    # precedence ladder bottom-up; each returns ('num'|'bool', sql)
    def parse(self):
        node = self.conditional()
        if self.peek()[0] != "eof":
            raise JavascriptParseError(
                f"unexpected trailing input {self.peek()[1]!r}")
        return node

    def conditional(self):
        cond = self.boolor()
        if self.peek()[1] == "?":
            self.take()
            # grammar: branches are full conditional expressions
            # (right-assoc), separated by ':'
            then = self.conditional()
            self.expect(":")
            other = self.conditional()
            return ("ternary", cond, then, other)
        return cond

    def _binchain(self, sub, ops: tuple, kind: str):
        node = sub()
        while self.peek()[0] == "op" and self.peek()[1] in ops:
            op = self.take()[1]
            node = (kind, op, node, sub())
        return node

    def boolor(self):
        return self._binchain(self.booland, ("||",), "boollogic")

    def booland(self):
        return self._binchain(self.bwor, ("&&",), "boollogic")

    def bwor(self):
        return self._binchain(self.bwxor, ("|",), "bitwise")

    def bwxor(self):
        return self._binchain(self.bwand, ("^",), "bitwise")

    def bwand(self):
        return self._binchain(self.booleqne, ("&",), "bitwise")

    def booleqne(self):
        return self._binchain(self.boolcomp, ("==", "!="), "compare")

    def boolcomp(self):
        return self._binchain(self.bwshift, ("<", "<=", ">", ">="),
                              "compare")

    def bwshift(self):
        return self._binchain(self.addsub, ("<<", ">>", ">>>"), "shift")

    def addsub(self):
        return self._binchain(self.muldiv, ("+", "-"), "arith")

    def muldiv(self):
        return self._binchain(self.unary, ("*", "/", "%"), "arith")

    def unary(self):
        k, v = self.peek()
        if k == "op" and v in ("!", "~", "+", "-"):
            self.take()
            return ("unary", v, self.unary())
        return self.primary()

    def primary(self):
        k, v = self.take()
        if v == "(":
            node = self.conditional()
            self.expect(")")
            return node
        if k == "hex":
            return ("num", float(int(v, 16)))
        if k == "octal":
            return ("num", float(int(v, 8)))
        if k == "decimal":
            return ("num", float(v))
        if k == "variable":
            if self.peek()[1] == "(":
                self.take()
                args = []
                if self.peek()[1] != ")":
                    args.append(self.conditional())
                    while self.peek()[1] == ",":
                        self.take()
                        args.append(self.conditional())
                self.expect(")")
                return ("call", v, args)
            return ("var", v)
        raise JavascriptParseError(f"unexpected token {v!r}")


class _Emitter:
    def __init__(self, bindings: dict | None) -> None:
        self.bindings = bindings

    # -- coercions (JavascriptCompiler: everything is a double; boolean
    # sub-results materialize as 1.0/0.0, conditions test != 0) --------
    def num(self, node) -> str:
        sql, is_bool = self.emit(node)
        if is_bool:
            return f"IF({sql}, 1.0D, 0.0D)"
        return sql

    def cond(self, node) -> str:
        sql, is_bool = self.emit(node)
        if is_bool:
            return sql
        return f"({sql} <> 0.0D)"

    def _long(self, node) -> str:
        # Java (long)double semantics under ANSI Spark: NaN -> 0,
        # out-of-range clamps to Long.MIN/MAX (JLS 5.1.3); try_cast
        # covers the exact range, the fallback the rest
        x = self.num(node)
        return (f"coalesce(try_cast({x} AS BIGINT), "
                f"IF(isnan({x}), 0L, "
                f"IF({x} > 0.0D, 9223372036854775807L, "
                f"-9223372036854775808L)))")

    def emit(self, node):
        kind = node[0]
        if kind == "num":
            return (f"{node[1]!r}D", False)
        if kind == "var":
            return (self._var(node[1]), False)
        if kind == "call":
            _, name, args = node
            if name not in FUNCTIONS:
                raise JavascriptParseError(f"unknown function {name!r}")
            arity, emitter = FUNCTIONS[name]
            if len(args) != arity:
                raise JavascriptParseError(
                    f"function {name!r} expects {arity} argument(s), "
                    f"got {len(args)}")
            return (emitter(*[self.num(a) for a in args]), False)
        if kind == "unary":
            _, op, sub = node
            if op == "!":
                return (f"(NOT {self.cond(sub)})", True)
            if op == "~":
                return (f"CAST(~{self._long(sub)} AS DOUBLE)", False)
            if op == "-":
                return (f"(- {self.num(sub)})", False)
            return (self.num(sub), False)                    # unary +
        if kind == "arith":
            _, op, a, b = node
            if op == "/":
                # Java IEEE-754 division under ANSI Spark: x/0 ->
                # signed Infinity, 0/0 -> NaN (x * Inf yields exactly
                # that); -0.0 divisors take the +0.0 branch (documented)
                av, bv = self.num(a), self.num(b)
                return (f"(CASE WHEN {bv} = 0.0D THEN "
                        f"{av} * double('Infinity') "
                        f"ELSE try_divide({av}, {bv}) END)", False)
            if op == "%":
                # Java fmod by zero -> NaN
                av, bv = self.num(a), self.num(b)
                return (f"(CASE WHEN {bv} = 0.0D THEN double('NaN') "
                        f"ELSE try_mod({av}, {bv}) END)", False)
            return (f"({self.num(a)} {op} {self.num(b)})", False)
        if kind == "shift":
            _, op, a, b = node
            fn = {"<<": "shiftleft", ">>": "shiftright",
                  ">>>": "shiftrightunsigned"}[op]
            # Java masks the shift count to 6 bits for longs
            cnt = f"CAST(({self._long(b)} & 63) AS INT)"
            return (f"CAST({fn}({self._long(a)}, {cnt}) AS DOUBLE)",
                    False)
        if kind == "bitwise":
            _, op, a, b = node
            return (f"CAST(({self._long(a)} {op} {self._long(b)}) "
                    f"AS DOUBLE)", False)
        if kind == "compare":
            _, op, a, b = node
            op = "=" if op == "==" else op
            return (f"({self.num(a)} {op} {self.num(b)})", True)
        if kind == "boollogic":
            _, op, a, b = node
            word = "AND" if op == "&&" else "OR"
            return (f"({self.cond(a)} {word} {self.cond(b)})", True)
        if kind == "ternary":
            _, c, t, o = node
            return (f"IF({self.cond(c)}, {self.num(t)}, {self.num(o)})",
                    False)
        raise AssertionError(kind)

    def _var(self, name: str) -> str:
        if self.bindings is not None:
            if name not in self.bindings:
                raise JavascriptParseError(f"unbound variable {name!r}")
            return f"({self.bindings[name]})"
        if not _IDENT_RE.match(name):
            raise JavascriptParseError(
                f"variable {name!r} needs an explicit binding "
                f"(dotted/indexed names have no default column)")
        return f"CAST(`{name}` AS DOUBLE)"


def compile_expression(source: str, bindings: dict | None = None) -> str:
    """Compile a Lucene expression to a Spark SQL snippet returning
    DOUBLE.

    ``bindings`` maps variable names to SQL snippets (SimpleBindings,
    expressions/SimpleBindings.java); ``None`` binds every plain
    identifier to the same-named column. Raises
    :class:`JavascriptParseError` on syntax errors, unknown functions,
    wrong arity, or unbound variables.
    """
    node = _Parser(_tokenize(source)).parse()
    sql = _Emitter(bindings).num(node)
    # several emitters inline an operand's SQL more than once (the
    # Java (long)-cast ladder 4x, / and % guards 2x), so deeply nested
    # chains of those operators grow the snippet geometrically; fail
    # loudly before Catalyst parses a multi-megabyte expression
    if len(sql) > 1_000_000:
        raise JavascriptParseError(
            f"compiled expression SQL is {len(sql):,} chars (deeply "
            "nested /, %, or bitwise operators multiply operand "
            "snippets); restructure the expression or precompute "
            "subexpressions as bound columns")
    return sql
