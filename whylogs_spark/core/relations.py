"""Predicate DSL -> Spark Column compiler.

Reference: the relations DSL (python/whylogs/core/relations.py:46-212 —
Predicate with ==/!=/</<=/>/>=, regex match/fullmatch/search, and/or/not)
and the serialized prefix form parsed by
python/whylogs/core/predicate_parser.py:30-148 (tokens like
``and > x 1.0 < x 2.0``, ``~ colname pattern``).

Everything compiles to a Spark ``Column`` so predicates execute JVM-side
(condition counts, validators, segment filters) with full Catalyst
pushdown.
"""

from __future__ import annotations

import shlex
from typing import Callable, List, Optional, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

Value = Union[str, int, float, bool]


class Predicate:
    """Fluent builder bound to a column (or an expression)."""

    def __init__(self, expr: Optional[Column] = None) -> None:
        self._expr = expr

    def _c(self) -> Column:
        if self._expr is None:
            raise ValueError("predicate not bound to a column; use Require")
        return self._expr

    # comparisons -----------------------------------------------------------
    def equals(self, v: Value) -> Column:
        return self._c() == F.lit(v)

    def not_equal(self, v: Value) -> Column:
        return self._c() != F.lit(v)

    def less_than(self, v: Value) -> Column:
        return self._c() < F.lit(v)

    def less_or_equals(self, v: Value) -> Column:
        return self._c() <= F.lit(v)

    def greater_than(self, v: Value) -> Column:
        return self._c() > F.lit(v)

    def greater_or_equals(self, v: Value) -> Column:
        return self._c() >= F.lit(v)

    def is_in(self, values: List[Value]) -> Column:
        return self._c().isin(values)

    def is_null(self) -> Column:
        return self._c().isNull()

    def non_null(self) -> Column:
        return self._c().isNotNull()

    # regex (reference relations.py:110-115) --------------------------------
    def matches(self, pattern: str) -> Column:
        """re.match semantics: anchored at start."""
        p = pattern if pattern.startswith("^") else "^" + pattern
        return self._c().cast("string").rlike(p)

    def fullmatch(self, pattern: str) -> Column:
        p = pattern
        if not p.startswith("^"):
            p = "^" + p
        if not p.endswith("$"):
            p = p + "$"
        return self._c().cast("string").rlike(p)

    def search(self, pattern: str) -> Column:
        """re.search semantics: anywhere in the string."""
        return self._c().cast("string").rlike(pattern)


def Require(column: Optional[str] = None,
            expr: Optional[Column] = None) -> Predicate:
    if expr is not None:
        return Predicate(expr)
    if column is not None:
        return Predicate(F.col(column))
    return Predicate()


def Not(c: Column) -> Column:
    return ~c


def And(a: Column, b: Column) -> Column:
    return a & b


def Or(a: Column, b: Column) -> Column:
    return a | b


# ---------------------------------------------------------------- prefix DSL
_BINOPS = {
    "==": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
    "<": lambda c, v: c < v,
    "<=": lambda c, v: c <= v,
    ">": lambda c, v: c > v,
    ">=": lambda c, v: c >= v,
}


def _parse_value(tok: str):
    try:
        return int(tok)
    except ValueError:
        pass
    try:
        return float(tok)
    except ValueError:
        pass
    if tok in ("True", "true"):
        return True
    if tok in ("False", "false"):
        return False
    return tok.strip('"')


class _PrefixParser:
    """Parses the reference's serialized prefix predicates
    (predicate_parser.py:30-148): operators first, operands after.

      and > price 100 < price 200
      or == status F ~ priority ^1.*
      not == flag N

    Column references are bare names; ``::`` references profile summary
    paths when used in constraints (handled by the caller via
    ``resolver``).
    """

    def __init__(self, tokens: List[str],
                 resolver: Optional[Callable[[str], Column]] = None):
        self.toks = tokens
        self.pos = 0
        self.resolver = resolver or (lambda name: F.col(name))

    def _next(self) -> str:
        if self.pos >= len(self.toks):
            raise ValueError("unexpected end of predicate expression")
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def parse(self) -> Column:
        out = self._expr()
        if self.pos != len(self.toks):
            raise ValueError(
                f"trailing tokens: {self.toks[self.pos:]}")
        return out

    def _expr(self) -> Column:
        op = self._next()
        if op in ("and", "or"):
            a = self._expr()
            b = self._expr()
            return (a & b) if op == "and" else (a | b)
        if op == "not":
            return ~self._expr()
        if op in _BINOPS:
            ref = self.resolver(self._next())
            val = _parse_value(self._next())
            return _BINOPS[op](ref, F.lit(val))
        if op == "~":  # search
            ref = self.resolver(self._next())
            return ref.cast("string").rlike(self._next())
        if op == "~=":  # fullmatch
            ref = self.resolver(self._next())
            pat = self._next()
            if not pat.startswith("^"):
                pat = "^" + pat
            if not pat.endswith("$"):
                pat = pat + "$"
            return ref.cast("string").rlike(pat)
        raise ValueError(f"unknown operator: {op}")


def parse_predicate(
    expression: str,
    resolver: Optional[Callable[[str], Column]] = None,
) -> Column:
    """Compile a serialized prefix predicate into a Spark Column."""
    return _PrefixParser(shlex.split(expression), resolver).parse()
