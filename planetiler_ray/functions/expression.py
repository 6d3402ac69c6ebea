"""Boolean tag-expression trees compiled to vectorized Arrow masks.

The analog of the reference's expression system
(``expression/Expression.java:49-146``: and/or/not/matchAny with
``%``-wildcards/matchField) — here each node compiles to a function
``Table → BooleanArray`` built from ``pyarrow.compute`` kernels, so a
whole expression evaluates vectorized per batch (the reference's keyed
``MultiExpression.Index`` becomes: precompute each leaf mask once per
batch, combine with boolean kernels).

Usage:

    expr = and_(match_any("p_type", ["%BRASS%", "PROMO%"]),
                not_(match_any("p_brand", ["Brand#45"])))
    ds.map_batches(lambda t: t.filter(expr(t)), batch_format="pyarrow")
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc

Expr = Callable[[pa.Table], pa.ChunkedArray]


def match_any(field: str, values: list[str]) -> Expr:
    """True where ``field`` matches any value; ``%`` wildcards at either
    end supported (``Expression.matchAny`` semantics)."""
    exact, contains, starts, ends = [], [], [], []
    for v in values:
        if v.startswith("%") and v.endswith("%") and len(v) > 1:
            contains.append(v[1:-1])
        elif v.endswith("%"):
            starts.append(v[:-1])
        elif v.startswith("%"):
            ends.append(v[1:])
        else:
            exact.append(v)

    def fn(t: pa.Table):
        col = t[field]
        mask = None
        if exact:
            mask = pc.is_in(col, value_set=pa.array(exact, col.type))
        for sub in contains:
            m = pc.match_substring(col, sub)
            mask = m if mask is None else pc.or_(mask, m)
        for sub in starts:
            m = pc.starts_with(col, sub)
            mask = m if mask is None else pc.or_(mask, m)
        for sub in ends:
            m = pc.ends_with(col, sub)
            mask = m if mask is None else pc.or_(mask, m)
        if mask is None:
            # typed bool, not null-type: a 0-row batch's untyped empty
            # array crashes fill_null/and_/invert downstream
            mask = pa.chunked_array([pa.array([False] * t.num_rows,
                                              pa.bool_())])
        return pc.fill_null(mask, False)

    return fn


def match_field(field: str) -> Expr:
    """True where ``field`` is present (non-null, non-empty string)."""
    def fn(t: pa.Table):
        col = t[field]
        m = pc.is_valid(col)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type):
            m = pc.and_(m, pc.invert(pc.equal(col, "")))
        return pc.fill_null(m, False)
    return fn


def cmp(field: str, op: str, value) -> Expr:
    """Numeric/string comparison leaf: op ∈ {==,!=,<,<=,>,>=}."""
    kernels = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
               "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}
    k = kernels[op]

    def fn(t: pa.Table):
        return pc.fill_null(k(t[field], value), False)
    return fn


def and_(*exprs: Expr) -> Expr:
    def fn(t: pa.Table):
        m = exprs[0](t)
        for e in exprs[1:]:
            m = pc.and_(m, e(t))
        return m
    return fn


def or_(*exprs: Expr) -> Expr:
    def fn(t: pa.Table):
        m = exprs[0](t)
        for e in exprs[1:]:
            m = pc.or_(m, e(t))
        return m
    return fn


def not_(expr: Expr) -> Expr:
    def fn(t: pa.Table):
        return pc.invert(expr(t))
    return fn


TRUE: Expr = lambda t: pa.chunked_array(
    [pa.array([True] * t.num_rows, pa.bool_())])
FALSE: Expr = lambda t: pa.chunked_array(
    [pa.array([False] * t.num_rows, pa.bool_())])
