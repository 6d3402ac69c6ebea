"""Attr VALUE expressions for the YAML custommap — the
``planetiler-custommap`` ``ConfigExpressionParser.java:69-157`` /
``ConfigExpressionScript.java`` analog, compiled to vectorized Arrow
compute over whole batches instead of per-feature CEL evaluation.

Supported YAML forms (each compiles to ``fn(pa.Table) -> pa.Array``):

- scalar constants (``5``, ``"foo"``)
- ``{tag_value: key}``       — read a (string) tag column
- ``{value: expr}``          — passthrough
- ``{coalesce: [e1, e2, …]}``— first non-null
- ``{type: t, …}``           — cast the inner expression to ``t`` ∈
  {string, integer, long, double, boolean} (``TypeConversion.java``
  subset: numeric casts via Arrow; boolean from string accepts
  true/yes/1)
- ``{match: [{if: <bool tree>, value: e}, …, {else: e}]}`` and the
  ``{default_value: e, overrides: [...]}`` form — conditions are the
  engine's boolean trees (``config.compile_expression``)
- ``"${ … }"`` script — arithmetic/string/comparison expression over
  tag columns by name (CEL's ``&&``/``||`` accepted), compiled through
  the Python AST to pyarrow.compute: ``+ - * / %`` (``+`` on strings
  concatenates), comparisons, and the functions ``num`` (string→
  double), ``str`` (→string), ``upper lower len abs round coalesce
  min2 max2 concat``.

  CEL-parity extensions (``PlanetilerStdLib.java:40-80`` + CEL
  builtins):

  * ``matches(s, "re")`` — unanchored regex match →
    ``pc.match_substring_regex`` (CEL ``string.matches``)
  * ``replaceRegex(s, "re", "repl")`` — replace ALL matches →
    ``pc.replace_substring_regex`` (``PlanetilerStdLib.java:68-80``;
    Java ``$1`` backrefs are translated to RE2 ``\\1``)
  * ``extractRegex(s, "re")`` — first match (or first named group) →
    ``pc.extract_regex``; null where no match
  * ``nullif(a, b)`` — null where ``a == b``, else ``a``
    (``PlanetilerStdLib.java:62-67``)
  * conditional expressions ``a if cond else b`` → ``pc.if_else``
    (the Python-AST spelling of CEL's ``cond ? a : b``)
"""

from __future__ import annotations

import ast
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SCRIPT_RE = re.compile(r"^\s*\$\{(.*)\}\s*$", re.DOTALL)


def is_script(obj) -> bool:
    return isinstance(obj, str) and _SCRIPT_RE.match(obj) is not None


def _cel_bool_ops(src: str) -> str:
    """Rewrite CEL's ``&&``/``||`` to python ``and``/``or`` OUTSIDE
    string literals — a blanket re.sub would corrupt regex patterns and
    string constants containing the operators ("Main && Co")."""
    out = []
    i, n = 0, len(src)
    q = None
    while i < n:
        c = src[i]
        if q is not None:
            out.append(c)
            if c == "\\" and i + 1 < n:
                out.append(src[i + 1])
                i += 2
                continue
            if c == q:
                q = None
            i += 1
            continue
        if c in "\"'":
            q = c
            out.append(c)
            i += 1
            continue
        if src.startswith("&&", i):
            out.append(" and ")
            i += 2
            continue
        if src.startswith("||", i):
            out.append(" or ")
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def script_tag_keys(obj) -> set:
    """Tag keys (bare identifiers) referenced inside a ``${...}``
    script — the single source of truth for which names are FUNCTIONS
    vs tag columns (``_ScriptCompiler._FUNCS``), so callers promoting
    script-referenced tags (``config.osm_rules_from_yaml``) can never
    drift from the compiler's function set."""
    import ast as _ast

    m = _SCRIPT_RE.match(obj) if isinstance(obj, str) else None
    if m is None:
        return set()
    src = _cel_bool_ops(m.group(1))
    try:
        tree = _ast.parse(src.strip(), mode="eval")
    except SyntaxError:
        return set()
    return {sub.id for sub in _ast.walk(tree)
            if isinstance(sub, _ast.Name)
            and sub.id not in _ScriptCompiler._FUNCS}


def unescape(obj):
    """``\\${…}`` is a literal string, not a script
    (``ConfigExpressionScript.unescape``)."""
    if isinstance(obj, str) and obj.startswith("\\${"):
        return obj[1:]
    return obj


def _to_f64(arr: pa.Array) -> pa.Array:
    """To float64 with the reference's ``TypeConversion`` semantics:
    an unparseable string value becomes NULL instead of raising (one
    ``height="unknown"`` tag must not kill the whole Ray task)."""
    try:
        return pc.cast(arr, pa.float64(), safe=False)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        import pandas as pd

        return pa.array(pd.to_numeric(arr.to_pandas(), errors="coerce"),
                        type=pa.float64(), from_pandas=True)


def _cast(arr: pa.Array, dtype: str) -> pa.Array:
    if dtype == "string":
        return pc.cast(arr, pa.string())
    if dtype in ("integer", "long"):
        t = pa.int32() if dtype == "integer" else pa.int64()
        if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
            # numeric strings may carry decimals: go through double
            arr = pc.trunc(_to_f64(arr))
        return pc.cast(arr, t, safe=False)
    if dtype == "double":
        if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
            return _to_f64(arr)
        return pc.cast(arr, pa.float64())
    if dtype == "boolean":
        if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
            low = pc.utf8_lower(arr)
            return pc.is_in(low, value_set=pa.array(["true", "yes", "1"]))
        return pc.cast(arr, pa.bool_())
    raise ValueError(f"unknown datatype {dtype!r} (supported: string, "
                     "integer, long, double, boolean)")


def _const(value, n: int) -> pa.Array:
    return pa.array([value] * n)


def _is_str_arr(a) -> bool:
    return pa.types.is_string(a.type) or pa.types.is_large_string(a.type)


class _ScriptCompiler(ast.NodeVisitor):
    """Compile the ``${…}`` subset to a closure over a pa.Table."""

    _FUNCS = {"num", "str", "upper", "lower", "len", "abs", "round",
              "coalesce", "min2", "max2", "concat",
              "matches", "replaceRegex", "extractRegex", "nullif"}

    # (min_args, max_args) per function — under/over-supplied calls must
    # fail HERE with the function named, not per batch inside a Ray task
    _ARITY = {"num": (1, 1), "str": (1, 1), "upper": (1, 1),
              "lower": (1, 1), "len": (1, 1), "abs": (1, 1),
              "round": (1, 2), "coalesce": (1, None), "min2": (2, 2),
              "max2": (2, 2), "concat": (1, None), "matches": (2, 2),
              "replaceRegex": (3, 3), "extractRegex": (2, 2),
              "nullif": (2, 2)}

    def compile(self, src: str):
        # accept CEL boolean operators (outside string literals)
        src = _cel_bool_ops(src)
        tree = ast.parse(src.strip(), mode="eval")
        for node in ast.walk(tree):
            ok = isinstance(node, (
                ast.Expression, ast.BinOp, ast.BoolOp, ast.Compare,
                ast.UnaryOp, ast.Call, ast.Name, ast.Constant, ast.Load,
                ast.Add, ast.Sub, ast.Mult, ast.Div, ast.Mod, ast.USub,
                ast.Not, ast.And, ast.Or, ast.Eq, ast.NotEq, ast.Lt,
                ast.LtE, ast.Gt, ast.GtE, ast.IfExp))
            if not ok:
                raise ValueError(
                    f"unsupported script syntax: {ast.dump(node)[:60]}")
            if isinstance(node, ast.Compare) and len(node.ops) != 1:
                raise ValueError(
                    "chained comparisons are not supported — write "
                    "(a < b) && (b < c)")
            if isinstance(node, ast.Call):
                if not (isinstance(node.func, ast.Name)
                        and node.func.id in self._FUNCS):
                    raise ValueError("unsupported function in script")
                lo, hi = self._ARITY[node.func.id]
                if len(node.args) < lo or (hi is not None
                                           and len(node.args) > hi):
                    raise ValueError(
                        f"{node.func.id}() takes "
                        f"{lo if hi == lo else f'{lo}..{hi or chr(8734)}'}"
                        f" arguments, got {len(node.args)}")
                # args read as literals at eval time must BE literals —
                # fail here with the function named, not per-batch
                # inside a Ray task with an opaque AttributeError
                fn = node.func.id
                lit_args = {"matches": [1], "extractRegex": [1],
                            "replaceRegex": [1, 2], "round": [1]}
                for i in lit_args.get(fn, []):
                    if i < len(node.args) and not isinstance(
                            node.args[i], ast.Constant):
                        raise ValueError(
                            f"{fn}() argument {i + 1} must be a literal "
                            f"constant, got {ast.dump(node.args[i])[:40]}")
        expr = tree.body

        def run(tbl: pa.Table) -> pa.Array:
            return _eval_node(expr, tbl)

        return run


def _eval_node(node, tbl: pa.Table):
    n = tbl.num_rows
    if isinstance(node, ast.Constant):
        return _const(node.value, n)
    if isinstance(node, ast.Name):
        if node.id not in tbl.schema.names:
            return _const(None, n)
        return tbl[node.id].combine_chunks()
    if isinstance(node, ast.UnaryOp):
        v = _eval_node(node.operand, tbl)
        if isinstance(node.op, ast.USub):
            return pc.negate(pc.cast(v, pa.float64()))
        return pc.invert(pc.cast(v, pa.bool_()))
    if isinstance(node, ast.BoolOp):
        vals = [pc.cast(_eval_node(v, tbl), pa.bool_())
                for v in node.values]
        out = vals[0]
        for v in vals[1:]:
            out = (pc.and_kleene(out, v) if isinstance(node.op, ast.And)
                   else pc.or_kleene(out, v))
        return out
    if isinstance(node, ast.Compare):
        left = _eval_node(node.left, tbl)
        right = _eval_node(node.comparators[0], tbl)
        left, right = _numeric_align(left, right)
        op = {ast.Eq: pc.equal, ast.NotEq: pc.not_equal, ast.Lt: pc.less,
              ast.LtE: pc.less_equal, ast.Gt: pc.greater,
              ast.GtE: pc.greater_equal}[type(node.ops[0])]
        return op(left, right)
    if isinstance(node, ast.BinOp):
        left = _eval_node(node.left, tbl)
        right = _eval_node(node.right, tbl)
        if isinstance(node.op, ast.Add) and (_is_str_arr(left)
                                             or _is_str_arr(right)):
            return pc.binary_join_element_wise(
                pc.cast(left, pa.string()), pc.cast(right, pa.string()), "")
        left, right = _numeric_align(left, right)
        # % is TRUNCATED modulo (CEL / Java): -7 % 3 == -1, not floor's 2
        op = {ast.Add: pc.add, ast.Sub: pc.subtract,
              ast.Mult: pc.multiply, ast.Div: pc.divide,
              ast.Mod: lambda a, b: pc.subtract(
                  a, pc.multiply(pc.trunc(pc.divide(a, b)), b))}[
                      type(node.op)]
        return op(left, right)
    if isinstance(node, ast.Call):
        name = node.func.id
        # regex/round literal args are read from the AST below, not
        # evaluated — don't broadcast a [pattern] * n array per batch
        n_eval = {"matches": 1, "replaceRegex": 1,
                  "extractRegex": 1, "round": 1}.get(name, len(node.args))
        args = [_eval_node(a, tbl) for a in node.args[:n_eval]]
        if name == "num":
            return _to_f64(args[0])
        if name == "str":
            return pc.cast(args[0], pa.string())
        if name == "upper":
            return pc.utf8_upper(args[0])
        if name == "lower":
            return pc.utf8_lower(args[0])
        if name == "len":
            return pc.utf8_length(args[0])
        if name == "abs":
            return pc.abs(args[0])
        if name == "round":
            return pc.round(args[0], int(node.args[1].value)
                            if len(node.args) > 1 else 0)
        if name == "coalesce":
            out = args[0]
            for a in args[1:]:
                out = pc.coalesce(out, a)
            return out
        if name == "min2":
            return pc.min_element_wise(*_numeric_align(*args))
        if name == "max2":
            return pc.max_element_wise(*_numeric_align(*args))
        if name == "concat":
            return pc.binary_join_element_wise(
                *[pc.cast(a, pa.string()) for a in args], "")
        if name == "matches":
            return pc.match_substring_regex(
                pc.cast(args[0], pa.string()),
                pattern=str(node.args[1].value))
        if name == "replaceRegex":
            # Java replaceAll $N backrefs → RE2 \N
            repl = re.sub(r"\$(\d)", r"\\\1", str(node.args[2].value))
            return pc.replace_substring_regex(
                pc.cast(args[0], pa.string()),
                pattern=str(node.args[1].value), replacement=repl)
        if name == "extractRegex":
            pat = str(node.args[1].value)
            if "(?P<" not in pat:
                pat = f"(?P<x>{pat})"      # full match when no named group
            struct = pc.extract_regex(pc.cast(args[0], pa.string()),
                                      pattern=pat)
            return pc.struct_field(struct, [0])
        if name == "nullif":
            a, b = args[0], args[1]
            if _is_str_arr(a) or _is_str_arr(b):
                eq = pc.equal(pc.cast(a, pa.string()),
                              pc.cast(b, pa.string()))
            else:
                eq = pc.equal(*_numeric_align(a, b))
            return pc.if_else(pc.fill_null(eq, False),
                              pa.nulls(len(a), a.type), a)
    if isinstance(node, ast.IfExp):
        cond = pc.cast(_eval_node(node.test, tbl), pa.bool_())
        a = _eval_node(node.body, tbl)
        b = _eval_node(node.orelse, tbl)
        if _is_str_arr(a) or _is_str_arr(b):
            a = pc.cast(a, pa.string())
            b = pc.cast(b, pa.string())
        else:
            a, b = _numeric_align(a, b)
        return pc.if_else(pc.fill_null(cond, False), a, b)
    raise ValueError(f"unsupported node {node!r}")


def _numeric_align(left, right):
    """Promote both sides to float64 when either is numeric-typed or a
    numeric-looking string column meets a number."""
    if _is_str_arr(left) and _is_str_arr(right):
        return left, right
    if not pa.types.is_float64(left.type):
        left = _to_f64(left)
    if not pa.types.is_float64(right.type):
        right = _to_f64(right)
    return left, right


def compile_value_expression(node):
    """YAML value-expression → ``fn(pa.Table) -> pa.Array``
    (``ConfigExpressionParser.parse`` form dispatch)."""
    if node is None:
        return lambda t: _const(None, t.num_rows)
    if is_script(node):
        return _ScriptCompiler().compile(_SCRIPT_RE.match(node).group(1))
    if isinstance(node, dict):
        keys = set(node)
        if "type" in keys:
            rest = {k: v for k, v in node.items() if k != "type"}
            inner = compile_value_expression(rest if rest else None)
            dtype = node["type"]
            return lambda t: _cast(inner(t), dtype)
        if keys == {"coalesce"}:
            parts = [compile_value_expression(n) for n in node["coalesce"]]

            def run_coalesce(t):
                out = pc.cast(parts[0](t), pa.string())
                for p in parts[1:]:
                    out = pc.coalesce(out, pc.cast(p(t), pa.string()))
                return out
            return run_coalesce
        if keys == {"tag_value"}:
            key = node["tag_value"]
            return lambda t: (t[key].combine_chunks()
                              if key in t.schema.names
                              else _const(None, t.num_rows))
        if keys == {"value"}:
            return compile_value_expression(node["value"])
        if keys == {"match"} or keys == {"default_value", "overrides"}:
            from ..config import compile_expression
            cases = []
            fallback = compile_value_expression(
                node.get("default_value"))
            items = node.get("match", node.get("overrides", []))
            for item in items:
                ik = set(item)
                if ik == {"if", "value"}:
                    cases.append((compile_expression(item["if"]),
                                  compile_value_expression(item["value"])))
                elif ik == {"else"} and "match" in keys:
                    fallback = compile_value_expression(item["else"])
                else:
                    raise ValueError(f"invalid match case: {item!r}")

            def run_match(t):
                out = pc.cast(fallback(t), pa.string())
                # first matching case wins: apply in reverse
                for cond, val in reversed(cases):
                    out = pc.if_else(cond(t),
                                     pc.cast(val(t), pa.string()), out)
                return out
            return run_match
        raise ValueError(f"unknown value-expression form: {node!r}")
    node = unescape(node)
    return lambda t: _const(node, t.num_rows)
