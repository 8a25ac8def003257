"""Expression-based scoring — the Expressions module role (reference
``src/Lucene.Net.Expressions/JS/JavascriptCompiler.cs:63``): compile a
small arithmetic expression over score + stored fields into the query
plan, e.g. ``"score * ln(1 + stars) + 0.1 * sqrt(n_chars)"``.

The reference compiles a Javascript subset to IL; here the same
surface compiles to Catalyst Column expressions (whole-stage codegen —
JVM-side, no UDF), via Python's ``ast`` for parsing only. Supported:
``+ - * /``, unary minus, numeric literals, bare identifiers (field
references; ``score`` = the relevance score), and the functions
``ln log10 sqrt abs min max pow``. Everything evaluates in DOUBLE with
the expression's own tree shape, so Spark and the DuckDB oracle
produce identical IEEE bits (same ops, same order).

``expression_sql`` renders the identical expression as DuckDB SQL —
one source string drives both engines.
"""

from __future__ import annotations

import ast

from pyspark.sql import Column
from pyspark.sql import functions as F

_FUNCS = {
    "ln": (1, lambda a: F.log(a[0])),
    "log10": (1, lambda a: F.log10(a[0])),
    "sqrt": (1, lambda a: F.sqrt(a[0])),
    "abs": (1, lambda a: F.abs(a[0])),
    "min": (2, lambda a: F.least(a[0], a[1])),
    "max": (2, lambda a: F.greatest(a[0], a[1])),
    "pow": (2, lambda a: F.pow(a[0], a[1])),
}

_SQL_FUNCS = {
    "ln": "ln", "log10": "log10", "sqrt": "sqrt", "abs": "abs",
    "min": "least", "max": "greatest", "pow": "pow",
}

_OPS = {ast.Add: "+", ast.Sub: "-", ast.Mult: "*", ast.Div: "/"}


def _parse(expr: str) -> ast.expression:
    tree = ast.parse(expr, mode="eval")
    for node in ast.walk(tree):
        if isinstance(node, (ast.Expression, ast.Constant, ast.Name, ast.Load)):
            if isinstance(node, ast.Constant) and not isinstance(node.value, (int, float)):
                raise ValueError(f"non-numeric literal: {node.value!r}")
            continue
        if isinstance(node, ast.BinOp) and type(node.op) in _OPS:
            continue
        if isinstance(node, (ast.UnaryOp, ast.USub)) or (
            isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub)
        ):
            continue
        if isinstance(node, (ast.Add, ast.Sub, ast.Mult, ast.Div, ast.USub)):
            continue
        if isinstance(node, ast.Call):
            if not (isinstance(node.func, ast.Name) and node.func.id in _FUNCS):
                raise ValueError(f"unknown function in expression: {ast.dump(node)}")
            continue
        raise ValueError(f"unsupported syntax: {type(node).__name__}")
    return tree.body


def compile_expression(expr: str, fields: dict[str, Column]) -> Column:
    """Compile to a Catalyst Column. ``fields`` maps identifiers to
    Columns (callers pass ``score`` plus docs-table columns); every
    reference is cast to double before use."""

    def go(node) -> Column:
        if isinstance(node, ast.Constant):
            return F.lit(float(node.value))
        if isinstance(node, ast.Name):
            if node.id not in fields:
                raise ValueError(f"unknown identifier {node.id!r}")
            return fields[node.id].cast("double")
        if isinstance(node, ast.UnaryOp):
            return -go(node.operand)
        if isinstance(node, ast.BinOp):
            a, b = go(node.left), go(node.right)
            op = _OPS[type(node.op)]
            return {"+": a + b, "-": a - b, "*": a * b, "/": a / b}[op]
        if isinstance(node, ast.Call):
            arity, fn = _FUNCS[node.func.id]
            if len(node.args) != arity:
                raise ValueError(f"{node.func.id} takes {arity} args")
            return fn([go(a) for a in node.args])
        raise AssertionError(node)

    return go(_parse(expr))


def expression_sql(expr: str, fields: dict[str, str]) -> str:
    """Render the SAME expression as a DuckDB scalar SQL expression;
    ``fields`` maps identifiers to SQL expressions (pre-cast by the
    caller if needed)."""

    def go(node) -> str:
        if isinstance(node, ast.Constant):
            return repr(float(node.value))
        if isinstance(node, ast.Name):
            if node.id not in fields:
                raise ValueError(f"unknown identifier {node.id!r}")
            return f"CAST({fields[node.id]} AS DOUBLE)"
        if isinstance(node, ast.UnaryOp):
            return f"(- {go(node.operand)})"
        if isinstance(node, ast.BinOp):
            return f"({go(node.left)} {_OPS[type(node.op)]} {go(node.right)})"
        if isinstance(node, ast.Call):
            args = ", ".join(go(a) for a in node.args)
            return f"{_SQL_FUNCS[node.func.id]}({args})"
        raise AssertionError(node)

    return go(_parse(expr))
