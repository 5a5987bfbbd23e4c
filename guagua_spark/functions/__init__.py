"""Reusable column-expression builders (vector math, hashing) — the
engine's scalar-function surface. All are built-in-function compositions
(JVM-side, codegen) — no Python UDFs."""

from guagua_spark.functions.vector import (
    cosine_expr,
    dot_expr,
    norm2_expr,
    sql_cosine,
    sql_dot,
)

__all__ = ["cosine_expr", "dot_expr", "norm2_expr", "sql_cosine", "sql_dot"]
