"""Vector math as explicit per-dimension column expressions.

Why explicit element_at chains instead of ``F.aggregate(F.zip_with(...))``:
both stay JVM-side, but the explicit form (a) produces the same
left-to-right double accumulation as the generated oracle SQL — exact
cross-engine reproducibility — and (b) avoids the lambda-function
interpreter path, keeping the whole expression inside whole-stage
codegen. The expression count is O(dim); fine for embedding dims in the
hundreds. For very high dims switch to ``zip_with``/``aggregate`` (also
provided) and accept approximate oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _el(col: str, i: int) -> Column:
    return F.element_at(col, i + 1).cast("double")


def dot_expr(a: str, b: str, dim: int) -> Column:
    """Σ aᵢ·bᵢ over two array columns, fixed dim."""
    return sum((_el(a, i) * _el(b, i) for i in range(dim)), F.lit(0.0))


def norm2_expr(a: str, dim: int) -> Column:
    """Σ aᵢ² (squared L2 norm)."""
    return sum((_el(a, i) * _el(a, i) for i in range(dim)), F.lit(0.0))


def cosine_expr(a: str, b: str, dim: int) -> Column:
    """Cosine similarity of two array columns."""
    return dot_expr(a, b, dim) / F.sqrt(norm2_expr(a, dim) * norm2_expr(b, dim))


def dot_agg(a: str, b: str) -> Column:
    """zip_with/aggregate dot product — dim-agnostic alternative."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v.cast("double"),
    )


# -- matching SQL generators (DuckDB oracle side) ---------------------------


def sql_dot(a: str, b: str, dim: int) -> str:
    return " + ".join(
        f"(CAST({a}[{i+1}] AS DOUBLE) * CAST({b}[{i+1}] AS DOUBLE))"
        for i in range(dim)
    )


def sql_norm2(a: str, dim: int) -> str:
    return sql_dot(a, a, dim)


def sql_cosine(a: str, b: str, dim: int) -> str:
    return (
        f"(({sql_dot(a, b, dim)}) / "
        f"SQRT(({sql_norm2(a, dim)}) * ({sql_norm2(b, dim)})))"
    )
