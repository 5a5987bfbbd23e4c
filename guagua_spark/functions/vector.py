"""Vector math over array columns, bit-reproducible against the SQL oracle.

Implementation note — higher-order functions, not unrolled element_at
chains: an unrolled dot product is O(dim) expression nodes, and at
dim=64 a cosine (three such sums) costs ~1.7 s of driver-side Catalyst
planning + codegen PER QUERY (measured) — the executors then finish the
actual work in tens of milliseconds. ``aggregate(zip_with(...))`` is a
constant-size plan; the per-element lambda takes Spark's interpreted
path, which at millions of rows × dim in the hundreds is still far
cheaper than the planning it avoids, and it never risks blowing the
64 KB codegen method limit at higher dims.

Exactness: the fold is the same left-to-right double accumulation
(((0 + a₀·b₀) + a₁·b₁) + …) as the generated oracle SQL, with each
FLOAT element cast to double BEFORE the multiply — results match DuckDB
bit-for-bit (asserted by the oracle hash checks).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _prod_sum(pairs: Column) -> Column:
    """Left-to-right Σ over an array of doubles, seeded at 0.0."""
    return F.aggregate(pairs, F.lit(0.0), lambda acc, v: acc + v)


def dot_expr(a: str, b: str, dim: int = 0) -> Column:
    """Σ aᵢ·bᵢ over two array columns (``dim`` kept for API compat)."""
    return _prod_sum(
        F.zip_with(
            F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")
        )
    )


def norm2_expr(a: str, dim: int = 0) -> Column:
    """Σ aᵢ² (squared L2 norm)."""
    return dot_expr(a, a, dim)


def cosine_expr(a: str, b: str, dim: int = 0) -> Column:
    """Cosine similarity of two array columns.

    ``try_divide``, not ``/``: under Spark 4's default ANSI mode a
    zero-norm vector would otherwise throw DIVIDE_BY_ZERO and kill the
    whole job (found by tests/test_packing_properties.py — a real
    corpus can contain zero embeddings even though the fixture
    doesn't). NULL cosine means every ``>= τ`` comparison is false and
    desc ordering ranks it last — and it is exactly what the DuckDB
    oracle produces for double x/0, so the engines agree on the
    degenerate rows too."""
    return F.try_divide(
        dot_expr(a, b, dim), F.sqrt(norm2_expr(a, dim) * norm2_expr(b, dim))
    )


# -- matching SQL generators (DuckDB oracle side) ---------------------------
# Unrolled SQL is fine for the oracle: DuckDB binds it in milliseconds,
# and the explicit left-to-right + matches the fold above exactly.


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
