"""Vector (embedding) column expressions.

All arithmetic is done JVM-side with higher-order functions over
``array<float>`` columns, folding left-to-right in float64 — the same
order and precision the DuckDB oracle uses (``list_transform`` +
left-fold sum) — so dot products agree to the last bit before any
rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_col(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in float64 via a sequential left fold (F.aggregate)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm2_col(a) * norm2_col(b))


def dot_sql(a: str, b: str) -> str:
    """DuckDB expression mirroring :func:`dot_col` (left fold over the
    zipped products, float64)."""
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(list_zip({a}, {b}), p -> p[1]::DOUBLE * p[2]::DOUBLE)), "
        f"(acc, x) -> acc + x)"
    )


def norm2_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm2_sql(a)} * {norm2_sql(b)}))"
