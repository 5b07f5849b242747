"""Vector math over ``array<float>`` embedding columns.

Built-in higher-order functions (``zip_with`` + ``aggregate``) keep the
arithmetic JVM-side. For very high dimensions a vectorized Pandas UDF can
win on SIMD — see operators/similarity.py for that variant — but the
built-in path has no serialization cost and scales with codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: str | Column, b: str | Column) -> Column:
    """Σ aᵢ·bᵢ as double."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: str | Column) -> Column:
    """‖a‖₂ as double."""
    return F.sqrt(
        F.aggregate(
            _c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: str | Column, b: str | Column) -> Column:
    """cos(a, b); NULL-safe only insofar as inputs are non-null arrays.
    Zero vectors yield NULL (division by zero → NULL in non-ANSI mode)."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))
