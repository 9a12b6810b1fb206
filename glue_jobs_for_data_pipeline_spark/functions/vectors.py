"""Vector kernels over array<float> embedding columns.

Built-in higher-order functions only (zip_with / aggregate / transform):
the arithmetic runs JVM-side, left-to-right, in double precision — which
makes results bit-identical to a sequential SQL evaluation (the DuckDB
oracle) and avoids Python/Arrow transfer entirely. For very wide vectors
a Pandas-UDF/BLAS path can win on constants; these kernels are the
portable, shuffle-free baseline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(c: Column) -> Column:
    return c.cast("double")


def dot(a: Column, b: Column) -> Column:
    """Sequential double dot product (deterministic fold, not a parallel sum)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + _d(v) * _d(v))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
