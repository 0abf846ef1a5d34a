"""Vector scalar layer: cosine/dot/norm over ``array<float>`` columns as pure
built-in higher-order functions — JVM-side, no UDF, deterministic left-fold
summation order (bit-reproducible against the DuckDB oracle's
``list_inner_product`` over double-cast lists)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))
