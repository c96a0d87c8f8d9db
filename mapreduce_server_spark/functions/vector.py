"""Vector math over array<float> embedding columns — JVM-side only.

All folds run as Spark higher-order functions (whole-stage codegen'd,
no Python in the hot path). Elements are cast float→double (exact) before
multiplying so the arithmetic is bit-identical to the DuckDB oracle's
``list_zip``/``list_sum`` form; see scalar_array for the proven pattern.

Scale: a dot product is O(dim) per row with zero shuffle; the expensive
part of any similarity operator is the candidate-pair generation, which is
the operator's (not this module's) concern — brute force broadcasts one
query vector, knn-join bounds candidates per key, LSH buckets first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fsum(arr: Column) -> Column:
    """Sequential left-to-right double fold (matches list_sum order)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    """Dot product in double precision."""
    return fsum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def norm(a: Column) -> Column:
    """L2 norm in double precision."""
    return F.sqrt(fsum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision."""
    return dot(a, b) / (norm(a) * norm(b))


#: DuckDB oracle fragment mirroring :func:`dot` exactly (same fold order).
DUCK_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), p -> p[1]::DOUBLE * p[2]::DOUBLE))"
)
#: DuckDB oracle fragment mirroring :func:`norm`.
DUCK_NORM = "sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"
