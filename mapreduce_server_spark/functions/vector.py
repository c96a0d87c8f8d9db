"""Vector math over array<float> embedding columns — JVM-side only.

Elements are cast float→double (exact) before multiplying so the
arithmetic is bit-identical to the DuckDB oracle's
``list_zip``/``list_sum`` form; see scalar_array for the proven pattern.

Round-13 optimization (guide §1.2 "per-task work"): Spark's
higher-order functions (``aggregate``/``zip_with``/``transform``) are
NOT whole-stage-codegen'd — every element evaluates an interpreted
lambda, and the noop-sink sweep showed the fold cost dominating the
similarity/ML-knn tier (knn_join_lsh 20 s, knn_recall 14 s,
ml_eval_confusion 9.5 s full recompute at sf0.1). ``dot``/``norm`` now
take a SIZE-GUARDED fast path: when both arrays have the fixture
dimensionality (64), an unrolled left-associated expression computes
the identical sequential double fold under codegen; any other length
(or NULL) falls back to the original fold. Bit-identity was verified
element-wise over 100k pairs (struct.pack comparison, probe in
OPTIMIZATION_r13.md): the unrolled sum performs the SAME double ops in
the SAME order, so no oracle can tell the difference. Measured 0.88 →
0.36 s per 100k dots (median of 3, noop sink).

Scale: a dot product is O(dim) per row with zero shuffle; the expensive
part of any similarity operator is the candidate-pair generation, which is
the operator's (not this module's) concern — brute force broadcasts one
query vector, knn-join bounds candidates per key, LSH buckets first.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: dimensionality of the committed embedding fixtures — the unrolled
#: codegen fast path is generated for exactly this length; every other
#: length takes the general fold (same values, interpreted speed).
FAST_DIM = 64


def fsum(arr: Column) -> Column:
    """Sequential left-to-right double fold (matches list_sum order)."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def _dot_fold(a: Column, b: Column) -> Column:
    return fsum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def _dot_unrolled(a: Column, b: Column, dim: int) -> Column:
    # starts from literal 0.0 exactly like the fold — NOT from the bare
    # first product: 0.0 + (-0.0) is +0.0, so an all-negative-zero
    # product chain must accumulate the same signed zeros as the fold
    acc = F.lit(0.0) + a.getItem(0).cast("double") * b.getItem(0).cast("double")
    for i in range(1, dim):
        acc = acc + a.getItem(i).cast("double") * b.getItem(i).cast("double")
    return acc


def dot(a: Column, b: Column) -> Column:
    """Dot product in double precision (left fold order; codegen fast
    path at FAST_DIM — bit-identical, see module docstring)."""
    return F.when(
        (F.size(a) == FAST_DIM) & (F.size(b) == FAST_DIM),
        _dot_unrolled(a, b, FAST_DIM),
    ).otherwise(_dot_fold(a, b))


def _norm_fold(a: Column) -> Column:
    return F.sqrt(fsum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def _norm_unrolled(a: Column, dim: int) -> Column:
    x0 = a.getItem(0).cast("double")
    acc = F.lit(0.0) + x0 * x0  # signed-zero parity with the fold
    for i in range(1, dim):
        xi = a.getItem(i).cast("double")
        acc = acc + xi * xi
    return F.sqrt(acc)


def norm(a: Column) -> Column:
    """L2 norm in double precision (same fast-path discipline as dot)."""
    return F.when(F.size(a) == FAST_DIM, _norm_unrolled(a, FAST_DIM)).otherwise(
        _norm_fold(a)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity in double precision."""
    return dot(a, b) / (norm(a) * norm(b))


#: DuckDB oracle fragment mirroring :func:`dot` exactly (same fold order).
DUCK_DOT = (
    "list_sum(list_transform(list_zip({a}, {b}), p -> p[1]::DOUBLE * p[2]::DOUBLE))"
)
#: DuckDB oracle fragment mirroring :func:`norm`.
DUCK_NORM = "sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"
