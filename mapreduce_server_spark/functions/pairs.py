"""Basket-local pair generation with mega-basket skew handling.

The co-occurrence family (cooccur_parts / rec_item_cosine /
rec_lift_pairs / rec_covisit_topk) and the LSH candidate join
(knn_join_lsh) all explode per-group pair sets out of a sorted distinct
array: undirected (a before b in array order) or directed (every
ordered pair x ≠ y). Generating pairs inside the group's own row keeps
the |group|² blowup task-local — which is exactly the round-13 design
AND its documented 100 TB hazard: ONE mega-group (a crawler order, a
hot LSH cell) generates |group|² structs in ONE task while the rest of
the cluster idles (guide §2.5 — AQE's skew handling only splits JOIN
partitions, never a single aggregated row).

Round-14 (VERDICT r13 #4) implements the documented mitigation: groups
larger than ``SPARK_GRAFT_BASKET_CAP`` (default 1024) are split into
⌈n/cap⌉ chunk rows that are hash-redistributed on (group key, chunk)
BEFORE generation, so no task generates more than cap·n pairs of one
group. The recombination is exact by construction:

- undirected: pairs are {(arr[i], arr[j]) : i < j}; chunk k owns the
  outer indices i ∈ [k·cap, (k+1)·cap) — a partition of the i-range —
  and pairs each with the identical global suffix j > i.
- directed: elements are distinct (collect_set input), so pairs are
  {(x, y) : x ≠ y}; chunk k owns x ∈ chunk and pairs it with the
  identical global ``filter(arr, y ≠ x)``.

Every operator keeps its declared result bit-identical: the split
changes WHERE pairs are generated, never WHICH pairs exist (pinned by
tests/test_r14_optimizations.py on a planted giant basket).

The small path (size ≤ cap — every row of every committed fixture's
lineitem baskets) is the unchanged round-13 expression: no extra
exchange, no plan change. The big-branch exchange exists in the plan
but moves zero rows until a mega-group actually appears.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cap() -> int:
    return int(os.environ.get("SPARK_GRAFT_BASKET_CAP", "1024"))


def pair_expr(
    arr: Column, *, directed: bool, a_name: str, b_name: str
) -> Column:
    """All basket-local pairs of a sorted distinct array as an array of
    structs — undirected ((a, b) with a earlier in array order,
    ascending-slice form) or directed (every ordered pair x ≠ y)."""
    if directed:
        return F.flatten(
            F.transform(
                arr,
                lambda x: F.transform(
                    F.filter(arr, lambda y: y != x),
                    lambda y: F.struct(x.alias(a_name), y.alias(b_name)),
                ),
            )
        )
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.greatest(F.size(arr) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias(a_name), y.alias(b_name)),
            ),
        )
    )


def _chunk_pair_expr(
    arr: Column, k: Column, cap: int, *, directed: bool, a_name: str, b_name: str
) -> Column:
    """Pairs whose OUTER element lies in chunk k (outer positions
    k·cap … k·cap+cap−1, 0-based) of the full array — the exact slice of
    :func:`pair_expr`'s output that chunk k owns."""
    outer = F.slice(arr, k * cap + F.lit(1), F.lit(cap))
    if directed:
        return F.flatten(
            F.transform(
                outer,
                lambda x: F.transform(
                    F.filter(arr, lambda y: y != x),
                    lambda y: F.struct(x.alias(a_name), y.alias(b_name)),
                ),
            )
        )
    n = F.size(arr)
    return F.flatten(
        F.transform(
            outer,
            lambda x, i: F.transform(
                F.slice(
                    arr,
                    k * cap + i + F.lit(2),
                    F.greatest(n - (k * cap + i) - 1, F.lit(0)),
                ),
                lambda y: F.struct(x.alias(a_name), y.alias(b_name)),
            ),
        )
    )


def skew_safe_pairs(
    df: DataFrame,
    key_cols: list[str],
    arr_col: str,
    *,
    directed: bool,
    a_name: str,
    b_name: str,
    cap: int | None = None,
) -> DataFrame:
    """Exploded pair rows (a_name, b_name) from ``df[arr_col]`` (sorted
    distinct arrays), generation bounded to cap·n pairs per task however
    large one group grows. ``key_cols`` salt the redistribution of split
    chunks (deterministic hash placement — no rand(), per guide §2.5's
    retry warning)."""
    if cap is None:
        cap = _cap()
    arr = F.col(arr_col)
    pairs = pair_expr(arr, directed=directed, a_name=a_name, b_name=b_name)
    small = (
        df.where(F.size(arr) <= cap)
        .select(F.explode(pairs).alias("p"))
        .select(f"p.{a_name}", f"p.{b_name}")
    )
    big = (
        df.where(F.size(arr) > cap)
        .select(
            *key_cols,
            arr_col,
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.size(arr) - F.lit(1)) / F.lit(cap)).cast("int"),
                )
            ).alias("_chunk"),
        )
        .repartition(*key_cols, "_chunk")
        .select(
            F.explode(
                _chunk_pair_expr(
                    arr,
                    F.col("_chunk"),
                    cap,
                    directed=directed,
                    a_name=a_name,
                    b_name=b_name,
                )
            ).alias("p")
        )
        .select(f"p.{a_name}", f"p.{b_name}")
    )
    return small.unionByName(big)
