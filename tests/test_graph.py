"""Iterative PageRank: Spark's pinned-decimal power iterations vs an
independent NumPy float replay on the same synthesized trade graph.
The engine keeps the two iterations exact-rational (decimal scales
7 → 16 → 25) and only rounds the final value to 6 dp; the float replay
mirrors the pinned hand-offs (transition probs rounded to 6 dp,
uniform/base constants to 7/9 dp) and must agree within the final
rounding half-ulp. Mass conservation is approximate by design now:
rounding each transition prob to 6 dp perturbs row-stochasticity by up
to ~1.25e-5 per row."""

from __future__ import annotations

import duckdb
import numpy as np

from mapreduce_server_spark.operators.graph import DAMPING, N_ITER, graph_pagerank
from mapreduce_server_spark.registry import REGISTRY

from .conftest import SF001


def _numpy_pagerank(sf_dir: str) -> dict[int, float]:
    con = duckdb.connect()
    edges = con.execute(
        f"""
        SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
        FROM read_parquet('{sf_dir}/lineitem.parquet') l
        JOIN read_parquet('{sf_dir}/orders.parquet') o ON o_orderkey = l_orderkey
        JOIN read_parquet('{sf_dir}/customer.parquet') c ON c_custkey = o_custkey
        JOIN read_parquet('{sf_dir}/supplier.parquet') s ON s_suppkey = l_suppkey
        GROUP BY 1, 2
        """
    ).fetchall()
    nodes = [
        r[0]
        for r in con.execute(
            f"SELECT n_nationkey FROM read_parquet('{sf_dir}/nation.parquet') ORDER BY 1"
        ).fetchall()
    ]
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    w = np.zeros((n, n))
    for src, dst, cnt in edges:
        w[idx[src], idx[dst]] = cnt
    out = w.sum(axis=1)
    has_out = out > 0
    # mirror the engine's pinned hand-offs: transition probs to 6 dp,
    # the uniform start to 7 dp, base = 0.15 * inv_n (exact at 9 dp)
    p = np.round(
        np.divide(w, out[:, None], out=np.zeros_like(w), where=out[:, None] > 0), 6
    )
    inv_n = round(1.0 / n, 7)
    base = 0.15 * inv_n
    r = np.full(n, inv_n)
    for _ in range(N_ITER):
        dm = r[~has_out].sum()
        r = base + DAMPING * (r @ p + dm * inv_n)
    return {v: r[idx[v]] for v in nodes}


def test_degree_orientation_bounds_hub_wedges(spark):
    """The measured claim behind graph_triangles_ordered: on a star graph
    (hub 0 with the LOWEST id, d leaves), id-orientation points every edge
    out of the hub → d·(d−1)/2 wedge candidates; degree-orientation points
    every edge INTO the hub → zero. Same triangle answer (a star has
    none)."""
    from pyspark.sql import functions as F

    from mapreduce_server_spark.operators.graph import (
        orient_by_degree,
        triangles_from_edges,
        wedges_ordered,
    )

    d = 40
    star = spark.createDataFrame([(0, i) for i in range(1, d + 1)], ["pa", "pb"])

    # id-orientation (pa < pb, as given): the hub owns every out-edge
    id_wedges = (
        star.alias("l")
        .join(star.alias("r"), F.col("l.pa") == F.col("r.pa"))
        .where(F.col("l.pb") < F.col("r.pb"))
        .count()
    )
    assert id_wedges == d * (d - 1) // 2

    oriented = orient_by_degree(star)
    # every leaf (deg 1) points at the hub (deg d); hub has out-degree 0
    assert oriented.where(F.col("dst") != 0).count() == 0
    assert wedges_ordered(oriented).count() == 0

    assert triangles_from_edges(star).count() == 0


def test_triangles_ordered_matches_plain_on_clique_plus_tail(spark):
    """K4 ∪ chain: both plans agree with the hand answer — each K4 vertex
    closes C(3,2) = 3 triangles; chain vertices none."""
    from mapreduce_server_spark.operators.graph import triangles_from_edges

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    chain = [(10, 11), (11, 12), (12, 13)]
    edges = spark.createDataFrame(k4 + chain, ["pa", "pb"])
    got = {r.part: r.n_triangles for r in triangles_from_edges(edges).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_pagerank_matches_numpy_reference(spark):
    got = {r.node: r.rank for r in graph_pagerank(spark, SF001).collect()}
    want = _numpy_pagerank(SF001)
    assert set(got) == set(want)
    # engine output is round(exact_decimal, 6); the float replay sits
    # within ~1e-12 of the exact value, so they agree to the 6-dp half-ulp
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6, (v, got[v], want[v])
    # mass conservation up to the 6-dp transition-prob pinning
    assert abs(sum(got.values()) - 1.0) < 1e-4


def test_wcc_matches_union_find(spark, duck):
    """Large-star/small-star components equal a pure-Python union-find
    over the same >=2-order co-occurrence pair graph, with min-id
    canonical labels and singleton parts mapped to themselves."""
    rows = {r["part"]: r for r in REGISTRY["graph_wcc"].fn(spark, SF001).collect()}
    pairs = duck.execute(
        """
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey, b.l_partkey FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING count(*) >= 2
        """
    ).fetchall()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in each component
    comp_min: dict[int, int] = {}
    for x in list(parent):
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    all_parts = [r[0] for r in duck.execute("SELECT p_partkey FROM part").fetchall()]
    assert set(rows) == set(all_parts)
    for p in all_parts:
        expect = comp_min[find(p)] if p in parent else p
        assert rows[p]["component_id"] == expect, p
        assert rows[p]["is_canonical"] == (expect == p), p
