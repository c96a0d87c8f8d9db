"""Iterative graph analytics (the MR-paper workload family MR04 §2.3
lists as link analysis; PageRank is its canonical fixed-point form).

Spark expression: the iteration driver stays in Python, but every
iteration is one declarative plan (broadcast join + partial-aggregated
groupBy) — the loop composes plans, it never touches rows. Two scale
rules demonstrated here:

- **Edges are the invariant** — computed once from the fact tables,
  cached; iterations stream only the O(|V|) rank vector through them.
- **Lineage must be cut** — each iteration's plan nests the last; at
  iteration k the uncut plan is k joins deep and analysis time grows
  superlinearly. ``localCheckpoint`` (or a parquet round-trip on a real
  cluster, where executor loss matters) truncates it periodically.

Determinism: rank values are double sums whose order Spark does not
guarantee, so this op is registered rows-only (no SQL oracle) with a
pytest comparing against a NumPy fixed-point reference at 1e-9 and
checking mass conservation — the documented criterion for iterative
float workloads (SURVEY §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import Tables

DAMPING = 0.85
# Pinned iteration count: 2 exact-decimal power steps (the
# SQL-replayable form; see graph_pagerank's docstring). The float
# run-to-convergence variant is exercised by tests/test_graph.py.
N_ITER = 2


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed nation→nation trade graph: an edge (customer nation →
    supplier nation) weighted by lineitem count. One fact-table join
    chain, aggregated to |V|² ≤ 625 rows — the expensive part, done
    once."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.select("l_orderkey", "l_suppkey")
        .join(t.orders.select("o_orderkey", "o_custkey"),
              F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.customer.select("c_custkey", "c_nationkey")),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
              F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )


@query(
    "graph_pagerank",
    category="J.graph",
    oracle="""
WITH e AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
),
outw AS (SELECT src, sum(w) AS wout FROM e GROUP BY 1),
tm AS (
  SELECT e.src, e.dst,
         round(e.w::DOUBLE / outw.wout, 6)::DECIMAL(7,6) AS p
  FROM e JOIN outw ON e.src = outw.src
),
nodes AS (SELECT n_nationkey AS node FROM nation),
inv AS (
  SELECT round(1.0 / (SELECT count(*) FROM nodes), 7)::DECIMAL(8,7) AS iv
),
base AS (
  SELECT (0.15::DECIMAL(3,2) * iv)::DECIMAL(12,9) AS b FROM inv
),
r0 AS (SELECT node, (SELECT iv FROM inv) AS p FROM nodes),
in1 AS (
  SELECT tm.dst, sum((r0.p * tm.p)::DECIMAL(15,13))::DECIMAL(15,13) AS m
  FROM r0 JOIN tm ON r0.node = tm.src GROUP BY 1
),
dm1 AS (
  SELECT coalesce(sum(p), 0)::DECIMAL(9,7) AS dm
  FROM r0 WHERE node NOT IN (SELECT src FROM outw)
),
r1 AS (
  SELECT nn.node,
         (base.b::DECIMAL(18,16)
          + (0.85::DECIMAL(3,2)
             * (coalesce(i.m, 0)::DECIMAL(16,14)
                + (dm1.dm * inv.iv)::DECIMAL(16,14)))::DECIMAL(18,16)
         )::DECIMAL(18,16) AS p
  FROM nodes nn
  LEFT JOIN in1 i ON i.dst = nn.node
  CROSS JOIN dm1 CROSS JOIN base CROSS JOIN inv
),
in2 AS (
  SELECT tm.dst, sum((r1.p * tm.p)::DECIMAL(24,22))::DECIMAL(24,22) AS m
  FROM r1 JOIN tm ON r1.node = tm.src GROUP BY 1
),
dm2 AS (
  SELECT coalesce(sum(p), 0)::DECIMAL(18,16) AS dm
  FROM r1 WHERE node NOT IN (SELECT src FROM outw)
),
r2 AS (
  SELECT nn.node,
         (base.b::DECIMAL(27,25)
          + (0.85::DECIMAL(3,2)
             * (coalesce(i.m, 0)::DECIMAL(25,23)
                + (dm2.dm * inv.iv)::DECIMAL(25,23)))::DECIMAL(27,25)
         )::DECIMAL(27,25) AS p
  FROM nodes nn
  LEFT JOIN in2 i ON i.dst = nn.node
  CROSS JOIN dm2 CROSS JOIN base CROSS JOIN inv
)
SELECT node, round(p::DOUBLE, 6) AS rank FROM r2
""",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the nation trade graph — TWO pinned power
    iterations from the uniform vector, damping 0.85, kept EXACT
    RATIONAL end-to-end so the fixed-point step is SQL-replayable (the
    ml_markov_stationary recipe applied to the damped iteration): the
    transition matrix pins to DECIMAL(7,6) once, then each iteration
    multiplies and sums decimals exactly (rank scales 7 → 16 → 25;
    precisions sized so no product exceeds DECIMAL(38) on either
    engine), with the dangling-mass correction (nations with no
    outgoing trade redistribute uniformly via the exact 1/n decimal)
    so rank mass is conserved exactly. The single double cast happens
    on the final exact value.

    Each iteration is one declarative plan: broadcast-join the O(|V|)
    rank vector to the cached transition matrix, one groupBy(dst)
    partial-aggregated sum. At production iteration counts the loop
    keeps the lineage-cut gate below (localCheckpoint every 5 rounds —
    the uncut plan nests one join deeper per iteration); with the two
    pinned iterations it never triggers. The float fixed-point run to
    convergence stays covered by the NumPy-reference pytest."""
    nations = Tables(spark, sf_dir).nation.select(
        F.col("n_nationkey").alias("node")
    )
    n = nations.count()
    if n == 0:
        # empty-input grain (round-10 sweep): no nodes → no ranks,
        # matching the oracle's empty r2 CTE; the early return keeps
        # the constant 1.0/n out of the plan (ANSI throws on the
        # folded literal even over zero rows)
        return nations.select(
            "node", F.lit(None).cast("double").alias("rank")
        )
    edges = trade_edges(spark, sf_dir)
    outw = edges.groupBy("src").agg(F.sum("w").alias("wout")).cache()
    # transition probability src→dst, pinned to 6 dp once (kmeans rule)
    trans = (
        edges.join(F.broadcast(outw), "src")
        .select(
            "src",
            "dst",
            F.round(F.col("w").cast("double") / F.col("wout"), 6)
            .cast("decimal(7,6)")
            .alias("p"),
        )
        .cache()
    )
    trans.count()  # materialize once; both iterations reuse

    inv_n = F.round(F.lit(1.0) / F.lit(n), 7).cast("decimal(8,7)")
    base = (F.lit(0.15).cast("decimal(3,2)") * inv_n).cast("decimal(12,9)")
    d = F.lit(0.85).cast("decimal(3,2)")

    ranks = nations.select("node", inv_n.alias("rank"))
    # (prod, sum_common, out) decimal types per iteration: rank scale
    # 7 →(×p, scale 13; common 14)→ 16 →(×p, scale 22; common 23)→ 25
    scales = [
        ("decimal(15,13)", "decimal(9,7)", "decimal(16,14)", "decimal(18,16)"),
        ("decimal(24,22)", "decimal(18,16)", "decimal(25,23)", "decimal(27,25)"),
    ]
    for i, (t_prod, t_dm, t_sum, t_out) in enumerate(scales):
        contrib = (
            trans.join(F.broadcast(ranks), F.col("src") == F.col("node"))
            .groupBy("dst")
            .agg(
                F.sum((F.col("rank") * F.col("p")).cast(t_prod))
                .cast(t_prod)
                .alias("in_mass")
            )
        )
        # dangling mass: rank held by nodes with no outgoing edges
        dangling = (
            ranks.join(F.broadcast(outw), F.col("node") == F.col("src"), "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0)).cast(t_dm).alias("dm"))
        )
        ranks = (
            nations.join(contrib, F.col("node") == F.col("dst"), "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    base.cast(t_out)
                    + (
                        d
                        * (
                            F.coalesce(F.col("in_mass"), F.lit(0)).cast(t_sum)
                            + (F.col("dm") * inv_n).cast(t_sum)
                        )
                    ).cast(t_out)
                )
                .cast(t_out)
                .alias("rank"),
            )
        )
        if (i + 1) % 5 == 0:
            # cut lineage: the uncut plan is i joins deep by now
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select(
        "node", F.round(F.col("rank").cast("double"), 6).alias("rank")
    )


@query(
    "graph_triangles",
    category="J.graph",
    oracle="""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
tri AS (
  SELECT ab.pa AS a, ab.pb AS b, bc.pb AS c
  FROM e ab
  JOIN e bc ON ab.pb = bc.pa
  JOIN e ac ON ac.pa = ab.pa AND ac.pb = bc.pb
)
SELECT part, count(*) AS n_triangles
FROM (SELECT unnest([a, b, c]) AS part FROM tri)
GROUP BY part
""",
)
def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the part co-occurrence graph (edges =
    part pairs sharing ≥2 orders, the cooccur_parts support threshold) —
    the canonical one-round "beyond wordcount" graph workload, exactly
    checkable unlike the fixed-point ops above.

    Plan: with edges oriented a<b (already the cooccur convention), every
    triangle a<b<c is found exactly once by the two-hop join
    (a,b)⋈(b,c)⋈(a,c) — the orientation is the classic dedup trick that
    also bounds the join fan-out by out-degree, not total degree. Each
    triangle then credits its three corners via explode → groupBy.

    Scale: the dominant cost is the (a,b)⋈(b,c) hop, shuffling edges by
    their endpoint; hub vertices fan out quadratically, and the standard
    mitigation (degree-ordered orientation: point every edge low→high
    DEGREE, not low→high id, so hubs get small out-degree) drops the
    worst case to O(m^1.5) — noted, not needed at fixture density. The
    (a,c) closure check joins on the composite key, AQE-broadcast here."""
    li = Tables(spark, sf_dir).lineitem
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("pb"))
    e = (
        a.join(b, "l_orderkey")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 2)
        .select("pa", "pb")
    )
    ab = e.select(F.col("pa").alias("a"), F.col("pb").alias("b"))
    bc = e.select(F.col("pa").alias("b"), F.col("pb").alias("c"))
    ac = e.select(F.col("pa").alias("a"), F.col("pb").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    return (
        tri.select(F.explode(F.array("a", "b", "c")).alias("part"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def orient_by_degree(edges: DataFrame) -> DataFrame:
    """Re-orient an undirected edge list (columns ``pa < pb``, one row per
    edge) to point low→high DEGREE (ties → low→high id): the classic
    triangle-enumeration orientation (Chiba–Nishizeki / "node-iterator++"),
    which caps every vertex's OUT-degree at O(√m) and hence the wedge
    candidates at O(m^1.5) — versus O(Σ d(v)²) for id-orientation, which a
    single hub with a low id blows up quadratically.

    Returns columns ``src, dst, src_deg, dst_deg`` where
    (src_deg, src) < (dst_deg, dst) lexicographically. Degrees join back
    onto the edges by endpoint — two shuffles on vertex id, both over
    O(m)-row narrow frames; no global window, so the orientation itself
    scales."""
    deg = (
        edges.select(F.explode(F.array("pa", "pb")).alias("v"))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("v").alias("pa"), F.col("deg").alias("da"))
    db = deg.select(F.col("v").alias("pb"), F.col("deg").alias("db"))
    ranked = edges.join(da, "pa").join(db, "pb")
    a_first = F.struct("da", "pa") < F.struct("db", "pb")
    return ranked.select(
        F.when(a_first, F.col("pa")).otherwise(F.col("pb")).alias("src"),
        F.when(a_first, F.col("pb")).otherwise(F.col("pa")).alias("dst"),
        F.when(a_first, F.col("da")).otherwise(F.col("db")).alias("src_deg"),
        F.when(a_first, F.col("db")).otherwise(F.col("da")).alias("dst_deg"),
    )


def wedges_ordered(oriented: DataFrame) -> DataFrame:
    """Wedge candidates from a degree-oriented edge list: pairs of
    out-edges (x→y, x→z) with (deg,id)-rank(y) < rank(z). Every triangle
    has exactly one vertex with two out-edges under an acyclic
    orientation, so each is generated once; the candidate count is the
    quantity the orientation exists to bound."""
    e1 = oriented.select(
        "src",
        F.col("dst").alias("y"),
        F.col("dst_deg").alias("y_deg"),
    )
    e2 = oriented.select(
        "src",
        F.col("dst").alias("z"),
        F.col("dst_deg").alias("z_deg"),
    )
    return e1.join(e2, "src").where(
        F.struct("y_deg", "y") < F.struct("z_deg", "z")
    )


def triangles_from_edges(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts from an undirected ``pa < pb`` edge list,
    via degree-ordered orientation. The closure check joins wedges back to
    the oriented edges on (y, z); orientation z→y cannot occur, because
    rank(y) < rank(z) by the wedge predicate and orientation always points
    rank-low → rank-high — so the closing edge, if present, is exactly
    (src=y, dst=z). One equi-join, no disjunction.

    Both the edge list and the oriented list are multiply referenced
    downstream (edges: degree pass + orientation join; oriented: wedge
    pair + closure probe), and ReuseExchange does NOT collapse the
    duplicated logical subtrees here — uncached, the expensive
    co-occurrence edge derivation re-executes per reference (measured
    44x: 4.4s → 0.1s at sf0.01, where the co-occurrence graph is
    dense). ``cache()`` is the batch answer; on a real cluster a
    materialized edge table plays this role (the module-note pattern)."""
    edges = edges.cache()
    oriented = orient_by_degree(edges).cache()
    closing = oriented.select(F.col("src").alias("y"), F.col("dst").alias("z"))
    tri = wedges_ordered(oriented).join(closing, ["y", "z"])
    return (
        tri.select(F.explode(F.array("src", "y", "z")).alias("part"))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


@query(
    "graph_triangles_ordered",
    category="J.graph",
    oracle="""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
tri AS (
  SELECT ab.pa AS a, ab.pb AS b, bc.pb AS c
  FROM e ab
  JOIN e bc ON ab.pb = bc.pa
  JOIN e ac ON ac.pa = ab.pa AND ac.pb = bc.pb
)
SELECT part, count(*) AS n_triangles
FROM (SELECT unnest([a, b, c]) AS part FROM tri)
GROUP BY part
""",
)
def graph_triangles_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """graph_triangles' O(m^1.5) form: edges re-oriented low→high degree
    before the two-hop join, so a hub's wedge fan-out is bounded by its
    (small) out-degree instead of its total degree — the variant that
    survives power-law graphs at 100 TB. Same edge definition and the
    SAME oracle as graph_triangles (per-node triangle counts are
    orientation-invariant), so the driver cross-checks two independent
    physical strategies against one SQL reference. The measured wedge
    bound is pinned by tests/test_graph.py on a synthetic star graph
    (id-orientation: O(d²) wedges through the hub; degree-orientation:
    zero)."""
    li = Tables(spark, sf_dir).lineitem
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("pb"))
    e = (
        a.join(b, "l_orderkey")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 2)
        .select("pa", "pb")
    )
    return triangles_from_edges(e)


WCC_MAX_ROUNDS = 12


def _canon_edges(e: DataFrame) -> DataFrame:
    """Undirected edge set in canonical (hi > lo) form, self-loops
    dropped, deduped."""
    return (
        e.select(
            F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo")
        )
        .where(F.col("hi") != F.col("lo"))
        .distinct()
    )


@query(
    "graph_wcc",
    category="J.graph",
    oracle="""
WITH RECURSIVE
op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= 2
),
edges AS (SELECT pa AS src, pb AS dst FROM pairs
          UNION ALL SELECT pb, pa FROM pairs),
walk(node, comp) AS (
  SELECT p_partkey, p_partkey FROM part
  UNION
  SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.node
)
SELECT node AS part, min(comp)::BIGINT AS component_id,
       (min(comp) = node) AS is_canonical
FROM walk GROUP BY node
""",
)
def graph_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weakly connected components over the part co-occurrence graph
    (parts sharing ≥2 orders) via the LARGE-STAR / SMALL-STAR
    alternation (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the O(log n)-round algorithm dedup_components'
    docstring names as the web-scale replacement for min-label
    propagation, implemented here for real. Each phase is ONE
    declarative plan over the edge list:

    - large-star: group the bidirectional adjacency by u, take
      m = min(Γ(u) ∪ {u}), re-link every strictly larger neighbor to m
      (connectivity is preserved because every edge is processed from
      BOTH endpoints);
    - small-star: group the (hi → lo) edges by hi, take m = min(lo),
      re-link hi and all its smaller neighbors to m.

    Rounds shrink star heights geometrically, so the giant component in
    this fixture (~1.9k of 1.9k paired parts at sf0.01) converges in a
    handful of alternations vs its propagation diameter; the loop
    composes plans only (localCheckpoint cuts lineage per round,
    mirroring graph_pagerank) and stops when the canonical edge set
    reaches the small-star fixpoint. Parts in no pair are their own
    singleton components, matching the oracle's recursive min-reachable
    closure over ALL parts."""
    t = Tables(spark, sf_dir)
    op = t.lineitem.select("l_orderkey", "l_partkey").distinct()
    a = op.select("l_orderkey", F.col("l_partkey").alias("a"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("b"))
    pairs = (
        a.join(b, "l_orderkey")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 2)
        .select("a", "b")
    )
    edges = _canon_edges(pairs).localCheckpoint(eager=True)
    for _ in range(WCC_MAX_ROUNDS):
        # large star over the bidirectional adjacency
        bid = edges.select(
            F.col("hi").alias("u"), F.col("lo").alias("v")
        ).union(edges.select(F.col("lo").alias("u"), F.col("hi").alias("v")))
        mins = bid.groupBy("u").agg(F.min("v").alias("mnn"))
        ls = (
            bid.join(mins, "u")
            .where(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("a"),
                F.least(F.col("u"), F.col("mnn")).alias("b"),
            )
        )
        e1 = _canon_edges(ls).localCheckpoint(eager=True)
        # small star over the canonical (hi -> lo) orientation
        mins2 = e1.groupBy("hi").agg(F.min("lo").alias("mnn"))
        joined = e1.join(mins2, "hi")
        ss = joined.select(
            F.col("lo").alias("a"), F.col("mnn").alias("b")
        ).union(mins2.select(F.col("hi").alias("a"), F.col("mnn").alias("b")))
        e2 = _canon_edges(ss).localCheckpoint(eager=True)
        # cheap count gate first; the two-sided exceptAll only runs on
        # candidate fixpoints (same cardinality), so most rounds cost
        # one count, not three
        same_size = e2.count() == edges.count()
        changed = (
            e2.exceptAll(edges).count() + edges.exceptAll(e2).count()
            if same_size
            else 1
        )
        edges = e2
        if changed == 0:
            break
    else:
        # loud failure beats silently-wrong intermediate labels: if the
        # alternation has not reached its fixpoint, the final edge set is
        # not a star forest and the min-link labels below would be wrong
        raise RuntimeError(
            f"graph_wcc did not converge in {WCC_MAX_ROUNDS} rounds; "
            "raise WCC_MAX_ROUNDS for this graph"
        )
    # at the fixpoint every edge is (node -> its component's min id)
    labels = edges.groupBy(F.col("hi").alias("part")).agg(
        F.min("lo").alias("link")
    )
    parts = t.part.select(F.col("p_partkey").alias("part"))
    return parts.join(labels, "part", "left").select(
        "part",
        F.coalesce(F.col("link"), F.col("part")).alias("component_id"),
        (F.coalesce(F.col("link"), F.col("part")) == F.col("part")).alias(
            "is_canonical"
        ),
    )


@query(
    "rank_hits",
    category="J.graph",
    oracle="""
WITH e AS (
  SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
),
nodes AS (SELECT n_nationkey AS node FROM nation),
a1 AS (SELECT dst, sum(w)::DECIMAL(38,0) AS a FROM e GROUP BY 1),
h1 AS (
  SELECT e.src, sum((e.w * a1.a)::DECIMAL(38,0))::DECIMAL(38,0) AS h
  FROM e JOIN a1 ON e.dst = a1.dst GROUP BY 1
),
a2 AS (
  SELECT e.dst, sum((e.w * h1.h)::DECIMAL(38,0))::DECIMAL(38,0) AS a
  FROM e JOIN h1 ON e.src = h1.src GROUP BY 1
),
h2 AS (
  SELECT e.src, sum((e.w * a2.a)::DECIMAL(38,0))::DECIMAL(38,0) AS h
  FROM e JOIN a2 ON e.dst = a2.dst GROUP BY 1
),
mx AS (
  SELECT (SELECT max(a) FROM a2)::DOUBLE AS ma,
         (SELECT max(h) FROM h2)::DOUBLE AS mh
)
SELECT n.node,
       round(coalesce(a2.a, 0)::DOUBLE / mx.ma, 6) AS authority,
       round(coalesce(h2.h, 0)::DOUBLE / mx.mh, 6) AS hub
FROM nodes n
LEFT JOIN a2 ON a2.dst = n.node
LEFT JOIN h2 ON h2.src = n.node
CROSS JOIN mx
""",
)
def rank_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs-and-authorities over the nation trade graph — the
    OTHER classic link-analysis fixed point next to graph_pagerank
    (Kleinberg's mutual-reinforcement recursion: a ← Eᵀh, h ← Ea):
    two full update rounds from h₀ = 1, kept EXACT INTEGER the whole
    way. Unnormalized HITS iterates are integer-valued when seeded
    with ones (every update is a weighted integer sum), so unlike
    PageRank no decimal-scale ladder is needed — DECIMAL(38,0) holds
    the growth (≤ Σw·(Σw)² per round, ~1e29 even at 100 TB edge
    counts) and normalization happens ONCE at the end against the max
    score (both engines divide identically-rounded doubles). Plan
    shape: edges aggregate once (the only fact-table scan); each
    update is a broadcast-size join + one partial-agg shuffle over
    |V|² ≤ 625 rows."""
    nations = Tables(spark, sf_dir).nation.select(
        F.col("n_nationkey").alias("node")
    )
    e = trade_edges(spark, sf_dir).cache()
    e.count()  # materialize: four updates reuse the edge aggregate
    a1 = e.groupBy("dst").agg(F.sum("w").cast("decimal(38,0)").alias("a"))

    def update(vec: DataFrame, in_key: str, out_key: str, col: str,
               out: str) -> DataFrame:
        return (
            e.join(F.broadcast(vec), in_key)
            .groupBy(out_key)
            .agg(
                F.sum((F.col("w") * F.col(col)).cast("decimal(38,0)"))
                .cast("decimal(38,0)")
                .alias(out)
            )
        )

    h1 = update(a1, "dst", "src", "a", "h")
    a2 = update(h1, "src", "dst", "h", "a")
    h2 = update(a2, "dst", "src", "a", "h")
    mx = a2.agg(F.max("a").cast("double").alias("ma")).crossJoin(
        h2.agg(F.max("h").cast("double").alias("mh"))
    )
    return (
        nations.join(a2, nations.node == a2.dst, "left")
        .join(h2, nations.node == h2.src, "left")
        .crossJoin(F.broadcast(mx))
        .select(
            "node",
            F.round(
                F.coalesce(F.col("a"), F.lit(0)).cast("double") / F.col("ma"), 6
            ).alias("authority"),
            F.round(
                F.coalesce(F.col("h"), F.lit(0)).cast("double") / F.col("mh"), 6
            ).alias("hub"),
        )
    )
