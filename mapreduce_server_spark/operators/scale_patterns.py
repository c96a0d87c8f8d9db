"""Scale-technique operators: the physical patterns a 100 TB deployment
reaches for — skew salting, bloom pre-filtering, and deterministic
frequency/membership sketches — each expressed so the RESULT stays
exact-oracle-checkable even though the technique exists purely for the
physical plan (SURVEY §2.C/§2.D scale notes; ARCHITECTURE §13).

Determinism discipline: every hash is md5-derived (the dedup_minhash
recipe — ``conv(substring(md5(..), 1, 8), 16, 10)`` ≡ DuckDB
``('0x' || substr(md5(..), 1, 8))::BIGINT``), so sketch contents and
salt assignments replay bit-for-bit in SQL; no RNG anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import Tables

#: salt fan-out for the skewed-join demo (each hot key spreads over 16
#: reducers; at 100 TB size this to the observed per-key row count /
#: target partition size)
SALT_N = 16

#: count-min sketch geometry: 4 independent hash rows × 256 buckets.
#: Error bound: overestimate ≤ 2·n/w with prob ≥ 1 − (1/2)^d.
CMS_D = 4
CMS_W = 256

#: bloom geometry for the membership demo: 2048 bits, 3 hashes.
BLOOM_M = 2048
BLOOM_K = 3


def _md5_int(prefix: str, col) -> F.Column:
    """First 8 md5 hex digits of ``prefix + str(col)`` as a BIGINT —
    the engine-portable uniform hash (dedup.py:155 recipe)."""
    h = F.md5(F.concat(F.lit(prefix), col.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def _md5_int_sql(prefix: str, expr: str) -> str:
    """DuckDB twin of :func:`_md5_int`."""
    return f"('0x' || substr(md5('{prefix}' || ({expr})::VARCHAR), 1, 8))::BIGINT"


@query(
    "join_skew_salted",
    category="C.join",
    oracle="""
SELECT s.s_nationkey, count(*) AS n_items,
       sum(l.l_extendedprice::DECIMAL(18,2))::DOUBLE AS revenue
FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY 1
""",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided SALTED join — the hand-rolled skew mitigation when one
    join key is hot enough to stall a sort-merge reducer (agg_salted's
    sibling for joins): the fact side gets ``salt = h(row id) % 16``,
    the dim side is replicated 16× (one copy per salt via a literal
    explode), and the join key becomes (key, salt) — each hot key's
    rows now land on 16 reducers instead of 1. The dim replication
    costs 16·|dim| rows, which is why AQE's runtime skew-join split
    (``spark.sql.adaptive.skewJoin``) is the first resort and this the
    explicit fallback for aggregation-adjacent cases it can't see.
    The merge-join hint keeps Spark from broadcasting the small fixture
    dim — the whole point is demonstrating the shuffle-join shape.
    Results are identical to the plain join (the oracle IS the plain
    join): salting only re-buckets rows, decimal partials merge
    exactly."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.select(
        "l_suppkey",
        "l_extendedprice",
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(SALT_N)).alias(
            "salt"
        ),
    )
    dim = (
        t.supplier.select("s_suppkey", "s_nationkey")
        .withColumn(
            "salt",
            F.explode(F.array(*[F.lit(i) for i in range(SALT_N)])),
        )
        .hint("merge")
    )
    return (
        li.join(
            dim,
            (li.l_suppkey == dim.s_suppkey) & (li.salt == dim.salt),
        )
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


@query(
    "join_bloom_semi",
    category="C.join",
    oracle="""
WITH dim AS (
  SELECT c_custkey FROM customer
  WHERE c_nationkey = 3 AND c_acctbal > 5000
)
SELECT o.o_orderpriority, count(*) AS n_orders,
       sum(o.o_totalprice::DECIMAL(18,2))::DOUBLE AS total
FROM orders o SEMI JOIN dim d ON o.o_custkey = d.c_custkey
GROUP BY 1
""",
)
def join_bloom_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-prefiltered semi-join — the runtime-filter pattern Spark's
    own ``InjectRuntimeFilter`` applies under AQE, built explicitly so
    the mechanics are visible: (1) hash the selective dim key set into
    an m=2048-bit / k=3 bloom (md5-derived positions, aggregated to ONE
    sorted set-bit array row), (2) broadcast it and pre-filter the fact
    scan with 3 ``array_contains`` probes — false positives pass, true
    members never fail, so the filter is SAFE to push below the
    shuffle and typically removes most fact rows before they move —
    then (3) the exact broadcast semi-join removes the false
    positives. Result ≡ plain semi-join (the oracle), by bloom
    one-sidedness. At 100 TB the bloom is the difference between
    shuffling the full fact table and shuffling ~|matches| rows."""
    t = Tables(spark, sf_dir)
    dim = t.customer.filter(
        (F.col("c_nationkey") == 3) & (F.col("c_acctbal") > 5000)
    ).select("c_custkey")
    # set-bit positions, one array row (k hashes per key, deduplicated)
    bits = (
        dim.select(
            F.explode(
                F.array(
                    *[
                        (_md5_int(f"bf{i}:", F.col("c_custkey")) % BLOOM_M).alias(
                            f"b{i}"
                        )
                        for i in range(BLOOM_K)
                    ]
                )
            ).alias("bit")
        )
        .agg(F.array_sort(F.collect_set("bit")).alias("bits"))
    )
    o = t.orders
    probed = o.crossJoin(F.broadcast(bits)).filter(
        F.array_contains("bits", _md5_int("bf0:", F.col("o_custkey")) % BLOOM_M)
        & F.array_contains("bits", _md5_int("bf1:", F.col("o_custkey")) % BLOOM_M)
        & F.array_contains("bits", _md5_int("bf2:", F.col("o_custkey")) % BLOOM_M)
    )
    exact = probed.join(
        F.broadcast(dim), probed.o_custkey == dim.c_custkey, "left_semi"
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
    )


def _cms_bucket_sql(d: int) -> str:
    return f"{_md5_int_sql(f'cms{d}:', 'user_id')} % {CMS_W}"


@query(
    "sketch_cms",
    category="D.agg",
    oracle=f"""
WITH cells AS (
  SELECT d.d,
         ('0x' || substr(md5('cms' || d.d || ':' || user_id::VARCHAR), 1, 8))::BIGINT
           % {CMS_W} AS bucket,
         count(*) AS cnt
  FROM events, (SELECT unnest(generate_series(0, {CMS_D - 1})) AS d) d
  GROUP BY 1, 2
),
q AS (SELECT DISTINCT user_id FROM events WHERE user_id % 100 = 0),
est AS (
  SELECT q.user_id,
         min(c.cnt) AS est
  FROM q, (SELECT unnest(generate_series(0, {CMS_D - 1})) AS d) d
  JOIN cells c
    ON c.d = d.d
   AND c.bucket = ('0x' || substr(md5('cms' || d.d || ':' || q.user_id::VARCHAR), 1, 8))::BIGINT
                  % {CMS_W}
  GROUP BY 1
),
truth AS (
  SELECT user_id, count(*) AS true_n FROM events
  WHERE user_id % 100 = 0 GROUP BY 1
)
SELECT e.user_id, e.est::BIGINT AS est, t.true_n::BIGINT AS true_n,
       (e.est - t.true_n)::BIGINT AS overcount
FROM est e JOIN truth t ON e.user_id = t.user_id
""",
)
def sketch_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch, the mergeable frequency estimator: d=4 md5 hash
    rows × w=256 counters over event user_ids — the fixed-size answer
    to "how often did key X occur" when the key space is too large for
    an exact per-key count. One pass builds all d·w = 1024 cells as a
    single (d, bucket) group-by (each input row contributes to d
    cells via a literal posexplode — map-side combined, so the shuffle
    carries ≤ 1024 rows per task regardless of input size); estimates
    are min-over-rows, queried here for the deterministic probe set
    ``user_id % 100 = 0`` next to their true counts, making the
    CMS guarantee (est ≥ truth, est ≤ truth + 2n/w w.h.p.) visible in
    the output. Everything is md5-derived and integer — the sketch
    CONTENT is oracle-exact, not just the query semantics."""
    ev = Tables(spark, sf_dir).events
    ds = F.array(*[F.lit(i) for i in range(CMS_D)])
    cells = (
        ev.select(F.explode(ds).alias("d"), "user_id")
        .groupBy(
            "d",
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("cms"),
                                F.col("d").cast("string"),
                                F.lit(":"),
                                F.col("user_id").cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % CMS_W
            ).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = (
        ev.filter(F.col("user_id") % 100 == 0)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    probe_cells = probes.select(
        "user_id", "true_n", F.explode(ds).alias("d")
    ).select(
        "user_id",
        "true_n",
        "d",
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("cms"),
                            F.col("d").cast("string"),
                            F.lit(":"),
                            F.col("user_id").cast("string"),
                        ).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % CMS_W
        ).alias("bucket"),
    )
    est = (
        probe_cells.join(F.broadcast(cells), ["d", "bucket"])
        .groupBy("user_id", "true_n")
        .agg(F.min("cnt").alias("est"))
    )
    return est.select(
        "user_id",
        F.col("est").cast("long").alias("est"),
        F.col("true_n").cast("long").alias("true_n"),
        (F.col("est") - F.col("true_n")).cast("long").alias("overcount"),
    )


@query(
    "sketch_bloom",
    category="D.agg",
    oracle=f"""
WITH members AS (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
),
bits AS (
  SELECT DISTINCT
         ('0x' || substr(md5('bm' || k.k || ':' || o_custkey::VARCHAR), 1, 8))::BIGINT
           % {BLOOM_M} AS bit
  FROM members, (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS k) k
),
probe AS (
  SELECT c.c_custkey,
         (SELECT count(*) FROM (SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS k) k
          WHERE ('0x' || substr(md5('bm' || k.k || ':' || c.c_custkey::VARCHAR), 1, 8))::BIGINT
                % {BLOOM_M} IN (SELECT bit FROM bits)) = {BLOOM_K} AS in_bloom,
         c.c_custkey IN (SELECT o_custkey FROM members) AS is_member
  FROM customer c
)
SELECT in_bloom, is_member, count(*)::BIGINT AS n
FROM probe GROUP BY 1, 2
""",
)
def sketch_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership sketch with its confusion matrix: the
    custkeys holding a filled ('F') order are hashed into an m=2048 /
    k=3 bloom, then EVERY customer probes it; output is the (in_bloom,
    is_member) count matrix — the (true, false) × (false, true) cell
    is structurally empty (no false negatives, the bloom guarantee)
    and the (true, false) cell measures the realized false-positive
    rate against the ~m·ln2/k capacity heuristic. The bit set and
    every probe are md5-derived integers, so the sketch content
    replays exactly in SQL; at 100 TB the bits array (≤ 2048 ints)
    broadcasts while members/probes stay distributed."""
    t = Tables(spark, sf_dir)
    members = (
        t.orders.filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
        .distinct()
    )
    ks = F.array(*[F.lit(i) for i in range(BLOOM_K)])
    bits = (
        members.select(F.explode(ks).alias("k"), "o_custkey")
        .select(
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("bm"),
                                F.col("k").cast("string"),
                                F.lit(":"),
                                F.col("o_custkey").cast("string"),
                            ).cast("binary")
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % BLOOM_M
            ).alias("bit")
        )
        .agg(F.array_sort(F.collect_set("bit")).alias("bits"))
    )
    probe = (
        t.customer.select("c_custkey")
        .crossJoin(F.broadcast(bits))
        .join(
            F.broadcast(members),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .select(
            "c_custkey",
            (
                F.array_contains(
                    "bits", _md5_int("bm0:", F.col("c_custkey")) % BLOOM_M
                )
                & F.array_contains(
                    "bits", _md5_int("bm1:", F.col("c_custkey")) % BLOOM_M
                )
                & F.array_contains(
                    "bits", _md5_int("bm2:", F.col("c_custkey")) % BLOOM_M
                )
            ).alias("in_bloom"),
            F.col("o_custkey").isNotNull().alias("is_member"),
        )
    )
    return probe.groupBy("in_bloom", "is_member").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
