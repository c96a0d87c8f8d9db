"""Round-6 operators: runtime bloom-filter join, count-min sketch,
PII scrub — semantics beyond the oracle parity gate (test_oracle_parity
covers exact value equality for all three)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_server_spark import REGISTRY
from mapreduce_server_spark.plans import plan_string

from .conftest import SF001


def test_bloom_join_plan_has_runtime_filter(spark):
    """The whole point of join_bloom_runtime: the physical plan probes a
    bloom_filter_agg subquery on the fact scan side."""
    df = REGISTRY["join_bloom_runtime"].fn(spark, SF001)
    p = plan_string(df, "extended")
    assert "might_contain" in p
    assert "bloom_filter_agg" in p


def test_bloom_join_restores_session_confs(spark):
    """Conf pinning is scoped to the fn's own physical compile — the
    session the driver shares across queries must come back untouched."""
    before = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }
    REGISTRY["join_bloom_runtime"].raw_fn(spark, SF001)
    after = {k: spark.conf.get(k) for k in before}
    assert after == before


def test_countmin_overestimates_only(spark):
    """CM guarantee: collisions only ADD, so n_est >= n_exact for every
    probed key; with 60k rows in 4x512 counters the estimate must also
    stay within the epsilon*N additive bound with room to spare."""
    rows = REGISTRY["sketch_countmin"].fn(spark, SF001).collect()
    assert len(rows) == 10
    n_total = 60000  # sf0.01 lineitem rows (FIXTURES.md)
    for r in rows:
        assert r.n_est >= r.n_exact, (r.l_partkey, r.n_exact, r.n_est)
        # e*N with e=2.71/w would be ~319; generous factor-2 headroom
        assert r.n_est - r.n_exact < 2 * 2.71828 * n_total / 512


def test_pii_scrub_counts_and_invariants(spark):
    """Each constructed contact string contains exactly 2 emails + 1 IP;
    after the scrub no raw email/IP can remain (the audit counts say the
    regexes fired, the invariant says they consumed their matches)."""
    rows = REGISTRY["text_pii_scrub"].fn(spark, SF001).collect()
    assert rows  # one row per source
    for r in rows:
        assert r.emails_redacted == 2 * r.n_docs
        assert r.ips_redacted == r.n_docs
        assert r.docs_with_email == r.n_docs

    # direct check on the scrubbed strings themselves, not just the agg
    from mapreduce_server_spark.sources.loader import Tables

    d = Tables(spark, SF001).documents.limit(50)
    email = r"[a-z0-9._%-]+@[a-z0-9.-]+\.[a-z]{2,}"
    contact = F.concat(
        F.lit("contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@"),
        F.col("source"),
        F.lit(".example.com or admin@"),
        F.col("source"),
        F.lit(".example.org at 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
    )
    scrubbed = d.select(
        F.regexp_replace(contact, email, "<EMAIL>").alias("s")
    )
    leaked = scrubbed.filter(F.col("s").rlike(email)).count()
    assert leaked == 0
