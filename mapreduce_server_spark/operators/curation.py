"""Corpus-curation operators: deterministic sampling and repetition stats.

These extend the north-star training-data surface (SURVEY.md §2 cat. J)
with the sampling/reweighting and repetition-filter stages a pretraining
pipeline runs between dedup and packing:

- ``sample_hash``    — reproducible Bernoulli sampling by key hash.
- ``sample_mixture`` — per-language mixture reweighting (downsample
  over-represented slices to a target rate), same hash trick.
- ``text_repetition``— Gopher-style repetition metrics (duplicate-token
  fraction, top-bigram mass) per document; the repetition filter's input.

Hash-based sampling beats ``df.sample`` for pipelines: the keep/drop
decision is a pure function of the stable key (never the partition
layout, seed plumbing, or engine), so reruns, backfills, and engine swaps
select the same rows — which also makes it exactly oracle-checkable,
unlike RNG sampling (``agg_sample`` stays rows-only for that reason).

Scale: every operator here is one scan + narrow per-row work (md5 of the
key, token stats); ``text_repetition`` adds one explode + partial-agg
shuffle keyed by (doc_id, bigram) — the same shape as wordcount, and the
per-doc key bounds any skew by document length, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..sources.loader import Tables


def hash_bucket(key: F.Column) -> F.Column:
    """First md5 hex byte of the stringified key — a uniform, engine-portable
    2-hex-digit bucket ('00'..'ff'); compare lexicographically to keep a
    k/256 fraction. Same discipline as split_deterministic."""
    return F.substring(F.md5(key.cast("string").cast("binary")), 1, 2)


@query(
    "sample_hash",
    category="J.pipeline",
    oracle="""
SELECT doc_id, lang, source
FROM documents
WHERE substring(md5(doc_id::VARCHAR), 1, 2) < '1a'
""",
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% corpus sample ('1a' = 26/256 ≈ 10.2%): the kept
    set is a pure function of doc_id, so it is stable across runs, engines
    and cluster sizes — the property a training-data pipeline needs for
    reproducible ablations and that RNG-based sample() cannot give. The
    filter is a narrow per-row predicate: no shuffle, pushdown-friendly
    scan, embarrassingly parallel at any scale."""
    d = Tables(spark, sf_dir).documents
    return d.filter(hash_bucket(F.col("doc_id")) < "1a").select(
        "doc_id", "lang", "source"
    )


@query(
    "sample_mixture",
    category="J.pipeline",
    oracle="""
WITH b AS (
  SELECT lang, source,
         substring(md5(doc_id::VARCHAR), 1, 2) AS hx
  FROM documents
)
SELECT lang,
       count(*) AS n_total,
       count(*) FILTER (WHERE hx < CASE WHEN lang = 'en' THEN 'cd' ELSE '4d' END)
         AS n_kept
FROM b GROUP BY lang
""",
)
def sample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture reweighting: keep ~80% of 'en' ('cd' = 205/256) and ~30% of
    every other language ('4d' = 77/256) — the standard downsample step
    that shapes a corpus toward target domain/language proportions.
    Per-row hash decision (no shuffle beyond the final small agg); the
    per-language counts make the realized mixture auditable."""
    d = Tables(spark, sf_dir).documents
    hx = hash_bucket(F.col("doc_id"))
    thresh = F.when(F.col("lang") == "en", F.lit("cd")).otherwise(F.lit("4d"))
    kept = F.when(hx < thresh, 1).otherwise(0)
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(kept).alias("n_kept"),
    )


_TEMP_ORACLE = """
WITH c AS (
  SELECT lang, count(*)::BIGINT AS n_total FROM documents GROUP BY lang
),
tot AS (SELECT sum(n_total)::BIGINT AS n_corpus FROM c),
w AS (
  SELECT lang, n_total, n_corpus,
         sqrt(n_total::DOUBLE / n_corpus::DOUBLE) AS w
  FROM c, tot
),
ws AS (SELECT list_sum(list(w ORDER BY lang)) AS wsum FROM w),
pol AS (
  SELECT lang, n_total,
         round(w / wsum, 6) AS mix_share,
         floor(n_corpus::DOUBLE * (w / wsum) + 0.5)::BIGINT AS target_n
  FROM w, ws
),
pol2 AS (
  SELECT lang, n_total, mix_share, target_n,
         target_n // n_total AS n_repeat,
         floor(65536.0 * (target_n % n_total)::DOUBLE
               / n_total::DOUBLE)::BIGINT AS th
  FROM pol
),
extra AS (
  SELECT d.lang,
         count(*) FILTER (
           WHERE ('0x' || substr(md5('tmp:' || d.doc_id::VARCHAR), 1, 4))::BIGINT
                 < p.th
         )::BIGINT AS kept_extra
  FROM documents d JOIN pol2 p USING (lang)
  GROUP BY d.lang
)
SELECT p.lang, p.n_total, p.mix_share, p.target_n, p.n_repeat,
       e.kept_extra,
       (p.n_repeat * p.n_total + e.kept_extra)::BIGINT AS realized_n
FROM pol2 p JOIN extra e USING (lang)
"""


@query("sample_temperature", category="J.pipeline", oracle=_TEMP_ORACLE)
def sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based mixture resampling (the multilingual-pretraining
    standard: sample language i ∝ share_i^(1/T), T=2 here — mC4/XLM-R
    flatten skewed language distributions exactly this way). Unlike
    sample_mixture's FIXED thresholds, the policy is DERIVED FROM THE
    DATA in the same query: per-language counts → tempered weights →
    normalized mixture → integer target counts, then REALIZED as
    n_repeat full copies (upsampled rare languages) plus a fractional
    md5-threshold keep — every decision a pure function of (corpus
    stats, doc_id), so reruns and engine swaps resample identically.

    Float discipline: the only float stages are sqrt/divide/floor on
    IEEE doubles computed identically in both engines; the one
    order-sensitive reduction (the weight normalizer) folds in
    lang-sorted order on BOTH sides (F.aggregate over sort_array ≡
    DuckDB list_sum over list(ORDER BY lang)); targets then drop to
    integers via the floor(x+0.5) half-up identity before any further
    arithmetic.

    Scale shape: one partial-agg shuffle for the counts, a ≤|langs|-row
    policy frame broadcast back onto the scan (BroadcastHashJoin), one
    final |langs|-row agg. The policy math is constant-size; the corpus
    is touched by exactly two scans and zero wide shuffles."""
    d = Tables(spark, sf_dir).documents
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # tempered weight per language over the ≤|langs|-row grouped frame
    t = counts.select(
        "lang",
        "n_total",
        F.sum("n_total").over(w_all).alias("n_corpus"),
        F.sqrt(F.col("n_total") / F.sum("n_total").over(w_all)).alias("w"),
    )
    # normalizer: lang-ordered sequential fold (matches list_sum order)
    folded = t.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("lang", "w"))),
            F.lit(0.0),
            lambda acc, s: acc + s.w,
        ).alias("wsum")
    )
    p = F.col("w") / F.col("wsum")
    target = F.floor(F.col("n_corpus") * p + F.lit(0.5)).cast("long")
    pol = (
        t.crossJoin(F.broadcast(folded))
        .select(
            "lang",
            "n_total",
            F.round(p, 6).alias("mix_share"),
            target.alias("target_n"),
        )
        .select(
            "lang",
            "n_total",
            "mix_share",
            "target_n",
            F.expr("target_n div n_total").alias("n_repeat"),
            F.floor(
                F.lit(65536.0)
                * (F.col("target_n") % F.col("n_total"))
                / F.col("n_total")
            )
            .cast("long")
            .alias("th"),
        )
    )
    h16 = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("tmp:"), F.col("doc_id").cast("string")).cast(
                    "binary"
                )
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    extra = (
        d.select("lang", h16.alias("h16"))
        .join(F.broadcast(pol.select("lang", "th")), "lang")
        .groupBy("lang")
        .agg(
            F.sum(F.when(F.col("h16") < F.col("th"), 1).otherwise(0)).alias(
                "kept_extra"
            )
        )
    )
    return (
        pol.join(extra, "lang")
        .select(
            "lang",
            "n_total",
            "mix_share",
            "target_n",
            "n_repeat",
            "kept_extra",
            (F.col("n_repeat") * F.col("n_total") + F.col("kept_extra"))
            .cast("long")
            .alias("realized_n"),
        )
    )


@query(
    "text_repetition",
    category="J.text",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
s AS (
  SELECT doc_id, len(toks) AS n_tokens, len(list_distinct(toks)) AS n_distinct
  FROM t
),
bg AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i + 1])) AS bigram
  FROM t WHERE len(toks) >= 2
),
topbg AS (
  SELECT doc_id, max(n) AS top_bigram_n
  FROM (SELECT doc_id, bigram, count(*) AS n FROM bg GROUP BY 1, 2)
  GROUP BY doc_id
)
SELECT s.doc_id,
       s.n_tokens,
       1.0 - s.n_distinct::DOUBLE / s.n_tokens AS dup_token_frac,
       2.0 * topbg.top_bigram_n / s.n_tokens AS top_bigram_frac
FROM s JOIN topbg USING (doc_id)
""",
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics per document: duplicate-token
    fraction (1 − distinct/total) and the token mass of the single most
    frequent bigram (2·max_count/n_tokens) — the signals the Gopher/
    MassiveText repetition filter thresholds on. One scan computes token
    stats; the bigram mode is the wordcount shuffle keyed by
    (doc_id, bigram) then a per-doc max — both partial-aggregate
    map-side, so the shuffle carries only distinct per-doc bigrams.
    Float discipline: both fractions are one correctly-rounded double
    division of exact integers (plus one exact *2 / 1− step), so Spark
    and DuckDB agree bitwise. 1-token docs are excluded on both sides
    (no bigram ⇒ inner join drops them; sequence clamp per ADVICE r1)."""
    d = Tables(spark, sf_dir).documents
    toks = F.split("text", " ")
    base = d.select("doc_id", toks.alias("toks"))
    stats = base.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
    )
    idx = F.sequence(F.lit(1), F.size(F.col("toks")) - 1)
    bigrams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", F.element_at(F.col("toks"), i), F.element_at(F.col("toks"), i + 1)
        ),
    )
    top = (
        base.where(F.size("toks") >= 2)
        .select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("top_bigram_n"))
    )
    return stats.join(top, "doc_id").select(
        "doc_id",
        "n_tokens",
        (F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_tokens")).alias(
            "dup_token_frac"
        ),
        (F.lit(2.0) * F.col("top_bigram_n") / F.col("n_tokens")).alias(
            "top_bigram_frac"
        ),
    )


@query(
    "text_pii_scrub",
    category="J.text",
    oracle="""
WITH c AS (
  SELECT doc_id, source,
         'contact user' || doc_id::VARCHAR || '@' || source || '.example.com or '
           || 'admin@' || source || '.example.org at 10.'
           || (doc_id % 256)::VARCHAR || '.0.' || ((doc_id * 7) % 256)::VARCHAR
           || ' re: ' || substr(text, 1, 40) AS contact
  FROM documents
),
s AS (
  SELECT doc_id, source, contact,
         len(regexp_extract_all(contact,
             '[a-z0-9._%-]+@[a-z0-9.-]+\\.[a-z]{2,}')) AS n_emails,
         len(regexp_extract_all(contact,
             '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}(\\.[0-9]{1,3})?')) AS n_ips,
         regexp_replace(regexp_replace(contact,
             '[a-z0-9._%-]+@[a-z0-9.-]+\\.[a-z]{2,}', '<EMAIL>', 'g'),
             '[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}(\\.[0-9]{1,3})?', '<IP>', 'g')
           AS scrubbed
  FROM c
)
SELECT source,
       count(*) AS n_docs,
       sum(n_emails)::BIGINT AS emails_redacted,
       sum(n_ips)::BIGINT AS ips_redacted,
       sum(CASE WHEN scrubbed LIKE '%<EMAIL>%' THEN 1 ELSE 0 END)::BIGINT
         AS docs_with_email,
       min(len(scrubbed))::BIGINT AS min_len
FROM s GROUP BY source
""",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the curation stage every released training corpus
    runs (emails / IPs → placeholder tokens) — as pure JVM-side regex
    expressions: ``regexp_count`` for the audit tally and two chained
    ``regexp_replace`` for the scrub, all inside whole-stage codegen (no
    UDF), one scan, one small final agg. The fixture's synthetic text
    contains no PII, so the scrub target is a contact string constructed
    deterministically from (doc_id, source) — the regex machinery,
    per-source audit counts and placeholder invariants are the real
    deliverable and are exactly replayed by the DuckDB oracle (patterns
    restricted to the RE2 ∩ java.util.regex common subset: character
    classes, bounded reps — no lookaround, no backrefs).

    At 100 TB this is the embarrassingly-parallel map stage of
    pipeline_curation: no shuffle until the tiny audit agg, and the
    scrubbed column would be written back partitioned, not collected."""
    d = Tables(spark, sf_dir).documents
    email = r"[a-z0-9._%-]+@[a-z0-9.-]+\.[a-z]{2,}"
    ip = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}(\.[0-9]{1,3})?"
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
        F.lit(" re: "),
        F.substring(F.col("text"), 1, 40),
    )
    s = d.select(
        "source",
        F.regexp_count(contact, F.lit(email)).alias("n_emails"),
        F.regexp_count(contact, F.lit(ip)).alias("n_ips"),
        F.regexp_replace(
            F.regexp_replace(contact, email, "<EMAIL>"), ip, "<IP>"
        ).alias("scrubbed"),
    )
    return s.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_emails").cast("long").alias("emails_redacted"),
        F.sum("n_ips").cast("long").alias("ips_redacted"),
        F.sum(
            F.when(F.col("scrubbed").contains("<EMAIL>"), 1).otherwise(0)
        ).cast("long").alias("docs_with_email"),
        F.min(F.length("scrubbed")).cast("long").alias("min_len"),
    )


@query(
    "sample_stratified",
    category="J.pipeline",
    oracle="""
WITH counts AS (
  SELECT event_type, count(*) AS n FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type
FROM events e JOIN counts c USING (event_type)
WHERE ('0x' || substr(md5(e.event_id::VARCHAR), 1, 8))::BIGINT
      / 4294967296.0
      < least(1.0, 100.0 / c.n)
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling: every stratum (event_type) is
    downsampled toward a fixed per-stratum target (~100 rows), i.e. the
    mixture-balancing step a training pipeline runs so over-represented
    slices don't dominate a training epoch. Per-stratum keep rate =
    min(1, target/n); the keep/drop decision hashes the stable row key
    (md5 fraction in [0,1), the sample_hash discipline at 32-bit
    resolution) so the sample is reproducible across runs, engines and
    partitionings — and therefore exactly oracle-checkable.

    Scale: one tiny agg (|strata| rows, map-side combined) broadcast
    back onto the scan; the filter itself is a narrow per-row predicate
    — no shuffle of the fact table, embarrassingly parallel. Expected
    stratum sample size concentrates at `target` by Chernoff; exact-k
    per stratum would need a per-stratum top-k by hash (win_rownum_topk
    shape) at one extra shuffle."""
    ev = Tables(spark, sf_dir).events
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    frac = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("double") / F.lit(4294967296.0)
    rate = F.least(F.lit(1.0), F.lit(100.0) / F.col("n"))
    return (
        ev.join(F.broadcast(counts), "event_type")
        .where(frac < rate)
        .select("event_id", "event_type")
    )
