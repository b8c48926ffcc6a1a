"""Deterministic corpus sampling (training-data curation).

`df.sample()` is seed-dependent and partition-order-dependent — two runs
on different cluster layouts disagree, which is unacceptable for
reproducible dataset releases. The curation-pipeline answer is HASH
THRESHOLDING: keep a row iff a stable content hash of its key falls under
the rate threshold. Deterministic across engines, partitionings, and
reruns; naturally stratifiable (per-slice thresholds); and a pure
projection+filter — no shuffle, no state, embarrassingly parallel at any
scale.

The hash here is the lowercase hex md5 of the key rendered as a string —
bit-identical in Spark and DuckDB, so the sample is oracle-checkable
(sample membership is part of the contract, not just the summary).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mric_bak_etl_spark.catalog import register
from mric_bak_etl_spark.tables import load_table

# Per-language sampling rates as hex-prefix thresholds over md5's first 8
# nibbles (uniform on [0, 16^8)): '80000000' = 50%, '20000000' = 12.5%.
_RATE_THRESHOLDS = {"en": "80000000", "es": "40000000"}
_DEFAULT_THRESHOLD = "20000000"


def hash_bucket(key: Column) -> Column:
    """First 8 hex chars of md5(key-as-string) — the sampling coordinate."""
    return F.substring(F.md5(key.cast("string")), 1, 8)


@register(
    "l6_stratified_sample",
    oracle="""
    WITH sampled AS (
      SELECT doc_id, lang,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
      FROM documents
      WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
            CASE lang WHEN 'en' THEN '80000000'
                      WHEN 'es' THEN '40000000'
                      ELSE '20000000' END
    )
    SELECT lang,
           count(*)    AS n_sampled,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM sampled
    GROUP BY lang
    ORDER BY lang
    """,
    doc="L6: deterministic stratified sampling via md5 hash thresholding — "
    "per-language rates (en 50%, es 25%, rest 12.5%); reproducible across "
    "engines/partitionings/reruns unlike seed-based sample(); zero "
    "shuffle. The summary per slice (count + id range) is the oracle; "
    "membership itself is cross-engine identical by construction.",
    tags=("llm", "sampling"),
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    threshold = F.when(
        F.col("lang") == "en", _RATE_THRESHOLDS["en"]
    ).when(F.col("lang") == "es", _RATE_THRESHOLDS["es"]).otherwise(
        _DEFAULT_THRESHOLD
    )
    sampled = d.filter(hash_bucket(F.col("doc_id")) < threshold)
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("lang")
    )


@register(
    "l11_curation_pipeline",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, source, n_chars, text
      FROM documents
      WHERE n_chars BETWEEN 100 AND 2000
    ),
    deduped AS (
      SELECT min(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang,
             arg_min(source, doc_id) AS source,
             arg_min(n_chars, doc_id) AS n_chars
      FROM scored GROUP BY md5(text)
    ),
    sampled AS (
      SELECT * FROM deduped
      WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'c0000000'
    )
    SELECT lang,
           CAST(count(*) AS BIGINT)   AS n_docs,
           round(avg(n_chars), 4)     AS avg_chars,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources
    FROM sampled
    GROUP BY lang
    ORDER BY lang
    """,
    doc="L11: end-to-end curation pipeline — the composed training-data "
    "path: length gate → exact dedup (keep min doc_id per content hash, "
    "metadata carried with min_by keyed on the keeper id, deterministic even if duplicates diverge in metadata) → "
    "deterministic 75% hash-threshold sample → per-language corpus "
    "stats. One shuffle for the dedup group, one for the final stats; "
    "the filter and sample are zero-shuffle projections. Each stage is "
    "individually verified (tx_quality_score, l1, l6, l5); this entry "
    "verifies their COMPOSITION.",
    tags=("llm", "sampling", "composite"),
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    scored = d.filter((F.col("n_chars") >= 100) & (F.col("n_chars") <= 2000))
    deduped = scored.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("lang", "doc_id").alias("lang"),
        F.min_by("source", "doc_id").alias("source"),
        F.min_by("n_chars", "doc_id").alias("n_chars"),
    )
    sampled = deduped.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) < "c0000000"
    )
    return (
        sampled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
        )
        .orderBy("lang")
    )
