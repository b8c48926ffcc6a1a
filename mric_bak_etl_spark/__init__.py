"""mric_bak_etl_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference snapshot-ingestion ETL pipeline (`civic-health-innovation-labs/
mric-bak-etl`, analyzed in SURVEY.md), re-expressed Spark-first:

- the reference's capability surface (blob-manifest scan → filter →
  latest-pick → stateful dedup → decompress → snapshot-replace load →
  state commit) as DataFrame / Structured Streaming stages
  (:mod:`mric_bak_etl_spark.pipeline`);
- the relational operator surface a bronze/silver/gold pipeline downstream
  of that load needs (joins, aggregates, windows, set ops, scalar function
  families) (:mod:`mric_bak_etl_spark.operators`,
  :mod:`mric_bak_etl_spark.functions`);
- streaming-window semantics over the events stream
  (:mod:`mric_bak_etl_spark.streaming`);
- LLM-training-data-pipeline operators: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard / embedding cosine), similarity search,
  text analysis, multimodal binary columns (:mod:`mric_bak_etl_spark.llm`).

Everything is declarative DataFrame/SQL so Catalyst + Tungsten pick the
physical strategy; Pandas UDFs appear only where built-ins genuinely cannot
express the semantics (zip decompression, multimodal decode).
"""

__version__ = "0.1.0"

from mric_bak_etl_spark.session import get_spark, ensure_runtime_confs
from mric_bak_etl_spark.tables import TABLE_NAMES, load_table, register_views

__all__ = [
    "get_spark",
    "ensure_runtime_confs",
    "TABLE_NAMES",
    "load_table",
    "register_views",
    "__version__",
]
